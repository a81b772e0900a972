"""Serving-daemon throughput on the real TPU at published scale.

Measures utils/serving.InferenceServer end-to-end THROUGH the HTTP front
end: concurrent clients (each its own thread + connection) POST distinct
single-volume npz requests with per-request seeds; the daemon coalesces
them into device batches. Every request carries fresh inputs (seeded RNG),
so dispatches cannot be memoized by the tunnel (PERF.md methodology note) —
and the number includes everything a deployment pays: npz decode/encode,
queueing, padding, batching, the fused DDIM scan, and the response transfer.

Reported: steady-state volumes/s over HTTP after a warmup request (the
first request compiles: minutes through the tunnel on a cold cache), plus
the daemon's own batching stats. Compare against bench.py's in-process
number (the device-path ceiling): the gap is host/HTTP overhead, which
scales with host cores, not with the chip.

Env: SERVE_BATCH (8), SERVE_STEPS (50), SERVE_CLIENTS (8), SERVE_REQUESTS
(32 total, after warmup), SERVE_SAMPLER (ddim), SERVE_DTYPE (bfloat16).
"""
import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from diffusion_model_project_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor
from diffusion_model_project_tpu.utils.config import PUBLISHED_UNET_KWARGS
from diffusion_model_project_tpu.utils.serving import (
    InferenceServer, build_http_server)

BATCH = int(os.environ.get("SERVE_BATCH", "8"))
STEPS = int(os.environ.get("SERVE_STEPS", "50"))
CLIENTS = int(os.environ.get("SERVE_CLIENTS", "8"))
REQUESTS = int(os.environ.get("SERVE_REQUESTS", "32"))
SAMPLER = os.environ.get("SERVE_SAMPLER", "ddim")
S, H, W = 11, 256, 256


def _request_payload(i):
    r = np.random.default_rng(1000 + i)
    img = (r.random((S, 1, H, W)) > 0.3).astype(np.float32)
    img[:, :, 0, 0] = 0.0
    v2d = r.standard_normal((S, 3, H, W)).astype(np.float32)
    buf = io.BytesIO()
    np.savez(buf, img=img, v2d=v2d, seed=i)
    return buf.getvalue()


def main():
    pred = LatentDiffusionPredictor.create(
        dict(PUBLISHED_UNET_KWARGS), rng=jax.random.key(0), num_slices=S,
        num_timesteps=1000, distance_transform=True, image_hw=(H, W),
    ).set_normalizer({"input": [1.0], "output": [2.0, 3.0, 4.0]})
    pred = pred.with_compute_dtype(os.environ.get("SERVE_DTYPE", "bfloat16"))

    server = InferenceServer(pred, sampler=SAMPLER, num_steps=STEPS,
                             max_batch=BATCH, max_wait_ms=50.0)
    httpd = build_http_server(server, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def post(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict", data=_request_payload(i))
        with urllib.request.urlopen(req, timeout=1800) as resp:
            out = np.load(io.BytesIO(resp.read()))["velocity"]
        assert out.shape == (S, 3, H, W), out.shape
        return out

    print("warmup (compiles the batch program)...", flush=True)
    t0 = time.time()
    post(10_000)
    print(f"warmup done in {time.time() - t0:.1f}s", flush=True)

    # pre-generate every payload OUTSIDE the timed window: the measurement
    # boundary is the SERVER (npz decode -> queue -> batch -> fused scan ->
    # npz encode -> transfer); a real client's data comes from disk or
    # sensors, not from host-side rng racing the server for the same cores
    payloads = [_request_payload(i) for i in range(REQUESTS)]

    errors = []
    idx_lock = threading.Lock()
    next_idx = iter(range(REQUESTS))

    def client():
        while True:
            with idx_lock:
                i = next(next_idx, None)
            if i is None:
                return
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/v1/predict", data=payloads[i])
                with urllib.request.urlopen(req, timeout=1800) as resp:
                    out = np.load(io.BytesIO(resp.read()))["velocity"]
                assert out.shape == (S, 3, H, W), out.shape
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)
                return

    threads = [threading.Thread(target=client) for _ in range(CLIENTS)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    assert not errors, errors

    stats = server.stats()
    httpd.shutdown()
    httpd.server_close()
    server.close()
    print(json.dumps({
        "metric": "serve_daemon_volumes_per_sec_http",
        "value": round(REQUESTS / dt, 3),
        "unit": "volumes/s",
        "clients": CLIENTS,
        "sampler": f"{SAMPLER}-{STEPS}",
        "max_batch": BATCH,
        "batches": stats["batches"] - 1,  # minus warmup
        "padded_slots": stats["padded_slots"],
    }))


if __name__ == "__main__":
    main()
