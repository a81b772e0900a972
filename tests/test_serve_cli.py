"""scripts/serve.py driven as a REAL subprocess: startup (with ladder
warmup), npz round-trip, /healthz, graceful SIGTERM drain, exit 0.

The library layer (utils/serving.py) has its own tests; this covers the CLI
wiring — run-dir loading, geometry pinning from --image-size, --batch-sizes
parsing, warmup, and the signal path a deployment actually exercises."""
import io
import json
import os.path as osp
import re
import signal
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

REPO = osp.abspath(osp.join(osp.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def daemon(shared_diffusion_dir, shared_stage1_dir, shared_stage2_dir,
           tmp_path_factory):
    proc = subprocess.Popen(
        [sys.executable, osp.join(REPO, "scripts", "serve.py"),
         "--model-dir", shared_diffusion_dir,
         "--vae-encoder-path", shared_stage2_dir,
         "--vae-decoder-path", shared_stage1_dir,
         "--image-size", "16", "--sampler", "ddim", "--steps", "2",
         "--max-batch", "2", "--batch-sizes", "1,2",
         "--compute-dtype", "float32",
         "--port", "0", "--device", "cpu"],  # OS-assigned port, no collisions
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env={**__import__("os").environ,
             "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_pytest_cache"},
        cwd=REPO)
    # the banner prints the bound port once warmup finishes:
    #   serving <dir> on http://127.0.0.1:<port> (...)
    banner_lines = []
    deadline = time.time() + 600
    port = None
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(
                "daemon died:\n" + "".join(banner_lines) + proc.stdout.read())
        line = proc.stdout.readline()
        banner_lines.append(line)
        m = re.search(r"on http://[^:]+:(\d+)", line)
        if m:
            port = int(m.group(1))
            break
    else:
        proc.kill()
        raise RuntimeError("daemon never printed its banner")
    yield proc, port
    if proc.poll() is None:
        proc.kill()


def test_serve_cli_round_trip_and_sigterm(daemon):
    proc, port = daemon
    s, h, w = 3, 16, 16
    r = np.random.default_rng(0)
    img = (r.random((s, 1, h, w)) > 0.3).astype(np.float32)
    img[:, :, 0, 0] = 0.0
    v2d = r.standard_normal((s, 3, h, w)).astype(np.float32)
    buf = io.BytesIO()
    np.savez(buf, img=img, v2d=v2d, seed=7)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/predict", data=buf.getvalue())
    with urllib.request.urlopen(req, timeout=300) as resp:
        assert resp.status == 200
        out = np.load(io.BytesIO(resp.read()))["velocity"]
    assert out.shape == (s, 3, h, w) and np.isfinite(out).all()

    # wrong geometry -> clean 400 (pinned from --image-size, not requests)
    buf = io.BytesIO()
    np.savez(buf, img=img[:, :, :8], v2d=v2d[:, :, :8], seed=0)
    bad = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/predict", data=buf.getvalue())
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(bad, timeout=60)
    assert exc_info.value.code == 400

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["requests"] == 1 and health["errors"] == 0

    proc.send_signal(signal.SIGTERM)
    assert proc.wait(timeout=120) == 0
    out_text = proc.stdout.read()
    assert "serving stopped" in out_text
    assert "'requests': 1" in out_text