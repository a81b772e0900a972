"""Serving daemon: micro-batching correctness + the HTTP front end.

The contract under test (utils/serving.py): a request's result is identical
whether it ran alone, co-batched, or as batch padding — per-request seeded
initial latents (the eval CLI's per-sample noise scheme) make the
deterministic samplers batch-composition-independent.
"""
import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor
from diffusion_model_project_tpu.utils.serving import (
    InferenceServer, ServerBusy, build_http_server)

S, H, W = 3, 32, 32
STEPS = 4


@pytest.fixture(scope="module")
def pred():
    kw = dict(in_channels=9, out_channels=4, features=(8, 16), kernel_size=3,
              padding_mode="zeros", activation="silu", final_activation=None,
              attention="", dropout=0.0, time_embedding_dim=16)
    return LatentDiffusionPredictor.create(
        dict(kw), rng=jax.random.key(0), num_slices=S, num_timesteps=20,
        distance_transform=True, image_hw=(H, W), vae_features=(32, 32, 32),
    ).set_normalizer({"input": [1.0], "output": [2.0, 3.0, 4.0]})


def _volume(i):
    r = np.random.default_rng(100 + i)
    img = (r.random((S, 1, H, W)) > 0.3).astype(np.float32)
    img[:, :, 0, 0] = 0.0
    v2d = r.standard_normal((S, 3, H, W)).astype(np.float32)
    v2d[:, 2] = 0.0
    return img, v2d


def _direct(pred, img, v2d, seed):
    """Single-sample ground truth: same sampler, same seeded latents."""
    noise = jax.random.normal(
        jax.random.key(seed), (S, pred.latent_channels, H // 4, W // 4))
    out = jax.jit(lambda p, i, v, n: p.predict_ddim(
        i, v, num_steps=STEPS, eta=0.0, noise=n))(
        pred, jnp.asarray(img[None]), jnp.asarray(v2d[None]), noise[None])
    return np.asarray(out)[0]


def test_concurrent_requests_coalesce_and_match_direct(pred):
    volumes = [_volume(i) for i in range(9)]
    expected = [_direct(pred, img, v2d, seed=i) for i, (img, v2d) in enumerate(volumes)]

    with InferenceServer(pred, sampler="ddim", num_steps=STEPS,
                         max_batch=4, max_wait_ms=50.0) as server:
        futs = [server.submit(img, v2d, seed=i)
                for i, (img, v2d) in enumerate(volumes)]
        results = [f.result(timeout=300) for f in futs]
        stats = server.stats()

    assert stats["requests"] == 9
    # 9 requests over max_batch=4 need >= 3 dispatches; with a warm compile
    # cache each request CAN complete before the next submit (batches == 9),
    # so only the lower bound is load-bearing here — the exact coalescing /
    # padding accounting lives in test_single_request_is_padded_not_retraced
    assert 3 <= stats["batches"] <= 9
    assert stats["errors"] == 0
    for got, want in zip(results, expected):
        assert got.shape == (S, 3, H, W)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_single_request_is_padded_not_retraced(pred):
    img, v2d = _volume(42)
    with InferenceServer(pred, sampler="ddim", num_steps=STEPS,
                         max_batch=4, max_wait_ms=1.0) as server:
        got = server.predict(img, v2d, seed=42)
        stats = server.stats()
    assert stats["batches"] == 1
    assert stats["padded_slots"] == 3  # padded to the one compiled shape
    # operator-facing dispatch->completion latency window (healthz)
    assert stats["batch_ms"]["window"] == 1
    assert stats["batch_ms"]["p50"] > 0
    np.testing.assert_allclose(got, _direct(pred, img, v2d, seed=42),
                               rtol=1e-5, atol=1e-6)


def test_request_validation(pred):
    img, v2d = _volume(0)
    with pytest.raises(ValueError, match="ddim|dpm"):
        InferenceServer(pred, sampler="ddpm")
    with InferenceServer(pred, num_steps=STEPS, max_batch=2) as server:
        with pytest.raises(ValueError, match="channels-first"):
            server.submit(img[:, 0], v2d)  # dropped channel dim
        with pytest.raises(ValueError, match="disagree"):
            server.submit(img, v2d[:, :, :16])
        server.predict(img, v2d, seed=0)  # pins (S, H, W)
        with pytest.raises(ValueError, match="pinned"):
            server.submit(img[:2], v2d[:2])
    with pytest.raises(RuntimeError, match="closed"):
        server.submit(img, v2d)


def test_geometry_validation_and_config_pin(pred):
    img, v2d = _volume(0)
    # impossible geometry is rejected in submit() BEFORE it can pin anything
    with InferenceServer(pred, num_steps=STEPS, max_batch=2) as server:
        with pytest.raises(ValueError, match="divisible by 4"):
            server.submit(img[:, :, :30, :], v2d[:, :, :30, :])
        assert server._shape is None  # nothing pinned by the reject
        server.predict(img, v2d, seed=0)
    # a config-pinned server rejects wrong-shape requests from the start —
    # the FIRST request can never pin a geometry the CLI didn't compile for
    with InferenceServer(pred, num_steps=STEPS, max_batch=2,
                         expected_shape=(S, H, W)) as server:
        with pytest.raises(ValueError, match="pinned"):
            server.submit(img[:, :, : H // 2], v2d[:, :, : H // 2])
        server.predict(img, v2d, seed=0)  # the configured shape still works
    # an impossible expected_shape fails at construction, not at request time
    with pytest.raises(ValueError, match="divisible by 4"):
        InferenceServer(pred, num_steps=STEPS, expected_shape=(S, 30, W))


def test_failed_unproven_pin_is_dropped(pred):
    """A first request whose dispatch fails must not brick the server: its
    never-successful pin is dropped so later well-formed requests re-pin."""
    img, v2d = _volume(1)
    with InferenceServer(pred, num_steps=STEPS, max_batch=1,
                         max_wait_ms=0.0) as server:
        real_fn, server._fn = server._fn, None  # TypeError on first dispatch
        with pytest.raises(TypeError):
            server.predict(img[:1], v2d[:1], seed=0)  # pins (1, H, W), fails
        server._fn = real_fn
        # a different (valid) geometry is accepted and re-pins
        out = server.predict(img, v2d, seed=0)
        assert out.shape == (S, 3, H, W)
        assert server.stats()["errors"] == 1


def test_batch_size_ladder_latency_mode(pred):
    """batch_sizes=(1, 4): a lone request runs the B=1 program (zero padded
    slots), a burst coalesces at 4, and results are identical to the
    single-shape server (per-request seeded latents)."""
    img, v2d = _volume(3)
    with InferenceServer(pred, num_steps=STEPS, batch_sizes=(1, 4),
                         max_wait_ms=1.0,
                         expected_shape=(S, H, W)) as server:
        server.warmup()  # pre-compiles both sizes
        got = server.predict(img, v2d, seed=3)
        stats1 = server.stats()
        assert stats1["batches"] == 1 and stats1["padded_slots"] == 0
        np.testing.assert_allclose(got, _direct(pred, img, v2d, seed=3),
                                   rtol=1e-5, atol=1e-6)

        # a 3-burst picks size 4 (one padded slot), not two dispatches
        gate = threading.Event()
        real_fn = server._fn

        def gated(p, i, v, n):
            gate.wait(timeout=60)
            return real_fn(p, i, v, n)

        server._fn = gated
        futs = [server.submit(*_volume(10 + i), seed=i) for i in range(3)]
        # hold the gate until all three are queued: the first dispatch is a
        # stub-blocked B>=1 batch; remaining requests coalesce behind it
        gate.set()
        for f in futs:
            f.result(timeout=300)
        server._fn = real_fn
        stats2 = server.stats()
        assert stats2["batches"] - stats1["batches"] <= 3
        assert server.batch_sizes == (1, 4)
    with pytest.raises(ValueError, match="positive"):
        InferenceServer(pred, batch_sizes=(0, 4))


def test_mixed_shape_queue_never_cobatches(pred):
    """Around an unproven-pin drop and re-pin, old-shape and new-shape
    requests can coexist in the queue; they must land in SEPARATE batches
    (a mixed np.stack would fail both — round-3 review finding). Here the
    batcher is held so two different-S requests are queued together, then
    released: both must succeed."""
    img, v2d = _volume(4)
    with InferenceServer(pred, num_steps=STEPS, max_batch=4,
                         max_wait_ms=200.0) as server:
        gate = threading.Event()
        real_fn = server._fn

        def gated(p, i, v, n):
            gate.wait(timeout=120)
            return real_fn(p, i, v, n)

        server._fn = gated
        # request A (S slices) starts a batch and blocks in the stub;
        # geometry validation passes for both shapes (depth factor 1)
        fut_a = server.submit(img, v2d, seed=1)
        time.sleep(0.3)  # batcher now blocked inside dispatch
        server._shape = None  # simulate the unpin window
        fut_b = server.submit(img[:1], v2d[:1], seed=2)   # re-pins S=1
        server._shape = (S, H, W)  # …and another original-shape request
        fut_c = server.submit(img, v2d, seed=3)
        gate.set()
        a = fut_a.result(timeout=300)
        b = fut_b.result(timeout=300)
        c = fut_c.result(timeout=300)
    assert a.shape == (S, 3, H, W)
    assert b.shape == (1, 3, H, W)
    assert c.shape == (S, 3, H, W)
    assert server.stats()["errors"] == 0
    # the S=1 straggler got its own dispatch: 3 batches, not 2
    assert server.stats()["batches"] == 3


def test_warmup_requires_pinned_shape(pred):
    with InferenceServer(pred, num_steps=STEPS) as server:
        with pytest.raises(RuntimeError, match="expected_shape"):
            server.warmup()


def test_backpressure_bounded_queue(pred):
    img, v2d = _volume(9)
    with pytest.raises(ValueError, match="max_pending"):
        InferenceServer(pred, max_batch=4, max_pending=2)
    with InferenceServer(pred, num_steps=STEPS, max_batch=1,
                         max_wait_ms=0.0, max_pending=2) as server:
        # stub the dispatch so the batcher is deterministically busy while
        # the queue fills (the real fn's compile time would be a race)
        gate = threading.Event()

        def slow_fn(p, i, v, n):
            gate.wait(timeout=60)
            return np.zeros((1, S, 3, H, W), np.float32)

        server._fn = slow_fn
        futs = [server.submit(img, v2d, seed=0)]   # dequeued -> in flight
        time.sleep(0.2)                            # batcher now blocked in gate
        futs += [server.submit(img, v2d, seed=i) for i in (1, 2)]  # fills queue
        with pytest.raises(ServerBusy, match="retry later"):
            server.submit(img, v2d, seed=3)
        assert server.stats()["rejected"] == 1
        gate.set()
        for f in futs:
            assert f.result(timeout=60).shape == (S, 3, H, W)
    # accepted requests all completed; only the overflow was rejected
    assert server.stats()["requests"] == 3


def test_http_round_trip(pred):
    img, v2d = _volume(5)
    expected = _direct(pred, img, v2d, seed=7)
    server = InferenceServer(pred, sampler="ddim", num_steps=STEPS,
                             max_batch=2, max_wait_ms=1.0)
    httpd = build_http_server(server, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        buf = io.BytesIO()
        np.savez(buf, img=img, v2d=v2d, seed=7)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict", data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=300) as resp:
            assert resp.status == 200
            got = np.load(io.BytesIO(resp.read()))["velocity"]
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=60) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["requests"] == 1
        assert health["sampler"] == "ddim"

        # malformed body -> 400, not a dead handler thread
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict", data=b"not an npz")
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(bad, timeout=60)
        assert exc_info.value.code == 400

        # round-4 payload negotiation: a float16 savez_compressed request
        # asking for a float16 compressed response must return the SAME
        # velocities (fp16 input quantization notwithstanding) at a
        # fraction of the bytes
        buf = io.BytesIO()
        np.savez_compressed(buf, img=img.astype(np.float16),
                            v2d=v2d.astype(np.float16), seed=7,
                            resp_dtype="float16", resp_compress=1)
        small = buf.getvalue()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict", data=small)
        with urllib.request.urlopen(req, timeout=300) as resp:
            body = resp.read()
            got16 = np.load(io.BytesIO(body))["velocity"]
        assert got16.dtype == np.float16
        f32_buf = io.BytesIO()
        np.savez(f32_buf, img=img, v2d=v2d, seed=7)
        assert len(small) < len(f32_buf.getvalue())  # the diet actually diets
        scale = float(np.abs(expected).max()) + 1e-12
        assert float(np.abs(got16.astype(np.float32) - expected).max()) \
            / scale < 5e-2
        # round-5 raw-bytes mode (VERDICT r4 item 8): MFR1 frame in ->
        # MFR1 frame out, numerically identical to the npz path (same
        # seed -> same batch pipeline), zero npz/zlib CPU
        from diffusion_model_project_tpu.utils.serving import (
            decode_raw_response, encode_raw_request)
        raw_req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict",
            data=encode_raw_request(img, v2d, seed=7))
        with urllib.request.urlopen(raw_req, timeout=300) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "application/x-mfr1"
            raw_vel = decode_raw_response(resp.read())
        np.testing.assert_allclose(raw_vel, expected, rtol=1e-5, atol=1e-6)
        # f16 request buffers + f16 response halve both directions
        raw16 = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict",
            data=encode_raw_request(img.astype(np.float16),
                                    v2d.astype(np.float16), seed=7,
                                    resp_dtype="float16"))
        with urllib.request.urlopen(raw16, timeout=300) as resp:
            vel16 = decode_raw_response(resp.read())
        assert vel16.dtype == np.float16
        assert float(np.abs(vel16.astype(np.float32) - expected).max()) \
            / scale < 5e-2
        # malformed raw frame (magic but truncated) -> 400
        bad_raw = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict", data=b"MFR1" + b"\0" * 12)
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(bad_raw, timeout=60)
        assert exc_info.value.code == 400

        # unsupported resp_dtype -> 400
        buf = io.BytesIO()
        np.savez(buf, img=img, v2d=v2d, resp_dtype="float64")
        bad_dtype = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict", data=buf.getvalue())
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(bad_dtype, timeout=60)
        assert exc_info.value.code == 400

        # truncated PK archive (zipfile.BadZipFile) -> 400 via the
        # catch-all, not a dropped connection
        trunc = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict",
            data=b"PK\x03\x04" + b"\x00" * 32)
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(trunc, timeout=60)
        assert exc_info.value.code == 400

        # oversized Content-Length -> 413 before the body is buffered
        import http.client
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.putrequest("POST", "/v1/predict")
        conn.putheader("Content-Length", str(1 << 40))
        conn.endheaders()
        assert conn.getresponse().status == 413
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()
        server.close()


def test_raw_frame_codec_round_trip():
    """MFR1 raw-frame helpers: lossless both directions, loud on malformed
    frames (utils/serving.py round-5 raw-bytes mode)."""
    from diffusion_model_project_tpu.utils.serving import (
        decode_raw_request, decode_raw_response, encode_raw_request,
        encode_raw_response)

    r = np.random.default_rng(0)
    img = (r.random((5, 1, 12, 12)) > 0.5).astype(np.float32)
    v2d = r.standard_normal((5, 3, 12, 12)).astype(np.float16)
    body = encode_raw_request(img, v2d, seed=123, resp_dtype="float16")
    assert len(body) == 32 + img.nbytes + v2d.nbytes
    i2, v2, seed, rd = decode_raw_request(body)
    np.testing.assert_array_equal(i2, img)
    np.testing.assert_array_equal(v2, v2d)
    assert (seed, rd) == (123, "float16")

    vel = r.standard_normal((5, 3, 12, 12)).astype(np.float32)
    np.testing.assert_array_equal(
        decode_raw_response(encode_raw_response(vel)), vel)

    with pytest.raises(ValueError):
        decode_raw_request(b"XXXX" + bytes(60))
    with pytest.raises(ValueError):
        decode_raw_request(body[:-1])
    with pytest.raises(ValueError):
        decode_raw_response(encode_raw_response(vel)[:-3])
