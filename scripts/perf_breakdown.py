"""Per-stage e2e timing on the real TPU (bf16, published config).

Stages: prepare_conditioning (EDT + E2D), DDIM-N UNet scan, decode+finish.
Tunnel-safe methodology: warm up, then time a fresh-input dispatch ended by a
scalar fetch (block_until_ready alone can return before execution on axon).

Env: BENCH_BATCH (4), BENCH_STEPS (50), BENCH_DTYPE (bfloat16), BENCH_INT8.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diffusion_model_project_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor

BATCH = int(os.environ.get("BENCH_BATCH", "4"))
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
S, H, W = 11, 256, 256

from diffusion_model_project_tpu.utils.config import (
    PUBLISHED_UNET_KWARGS as _PUBLISHED_UNET)


def timed(fn, *args, fresh=None):
    """fn returns a pytree; time = dispatch+fetch of a fresh-input call."""
    f = jax.jit(lambda *a: jax.tree_util.tree_map(
        lambda x: jnp.sum(x.astype(jnp.float32)), fn(*a)))
    jax.block_until_ready(jax.tree_util.tree_leaves(f(*args))[0])
    args2 = fresh(*args) if fresh else args
    jax.block_until_ready(args2)
    t0 = time.perf_counter()
    out = f(*args2)
    float(jax.tree_util.tree_leaves(out)[0])
    return time.perf_counter() - t0


def main():
    pred = LatentDiffusionPredictor.create(
        dict(_PUBLISHED_UNET), rng=jax.random.key(0), num_slices=S,
        num_timesteps=1000, distance_transform=True, image_hw=(H, W),
    ).set_normalizer({"input": [1.0], "output": [2.0, 3.0, 4.0]})
    pred = pred.with_compute_dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))
    if os.environ.get("BENCH_INT8", "0") == "1":
        pred = pred.with_vae_int8()
        print("int8 VAE ON")
    if os.environ.get("BENCH_INT8_UNET", "0") == "1":
        pred = pred.with_unet_int8()
        print("int8 UNet ON")

    r = np.random.default_rng(0)
    img = (r.random((BATCH, S, 1, H, W)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    img = jnp.asarray(img)
    v2d = jnp.asarray(r.standard_normal((BATCH, S, 3, H, W)).astype(np.float32))
    lh, lw = H // 4, W // 4
    n = BATCH * S
    x_lat = jnp.asarray(r.standard_normal((n, lh, lw, 8)).astype(np.float32))
    z_cond = jnp.asarray(r.standard_normal((n, lh, lw, 8)).astype(np.float32))
    m_cond = jnp.asarray(r.random((n, lh, lw, 1)).astype(np.float32))

    # pred goes through as a pytree ARG (closing over it would embed ~0.5 GB
    # of weights as HLO constants and overflow the tunnel's compile request)
    def fresh_img(p, img, v2d):
        return p, jnp.roll(img, 1, axis=0), v2d + 0.01

    t = timed(lambda p, i, v: p.prepare_conditioning(i, v), pred, img, v2d,
              fresh=fresh_img)
    print(f"prepare_conditioning: {t*1e3:8.1f} ms")

    def scan_unet(p, x, z, m):
        ts = jnp.arange(STEPS)

        def step(x, t):
            tb = jnp.full((n,), 999 - t * (1000 // STEPS), jnp.int32)
            eps = p._unet_eps(x, z, m, tb)
            return x - 0.01 * eps, None

        return jax.lax.scan(step, x, ts)[0]

    t = timed(scan_unet, pred, x_lat, z_cond, m_cond,
              fresh=lambda p, x, z, m: (p, x + 0.1, z, m))
    print(f"unet scan x{STEPS}:    {t*1e3:8.1f} ms")

    t = timed(lambda p, x, i: p._decode_and_finish(x, i, BATCH, S, lh, lw),
              pred, x_lat, img, fresh=lambda p, x, i: (p, x + 0.1, i))
    print(f"decode+finish:        {t*1e3:8.1f} ms")

    t = timed(lambda p, i, v, x: p.predict_ddim(i, v, num_steps=STEPS, eta=0.0,
                                                noise=x.reshape(n, 8, lh, lw)),
              pred, img, v2d, x_lat, fresh=lambda p, i, v, x: (p, i, v + 0.01, x))
    print(f"full e2e:             {t*1e3:8.1f} ms  "
          f"({BATCH / t:.2f} volumes/s)")


if __name__ == "__main__":
    main()
