"""UNet-scan cost localization on the real TPU (chained methodology).

The DDIM-50 UNet scan runs at ~46 TFLOP/s effective vs ~170 for the VAE conv
stages (PERF.md) — this probe localizes where the scan's time goes by timing
chained UNet forwards under ablations:

  - full published config (17ch in, features [64..1024], attention "3..2")
  - attention off
  - truncated feature stacks (incremental per-level cost)
  - GroupNorm count halved (activation w/o fused GN pass is not separable, so
    instead: kernel_size=1 variant isolates conv cost from GN/elementwise)

Methodology (PERF.md): N chained applications inside ONE jit via lax.scan with
a data dependency, warmed up, timed on a fresh input, ended by a scalar fetch.

Env: BENCH_BATCH (8 volumes -> B*11 slices), BENCH_REPS (20).
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

from diffusion_model_project_tpu.models.unet import UNet

VOLUMES = int(os.environ.get("BENCH_BATCH", "8"))
REPS = int(os.environ.get("BENCH_REPS", "20"))
N = VOLUMES * 11          # latent slices
LH = LW = 64
CIN = 17


def conv_tflops(features, kernel_size, lh, lw, cin):
    """Analytic conv FLOPs (MAC*2) for one UNet forward at batch 1."""
    k2 = kernel_size * kernel_size
    total = 0
    h = lh
    c_prev = cin
    skips = []
    for f in features:
        total += h * h * k2 * (c_prev * f + f * f) * 2
        skips.append((h, f))
        c_prev = f
        h //= 2
    f_bot = 2 * features[-1]
    total += h * h * k2 * (c_prev * f_bot + f_bot * f_bot) * 2
    c_prev = f_bot
    for (hs, f) in reversed(skips):
        total += hs * hs * (c_prev * f * 4)* 2            # convT 2x2
        total += hs * hs * k2 * ((f + f) * f + f * f) * 2  # concat-conv + conv
        c_prev = f
    total += lh * lw * k2 * c_prev * 8 * 2                 # final conv
    return total / 1e12


def timed_chain(unet, params, x, t):
    def chain(params, x, t):
        def body(carry, _):
            y = unet.apply({"params": params}, carry, t)
            # data dependency: fold output back into the carry
            return carry + 0.01 * jnp.pad(
                y, [(0, 0), (0, 0), (0, 0), (0, x.shape[-1] - y.shape[-1])]), None
        out, _ = jax.lax.scan(body, x, None, length=REPS)
        return jnp.sum(out.astype(jnp.float32))

    f = jax.jit(chain)
    f(params, x, t).block_until_ready()
    x2 = x + 0.125
    jax.block_until_ready(x2)
    t0 = time.perf_counter()
    val = float(f(params, x2, t))
    dt = (time.perf_counter() - t0) / REPS
    assert np.isfinite(val)
    return dt


def probe(name, **kw):
    cfg = dict(in_channels=CIN, out_channels=8,
               features=(64, 128, 256, 512, 1024), kernel_size=3,
               padding_mode="zeros", activation="silu", final_activation=None,
               attention="3..2", dropout=0.0, time_embedding_dim=64)
    cfg.update(kw)
    unet = UNet(**cfg)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((N, LH, LW, CIN)).astype(np.float32))
    x = x.astype(jnp.bfloat16)
    t = jnp.full((N,), 500, jnp.int32)
    params = jax.jit(lambda k: unet.init(k, x, t)["params"])(jax.random.key(0))
    dt = timed_chain(unet, params, x, t)
    tf = conv_tflops(cfg["features"], cfg["kernel_size"], LH, LW, CIN) * N
    print(f"{name:42s} {dt*1e3:8.2f} ms/step   {tf/dt:6.1f} TFLOP/s (conv-only FLOPs)")
    return dt


def main():
    print(f"UNet probe: {N} slices of {LH}x{LW}x{CIN}, bf16, chained x{REPS}")
    full = probe("full published (attn 3..2)")
    probe("no attention", attention="")
    probe("levels [64,128]", features=(64, 128), attention="")
    probe("levels [64,128,256]", features=(64, 128, 256), attention="")
    probe("levels [64,128,256,512]", features=(64, 128, 256, 512), attention="")
    probe("levels [64..1024] k=1 (conv cost off)", kernel_size=1, attention="")
    probe("full, relu (same fused-GN path)", activation="relu")
    print(f"\nfull published: {full*1e3:.2f} ms/step -> DDIM-50 scan "
          f"~{full*50*1e3:.0f} ms for {VOLUMES} volumes")


if __name__ == "__main__":
    main()
