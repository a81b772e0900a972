"""Throughput of the AOT serving artifact (utils/export.py) on the real TPU.

Exports the published-scale sampler (B, 256^2 x 11, DDIM-50, bf16 compute) in
a CPU-backend subprocess, then deserializes and times it on the TPU with the
chained-dispatch methodology (PERF.md): each iteration's noise depends on the
previous output, so dispatches cannot be elided or reordered by the tunnel.

Expected result (PERF.md "Serving-artifact study"): the artifact is CORRECT
but 7-10x slower than bench.py's in-process jit on this toolchain — XLA
compiles deserialized modules without its full optimization pipeline. A
~0.7 volumes/s reading at B=8 is the documented behavior, not a regression.

Env: BENCH_BATCH (8), BENCH_STEPS (50), BENCH_ITERS (5), BENCH_BAKED (0 —
weights-as-arguments container; 1 bakes weights as constants, whose compile
at this scale was measured impractical through the tunnel), BENCH_REEXPORT
(1 forces re-export: the /tmp blob cache is keyed only by batch/steps/baked,
so after model or export-code changes a cached blob measures the OLD
program).
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))
BAKED = os.environ.get("BENCH_BAKED", "0") == "1"
S, H, W = 11, 256, 256
BLOB = (f"/tmp/sampler_published_b{BATCH}_s{STEPS}"
        f"{'_baked' if BAKED else ''}.stablehlo")

_EXPORT_CODE = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor
from diffusion_model_project_tpu.utils.config import PUBLISHED_UNET_KWARGS
from diffusion_model_project_tpu.utils.export import save_sampler
pred = LatentDiffusionPredictor.create(
    dict(PUBLISHED_UNET_KWARGS), rng=jax.random.key(0), num_slices={S},
    distance_transform=True, image_hw=({H}, {W}),
).with_compute_dtype("bfloat16").set_normalizer(
    {{"input": [1.0], "output": [2.1e-2, 1.6e-2, 7.9e-3]}})
save_sampler({BLOB!r}, pred, batch={BATCH}, num_steps={STEPS},
             image_hw=({H}, {W}), num_slices={S}, platforms=("tpu",),
             bake_weights={BAKED})
print("exported")
"""


def main():
    if os.environ.get("BENCH_REEXPORT") == "1" or not os.path.exists(BLOB):
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", _EXPORT_CODE],
                           capture_output=True, text=True)
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            sys.exit(1)
        print(f"export: {time.time()-t0:.0f}s, "
              f"{os.path.getsize(BLOB)/1e6:.0f} MB")

    import numpy as np
    import jax
    import jax.numpy as jnp
    from diffusion_model_project_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from diffusion_model_project_tpu.utils.export import load_sampler_file

    print("device:", jax.devices()[0])
    # NO outer jax.jit: the exported module is already lowered, and re-tracing
    # it embeds the weight leaves as HLO constants — the pathological compile
    # the args-mode layout exists to avoid (measured: 19s vs >30min timeout)
    f = load_sampler_file(BLOB)

    r = np.random.default_rng(0)
    img = (r.random((BATCH, S, 1, H, W)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    img = jnp.asarray(img)
    v2d = jnp.asarray(r.standard_normal((BATCH, S, 3, H, W)).astype(np.float32))
    noise0 = jnp.asarray(
        r.standard_normal((BATCH * S, 8, H // 4, W // 4)).astype(np.float32))

    t0 = time.time()
    out = f(img, v2d, noise0)
    out.block_until_ready()
    print(f"first call (compile): {time.time()-t0:.0f}s")

    # chained iterations: fresh, data-dependent noise each call
    t0 = time.time()
    for _ in range(ITERS):
        noise = noise0 + 1e-6 * jnp.mean(out)
        out = f(img, v2d, noise)
    float(jnp.mean(out))  # terminate with a scalar fetch
    dt = (time.time() - t0) / ITERS
    vps = BATCH / dt
    print(f'{{"metric": "served_volumes_per_sec_per_chip", "value": {vps:.3f}, '
          f'"unit": "volumes/s", "config": "AOT StableHLO artifact {'baked' if BAKED else 'args-mode'}, '
          f'DDIM-{STEPS} {H}^2x{S}, B={BATCH}, bf16"}}')


if __name__ == "__main__":
    main()
