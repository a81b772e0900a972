"""Headline benchmark: end-to-end 2D->3D inference throughput on one chip.

Pipeline (matches the reference eval path, scripts/eval_testset_end2end.py):
binary 256x256x11 microstructure + 2D velocity -> on-device EDT -> E2D encode
-> 50-step DDIM (eta=0) fused lax.scan -> D3D decode -> denormalize -> mask.
Published UNet config (in-17/out-8, features [64..1024], attention '3..2').

Prints ONE JSON line:
  {"metric": "e2e_volumes_per_sec_per_chip", "value": N, "unit": "volumes/s",
   "vs_baseline": R}

vs_baseline: the reference publishes no samples/sec (BASELINE.md). R is
measured throughput divided by an ESTIMATED reference A100 throughput derived
from the compiled FLOP count at 35% assumed A100 TF32 utilization (~55 TFLOP/s
effective) — the north-star target is R >= 10. Sensitivity: at 50% assumed
utilization the denominator is 2.6 vol/s (scale R by 0.70); at 70%, 3.6 vol/s
(scale by 0.50) — see PERF.md "A100-estimate sensitivity" for the table.

Env knobs: BENCH_BATCH, BENCH_STEPS, BENCH_DTYPE, BENCH_PALLAS;
BENCH_MODE=train reports diffusion training-step throughput instead
(volumes/s through the jitted Adam step at grid-search dry-run scale).
"""
import json
import os
import sys
import time

import numpy as np

# Repo-local persistent compile cache: survives between the builder session
# that pre-warms it and the driver's capture run (a /tmp default did not —
# round-2's driver capture timed out on a cold cache at nproc=1, VERDICT r2).
_REPO_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _REPO_CACHE)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# The JAX_COMPILATION_CACHE_DIR env var is IGNORED in this environment (same
# trap as JAX_PLATFORMS, CLAUDE.md) — only config.update enables the cache.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor  # noqa: E402

# B=8 is the measured single-chip throughput sweet spot (B=16 OOMs 16 GB HBM)
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
DDIM_STEPS = int(os.environ.get("BENCH_STEPS", "50"))
S, H, W = 11, 256, 256

from diffusion_model_project_tpu.utils.config import (
    PUBLISHED_UNET_KWARGS as _PUBLISHED_UNET)

# Estimated reference throughput on A100 (see module docstring). The e2e FLOP
# count of this pipeline is ~3.0e13 per volume (50 UNet calls on 11x17x64x64 +
# Conv3D VAE encode/decode at 256x256x11); at ~55 TFLOP/s effective TF32 that
# is ~1.8 volumes/s, consistent with the reference's "~30 GB, batch 2" setup.
REF_A100_VOLUMES_PER_SEC = 1.8


def bench_train():
    """Training-step throughput (published UNet config, 128^2 dry-run scale)."""
    import jax.numpy as jnp
    import optax

    from diffusion_model_project_tpu.training.steps import make_diffusion_train_step

    b, s, h, w = 2, 11, 128, 128
    pred = LatentDiffusionPredictor.create(
        dict(_PUBLISHED_UNET), rng=jax.random.key(0), num_slices=s,
        num_timesteps=1000, distance_transform=True, image_hw=(h, w),
    ).with_compute_dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(pred.unet_params)
    step = jax.jit(make_diffusion_train_step(optimizer))

    r = np.random.default_rng(0)
    img = (r.random((b, s, 1, h, w)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    batch = {
        "img": jnp.asarray(img),
        "U_2d": jnp.asarray(r.standard_normal((b, s, 3, h, w)).astype(np.float32)),
        "U": jnp.asarray(r.standard_normal((b, s, 3, h, w)).astype(np.float32)),
    }
    pred, opt_state, aux = step(pred, opt_state, batch, jax.random.key(1))
    jax.block_until_ready(aux)
    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        pred, opt_state, aux = step(pred, opt_state, batch, jax.random.key(i))
    jax.block_until_ready(aux)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "train_volumes_per_sec_per_chip",
        "value": round(b * n_iters / dt, 3),
        "unit": "volumes/s",
        "vs_baseline": None,
    }))


def main():
    if os.environ.get("BENCH_MODE", "infer") == "train":
        return bench_train()
    print(f"[bench] devices={jax.devices()} — building predictor (jitted init)",
          file=sys.stderr, flush=True)
    pred = LatentDiffusionPredictor.create(
        dict(_PUBLISHED_UNET), rng=jax.random.key(0), num_slices=S,
        num_timesteps=1000, distance_transform=True, image_hw=(H, W),
    )
    pred = pred.set_normalizer({"input": [1.0], "output": [2.0, 3.0, 4.0]})
    # bf16 network compute (scheduler math stays f32); measured e2e error vs
    # f32 is ~3e-5 per-voxel MSE — far inside the 1e-3 parity budget.
    pred = pred.with_compute_dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))
    if os.environ.get("BENCH_INT8", "0") == "1":
        # frozen-VAE int8 fast path (~1.4e-3 relative MSE vs f32, decoder-
        # dominated; see tests/test_quant.py) — throughput knob, off by default
        pred = pred.with_vae_int8()
    if os.environ.get("BENCH_INT8_UNET", "0") == "1":
        # int8 DDIM scan (quantization error feeds back through the sampler;
        # measured in tests/test_quant.py) — throughput knob, off by default
        pred = pred.with_unet_int8()
    if os.environ.get("BENCH_PALLAS", "0") == "1":
        from diffusion_model_project_tpu.models.layers import enable_pallas_fusion
        enable_pallas_fusion(attention=True,
                             groupnorm=os.environ.get("BENCH_PALLAS_GN", "0") == "1")

    r = np.random.default_rng(0)
    img = (r.random((BATCH, S, 1, H, W)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    img = jnp.asarray(img)
    v2d = jnp.asarray(r.standard_normal((BATCH, S, 3, H, W)).astype(np.float32))

    n_chips = 1
    if os.environ.get("BENCH_MESH", "0") == "1" and jax.device_count() > 1:
        # shard the batch over all chips; metric stays per-chip
        from diffusion_model_project_tpu.parallel import make_mesh, replicate, shard_batch

        mesh = make_mesh(("data",))
        n_chips = jax.device_count()
        assert BATCH % n_chips == 0, "BENCH_BATCH must divide device count"
        sharded = shard_batch({"img": img, "v2d": v2d}, mesh)
        img, v2d = sharded["img"], sharded["v2d"]
        pred = replicate(pred, mesh)

    # BENCH_SAMPLER=dpm: DPM-Solver++(2M) — reaches DDIM-50 quality in ~10
    # steps (pair with BENCH_STEPS=10). Off by default: the headline metric
    # stays the reference's own benchmark (DDIM at 50 steps).
    sampler = os.environ.get("BENCH_SAMPLER", "ddim")
    assert sampler in ("ddim", "dpm"), f"BENCH_SAMPLER must be ddim|dpm, got {sampler}"

    @jax.jit
    def e2e(pred, img, v2d, rng):
        if sampler == "dpm":
            return pred.predict_dpm(img, v2d, num_steps=DDIM_STEPS, rng=rng)
        return pred.predict_ddim(img, v2d, num_steps=DDIM_STEPS, eta=0.0, rng=rng)

    # warmup / compile — announce progress on stderr (stdout stays one JSON
    # line) so a driver watching the process sees liveness during the first
    # cold compile, which can take minutes at nproc=1 through the TPU tunnel.
    print(
        f"[bench] compiling e2e {sampler}-{DDIM_STEPS} B={BATCH} "
        f"(cache: {os.environ['JAX_COMPILATION_CACHE_DIR']}, "
        f"nproc={os.cpu_count()}) ...", file=sys.stderr, flush=True)
    t_c = time.perf_counter()
    out = jax.block_until_ready(e2e(pred, img, v2d, jax.random.key(1)))
    print(f"[bench] compile+warmup done in {time.perf_counter() - t_c:.1f}s",
          file=sys.stderr, flush=True)
    assert bool(jnp.isfinite(out).all()), "non-finite output"

    n_iters = int(os.environ.get("BENCH_ITERS", "5"))
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = e2e(pred, img, v2d, jax.random.key(i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    volumes_per_sec = BATCH * n_iters / dt / n_chips
    print(json.dumps({
        "metric": "e2e_volumes_per_sec_per_chip",
        "value": round(volumes_per_sec, 3),
        "unit": "volumes/s",
        "vs_baseline": round(volumes_per_sec / REF_A100_VOLUMES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
