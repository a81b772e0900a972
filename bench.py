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

Env knobs: BENCH_BATCH, BENCH_STEPS, BENCH_DTYPE, BENCH_PALLAS, BENCH_HW,
BENCH_ITERS, BENCH_INT8[_UNET], BENCH_SAMPLER, BENCH_MESH;
BENCH_MODE=train reports diffusion training-step throughput
(BENCH_TRAIN_HW=256 BENCH_BATCH=2 = published scale; BENCH_TRAIN_PHYSICS=1
adds the physics losses); BENCH_MODE=train_vae1|train_vae2 report the
stage-1/stage-2 VAE grad steps. Timing: one jitted lax.scan with every
input chained through the carry, closed by a scalar fetch — the only loop
shape the axon backend measures honestly (PERF.md "Measurement
methodology").
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
# trap as JAX_PLATFORMS, CLAUDE.md) — enable_compile_cache() config.update()s
# it into effect (env var if set, else the repo-local .jax_cache default).
from diffusion_model_project_tpu.utils.compile_cache import (  # noqa: E402
    enable_compile_cache)
enable_compile_cache()

from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor  # noqa: E402

# B=8 is the measured single-chip throughput sweet spot (B=16 OOMs 16 GB HBM)
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
DDIM_STEPS = int(os.environ.get("BENCH_STEPS", "50"))
# BENCH_HW: spatial size for the inference bench (>=128 — the 5-level UNet
# pools 5x). Sub-published sizes exist for smoke tests (e.g. validating the
# BENCH_MESH path on a virtual CPU mesh, where 256^2 compiles for an hour);
# the published benchmark is the 256 default.
S, H = 11, int(os.environ.get("BENCH_HW", "256"))
W = H

from diffusion_model_project_tpu.utils.config import (
    PUBLISHED_UNET_KWARGS as _PUBLISHED_UNET)

# Estimated reference throughput on A100 (see module docstring). The e2e FLOP
# count of this pipeline is ~3.0e13 per volume (50 UNet calls on 11x17x64x64 +
# Conv3D VAE encode/decode at 256x256x11); at ~55 TFLOP/s effective TF32 that
# is ~1.8 volumes/s, consistent with the reference's "~30 GB, batch 2" setup.
REF_A100_VOLUMES_PER_SEC = 1.8


def bench_train_cached():
    """Cached-latent training-step throughput (--cache-latents mode): the
    pure-UNet grad step over device-resident latents — what every epoch
    costs after the one-time frozen-VAE encode pass. Same honest chained
    scan as bench_train; BENCH_TRAIN_HW/BENCH_BATCH as there."""
    import jax.numpy as jnp
    import optax

    from diffusion_model_project_tpu.training.steps import (
        make_cached_latent_train_step, precompute_latent_cache)

    hw = int(os.environ.get("BENCH_TRAIN_HW", "128"))
    b, s, h, w = int(os.environ.get("BENCH_BATCH", "2")), 11, hw, hw
    pred = LatentDiffusionPredictor.create(
        dict(_PUBLISHED_UNET), rng=jax.random.key(0), num_slices=s,
        num_timesteps=1000, distance_transform=True, image_hw=(h, w),
    ).with_compute_dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(pred.unet_params)
    step = make_cached_latent_train_step(optimizer)

    r = np.random.default_rng(0)
    img = (r.random((b, s, 1, h, w)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    raw = {
        "img": jnp.asarray(img),
        "U_2d": jnp.asarray(r.standard_normal((b, s, 3, h, w)).astype(np.float32)),
        "U": jnp.asarray(r.standard_normal((b, s, 3, h, w)).astype(np.float32)),
    }
    cache = jax.jit(precompute_latent_cache)(pred, raw)
    n_iters = int(os.environ.get("BENCH_ITERS", "10"))

    @jax.jit
    def loop(pred, opt_state, batch, key):
        def body(carry, k):
            p, o, z = carry
            bb = {name: leaf + z for name, leaf in batch.items()}
            p, o, aux = step(p, o, bb, jax.random.fold_in(key, k))
            loss = jax.tree_util.tree_leaves(aux)[0]
            return (p, o, loss.astype(jnp.float32).ravel()[0] * 0), loss
        (p, o, z), auxes = jax.lax.scan(
            body, (pred, opt_state, jnp.float32(0)), jnp.arange(n_iters))
        return jnp.asarray(auxes).astype(jnp.float32).sum()

    print(f"[bench] compiling cached train loop {h}x{w} B={b} x{n_iters} ...",
          file=sys.stderr, flush=True)
    val = float(np.asarray(loop(pred, opt_state, cache, jax.random.key(1))))
    assert np.isfinite(val), "non-finite training aux"
    t0 = time.perf_counter()
    float(np.asarray(loop(pred, opt_state, cache, jax.random.key(2))))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "train_cached_volumes_per_sec_per_chip",
        "value": round(b * n_iters / dt, 3),
        "unit": "volumes/s",
        "ms_per_step": round(dt / n_iters * 1e3, 1),
        "hw": hw,
        "vs_baseline": None,
    }))


def bench_train():
    """Training-step throughput (published UNet config).

    Defaults to the 128^2 dry-run scale; BENCH_TRAIN_HW=256 BENCH_BATCH=2
    measures the published 256^2x11 step (the PERF.md full-scale table,
    regenerable — VERDICT r2 #5), and BENCH_TRAIN_PHYSICS=1 adds the full
    physics-loss step (per-block remat through the frozen D3D). The step is
    jitted with the trainer's own (predictor, opt_state) donation
    (training/helper.py:157-171)."""
    import jax.numpy as jnp
    import optax

    from diffusion_model_project_tpu.training.steps import make_diffusion_train_step

    hw = int(os.environ.get("BENCH_TRAIN_HW", "128"))
    b, s, h, w = int(os.environ.get("BENCH_BATCH", "2")), 11, hw, hw
    physics = None
    if os.environ.get("BENCH_TRAIN_PHYSICS", "0") == "1":
        from diffusion_model_project_tpu.losses.physics import PhysicsLoss
        # all four terms active (the PERF.md "+ all physics losses" row)
        physics = PhysicsLoss(lambda_div=0.01, lambda_flow=0.001,
                              lambda_smooth=0.001, lambda_laplacian=0.001,
                              normalize_smoothness=True)
    pred = LatentDiffusionPredictor.create(
        dict(_PUBLISHED_UNET), rng=jax.random.key(0), num_slices=s,
        num_timesteps=1000, distance_transform=True, image_hw=(h, w),
    ).with_compute_dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))
    if physics is not None:
        pred = pred.set_normalizer({"input": [1.0],
                                    "output": [2.1e-2, 1.6e-2, 7.9e-3]})
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(pred.unet_params)
    step = make_diffusion_train_step(optimizer, physics=physics)

    r = np.random.default_rng(0)
    img = (r.random((b, s, 1, h, w)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    batch = {
        "img": jnp.asarray(img),
        "U_2d": jnp.asarray(r.standard_normal((b, s, 3, h, w)).astype(np.float32)),
        "U": jnp.asarray(r.standard_normal((b, s, 3, h, w)).astype(np.float32)),
    }
    n_iters = int(os.environ.get("BENCH_ITERS", "10"))

    # On-device scan of n_iters steps + ONE scalar transfer — the honest
    # axon barrier (block_until_ready returns early; see main()'s loop
    # comment / PERF.md methodology). Real training dispatches ahead
    # asynchronously, so the device-bound rate IS the steady-state rate.
    # Donation is implicit: the scan carry (pred, opt_state) is
    # double-buffered by XLA exactly like the trainer's donate_argnums.
    # batch leaves are chained through a scalar so nothing (EDT, E2D encode,
    # E3D encode_target) is loop-invariant — real training sees fresh data
    # every step and must pay those stages every step (see main()'s comment)
    @jax.jit
    def loop(pred, opt_state, batch, key):
        def body(carry, k):
            p, o, z = carry
            b = {name: leaf + z for name, leaf in batch.items()}
            p, o, aux = step(p, o, b, jax.random.fold_in(key, k))
            loss = jax.tree_util.tree_leaves(aux)[0]
            return (p, o, loss.astype(jnp.float32).ravel()[0] * 0), loss
        (p, o, z), auxes = jax.lax.scan(
            body, (pred, opt_state, jnp.float32(0)), jnp.arange(n_iters))
        return jnp.asarray(auxes).astype(jnp.float32).sum()

    print(f"[bench] compiling train loop {h}x{w} B={b} x{n_iters} "
          f"physics={physics is not None} ...", file=sys.stderr, flush=True)
    val = float(np.asarray(loop(pred, opt_state, batch, jax.random.key(1))))
    assert np.isfinite(val), "non-finite training aux"
    t0 = time.perf_counter()
    float(np.asarray(loop(pred, opt_state, batch, jax.random.key(2))))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": ("train_volumes_per_sec_per_chip" if physics is None
                   else "train_physics_volumes_per_sec_per_chip"),
        "value": round(b * n_iters / dt, 3),
        "unit": "volumes/s",
        "ms_per_step": round(dt / n_iters * 1e3, 1),
        "hw": hw,
        "vs_baseline": None,
    }))


def bench_train_vae(stage: int):
    """VAE trainer grad-step throughput at published scale (B=1, 256²×11,
    reference widths 128/256/512, latent 8) — the PERF.md stage-1/stage-2
    rows, regenerable. Measures the accumulation grad_step (the per-batch
    unit of work; apply_step runs once per 10/5 microbatches and is
    amortized), with the batch data-chained so every encode is paid."""
    import optax

    b = int(os.environ.get("BENCH_BATCH", "1"))
    s, hw = 11, int(os.environ.get("BENCH_TRAIN_HW", "256"))
    n_iters = int(os.environ.get("BENCH_ITERS", "5"))
    r = np.random.default_rng(0)
    mask = (r.random((b, 1, s, hw, hw)) > 0.3).astype(np.float32)

    if stage == 1:
        from diffusion_model_project_tpu.training.train_vae_stage1 import (
            Stage1VAE, make_steps)

        vae = Stage1VAE(in_channels=3, latent_channels=8)
        params = vae.init(jax.random.key(0), (b, s, hw, hw, 3))
        optimizer = optax.adam(1e-6)
        # boundary=False: the fused device step (round 5) degenerates to the
        # old grad-accumulate unit of work, keeping this row comparable
        # across rounds (the lax.cond's untaken apply branch costs ~nothing)
        train_step, _, _ = make_steps(
            vae, "normalized_mae_per_channel", optimizer, accum_steps=10)
        opt_state0 = optimizer.init(params)
        batch = {
            "velocity": jnp.asarray(
                r.standard_normal((b, 3, s, hw, hw)).astype(np.float32)),
            "microstructure": jnp.asarray(mask),
        }

        @jax.jit
        def loop(params, batch, key):
            g0 = jax.tree_util.tree_map(jnp.zeros_like, params)

            def body(carry, k):
                params, opt_state, g_acc, z = carry
                bz = {n: leaf + z for n, leaf in batch.items()}
                params, opt_state, g_acc, metrics = train_step(
                    params, opt_state, g_acc, bz, jax.random.fold_in(key, k),
                    jnp.float32(1e-3), False)
                loss = metrics["recons"].astype(jnp.float32)
                return (params, opt_state, g_acc, loss.ravel()[0] * 0), loss
            _, losses = jax.lax.scan(
                body, (params, opt_state0, g0, jnp.float32(0)),
                jnp.arange(n_iters))
            return losses.sum()
    else:
        from diffusion_model_project_tpu.models.vae import DualBranchVAE
        from diffusion_model_project_tpu.training.train_vae_stage2 import (
            make_steps)

        # same remat config as the real stage-2 trainer (it differentiates
        # through E2D, D2D AND the frozen D3D at full 256^2)
        vae = DualBranchVAE(latent_channels=8, remat_encoders=True,
                            remat_decoders=True)
        dummy = jnp.zeros((1, s, 32, 32, 3), jnp.float32)
        full = jax.jit(lambda k1, k2: vae.init(
            {"params": k1, "sample": k2}, dummy, dummy)["params"])(
            jax.random.key(0), jax.random.key(1))
        trainable = {k: full[k] for k in ("encoder_2d", "decoder_2d")}
        frozen = {k: full[k] for k in ("encoder_3d", "decoder_3d")}
        optimizer = optax.adam(1e-6)
        # boundary=False: see the stage-1 note above
        train_step, _, _ = make_steps(
            vae, "normalized_mae_per_channel", optimizer,
            lambda_align=5.0, lambda_cross=50.0, accum_steps=5)
        opt_state0 = optimizer.init(trainable)
        v2 = r.standard_normal((b, 3, s, hw, hw)).astype(np.float32)
        v2[:, 2] = 0.0
        batch = {
            "velocity_2d": jnp.asarray(v2),
            "mask_2d": jnp.asarray(mask),
            "velocity_3d": jnp.asarray(
                r.standard_normal((b, 3, s, hw, hw)).astype(np.float32)),
            "mask_3d": jnp.asarray(mask),
        }

        # frozen must be a runtime ARGUMENT, not a closure: closed-over real
        # params serialize as literal constants in the compile payload and
        # the tunnel's remote_compile rejects the request with HTTP 413.
        @jax.jit
        def loop4(trainable, frozen, batch, key):
            g0 = jax.tree_util.tree_map(jnp.zeros_like, trainable)

            def body(carry, k):
                trainable, opt_state, g_acc, z = carry
                bz = {n: leaf + z for n, leaf in batch.items()}
                trainable, opt_state, g_acc, metrics = train_step(
                    trainable, opt_state, g_acc, frozen, bz, False)
                loss = metrics["recons_2d"].astype(jnp.float32)
                return (trainable, opt_state, g_acc, loss.ravel()[0] * 0), loss
            _, losses = jax.lax.scan(
                body, (trainable, opt_state0, g0, jnp.float32(0)),
                jnp.arange(n_iters))
            return losses.sum()

        def loop(trainable, batch, key):
            return loop4(trainable, frozen, batch, key)

    print(f"[bench] compiling stage-{stage} VAE grad loop {hw}x{hw} B={b} "
          f"x{n_iters} ...", file=sys.stderr, flush=True)
    val = float(np.asarray(loop(trainable if stage == 2 else params,
                                batch, jax.random.key(1))))
    assert np.isfinite(val), "non-finite VAE loss"
    t0 = time.perf_counter()
    float(np.asarray(loop(trainable if stage == 2 else params,
                          batch, jax.random.key(2))))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"train_vae_stage{stage}_volumes_per_sec_per_chip",
        "value": round(b * n_iters / dt, 3),
        "unit": "volumes/s",
        "ms_per_step": round(dt / n_iters * 1e3, 1),
        "hw": hw,
        "vs_baseline": None,
    }))


def make_timing_loop(one, n_iters: int, *, chain_inputs: bool = True):
    """The canonical honest timing loop (PERF.md "Measurement methodology"):
    a single jitted ``lax.scan`` of ``one(pred, img, v2d, rng)`` that

      1. returns a SCALAR derived from every iteration's output — fetching
         it (``float(np.asarray(loop(...)))``) is a device->host transfer,
         the only real barrier on this backend (hazard #1:
         block_until_ready returns early);
      2. chains EVERY input through the scan carry (``img + carry*0``) so no
         pipeline stage is loop-invariant (hazard #2: XLA hoists an
         unchained conditioning encode out of the scan and the measurement
         silently drops that stage).

    ``chain_inputs=False`` exists ONLY for tests/test_bench_guard.py, which
    proves hazard #2 is real by counting the convolutions left inside the
    compiled loop body when inputs are not chained."""
    @jax.jit
    def loop(pred, img, v2d, key):
        def body(carry, k):
            z = carry if chain_inputs else jnp.float32(0)
            out = one(pred, img + z * 0, v2d + z * 0,
                      jax.random.fold_in(key, k))
            return out.ravel()[0].astype(jnp.float32), jnp.sum(
                jnp.isfinite(out)).astype(jnp.float32)
        c, finite_counts = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(n_iters))
        return c * 0 + finite_counts.min()

    return loop


def main():
    mode = os.environ.get("BENCH_MODE", "infer")
    if mode == "train_vae1":
        return bench_train_vae(1)
    if mode == "train_vae2":
        return bench_train_vae(2)
    if mode == "train":
        return bench_train()
    if mode == "train_cached":
        return bench_train_cached()
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

    def one(pred, img, v2d, rng):
        if sampler == "dpm":
            return pred.predict_dpm(img, v2d, num_steps=DDIM_STEPS, rng=rng)
        return pred.predict_ddim(img, v2d, num_steps=DDIM_STEPS, eta=0.0, rng=rng)

    n_iters = int(os.environ.get("BENCH_ITERS", "5"))

    # The timing loop runs ON DEVICE as a lax.scan of n_iters end-to-end
    # pipeline calls (data-chained so none can be elided), closed by ONE
    # scalar device->host transfer. Two reasons (PERF.md methodology):
    #   1. honesty — jax.block_until_ready returns EARLY on axon even for
    #      chained host-loop dispatches (a 256^2 train step "timed" at 3.4 ms
    #      vs 295 ms real); only a transfer is a true barrier;
    #   2. throughput — host-dispatched loops leave a ~25 ms tunnel bubble
    #      per dispatch between iterations (1.13 s/iter vs 0.87 s/iter
    #      measured); a production server keeps the device queue full, which
    #      the on-device loop models and a host loop does not.
    # EVERY input is chained through the carry: leaving v2d loop-invariant
    # lets XLA hoist the whole E2D encode out of the scan, silently dropping
    # a ~30% stage of the pipeline from the measurement (observed: 9.28
    # "vol/s" with v2d unchained vs ~7 with it chained — serving always pays
    # the encode, so the chained number is the honest one).
    loop = make_timing_loop(one, n_iters)

    print(
        f"[bench] compiling e2e {sampler}-{DDIM_STEPS} B={BATCH} x{n_iters} "
        f"(cache: {os.environ['JAX_COMPILATION_CACHE_DIR']}, "
        f"nproc={os.cpu_count()}) ...", file=sys.stderr, flush=True)
    t_c = time.perf_counter()
    finite = float(np.asarray(loop(pred, img, v2d, jax.random.key(1))))
    assert finite == float(np.prod([BATCH, S, 3, H, W])), "non-finite output"
    print(f"[bench] compile+warmup done in {time.perf_counter() - t_c:.1f}s",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    float(np.asarray(loop(pred, img, v2d, jax.random.key(2))))
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
