"""Device-side VAE train step semantics (VERDICT r4 next-round item 1).

The round-5 redesign moves the reference's per-batch host decisions —
skip-batch on NaN, optimizer-step-on-accum-boundary, KL-explosion abort
(reference train_3d_vae_only.py:399-456, train_2d_with_cross.py:433-480) —
into ONE jitted step (`train_step(..., boundary)` with a lax.cond apply) plus
an epoch-end host scan of the fetched metrics (`scan_train_metrics`). These
tests prove the fused path is numerically the round-4 host-side path on
crafted NaN / KL-explosion batch sequences:

  - host path: `train_step(..., boundary=False)` degenerates to the old
    grad-accumulate step (the cond never fires); the test then replays the
    old host logic (fetch `bad`, apply via apply_step on boundaries).
  - fused path: same batches/rngs with real boundary flags, zero per-batch
    fetches.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def _tree_allclose(a, b, rtol=1e-6, atol=1e-7):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def _stage1_setup():
    from diffusion_model_project_tpu.training.train_vae_stage1 import (
        Stage1VAE, make_steps)

    vae = Stage1VAE(in_channels=3, latent_channels=4,
                    features=(32, 32, 32))
    params = vae.init(jax.random.key(0), (1, 3, 8, 8, 3))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    steps = make_steps(vae, "normalized_mae_per_channel", optimizer,
                       accum_steps=3)
    return params, opt_state, steps


def _stage1_batches(n=7, nan_at=(2,)):
    r = np.random.default_rng(7)
    batches = []
    for i in range(n):
        v = r.standard_normal((1, 3, 3, 8, 8)).astype(np.float32)
        if i in nan_at:
            v[0, 0, 0, 0, 0] = np.nan
        m = (r.random((1, 1, 3, 8, 8)) > 0.3).astype(np.float32)
        batches.append({"velocity": jnp.asarray(v),
                        "microstructure": jnp.asarray(m)})
    return batches


def _rngs(n, seed=11):
    return [jax.random.fold_in(jax.random.key(seed), k) for k in range(n)]


def test_stage1_fused_step_matches_host_path():
    """NaN batch ON an accum boundary (i=2 with accum=3): the fused lax.cond
    must suppress the optimizer step exactly like the old host-side
    `if not skipped and (i+1) % accum == 0`, and the trailing window applies
    identically."""
    accum = 3
    kl_coeff = 1e-3
    batches = _stage1_batches(n=7, nan_at=(2,))
    rngs = _rngs(len(batches))

    # ---- host path (round-4 semantics, boundary decisions on host) --------
    params, opt_state, (train_step, apply_step, _) = _stage1_setup()
    g_acc = jax.tree_util.tree_map(jnp.zeros_like, params)
    host_bads = []
    for i, (b, r) in enumerate(zip(batches, rngs)):
        params, opt_state, g_acc, metrics = train_step(
            params, opt_state, g_acc, b, r, kl_coeff, False)
        bad = bool(metrics["bad"])
        host_bads.append(bad)
        if not bad and (i + 1) % accum == 0:
            params, opt_state = apply_step(params, opt_state, g_acc)
            g_acc = jax.tree_util.tree_map(jnp.zeros_like, params)
    if len(batches) % accum != 0:
        params, opt_state = apply_step(params, opt_state, g_acc)
        g_acc = jax.tree_util.tree_map(jnp.zeros_like, params)
    host = (params, opt_state, g_acc)

    # ---- fused path (device-side boundary decision, no per-batch fetch) ---
    params, opt_state, (train_step, apply_step, _) = _stage1_setup()
    g_acc = jax.tree_util.tree_map(jnp.zeros_like, params)
    metricses = []
    for i, (b, r) in enumerate(zip(batches, rngs)):
        params, opt_state, g_acc, metrics = train_step(
            params, opt_state, g_acc, b, r, kl_coeff,
            (i + 1) % accum == 0)
        metricses.append(metrics)
    fetched = jax.device_get(metricses)
    if len(batches) % accum != 0:
        params, opt_state = apply_step(params, opt_state, g_acc)
        g_acc = jax.tree_util.tree_map(jnp.zeros_like, params)

    assert [bool(m["bad"]) for m in fetched] == host_bads
    assert host_bads[2] and sum(host_bads) == 1
    _tree_allclose(host, (params, opt_state, g_acc))


def test_stage1_scan_train_metrics_skip_and_kl_abort():
    """scan_train_metrics replays the reference's host loop over fetched
    metrics: skips excluded from sums, first KL explosion stops the scan
    (the reference sys.exit(1)s there — nothing after it is observable)."""
    from diffusion_model_project_tpu.training.train_vae_stage1 import (
        scan_train_metrics)

    def m(recons, kl, bad=False):
        return {"recons": np.float32(recons), "kl": np.float32(kl),
                "bad": np.bool_(bad)}

    # no explosion: skip excluded, sums over the rest
    rs, ks, skipped, exploded = scan_train_metrics(
        [m(1.0, 2.0), m(9.9, 9.9, bad=True), m(3.0, 4.0)])
    assert (rs, ks) == (4.0, 6.0)
    assert skipped == [1] and exploded is None

    # explosion at index 2: sums stop THERE (index-3 batch never counted),
    # exploded carries the offending raw KL for the error message
    rs, ks, skipped, exploded = scan_train_metrics(
        [m(1.0, 2.0), m(2.0, 999.0), m(0.5, 5000.0), m(7.0, 1.0)])
    assert (rs, ks) == (3.0, 1001.0)
    assert skipped == [] and exploded == 5000.0

    # a bad batch's KL is NOT an explosion (reference checks skip first)
    rs, ks, skipped, exploded = scan_train_metrics(
        [m(1.0, 2.0), m(0.0, 1e9, bad=True)])
    assert (rs, ks) == (1.0, 2.0)
    assert skipped == [1] and exploded is None


def _stage2_setup():
    from diffusion_model_project_tpu.models.vae import DualBranchVAE
    from diffusion_model_project_tpu.training.train_vae_stage2 import (
        make_steps)

    vae = DualBranchVAE(in_channels=3, latent_channels=4,
                        features=(32, 32, 32))
    dummy = jnp.zeros((1, 3, 8, 8, 3), jnp.float32)
    full = jax.jit(lambda k1, k2: vae.init(
        {"params": k1, "sample": k2}, dummy, dummy)["params"])(
        jax.random.key(0), jax.random.key(1))
    trainable = {k: full[k] for k in ("encoder_2d", "decoder_2d")}
    frozen = {k: full[k] for k in ("encoder_3d", "decoder_3d")}
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(trainable)
    steps = make_steps(vae, "normalized_mae_per_channel", optimizer,
                       lambda_align=5.0, lambda_cross=50.0, accum_steps=2)
    return trainable, frozen, opt_state, steps


def _stage2_batches(n=5, nan_at=(1,)):
    r = np.random.default_rng(3)
    batches = []
    for i in range(n):
        v2 = r.standard_normal((1, 3, 3, 8, 8)).astype(np.float32)
        v2[:, 2] = 0.0
        if i in nan_at:
            v2[0, 0, 0, 0, 0] = np.nan
        v3 = r.standard_normal((1, 3, 3, 8, 8)).astype(np.float32)
        m = (r.random((1, 1, 3, 8, 8)) > 0.3).astype(np.float32)
        batches.append({
            "velocity_2d": jnp.asarray(v2), "mask_2d": jnp.asarray(m),
            "velocity_3d": jnp.asarray(v3), "mask_3d": jnp.asarray(m)})
    return batches


def test_stage2_fused_step_matches_host_path():
    """NaN batch on the accum=2 boundary at i=1; trailing window at the odd
    end. Fused == host-side round-4 path."""
    accum = 2
    batches = _stage2_batches(n=5, nan_at=(1,))

    trainable, frozen, opt_state, (train_step, apply_step, _) = _stage2_setup()
    g_acc = jax.tree_util.tree_map(jnp.zeros_like, trainable)
    host_bads = []
    for i, b in enumerate(batches):
        trainable, opt_state, g_acc, metrics = train_step(
            trainable, opt_state, g_acc, frozen, b, False)
        bad = bool(metrics["bad"])
        host_bads.append(bad)
        if not bad and (i + 1) % accum == 0:
            trainable, opt_state = apply_step(trainable, opt_state, g_acc)
            g_acc = jax.tree_util.tree_map(jnp.zeros_like, trainable)
    if len(batches) % accum != 0:
        trainable, opt_state = apply_step(trainable, opt_state, g_acc)
    host = (trainable, opt_state)

    trainable, frozen, opt_state, (train_step, apply_step, _) = _stage2_setup()
    g_acc = jax.tree_util.tree_map(jnp.zeros_like, trainable)
    metricses = []
    for i, b in enumerate(batches):
        trainable, opt_state, g_acc, metrics = train_step(
            trainable, opt_state, g_acc, frozen, b,
            (i + 1) % accum == 0)
        metricses.append(metrics)
    fetched = jax.device_get(metricses)
    if len(batches) % accum != 0:
        trainable, opt_state = apply_step(trainable, opt_state, g_acc)

    assert [bool(m["bad"]) for m in fetched] == host_bads
    assert host_bads[1] and sum(host_bads) == 1
    _tree_allclose(host, (trainable, opt_state))


def test_stage2_scan_train_metrics_excludes_skips():
    from diffusion_model_project_tpu.training.train_vae_stage2 import (
        scan_train_metrics)

    def m(bad=False, **kw):
        out = {k: np.float32(v) for k, v in kw.items()}
        out["bad"] = np.bool_(bad)
        return out

    running, skipped = scan_train_metrics([
        m(recons_2d=1.0, align=2.0, cross=3.0, kl_2d=0.0),
        m(bad=True, recons_2d=9.0, align=9.0, cross=9.0, kl_2d=9.0),
        m(recons_2d=0.5, align=0.5, cross=0.5, kl_2d=0.0),
    ])
    assert skipped == [1]
    assert running == {"recons_2d": 1.5, "align": 2.5, "cross": 3.5,
                       "kl_2d": 0.0}
