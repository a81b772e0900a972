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


def test_stage1_fused_epoch_scan_matches_per_step():
    """The fused-epoch lax.scan (make_epoch_steps) must reproduce the
    per-step dispatched loop given IDENTICAL inputs — same gathered batches,
    same step keys, same boundary flags, including a NaN batch landing on an
    accumulation boundary. SGD on purpose: its update is LINEAR in the
    gradient, so the comparison stays tight — Adam's m/(sqrt(v)+eps) turns a
    last-ulp gradient difference on a noise-gradient bias into a full
    +-lr*sign flip on the very first apply, which says nothing about the
    scan's semantics (the CLI-level tests cover Adam end-to-end at loss
    precision)."""
    from diffusion_model_project_tpu.training.train_vae_stage1 import (
        Stage1VAE, make_epoch_steps, make_steps, stacked_to_dicts)

    vae = Stage1VAE(in_channels=3, latent_channels=4, features=(32, 32, 32))
    params0 = vae.init(jax.random.key(0), (1, 3, 8, 8, 3))
    opt = optax.sgd(1e-2)
    accum, kl = 3, 1e-3
    batches = _stage1_batches(n=6, nan_at=(2,))
    rngs = _rngs(6)
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)

    # per-step dispatched loop
    train_step, _, _ = make_steps(vae, "normalized_mae_per_channel", opt,
                                  accum_steps=accum)
    params, opt_state = copy(params0), opt.init(copy(params0))
    g = jax.tree_util.tree_map(jnp.zeros_like, params)
    ms = []
    for i, (b, r) in enumerate(zip(batches, rngs)):
        params, opt_state, g, m = train_step(
            params, opt_state, g, b, r, kl, (i + 1) % accum == 0)
        ms.append(m)
    ref = jax.device_get((params, opt_state, g))
    ref_m = jax.device_get(ms)
    assert [bool(m["bad"]) for m in ref_m] == [False, False, True,
                                               False, False, False]

    # fused-epoch scan over a device store of the SAME rows
    store = {k: jnp.concatenate([b[k] for b in batches], axis=0)
             for k in batches[0]}
    tr_epoch, _ = make_epoch_steps(vae, "normalized_mae_per_channel", opt,
                                   accum_steps=accum)
    p2, o2, g2, stacked = tr_epoch(
        copy(params0), opt.init(copy(params0)),
        jax.tree_util.tree_map(jnp.zeros_like, params0), store,
        jnp.arange(6).reshape(6, 1), jnp.stack(rngs),
        jnp.asarray([(i + 1) % accum == 0 for i in range(6)]), kl)
    got = jax.device_get((p2, o2, g2))
    _tree_allclose(ref, got, rtol=1e-5, atol=1e-6)
    for a, b in zip(ref_m, jax.device_get(stacked_to_dicts(stacked))):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-7,
                                       err_msg=k)


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


# ---------------------------------------------------------------- round 5:
# --cache-data (device-resident volumes, shuffle-stream replay) must be a
# pure transport change: same batches, same order, same optimizer updates


def test_loader_shuffle_order_replays_numpy_loader():
    from diffusion_model_project_tpu.data.dataset import NumpyLoader
    from diffusion_model_project_tpu.training.train_vae_stage1 import (
        loader_shuffle_order)

    class Idx:
        def __len__(self):
            return 11

        def __getitem__(self, i):
            return {"x": np.asarray([i], np.int64)}

    loader = NumpyLoader(Idx(), batch_size=3, shuffle=True, seed=2024)
    for epoch in (0, 2, 5):
        loader.set_epoch(epoch)
        seen = np.concatenate([b["x"][:, 0] for b in loader])
        np.testing.assert_array_equal(
            seen, loader_shuffle_order(11, 2024, epoch, shuffle=True))


def test_stage1_cache_data_equals_streaming(shared_data_dir, tmp_path):
    """Training with --cache-data true must reproduce the streaming path
    exactly (same jitted step fed bit-identical batches in the same order):
    identical vae_log.json losses, identical final weights."""
    import json
    import os.path as osp

    from flax import serialization
    from diffusion_model_project_tpu.training.train_vae_stage1 import main

    logs, params = [], []
    for mode in ("false", "true"):
        out = str(tmp_path / f"s1_{mode}")
        main(["--dataset-dir", shared_data_dir, "--save-dir", out,
              "--latent-channels", "4", "--batch-size", "2",
              "--num-epochs", "3", "--grad-accum", "2",
              "--features", "32", "64", "64",
              "--data-parallel", "false", "--cache-data", mode])
        logs.append(json.load(open(osp.join(out, "vae_log.json"))))
        with open(osp.join(out, "vae.msgpack"), "rb") as f:
            params.append(serialization.msgpack_restore(f.read()))
    # the fused-epoch scan body is a SEPARATE XLA program from the
    # per-step jit, so fusion can differ in the last ulp: assert to 1e-5,
    # not bitwise (same caveat as the cached-latents docs)
    for k in logs[0]["loss"]:
        np.testing.assert_allclose(logs[0]["loss"][k], logs[1]["loss"][k],
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    a = jax.tree_util.tree_leaves(params[0])
    b = jax.tree_util.tree_leaves(params[1])
    assert len(a) == len(b)
    # Adam normalizes per-weight step sizes, so a last-ulp gradient
    # difference on a near-zero weight walks it O(lr)=1e-4 per epoch even
    # though the losses agree to 1e-6; the strict scan-vs-step equality
    # lives in test_stage1_fused_epoch_scan_matches_per_step
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=1e-2, atol=5e-4)


def test_stage2_cache_data_equals_streaming(shared_data_dir,
                                            shared_stage1_dir, tmp_path):
    import json
    import os.path as osp

    from flax import serialization
    from diffusion_model_project_tpu.training.train_vae_stage2 import main

    logs, params = [], []
    for mode in ("false", "true"):
        out = str(tmp_path / f"s2_{mode}")
        main(["--dataset-dir", shared_data_dir,
              "--stage1-checkpoint", shared_stage1_dir, "--save-dir", out,
              "--latent-channels", "4", "--batch-size", "2",
              "--num-epochs", "2", "--grad-accum", "2",
              "--data-parallel", "false", "--cache-data", mode])
        logs.append(json.load(open(osp.join(out, "vae_log.json"))))
        with open(osp.join(out, "model.msgpack"), "rb") as f:
            params.append(serialization.msgpack_restore(f.read()))
    for k in logs[0]["loss"]:
        np.testing.assert_allclose(logs[0]["loss"][k], logs[1]["loss"][k],
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    for x, y in zip(jax.tree_util.tree_leaves(params[0]),
                    jax.tree_util.tree_leaves(params[1])):
        np.testing.assert_allclose(x, y, rtol=1e-2, atol=5e-4)


def test_stage1_ckpt_freq_gates_writes_and_final_epoch(shared_data_dir,
                                                       tmp_path):
    """--ckpt-freq 3 over 4 epochs: the set writes at epochs 0 and 3 (final),
    the log still carries all 4 epochs, train_state resumes from epoch 3."""
    import json
    import os.path as osp

    from flax import serialization
    from diffusion_model_project_tpu.training.train_vae_stage1 import main

    out = str(tmp_path / "s1_freq")
    main(["--dataset-dir", shared_data_dir, "--save-dir", out,
          "--latent-channels", "4", "--batch-size", "2",
          "--num-epochs", "4", "--grad-accum", "2",
          "--features", "32", "64", "64",
          "--data-parallel", "false", "--ckpt-freq", "3"])
    log = json.load(open(osp.join(out, "vae_log.json")))
    assert len(log["loss"]["recons_train"]) == 4
    with open(osp.join(out, "train_state.msgpack"), "rb") as f:
        state = serialization.msgpack_restore(f.read())
    assert int(state["epoch"]) == 3
    assert osp.exists(osp.join(out, "best_model.msgpack"))
