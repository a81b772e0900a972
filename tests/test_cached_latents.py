"""--cache-latents: device-resident latent training (round 4).

The VAE is frozen during diffusion training (reference predictor.py:604-607),
so per-sample latents are constant across epochs; the cached path encodes
once and must reproduce the regular per-batch path numerically (same rng
split order as predictor.forward -> identical draws and op order; asserted
to rtol 1e-5/1e-6, not bitwise — the encode's separate jit may fuse
differently in the last ulp)."""
import json
import os.path as osp
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

REPO = osp.abspath(osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, REPO)

from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor
from diffusion_model_project_tpu.training.steps import (
    cached_latent_loss_fn,
    diffusion_loss_fn,
    precompute_latent_cache,
)

S, H, W, B = 3, 16, 16, 2


@pytest.fixture(scope="module")
def pred():
    kw = dict(in_channels=9, out_channels=4, features=(8, 16), kernel_size=3,
              padding_mode="zeros", activation="silu", final_activation=None,
              attention="", dropout=0.0, time_embedding_dim=16)
    return LatentDiffusionPredictor.create(
        dict(kw), rng=jax.random.key(0), num_slices=S, num_timesteps=20,
        distance_transform=True, image_hw=(H, W), vae_features=(32, 32, 32),
    ).set_normalizer({"input": [1.0], "output": [2.0, 3.0, 4.0]})


@pytest.fixture(scope="module")
def raw_batch():
    r = np.random.default_rng(0)
    img = (r.random((B, S, 1, H, W)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    return {
        "img": jnp.asarray(img),
        "U_2d": jnp.asarray(r.standard_normal((B, S, 3, H, W)).astype(np.float32)),
        "U": jnp.asarray(r.standard_normal((B, S, 3, H, W)).astype(np.float32)),
    }


def test_cached_loss_and_grads_match_regular_path(pred, raw_batch):
    """cached_latent_loss_fn(params, pred, cache, rng) must equal
    diffusion_loss_fn(params, pred, raw, rng) to ~1e-6: same rng split
    order, same channels-last shapes, same q_sample -> UNet -> cost."""
    cache = jax.jit(precompute_latent_cache)(pred, raw_batch)
    assert cache["x0"].shape == (B, S, H // 4, W // 4, pred.latent_channels)
    assert cache["m"].shape[-1] == 1

    rng = jax.random.key(42)
    loss_ref, aux_ref = jax.jit(
        lambda p, b, r: diffusion_loss_fn(pred.unet_params, p, b, r)
    )(pred, raw_batch, rng)
    loss_c, aux_c = jax.jit(
        lambda p, b, r: cached_latent_loss_fn(pred.unet_params, p, b, r)
    )(pred, cache, rng)
    np.testing.assert_allclose(float(loss_c), float(loss_ref), rtol=1e-6)

    g_ref = jax.jit(jax.grad(
        lambda w, p, b, r: diffusion_loss_fn(w, p, b, r)[0]
    ))(pred.unet_params, pred, raw_batch, rng)
    g_c = jax.jit(jax.grad(
        lambda w, p, b, r: cached_latent_loss_fn(w, p, b, r)[0]
    ))(pred.unet_params, pred, cache, rng)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def _copy_tree(t):
    """Deep-copy a pytree's buffers: run_epoch_cached DONATES its predictor/
    opt_state, which would delete the module-scoped fixture's arrays for
    every later test."""
    return jax.tree_util.tree_map(lambda x: jnp.array(x), t)


def test_cached_epoch_trains(pred, raw_batch):
    """run_epoch_cached: losses finite, params actually move, and the
    device-side shuffle draws differently across epochs."""
    from diffusion_model_project_tpu.training.helper import run_epoch_cached

    cache = jax.jit(precompute_latent_cache)(pred, raw_batch)
    caches = (cache, cache)
    opt = optax.adam(1e-3)
    opt_state = opt.init(pred.unet_params)
    step_cache = {}
    p0 = jax.tree_util.tree_leaves(pred.unet_params)[0].copy()
    p, o, tr, vl, metrics = run_epoch_cached(
        caches, _copy_tree(pred), opt_state, opt, rng=jax.random.key(1),
        batch_size=1, _step_cache=step_cache)
    assert np.isfinite(tr) and np.isfinite(vl)
    assert metrics == {}
    p1 = jax.tree_util.tree_leaves(p.unet_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # second epoch reuses the jitted steps from the cache
    assert "train_latent" in step_cache and "eval_latent" in step_cache
    p, o, tr2, vl2, _ = run_epoch_cached(
        caches, p, o, opt, rng=jax.random.key(2), batch_size=1,
        _step_cache=step_cache)
    assert np.isfinite(tr2) and np.isfinite(vl2)


def _shared_args():
    from conftest import SHARED_UNET_ARGS
    return SHARED_UNET_ARGS


def test_cache_latents_cli(shared_data_dir, shared_stage1_dir,
                           shared_stage2_dir, tmp_path):
    import os

    import train as train_cli
    save_dir = str(tmp_path / "runs")
    train_cli.main([
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        *_shared_args(), "--batch-size", "2", "--num-epochs", "3",
        "--vae-encoder-path", shared_stage2_dir,
        "--vae-decoder-path", shared_stage1_dir,
        "--shuffle", "true", "--data-parallel", "false",
        "--cache-latents", "true",
        # every-2nd-epoch checkpointing (round 4): epoch 1 skips the write,
        # epoch 2 writes as the final epoch — the log must still carry all 3
        "--ckpt-freq", "2",
    ])
    runs = [d for d in os.listdir(save_dir) if osp.isdir(osp.join(save_dir, d))]
    assert len(runs) == 1
    run_dir = osp.join(save_dir, runs[0])
    log = json.load(open(osp.join(run_dir, "log.json")))
    assert len(log["epoch"]) == 3
    assert np.isfinite(log["train_loss"]).all()
    assert np.isfinite(log["val_loss"]).all()
    assert osp.exists(osp.join(run_dir, "model.msgpack"))
    assert osp.exists(osp.join(run_dir, "best_model.msgpack"))
    assert osp.exists(osp.join(run_dir, "train_state.msgpack"))
    # physics metrics keep the reference key set, zero-filled
    assert all(v == [0.0, 0.0, 0.0] for v in log["physics_metrics"].values())


def test_cache_latents_rejects_physics_and_weight_sharding(
        shared_data_dir, shared_stage1_dir, shared_stage2_dir, tmp_path):
    import train as train_cli
    base = [
        "--root-dir", shared_data_dir, "--save-dir", str(tmp_path / "r"),
        *_shared_args(), "--batch-size", "2", "--num-epochs", "1",
        "--vae-encoder-path", shared_stage2_dir,
        "--vae-decoder-path", shared_stage1_dir,
        "--data-parallel", "false", "--cache-latents", "true",
    ]
    with pytest.raises(ValueError, match="physics|velocity"):
        train_cli.main(base + ["--lambda-div", "0.1"])
    # weight-sharding layouts don't compose with the cached path (the cache
    # shards over 'data' only); the pure data mesh DOES (tests below)
    with pytest.raises(ValueError, match="data mesh"):
        train_cli.main(base[:-4] + ["--data-parallel", "true",
                                    "--cache-latents", "true",
                                    "--fsdp", "true"])


# ---------------------------------------------------------------- round 5:
# flip-variant cache (--cache-latents + --augment) and the sharded cache
# (--cache-latents under the data mesh) — VERDICT r4 items 4 and 5


def _np_flip_batch(batch, fh, fz):
    """The dataset's augmentation applied in numpy (the regular path's
    ground truth, data/dataset.py:277-303): flip-H mirrors H and negates vy;
    flip-Z mirrors the slice axis and negates vz."""
    out = {k: np.asarray(v).copy() for k, v in batch.items()}
    for k in out:
        if fh:
            out[k] = np.flip(out[k], axis=-2).copy()
        if fz:
            out[k] = np.flip(out[k], axis=1).copy()
    for k in ("U_2d", "U"):
        if fh:
            out[k][:, :, 1] = -out[k][:, :, 1]
        if fz:
            out[k][:, :, 2] = -out[k][:, :, 2]
    return {k: jnp.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize("fh,fz", [(True, False), (False, True), (True, True)])
def test_flip_variant_batch_matches_dataset_flips(raw_batch, fh, fz):
    from diffusion_model_project_tpu.training.steps import flip_variant_batch

    ref = _np_flip_batch(raw_batch, fh, fz)
    got = jax.jit(flip_variant_batch, static_argnums=(1, 2))(raw_batch, fh, fz)
    for k in ("img", "U_2d", "U"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]))


@pytest.mark.parametrize("fh,fz", [(True, False), (False, True), (True, True)])
def test_cached_flip_loss_matches_regular_on_flipped_batch(pred, raw_batch,
                                                           fh, fz):
    """The flip-variant cache row must reproduce diffusion_loss_fn on the
    AUGMENTED raw batch — i.e. encoding a flipped volume once gives the same
    loss as the regular path flipping + encoding it every epoch."""
    from diffusion_model_project_tpu.training.steps import flip_variant_batch

    flipped_raw = _np_flip_batch(raw_batch, fh, fz)
    cache = jax.jit(lambda p, b: precompute_latent_cache(
        p, flip_variant_batch(b, fh, fz)))(pred, raw_batch)
    rng = jax.random.key(3)
    loss_ref, _ = jax.jit(
        lambda p, b, r: diffusion_loss_fn(pred.unet_params, p, b, r)
    )(pred, flipped_raw, rng)
    loss_c, _ = jax.jit(
        lambda p, b, r: cached_latent_loss_fn(pred.unet_params, p, b, r)
    )(pred, cache, rng)
    np.testing.assert_allclose(float(loss_c), float(loss_ref), rtol=1e-6)


def _tiny_flow_dataset(n=5, s=3, hw=8, augment=True):
    from diffusion_model_project_tpu.data.dataset import MicroFlowDataset

    r = np.random.default_rng(7)
    data = {
        "microstructure": (r.random((n, s, 1, hw, hw)) > 0.3).astype(np.float32),
        "velocity": r.standard_normal((n, s, 3, hw, hw)).astype(np.float32),
        "velocity_input": r.standard_normal((n, s, 3, hw, hw)).astype(np.float32),
        "pressure": r.standard_normal((n, s, 1, hw, hw)).astype(np.float32),
        "dxyz": np.full((n, 3), 1e-6, np.float32),
    }
    return MicroFlowDataset("/nonexistent-unused", augment=augment,
                            use_3d=True, data=data)


def test_flip_variant_draws_replay_dataset_augmentation():
    """flip_variant_draws must predict exactly the flips the dataset applies
    in __getitem__ for the same epoch — the contract that makes the cached
    augmented epoch select the very samples the regular loader yields."""
    from diffusion_model_project_tpu.training.helper import flip_variant_draws

    ds = _tiny_flow_dataset(n=6)
    for epoch in (0, 3):
        v = flip_variant_draws(ds, epoch)  # also calls ds.set_epoch(epoch)
        assert v.shape == (6,) and set(np.unique(v)) <= {0, 1, 2, 3}
        for i in range(len(ds)):
            got = ds[i]
            ds.augment = False
            raw = ds[i]
            ds.augment = True
            fh, fz = bool(v[i] & 1), bool(v[i] & 2)
            exp_u = raw["velocity"].copy()
            if fh:
                exp_u = np.flip(exp_u, axis=-2).copy()
                exp_u[:, 1] = -exp_u[:, 1]
            if fz:
                exp_u = np.flip(exp_u, axis=0).copy()
                exp_u[:, 2] = -exp_u[:, 2]
            np.testing.assert_array_equal(got["velocity"], exp_u)


def test_cached_epoch_mesh_matches_single_device(pred):
    """run_epoch_cached over the row-sharded cache on the 8-device mesh must
    match the unsharded single-mesh path numerically: same rng -> same perm
    -> same batches; only the psum reduction order differs."""
    from diffusion_model_project_tpu.parallel import make_mesh
    from diffusion_model_project_tpu.training.helper import (
        _shard_cache_rows, run_epoch_cached)

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    n = 16
    r = np.random.default_rng(5)
    img = (r.random((n, S, 1, H, W)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    big_raw = {
        "img": jnp.asarray(img),
        "U_2d": jnp.asarray(r.standard_normal((n, S, 3, H, W)).astype(np.float32)),
        "U": jnp.asarray(r.standard_normal((n, S, 3, H, W)).astype(np.float32)),
    }
    cache = jax.device_get(jax.jit(precompute_latent_cache)(pred, big_raw))
    cache = {k: jnp.asarray(v) for k, v in cache.items()}
    opt = optax.adam(1e-3)

    def one_epoch(mesh):
        c = ({k: jnp.asarray(v) for k, v in cache.items()} if mesh is None
             else _shard_cache_rows(
                 {k: jnp.asarray(v) for k, v in cache.items()}, mesh))
        p, o, tr, vl, _ = run_epoch_cached(
            (c, c), _copy_tree(pred), opt.init(pred.unet_params), opt,
            rng=jax.random.key(11), batch_size=8, _step_cache={},
            mesh=mesh, n_train=n, n_val=n)
        return jax.device_get(p.unet_params), tr, vl

    p1, tr1, vl1 = one_epoch(None)
    p8, tr8, vl8 = one_epoch(make_mesh(("data",)))
    np.testing.assert_allclose(tr8, tr1, rtol=1e-5)
    np.testing.assert_allclose(vl8, vl1, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_cache_latents_cli_augment_and_mesh(
        shared_data_dir, shared_stage1_dir, shared_stage2_dir, tmp_path):
    """--cache-latents now composes with --augment (flip-variant cache) AND
    the data mesh (row-sharded cache) — the two round-4 restrictions."""
    import os

    import train as train_cli
    save_dir = str(tmp_path / "runs")
    train_cli.main([
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        *_shared_args(), "--batch-size", "2", "--num-epochs", "2",
        "--vae-encoder-path", shared_stage2_dir,
        "--vae-decoder-path", shared_stage1_dir,
        "--shuffle", "true", "--data-parallel", "true",
        "--cache-latents", "true", "--augment", "true",
    ])
    runs = [d for d in os.listdir(save_dir) if osp.isdir(osp.join(save_dir, d))]
    assert len(runs) == 1
    log = json.load(open(osp.join(save_dir, runs[0], "log.json")))
    assert len(log["epoch"]) == 2
    assert np.isfinite(log["train_loss"]).all()
    assert np.isfinite(log["val_loss"]).all()
