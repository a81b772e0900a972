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
        caches, pred, opt_state, opt, rng=jax.random.key(1), batch_size=1,
        _step_cache=step_cache)
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


def test_cache_latents_rejects_physics_and_augment(
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
    with pytest.raises(ValueError, match="augment"):
        train_cli.main(base + ["--augment", "true"])
