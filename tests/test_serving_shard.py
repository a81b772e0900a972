"""Slice-sharded single-sample inference (predictor.with_latent_sharding).

One volume's fused batch*latent-slice axis is sharded over a mesh so the
reverse-diffusion scan's UNet work spreads across chips (serving LATENCY
scaling — the reference has no inference parallelism at all). Correctness is
the contract here: sharded output == single-device output; the virtual CPU
mesh says nothing about speed.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor
from diffusion_model_project_tpu.parallel import make_mesh

S, H, W = 8, 32, 32  # 8 slices shard evenly over the 8-device test mesh


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
def sample():
    r = np.random.default_rng(7)
    img = (r.random((1, S, 1, H, W)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    v2d = r.standard_normal((1, S, 3, H, W)).astype(np.float32)
    v2d[:, :, 2] = 0.0
    lat = r.standard_normal((S, 4, H // 4, W // 4)).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(v2d), jnp.asarray(lat)


def test_latent_sharded_ddim_matches_single_device(pred, sample):
    assert jax.device_count() >= 8
    img, v2d, lat = sample
    mesh = make_mesh(("slice",))
    run = jax.jit(lambda p, i, v, n: p.predict_ddim(i, v, num_steps=4, noise=n))
    base = run(pred, img, v2d, lat)
    sharded = run(pred.with_latent_sharding(mesh, "slice"), img, v2d, lat)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(base),
                               rtol=2e-4, atol=2e-5)


def test_latent_sharded_program_is_actually_sharded(pred, sample):
    img, v2d, lat = sample
    mesh = make_mesh(("slice",))
    p8 = pred.with_latent_sharding(mesh, "slice")
    lowered = jax.jit(
        lambda p, i, v, n: p.predict_ddim(i, v, num_steps=2, noise=n)
    ).lower(p8, img, v2d, lat)
    hlo = lowered.as_text()
    # the constraint must survive into the lowered module (GSPMD partitions
    # the scan over the slice axis; cross-slice Conv3D stages get gathers)
    assert "sharding" in hlo, "latent sharding constraint vanished"


def test_latent_sharded_dpm_and_ddpm(pred, sample):
    img, v2d, lat = sample
    mesh = make_mesh(("slice",))
    p8 = pred.with_latent_sharding(mesh, "slice")
    base_dpm = jax.jit(
        lambda p, i, v, n: p.predict_dpm(i, v, num_steps=3, noise=n))(
        pred, img, v2d, lat)
    shard_dpm = jax.jit(
        lambda p, i, v, n: p.predict_dpm(i, v, num_steps=3, noise=n))(
        p8, img, v2d, lat)
    np.testing.assert_allclose(np.asarray(shard_dpm), np.asarray(base_dpm),
                               rtol=2e-4, atol=2e-5)

    step_noise = jnp.asarray(np.random.default_rng(9).standard_normal(
        (20, S, 4, H // 4, W // 4)).astype(np.float32))
    base_ddpm = jax.jit(
        lambda p, i, v, n, sn: p.predict(i, v, noise=n, step_noise=sn))(
        pred, img, v2d, lat, step_noise)
    shard_ddpm = jax.jit(
        lambda p, i, v, n, sn: p.predict(i, v, noise=n, step_noise=sn))(
        p8, img, v2d, lat, step_noise)
    np.testing.assert_allclose(np.asarray(shard_ddpm), np.asarray(base_ddpm),
                               rtol=2e-4, atol=2e-5)


def test_latent_sharding_survives_pytree_round_trip(pred):
    mesh = make_mesh(("slice",))
    p8 = pred.with_latent_sharding(mesh, "slice")
    leaves, aux = p8.tree_flatten()
    back = type(p8).tree_unflatten(aux, leaves)
    assert back.latent_sharding == p8.latent_sharding
