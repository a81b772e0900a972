"""Loss zoo parity vs the reference torch implementations."""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

import diffusion_model_project_tpu.losses as L

from ref_loader import load_ref, REF


@pytest.fixture(scope="module")
def ref_metrics():
    return load_ref("refdm.src.unet.metrics", REF / "Diffusion_model/src/unet/metrics.py")


@pytest.fixture(scope="module")
def ref_vae_metrics():
    return load_ref("refvae.utils.metrics", REF / "VAE_model/utils/metrics.py")


@pytest.fixture(scope="module")
def ref_physics():
    return load_ref("refdm.src.physics", REF / "Diffusion_model/src/physics.py")


@pytest.fixture(scope="module")
def data():
    r = np.random.default_rng(3)
    out = r.standard_normal((4, 3, 8, 16, 16)).astype(np.float32)
    tgt = r.standard_normal((4, 3, 8, 16, 16)).astype(np.float32)
    mask = (r.random((4, 1, 8, 16, 16)) > 0.3).astype(np.float32)
    return out, tgt, mask


NOISE_LOSSES = [
    "mse_loss", "mae_loss", "huber_loss", "normalized_mae_loss",
    "mae_loss_per_component", "mse_loss_per_component",
    "normalized_mae_loss_per_component", "normalized_mse_loss_per_component",
]


@pytest.mark.parametrize("name", NOISE_LOSSES)
def test_noise_space_losses(ref_metrics, data, name):
    out, tgt, _ = data
    theirs = getattr(ref_metrics, name)(torch.from_numpy(out), torch.from_numpy(tgt))
    ours = L.cost_function(name)(jnp.asarray(out), jnp.asarray(tgt))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5, atol=1e-6)


def test_noise_losses_4d_and_weights(ref_metrics, data):
    out, tgt, _ = data
    out4, tgt4 = out[:, :, 0], tgt[:, :, 0]
    w = np.array([1.0, 2.0, 0.5], np.float32)
    theirs = ref_metrics.normalized_mse_loss_per_component(
        torch.from_numpy(out4), torch.from_numpy(tgt4), weight_per_channel=torch.from_numpy(w))
    ours = L.normalized_mse_loss_per_component(jnp.asarray(out4), jnp.asarray(tgt4), weight_per_channel=w)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_normalized_mse_matrix_norm(ref_metrics, data):
    out, tgt, _ = data
    out4, tgt4 = out[:, :, 0], tgt[:, :, 0]
    theirs = ref_metrics.normalized_mse_loss(torch.from_numpy(out4), torch.from_numpy(tgt4))
    ours = L.normalized_mse_loss(jnp.asarray(out4), jnp.asarray(tgt4))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4)


def test_divergence_loss_unmasked(ref_metrics, data):
    out, _, _ = data
    theirs = ref_metrics.divergence_loss(torch.from_numpy(out))
    ours = L.divergence_loss(jnp.asarray(out))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


@pytest.mark.parametrize("name", [
    "mae_loss_per_channel", "normalized_mae_loss_per_channel", "normalized_mse_per_channel",
])
def test_vae_masked_losses(ref_vae_metrics, data, name):
    out, tgt, mask = data
    theirs = getattr(ref_vae_metrics, name)(
        torch.from_numpy(out), torch.from_numpy(tgt), mask=torch.from_numpy(mask))
    ours = L.cost_function(name)(jnp.asarray(out), jnp.asarray(tgt), mask=jnp.asarray(mask))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5, atol=1e-6)


def test_kl_forms(ref_vae_metrics, data):
    r = np.random.default_rng(5)
    mu = r.standard_normal((2, 4, 3, 8, 8)).astype(np.float32)
    logvar = r.standard_normal(mu.shape).astype(np.float32)
    theirs = ref_vae_metrics.kl_divergence(torch.from_numpy(mu), logvar=torch.from_numpy(logvar))
    ours = L.kl_divergence(jnp.asarray(mu), logvar=jnp.asarray(logvar))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)

    from ref_loader import ref_dual_vae
    dv = ref_dual_vae()
    theirs_sum = dv.kl_divergence(torch.from_numpy(mu), torch.from_numpy(logvar))
    ours_sum = L.kl_divergence_sum(jnp.asarray(mu), jnp.asarray(logvar))
    np.testing.assert_allclose(float(ours_sum), float(theirs_sum), rtol=1e-4)


PHYS_FNS = ["divergence_loss_masked", "flow_rate_consistency_loss", "no_slip_loss"]


@pytest.mark.parametrize("name", PHYS_FNS)
def test_physics_losses(ref_physics, data, name):
    out, _, mask = data
    theirs = getattr(ref_physics, name)(torch.from_numpy(out), torch.from_numpy(mask))
    ours = getattr(L, name)(jnp.asarray(out), jnp.asarray(mask))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("name,normalize", [
    ("smoothness_loss", True), ("smoothness_loss", False),
    ("laplacian_smoothness_loss", True), ("laplacian_smoothness_loss", False),
])
def test_smoothness_losses(ref_physics, data, name, normalize):
    out, _, mask = data
    theirs = getattr(ref_physics, name)(torch.from_numpy(out), torch.from_numpy(mask), normalize=normalize)
    ours = getattr(L, name)(jnp.asarray(out), jnp.asarray(mask), normalize=normalize)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4, atol=1e-7)


def test_physics_loss_combined(ref_physics, data):
    out, _, mask = data
    vel = np.swapaxes(out, 1, 2)   # (B, S, 3, H, W)
    m = np.swapaxes(mask, 1, 2)
    ref_pl = ref_physics.PhysicsLoss(lambda_div=0.01, lambda_flow=0.001,
                                     lambda_smooth=0.001, lambda_laplacian=0.0001)
    theirs, their_comp = ref_pl(torch.from_numpy(vel), torch.from_numpy(m))
    our_pl = L.PhysicsLoss(lambda_div=0.01, lambda_flow=0.001,
                           lambda_smooth=0.001, lambda_laplacian=0.0001)
    ours, our_comp = our_pl(jnp.asarray(vel), jnp.asarray(m))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4)
    assert set(our_comp) == set(their_comp)
    for k in our_comp:
        np.testing.assert_allclose(float(our_comp[k]), float(their_comp[k]), rtol=1e-4, atol=1e-7)


def test_physics_metrics(ref_physics, data):
    out, _, mask = data
    vel = np.swapaxes(out, 1, 2)
    m = np.swapaxes(mask, 1, 2)
    theirs = ref_physics.compute_physics_metrics(torch.from_numpy(vel), torch.from_numpy(m))
    ours = L.compute_physics_metrics(jnp.asarray(vel), jnp.asarray(m))
    assert set(ours) == set(theirs)
    for k in theirs:
        np.testing.assert_allclose(float(ours[k]), theirs[k], rtol=5e-3, atol=1e-5, err_msg=k)


def test_component_weighted_velocity_loss(ref_physics, data):
    out, tgt, mask = data
    vel_p = np.swapaxes(out, 1, 2)
    vel_t = np.swapaxes(tgt, 1, 2)
    m = np.swapaxes(mask, 1, 2)
    theirs, their_comp = ref_physics.component_weighted_velocity_loss(
        torch.from_numpy(vel_p), torch.from_numpy(vel_t), torch.from_numpy(m),
        weight_u=1.0, weight_v=1.0, weight_w=3.0)
    ours, our_comp = L.component_weighted_velocity_loss(
        jnp.asarray(vel_p), jnp.asarray(vel_t), jnp.asarray(m),
        weight_u=1.0, weight_v=1.0, weight_w=3.0)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4)
    for k in their_comp:
        np.testing.assert_allclose(float(our_comp[k]), float(their_comp[k]), rtol=1e-4)


def test_per_component_metrics(ref_physics, data):
    out, tgt, mask = data
    vel_p = np.swapaxes(out, 1, 2)
    vel_t = np.swapaxes(tgt, 1, 2)
    m = np.swapaxes(mask, 1, 2)
    theirs = ref_physics.compute_per_component_metrics(
        torch.from_numpy(vel_p), torch.from_numpy(vel_t), torch.from_numpy(m))
    ours = L.compute_per_component_metrics(jnp.asarray(vel_p), jnp.asarray(vel_t), jnp.asarray(m))
    assert set(ours) == set(theirs)
    for k in theirs:
        np.testing.assert_allclose(float(ours[k]), theirs[k], rtol=5e-3, atol=1e-5, err_msg=k)


def test_cost_function_registry_rejects_unknown():
    with pytest.raises(ValueError):
        L.cost_function("__import__('os')")
