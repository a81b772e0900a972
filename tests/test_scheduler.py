"""DiffusionScheduler parity vs the reference torch implementation."""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from diffusion_model_project_tpu.diffusion import DiffusionScheduler
from diffusion_model_project_tpu.diffusion.scheduler import ddim_timesteps

from ref_loader import ref_diffusion_scheduler


@pytest.fixture(scope="module")
def schedulers():
    RefSched = ref_diffusion_scheduler()
    ref = RefSched(num_timesteps=1000, device="cpu")
    ours = DiffusionScheduler.create(1000)
    return ours, ref


TABLES = [
    "betas", "alphas", "alphas_cumprod", "alphas_cumprod_prev",
    "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
    "posterior_variance", "posterior_log_variance",
    "posterior_mean_coef1", "posterior_mean_coef2",
]


@pytest.mark.parametrize("table", TABLES)
def test_tables_bitwise(schedulers, table):
    ours, ref = schedulers
    mine = np.asarray(getattr(ours, table))
    theirs = getattr(ref, table).numpy()
    # identical float64 computation then float32 cast => bitwise equal
    np.testing.assert_array_equal(mine, theirs)


def test_q_sample_parity(schedulers, rng):
    ours, ref = schedulers
    x0 = rng.standard_normal((4, 8, 16, 16)).astype(np.float32)
    noise = rng.standard_normal(x0.shape).astype(np.float32)
    t = rng.integers(0, 1000, size=(4,))

    mine = np.asarray(ours.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))
    theirs = ref.q_sample(torch.from_numpy(x0), torch.from_numpy(t), torch.from_numpy(noise)).numpy()
    np.testing.assert_allclose(mine, theirs, rtol=1e-6, atol=1e-6)


def test_predict_x0_parity(schedulers, rng):
    ours, ref = schedulers
    xt = rng.standard_normal((4, 8, 16, 16)).astype(np.float32)
    eps = rng.standard_normal(xt.shape).astype(np.float32)
    t = rng.integers(0, 1000, size=(4,))
    mine = np.asarray(ours.predict_x0_from_noise(jnp.asarray(xt), jnp.asarray(t), jnp.asarray(eps)))
    theirs = ref.predict_x0_from_noise(torch.from_numpy(xt), torch.from_numpy(t), torch.from_numpy(eps)).numpy()
    np.testing.assert_allclose(mine, theirs, rtol=1e-5, atol=1e-5)


def test_p_sample_parity_deterministic_part(schedulers, rng):
    """p_sample with the same injected gaussian noise must match the reference.

    The reference draws noise internally; we fix torch's global seed, capture
    the noise it would draw, and feed the identical noise to our step.
    """
    ours, ref = schedulers
    xt = rng.standard_normal((4, 8, 16, 16)).astype(np.float32)
    eps_hat = rng.standard_normal(xt.shape).astype(np.float32)

    for t_scalar in [999, 500, 37, 1, 0]:
        torch.manual_seed(123)
        theirs = ref.p_sample(
            torch.from_numpy(eps_hat), torch.from_numpy(xt), t_scalar,
            clip_denoised=True, clip_range=(-30.0, 30.0),
        ).numpy()
        torch.manual_seed(123)
        noise = torch.randn(xt.shape).numpy()
        mine = np.asarray(ours.p_sample(
            jnp.asarray(eps_hat), jnp.asarray(xt), jnp.asarray(t_scalar),
            noise=jnp.asarray(noise), clip_denoised=True, clip_range=(-30.0, 30.0),
        ))
        np.testing.assert_allclose(mine, theirs, rtol=1e-5, atol=1e-5, err_msg=f"t={t_scalar}")


def test_ddim_sample_parity(schedulers, rng):
    ours, ref = schedulers
    xt = rng.standard_normal((4, 8, 16, 16)).astype(np.float32)
    eps_hat = rng.standard_normal(xt.shape).astype(np.float32)

    steps = ddim_timesteps(1000, 50)
    for i in [0, 10, 48, 49]:
        t = int(steps[i])
        t_prev = int(steps[i + 1]) if i + 1 < len(steps) else -1
        theirs = ref.ddim_sample(
            torch.from_numpy(eps_hat), torch.from_numpy(xt), t, t_prev,
            eta=0.0, clip_range=(-30.0, 30.0),
        ).numpy()
        mine = np.asarray(ours.ddim_sample(
            jnp.asarray(eps_hat), jnp.asarray(xt), jnp.asarray(t), jnp.asarray(t_prev),
            eta=0.0, clip_range=(-30.0, 30.0),
        ))
        np.testing.assert_allclose(mine, theirs, rtol=1e-5, atol=1e-5, err_msg=f"t={t}->{t_prev}")


def test_ddim_timesteps_match_reference_schedule():
    # reference: torch.linspace(T-1, 0, num_steps, dtype=long)
    for n in [1, 2, 20, 50, 100]:
        theirs = torch.linspace(999, 0, n, dtype=torch.long).numpy()
        np.testing.assert_array_equal(ddim_timesteps(1000, n), theirs)


def test_q_sample_scalar_t(schedulers, rng):
    ours, ref = schedulers
    x0 = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    noise = rng.standard_normal(x0.shape).astype(np.float32)
    mine = np.asarray(ours.q_sample(jnp.asarray(x0), 500, jnp.asarray(noise)))
    theirs = ref.q_sample(torch.from_numpy(x0), 500, torch.from_numpy(noise)).numpy()
    np.testing.assert_allclose(mine, theirs, rtol=1e-6, atol=1e-6)
