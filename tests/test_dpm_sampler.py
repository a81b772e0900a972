"""DPM-Solver++ sampler correctness.

Two anchors:
1. order=1 is mathematically identical to DDIM(eta=0) over the same timestep
   nodes (exact identity whenever the +/-30 x0 clip is inactive) — this pins
   the coefficient plumbing to the already-parity-tested DDIM path.
2. order=2 converges to the probability-flow ODE solution (approximated by a
   fine DDIM discretization) strictly faster than DDIM at equal step count —
   the property that lets ~10 DPM steps replace DDIM-50.
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor
from diffusion_model_project_tpu.diffusion.scheduler import (
    DiffusionScheduler, ddim_timesteps, dpm_solver_coefficients)

S, H, W = 3, 32, 32
T = 100  # moderate T keeps |x0_pred| << 30 so the clip stays inactive


@pytest.fixture(scope="module")
def pred():
    unet_kwargs = dict(
        in_channels=9, out_channels=4, features=(8, 16), kernel_size=3,
        padding_mode="zeros", activation="silu", final_activation=None,
        attention="", dropout=0.0, time_embedding_dim=16,
    )
    p = LatentDiffusionPredictor.create(
        dict(unet_kwargs), rng=jax.random.key(0), num_slices=S,
        num_timesteps=T, distance_transform=True, image_hw=(H, W),
        vae_features=(32, 32, 32),
    ).set_normalizer({"input": [1.0], "output": [2.0, 3.0, 4.0]})
    # the final conv is zero-init; perturb every UNet weight so eps_pred is a
    # nontrivial function of (x, t) and the reverse ODE has real dynamics
    keys = iter(jax.random.split(jax.random.key(42), 4096))
    noisy = jax.tree.map(
        lambda w: w + 0.05 * jax.random.normal(next(keys), w.shape, w.dtype),
        p.unet_params)
    return dataclasses.replace(p, unet_params=noisy)


@pytest.fixture(scope="module")
def sample():
    r = np.random.default_rng(3)
    img = (r.random((1, S, 1, H, W)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    v2d = r.standard_normal((1, S, 3, H, W)).astype(np.float32)
    v2d[:, :, 2] = 0.0
    lat = r.standard_normal((S, 4, H // 4, W // 4)).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(v2d), jnp.asarray(lat)


def test_coefficients_first_order_is_ddim():
    """Closed-form check: the order-1 update coefficients reproduce the DDIM
    (eta=0) update x' = sqrt(abar')*x0 + sqrt(1-abar')*eps for any x."""
    sch = DiffusionScheduler.create(T)
    ts = ddim_timesteps(T, 7)
    c = dpm_solver_coefficients(np.asarray(sch.alphas_cumprod), ts, order=1)
    assert np.all(np.asarray(c["c2"]) == 0.0)
    r = np.random.default_rng(0)
    x = r.standard_normal((5,)).astype(np.float32)
    eps = r.standard_normal((5,)).astype(np.float32)
    for i in range(len(ts)):
        a, s_ = float(c["alpha_cur"][i]), float(c["sigma_cur"][i])
        x0 = (x - s_ * eps) / a
        ours = float(c["sigma_ratio"][i]) * x + float(c["x0_coef"][i]) * x0
        t_prev = ts[i + 1] if i + 1 < len(ts) else -1
        abar_p = float(sch.alphas_cumprod[t_prev]) if t_prev >= 0 else 1.0
        ddim = np.sqrt(abar_p) * x0 + np.sqrt(1.0 - abar_p) * eps
        np.testing.assert_allclose(ours, ddim, rtol=2e-5, atol=2e-6)


def test_dpm_order1_matches_ddim_end_to_end(pred, sample):
    img, v2d, lat = sample
    ddim = jax.jit(lambda p, i, v, n: p.predict_ddim(i, v, num_steps=6, noise=n))(
        pred, img, v2d, lat)
    dpm1 = jax.jit(lambda p, i, v, n: p.predict_dpm(i, v, num_steps=6, order=1, noise=n))(
        pred, img, v2d, lat)
    np.testing.assert_allclose(np.asarray(dpm1), np.asarray(ddim),
                               rtol=1e-4, atol=1e-5)


def test_dpm_second_order_beats_ddim_at_equal_steps(pred, sample):
    img, v2d, lat = sample
    run = jax.jit(
        lambda p, i, v, n, steps, order: (
            p.predict_dpm(i, v, num_steps=steps, order=order, noise=n)),
        static_argnames=("steps", "order"))
    truth = run(pred, img, v2d, lat, T, 1)  # DDIM over every node = fine ODE solve
    # NB: a random-weight UNet gives the reverse ODE unusually rough dynamics,
    # which punishes multistep extrapolation at very low step counts; the
    # second-order advantage shows from ~16 steps here (measured 1.4x at 16,
    # 2.4x at 32) and at much lower counts on trained denoisers.
    for steps in (16, 32):
        err_ddim = float(jnp.mean((run(pred, img, v2d, lat, steps, 1) - truth) ** 2))
        err_dpm = float(jnp.mean((run(pred, img, v2d, lat, steps, 2) - truth) ** 2))
        assert err_dpm < err_ddim, (steps, err_dpm, err_ddim)


def test_dpm_more_steps_than_timesteps(pred, sample):
    """num_steps > T repeats truncated timestep nodes; DDIM treats repeats as
    identity steps while a zero-width DPM step would divide by h=0 — the
    sampler must deduplicate and stay finite AND equal to DDIM at order 1."""
    img, v2d, lat = sample
    ddim = pred.predict_ddim(img, v2d, num_steps=2 * T, noise=lat)
    dpm1 = pred.predict_dpm(img, v2d, num_steps=2 * T, order=1, noise=lat)
    dpm2 = pred.predict_dpm(img, v2d, num_steps=2 * T, order=2, noise=lat)
    assert bool(jnp.isfinite(dpm2).all())
    np.testing.assert_allclose(np.asarray(dpm1), np.asarray(ddim),
                               rtol=1e-4, atol=1e-5)


def test_dpm_uses_the_predictors_actual_scheduler(pred, sample):
    """Coefficients must derive from the (possibly checkpoint-restored)
    scheduler tables, not a recomputed default schedule — order-1 DPM must
    track DDIM under a NON-default beta range."""
    from diffusion_model_project_tpu.diffusion.scheduler import DiffusionScheduler

    img, v2d, lat = sample
    custom = dataclasses.replace(
        pred, scheduler=DiffusionScheduler.create(T, beta_start=5e-4,
                                                  beta_end=0.01))
    ddim = custom.predict_ddim(img, v2d, num_steps=6, noise=lat)
    dpm1 = custom.predict_dpm(img, v2d, num_steps=6, order=1, noise=lat)
    np.testing.assert_allclose(np.asarray(dpm1), np.asarray(ddim),
                               rtol=1e-4, atol=1e-5)
    # and it must NOT agree with the default-schedule trajectory
    default_ddim = pred.predict_ddim(img, v2d, num_steps=6, noise=lat)
    assert float(jnp.max(jnp.abs(ddim - default_ddim))) > 1e-3


def test_dpm_single_step_is_x0_projection(pred, sample):
    """num_steps=1 must collapse to the direct x0 projection, matching the
    reference's one-step DDIM semantics (alpha_bar_prev = 1)."""
    img, v2d, lat = sample
    one_ddim = pred.predict_ddim(img, v2d, num_steps=1, noise=lat)
    one_dpm = pred.predict_dpm(img, v2d, num_steps=1, noise=lat)
    np.testing.assert_allclose(np.asarray(one_dpm), np.asarray(one_ddim),
                               rtol=1e-4, atol=1e-5)
