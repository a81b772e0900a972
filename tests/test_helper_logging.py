"""run_epoch logging-contract parity with the reference epoch loop.

The reference (Diffusion_model/src/helper.py:455,459,555-558) normalizes the
accumulated physics/velocity components by ``max(1, num_batches //
physics_loss_freq)`` — the FLOOR, not the true heavy-batch count
``ceil(num/freq)`` — and its returned all_metrics contains only the val
physics metrics plus ``loss_<physics component>`` keys (loss_u/v/w are
printed, never logged). log.json number-for-number comparability requires
matching both quirks exactly.
"""
import re

import numpy as np
import jax
import optax
import pytest

from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor
from diffusion_model_project_tpu.losses.physics import PhysicsLoss
from diffusion_model_project_tpu.training.helper import run_epoch
from diffusion_model_project_tpu.training.steps import make_diffusion_train_step

S, H, W = 3, 16, 16
UNET_KW = dict(
    in_channels=9, out_channels=4, features=(8, 16), kernel_size=3,
    padding_mode="zeros", activation="silu", final_activation=None,
    attention="", dropout=0.0, time_embedding_dim=16,
)


def _make_pred():
    return LatentDiffusionPredictor.create(
        dict(UNET_KW), rng=jax.random.key(0), num_slices=S,
        num_timesteps=20, distance_transform=True, image_hw=(H, W),
        vae_features=(32, 32, 32),
    )


def _loader(n, b=2, seed=0):
    r = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        img = (r.random((b, S, 1, H, W)) > 0.3).astype(np.float32)
        img[:, :, :, 0, 0] = 0.0
        out.append({
            "microstructure": img,
            "velocity_input": r.standard_normal((b, S, 3, H, W)).astype(np.float32),
            "velocity": r.standard_normal((b, S, 3, H, W)).astype(np.float32),
        })
    return out


def test_physics_component_floor_divisor():
    """freq=3 over 4 batches: heavy at i=0,3 (2 accumulations) but the logged
    component average divides by floor(4/3)=1, exactly like the reference."""
    pred = _make_pred()
    opt = optax.adam(1e-3)
    opt_state = opt.init(pred.unet_params)
    train = _loader(4)
    val = _loader(1, seed=9)

    # manual emulation of run_epoch's per-batch rng stream and step choice
    physics = PhysicsLoss(lambda_div=0.01, lambda_flow=0.0, lambda_smooth=0.0,
                          lambda_laplacian=0.0, normalize_smoothness=True)
    heavy_step = jax.jit(make_diffusion_train_step(opt, physics=physics))
    plain_step = jax.jit(make_diffusion_train_step(opt))
    rng = jax.random.key(42)
    p, o = pred, opt_state
    heavy_div = []
    for i, data in enumerate(train):
        batch = {"img": data["microstructure"], "U_2d": data["velocity_input"],
                 "U": data["velocity"]}
        rng, step_rng = jax.random.split(rng)
        if i % 3 == 0:
            p, o, aux = heavy_step(p, o, batch, step_rng)
            heavy_div.append(float(aux["divergence"]))
        else:
            p, o, aux = plain_step(p, o, batch, step_rng)
    assert len(heavy_div) == 2  # i = 0, 3

    _, _, _, _, metrics = run_epoch(
        (train, val), pred, opt_state, opt, rng=jax.random.key(42),
        lambda_div=0.01, physics_loss_freq=3)
    # reference divisor: max(1, 4 // 3) = 1 -> the SUM of the heavy batches
    np.testing.assert_allclose(
        metrics["loss_divergence"], sum(heavy_div), rtol=1e-5)
    # loss_u/v/w never appear in the logged metrics (reference all_metrics
    # carries only val physics metrics + loss_<physics component>)
    assert not any(k in metrics for k in ("loss_u", "loss_v", "loss_w"))


def test_velocity_primary_accumulates_every_batch(capsys):
    """velocity_loss_primary reconstructs velocity every batch, so the
    printed u/v/w averages accumulate ALL batches over the floor divisor
    (reference helper.py:353-355,459-461)."""
    pred = _make_pred()
    opt = optax.adam(1e-3)
    opt_state = opt.init(pred.unet_params)
    train = _loader(3, seed=1)
    val = _loader(1, seed=9)

    step = jax.jit(make_diffusion_train_step(opt, velocity_loss_primary=True))
    rng = jax.random.key(7)
    p, o = pred, opt_state
    total_u = 0.0
    for data in train:
        batch = {"img": data["microstructure"], "U_2d": data["velocity_input"],
                 "U": data["velocity"]}
        rng, step_rng = jax.random.split(rng)
        p, o, aux = step(p, o, batch, step_rng)
        total_u += float(aux["loss_u"])

    run_epoch((train, val), pred, opt_state, opt, rng=jax.random.key(7),
              velocity_loss_primary=True, physics_loss_freq=2)
    out = capsys.readouterr().out
    m = re.search(r"velocity loss components: u=([0-9.eE+-]+)", out)
    assert m, out
    # reference: every-batch accumulation / max(1, 3 // 2) = sum / 1
    np.testing.assert_allclose(float(m.group(1)), total_u, rtol=1e-4)
