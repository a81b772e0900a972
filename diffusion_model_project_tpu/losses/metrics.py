"""Loss zoo for diffusion (noise-space) and VAE training.

Numerical contracts mirror the reference loss definitions:
  - Diffusion_model/src/unet/metrics.py (mse/mae/huber, per-component and
    normalized variants with eps=1e-8, matrix-norm normalized_mse_loss,
    unmasked divergence_loss via jnp.gradient)
  - VAE_model/utils/metrics.py (masked per-channel variants, mean-form KL)
  - VAE_model/src/dual_vae/model.py:380-382 (sum-form KL)

All tensors use the reference channels-first contract (B, C, *spatial).
The reference resolves loss names via ``eval``; here ``cost_function`` is an
explicit registry.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp


def _spatial_dims(x: jnp.ndarray) -> tuple:
    if x.ndim == 4:
        return (-2, -1)
    if x.ndim == 5:
        return (-3, -2, -1)
    raise ValueError(f"Expected 4D or 5D tensor, got {x.ndim}D")


def mse_loss(output, target, reduce=True):
    loss = jnp.mean(jnp.square(output - target), axis=(-3, -2, -1))
    return loss.mean() if reduce else loss


def mae_loss(output, target, reduce=True):
    loss = jnp.mean(jnp.abs(output - target), axis=(-3, -2, -1))
    return loss.mean() if reduce else loss


def huber_loss(output, target, reduce=True, delta=1.0):
    err = output - target
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    loss_elem = 0.5 * quad * quad + delta * (abs_err - quad)
    loss = jnp.mean(loss_elem, axis=(-3, -2, -1))
    return loss.mean() if reduce else loss


def normalized_mae_loss(output, target, reduce=True, eps=1e-8):
    """Sample-wise MAE / mean |target| (eps variant: VAE_model/utils/metrics.py:4-37)."""
    dims = (-3, -2, -1)
    mae = jnp.mean(jnp.abs(output - target), axis=dims)
    weight = jnp.mean(jnp.abs(target), axis=dims)
    error = mae / (weight + eps)
    return error.mean() if reduce else error


def _per_channel_weighted(loss_per_channel, weight_per_channel, reduce):
    if weight_per_channel is not None:
        w = jnp.asarray(weight_per_channel)
        if w.ndim == 1:
            w = w[None, :]
        loss_per_channel = loss_per_channel * w / w.sum()
    loss = jnp.mean(loss_per_channel, axis=-1)
    return loss.mean() if reduce else loss


def mae_loss_per_component(output, target, reduce=True, weight_per_channel=None):
    lpc = jnp.mean(jnp.abs(output - target), axis=_spatial_dims(output))
    return _per_channel_weighted(lpc, weight_per_channel, reduce)


def mse_loss_per_component(output, target, reduce=True, weight_per_channel=None):
    lpc = jnp.mean(jnp.square(output - target), axis=_spatial_dims(output))
    return _per_channel_weighted(lpc, weight_per_channel, reduce)


def normalized_mae_loss_per_component(
    output, target, reduce=True, weight_per_channel=None, eps=1e-8
):
    dims = _spatial_dims(output)
    mae = jnp.mean(jnp.abs(output - target), axis=dims)
    norm = jnp.mean(jnp.abs(target), axis=dims)
    return _per_channel_weighted(mae / (norm + eps), weight_per_channel, reduce)


def normalized_mse_loss_per_component(
    output, target, reduce=True, weight_per_channel=None, eps=1e-8
):
    dims = _spatial_dims(output)
    mse = jnp.mean(jnp.square(output - target), axis=dims)
    norm = jnp.mean(jnp.square(target), axis=dims)
    return _per_channel_weighted(mse / (norm + eps), weight_per_channel, reduce)


def normalized_mse_loss(output, target):
    """Frobenius-norm-squared ratio per (sample, channel), averaged
    (reference unet/metrics.py:405-437)."""
    diff_norm = jnp.sum(jnp.square(target - output), axis=(-2, -1))
    target_norm = jnp.sum(jnp.square(target), axis=(-2, -1))
    return jnp.mean(diff_norm / (target_norm + 1e-8))


def divergence_loss(flow_field):
    """Unmasked divergence of (B, 3, D, H, W) via jnp.gradient central
    differences (reference unet/metrics.py:447-481)."""
    assert flow_field.ndim == 5 and flow_field.shape[1] == 3
    u, v, w = flow_field[:, 0], flow_field[:, 1], flow_field[:, 2]
    du_dx = jnp.gradient(u, axis=-1)
    dv_dy = jnp.gradient(v, axis=-2)
    dw_dz = jnp.gradient(w, axis=-3)
    return jnp.mean(jnp.square(du_dx + dv_dy + dw_dz))


# --------------------------------------------------------------------------
# VAE losses (masked per-channel variants)
# --------------------------------------------------------------------------

def _mask_both(output, target, mask):
    if mask is not None:
        output = output * mask
        target = target * mask
    return output, target


def mae_loss_per_channel(output, target, mask=None, weight_per_channel=None, reduce=True):
    output, target = _mask_both(output, target, mask)
    lpc = jnp.mean(jnp.abs(output - target), axis=_spatial_dims(output))
    return _per_channel_weighted(lpc, weight_per_channel, reduce)


def normalized_mae_loss_per_channel(output, target, mask=None, reduce=True, eps=1e-8):
    output, target = _mask_both(output, target, mask)
    dims = _spatial_dims(output)
    mae = jnp.mean(jnp.abs(output - target), axis=dims)
    norm = jnp.mean(jnp.abs(target), axis=dims)
    loss = jnp.mean(mae / (norm + eps), axis=-1)
    return loss.mean() if reduce else loss


def normalized_mse_per_channel(output, target, mask=None, reduce=True, eps=1e-8):
    output, target = _mask_both(output, target, mask)
    dims = _spatial_dims(output)
    mse = jnp.mean(jnp.square(output - target), axis=dims)
    norm = jnp.mean(jnp.square(target), axis=dims)
    loss = jnp.mean(mse / (norm + eps), axis=-1)
    return loss.mean() if reduce else loss


def kl_divergence(mu, *, logvar=None, sigma=None):
    """Mean-form KL used by the VAE trainers (VAE_model/utils/metrics.py:231-250);
    sigma variant uses the sum form."""
    if logvar is not None:
        return -0.5 * jnp.mean(1 + logvar - jnp.square(mu) - jnp.exp(logvar))
    if sigma is not None:
        return -0.5 * jnp.sum(1 + jnp.log(jnp.square(sigma)) - jnp.square(mu) - jnp.square(sigma))
    raise ValueError("Provide logvar or sigma")


def kl_divergence_sum(mu, logvar):
    """Sum-form KL (reference dual_vae/model.py:380-382)."""
    return -0.5 * jnp.sum(1 + logvar - jnp.square(mu) - jnp.exp(logvar))


_REGISTRY: Dict[str, Callable] = {
    "mse_loss": mse_loss,
    "mae_loss": mae_loss,
    "huber_loss": huber_loss,
    "normalized_mae_loss": normalized_mae_loss,
    "normalized_mse_loss": normalized_mse_loss,
    "divergence_loss": divergence_loss,
    "mae_loss_per_component": mae_loss_per_component,
    "mse_loss_per_component": mse_loss_per_component,
    "normalized_mae_loss_per_component": normalized_mae_loss_per_component,
    "normalized_mse_loss_per_component": normalized_mse_loss_per_component,
    "mae_loss_per_channel": mae_loss_per_channel,
    "normalized_mae_loss_per_channel": normalized_mae_loss_per_channel,
    "normalized_mse_per_channel": normalized_mse_per_channel,
}


def cost_function(name: str) -> Callable:
    """Explicit loss registry (the reference uses eval(); unet/metrics.py:38-53)."""
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(f"Unknown cost function {name!r}. Known: {sorted(_REGISTRY)}")
