"""Physics-informed losses and metrics for fluid-flow prediction.

Mirrors the reference Diffusion_model/src/physics.py:
  - masked divergence (central differences, interior crop; physics.py:138-190)
  - flow-rate consistency (variance of area-normalized Q(x); physics.py:193-249)
  - no-slip penalty (physics.py:252-282; defined but unused by the trainer)
  - gradient / Laplacian smoothness, optionally velocity-magnitude-normalized
    (physics.py:285-422)
  - compute_physics_metrics: 7 diagnostic families (physics.py:425-599)
  - reconstruct_velocity_from_noise_pred: x0_hat from eps_hat -> frozen D3D
    decode -> denormalize -> depth resize -> mask; gradients flow through the
    decoder (physics.py:602-673). On TPU wrap the decode in jax.checkpoint at
    the training-step level instead of the reference's del/empty_cache dance.

All inputs use the reference channels-first contract; the jitted callers
convert from channels-last at the boundary.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def divergence_loss_masked(velocity, mask, eps=1e-8):
    """velocity (B,3,D,H,W), mask (B,1,D,H,W) -> scalar."""
    assert velocity.ndim == 5 and velocity.shape[1] == 3
    u = velocity[:, 0:1]
    v = velocity[:, 1:2]
    w = velocity[:, 2:3]
    du_dx = (u[..., 2:] - u[..., :-2]) / 2.0
    dv_dy = (v[..., 2:, :] - v[..., :-2, :]) / 2.0
    dw_dz = (w[:, :, 2:] - w[:, :, :-2]) / 2.0
    du_dx = du_dx[:, :, 1:-1, 1:-1, :]
    dv_dy = dv_dy[:, :, 1:-1, :, 1:-1]
    dw_dz = dw_dz[:, :, :, 1:-1, 1:-1]
    mask_interior = mask[:, :, 1:-1, 1:-1, 1:-1]
    divergence = (du_dx + dv_dy + dw_dz) * mask_interior
    return jnp.sum(jnp.square(divergence)) / (jnp.sum(mask_interior) + eps)


def flow_rate_consistency_loss(velocity, mask, eps=1e-8):
    u_masked = velocity[:, 0:1] * mask
    q = jnp.sum(u_masked, axis=(2, 3))            # (B, 1, W)
    fluid_area = jnp.sum(mask, axis=(2, 3)) + eps  # (B, 1, W)
    q_norm = q / fluid_area
    q_mean = jnp.mean(q_norm, axis=-1, keepdims=True)
    q_var = jnp.mean(jnp.square(q_norm - q_mean), axis=-1)
    rel_var = q_var / (jnp.square(q_mean[..., 0]) + eps)
    return jnp.mean(rel_var)


def no_slip_loss(velocity, mask, eps=1e-8):
    solid = 1.0 - mask
    vel_solid = velocity * solid
    return jnp.sum(jnp.square(vel_solid)) / (jnp.sum(solid) + eps) / 3.0


def _pairwise_grad_sq(velocity, mask):
    """Sum of squared forward differences over fluid-fluid pairs + pair count."""
    total = 0.0
    count = 0.0
    for axis in (-1, -2, -3):
        sl_hi = [slice(None)] * 5
        sl_lo = [slice(None)] * 5
        sl_hi[axis] = slice(1, None)
        sl_lo[axis] = slice(None, -1)
        grad = velocity[tuple(sl_hi)] - velocity[tuple(sl_lo)]
        m = mask[tuple(sl_hi)] * mask[tuple(sl_lo)]
        total = total + jnp.sum(jnp.square(grad) * m)
        count = count + 3.0 * jnp.sum(m)  # 3 velocity channels share the mask
    return total, count


def smoothness_loss(velocity, mask, eps=1e-8, normalize=True):
    total, count = _pairwise_grad_sq(velocity, mask)
    loss = total / (count + eps)
    if normalize:
        vel_mag_sq = jnp.sum(jnp.square(velocity * mask)) / (jnp.sum(mask) * 3 + eps)
        loss = loss / (vel_mag_sq + eps)
    return loss


def _laplacian_sq(velocity, mask):
    d2x = velocity[..., 2:] - 2 * velocity[..., 1:-1] + velocity[..., :-2]
    d2y = velocity[..., 2:, :] - 2 * velocity[..., 1:-1, :] + velocity[..., :-2, :]
    d2z = velocity[:, :, 2:] - 2 * velocity[:, :, 1:-1] + velocity[:, :, :-2]
    d2x = d2x[:, :, 1:-1, 1:-1, :]
    d2y = d2y[:, :, 1:-1, :, 1:-1]
    d2z = d2z[:, :, :, 1:-1, 1:-1]
    lap = d2x + d2y + d2z
    mask_valid = (
        mask[:, :, 1:-1, 1:-1, :-2] * mask[:, :, 1:-1, 1:-1, 1:-1] * mask[:, :, 1:-1, 1:-1, 2:]
        * mask[:, :, 1:-1, :-2, 1:-1] * mask[:, :, 1:-1, 2:, 1:-1]
        * mask[:, :, :-2, 1:-1, 1:-1] * mask[:, :, 2:, 1:-1, 1:-1]
    )
    lap_sq = jnp.sum(jnp.square(lap * mask_valid))
    count = 3.0 * jnp.sum(mask_valid)  # 3 velocity channels
    return lap_sq, count


def laplacian_smoothness_loss(velocity, mask, eps=1e-8, normalize=True):
    lap_sq, count = _laplacian_sq(velocity, mask)
    loss = lap_sq / (count + eps)
    if normalize:
        vel_mag_sq = jnp.sum(jnp.square(velocity * mask)) / (jnp.sum(mask) * 3 + eps)
        loss = loss / (vel_mag_sq + eps)
    return loss


@dataclasses.dataclass(frozen=True)
class PhysicsLoss:
    """Weighted sum of physics constraints (reference physics.py:45-135).

    __call__ takes velocity (B, S, 3, H, W) and mask (B, S, 1, H, W) and
    returns (total, components-dict). Static lambdas gate which terms are
    traced, exactly like the reference's `if lambda > 0` branches.
    """

    lambda_div: float = 0.0
    lambda_flow: float = 0.0
    lambda_smooth: float = 0.0
    lambda_laplacian: float = 0.0
    eps: float = 1e-8
    normalize_smoothness: bool = True

    def is_active(self) -> bool:
        return any(l > 0 for l in (self.lambda_div, self.lambda_flow,
                                   self.lambda_smooth, self.lambda_laplacian))

    def __call__(self, velocity, mask, return_components: bool = True):
        vel = jnp.swapaxes(velocity, 1, 2)  # (B, 3, S, H, W)
        m = jnp.swapaxes(mask, 1, 2)
        components = {}
        total = jnp.float32(0.0)
        if self.lambda_div > 0:
            l = divergence_loss_masked(vel, m, self.eps)
            total = total + self.lambda_div * l
            components["divergence"] = jax.lax.stop_gradient(l)
        if self.lambda_flow > 0:
            l = flow_rate_consistency_loss(vel, m, self.eps)
            total = total + self.lambda_flow * l
            components["flow_rate"] = jax.lax.stop_gradient(l)
        if self.lambda_smooth > 0:
            l = smoothness_loss(vel, m, self.eps, self.normalize_smoothness)
            total = total + self.lambda_smooth * l
            components["smoothness"] = jax.lax.stop_gradient(l)
        if self.lambda_laplacian > 0:
            l = laplacian_smoothness_loss(vel, m, self.eps, self.normalize_smoothness)
            total = total + self.lambda_laplacian * l
            components["laplacian"] = jax.lax.stop_gradient(l)
        if return_components:
            return total, components
        return total


def compute_physics_metrics(velocity, mask, eps=1e-8) -> Dict[str, jnp.ndarray]:
    """Diagnostic metrics (reference physics.py:425-599), jit-friendly (returns
    scalars as jnp arrays; no .item())."""
    if velocity.ndim == 5 and velocity.shape[2] == 3:
        vel = jnp.swapaxes(velocity, 1, 2)
        m = jnp.swapaxes(mask, 1, 2) if mask.shape[2] == 1 else mask
    else:
        vel, m = velocity, mask
    m = m.astype(jnp.float32)
    metrics: Dict[str, jnp.ndarray] = {}

    u, v, w = vel[:, 0:1], vel[:, 1:2], vel[:, 2:3]
    du_dx = ((u[..., 2:] - u[..., :-2]) / 2.0)[:, :, 1:-1, 1:-1, :]
    dv_dy = ((v[..., 2:, :] - v[..., :-2, :]) / 2.0)[:, :, 1:-1, :, 1:-1]
    dw_dz = ((w[:, :, 2:] - w[:, :, :-2]) / 2.0)[:, :, :, 1:-1, 1:-1]
    m_int = m[:, :, 1:-1, 1:-1, 1:-1]
    div = (du_dx + dv_dy + dw_dz) * m_int
    n_int = jnp.sum(m_int) + eps
    metrics["div_mean"] = jnp.sum(jnp.abs(div)) / n_int
    # fluid-masked std of divergence
    mean_div = jnp.sum(div) / n_int
    metrics["div_std"] = jnp.sqrt(
        jnp.sum(jnp.square(div - mean_div) * m_int) / jnp.maximum(jnp.sum(m_int) - 1, 1)
    )

    q = jnp.sum(u * m, axis=(2, 3))[:, 0]          # (B, W)
    area = jnp.sum(m, axis=(2, 3))[:, 0] + eps
    q_norm = q / area
    q_mean = jnp.mean(q_norm, axis=-1, keepdims=True)
    q_mean_abs = jnp.mean(jnp.abs(q_mean))
    q_std = jnp.sqrt(jnp.mean(jnp.square(q_norm - q_mean)))
    metrics["flow_rate_cv"] = jnp.where(q_mean_abs > 1e-6, q_std / (q_mean_abs + eps), 0.0)

    solid = 1.0 - m
    metrics["vel_in_solid"] = jnp.sqrt(jnp.sum(jnp.square(vel * solid))) / jnp.sqrt(jnp.sum(solid) + eps)

    vel_mag = jnp.sqrt(jnp.sum(jnp.square(vel), axis=1, keepdims=True))
    metrics["vel_mean_fluid"] = jnp.sum(vel_mag * m) / (jnp.sum(m) + eps)

    total, count = _pairwise_grad_sq(vel, m)
    metrics["gradient_smooth"] = total / (count + eps)
    lap_sq, lcount = _laplacian_sq(vel, m)
    metrics["laplacian_smooth"] = lap_sq / (lcount + eps)

    n_fluid = jnp.sum(m) + eps
    for c, name in enumerate(["vel_u", "vel_v", "vel_w"]):
        vel_c = vel[:, c:c + 1] * m
        metrics[f"{name}_mean"] = jnp.sum(jnp.abs(vel_c)) / n_fluid
        metrics[f"{name}_max"] = jnp.max(jnp.abs(vel_c))
    return metrics


def reconstruct_velocity_from_noise_pred(
    predictor,
    noise_pred: jnp.ndarray,   # (B*ld, lh, lw, C) channels-last (training internals)
    x_t: jnp.ndarray,          # same layout
    t: jnp.ndarray,            # (B*ld,)
    img: jnp.ndarray,          # (B, S, 1, H, W)
) -> jnp.ndarray:
    """x0_hat from eps_hat -> frozen D3D decode -> denorm -> mask.

    Gradients flow to noise_pred through the frozen decoder (the decoder params
    are stop_gradient'ed by the caller holding them constant). Returns
    (B, S, 3, H, W) like the reference (physics.py:602-673).
    """
    b, s = img.shape[0], img.shape[1]
    lh, lw = x_t.shape[1], x_t.shape[2]
    c = x_t.shape[-1]
    # latent depth from the tensor itself (b*ld rows), like the reference's
    # explicit latent_depth arg (physics.py:602-673) — reshaping with s would
    # fail whenever vae_depth_factor > 1 compresses depth
    ld = x_t.shape[0] // b
    sched = predictor.scheduler

    sac = jnp.maximum(sched.sqrt_alphas_cumprod[t], 0.0)[:, None, None, None]
    somac = sched.sqrt_one_minus_alphas_cumprod[t][:, None, None, None]
    x0_pred = (x_t - somac * noise_pred) / (sac + 1e-8)

    z = x0_pred.reshape(b, ld, lh, lw, c)

    # per-block rematerialized decoder: gradients flow through the frozen D3D
    # to x0_pred, but each residual block's activations are recomputed during
    # backprop instead of stored (at full 256^2 scale storing them exceeds
    # HBM) — the TPU-native replacement for the reference's del/empty_cache
    # dance (helper.py:437-446). Same params, remat-enabled module def.
    vae_remat = dataclasses.replace(predictor.vae, remat_decoders=True)
    # decode at the predictor's compute dtype like every other VAE call
    # (prepare_conditioning, encode_target, _decode_and_finish): otherwise a
    # bf16-configured training run silently pays a float32 decode (+backward)
    # in its hottest loss path
    vel = vae_remat.apply(
        {"params": jax.lax.stop_gradient(predictor.vae_params)},
        z.astype(predictor._cdtype), method="decode_3d")
    vel = vel.astype(jnp.float32)  # (B, S, H, W, 3) channels-last
    vel = predictor.norm_output.inverse(vel, channel_axis=-1)
    h, w = img.shape[-2], img.shape[-1]
    if vel.shape[1] != s or vel.shape[2] != h or vel.shape[3] != w:
        from ..ops.resize import interpolate_trilinear
        vel = interpolate_trilinear(vel, s, h, w)
    vel = jnp.moveaxis(vel, -1, 2)  # (B, S, 3, H, W)
    return vel * img


def component_weighted_velocity_loss(
    velocity_pred, velocity_target, mask,
    weight_u=1.0, weight_v=1.0, weight_w=1.0,
    eps=1e-8, normalize_per_component=True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Masked per-component MAE with u/v/w weights (physics.py:676-747)."""
    assert velocity_pred.ndim == 5 and velocity_pred.shape[2] == 3
    velocity_pred = velocity_pred * mask
    velocity_target = velocity_target * mask
    mask_c = mask[:, :, 0]
    components = {}
    total = jnp.float32(0.0)
    for i, (name, wgt) in enumerate(zip("uvw", (weight_u, weight_v, weight_w))):
        pred_c = velocity_pred[:, :, i]
        target_c = velocity_target[:, :, i]
        error = jnp.abs(pred_c - target_c)
        if normalize_per_component:
            target_scale = jnp.sum(jnp.abs(target_c) * mask_c) / (jnp.sum(mask_c) + eps)
            loss_c = jnp.sum(error * mask_c) / (jnp.sum(mask_c) * target_scale + eps)
        else:
            loss_c = jnp.sum(error * mask_c) / (jnp.sum(mask_c) + eps)
        components[f"loss_{name}"] = jax.lax.stop_gradient(loss_c)
        total = total + wgt * loss_c
    return total / (weight_u + weight_v + weight_w), components


def compute_per_component_metrics(velocity_pred, velocity_target, mask, eps=1e-8):
    """Per-component MAE / relative error / variance ratio over fluid voxels
    (physics.py:750-803). jit-friendly masked moments."""
    velocity_pred = velocity_pred * mask
    velocity_target = velocity_target * mask
    m = mask[:, :, 0]
    n = jnp.sum(m) + eps
    metrics = {}
    for i, name in enumerate("uvw"):
        p = velocity_pred[:, :, i]
        tgt = velocity_target[:, :, i]
        mae = jnp.sum(jnp.abs(p - tgt) * m) / n
        target_mag = jnp.sum(jnp.abs(tgt) * m) / n + eps

        def masked_std(x):
            mean = jnp.sum(x * m) / n
            var = jnp.sum(jnp.square(x - mean) * m) / jnp.maximum(n - 1, 1)
            return jnp.sqrt(var)

        pred_std = masked_std(p)
        target_std = masked_std(tgt) + eps
        metrics[f"{name}_mae"] = mae
        metrics[f"{name}_rel_error"] = mae / target_mag
        metrics[f"{name}_var_ratio"] = pred_std / target_std
        metrics[f"{name}_pred_std"] = pred_std
        metrics[f"{name}_target_std"] = target_std
    return metrics
