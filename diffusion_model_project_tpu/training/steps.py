"""Jitted training-step factories.

The diffusion step mirrors the reference hot loop (helper.py:277-447):
encode target with frozen E3D -> per-slice independent timestep -> q_sample ->
UNet eps prediction -> noise-space cost (+ optional physics / velocity losses
through the frozen decoder) -> Adam update of the UNet params only.

TPU-first: one jitted function per optimizer step; gradient accumulation is a
``lax.scan`` over microbatches inside the step (the reference's loss/accum
divide + step-every-N); under a data mesh the batch axis is sharded and XLA
inserts the gradient psum.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.predictor import LatentDiffusionPredictor
from ..losses.metrics import cost_function
from ..losses.physics import (
    PhysicsLoss,
    component_weighted_velocity_loss,
    compute_physics_metrics,
    reconstruct_velocity_from_noise_pred,
)


def _cl_to_cf(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, -1, -3)


def diffusion_loss_fn(
    unet_params,
    predictor: LatentDiffusionPredictor,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    *,
    cost_name: str = "normalized_mse_loss_per_component",
    physics: Optional[PhysicsLoss] = None,
    lambda_velocity: float = 0.0,
    velocity_weights: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    velocity_loss_primary: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """batch keys: 'img' (B,S,1,H,W), 'U_2d' (B,S,3,H,W), 'U' (B,S,3,H,W).

    velocity_loss_primary replaces the noise-prediction cost with the masked
    per-component velocity loss through the frozen decoder (helper.py:320-358).
    """
    pred = dataclasses.replace(predictor, unet_params=unet_params)
    cost = cost_function(cost_name)

    x_start = jax.lax.stop_gradient(pred.encode_target(batch["U"]))
    eps_pred, noise, t, x_t = pred.forward(
        batch["img"], batch["U_2d"], x_start, rng=rng
    )
    aux = {}

    need_velocity = (
        velocity_loss_primary
        or (physics is not None and physics.is_active())
        or lambda_velocity > 0
    )
    vel_pred = None
    if need_velocity:
        vel_pred = reconstruct_velocity_from_noise_pred(
            pred, eps_pred, x_t, t, batch["img"]
        )

    if velocity_loss_primary:
        loss, comps = component_weighted_velocity_loss(
            vel_pred, batch["U"], batch["img"], *velocity_weights
        )
        aux.update(comps)
        aux["noise_loss"] = jax.lax.stop_gradient(
            cost(_cl_to_cf(eps_pred), _cl_to_cf(noise)))
    else:
        loss = cost(_cl_to_cf(eps_pred), _cl_to_cf(noise))
        aux["noise_loss"] = jax.lax.stop_gradient(loss)
    # the primary loss BEFORE physics/aux terms — what the reference logs as
    # running_loss (helper.py:432-433)
    aux["primary_loss"] = jax.lax.stop_gradient(loss)

    if physics is not None and physics.is_active():
        phys_total, comps = physics(vel_pred, batch["img"])
        loss = loss + phys_total
        aux.update(comps)
    if lambda_velocity > 0 and not velocity_loss_primary:
        vel_loss, comps = component_weighted_velocity_loss(
            vel_pred, batch["U"], batch["img"], *velocity_weights
        )
        loss = loss + lambda_velocity * vel_loss
        aux["velocity_loss"] = jax.lax.stop_gradient(vel_loss)
        aux.update(comps)
    aux["loss"] = jax.lax.stop_gradient(loss)
    return loss, aux


def make_diffusion_train_step(
    optimizer: optax.GradientTransformation,
    *,
    cost_name: str = "normalized_mse_loss_per_component",
    physics: Optional[PhysicsLoss] = None,
    lambda_velocity: float = 0.0,
    velocity_weights: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    velocity_loss_primary: bool = False,
    accum_steps: int = 1,
) -> Callable:
    """Build train_step(predictor, opt_state, batch, rng) -> (predictor', opt_state', aux).

    With accum_steps > 1 the batch's leading axis is split into microbatches
    scanned inside the step (grads averaged), replacing the reference's
    loss-divide + step-every-N accumulation.
    """
    loss_fn = partial(
        diffusion_loss_fn,
        cost_name=cost_name, physics=physics,
        lambda_velocity=lambda_velocity, velocity_weights=velocity_weights,
        velocity_loss_primary=velocity_loss_primary,
    )
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(predictor, opt_state, batch, rng):
        from ..models.layers import train_trace

        # fail fast: the int8 sampling paths round/clip activations, whose
        # VJP is zero a.e. — training through them silently produces ~zero
        # gradients. These are static (aux) fields, so this raises at trace
        # time, not per step.
        if getattr(predictor, "unet_int8", False) or getattr(predictor, "vae_int8", False):
            raise ValueError(
                "Training through an int8 predictor (with_unet_int8/"
                "with_vae_int8) would yield zero gradients through the "
                "round/clip quantizers; disable int8 for training "
                "(.with_unet_int8(False).with_vae_int8(False)).")
        with train_trace():
            return _train_step_impl(predictor, opt_state, batch, rng)

    def _train_step_impl(predictor, opt_state, batch, rng):
        if accum_steps == 1:
            (_, aux), grads = grad_fn(predictor.unet_params, predictor, batch, rng)
        else:
            def micro(b):
                return jax.tree_util.tree_map(
                    lambda x: x.reshape((accum_steps, -1) + x.shape[1:]), b)

            micro_batches = micro(batch)
            rngs = jax.random.split(rng, accum_steps)

            def body(carry, xs):
                g_acc, aux_acc = carry
                mb, r = xs
                (_, aux), g = grad_fn(predictor.unet_params, predictor, mb, r)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                aux_acc = jax.tree_util.tree_map(jnp.add, aux_acc, aux)
                return (g_acc, aux_acc), None

            g0 = jax.tree_util.tree_map(jnp.zeros_like, predictor.unet_params)
            (_, aux_shapes), _ = jax.eval_shape(
                grad_fn, predictor.unet_params, predictor,
                jax.tree_util.tree_map(lambda x: x[0], micro_batches), rngs[0])
            aux0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), aux_shapes)
            (grads, aux), _ = jax.lax.scan(body, (g0, aux0), (micro_batches, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
            aux = jax.tree_util.tree_map(lambda a: a / accum_steps, aux)

        updates, opt_state = optimizer.update(grads, opt_state, predictor.unet_params)
        new_params = optax.apply_updates(predictor.unet_params, updates)
        predictor = dataclasses.replace(predictor, unet_params=new_params)
        return predictor, opt_state, aux

    return train_step


def make_diffusion_eval_step(
    *,
    cost_name: str = "normalized_mse_loss_per_component",
    with_physics_metrics: bool = False,
) -> Callable:
    """Validation step (reference helper.py:464-552): noise-prediction loss,
    plus (optionally) physics diagnostics on the reconstructed velocity."""
    cost = cost_function(cost_name)

    def eval_step(predictor, batch, rng):
        x_start = predictor.encode_target(batch["U"])
        eps_pred, noise, t, x_t = predictor.forward(
            batch["img"], batch["U_2d"], x_start, rng=rng
        )
        loss = cost(_cl_to_cf(eps_pred), _cl_to_cf(noise))
        metrics = {"val_loss": loss}
        if with_physics_metrics:
            vel_pred = reconstruct_velocity_from_noise_pred(
                predictor, eps_pred, x_t, t, batch["img"]
            )
            metrics.update(compute_physics_metrics(vel_pred, batch["img"]))
        return metrics

    return eval_step


# --------------------------------------------------------------------------
# Cached-latent training (--cache-latents): the VAE is FROZEN during
# diffusion training (reference predictor.py:604-607), so every sample's
# target latents x0 = E3D(U) and conditioning (z_cond = E2D(U_2d), m_cond =
# EDT+resized mask) are CONSTANT across epochs. The reference recomputes them
# per batch (helper.py:277-447) because torch has nowhere to keep them; on
# TPU we encode ONCE, keep the latents device-resident (~3 MB/sample at
# published scale vs ~40 MB of raw volumes re-uploaded per epoch), and every
# later epoch is pure UNet compute with zero host->device traffic. Through
# the tunneled single-chip setup this turns a ~60 s transfer-bound epoch
# into a ~seconds compute-bound one; on a co-located host it still removes
# the per-epoch VAE encodes (~40% of the plain step, BENCH_MATRIX).
#
# Equivalence: cached_latent_loss_fn splits its rng exactly like
# predictor.forward (r_noise, r_t), draws over the same channels-last
# shapes, and runs the same q_sample -> UNet -> cost pipeline, so given the
# same params/batch/rng it reproduces diffusion_loss_fn numerically (~1e-6,
# tests/test_cached_latents.py; not claimed bitwise — the frozen-VAE encode
# runs in a separate jit whose XLA fusion can differ in the last ulp). Not
# supported (the trainer errors): physics or velocity losses (they decode
# full-res velocity every step). Flip augmentation IS supported via the
# 4-variant flip cache (flip_variant_batch below +
# helper.build_latent_cache(flip_variants=True)): latents of flipped
# volumes are not flips of latents, so all four (flip_h, flip_z) encodes
# are cached variant-major and indexed per epoch by the dataset's own
# host-side augmentation draws (helper.flip_variant_draws).
# --------------------------------------------------------------------------


def flip_variant_batch(batch: Dict[str, jnp.ndarray], flip_h: bool,
                       flip_z: bool) -> Dict[str, jnp.ndarray]:
    """Apply the dataset's flip augmentation to a raw channels-first batch
    {'img','U_2d','U'} of (B, S, C, H, W) tensors — exactly
    MicroFlowDataset._augment_sample (data/dataset.py:277-303, reference
    dataset.py:174-217): flip-H mirrors the H axis and negates vy
    (channel 1) of both velocity tensors; flip-Z mirrors the slice axis
    and negates vz (channel 2). The flips are static (trace-time) booleans
    so each of the 4 variants compiles once for the flip-variant latent
    cache."""
    def flip(x, velocity):
        if flip_h:
            x = jnp.flip(x, axis=-2)
        if flip_z:
            x = jnp.flip(x, axis=1)
        if velocity:
            sign = np.ones((x.shape[2],), np.float32)
            if flip_h:
                sign[1] = -1.0
            if flip_z:
                sign[2] = -1.0
            x = x * jnp.asarray(sign).reshape(1, 1, -1, 1, 1)
        return x

    return {
        "img": flip(batch["img"], velocity=False),
        "U_2d": flip(batch["U_2d"], velocity=True),
        "U": flip(batch["U"], velocity=True),
    }


def precompute_latent_cache(predictor, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """One frozen-VAE encode pass over a raw batch -> per-sample cached
    tensors, all channels-last: x0 (B, ld, lh, lw, C), z (B, ld, lh, lw, C),
    m (B, ld, lh, lw, 1). Jit this and map it over the dataset once."""
    x_start = predictor.encode_target(batch["U"])          # (B,S,C,lh,lw) cf
    z_flat, m_flat = predictor.prepare_conditioning(batch["img"], batch["U_2d"])
    b, ld = x_start.shape[0], x_start.shape[1]
    lh, lw = x_start.shape[-2:]
    c = predictor.latent_channels
    x0 = jnp.moveaxis(x_start, 2, -1)                      # -> (B,ld,lh,lw,C)
    return {
        "x0": x0,
        "z": z_flat.reshape(b, ld, lh, lw, c),
        "m": m_flat.reshape(b, ld, lh, lw, m_flat.shape[-1]),
    }


def cached_latent_loss_fn(
    unet_params,
    predictor: LatentDiffusionPredictor,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    *,
    cost_name: str = "normalized_mse_loss_per_component",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """batch keys: 'x0'/'z' (B, ld, lh, lw, C), 'm' (B, ld, lh, lw, 1) from
    precompute_latent_cache. Reproduces diffusion_loss_fn numerically
    (~1e-6; same rng stream and op order) for the plain (no physics / no
    velocity) configuration."""
    pred = dataclasses.replace(predictor, unet_params=unet_params)
    cost = cost_function(cost_name)
    x0, z, m = batch["x0"], batch["z"], batch["m"]
    b, ld = x0.shape[0], x0.shape[1]
    flat = lambda a: a.reshape((b * ld,) + a.shape[2:])
    x0f, zf, mf = flat(x0), flat(z), flat(m)
    # same split order and shapes as predictor.forward -> identical draws
    r_noise, r_t = jax.random.split(rng)
    noise = jax.random.normal(r_noise, x0f.shape, x0f.dtype)
    t = jax.random.randint(r_t, (b * ld,), 0, pred.num_timesteps)
    x_t = pred.scheduler.q_sample(x0f, t, noise)
    eps_pred = pred._unet_eps(x_t, zf, mf, t)
    loss = cost(_cl_to_cf(eps_pred), _cl_to_cf(noise))
    sg = jax.lax.stop_gradient
    aux = {"noise_loss": sg(loss), "primary_loss": sg(loss), "loss": sg(loss)}
    return loss, aux


def make_cached_latent_train_step(
    optimizer: optax.GradientTransformation,
    *,
    cost_name: str = "normalized_mse_loss_per_component",
) -> Callable:
    """train_step(predictor, opt_state, cached_batch, rng) -> (predictor',
    opt_state', aux) over device-resident latents."""
    grad_fn = jax.value_and_grad(
        partial(cached_latent_loss_fn, cost_name=cost_name), has_aux=True)

    def train_step(predictor, opt_state, batch, rng):
        from ..models.layers import train_trace

        if getattr(predictor, "unet_int8", False) or getattr(predictor, "vae_int8", False):
            raise ValueError(
                "Training through an int8 predictor would yield zero "
                "gradients through the round/clip quantizers; disable int8 "
                "for training.")
        with train_trace():
            (_, aux), grads = grad_fn(
                predictor.unet_params, predictor, batch, rng)
            updates, new_opt = optimizer.update(
                grads, opt_state, predictor.unet_params)
            new_params = optax.apply_updates(predictor.unet_params, updates)
            return (dataclasses.replace(predictor, unet_params=new_params),
                    new_opt, aux)

    return train_step


def make_cached_latent_eval_step(
    *,
    cost_name: str = "normalized_mse_loss_per_component",
) -> Callable:
    """Validation loss over cached latents (same quantity the regular eval
    step computes for the plain configuration)."""
    def eval_step(predictor, batch, rng):
        _, aux = cached_latent_loss_fn(
            predictor.unet_params, predictor, batch, rng,
            cost_name=cost_name)
        return {"val_loss": aux["noise_loss"]}

    return eval_step
