"""Resize primitives matching torch.nn.functional.interpolate semantics.

The reference resizes the microstructure mask to the latent grid with
``interpolate(..., mode='bilinear'/'trilinear', align_corners=False)``
(Diffusion_model/src/predictor.py:697-721, 878-884) and upsamples in the VAE
decoder with ``nn.Upsample(scale_factor=(1, 2, 2))`` (nearest;
VAE_model/src/vae/decoder.py:46,58).

torch's linear modes do NOT anti-alias on downsampling (unlike
``jax.image.resize``), so interpolation is implemented here as separable
gather+lerp with torch's exact source-coordinate rule:
``src = (i + 0.5) * in/out - 0.5`` clamped at 0. Parity (both up- and
down-sampling) is asserted in tests/test_ops.py against torch.
"""
from __future__ import annotations

import jax.numpy as jnp


def _resize_axis_linear(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    """1D linear resize along ``axis`` with align_corners=False, no antialias."""
    if not jnp.issubdtype(x.dtype, jnp.floating):
        # torch.nn.functional.interpolate raises for integer/bool inputs in
        # the linear modes; casting the lerp weights to such a dtype would
        # silently truncate every fractional weight to 0 or 1 instead
        raise TypeError(
            f"linear resize requires a floating dtype, got {x.dtype} "
            f"(cast the input first; torch interpolate raises here too)")
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    scale = in_size / out_size
    src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    src = jnp.maximum(src, 0.0)
    i0 = jnp.minimum(jnp.floor(src).astype(jnp.int32), in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    # lerp in >= float32: half-precision weights would round to ~3 significant
    # digits and drift from the torch parity this module asserts
    wdtype = x.dtype if jnp.issubdtype(x.dtype, jnp.float64) else jnp.float32
    w1 = (src - i0.astype(jnp.float32)).astype(wdtype)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w1 = w1.reshape(shape)
    x0 = jnp.take(x, i0, axis=axis).astype(wdtype)
    x1 = jnp.take(x, i1, axis=axis).astype(wdtype)
    return (x0 + w1 * (x1 - x0)).astype(x.dtype)


def interpolate_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of ``(B, H, W, C)`` to ``(B, out_h, out_w, C)``."""
    x = _resize_axis_linear(x, 1, out_h)
    x = _resize_axis_linear(x, 2, out_w)
    return x


def interpolate_trilinear(
    x: jnp.ndarray, out_d: int, out_h: int, out_w: int
) -> jnp.ndarray:
    """Trilinear resize of ``(B, D, H, W, C)``."""
    x = _resize_axis_linear(x, 1, out_d)
    x = _resize_axis_linear(x, 2, out_h)
    x = _resize_axis_linear(x, 3, out_w)
    return x


def upsample_nearest_hw(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample of H and W only, on ``(B, D, H, W, C)``.

    Matches ``nn.Upsample(scale_factor=(1, 2, 2))`` for integer factors.
    """
    x = jnp.repeat(x, 2, axis=2)
    x = jnp.repeat(x, 2, axis=3)
    return x
