"""Dynamic int8 quantization for the frozen VAE's convolutions.

The VAE is frozen at diffusion-training time and at inference (reference
predictor.py:604-607), making it an ideal static-weight quantization target.
The v5e MXU runs int8 at 2x the bf16 rate; measured on this chip the hot conv
stages go 96->140 (128ch/256^2), 114->162 (256ch/128^2), 127->172 TFLOP/s
(512ch/64^2) including the requantization chain (scripts/perf_probe_conv.py).

Scheme: symmetric dynamic quantization —
  activations: PER-INPUT-CHANNEL scales max|x[..., i]|/127, folded into the
    weight before its own per-output-channel quantization (the conv sums over
    input channels, so per-channel act scales must ride the weight);
  weights: per-output-channel scales, recomputed per call (weights are tiny
    next to activations; no calibration pass needed).
Convs with very thin channel counts (in<16 or out<32: the 3->128 stems and
128->3 heads) stay in the float path — they are a rounding error of the FLOPs
and the least quantization-friendly. Numerics validated e2e in tests/test_quant.py.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

# below these channel counts the float path is kept (accuracy, and the MXU
# gains nothing on layouts this thin)
MIN_IN_CH = 16
MIN_OUT_CH = 32


def quantize_act(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor symmetric int8: returns (x_q int8, scale f32 scalar)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf)) + 1e-30
    scale = amax / 127.0
    x_q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return x_q, scale


def quantize_act_per_channel(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-last-axis-channel symmetric int8: (x_q int8, scale f32 (cin,))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=tuple(range(x.ndim - 1))) + 1e-30
    scale = amax / 127.0
    x_q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return x_q, scale


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 for (..., in, out) conv weights:
    returns (w_q int8, scale f32 (out,))."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=tuple(range(w.ndim - 1))) + 1e-30
    scale = amax / 127.0
    w_q = jnp.clip(jnp.round(wf / scale), -127.0, 127.0).astype(jnp.int8)
    return w_q, scale


def use_float_path(cin: int, cout: int) -> bool:
    """Thin-channel convs (the 3->128 stems / 128->3 heads) should stay in
    the caller's canonical float path — callers check this BEFORE routing
    here, so the quant fns never duplicate the float conv."""
    return cin < MIN_IN_CH or cout < MIN_OUT_CH


def int8_conv(x: jnp.ndarray, weight: jnp.ndarray, strides, pad_cfg,
              dimension_numbers, out_dtype) -> jnp.ndarray:
    """Quantize-convolve-rescale; drop-in for one lax.conv_general_dilated.
    weight layout (..., in, out), x channels-last. Caller is responsible for
    the use_float_path() thin-channel check."""
    x_q, sx = quantize_act_per_channel(x)
    w_scaled = weight.astype(jnp.float32) * sx[..., :, None]  # fold act scales
    w_q, sw = quantize_weight(w_scaled)
    y = lax.conv_general_dilated(
        x_q, w_q, strides, pad_cfg, dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sw).astype(out_dtype)


def int8_conv3d_decomposed(x: jnp.ndarray, weight: jnp.ndarray, hw_strides,
                           hw_pads, out_dtype) -> jnp.ndarray:
    """Depth-3 stride-1 Conv3D as 3 kernel-depth-1 int8 Conv3Ds over the full
    padded tensor with shifted-output int32 accumulation and ONE rescale
    (x quantized once; mirrors layers.Conv._conv3d_decomposed's
    CONV3D_SHIFT_OUTPUTS structure — input-slice materialization profiled
    costlier than convolving the 2 pad slices). weight (3, kh, kw, cin, cout)."""
    b, d_pad, h, w, cin = x.shape
    d_out = d_pad - 2
    dn3 = lax.conv_dimension_numbers(
        x.shape, (1,) + weight.shape[1:], ("NDHWC", "DHWIO", "NDHWC"))
    x_q, sx = quantize_act_per_channel(x)
    w_scaled = weight.astype(jnp.float32) * sx[..., :, None]
    w_q, sw = quantize_weight(w_scaled)
    acc = None
    for k in range(3):
        y = lax.conv_general_dilated(
            x_q, w_q[k:k + 1], (1,) + tuple(hw_strides),
            [(0, 0)] + list(hw_pads), dimension_numbers=dn3,
            preferred_element_type=jnp.int32)[:, k:k + d_out]
        acc = y if acc is None else acc + y
    return (acc.astype(jnp.float32) * sw).astype(out_dtype)
