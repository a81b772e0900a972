"""Thin flax.linen primitives with torch-compatible parameter layouts.

Parameter naming intentionally mirrors torch (``weight``/``bias``) so the
PyTorch-checkpoint importer (utils/torch_import.py) is a mechanical layout
transpose. All layers are channels-last.
"""
from __future__ import annotations

import contextlib
from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.basic import group_norm
from ..ops.attention import multihead_attention

_PAD_MODES = {"zeros": "constant", "reflect": "reflect", "replicate": "edge", "circular": "wrap"}

# Decompose depth-3 stride-1 Conv3D into 3 depth-shifted Conv2Ds summed
# (numerically exact). XLA maps the 2D convs onto the MXU better than its
# native 3D convolution at these shapes even counting the extra pad/slice
# materialization: full D3D decode 385 ms (decomposed) vs 475 ms (native) at
# B=4 bf16 on v5e, chained-loop methodology (single-dispatch fori_loop x10 —
# one-shot timings through the axon tunnel swing by 2x and once favored
# native; trust only the chained numbers).
CONV3D_DECOMPOSE = True
# Shift OUTPUTS instead of inputs in the decomposition (see
# _conv3d_decomposed docstring). Chained A/B at B=8 on v5e: decode 722->479 ms,
# E2D conditioning 548->350 ms — the input-materialization (pad_slice) cost
# dwarfs the 2-extra-depth-slices of conv work. INFERENCE ONLY: the variant's
# backward pass holds full-depth pre-slice cotangents per tap, which both
# slows the train step (311->337 ms at the published diffusion config) and
# OOMs the physics step at 256^2 (RESOURCE_EXHAUSTED on 15.75 GB); training
# steps trace under train_trace() to get the round-1 memory profile.
CONV3D_SHIFT_OUTPUTS = True


@contextlib.contextmanager
def train_trace():
    """Trace-time switches for TRAINING steps (enter INSIDE the jitted step
    so they apply at trace time regardless of caller):

    - conv3d decomposition: shift-INPUTS (the shift-outputs variant's
      backward holds full-depth pre-slice cotangents per tap — slower and
      OOMs the physics step at 256^2; see CONV3D_SHIFT_OUTPUTS).
    - GroupNorm: robust two-pass statistics (one-pass E[x^2]-mu^2 loses all
      variance bits if training drifts activations to |mean|/std > ~3e3;
      see ops.basic.group_norm).
    - Pallas fusion OFF: pallas_call has no transpose rule, so a training
      step traced through fused_groupnorm_act/fused_attention would fail in
      reverse-mode grad (and only when the VMEM-budget fallback didn't
      happen to reroute it) — inference keeps whatever the flags say.
    """
    from ..ops import basic

    global PALLAS_ATTENTION, PALLAS_GROUPNORM
    prev = (CONV3D_SHIFT_OUTPUTS, basic.GN_TWO_PASS,
            PALLAS_ATTENTION, PALLAS_GROUPNORM)
    _set_train_trace(True)
    PALLAS_ATTENTION = PALLAS_GROUPNORM = False
    try:
        yield
    finally:
        (globals()["CONV3D_SHIFT_OUTPUTS"], basic.GN_TWO_PASS,
         globals()["PALLAS_ATTENTION"], globals()["PALLAS_GROUPNORM"]) = prev


def _set_train_trace(on: bool) -> None:
    from ..ops import basic

    global CONV3D_SHIFT_OUTPUTS
    CONV3D_SHIFT_OUTPUTS = not on
    basic.GN_TWO_PASS = on



# Route GroupNorm+activation and/or self-attention through the fused Pallas
# kernels (ops/pallas/). Off by default: numerically equivalent, but measured
# NEUTRAL-to-slightly-slower for the published model's shapes on v5e (XLA
# already fuses these small normalization/attention stages well; e2e bench
# 4.09 vs 4.22 vol/s with attention fusion on). Kept for larger-token-count
# configurations where the fused VMEM-resident path wins.
PALLAS_ATTENTION = False
PALLAS_GROUPNORM = False


def enable_pallas_fusion(attention: bool = True, groupnorm: bool = True) -> None:
    global PALLAS_ATTENTION, PALLAS_GROUPNORM
    PALLAS_ATTENTION = attention
    PALLAS_GROUPNORM = groupnorm


# Trace-time flag: route Conv through dynamic int8 (MXU int8 is 2x bf16 on
# v5e; used for the FROZEN VAE only — see predictor.with_vae_int8()).
CONV_INT8 = False


@contextlib.contextmanager
def int8_convs():
    """All Convs traced inside this context run the int8 fast path."""
    global CONV_INT8
    prev = CONV_INT8
    CONV_INT8 = True
    try:
        yield
    finally:
        CONV_INT8 = prev



def _pet(x):
    """preferred_element_type: request f32 output only for f32 operands.
    For bf16 operands the TPU MXU already accumulates in f32 internally, and
    asking for an f32 output breaks the conv/einsum VJP (cotangent dtype
    mismatch)."""
    return jnp.float32 if x.dtype == jnp.float32 else None

def _norm_tuple(v, n: int) -> Tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


class Conv(nn.Module):
    """N-D convolution on channels-last input with torch padding semantics.

    weight: (*kernel_spatial, in, out)  [torch (O, I, *spatial) transposed]
    ``padding`` is the symmetric per-side amount (torch ``padding=``); use
    ``extra_pad`` for asymmetric pre-padding (the VAE's stride-(1,2,2)
    downsampling pads (D:1,1 | H:0,1 | W:0,1) with padding=0,
    reference VAE_model/src/vae/encoder.py:76-81).
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    padding_mode: str = "zeros"
    use_bias: bool = True
    extra_pad: Optional[Sequence[Tuple[int, int]]] = None  # per-spatial-dim (lo, hi)
    weight_init: Optional[nn.initializers.Initializer] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ndim = x.ndim - 2  # spatial dims
        ks = _norm_tuple(self.kernel_size, ndim)
        strides = _norm_tuple(self.strides, ndim)
        pad = _norm_tuple(self.padding, ndim)

        in_ch = x.shape[-1]
        weight = self.param(
            "weight",
            self.weight_init
            or nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),  # ~ torch kaiming_uniform(a=sqrt(5))
            (*ks, in_ch, self.features),
        )

        pad_cfg = [(p, p) for p in pad]
        if self.extra_pad is not None:
            pad_cfg = [(a[0] + b[0], a[1] + b[1]) for a, b in zip(pad_cfg, self.extra_pad)]

        if self.padding_mode != "zeros" and any(p != (0, 0) for p in pad_cfg):
            mode = _PAD_MODES[self.padding_mode]
            x = jnp.pad(x, [(0, 0)] + pad_cfg + [(0, 0)], mode=mode)
            pad_cfg = [(0, 0)] * ndim

        if (CONV3D_DECOMPOSE and ndim == 3 and ks[0] == 3 and strides[0] == 1):
            out = self._conv3d_decomposed(x, weight, strides, pad_cfg)
        else:
            dn = lax.conv_dimension_numbers(
                x.shape,
                weight.shape,
                (
                    ("NHC", "HIO", "NHC"),
                    ("NHWC", "HWIO", "NHWC"),
                    ("NDHWC", "DHWIO", "NDHWC"),
                )[ndim - 1],
            )
            from ..ops.quant import use_float_path

            if CONV_INT8 and ndim in (2, 3) and not use_float_path(in_ch, self.features):
                from ..ops.quant import int8_conv

                out = int8_conv(x, weight, strides, pad_cfg, dn, x.dtype)
            else:
                out = lax.conv_general_dilated(
                    x, weight.astype(x.dtype), strides, pad_cfg,
                    dimension_numbers=dn,
                    preferred_element_type=_pet(x),
                ).astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(out.dtype)
        return out

    def _conv3d_decomposed(self, x, weight, strides, pad_cfg):
        """Depth-3 stride-1 Conv3D as sum of 3 depth-shifted Conv2Ds (exact).

        CONV3D_SHIFT_OUTPUTS variant: run each depth tap as a kernel-depth-1
        Conv3D over the FULL padded tensor and shift-add the outputs. The
        input is then read straight from one padded buffer instead of being
        materialized 3x (the profiled pad_slice fusions), at the price of
        convolving the 2 pad slices too (13/11 extra FLOPs at depth 11).
        """
        b, d, h, w, cin = x.shape
        pd_lo, pd_hi = pad_cfg[0]
        if (pd_lo, pd_hi) != (0, 0):
            x = jnp.pad(x, ((0, 0), (pd_lo, pd_hi), (0, 0), (0, 0), (0, 0)))
        d_pad = d + pd_lo + pd_hi
        d_out = d_pad - 2
        hw_pads = list(pad_cfg[1:])
        hw_strides = strides[1:]
        from ..ops.quant import use_float_path

        if CONV_INT8 and not use_float_path(x.shape[-1], self.features):
            from ..ops.quant import int8_conv3d_decomposed

            return int8_conv3d_decomposed(x, weight, hw_strides, hw_pads, x.dtype)

        if CONV3D_SHIFT_OUTPUTS:
            dn3 = lax.conv_dimension_numbers(
                x.shape, (1,) + weight.shape[1:], ("NDHWC", "DHWIO", "NDHWC"))
            out = None
            for k in range(3):
                y = lax.conv_general_dilated(
                    x, weight[k:k + 1].astype(x.dtype), (1,) + tuple(hw_strides),
                    [(0, 0)] + hw_pads, dimension_numbers=dn3,
                    preferred_element_type=_pet(x),
                )[:, k:k + d_out]
                out = y if out is None else out + y
            return out.astype(x.dtype)

        dn2 = lax.conv_dimension_numbers(
            (b * d_out, h, w, cin), weight.shape[1:], ("NHWC", "HWIO", "NHWC"))

        out = None
        for k in range(3):
            xs = x[:, k:k + d_out].reshape(b * d_out, h, w, cin)
            y = lax.conv_general_dilated(
                xs, weight[k].astype(x.dtype), hw_strides, hw_pads,
                dimension_numbers=dn2, preferred_element_type=_pet(x),
            )
            out = y if out is None else out + y
        out = out.astype(x.dtype)
        return out.reshape(b, d_out, *out.shape[1:])


class ConvTranspose2x2(nn.Module):
    """torch ConvTranspose2d(kernel=2, stride=2) as an einsum + pixel interleave.

    With kernel == stride and no padding the transposed conv has no overlap:
    out[2y+dy, 2x+dx] = sum_i in[y, x, i] * W[i, o, dy, dx] — a pure matmul
    that XLA maps straight onto the MXU. weight layout matches torch:
    (in, out, kH, kW).
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        weight = self.param(
            "weight",
            # in_axis=1: torch's _calculate_fan_in_and_fan_out reads size(1)
            # as fan-in, which for a ConvTranspose (in, out, kH, kW) weight is
            # the OUT channels — so kaiming_uniform(a=sqrt(5)) bounds are
            # 1/sqrt(out*kH*kW). The default (-2, -1) axes on this layout
            # computed fan_in = kH*in*out, ~16x too small a bound at the
            # reference widths (wrong init scale for from-scratch training;
            # imported checkpoints were unaffected).
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform",
                                             in_axis=1, out_axis=0),
            (c, self.features, 2, 2),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        out = jnp.einsum(
            "bhwi,iojk->bhjwko", x, weight.astype(x.dtype),
            preferred_element_type=_pet(x),
        ).astype(x.dtype)
        out = out.reshape(b, h * 2, w * 2, self.features)
        return out + bias.astype(out.dtype)


class GroupNorm(nn.Module):
    """torch-compatible GroupNorm (eps=1e-5, affine) on channels-last input.

    ``act`` optionally fuses the following activation; with PALLAS_FUSION the
    fused Pallas kernel handles norm+act in one VMEM pass.
    """

    num_groups: int
    act: str = ""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if PALLAS_GROUPNORM and self.act in ("", "silu", "relu"):
            from ..ops.pallas import fused_groupnorm_act

            return fused_groupnorm_act(x, weight, bias, self.num_groups, act=self.act)
        out = group_norm(x, weight, bias, self.num_groups)
        from ..ops.basic import activation_function

        return activation_function(self.act)(out)


class Dense(nn.Module):
    """Linear layer; weight stored (in, out) = torch weight.T."""

    features: int
    use_bias: bool = True
    weight_init: Optional[nn.initializers.Initializer] = None
    bias_init: Optional[nn.initializers.Initializer] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param(
            "weight",
            self.weight_init
            or nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (x.shape[-1], self.features),
        )
        out = jnp.einsum(
            "...i,io->...o", x, weight.astype(x.dtype),
            preferred_element_type=_pet(x),
        ).astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init or nn.initializers.zeros,
                              (self.features,))
            out = out + bias.astype(out.dtype)
        return out


class MultiheadSelfAttention(nn.Module):
    """torch nn.MultiheadAttention(batch_first=True) self-attention on (B,T,E).

    Params: in_proj_weight (E,3E) [torch transposed], in_proj_bias (3E,),
    out_proj.{weight (E,E) transposed, bias}.
    """

    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        e = x.shape[-1]
        w_qkv = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (e, 3 * e))
        b_qkv = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        # torch MHA._reset_parameters xavier-inits ONLY in_proj_weight and
        # zeroes both biases; out_proj.weight keeps the Linear default
        # kaiming_uniform(a=sqrt(5)) = uniform(+-sqrt(1/E)) — xavier here
        # would start the from-scratch attention output path ~1.7x too wide
        w_out = self.param(
            "out_proj_weight",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (e, e))
        b_out = self.param("out_proj_bias", nn.initializers.zeros, (e,))
        if PALLAS_ATTENTION:
            from ..ops.pallas import fused_attention

            return fused_attention(
                x, w_qkv.astype(x.dtype), b_qkv.astype(x.dtype),
                w_out.astype(x.dtype), b_out.astype(x.dtype), self.num_heads)
        return multihead_attention(
            x, w_qkv.astype(x.dtype), b_qkv.astype(x.dtype),
            w_out.astype(x.dtype), b_out.astype(x.dtype), self.num_heads,
        )
