"""Core elementwise / normalization / pooling primitives.

All tensor layouts in this package are channels-LAST (TPU-friendly): 2D feature
maps are ``(B, H, W, C)``, 3D volumes are ``(B, D, H, W, C)``. The public
predictor API converts from the reference's channels-first contract at the
boundary only.

Numerical contracts mirror the reference implementation:
  - padding rule: reference Diffusion_model/src/unet/blocks.py:254-262
  - GroupNorm semantics (eps=1e-5, affine): torch.nn.GroupNorm
  - activations: reference Diffusion_model/src/unet/models.py:306-323
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

# GroupNorm statistics algorithm: False = fast one-pass (inference default),
# True = robust two-pass (set at trace time by models.layers.train_trace,
# which every training step enters). See group_norm for the rationale.
GN_TWO_PASS = False


def get_padding(kernel_size: int) -> int:
    """'Same-ish' padding for a given kernel size (even k -> k/2-1, odd -> k//2)."""
    if kernel_size % 2 == 0:
        return kernel_size // 2 - 1
    return kernel_size // 2


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


_ACTIVATIONS: dict = {
    "silu": silu,
    "relu": jax.nn.relu,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "softplus": jax.nn.softplus,
}


def activation_function(name: Optional[str]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Explicit activation registry (the reference resolves names via eval())."""
    if name is not None:
        name = name.strip().lower()
    if not name:
        return lambda x: x
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise NotImplementedError(f"Unknown activation: {name!r}")


def group_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm over channels-last input ``(B, *spatial, C)``.

    Matches torch.nn.GroupNorm: statistics are computed per-sample over all
    spatial positions and the channels within each group, in float32.
    """
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    spatial = x.shape[1:-1]
    xg = x.reshape(b, -1, num_groups, c // num_groups)
    xf = xg.astype(jnp.float32)
    if GN_TWO_PASS:
        # training trace (models.layers.train_trace): torch-style two-pass
        # mean then E[(x-mean)^2] — robust to any DC drift of the activations
        # (early/exploding training can push |mean|/std past the ~3e3 where
        # the one-pass form below loses every variance bit). The extra read
        # is cheap next to the backward, which re-reads x anyway.
        mean = jnp.mean(xf, axis=(1, 3))
        var = jnp.mean(jnp.square(xf - mean[:, None, :, None]), axis=(1, 3))
    else:
        # inference: one-pass f32 sum/sumsq in a single read of x (the
        # two-pass form costs ~5% e2e on v5e; a shifted one-pass that fixes
        # the cancellation de-fuses XLA's reduce and costs 19%). E[x^2]-mu^2
        # in f32 is exact enough while |mean|/std < ~1e3, which converged
        # checkpoints' post-conv activations satisfy by orders of magnitude.
        s1 = jnp.sum(xf, axis=(1, 3))
        s2 = jnp.sum(jnp.square(xf), axis=(1, 3))
        n = xg.shape[1] * xg.shape[3]
        mean = s1 / n
        var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    # subtract-then-scale: x*scale - mean*scale cancels catastrophically when
    # |mean| >> std (both products ~|mean|*scale with ulp >> 1)
    scale = jax.lax.rsqrt(var + eps)[:, None, :, None]
    out = (xf - mean[:, None, :, None]) * scale
    out = out.reshape(b, *spatial, c)
    out = out * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out.astype(orig_dtype)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max pooling on ``(B, H, W, C)`` (floor semantics like torch)."""
    b, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, : h2 * 2, : w2 * 2, :]
    x = x.reshape(b, h2, 2, w2, 2, c)
    return jnp.max(x, axis=(2, 4))
