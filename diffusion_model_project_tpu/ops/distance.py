"""Exact Euclidean distance transform, fully on-device.

The reference computes the EDT of each microstructure slice with
``scipy.ndimage.distance_transform_edt`` on the host, forcing a GPU->CPU->GPU
round trip every training/inference batch
(Diffusion_model/src/predictor.py:1096-1116). Here the transform runs inside
the jitted graph using the exact two-phase separable decomposition:

  phase 1:  g[y, x]  = min_{y': im[y',x]=0} |y - y'|      (two lax.scans)
  phase 2:  D[y, x]² = min_{x'} ( g[y, x']² + (x - x')² ) (blocked VPU reduce)

Phase 2 is the exact lower-envelope minimization evaluated by brute force in
x'-blocks — data-independent control flow, so XLA can tile it; for 256²
microstructures this is ~35 MFLOP/slice, negligible next to one UNet step.
Output matches scipy exactly for binary inputs with at least one zero pixel
(asserted in tests/test_ops.py); for the degenerate all-nonzero image —
where scipy's result is undefined behavior — we return the finite geometric
bound hypot(H, W) instead (see distance_transform_edt).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# np scalar, NOT jnp: a module-level jnp constant would initialize the JAX
# backend at import time — before CLIs can select --device, which makes every
# `--device cpu` subprocess dial the TPU plugin (and hang whenever the axon
# tunnel flakes, observed wedging the test suite mid-run).
_BIG = np.float32(1e9)


def _column_distance(solid: jnp.ndarray) -> jnp.ndarray:
    """Per-column 1D distance to the nearest solid (zero) pixel.

    solid: (B, H, W) boolean, True where the image is 0.
    Returns float32 (B, H, W); columns with no solid pixel get ~1e9.
    """
    b, h, w = solid.shape
    init = jnp.full((b, w), _BIG, dtype=jnp.float32)

    def step(carry, s_row):
        d = jnp.where(s_row, 0.0, carry + 1.0)
        return d, d

    rows = jnp.moveaxis(solid, 1, 0)  # (H, B, W)
    _, down = lax.scan(step, init, rows)
    _, up = lax.scan(step, init, rows[::-1])
    g = jnp.minimum(jnp.moveaxis(down, 0, 1), jnp.moveaxis(up[::-1], 0, 1))
    return jnp.minimum(g, _BIG)


def distance_transform_edt(img: jnp.ndarray, block: int = 64) -> jnp.ndarray:
    """Exact EDT of a batch of binary images ``(B, H, W)`` (1=fluid, 0=solid).

    Returns float32 distances from each nonzero pixel to the nearest zero
    pixel (zero pixels map to 0), identical to scipy.ndimage.distance_transform_edt.
    """
    img = jnp.asarray(img)
    b, h, w = img.shape
    solid = img == 0
    g = _column_distance(solid)
    g2 = g * g  # (B, H, W)

    xs = jnp.arange(w, dtype=jnp.float32)
    if w % block != 0:
        block = w
    n_blocks = w // block

    def one_block(xc):
        # xc: (block,) output column positions
        d2 = g2[:, :, None, :] + jnp.square(xc[:, None] - xs[None, :])
        return jnp.min(d2, axis=-1)  # (B, H, block)

    blocks = lax.map(one_block, xs.reshape(n_blocks, block))
    d2 = jnp.moveaxis(blocks, 0, 2).reshape(b, h, w)
    # degenerate all-fluid image (no zero pixel anywhere): real distances are
    # always <= hypot(h-1, w-1), so this clamp only fires there. scipy's
    # output for that case is undefined behavior (finite distances to a
    # virtual zero just outside the border — an artifact of its uninitialized
    # feature transform); returning the sentinel ~1e9 would flow through
    # norm_input into the UNet conditioning and silently blow activations up,
    # so return the same order of magnitude scipy's artifact has: the
    # geometric upper bound.
    return jnp.minimum(jnp.sqrt(d2), np.hypot(h, w))
