"""Per-channel max normalization.

Mirrors the reference MaxNormalizer (Diffusion_model/src/normalizer.py:22-58):
divide each channel by a fixed scale factor; ``inverse`` multiplies back.
Scale factors are plain arrays (non-trainable), stored alongside model params.

Channel axis is configurable because this package is channels-last internally
while the reference API surface is channels-first (N, C, H, W).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MaxNormalizer:
    scale_factors: jnp.ndarray  # (C,)

    def __init__(self, scale_factors: Sequence[float] | jnp.ndarray = (1.0,)):
        self.scale_factors = jnp.asarray(scale_factors, dtype=jnp.float32)

    def _shaped(self, x: jnp.ndarray, channel_axis: int) -> jnp.ndarray:
        shape = [1] * x.ndim
        shape[channel_axis] = self.scale_factors.shape[0]
        return self.scale_factors.reshape(shape)

    def __call__(self, x: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
        return self.normalize(x, channel_axis)

    def normalize(self, x: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
        return x / self._shaped(x, channel_axis)

    def inverse(self, x: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
        return x * self._shaped(x, channel_axis)

    # pytree protocol so normalizers can live inside jitted closures / scans
    def tree_flatten(self):
        return (self.scale_factors,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.scale_factors = children[0]
        return obj
