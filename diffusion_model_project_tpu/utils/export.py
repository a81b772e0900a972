"""Serving export: serialize the full sampling pipeline as a StableHLO artifact.

The reference deploys by shipping the Python package + torch checkpoint and
re-running `inference.py` (reference Inference/inference.py) — every serving
host needs the model code. The TPU-native deployment story is ahead-of-time
compilation: ``jax.export`` lowers the entire jitted pipeline (EDT →
conditioning encode → fused DDIM scan → decode → denormalize → mask) to
StableHLO with the trained weights baked in as constants, producing a single
self-contained blob. A serving host deserializes and calls it with nothing but
jax installed — no model code, no checkpoint plumbing, no trace/compile on the
request path (XLA compiles the deserialized module once per process).

Shapes are static (batch baked at export time): TPU serving wants fixed shapes
anyway — a bucket of batch sizes is exported as a bucket of artifacts.

``platforms`` defaults to both "tpu" and "cpu" so one artifact serves either
backend; lowering is platform-tagged StableHLO, so this costs artifact bytes,
not correctness.
"""
from __future__ import annotations

import io
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def export_sampler(
    pred,
    *,
    batch: int,
    num_steps: int = 50,
    eta: float = 0.0,
    image_hw: Tuple[int, int] = (256, 256),
    num_slices: int = 11,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> bytes:
    """Serialize ``pred.predict_ddim`` (weights baked in) to a StableHLO blob.

    The exported callable takes the reference's channels-first inputs
    ``img (B, S, 1, H, W)``, ``velocity_2d (B, S, 3, H, W)`` and a flat
    ``noise`` tensor (the caller's RNG draw — keeps the artifact
    deterministic and RNG-policy-free), and returns the masked, denormalized
    ``(B, S, 3, H, W)`` velocity volume.
    """
    h, w = image_hw
    s = num_slices
    ld = s // pred.vae_depth_factor
    # channels-first like every public noise arg (reference contract)
    noise_shape = (batch * ld, pred.latent_channels, h // 4, w // 4)

    def sample(img, velocity_2d, noise):
        return pred.predict_ddim(
            img, velocity_2d, num_steps=num_steps, eta=eta, noise=noise)

    args = (
        jax.ShapeDtypeStruct((batch, s, 1, h, w), jnp.float32),
        jax.ShapeDtypeStruct((batch, s, 3, h, w), jnp.float32),
        jax.ShapeDtypeStruct(noise_shape, jnp.float32),
    )
    exported = jax_export.export(
        jax.jit(sample), platforms=tuple(platforms))(*args)
    return bytes(exported.serialize())


def load_sampler(blob: bytes):
    """Deserialize an ``export_sampler`` blob into a jittable callable.

    Needs only jax — none of this package's model code. The returned callable
    is ``f(img, velocity_2d, noise) -> velocity``; wrap it in ``jax.jit`` for
    the usual dispatch caching (the module itself is already lowered).
    """
    exported = jax_export.deserialize(blob)
    return exported.call


def save_sampler(path: str, pred, **kwargs) -> None:
    with open(path, "wb") as f:
        f.write(export_sampler(pred, **kwargs))


def load_sampler_file(path: str):
    with open(path, "rb") as f:
        return load_sampler(f.read())
