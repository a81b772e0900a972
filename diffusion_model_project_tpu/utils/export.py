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

Measured role (PERF.md "Serving-artifact study"): the artifact is the
PORTABILITY path — correct at every scale, no model code on the host, 19 s
compile at published scale. It is NOT the throughput path on the current
toolchain: XLA compiles deserialized modules without its full optimization
pipeline (~7-10x slower than the same program under in-process jit). For
throughput serving on a matched toolchain, run the in-process jitted
pipeline with a persistent JAX_COMPILATION_CACHE_DIR — compile once per
cluster, cached startup thereafter.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


# container magic for the weights-as-arguments format (see export_sampler)
_CONTAINER_MAGIC = b"DMTPUSRV1\x00"


def export_sampler(
    pred,
    *,
    batch: int,
    num_steps: int = 50,
    eta: float = 0.0,
    sampler: str = "ddim",
    image_hw: Tuple[int, int] = (256, 256),
    num_slices: int = 11,
    platforms: Sequence[str] = ("tpu", "cpu"),
    bake_weights: bool = True,
) -> bytes:
    """Serialize the sampling pipeline to a self-contained serving blob
    (``sampler``: "ddim" or "dpm" — DPM-Solver++(2M), ~DDIM-50 quality in
    ~10 steps).

    The exported callable takes the reference's channels-first inputs
    ``img (B, S, 1, H, W)``, ``velocity_2d (B, S, 3, H, W)`` and a flat
    ``noise`` tensor (the caller's RNG draw — keeps the artifact
    deterministic and RNG-policy-free), and returns the masked, denormalized
    ``(B, S, 3, H, W)`` velocity volume.

    ``bake_weights`` chooses the artifact layout; both are single files that
    ``load_sampler`` handles transparently:

    - True: weights become StableHLO constants. Zero-argument-surface, but
      XLA must chew through hundreds of MB of constants at compile time —
      fine for small/medium models.
    - False: the predictor pytree is flattened and exported as leading
      ARGUMENTS (the treedef stays inside the module via tree_unflatten at
      trace time), and the leaves ship in the same file next to the module.
      The module stays small and compiles like the in-process pipeline;
      the serving host still needs no model code — ``load_sampler`` feeds
      the stored leaves back positionally.
    """
    h, w = image_hw
    s = num_slices
    ld = s // pred.vae_depth_factor
    # channels-first like every public noise arg (reference contract)
    noise_shape = (batch * ld, pred.latent_channels, h // 4, w // 4)

    data_args = (
        jax.ShapeDtypeStruct((batch, s, 1, h, w), jnp.float32),
        jax.ShapeDtypeStruct((batch, s, 3, h, w), jnp.float32),
        jax.ShapeDtypeStruct(noise_shape, jnp.float32),
    )

    def _predict(p, img, velocity_2d, noise):
        if sampler == "dpm":
            return p.predict_dpm(
                img, velocity_2d, num_steps=num_steps, noise=noise)
        assert sampler == "ddim", f"unknown sampler {sampler!r}"
        return p.predict_ddim(
            img, velocity_2d, num_steps=num_steps, eta=eta, noise=noise)

    if bake_weights:
        def sample(img, velocity_2d, noise):
            return _predict(pred, img, velocity_2d, noise)

        exported = jax_export.export(
            jax.jit(sample), platforms=tuple(platforms))(*data_args)
        return bytes(exported.serialize())

    leaves, treedef = jax.tree_util.tree_flatten(pred)

    def sample_args(leaf_list, img, velocity_2d, noise):
        p = jax.tree_util.tree_unflatten(treedef, leaf_list)
        return _predict(p, img, velocity_2d, noise)

    # jnp.result_type reads the dtype without a device transfer —
    # jnp.asarray(l).dtype would materialize every host-numpy weight leaf on
    # device (doubling export peak memory on exactly the too-big-to-bake
    # models this mode exists for)
    leaf_specs = [jax.ShapeDtypeStruct(np.shape(l), jnp.result_type(l))
                  for l in leaves]
    exported = jax_export.export(
        jax.jit(sample_args), platforms=tuple(platforms))(
        leaf_specs, *data_args)
    module = bytes(exported.serialize())

    from flax import serialization

    payload = serialization.msgpack_serialize({
        "module": module,
        "leaves": {str(i): np.asarray(l) for i, l in enumerate(leaves)},
    })
    return _CONTAINER_MAGIC + payload


def load_sampler(blob: bytes):
    """Deserialize an ``export_sampler`` blob into a ready callable.

    Needs only jax (+flax for the weights-as-arguments container) — none of
    this package's model code. The returned callable is
    ``f(img, velocity_2d, noise) -> velocity``. Call it DIRECTLY: the module
    is already lowered and compiles once on first call. Do NOT wrap it in an
    outer ``jax.jit`` — re-tracing embeds the weight leaves as HLO constants,
    exactly the pathological compile the weights-as-arguments layout avoids
    (measured at published scale: 19 s direct vs a >30 min compile timeout
    under an outer jit).
    """
    if not blob.startswith(_CONTAINER_MAGIC):
        exported = jax_export.deserialize(blob)
        return exported.call

    from flax import serialization

    payload = serialization.msgpack_restore(
        bytes(blob[len(_CONTAINER_MAGIC):]))
    exported = jax_export.deserialize(bytearray(payload["module"]))
    leaves = [jnp.asarray(payload["leaves"][str(i)])
              for i in range(len(payload["leaves"]))]

    def call(img, velocity_2d, noise):
        return exported.call(leaves, img, velocity_2d, noise)

    return call


def save_sampler(path: str, pred, **kwargs) -> None:
    """Export, then atomically replace ``path``. The export itself takes
    minutes and can fail (trace OOM, shape mismatch, interrupt); truncating
    the output first would destroy the previous good artifact and leave a
    0-byte file that load_sampler_file later fails on opaquely."""
    import os
    import tempfile

    blob = export_sampler(pred, **kwargs)
    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_sampler_file(path: str):
    with open(path, "rb") as f:
        return load_sampler(f.read())
