"""Tensor parallelism: channel-sharded parameters over a ``model`` mesh axis.

The reference has no model parallelism at all (its only parallel mode is
torch.nn.DataParallel, train_3d_vae_only.py:310-312); at the published scale
every model fits one chip. This module is the TPU-native scaling path BEYOND
the reference: shard the conv/dense weights themselves over a ``model`` mesh
axis so configs larger than one chip's HBM (wider UNets, deeper VAEs, bigger
volumes) still train — the standard Megatron pattern expressed the JAX way:

  - we only ANNOTATE parameter shardings (``jax.sharding.NamedSharding``);
    XLA's SPMD partitioner propagates them through the jitted step and inserts
    the collectives (all-gather / psum over ICI) where the math needs them.
    No model code changes; the same flax modules run 1-chip or N-chip.
  - conv weights alternate column-parallel (output channels sharded — the
    first conv of every residual/double block) and row-parallel (input
    channels sharded, partial sums psum'd — the second conv), so activations
    stay channel-sharded across the block interior instead of being
    re-gathered after every layer.
  - 1-D leaves (biases, GroupNorm scale/shift) stay replicated: they are
    O(channels) bytes, and replicating them lets GSPMD fuse their adds into
    whichever sharding the adjacent conv produced.

Param layouts this maps (see models/layers.py): conv kernels
``(*spatial, in, out)``, ConvTranspose2x2 kernels ``(in, out, 2, 2)`` (torch
layout kept for checkpoint parity), dense ``(in, out)``.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# second-conv names: their INPUT channels are the block-interior axis that the
# preceding column-parallel conv left sharded -> row-parallel (psum output)
_ROW_PARALLEL_NAMES = ("block2", "conv2")


def _path_names(path) -> tuple:
    return tuple(
        k.key if isinstance(k, jtu.DictKey) else getattr(k, "name", str(k))
        for k in path
    )


def _leaf_spec(path, leaf, tp_size: int, axis: str) -> P:
    names = _path_names(path)
    shape = leaf.shape
    if len(shape) < 2:
        return P()  # biases / norm params: replicated (see module docstring)
    none = (None,) * (len(shape) - 2)
    is_convt = (names and names[-1] == "weight" and len(shape) == 4
                and shape[2:] == (2, 2)
                # only the UNet Up blocks own ConvTranspose2x2 (param path
                # ['*_up']['conv']['weight']); shape alone would misread a
                # regular 2-in/2-out conv kernel as (in, out, kh, kw)
                and any(str(n).endswith("_up") for n in names))
    if is_convt:
        # torch layout (in, out, kh, kw): column-parallel on dim 1
        if shape[1] % tp_size == 0:
            return P(None, axis, None, None)
        return P()
    row = any(n in _ROW_PARALLEL_NAMES for n in names)
    if row and shape[-2] % tp_size == 0:
        return P(*none, axis, None)
    if shape[-1] % tp_size == 0:
        return P(*none, None, axis)
    if shape[-2] % tp_size == 0:  # odd out-width (e.g. 3-ch heads): try row
        return P(*none, axis, None)
    return P()


def tp_param_specs(params: Any, tp_size: int, axis: str = "model") -> Any:
    """PartitionSpec pytree for a param tree (UNet or VAE layout).

    Any spec choice is numerically exact under SPMD — the partitioner inserts
    whatever collectives the chosen shardings require — so the rules here are
    a perf/memory policy, not a correctness contract
    (tests/test_training_parallel.py locks tp-vs-replicated equivalence).
    """
    return jtu.tree_map_with_path(
        lambda path, leaf: _leaf_spec(path, leaf, tp_size, axis), params)


def shard_params_tp(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Place a param tree with tensor-parallel shardings over ``mesh[axis]``."""
    tp_size = mesh.shape[axis]
    specs = tp_param_specs(params, tp_size, axis)
    return jtu.tree_map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
        params, specs)


def shard_predictor_tp(pred, mesh: Mesh, axis: str = "model"):
    """Predictor with UNet+VAE params tensor-parallel over ``mesh[axis]``;
    every other leaf (scheduler tables, normalizer) replicated
    (parallel.mesh.shard_predictor_params)."""
    from .mesh import shard_predictor_params

    return shard_predictor_params(pred, mesh, shard_params_tp, axis)
