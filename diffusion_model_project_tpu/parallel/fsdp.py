"""Fully-sharded data parallelism (ZeRO-3 semantics, the GSPMD way).

The reference's only parallelism is replicated-weights DataParallel
(train_3d_vae_only.py:310-312). Plain data parallelism keeps a full copy of
params + Adam moments on every chip; FSDP shards those over the SAME ``data``
mesh axis the batch is sharded on, so per-chip optimizer/parameter memory
drops by the mesh size while the math stays identical:

  - each >=2-D parameter leaf is sharded along its largest ``n``-divisible
    dimension (preferring the output-channel dim) over ``data``; 1-D leaves
    (biases, GroupNorm scale/shift) stay replicated — they are O(channels).
  - nothing else changes: inside the jitted step XLA's SPMD partitioner
    all-gathers each layer's weights just in time for its conv/matmul and
    reduce-scatters the gradients back to the shard owners — the classic
    ZeRO-3 schedule, derived from sharding ANNOTATIONS alone rather than a
    hand-written wrapper (torch FSDP) or NCCL bucketing code.
  - Adam moments / EMA inherit the param shardings for free because
    ``optimizer.init`` is elementwise over already-sharded params.

Mutually exclusive with tensor parallelism (``parallel/tp.py``; train()
raises on ``--fsdp`` + ``--model-parallel``): tp shards channels for
compute, fsdp shards storage — composing them would need merged per-leaf
specs (one dim per axis), which nothing here implements.

Correctness is locked by tests/test_training_parallel.py (fsdp == replicated
single-device trajectories) and the per-leaf memory reduction is asserted on
the virtual 8-device mesh.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(leaf, n: int, axis: str) -> P:
    shape = getattr(leaf, "shape", ())
    if len(shape) < 2:
        return P()  # biases / norm params: replicated (see module docstring)
    # largest n-divisible dim, output-channel (last) dim winning ties: conv
    # kernels are (*spatial, in, out) and dense are (in, out), so the last
    # dim is the one a just-in-time all-gather streams most efficiently
    best, best_size = None, 0
    for d in range(len(shape) - 1, -1, -1):
        if shape[d] % n == 0 and shape[d] > best_size:
            best, best_size = d, shape[d]
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_param_specs(params: Any, n: int, axis: str = "data") -> Any:
    """PartitionSpec pytree sharding each leaf's largest divisible dim."""
    return jtu.tree_map(lambda leaf: _leaf_spec(leaf, n, axis), params)


def shard_params_fsdp(params: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a param tree fully-sharded over ``mesh[axis]``."""
    n = mesh.shape[axis]
    specs = fsdp_param_specs(params, n, axis)
    return jtu.tree_map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
        params, specs)


def shard_predictor_fsdp(pred, mesh: Mesh, axis: str = "data"):
    """Predictor with UNet+VAE params fully sharded over ``mesh[axis]``;
    every other leaf (scheduler tables, normalizer) replicated
    (parallel.mesh.shard_predictor_params)."""
    from .mesh import shard_predictor_params

    return shard_predictor_params(pred, mesh, shard_params_fsdp, axis)
