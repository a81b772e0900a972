"""Multi-host (multi-process) initialization and batch placement.

The reference is strictly single-process (its only parallelism is
torch.nn.DataParallel over one host's GPUs). The TPU-native multi-host path
is ``jax.distributed``: every host runs the same program, the coordinator
wires them into ONE global device set, and the existing data-parallel mesh
(parallel/mesh.py) simply spans all global devices — the training step does
not change; XLA's psum rides ICI within a slice and DCN across hosts.

Verified without real multi-host hardware by launching N local processes of
2 virtual CPU devices each against a localhost coordinator
(tests/test_distributed.py) — the same code path a real v5e pod slice runs.

Batch placement — two supported layouts, one per loader discipline:

  - ``global_batch_from_local``: each process loads only ITS rows of the
    global batch; the global jax.Array is assembled from per-process shards
    via ``jax.make_array_from_process_local_data``.
  - ``global_batch_from_replicated``: every process loads the IDENTICAL full
    global batch (what the production trainers do — their loaders are
    (seed, epoch)-pure, so every host computes the same batch) and each
    addressable device picks its own rows. ``parallel.mesh.maybe_shard_batch``
    dispatches here automatically when ``jax.process_count() > 1``, so the
    single-host trainer path is multi-host correct without loader changes.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or environment; no-op when
    single-process.

    Env fallbacks: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID (mirroring jax.distributed.initialize's own knobs).
    Returns True iff a multi-process runtime was initialized.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if coordinator and num_processes <= 1:
        # a coordinator address IS multi-process intent; silently degrading
        # to independent single-host training would waste the whole launch
        raise ValueError(
            f"--coordinator {coordinator!r} given but num_processes="
            f"{num_processes}; pass --num-processes/--process-id (or "
            f"JAX_NUM_PROCESSES/JAX_PROCESS_ID) on every host.")
    if num_processes > 1 and not coordinator:
        # the mirror case: every host would silently run an INDEPENDENT
        # single-process training, duplicating all work and racing each
        # other's run-dir writes on a shared filesystem
        raise ValueError(
            f"num_processes={num_processes} given but no coordinator "
            f"address; pass --coordinator host:port (or "
            f"JAX_COORDINATOR_ADDRESS) on every host.")
    if num_processes > 1 and process_id is None and env_pid is None:
        # defaulting every host to process_id=0 hangs or dies deep inside
        # the coordination service as a duplicate task 0 — fail fast with
        # the same actionable message as the other guards
        raise ValueError(
            f"num_processes={num_processes} given but no process id; pass "
            f"a distinct --process-id (or JAX_PROCESS_ID) on every host.")
    if (process_id is not None or env_pid is not None) and num_processes <= 1:
        # the last hole in the fail-fast matrix: a process id ALONE (arg or a
        # launcher that exports JAX_PROCESS_ID but drops ADDRESS/NUM) would
        # silently run a full independent single-host training, duplicating
        # all work and racing the other hosts' run-dir writes
        pid = process_id if process_id is not None else env_pid
        raise ValueError(
            f"process_id={pid} given but num_processes={num_processes} and "
            f"no coordinator; pass --coordinator host:port and "
            f"--num-processes (or JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES) "
            f"on every host.")
    if process_id is None:
        process_id = int(env_pid or "0")
    if not coordinator:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_local_slice(global_batch_size: int) -> slice:
    """This process's contiguous row range of the global batch.

    Requires the global batch to divide evenly across processes — an uneven
    split would die later as an opaque shape error inside
    ``jax.make_array_from_process_local_data``; fail fast here instead.
    """
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} must be divisible by the "
            f"process count {n} (pad or drop the remainder batch).")
    per = global_batch_size // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_batch_from_local(local_batch: Any, mesh: Mesh,
                            global_batch_size: int, axis: str = "data"):
    """Assemble a batch-sharded global jax.Array pytree from THIS process's
    local rows (placed on this process's addressable mesh devices).

    Accepts any pytree of arrays (not just flat dicts): every leaf's leading
    dim is this process's row count; the assembled leaves have leading dim
    ``global_batch_size``.
    """
    def _one(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        global_shape = (global_batch_size,) + tuple(x.shape[1:])
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(_one, local_batch)


def global_batch_from_replicated(batch: Any, mesh: Mesh, axis: str = "data"):
    """Assemble batch-sharded global jax.Arrays when EVERY process holds the
    identical full global batch.

    This is the production trainer contract: the loaders are (seed, epoch)-
    pure (data/dataset.py set_epoch + fold_in streams,
    tests/test_deterministic_resume.py), so each host
    recomputes the same global batch and each addressable device picks out
    its own rows here — no cross-host data exchange, no assumption jax has
    to take on faith. Works for ANY mesh layout (``axis`` may be a sub-axis
    of a data x model mesh) because row selection goes through the sharding's
    own index map rather than a contiguous per-process slice.
    """
    def _one(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            np.shape(x), sharding, lambda idx, x=x: x[idx])

    return jax.tree_util.tree_map(_one, batch)
