"""Asynchronous, atomic checkpoint writing.

The reference saves with a blocking ``torch.save`` every epoch (reference
Diffusion_model/train.py, VAE trainers). On TPU the equivalent sync write is
worse than it looks: ``np.asarray(params)`` blocks the host on ALL in-flight
device work before the bytes even start moving, so the epoch pipeline drains
once per epoch. This writer moves the device→host fetch, serialization, and
disk write onto one background thread — the training loop keeps dispatching
the next epoch while the previous epoch's weights (an immutable snapshot: jax
arrays are functional, so the submitted pytree can't be mutated under the
writer) stream out.

Writes are atomic (tmp file + ``os.replace``): a run killed mid-write never
leaves a truncated checkpoint behind — the previous complete one survives.
Per-path ordering is FIFO; ``join()`` drains the queue and re-raises the
first writer error (also re-raised by the next ``submit`` so failures are
not silently dropped mid-run).
"""
from __future__ import annotations

import atexit
import os
import queue
import threading
from typing import Any, Callable, Optional

import jax
import numpy as np


def _default_serialize(tree: Any) -> bytes:
    from flax import serialization

    return serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, tree))


# one jitted list-copy, built lazily; jax's jit cache handles the distinct
# (len, shapes) signatures (one per checkpoint structure per run)
_copy_arrays = None


def device_snapshot(tree: Any) -> Any:
    """On-device copy of every jax.Array leaf (non-array leaves pass through).

    Needed when the training step DONATES its params/optimizer buffers
    (jit donate_argnums): a tree queued on the async writer is fetched on the
    writer thread while the main loop is already dispatching the next donated
    step, which deletes the original buffers — the fetch would race it and
    die with "Array has been deleted". Copying on device first is one cheap
    dispatch (HBM-bandwidth memcpy) and the copies are never donated.
    """
    global _copy_arrays
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    idx = [i for i, x in enumerate(leaves) if isinstance(x, jax.Array)]
    if not idx:
        return tree
    if _copy_arrays is None:
        import jax.numpy as jnp

        _copy_arrays = jax.jit(lambda xs: [jnp.copy(x) for x in xs])
    copies = _copy_arrays([leaves[i] for i in idx])
    for i, c in zip(idx, copies):
        leaves[i] = c
    return jax.tree_util.tree_unflatten(treedef, leaves)


class AsyncCheckpointWriter:
    """One background thread writing pytrees to disk atomically, in order.

    The queue is BOUNDED (default 1 pending + 1 in flight): a queued snapshot
    keeps that epoch's device arrays alive, so an unbounded queue lets a slow
    writer pin several epochs of params/optimizer state in HBM — measured
    OOMing full-scale diffusion training by epoch 4 on a 15.75 GB chip. When
    the writer falls behind, ``submit`` blocks instead (graceful degradation
    toward the reference's synchronous save, with memory bounded at ~2
    snapshots).
    """

    def __init__(self, serialize: Callable[[Any], bytes] = _default_serialize,
                 max_pending: int = 1):
        self._serialize = serialize
        self._q: "queue.Queue[Optional[tuple]]" = queue.Queue(
            maxsize=max(1, max_pending))
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._run, name="ckpt-writer", daemon=True)
        self._thread.start()
        # if the owner exits without close() (e.g. a pruned trial unwinds the
        # training loop by exception), still drain queued writes at exit
        self._atexit = atexit.register(self._q.join)

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                # acknowledge the shutdown sentinel too: an unbalanced get()
                # leaves unfinished_tasks >= 1 forever and any later q.join()
                # (second close(), join()-in-finally, the atexit drain after
                # an explicit close) deadlocks
                self._q.task_done()
                return
            path, tree, serialize = item
            try:
                data = (serialize or self._serialize)(tree)
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, path)
            except BaseException as e:  # surfaced on join()/next submit()
                if self._error is None:
                    self._error = e
            finally:
                self._q.task_done()

    def _raise_pending(self) -> None:
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError(
                f"async checkpoint write failed: {err!r}") from err

    def submit(self, path: str, tree: Any,
               serialize: Optional[Callable[[Any], bytes]] = None) -> None:
        """Queue ``tree`` for an atomic write to ``path``.

        FIFO ordering is part of the contract: submitting the weights and
        THEN the log file reproduces the reference's crash semantics (a kill
        mid-epoch can leave the log one epoch behind the weights, never
        ahead). ``serialize`` overrides the writer default per item (e.g.
        JSON for log files). Blocks when ``max_pending`` items are queued.
        """
        self._raise_pending()
        if not self._thread.is_alive():
            raise RuntimeError("AsyncCheckpointWriter already closed")
        self._q.put((path, tree, serialize))

    def join(self) -> None:
        """Block until every queued write has landed; re-raise any failure."""
        self._q.join()
        self._raise_pending()

    def close(self) -> None:
        """Drain, stop the thread, re-raise any failure. Idempotent: a second
        close() (e.g. explicit close followed by a finally-block close) must
        not enqueue a sentinel no thread will ever acknowledge."""
        if not self._thread.is_alive():
            self._raise_pending()
            return
        self._q.join()
        self._q.put(None)
        self._thread.join()
        atexit.unregister(self._atexit)
        self._raise_pending()

    def __enter__(self) -> "AsyncCheckpointWriter":
        return self

    def __exit__(self, *exc) -> None:
        # on an exception unwind, still drain (checkpoints already queued are
        # valid work) but don't mask the original exception with a write error
        if exc and exc[0] is not None:
            try:
                self.close()
            except RuntimeError:
                pass
        else:
            self.close()
