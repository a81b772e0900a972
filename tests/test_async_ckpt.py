"""AsyncCheckpointWriter (utils/async_ckpt.py): ordering, atomicity, errors."""
import os

import jax.numpy as jnp
import numpy as np
import pytest
from flax import serialization

from diffusion_model_project_tpu.utils.async_ckpt import AsyncCheckpointWriter


def test_writes_land_and_round_trip(tmp_path):
    path = str(tmp_path / "ckpt.msgpack")
    tree = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    with AsyncCheckpointWriter() as w:
        w.submit(path, tree)
    got = serialization.msgpack_restore(open(path, "rb").read())
    np.testing.assert_array_equal(got["w"], np.asarray(tree["w"]))
    np.testing.assert_array_equal(got["b"], np.asarray(tree["b"]))
    # no tmp litter
    assert [f for f in os.listdir(tmp_path)] == ["ckpt.msgpack"]


def test_last_write_wins_per_path(tmp_path):
    path = str(tmp_path / "ckpt.msgpack")
    w = AsyncCheckpointWriter()
    for i in range(5):
        w.submit(path, {"step": jnp.asarray(i)})
    w.close()
    got = serialization.msgpack_restore(open(path, "rb").read())
    assert int(got["step"]) == 4


def test_fifo_weights_before_log(tmp_path):
    """The trainers rely on FIFO ordering for crash semantics: the log is
    queued after the weights, so when the log lands the weights must already
    be on disk (log can lag the weights, never lead them)."""
    import time

    weights = str(tmp_path / "weights.msgpack")
    log = str(tmp_path / "log.json")
    w = AsyncCheckpointWriter()

    def slow_weights(tree):
        time.sleep(0.2)
        return serialization.msgpack_serialize(tree)

    seen = {}

    def log_serialize(payload):
        seen["weights_present"] = os.path.exists(weights)
        return payload

    w.submit(weights, {"a": np.zeros(4, np.float32)}, serialize=slow_weights)
    w.submit(log, b'{"epoch": 0}', serialize=log_serialize)
    w.close()
    assert seen["weights_present"] is True
    assert os.path.exists(log)


def test_error_surfaces_on_close(tmp_path):
    w = AsyncCheckpointWriter()
    w.submit(str(tmp_path / "no" / "such" / "dir" / "x.msgpack"),
             {"a": jnp.zeros(1)})
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        w.close()


def test_error_does_not_block_future_writers(tmp_path):
    w = AsyncCheckpointWriter()
    w.submit(str(tmp_path / "missing" / "x.msgpack"), {"a": jnp.zeros(1)})
    with pytest.raises(RuntimeError):
        w.join()
    # writer still functional after the error was consumed
    ok = str(tmp_path / "ok.msgpack")
    w.submit(ok, {"a": jnp.ones(2)})
    w.close()
    assert os.path.exists(ok)


def test_device_snapshot_survives_donation(tmp_path):
    """The donated-training contract (training/helper.py): a checkpoint tree
    queued on the writer is an on-device COPY, so donating the originals into
    the next step cannot invalidate the writer's fetch."""
    import jax

    from diffusion_model_project_tpu.utils.async_ckpt import device_snapshot

    tree = {"w": jnp.arange(8.0), "b": jnp.ones((3,)),
            "epoch": np.int64(4), "note": "not-an-array"}
    snap = device_snapshot(tree)
    # non-array leaves pass through untouched (serialization format depends
    # on np.int64 staying a scalar, not becoming a 0-d array)
    assert snap["epoch"] is tree["epoch"] and snap["note"] is tree["note"]
    assert snap["w"] is not tree["w"]

    # donate the ORIGINALS into a jitted update; the snapshot must survive
    step = jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x * 2, t),
                   donate_argnums=0)
    new = step({"w": tree["w"], "b": tree["b"]})
    np.testing.assert_array_equal(np.asarray(snap["w"]), np.arange(8.0))
    np.testing.assert_array_equal(np.asarray(new["w"]), 2 * np.arange(8.0))
    if tree["w"].is_deleted():  # donation honored on this backend
        with pytest.raises(RuntimeError):
            np.asarray(tree["w"])

    # and the writer round-trips the snapshot (sans the str leaf, which real
    # checkpoint trees never contain and msgpack does not serialize)
    w = AsyncCheckpointWriter()
    path = str(tmp_path / "snap.msgpack")
    w.submit(path, {k: v for k, v in snap.items() if k != "note"})
    w.close()
    got = serialization.msgpack_restore(open(path, "rb").read())
    np.testing.assert_array_equal(got["w"], np.arange(8.0))
    assert got["epoch"] == 4


def test_close_is_idempotent_and_join_after_close(tmp_path):
    """The shutdown sentinel must be task_done()'d: before the fix, a second
    close() or a join()-after-close() (natural finally-block patterns)
    deadlocked forever on queue.unfinished_tasks >= 1."""
    import threading

    w = AsyncCheckpointWriter()
    w.submit(str(tmp_path / "a.msgpack"), {"x": np.arange(4.0)})
    done = threading.Event()

    def hammer():
        w.close()
        w.join()   # join after close: sentinel must have been acknowledged
        w.close()  # second close: no stranded sentinel, no dead-thread put
        done.set()

    t = threading.Thread(target=hammer, daemon=True)
    t.start()
    assert done.wait(timeout=30), "close/join-after-close deadlocked"
    assert (tmp_path / "a.msgpack").exists()
