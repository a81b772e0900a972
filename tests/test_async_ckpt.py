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
