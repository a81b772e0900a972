"""TensorBoard mirror logging (utils/tb.py).

The JSON log contracts stay canonical (reference train.py:56-83); TB is an
additive mirror gated by --tensorboard. These tests drive the writer directly
and through the diffusion training CLI, reading events back with
tensorboard's EventAccumulator.
"""
import math

import pytest

from diffusion_model_project_tpu.utils.tb import TensorBoardLogger


def _read_scalars(logdir):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    acc = EventAccumulator(str(logdir))
    acc.Reload()
    out = {}
    for tag in acc.Tags()["scalars"]:
        out[tag] = [(e.step, e.value) for e in acc.Scalars(tag)]
    return out


def test_noop_without_logdir():
    tb = TensorBoardLogger(None)
    assert not tb.enabled
    tb.add_scalars(0, {"a": 1.0})  # must not raise
    tb.flush()
    tb.close()


def test_scalars_round_trip(tmp_path):
    tb = TensorBoardLogger(tmp_path / "tb")
    assert tb.enabled
    tb.add_scalars(0, {"train_loss": 1.5, "val_loss": 2.5})
    tb.add_scalars(1, {"train_loss": 1.0, "val_loss": 2.0,
                       "skipped_nan": math.nan, "skipped_inf": math.inf,
                       "skipped_ninf": -math.inf, "skipped_str": "x"})
    tb.close()

    scalars = _read_scalars(tmp_path / "tb")
    assert scalars["train_loss"] == [(0, 1.5), (1, 1.0)]
    assert scalars["val_loss"] == [(0, 2.5), (1, 2.0)]
    for skipped in ("skipped_nan", "skipped_inf", "skipped_ninf", "skipped_str"):
        assert skipped not in scalars


def test_purge_step_drops_replayed_epochs(tmp_path):
    """Resume semantics: epochs >= purge_step from the crashed run vanish,
    mirroring the JSON history truncation in train()."""
    tb = TensorBoardLogger(tmp_path / "tb")
    for epoch in range(3):
        tb.add_scalars(epoch, {"train_loss": float(10 - epoch)})
    tb.close()

    tb = TensorBoardLogger(tmp_path / "tb", purge_step=2)
    tb.add_scalars(2, {"train_loss": 7.5})
    tb.close()

    scalars = _read_scalars(tmp_path / "tb")
    by_step = {}
    for step, value in scalars["train_loss"]:
        by_step[step] = value  # later event file wins after the purge marker
    assert by_step[0] == 10.0 and by_step[1] == 9.0
    assert by_step[2] == 7.5  # the replayed epoch, not the purged 8.0


def test_train_cli_writes_tb_events(tmp_path, shared_data_dir,
                                    shared_stage1_dir, shared_stage2_dir):
    """--tensorboard true mirrors per-epoch losses into <run>/tb/."""
    import json

    from conftest import SHARED_UNET_ARGS
    import train as train_cli

    save_dir = tmp_path / "runs"
    train_cli.main([
        "--root-dir", shared_data_dir, "--save-dir", str(save_dir),
        *SHARED_UNET_ARGS, "--batch-size", "2", "--num-epochs", "2",
        "--vae-encoder-path", shared_stage2_dir,
        "--vae-decoder-path", shared_stage1_dir,
        "--data-parallel", "false",
        "--tensorboard", "true",
    ])
    run_dirs = [d for d in save_dir.iterdir() if (d / "log.json").exists()]
    assert len(run_dirs) == 1
    tb_dir = run_dirs[0] / "tb"
    assert tb_dir.is_dir()
    scalars = _read_scalars(tb_dir)
    assert [s for s, _ in scalars["train_loss"]] == [0, 1]
    assert [s for s, _ in scalars["val_loss"]] == [0, 1]
    log = json.loads((run_dirs[0] / "log.json").read_text())
    for epoch in (0, 1):
        assert scalars["train_loss"][epoch][1] == pytest.approx(
            log["train_loss"][epoch], rel=1e-5)
    # every physics-metric series present in the JSON history is mirrored
    assert any(t.startswith("physics/") for t in scalars)


def test_vae_trainers_mirror_vae_log(shared_stage1_dir, shared_stage2_dir):
    """Both VAE trainers (driven with --tensorboard by the shared fixtures)
    mirror every vae_log.json loss series into <save-dir>/tb/."""
    import json
    import os.path as osp

    for save_dir in (shared_stage1_dir, shared_stage2_dir):
        scalars = _read_scalars(osp.join(save_dir, "tb"))
        with open(osp.join(save_dir, "vae_log.json")) as f:
            log = json.load(f)
        for key, series in log["loss"].items():
            mirrored = scalars[f"loss/{key}"]
            assert [s for s, _ in mirrored] == list(range(len(series)))
            for (_, got), want in zip(mirrored, series):
                assert got == pytest.approx(want, rel=1e-5)
