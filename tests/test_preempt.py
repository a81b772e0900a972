"""Graceful-preemption (SIGTERM/SIGINT) handling + VAE full-state resume.

The reference has no preemption story: a SIGTERM mid-epoch kills the torch
trainers on the spot (losing the run — its VAE trainers cannot resume at
all, reference VAE_model/train_3d_vae_only.py / train_2d_with_cross.py).
Our trainers stop within one batch, discard the partial epoch, drain the
async checkpoint writer, print the --resume hint, and return cleanly
(diffusion_model_project_tpu/utils/preempt.py) — the preemptible-TPU-VM
story. The VAE trainers additionally gain full-state resume
(params + optimizer moments + the cross-epoch accumulated-grad buffer).
"""
import json
import os
import os.path as osp
import signal

import numpy as np
import pytest

from conftest import SHARED_UNET_ARGS


def test_graceful_shutdown_flag_and_restore():
    from diffusion_model_project_tpu.utils.preempt import GracefulShutdown

    before_term = signal.getsignal(signal.SIGTERM)
    before_int = signal.getsignal(signal.SIGINT)
    with GracefulShutdown() as s:
        assert not s.requested
        signal.raise_signal(signal.SIGTERM)
        assert s.requested
        assert s() is True  # the instance is its own should_stop callable
    assert signal.getsignal(signal.SIGTERM) is before_term
    assert signal.getsignal(signal.SIGINT) is before_int


def test_nested_contexts_all_marked():
    """A signal caught by the innermost handler must stop enclosing loops
    too (optimize() trials / CV folds), not just the innermost train()."""
    from diffusion_model_project_tpu.utils.preempt import GracefulShutdown

    with GracefulShutdown() as outer:
        with GracefulShutdown() as inner:
            assert not (outer.requested or inner.requested)
            signal.raise_signal(signal.SIGINT)
            assert inner.requested
            assert outer.requested
        assert outer.requested


def test_run_epoch_raises_preempt_stop():
    """should_stop=True unwinds before the first batch ever dispatches."""
    import jax

    from diffusion_model_project_tpu.training.helper import run_epoch
    from diffusion_model_project_tpu.utils.preempt import PreemptStop

    data = {
        "microstructure": np.ones((2, 3, 1, 16, 16), np.float32),
        "velocity_input": np.zeros((2, 3, 3, 16, 16), np.float32),
        "velocity": np.zeros((2, 3, 3, 16, 16), np.float32),
    }
    with pytest.raises(PreemptStop):
        # predictor/opt_state/optimizer are never touched: the stop check
        # runs before the first step call
        run_epoch(([data], [data]), None, None, None,
                  rng=jax.random.key(0), should_stop=lambda: True)


class _SignalOnSecondPass:
    """Loader wrapper that raises a REAL SIGTERM when iterated a 2nd time
    (i.e. at the start of epoch 1), exercising the whole signal -> handler ->
    should_stop -> PreemptStop -> drain/exit chain deterministically."""

    def __init__(self, base):
        self.base = base
        self.passes = 0

    def __len__(self):
        return len(self.base)

    def __iter__(self):
        self.passes += 1
        if self.passes == 2:
            signal.raise_signal(signal.SIGTERM)
        return iter(self.base)


def test_diffusion_train_preempts_then_resumes(shared_data_dir,
                                               shared_stage1_dir,
                                               tmp_path_factory):
    from diffusion_model_project_tpu.data import get_loader
    from diffusion_model_project_tpu.training.train_diffusion import train
    from diffusion_model_project_tpu.utils.config import parser
    from diffusion_model_project_tpu.utils.preempt import GracefulShutdown

    save_dir = str(tmp_path_factory.mktemp("preempt_runs"))
    argv = [
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        *SHARED_UNET_ARGS, "--batch-size", "2",
        "--vae-path", shared_stage1_dir, "--data-parallel", "false",
    ]
    args = parser.parse_args(argv + ["--num-epochs", "3"])
    train_loader, val_loader, _ = get_loader(
        root_dir=shared_data_dir, batch_size=2, use_3d=args.use_3d)[0]

    with GracefulShutdown() as shutdown:
        train(args, _SignalOnSecondPass(train_loader), val_loader, None,
              should_stop=shutdown)

    runs = os.listdir(save_dir)
    assert len(runs) == 1
    run_dir = osp.join(save_dir, runs[0])
    log = json.load(open(osp.join(run_dir, "log.json")))
    # epoch 0 completed and was checkpointed; epoch 1 was abandoned mid-batch
    assert log["epoch"] == [0]
    assert osp.exists(osp.join(run_dir, "train_state.msgpack"))
    assert osp.exists(osp.join(run_dir, "model.msgpack"))

    # resume completes the remaining epoch with history preserved
    args2 = parser.parse_args(argv + ["--num-epochs", "2", "--resume", run_dir])
    train(args2, train_loader, val_loader, None)
    log2 = json.load(open(osp.join(run_dir, "log.json")))
    assert log2["epoch"] == [0, 1]
    np.testing.assert_allclose(log2["train_loss"][:1], log["train_loss"][:1])
    assert np.isfinite(log2["train_loss"]).all()


def test_stage1_full_state_resume(shared_data_dir, tmp_path_factory):
    """Stage-1 --resume restores params/optimizer/grad-buffer/counters and
    continues exactly where the run stopped (the reference restarts from
    scratch)."""
    from diffusion_model_project_tpu.training.train_vae_stage1 import main

    out = str(tmp_path_factory.mktemp("s1_resume"))
    base = ["--dataset-dir", shared_data_dir, "--save-dir", out,
            "--latent-channels", "4", "--batch-size", "2",
            "--grad-accum", "2", "--features", "32", "64", "64"]
    main(base + ["--num-epochs", "2"])
    assert osp.exists(osp.join(out, "train_state.msgpack"))
    log1 = json.load(open(osp.join(out, "vae_log.json")))
    assert len(log1["loss"]["recons_train"]) == 2

    main(base + ["--num-epochs", "4", "--resume"])
    log2 = json.load(open(osp.join(out, "vae_log.json")))
    assert len(log2["loss"]["recons_train"]) == 4
    np.testing.assert_allclose(log2["loss"]["recons_train"][:2],
                               log1["loss"]["recons_train"][:2])
    assert np.isfinite(log2["loss"]["recons_train"]).all()


def test_stage2_full_state_resume(shared_data_dir, shared_stage1_dir,
                                  tmp_path_factory):
    from diffusion_model_project_tpu.training.train_vae_stage2 import main

    out = str(tmp_path_factory.mktemp("s2_resume"))
    base = ["--dataset-dir", shared_data_dir,
            "--stage1-checkpoint", shared_stage1_dir, "--save-dir", out,
            "--latent-channels", "4", "--batch-size", "2", "--grad-accum", "2"]
    main(base + ["--num-epochs", "1"])
    assert osp.exists(osp.join(out, "train_state.msgpack"))
    log1 = json.load(open(osp.join(out, "vae_log.json")))
    assert len(log1["loss"]["recons_2d_train"]) == 1

    main(base + ["--num-epochs", "2", "--resume"])
    log2 = json.load(open(osp.join(out, "vae_log.json")))
    assert len(log2["loss"]["recons_2d_train"]) == 2
    np.testing.assert_allclose(log2["loss"]["recons_2d_train"][:1],
                               log1["loss"]["recons_2d_train"][:1])
