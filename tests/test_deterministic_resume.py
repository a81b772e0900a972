"""Deterministic resume: resume(k) replays the uninterrupted run bitwise.

Three stream sources must be pure functions of (seed, epoch) for this to
hold: the jax noise chain (fold_in per epoch), the loader's shuffle order,
and the per-sample augmentation draws (set_epoch, mirroring
torch.utils.data.DistributedSampler.set_epoch). The reference can't make
this guarantee at all — its resume restarts the optimizer AND the data
order (SURVEY.md §5: 'resume means reload weights, restart optimizer').
"""
import json
import os
import os.path as osp

import numpy as np

from conftest import SHARED_UNET_ARGS


def _mk_loader(ds, **kw):
    from diffusion_model_project_tpu.data.dataset import NumpyLoader

    return NumpyLoader(ds, **kw)


def test_loader_epoch_order_is_pure(shared_data_dir):
    """Two loader instances agree per epoch once set_epoch is used; orders
    still differ across epochs."""
    from diffusion_model_project_tpu.data.dataset import MicroFlowDataset

    ds = MicroFlowDataset(shared_data_dir, use_3d=True)

    def orders(loader, epochs):
        out = []
        for e in epochs:
            loader.set_epoch(e)
            out.append([b["dxyz"].sum() for b in loader])
        return out

    a = orders(_mk_loader(ds, batch_size=2, shuffle=True, seed=7), [0, 1, 0])
    b = orders(_mk_loader(ds, batch_size=2, shuffle=True, seed=7), [0, 1, 0])
    assert a == b
    assert a[0] == a[2]  # same epoch -> same order, regardless of history


def test_augmentation_is_pure_per_epoch(shared_data_dir):
    """With set_epoch, the flip draws for (epoch, idx) are reproducible and
    do not depend on access order; different epochs draw differently."""
    from diffusion_model_project_tpu.data.dataset import MicroFlowDataset

    ds = MicroFlowDataset(shared_data_dir, use_3d=True, augment=True, seed=3)
    ds.set_epoch(5)
    first = [ds[i]["velocity"].copy() for i in range(8)]
    # different access order, same epoch
    again = {i: ds[i]["velocity"] for i in reversed(range(8))}
    for i in range(8):
        np.testing.assert_array_equal(first[i], again[i])
    ds.set_epoch(6)
    changed = any(
        not np.array_equal(first[i], ds[i]["velocity"]) for i in range(8))
    assert changed, "epoch must influence the augmentation stream"


def test_diffusion_resume_bitwise_equals_uninterrupted(
        shared_data_dir, shared_stage1_dir, tmp_path_factory):
    from diffusion_model_project_tpu.data import get_loader
    from diffusion_model_project_tpu.training.train_diffusion import train
    from diffusion_model_project_tpu.utils.config import parser

    train_loader, val_loader, _ = get_loader(
        root_dir=shared_data_dir, batch_size=2, shuffle=True, augment=True,
        use_3d=True)[0]

    def args_for(save_dir, n, extra=()):
        return parser.parse_args([
            "--root-dir", shared_data_dir, "--save-dir", save_dir,
            *SHARED_UNET_ARGS, "--batch-size", "2", "--num-epochs", str(n),
            "--vae-path", shared_stage1_dir, "--data-parallel", "false",
            "--shuffle", "true", *extra])

    # run A: 2 epochs uninterrupted
    dir_a = str(tmp_path_factory.mktemp("det_a"))
    train(args_for(dir_a, 2), train_loader, val_loader, None)
    log_a = json.load(open(osp.join(dir_a, os.listdir(dir_a)[0], "log.json")))

    # run B: 1 epoch, then resume to 2
    dir_b = str(tmp_path_factory.mktemp("det_b"))
    train(args_for(dir_b, 1), train_loader, val_loader, None)
    run_b = osp.join(dir_b, os.listdir(dir_b)[0])
    train(args_for(dir_b, 2, extra=("--resume", run_b)),
          train_loader, val_loader, None)
    log_b = json.load(open(osp.join(run_b, "log.json")))

    assert log_a["epoch"] == log_b["epoch"] == [0, 1]
    np.testing.assert_array_equal(log_a["train_loss"], log_b["train_loss"])
    np.testing.assert_array_equal(log_a["val_loss"], log_b["val_loss"])


def test_stage1_resume_bitwise_equals_uninterrupted(shared_data_dir,
                                                    tmp_path_factory):
    from diffusion_model_project_tpu.training.train_vae_stage1 import main

    def base(out):
        return ["--dataset-dir", shared_data_dir, "--save-dir", out,
                "--latent-channels", "4", "--batch-size", "2",
                "--grad-accum", "2", "--features", "32", "64", "64",
                "--augment"]

    dir_a = str(tmp_path_factory.mktemp("s1_det_a"))
    main(base(dir_a) + ["--num-epochs", "2"])
    log_a = json.load(open(osp.join(dir_a, "vae_log.json")))

    dir_b = str(tmp_path_factory.mktemp("s1_det_b"))
    main(base(dir_b) + ["--num-epochs", "1"])
    main(base(dir_b) + ["--num-epochs", "2", "--resume"])
    log_b = json.load(open(osp.join(dir_b, "vae_log.json")))

    for key in ("recons_train", "kl_train", "recons_val", "kl_val"):
        np.testing.assert_array_equal(log_a["loss"][key], log_b["loss"][key],
                                      err_msg=key)
