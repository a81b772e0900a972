"""Train-state resume + data-parallel mesh training through the train.py CLI."""
import json
import os
import os.path as osp
import sys

import numpy as np
import pytest
import torch

REPO = osp.abspath(osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume_ds") / "data"
    x = root / "x"
    x.mkdir(parents=True)
    r = np.random.default_rng(0)
    n, s, h, w = 24, 3, 16, 16
    dom = (r.random((n, s, 1, h, w)) > 0.3).astype(np.float32)
    dom[:, :, :, 0, 0] = 0.0
    torch.save(torch.from_numpy(dom), x / "domain.pt")
    u2d = r.standard_normal((n, s, 3, h, w)).astype(np.float32)
    u2d[:, :, 2] = 0.0
    torch.save(torch.from_numpy(u2d), x / "U_2d.pt")
    torch.save(torch.from_numpy(r.standard_normal((n, s, 3, h, w)).astype(np.float32)), x / "U.pt")
    torch.save(torch.from_numpy(r.standard_normal((n, s, 1, h, w)).astype(np.float32)), x / "p.pt")
    torch.save(torch.from_numpy(np.ones((n, 3), np.float32)), x / "dxyz.pt")
    return str(root)


BASE_ARGS = [
    "--in-channels", "9", "--out-channels", "4", "--features", "8", "16",
    "--attention", "", "--num-slices", "3", "--num-timesteps", "20",
    "--padding-mode", "zeros",
]


def _vae_dirs(data_dir, tmp_path_factory):
    from diffusion_model_project_tpu.training.train_vae_stage1 import main as s1
    out = str(tmp_path_factory.mktemp("s1"))
    s1(["--dataset-dir", data_dir, "--save-dir", out, "--latent-channels", "4",
        "--batch-size", "4", "--num-epochs", "1", "--grad-accum", "2"])
    return out


@pytest.fixture(scope="module")
def stage1(data_dir, tmp_path_factory):
    from diffusion_model_project_tpu.data import get_loader
    get_loader(data_dir, batch_size=4, use_3d=True)  # writes statistics.json
    return _vae_dirs(data_dir, tmp_path_factory)


def test_mesh_parallel_training_batch8(data_dir, stage1, tmp_path_factory):
    """batch 8 on the 8-device CPU mesh: sharded steps, finite losses."""
    import jax
    assert jax.device_count() >= 8
    import train as train_cli
    save_dir = str(tmp_path_factory.mktemp("dp_runs"))
    train_cli.main([
        "--root-dir", data_dir, "--save-dir", save_dir, *BASE_ARGS,
        "--batch-size", "8", "--num-epochs", "1",
        "--vae-path", stage1, "--shuffle", "true",
    ])
    runs = os.listdir(save_dir)
    log = json.load(open(osp.join(save_dir, runs[0], "log.json")))
    assert np.isfinite(log["train_loss"]).all()


def test_resume_continues_training(data_dir, stage1, tmp_path_factory):
    import train as train_cli
    save_dir = str(tmp_path_factory.mktemp("resume_runs"))
    train_cli.main([
        "--root-dir", data_dir, "--save-dir", save_dir, *BASE_ARGS,
        "--batch-size", "4", "--num-epochs", "2", "--vae-path", stage1,
    ])
    run_dir = osp.join(save_dir, os.listdir(save_dir)[0])
    assert osp.exists(osp.join(run_dir, "train_state.msgpack"))
    log1 = json.load(open(osp.join(run_dir, "log.json")))
    assert log1["epoch"] == [0, 1]

    # resume to 4 epochs into the same dir
    train_cli.main([
        "--root-dir", data_dir, "--save-dir", save_dir, *BASE_ARGS,
        "--batch-size", "4", "--num-epochs", "4", "--vae-path", stage1,
        "--resume", run_dir,
    ])
    log2 = json.load(open(osp.join(run_dir, "log.json")))
    assert log2["epoch"] == [0, 1, 2, 3]
    # history from the first run is preserved verbatim
    np.testing.assert_allclose(log2["train_loss"][:2], log1["train_loss"][:2])
    assert np.isfinite(log2["train_loss"]).all()


def test_train_state_roundtrip_preserves_optimizer(tmp_path):
    """Optimizer moments survive the msgpack round trip."""
    import jax
    import optax
    from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor
    from diffusion_model_project_tpu.training.train_diffusion import make_optimizer
    from diffusion_model_project_tpu.utils.checkpoint import (
        load_train_state, save_train_state)

    kw = dict(in_channels=9, out_channels=4, features=(8, 16), kernel_size=3,
              padding_mode="zeros", activation="silu", final_activation=None,
              attention="", dropout=0.0, time_embedding_dim=16)
    pred = LatentDiffusionPredictor.create(
        dict(kw), rng=jax.random.key(0), num_slices=3, num_timesteps=20,
        image_hw=(32, 32))
    opt = make_optimizer(1e-3, 0.01)
    opt_state = opt.init(pred.unet_params)
    # take one update so moments are non-trivial
    g = jax.tree_util.tree_map(lambda x: x * 0 + 0.1, pred.unet_params)
    _, opt_state = opt.update(g, opt_state, pred.unet_params)

    path = str(tmp_path / "train_state.msgpack")
    save_train_state(path, pred, opt_state, epoch=5, best_loss=0.123)
    pred2, opt_state2, next_epoch, best = load_train_state(path, pred, opt_state)
    assert next_epoch == 6 and abs(best - 0.123) < 1e-9
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.tree_util.tree_leaves(opt_state), jax.tree_util.tree_leaves(opt_state2))
