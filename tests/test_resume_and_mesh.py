"""Train-state resume + data-parallel mesh training through the train.py CLI.

Uses the session-scoped shared dataset/stage-1 fixtures from conftest.py (the
same shapes and UNet config as test_cli_workflow, so the process-wide jit
cache absorbs the step compiles once)."""
import json
import os
import os.path as osp
import sys

import numpy as np

from conftest import SHARED_UNET_ARGS

REPO = osp.abspath(osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def test_mesh_parallel_training_batch8(shared_data_dir, shared_stage1_dir,
                                       tmp_path_factory):
    """batch 8 on the 8-device CPU mesh: sharded steps, finite losses; then
    RESUME under the same mesh (host-restored predictor/opt_state must land
    back on mesh-sharded steps without error)."""
    import jax
    assert jax.device_count() >= 8
    import train as train_cli
    save_dir = str(tmp_path_factory.mktemp("dp_runs"))
    train_cli.main([
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        *SHARED_UNET_ARGS, "--batch-size", "8", "--num-epochs", "1",
        "--vae-path", shared_stage1_dir, "--shuffle", "true",
    ])
    runs = os.listdir(save_dir)
    run_dir = osp.join(save_dir, runs[0])
    log = json.load(open(osp.join(run_dir, "log.json")))
    assert np.isfinite(log["train_loss"]).all()

    train_cli.main([
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        *SHARED_UNET_ARGS, "--batch-size", "8", "--num-epochs", "2",
        "--vae-path", shared_stage1_dir, "--shuffle", "true",
        "--resume", run_dir,
    ])
    log2 = json.load(open(osp.join(run_dir, "log.json")))
    assert log2["epoch"] == [0, 1]
    np.testing.assert_allclose(log2["train_loss"][:1], log["train_loss"][:1])
    assert np.isfinite(log2["train_loss"]).all()


def test_model_parallel_cli_training(shared_data_dir, shared_stage1_dir,
                                     tmp_path_factory):
    """--model-parallel 2 on the 8-device mesh: data(4) x model(2) with
    tensor-parallel weights, through the real CLI."""
    import jax
    assert jax.device_count() >= 8
    import train as train_cli
    save_dir = str(tmp_path_factory.mktemp("mp_runs"))
    train_cli.main([
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        *SHARED_UNET_ARGS, "--batch-size", "4", "--num-epochs", "1",
        "--vae-path", shared_stage1_dir, "--shuffle", "true",
        "--model-parallel", "2",
    ])
    runs = os.listdir(save_dir)
    log = json.load(open(osp.join(save_dir, runs[0], "log.json")))
    assert np.isfinite(log["train_loss"]).all()
    assert np.isfinite(log["val_loss"]).all()


def test_cv_mode_trains_each_fold(shared_data_dir, shared_stage1_dir,
                                  shared_stage2_dir, tmp_path_factory):
    """--mode CV runs one training per fold with kfold-i.k run names
    (reference train.py modes train/CV/optimize; CV at train.py:361-374)."""
    import train as train_cli
    save_dir = str(tmp_path_factory.mktemp("cv_runs"))
    train_cli.main([
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        *SHARED_UNET_ARGS, "--batch-size", "2", "--num-epochs", "1",
        "--mode", "CV", "--k-folds", "2",
        "--vae-encoder-path", shared_stage2_dir,
        "--vae-decoder-path", shared_stage1_dir,
        "--data-parallel", "false",
    ])
    runs = sorted(os.listdir(save_dir))
    assert len(runs) == 2, runs
    for i, run in enumerate(runs):
        assert f"kfold-{i + 1}.2" in run, run
        log = json.load(open(osp.join(save_dir, run, "log.json")))
        assert len(log["train_loss"]) == 1
        assert np.isfinite(log["train_loss"][0])
        assert osp.exists(osp.join(save_dir, run, "model.msgpack"))


def test_optimize_mode_cli_end_to_end(shared_data_dir, shared_stage1_dir,
                                      shared_stage2_dir, tmp_path_factory):
    """`train.py --mode optimize` with REAL tiny trainings (the function-level
    pruning/resume tests mock train()): two TPE trials run end-to-end, each
    leaves a run dir, study.json records state/params/intermediates within
    the declared ranges (reference train.py:376-407)."""
    import train as train_cli
    save_dir = str(tmp_path_factory.mktemp("optimize_runs"))
    train_cli.main([
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        *SHARED_UNET_ARGS, "--num-epochs", "1",
        "--mode", "optimize", "--n-trials", "2",
        # ranges pinned to the shared-fixture architecture so the process-
        # wide jit cache absorbs the compiles (levels 2 @ top 8 -> [8, 16])
        "--range-batch-size", "2", "2", "--range-kernel-size", "3", "3",
        "--range-level", "2", "2", "--range-learning-rate", "1e-4", "1e-3",
        "--top-feature-channels", "8",
        "--vae-encoder-path", shared_stage2_dir,
        "--vae-decoder-path", shared_stage1_dir,
        "--data-parallel", "false",
    ])
    with open(osp.join(save_dir, "study.json")) as f:
        study = json.load(f)
    assert [t["state"] for t in study] == ["COMPLETE", "COMPLETE"]
    for t in study:
        p = t["params"]
        assert p["batch_size"] == 2 and p["kernel_size"] == 3
        assert p["levels"] == 2
        assert 1e-4 <= p["learning_rate"] <= 1e-3
        assert np.isfinite(t["value"])
        assert t["intermediates"], "pruner intermediates must persist"
    # every completed trial trained for real: a run dir with weights + log
    runs = [d for d in os.listdir(save_dir)
            if osp.isdir(osp.join(save_dir, d))]
    assert len(runs) == 2, runs
    for run in runs:
        assert osp.exists(osp.join(save_dir, run, "model.msgpack"))


def test_cv_mode_is_crash_safe(shared_data_dir, shared_stage1_dir,
                               shared_stage2_dir, tmp_path_factory, capsys):
    """Re-running a CV study skips complete folds and resumes incomplete
    ones full-state (mirrors grid search's results.csv resume) instead of
    retraining from fold 1."""
    import train as train_cli
    save_dir = str(tmp_path_factory.mktemp("cv_resume_runs"))
    base = [
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        *SHARED_UNET_ARGS, "--batch-size", "2",
        "--mode", "CV", "--k-folds", "2",
        "--vae-encoder-path", shared_stage2_dir,
        "--vae-decoder-path", shared_stage1_dir,
        "--data-parallel", "false",
    ]
    train_cli.main(base + ["--num-epochs", "1"])
    runs = sorted(os.listdir(save_dir))
    assert len(runs) == 2
    logs1 = [json.load(open(osp.join(save_dir, r, "log.json"))) for r in runs]
    capsys.readouterr()

    # identical re-run: both folds skip, nothing retrains, no new dirs
    train_cli.main(base + ["--num-epochs", "1"])
    assert capsys.readouterr().out.count("already complete") == 2
    assert sorted(os.listdir(save_dir)) == runs
    logs2 = [json.load(open(osp.join(save_dir, r, "log.json"))) for r in runs]
    for a, b in zip(logs1, logs2):
        assert a["train_loss"] == b["train_loss"]

    # a longer study resumes each fold from train_state.msgpack in place
    train_cli.main(base + ["--num-epochs", "2"])
    assert capsys.readouterr().out.count("resuming from") == 2
    assert sorted(os.listdir(save_dir)) == runs  # resumed in place, no new dirs
    for r, old in zip(runs, logs1):
        log = json.load(open(osp.join(save_dir, r, "log.json")))
        assert log["epoch"] == [0, 1]
        np.testing.assert_allclose(log["train_loss"][:1], old["train_loss"][:1])


def test_resume_continues_training(shared_data_dir, shared_stage1_dir,
                                   tmp_path_factory):
    import train as train_cli
    save_dir = str(tmp_path_factory.mktemp("resume_runs"))
    train_cli.main([
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        *SHARED_UNET_ARGS, "--batch-size", "2", "--num-epochs", "2",
        "--vae-path", shared_stage1_dir, "--data-parallel", "false",
    ])
    run_dir = osp.join(save_dir, os.listdir(save_dir)[0])
    assert osp.exists(osp.join(run_dir, "train_state.msgpack"))
    log1 = json.load(open(osp.join(run_dir, "log.json")))
    assert log1["epoch"] == [0, 1]

    # resume to 4 epochs into the same dir
    train_cli.main([
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        *SHARED_UNET_ARGS, "--batch-size", "2", "--num-epochs", "4",
        "--vae-path", shared_stage1_dir, "--resume", run_dir,
        "--data-parallel", "false",
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
        image_hw=(32, 32), vae_features=(32, 32, 32))
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


def test_fsdp_cli_training(shared_data_dir, shared_stage1_dir,
                           tmp_path_factory, capsys):
    """--fsdp true on the 8-device mesh: params + Adam moments sharded over
    the data axis (ZeRO-3; parallel/fsdp.py), through the real CLI."""
    import jax
    assert jax.device_count() >= 8
    import train as train_cli
    save_dir = str(tmp_path_factory.mktemp("fsdp_runs"))
    train_cli.main([
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        *SHARED_UNET_ARGS, "--batch-size", "4", "--num-epochs", "1",
        "--vae-path", shared_stage1_dir, "--shuffle", "true",
        "--fsdp", "true",
    ])
    assert "FSDP over 8 devices" in capsys.readouterr().out
    runs = os.listdir(save_dir)
    log = json.load(open(osp.join(save_dir, runs[0], "log.json")))
    assert np.isfinite(log["train_loss"]).all()
    assert np.isfinite(log["val_loss"]).all()


def test_train_state_load_rejects_shape_mismatch(tmp_path):
    """Resuming with width-changing flags (same tree structure, different
    array shapes) must fail at load with a shape message — torch strict=True
    semantics — not later as an opaque flax scope error mid-step."""
    import jax
    import pytest
    from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor
    from diffusion_model_project_tpu.training.train_diffusion import make_optimizer
    from diffusion_model_project_tpu.utils.checkpoint import (
        load_train_state, save_train_state, load_predictor_state,
        save_predictor)

    kw = dict(in_channels=9, out_channels=4, kernel_size=3,
              padding_mode="zeros", activation="silu", final_activation=None,
              attention="", dropout=0.0, time_embedding_dim=16)
    mk = lambda feats, vf: LatentDiffusionPredictor.create(
        dict(kw, features=feats), rng=jax.random.key(0), num_slices=3,
        num_timesteps=20, image_hw=(32, 32), vae_features=vf)
    pred = mk((8, 16), (32, 32, 32))
    opt = make_optimizer(1e-3, 0.01)
    opt_state = opt.init(pred.unet_params)
    path = str(tmp_path / "train_state.msgpack")
    save_train_state(path, pred, opt_state, epoch=1, best_loss=1.0)

    wide = mk((16, 32), (32, 32, 32))
    with pytest.raises(ValueError, match="shape"):
        load_train_state(path, wide, opt.init(wide.unet_params))

    # the VAE branch is checked too (flax apply silently tolerates extra or
    # mis-shaped params; load must not)
    mpath = str(tmp_path / "model.msgpack")
    save_predictor(pred, mpath)
    vae_mismatch = mk((8, 16), (64, 64, 64))
    with pytest.raises(ValueError, match="vae_params"):
        load_predictor_state(vae_mismatch, mpath)
