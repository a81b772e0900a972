"""Full-workflow smoke test: stage-1 VAE -> stage-2 VAE -> diffusion training
-> end-to-end eval / evaluate / inference CLIs, on tiny synthetic data (CPU).

The trained artifacts come from the session-scoped shared fixtures in
conftest.py (one dataset + one stage-1/stage-2/diffusion run shared with
test_resume_and_mesh to keep suite wall-clock down)."""
import json
import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.abspath(osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def data_dir(shared_data_dir):
    return shared_data_dir


@pytest.fixture(scope="module")
def stage1_dir(shared_stage1_dir):
    assert osp.exists(osp.join(shared_stage1_dir, "vae.msgpack"))
    assert osp.exists(osp.join(shared_stage1_dir, "best_model.msgpack"))
    log = json.load(open(osp.join(shared_stage1_dir, "vae_log.json")))
    assert len(log["loss"]["recons_train"]) == 2
    assert log["norm_factors"] and len(log["norm_factors"]) == 3
    # round-4 extension: per-epoch wall seconds (epoch-scale bench input)
    assert len(log["epoch_time"]) == 2 and all(t > 0 for t in log["epoch_time"])
    return shared_stage1_dir


@pytest.fixture(scope="module")
def stage2_dir(shared_stage2_dir):
    assert osp.exists(osp.join(shared_stage2_dir, "model.msgpack"))
    log = json.load(open(osp.join(shared_stage2_dir, "vae_log.json")))
    assert log["model_type"] == "dual"
    return shared_stage2_dir


@pytest.fixture(scope="module")
def diffusion_dir(shared_diffusion_dir):
    assert osp.exists(osp.join(shared_diffusion_dir, "model.msgpack"))
    assert osp.exists(osp.join(shared_diffusion_dir, "log.json"))
    log = json.load(open(osp.join(shared_diffusion_dir, "log.json")))
    assert len(log["epoch"]) == 2
    assert "test_loss" in log
    assert np.isfinite(log["train_loss"]).all()
    return shared_diffusion_dir


def test_stage2_loads_stage1_and_freezes(stage2_dir, stage1_dir):
    """Stage-2 checkpoint carries the frozen stage-1 E3D unchanged."""
    from flax import serialization
    with open(osp.join(stage1_dir, "vae.msgpack"), "rb") as f:
        s1 = serialization.msgpack_restore(f.read())
    with open(osp.join(stage2_dir, "model.msgpack"), "rb") as f:
        s2 = serialization.msgpack_restore(f.read())
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(s1["encoder_3d"]),
                    jax.tree_util.tree_leaves(s2["encoder_3d"])):
        np.testing.assert_array_equal(a, b)


def test_log_folder_name_matches_reference_format(diffusion_dir):
    name = osp.basename(diffusion_dir)
    assert "_unet_latent-diffusion_" in name
    assert "in-9-out-4-f-2-k-3-p-zeros-a--dr-0.0-wd-0.00e+00-b-2-lr-1.00e-04-ep-2" in name


def test_eval_testset_end2end_cli(data_dir, diffusion_dir, stage1_dir, stage2_dir, tmp_path):
    sys.path.insert(0, osp.join(REPO, "scripts"))
    import importlib
    eval_mod = importlib.import_module("eval_testset_end2end")
    out_dir = str(tmp_path / "eval_out")
    eval_mod.main([
        "--diffusion-model-path", diffusion_dir,
        "--vae-encoder-path", stage2_dir, "--vae-decoder-path", stage1_dir,
        "--dataset-dir", data_dir, "--sampler", "ddim", "--steps", "2",
        "--num-samples", "2", "--output-dir", out_dir,
        "--save-csv", "results.csv", "--torch-noise",
    ])
    import os
    files = os.listdir(out_dir)
    json_files = [f for f in files if f.startswith("eval_results_diffusion_ddim_2steps")]
    assert json_files, files
    results = json.load(open(osp.join(out_dir, json_files[0])))
    assert results["evaluation_mode"] == "END_TO_END_DIFFUSION"
    assert len(results["per_sample_results"]) == 2
    for r in results["per_sample_results"]:
        assert 0 < r["accuracy_score"] <= 1
        assert np.isfinite(r["nmae_total"])
    assert osp.exists(osp.join(out_dir, "results.csv"))


def test_eval_cli_dpm_sampler(data_dir, diffusion_dir, stage1_dir, stage2_dir, tmp_path):
    sys.path.insert(0, osp.join(REPO, "scripts"))
    import importlib
    eval_mod = importlib.import_module("eval_testset_end2end")
    out_dir = str(tmp_path / "eval_dpm_out")
    eval_mod.main([
        "--diffusion-model-path", diffusion_dir,
        "--vae-encoder-path", stage2_dir, "--vae-decoder-path", stage1_dir,
        "--dataset-dir", data_dir, "--sampler", "dpm", "--steps", "3",
        "--num-samples", "1", "--output-dir", out_dir,
    ])
    import os
    json_files = [f for f in os.listdir(out_dir)
                  if f.startswith("eval_results_diffusion_dpm_3steps")]
    assert json_files, os.listdir(out_dir)
    results = json.load(open(osp.join(out_dir, json_files[0])))
    assert np.isfinite(results["per_sample_results"][0]["nmae_total"])


def test_eval_cli_batched_matches_single(data_dir, diffusion_dir, stage1_dir,
                                         stage2_dir, tmp_path):
    """--batch-size N must reproduce the B=1 per-sample results (per-sample
    seeded noise; 3 samples at batch 2 exercises the pad-and-drop path)."""
    sys.path.insert(0, osp.join(REPO, "scripts"))
    import importlib
    eval_mod = importlib.import_module("eval_testset_end2end")

    results = {}
    for bs in ("1", "2"):
        out_dir = str(tmp_path / f"eval_b{bs}")
        eval_mod.main([
            "--diffusion-model-path", diffusion_dir,
            "--vae-encoder-path", stage2_dir, "--vae-decoder-path", stage1_dir,
            "--dataset-dir", data_dir, "--sampler", "ddim", "--steps", "2",
            "--num-samples", "3", "--batch-size", bs, "--output-dir", out_dir,
        ])
        import os
        fname = [f for f in os.listdir(out_dir) if f.endswith(".json")][0]
        results[bs] = json.load(open(osp.join(out_dir, fname)))["per_sample_results"]

    assert [r["sample_id"] for r in results["1"]] == \
           [r["sample_id"] for r in results["2"]]
    for r1, r2 in zip(results["1"], results["2"]):
        np.testing.assert_allclose(r1["nmae_total"], r2["nmae_total"],
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(r1["mae_total"], r2["mae_total"],
                                   rtol=1e-5, atol=1e-9)


def test_eval_sanity_mode(data_dir, diffusion_dir, stage1_dir, stage2_dir, tmp_path):
    sys.path.insert(0, osp.join(REPO, "scripts"))
    import importlib
    eval_mod = importlib.import_module("eval_testset_end2end")
    out_dir = str(tmp_path / "sanity_out")
    eval_mod.main([
        "--diffusion-model-path", diffusion_dir,
        "--vae-encoder-path", stage2_dir, "--vae-decoder-path", stage1_dir,
        "--dataset-dir", data_dir, "--sanity-mode", "--index", "0",
        "--output-dir", out_dir,
    ])
    import os
    json_files = [f for f in os.listdir(out_dir) if f.startswith("eval_results_vae_only")]
    assert json_files
    results = json.load(open(osp.join(out_dir, json_files[0])))
    assert results["evaluation_mode"] == "VAE_ONLY_SANITY_CHECK"


def test_eval_cross_mode(data_dir, diffusion_dir, stage1_dir, stage2_dir,
                         tmp_path):
    """--cross-mode: 2D input -> E2D -> D3D, no diffusion — the composed
    conditioning+decode ceiling row (round-5 decomposition)."""
    sys.path.insert(0, osp.join(REPO, "scripts"))
    import importlib
    eval_mod = importlib.import_module("eval_testset_end2end")
    out_dir = str(tmp_path / "cross_out")
    eval_mod.main([
        "--diffusion-model-path", diffusion_dir,
        "--vae-encoder-path", stage2_dir, "--vae-decoder-path", stage1_dir,
        "--dataset-dir", data_dir, "--cross-mode", "--index", "0",
        "--output-dir", out_dir,
    ])
    import os
    json_files = [f for f in os.listdir(out_dir)
                  if f.startswith("eval_results_vae_cross")]
    assert json_files
    results = json.load(open(osp.join(out_dir, json_files[0])))
    assert results["evaluation_mode"] == "VAE_CROSS_CHECK"
    assert results["pipeline"].startswith("2D input -> E2D -> D3D")
    s = results["summary"]
    assert np.isfinite(s["nmae_total_mean"])


def test_evaluate_cli(data_dir, diffusion_dir):
    import evaluate as evaluate_cli
    evaluate_cli.main(["--model-dir", diffusion_dir, "--root-dir", data_dir])
    assert osp.exists(osp.join(diffusion_dir, "test_result.txt"))
    text = open(osp.join(diffusion_dir, "test_result.txt")).read()
    assert "test_loss" in text


def test_evaluate_cli_legacy_no_time_embeddings(data_dir, diffusion_dir, tmp_path):
    """Legacy checkpoints without time embeddings trigger the retry with
    time_embedding_dim=None (reference evaluate.py:135-151)."""
    import shutil
    from flax import serialization

    legacy_dir = str(tmp_path / "legacy_run")
    shutil.copytree(diffusion_dir, legacy_dir)

    def strip_time(tree):
        if isinstance(tree, dict):
            return {k: strip_time(v) for k, v in tree.items()
                    if "time_mlp" not in k}
        return tree

    for name in ("model.msgpack", "best_model.msgpack"):
        path = osp.join(legacy_dir, name)
        if not osp.exists(path):
            continue
        with open(path, "rb") as f:
            state = serialization.msgpack_restore(f.read())
        state["unet_params"] = strip_time(state["unet_params"])
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(state))

    import evaluate as evaluate_cli
    evaluate_cli.main(["--model-dir", legacy_dir, "--root-dir", data_dir])
    text = open(osp.join(legacy_dir, "test_result.txt")).read()
    assert "test_loss" in text
    loss = float(text.split("test_loss:")[1].split()[0])
    assert np.isfinite(loss)


def test_inference_cli(data_dir, diffusion_dir, tmp_path):
    import inference as inference_cli
    out_png = str(tmp_path / "pred.png")
    inference_cli.main([
        "--model-dir", diffusion_dir, "--root-dir", data_dir,
        "--index", "0", "--sampler", "ddim", "--steps", "2",
        "--output", out_png,
    ])
    assert osp.exists(out_png)
