"""The published-weights drop-in recipe (VERDICT r2 #3).

Zenodo (record 18341260) is unreachable from this environment, so the real
published checkpoints cannot be downloaded. This test proves that the moment
they CAN be dropped on disk, the full eval gate runs with ZERO code changes:
it synthesizes a bundle in the exact published layout —

  <root>/VAE's/stage1, <root>/VAE's/stage2        (as VAE's.zip unpacks)
  <root>/20260120_unet_latent-diffusion_in-17-out-8-f-5-k-3-p-zeros-a-3..2-
         dr-0.0-wd-0.00e+00-b-2-lr-1.00e-03-ep-104/   (zenodo.py:19 dirname)

— with reference-format .pt state dicts at the published architecture
(latent 8, 17->8 UNet, features [64..1024], attention "3..2") and a log.json
whose params decode from the dirname, then drives
scripts/eval_testset_end2end.py against it exactly as README.md documents for
the real weights. See README "Using the published checkpoints".

The .pt files come from the reference torch modules themselves
(tests/ref_loader.py), so every checkpoint-flavor detection, key-remapping
and strict-load path is the one the real bundle will hit
(reference predictor.py:390-413, inference.py:141-155).
"""
import json
import os.path as osp

import numpy as np
import pytest
import torch

# Published-architecture CPU compute — the same wall-clock class as the
# parity gate (tests/test_published_scale_parity.py), so the same slow
# marker: the full job (`pytest -m ""`) runs it every round.
pytestmark = pytest.mark.slow

PUBLISHED_DIRNAME = (
    "20260120_unet_latent-diffusion_in-17-out-8-f-5-k-3-p-zeros-a-3..2"
    "-dr-0.0-wd-0.00e+00-b-2-lr-1.00e-03-ep-104")
LATENT = 8
S = 11
# published weights are spatial-size-agnostic; 128^2 is the smallest size the
# 5-level UNet admits (latent 32^2 over 5 pools — the reference's own dry-run
# scale, gridsearch_diffusion.py:197-229) and keeps CPU wall-clock sane
H = W = 128


def _dataset(tmp_path):
    root = tmp_path / "data"
    x = root / "x"
    x.mkdir(parents=True)
    r = np.random.default_rng(0)
    n = 8
    dom = (r.random((n, S, 1, H, W)) > 0.3).astype(np.float32)
    dom[:, :, :, 0, 0] = 0.0
    torch.save(torch.from_numpy(dom), x / "domain.pt")
    u2d = r.standard_normal((n, S, 3, H, W)).astype(np.float32) * 1e-2
    u2d[:, :, 2] = 0.0
    torch.save(torch.from_numpy(u2d), x / "U_2d.pt")
    torch.save(torch.from_numpy(
        (r.standard_normal((n, S, 3, H, W)) * 1e-2).astype(np.float32)),
        x / "U.pt")
    torch.save(torch.from_numpy(
        r.standard_normal((n, S, 1, H, W)).astype(np.float32)), x / "p.pt")
    torch.save(torch.from_numpy(np.ones((n, 3), np.float32)), x / "dxyz.pt")
    from diffusion_model_project_tpu.data import get_loader
    get_loader(str(root), batch_size=2, use_3d=True, seed=2024)
    return str(root)


@pytest.fixture(scope="module")
def published_bundle(tmp_path_factory):
    """Synthesize the Zenodo drop: published dirname, reference-format .pt."""
    from ref_loader import ref_dual_vae, ref_predictor
    from diffusion_model_project_tpu.utils.config import parser, process_args

    root = tmp_path_factory.mktemp("zenodo_drop")
    torch.manual_seed(18341260)

    # ---- VAE's.zip layout: stage-1 (E3D/D3D home) + stage-2 (E2D home)
    dv_mod = ref_dual_vae()
    vae = dv_mod.DualBranchVAE(in_channels=3, latent_channels=LATENT)
    norm_factors = [2.1e-2, 1.6e-2, 7.9e-3]
    vaes = root / "VAE's"
    stage1, stage2 = vaes / "stage1", vaes / "stage2"
    stage1.mkdir(parents=True), stage2.mkdir()
    # stage-1 saves the 3D branch under encoder_3d./decoder_3d. (the
    # VAE3DWrapper naming, train_3d_vae_only.py:272-305)
    sd = vae.state_dict()
    torch.save({k: v for k, v in sd.items()
                if k.startswith(("encoder_3d.", "decoder_3d."))},
               stage1 / "vae.pt")
    for d in (stage1, stage2):
        (d / "vae_log.json").write_text(json.dumps({
            "model_type": "dual", "latent_channels": LATENT,
            "in_channels": 3, "norm_factors": norm_factors}))
    # stage-2 saves the full dual model (train_2d_with_cross.py:610-631)
    torch.save(sd, stage2 / "best_model.pt")

    # ---- the published diffusion run dir
    run = root / PUBLISHED_DIRNAME
    run.mkdir()
    argv = [
        "--root-dir", "/remote/dataset_3d", "--save-dir", str(root),
        "--in-channels", "17", "--out-channels", "8",
        "--features", "64", "128", "256", "512", "1024",
        "--kernel-size", "3", "--padding-mode", "zeros",
        "--attention", "3..2", "--dropout", "0.0",
        "--weight-decay", "0.0", "--batch-size", "2",
        "--learning-rate", "1e-3", "--num-epochs", "104",
        "--num-slices", str(S), "--num-timesteps", "1000",
        # the original machine's VAE paths, exactly as a real log.json
        # records them — the eval CLI must override them from its flags
        "--vae-encoder-path", "/home/hpc/VAE_model/logs/stage2",
        "--vae-decoder-path", "/home/hpc/VAE_model/logs/stage1",
    ]
    params = process_args(parser.parse_args(argv))
    (run / "log.json").write_text(json.dumps(
        {"params": params, "epoch": [103], "train_loss": [0.1],
         "val_loss": [0.1]}))

    # best_model.pt: the full-predictor flat state dict the reference saves
    # (UNet + scheduler buffers + normalizers + frozen VAE, train.py:199-210)
    pred_mod = ref_predictor()
    ref = pred_mod.LatentDiffusionPredictor(
        model_name="UNet",
        model_kwargs=dict(params["training"]["predictor"]["model_kwargs"]),
        distance_transform=True, vae_path=str(stage1),
        num_slices=S, num_timesteps=1000)
    with torch.no_grad():  # zero-init final conv -> nonzero, as trained
        ref.model.final_conv.weight.normal_(0, 0.05)
        ref.model.final_conv.bias.normal_(0, 0.05)
    torch.save(ref.state_dict(), run / "best_model.pt")
    return {"run": str(run), "stage1": str(stage1), "stage2": str(stage2)}


def test_eval_gate_runs_on_published_layout(published_bundle, tmp_path):
    """README recipe, verbatim flags: the gate must produce its JSON report
    with finite metrics from the drop-in bundle, no code edits."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "eval_cli", osp.join(osp.dirname(osp.dirname(
            osp.abspath(__file__))), "scripts", "eval_testset_end2end.py"))
    eval_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(eval_cli)

    data = _dataset(tmp_path)
    out = tmp_path / "eval_out"
    eval_cli.main([
        "--diffusion-model-path", published_bundle["run"],
        "--dataset-dir", data,
        "--vae-encoder-path", published_bundle["stage2"],
        "--vae-decoder-path", published_bundle["stage1"],
        "--split", "test", "--sampler", "ddim", "--steps", "2",
        "--num-samples", "1", "--output-dir", str(out),
        "--device", "cpu",
    ])
    reports = list(out.glob("eval_results_*.json"))
    assert len(reports) == 1, list(out.iterdir())
    with open(reports[0]) as f:
        rep = json.load(f)
    assert np.isfinite(rep["summary"]["nmae_total_mean"])
    assert rep["args"]["diffusion_model_path"] == published_bundle["run"]
    assert rep["evaluation_mode"] == "END_TO_END_DIFFUSION"


def test_inference_cli_runs_on_published_layout(published_bundle, tmp_path):
    """Same drop-in bundle through the end-user inference CLI (PNG path)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "inference_cli", osp.join(osp.dirname(osp.dirname(
            osp.abspath(__file__))), "inference.py"))
    inf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(inf)

    data = _dataset(tmp_path)
    out_png = tmp_path / "pred.png"
    inf.main([
        "--model-dir", published_bundle["run"],
        "--root-dir", data, "--index", "0",
        "--vae-encoder-path", published_bundle["stage2"],
        "--vae-decoder-path", published_bundle["stage1"],
        "--sampler", "ddim", "--steps", "2",
        "--output", str(out_png), "--device", "cpu",
    ])
    assert out_png.exists()
