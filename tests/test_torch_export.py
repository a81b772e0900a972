"""Round-trip tests for the .pt exporter (utils/torch_export).

Export must be the exact inverse of utils/torch_import AND produce state
dicts the unmodified reference torch code accepts via
load_state_dict(strict=True) — that is the whole migration contract
(reference Diffusion_model/src/predictor.py:194-218 loads with strict=True).
"""
import json
import os

import numpy as np
import pytest
import torch
import jax

from diffusion_model_project_tpu.utils import torch_export as te
from diffusion_model_project_tpu.utils import torch_import as ti

from ref_loader import ref_dual_vae, ref_predictor, ref_unet

S, H, W = 3, 32, 32
LATENT = 4
T = 20
UNET_KW = dict(
    in_channels=2 * LATENT + 1, out_channels=LATENT, features=[8, 16],
    kernel_size=3, padding_mode="zeros", activation="silu",
    final_activation=None, attention="2.2.2", dropout=0.0,
)
NORM_FACTORS = [2.0, 3.0, 4.0]


def _np_sd(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _assert_sd_equal(expected: dict, got: dict, what: str):
    assert set(expected) == set(got), (
        f"{what}: key mismatch; missing={sorted(set(expected) - set(got))[:8]} "
        f"unexpected={sorted(set(got) - set(expected))[:8]}")
    for k in expected:
        np.testing.assert_array_equal(
            np.asarray(expected[k], np.float32), got[k], err_msg=f"{what}: {k}")


@pytest.fixture(scope="module")
def torch_seed():
    torch.manual_seed(2024)


def test_vae_roundtrip_exact(torch_seed):
    """export(import(sd)) == sd bitwise, for all four DualBranchVAE branches."""
    dv_mod = ref_dual_vae()
    ref = dv_mod.DualBranchVAE(in_channels=3, latent_channels=LATENT)
    sd = _np_sd(ref)
    params = ti.import_dual_vae(sd)
    _assert_sd_equal(sd, te.export_dual_vae(params), "dual_vae")


def test_unet_roundtrip_exact_and_strict_load(torch_seed):
    """export(import(sd)) == sd for the UNet (attention + time mlp), and the
    exported dict strict-loads into a fresh reference UNet."""
    models = ref_unet()
    ref = models.UNet(**UNET_KW)
    sd = _np_sd(ref)
    params = ti.import_unet(sd, num_levels=len(UNET_KW["features"]))
    out = te.export_unet(params)
    _assert_sd_equal(sd, out, "unet")

    fresh = models.UNet(**UNET_KW)
    fresh.load_state_dict({k: torch.from_numpy(v) for k, v in out.items()},
                          strict=True)


@pytest.fixture(scope="module")
def ref_pred(tmp_path_factory, torch_seed):
    pred_mod = ref_predictor()
    dv_mod = ref_dual_vae()
    vae = dv_mod.DualBranchVAE(in_channels=3, latent_channels=LATENT)
    folder = tmp_path_factory.mktemp("vae_ckpt")
    torch.save(vae.state_dict(), folder / "vae.pt")
    (folder / "vae_log.json").write_text(json.dumps({
        "model_type": "dual", "latent_channels": LATENT, "in_channels": 3,
        "norm_factors": NORM_FACTORS,
    }))
    ref = pred_mod.LatentDiffusionPredictor(
        model_name="UNet", model_kwargs=dict(UNET_KW),
        distance_transform=True, vae_path=str(folder),
        num_slices=S, num_timesteps=T,
    )
    ref.eval()
    return ref


@pytest.fixture(scope="module")
def our_pred(ref_pred):
    import dataclasses

    from diffusion_model_project_tpu.diffusion.predictor import (
        LatentDiffusionPredictor,
    )

    pred = LatentDiffusionPredictor.create(
        dict(UNET_KW), rng=jax.random.key(0), num_slices=S, num_timesteps=T,
        distance_transform=True, image_hw=(H, W),
    )
    pred = dataclasses.replace(
        pred,
        unet_params=ti.import_unet(_np_sd(ref_pred.model),
                                   num_levels=len(UNET_KW["features"])),
        vae_params=ti.import_dual_vae(_np_sd(ref_pred.vae)),
    )
    return pred.set_normalizer({"input": [1.0], "output": NORM_FACTORS})


def test_predictor_export_matches_reference_state_dict(ref_pred, our_pred):
    """export_predictor reproduces the reference predictor's FULL state dict
    (model.* / vae.* / scheduler.* / normalizer.* / distance_transform) and
    strict-loads back into it."""
    exported = te.export_predictor(our_pred)
    expected = _np_sd(ref_pred)
    assert set(expected) == set(exported), (
        f"missing={sorted(set(expected) - set(exported))[:8]} "
        f"unexpected={sorted(set(exported) - set(expected))[:8]}")
    for k in expected:
        np.testing.assert_allclose(
            expected[k], exported[k], rtol=0, atol=1e-6, err_msg=k)
    ref_pred.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in exported.items()},
        strict=True)


def test_export_diffusion_dir_cli(tmp_path, our_pred):
    """A native diffusion run dir converts via the CLI into .pt files whose
    key set is the reference predictor contract; importing the exported UNet
    back reproduces the original params bitwise."""
    import sys

    from diffusion_model_project_tpu.utils.checkpoint import save_predictor

    run_dir = tmp_path / "run"
    run_dir.mkdir()
    (run_dir / "log.json").write_text(json.dumps({"params": {"training": {
        "predictor": {"num_timesteps": T, "distance_transform": True}}}}))
    save_predictor(our_pred, str(run_dir / "model.msgpack"))
    save_predictor(our_pred, str(run_dir / "ema_model.msgpack"))

    sys.path.insert(0, "scripts")
    try:
        import export_torch
        assert export_torch.main([str(run_dir)]) == 0
    finally:
        sys.path.remove("scripts")

    for stem in ("model", "ema_model"):
        sd = ti.load_torch_state_dict(str(run_dir / f"{stem}.pt"))
        assert sd["distance_transform"] == np.float32([1.0])
        np.testing.assert_array_equal(
            sd["normalizer.output.scale_factors"], np.float32(NORM_FACTORS))
        reimported = ti.import_unet(ti.strip_prefix(sd, "model."),
                                    num_levels=len(UNET_KW["features"]))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a, np.float32), b),
            our_pred.unet_params, reimported)


def test_export_vae_dir_stage1(tmp_path, torch_seed):
    """A stage-1 run dir (3d branches only) exports to a vae.pt the
    reference's flavor detection reads as dual_stage1_3d, bitwise round-trip."""
    from flax import serialization

    dv_mod = ref_dual_vae()
    ref = dv_mod.DualBranchVAE(in_channels=3, latent_channels=LATENT)
    sd = _np_sd(ref)
    branches = {
        "encoder_3d": ti.import_vae_encoder(ti.strip_prefix(sd, "encoder_3d.")),
        "decoder_3d": ti.import_vae_decoder(ti.strip_prefix(sd, "decoder_3d.")),
    }
    run_dir = tmp_path / "stage1"
    run_dir.mkdir()
    (run_dir / "vae.msgpack").write_bytes(serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, branches)))

    written = te.export_vae_dir(str(run_dir))
    assert written == [str(run_dir / "vae.pt")]
    out = ti.load_torch_state_dict(written[0])
    assert ti.detect_vae_checkpoint_type(out) == "dual_stage1_3d"
    expected = {k: v for k, v in sd.items()
                if k.startswith(("encoder_3d.", "decoder_3d."))}
    _assert_sd_equal(expected, out, "stage1")


def test_mixed_format_split_vae_load(tmp_path, shared_stage1_dir, shared_stage2_dir):
    """Each split VAE dir resolves independently: a natively-trained stage-2
    encoder dir pairs with a reference-format .pt stage-1 decoder dir (and
    the all-native pairing still works)."""
    import shutil

    from diffusion_model_project_tpu.utils.checkpoint import load_dual_vae_from_paths
    from diffusion_model_project_tpu.utils.torch_export import export_vae_dir

    # all-native baseline
    params_native, _, flavor = load_dual_vae_from_paths(
        vae_encoder_path=shared_stage2_dir, vae_decoder_path=shared_stage1_dir)
    assert flavor == "dual_split_native"

    # convert the stage-1 run dir to a reference .pt-only dir
    pt_dir = tmp_path / "stage1_pt"
    pt_dir.mkdir()
    exported = export_vae_dir(shared_stage1_dir, out_dir=str(pt_dir))
    assert exported
    for extra in ("vae_log.json",):
        src = os.path.join(shared_stage1_dir, extra)
        if os.path.exists(src):
            shutil.copy(src, pt_dir / extra)

    params_mixed, _, flavor = load_dual_vae_from_paths(
        vae_encoder_path=shared_stage2_dir, vae_decoder_path=str(pt_dir))
    assert flavor == "dual_split_native"  # one native side
    for branch in ("encoder_3d", "decoder_3d"):
        a = jax.tree_util.tree_leaves(params_native[branch])
        b = jax.tree_util.tree_leaves(params_mixed[branch])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_split_path_falls_back_to_vae_path(shared_stage1_dir, shared_stage2_dir):
    """A single split path + --vae-path: the missing side falls back to
    vae_path (reference predictor.py:480-481) — before the fix the split
    path was silently IGNORED and every branch loaded from vae_path."""
    from diffusion_model_project_tpu.utils.checkpoint import load_dual_vae_from_paths

    full, _, flavor_full = load_dual_vae_from_paths(
        vae_encoder_path=shared_stage2_dir, vae_decoder_path=shared_stage1_dir)
    fb, _, flavor_fb = load_dual_vae_from_paths(
        vae_path=shared_stage1_dir, vae_encoder_path=shared_stage2_dir)
    assert flavor_fb == flavor_full == "dual_split_native"
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        full, fb)


def test_lone_split_path_without_vae_path_raises(shared_stage2_dir):
    """Reference predictor.py:343: vae_path None + an incomplete split pair
    raises — before the fix build_predictor silently initialized a RANDOM
    VAE and trained/evaled in a garbage latent space."""
    from diffusion_model_project_tpu.utils.checkpoint import (
        build_predictor, load_dual_vae_from_paths)

    with pytest.raises(ValueError, match="must be provided"):
        load_dual_vae_from_paths(vae_encoder_path=shared_stage2_dir)
    with pytest.raises(ValueError, match="must be provided"):
        build_predictor({"model_kwargs": dict(UNET_KW),
                         "vae_encoder_path": shared_stage2_dir,
                         "num_slices": S, "num_timesteps": T})


def test_conv1d_import_rejects_wide_kernels():
    """_conv's rank-3 (Conv1d) branch only supports k=1; w[..., 0] on a k>1
    kernel would silently drop taps and load a numerically wrong model."""
    sd = {"c.weight": np.zeros((4, 4, 3), np.float32),
          "c1.weight": np.zeros((4, 4, 1), np.float32)}
    with pytest.raises(ValueError, match="kernel_size"):
        ti._conv(sd, "c")
    out = ti._conv(sd, "c1")  # k=1 still imports as a Linear
    assert out["weight"].shape == (4, 4)
