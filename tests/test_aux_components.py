"""Paired samplers, VAE inference CLI, benchmark loader, misc aux components."""
import json
import os.path as osp
import sys

import numpy as np
import pytest
import torch

REPO = osp.abspath(osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, REPO)

from diffusion_model_project_tpu.data.paired_sampler import (
    PairedBatchSampler, StratifiedPairedBatchSampler)

from ref_loader import load_ref, REF


@pytest.fixture(scope="module")
def ref_sampler():
    return load_ref("refvae.utils.paired_sampler", REF / "VAE_model/utils/paired_sampler.py")


def test_paired_batch_sampler_matches_reference(ref_sampler):
    ours = PairedBatchSampler(17, 4, shuffle=True, seed=5)
    theirs = ref_sampler.PairedBatchSampler(17, 4, shuffle=True, seed=5)
    assert len(ours) == len(theirs)
    assert [b for b in ours] == [b for b in theirs]
    # pairing property: consecutive entries are (i, i+N)
    for batch in ours:
        for k in range(0, len(batch), 2):
            assert batch[k + 1] == batch[k] + 17


def test_stratified_sampler_matches_reference(ref_sampler):
    for split in ("train", "val", "test"):
        ours = StratifiedPairedBatchSampler(40, 4, split=split, seed=2024)
        theirs = ref_sampler.StratifiedPairedBatchSampler(40, 4, split=split, seed=2024)
        assert sorted(ours.split_indices) == sorted(theirs.split_indices)
        assert [b for b in ours] == [b for b in theirs]


def test_sampler_rejects_odd_batch():
    with pytest.raises(ValueError):
        PairedBatchSampler(10, 3)


@pytest.fixture(scope="module")
def vae_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("vaeviz") / "data"
    x = root / "x"
    x.mkdir(parents=True)
    r = np.random.default_rng(0)
    n, s, h, w = 4, 3, 16, 16
    dom = (r.random((n, s, 1, h, w)) > 0.3).astype(np.float32)
    torch.save(torch.from_numpy(dom), x / "domain.pt")
    u2d = r.standard_normal((n, s, 3, h, w)).astype(np.float32)
    u2d[:, :, 2] = 0.0
    torch.save(torch.from_numpy(u2d), x / "U_2d.pt")
    torch.save(torch.from_numpy(r.standard_normal((n, s, 3, h, w)).astype(np.float32)), x / "U.pt")
    torch.save(torch.from_numpy(r.standard_normal((n, s, 1, h, w)).astype(np.float32)), x / "p.pt")
    torch.save(torch.from_numpy(np.ones((n, 3), np.float32)), x / "dxyz.pt")
    return str(root)


@pytest.fixture(scope="module")
def vae_ckpt(tmp_path_factory):
    """Save a random DualBranchVAE as a native msgpack checkpoint."""
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from diffusion_model_project_tpu.models.vae import DualBranchVAE

    folder = tmp_path_factory.mktemp("vae_ckpt_full")
    vae = DualBranchVAE(latent_channels=4)
    dummy = jnp.zeros((1, 3, 16, 16, 3))
    params = vae.init({"params": jax.random.key(0), "sample": jax.random.key(1)},
                      dummy, dummy)["params"]
    with open(folder / "model.msgpack", "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, params)))
    (folder / "vae_log.json").write_text(json.dumps({
        "latent_channels": 4, "norm_factors": [1.0, 1.0, 1.0], "model_type": "dual"}))
    return str(folder)


@pytest.mark.parametrize("mode", ["2d", "3d", "cross"])
def test_inference_vae_cli(vae_data, vae_ckpt, tmp_path, mode):
    import inference_vae
    out = str(tmp_path / mode)
    import os
    os.makedirs(out, exist_ok=True)
    metrics = inference_vae.main([
        "--vae-path", vae_ckpt, "--dataset-dir", vae_data,
        "--mode", mode, "--index", "1", "--output-dir", out])
    assert np.isfinite(metrics["mae_total"])
    assert osp.exists(osp.join(out, f"vae_{mode}_triptych_1.png"))
    assert osp.exists(osp.join(out, f"vae_{mode}_latent_1.png"))


def test_detect_model_type_native(vae_ckpt):
    import inference_vae
    assert inference_vae.detect_model_type(vae_ckpt) == "dual_full"


def test_benchmark_loader_and_resize(tmp_path):
    from PIL import Image
    from diffusion_model_project_tpu.data.dataset import (
        load_VirtualPermeabilityBenchmark, resize_image)

    r = np.random.default_rng(0)
    for i in range(3):
        arr = (r.random((20, 24)) > 0.5).astype(np.uint8) * 255
        Image.fromarray(arr).save(tmp_path / f"slice_{i:03d}.tif")
    out = load_VirtualPermeabilityBenchmark(str(tmp_path))
    assert out["microstructure_original"].shape == (3, 1, 20, 24)
    assert out["dxyz"].shape == (3, 3)
    assert set(np.unique(out["microstructure_original"])) <= {0.0, 1.0}

    resized = resize_image(out["microstructure_original"], target_height=40)
    assert resized.shape == (3, 1, 40, 48)


def test_get_model_loads_native_weights(tmp_path):
    import jax
    from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor
    from diffusion_model_project_tpu.training.helper import get_model
    from diffusion_model_project_tpu.utils.checkpoint import save_predictor

    kw = dict(model_name="UNet",
              model_kwargs=dict(in_channels=9, out_channels=4, features=[8, 16],
                                kernel_size=3, padding_mode="zeros",
                                activation="silu", final_activation=None,
                                attention="", dropout=0.0, time_embedding_dim=16),
              distance_transform=True, vae_path=None,
              vae_encoder_path=None, vae_decoder_path=None,
              num_slices=3, num_timesteps=20)
    pred = LatentDiffusionPredictor.create(
        dict(kw["model_kwargs"]), rng=jax.random.key(0), num_slices=3,
        num_timesteps=20, image_hw=(32, 32))
    pred = pred.set_normalizer({"output": [2.0, 3.0, 4.0]})
    path = str(tmp_path / "model.msgpack")
    save_predictor(pred, path)
    loaded = get_model("latent-diffusion", kw, path, image_hw=(32, 32))
    np.testing.assert_array_equal(
        np.asarray(loaded.norm_output.scale_factors), [2.0, 3.0, 4.0])
    import jax as _jax
    for a, b in zip(_jax.tree_util.tree_leaves(pred.unet_params),
                    _jax.tree_util.tree_leaves(loaded.unet_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_retrieve_model_path_local(tmp_path):
    from diffusion_model_project_tpu.utils.checkpoint import retrieve_model_path
    assert retrieve_model_path(str(tmp_path)) == osp.join(str(tmp_path), "model.pt")


def test_profiling_utils():
    from diffusion_model_project_tpu.utils.profiling import StepTimer, annotate
    t = StepTimer()
    t.start()
    dt = t.stop()
    assert dt >= 0 and t.steps_per_sec > 0
    with annotate("test-region"):
        pass


def test_package_import_initializes_no_jax_backend():
    """Importing the full package must NOT touch a JAX backend: CLIs select
    --device AFTER module imports (train.py main), so any import-time device
    constant initializes every discovered plugin — including the axon TPU
    tunnel — in `--device cpu` subprocesses, which then hang whenever the
    tunnel flakes (observed wedging the suite at test_crash_kill). Run in a
    clean subprocess: the pytest process itself already has backends."""
    import subprocess
    import sys
    code = (
        "import jax._src.xla_bridge as xb\n"
        "import diffusion_model_project_tpu.training.train_diffusion\n"
        "import diffusion_model_project_tpu.training.train_vae_stage1\n"
        "import diffusion_model_project_tpu.training.train_vae_stage2\n"
        "import diffusion_model_project_tpu.losses.eval_metrics\n"
        "import diffusion_model_project_tpu.utils.checkpoint\n"
        "assert not xb._backends, f'backends inited at import: {list(xb._backends)}'\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO,
                   timeout=300)
