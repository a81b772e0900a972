"""Config surface parity: process_args dict and make_log_folder naming vs the
reference Diffusion_model/config.py; get_norm_params vs reference helper."""
import json

import numpy as np
import pytest

from diffusion_model_project_tpu.utils.config import (
    make_log_folder, parser as our_parser, process_args)
from diffusion_model_project_tpu.training.helper import get_norm_params

from ref_loader import load_ref, REF


@pytest.fixture(scope="module")
def ref_config():
    return load_ref("refdm.config", REF / "Diffusion_model/config.py")


ARGV = [
    "--root-dir", "/data/ds", "--in-channels", "17", "--out-channels", "8",
    "--features", "64", "128", "256", "512", "1024", "--attention", "3..2",
    "--batch-size", "2", "--learning-rate", "1e-3", "--num-epochs", "104",
    "--weight-decay", "0.0", "--dropout", "0.0",
]


def test_process_args_dict_matches_reference(ref_config):
    ours = process_args(our_parser.parse_args(ARGV))
    theirs = ref_config.process_args(ref_config.parser.parse_args(ARGV))
    # device differs by platform; extension flags are ours only
    ours["training"]["device"] = theirs["training"]["device"] = "X"
    assert ours == theirs


def test_log_folder_name_decodes_published_checkpoint(ref_config, tmp_path):
    """The published checkpoint dirname must be reproducible through
    make_log_folder (zenodo.py:19)."""
    argv = ARGV + ["--save-dir", str(tmp_path), "--name", "unet"]
    pd = process_args(our_parser.parse_args(argv))
    folder = make_log_folder(pd)
    import os.path as osp
    name = osp.basename(folder)
    # strip the date prefix; the rest must match the published encoding
    suffix = name.split("_", 1)[1]
    assert suffix == ("unet_latent-diffusion_in-17-out-8-f-5-k-3-p-zeros-"
                      "a-3..2-dr-0.0-wd-0.00e+00-b-2-lr-1.00e-03-ep-104")


def test_get_norm_params_matches_reference(tmp_path):
    from ref_loader import load_ref
    ref_helper = None
    # the reference helper imports heavy deps; replicate its logic check via
    # fixture files instead of importing it
    stats_pc = {"U_per_component": {"max_u": 1.5, "max_v": 2.5, "max_w": 0.25}}
    stats_global = {"U": {"max": 3.0}}
    f1 = tmp_path / "s1.json"
    f1.write_text(json.dumps(stats_pc))
    f2 = tmp_path / "s2.json"
    f2.write_text(json.dumps(stats_global))

    out = get_norm_params(str(f1))
    assert out == {"input": None, "output": (1.5, 2.5, 0.25)}
    out = get_norm_params(str(f2))
    assert out == {"input": None, "output": (3.0, 3.0, 3.0)}
    # 2D stats fall back to max_u for max_w (reference helper.py:60)
    f3 = tmp_path / "s3.json"
    f3.write_text(json.dumps({"U_per_component": {"max_u": 1.0, "max_v": 2.0}}))
    assert get_norm_params(str(f3))["output"] == (1.0, 2.0, 1.0)
