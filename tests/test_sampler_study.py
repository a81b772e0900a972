"""scripts/sampler_study.py: the SAMPLER_STUDY artifact driver (round 4) —
config ladder through the real eval CLI + the v2-synthetic oracle ceiling
row, driven end to end on the tiny shared fixtures."""
import json
import os.path as osp
import sys

import numpy as np

REPO = osp.abspath(osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "scripts"))


def test_sampler_study_driver(shared_data_dir, shared_stage1_dir,
                              shared_stage2_dir, shared_diffusion_dir,
                              tmp_path):
    import sampler_study

    out = str(tmp_path / "study.json")
    doc = sampler_study.main([
        "--diffusion-model-path", shared_diffusion_dir,
        "--vae-encoder-path", shared_stage2_dir,
        "--vae-decoder-path", shared_stage1_dir,
        "--dataset-dir", shared_data_dir,
        "--configs", "ddim:2,dpm:2",
        "--out", out, "--what", "suite smoke",
    ])
    saved = json.load(open(out))
    assert saved["rows"].keys() == doc["rows"].keys()
    assert set(doc["rows"]) == {"ddim2", "dpm2", "oracle_2d_continuity"}
    for row in doc["rows"].values():
        assert np.isfinite(row["nmae_total_mean"])
        assert np.isfinite(row["cosine_mean"])
    # the shared fixture data is random (not the v2 continuity generator),
    # so the oracle row just has to be finite — on v2 data the oracle is
    # asserted ~1.0 by the generator's own checks (train_demo_full_scale)
