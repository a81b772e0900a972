"""Test configuration: force an 8-device virtual CPU mesh before JAX is imported.

Multi-chip sharding logic is validated on virtual CPU devices
(``--xla_force_host_platform_device_count=8``) as real multi-chip hardware is not
available in CI; see SURVEY.md §4 for the test strategy this replaces (the
reference has no test suite at all).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU explicitly
# so tests use the 8-device virtual mesh instead of the tunneled real chip.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the workflow tests compile many programs;
# cache them across pytest invocations.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pytest_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import json  # noqa: E402
import os.path as osp  # noqa: E402
import sys  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO = osp.abspath(osp.join(osp.dirname(__file__), ".."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


@pytest.fixture
def rng():
    return np.random.default_rng(2024)


# ---------------------------------------------------------------------------
# Shared trained fixtures (session-scoped): one tiny dataset + one stage-1 /
# stage-2 / diffusion run reused by test_cli_workflow AND test_resume_and_mesh.
# Keeping shapes and configs identical across files lets the process-wide jit
# cache absorb the compile cost once (suite wall-clock, VERDICT r1 #10).
# ---------------------------------------------------------------------------

SHARED_UNET_ARGS = [
    "--in-channels", "9", "--out-channels", "4", "--features", "8", "16",
    "--attention", "", "--kernel-size", "3", "--padding-mode", "zeros",
    "--num-slices", "3", "--num-timesteps", "20",
]


@pytest.fixture(scope="session")
def shared_data_dir(tmp_path_factory):
    """Synthetic dataset in the reference .pt layout: 24 samples, 3 slices,
    16x16 (divisible-by-8 train split so the mesh tests can shard batch 8)."""
    import torch

    root = tmp_path_factory.mktemp("shared_ds") / "data"
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
    from diffusion_model_project_tpu.data import get_loader
    get_loader(str(root), batch_size=2, use_3d=True, seed=2024)  # statistics.json
    assert (root / "statistics.json").exists()
    return str(root)


@pytest.fixture(scope="session")
def shared_stage1_dir(shared_data_dir, tmp_path_factory):
    from diffusion_model_project_tpu.training.train_vae_stage1 import main
    out = str(tmp_path_factory.mktemp("shared_s1"))
    # tiny stage widths (reference-default 128/256/512 would spend minutes of
    # CPU per epoch; width parity is covered by the parity suites)
    # --tensorboard is strictly additive (vae_log.json stays canonical);
    # enabling it here covers the stage-1 TB wiring with no extra training
    # (asserted against vae_log.json in test_tb.py)
    main(["--dataset-dir", shared_data_dir, "--save-dir", out,
          "--latent-channels", "4", "--batch-size", "2", "--num-epochs", "2",
          "--grad-accum", "2", "--features", "32", "64", "64",
          "--tensorboard"])
    return out


@pytest.fixture(scope="session")
def shared_stage2_dir(shared_data_dir, shared_stage1_dir, tmp_path_factory):
    from diffusion_model_project_tpu.training.train_vae_stage2 import main
    out = str(tmp_path_factory.mktemp("shared_s2"))
    main(["--dataset-dir", shared_data_dir, "--stage1-checkpoint", shared_stage1_dir,
          "--save-dir", out, "--latent-channels", "4", "--batch-size", "2",
          "--num-epochs", "1", "--grad-accum", "2", "--tensorboard"])
    return out


@pytest.fixture(scope="session")
def shared_diffusion_dir(shared_data_dir, shared_stage1_dir, shared_stage2_dir,
                         tmp_path_factory):
    import os

    import train as train_cli
    save_dir = str(tmp_path_factory.mktemp("shared_diffusion_runs"))
    train_cli.main([
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        *SHARED_UNET_ARGS, "--batch-size", "2", "--num-epochs", "2",
        "--vae-encoder-path", shared_stage2_dir,
        "--vae-decoder-path", shared_stage1_dir,
        "--shuffle", "true",
        # batch 2 on the 8-device test mesh would run replicated (8x the host
        # CPU work); mesh behavior has its own tests
        "--data-parallel", "false",
    ])
    runs = [d for d in os.listdir(save_dir) if osp.isdir(osp.join(save_dir, d))]
    assert len(runs) == 1
    return osp.join(save_dir, runs[0])
