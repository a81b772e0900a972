"""Data layer: split parity vs reference, dataset contracts on synthetic .pt files."""
import json

import numpy as np
import pytest
import torch

from diffusion_model_project_tpu.data import (
    create_split, get_or_create_split, create_paired_split_for_vae,
    get_3d_only_split, MicroFlowDataset, MicroFlowDatasetVAE, get_loader,
)
from diffusion_model_project_tpu.data.dataset import NumpyLoader

from ref_loader import load_ref, REF


@pytest.fixture(scope="module")
def ref_split():
    return load_ref("refshared.data_split", REF / "shared/data_split.py")


@pytest.mark.parametrize("n", [10, 97, 1000])
def test_split_membership_matches_reference(ref_split, n):
    theirs = ref_split.create_split(n)
    ours = create_split(n)
    for k in ("train", "val", "test"):
        assert ours[k] == theirs[k], k
    assert ours["metadata"] == theirs["metadata"]


def test_paired_split_matches_reference(ref_split):
    theirs = ref_split.create_paired_split_for_vae(40)
    ours = create_paired_split_for_vae(40)
    for k in ("train", "val", "test"):
        assert ours[k] == theirs[k]
    t3d = ref_split.get_3d_only_split(theirs, 40)
    o3d = get_3d_only_split(ours, 40)
    for k in ("train", "val", "test"):
        assert o3d[k] == t3d[k]


def test_get_or_create_split_roundtrip(tmp_path):
    s1 = get_or_create_split(str(tmp_path), 50)
    assert (tmp_path / "splits.json").exists()
    s2 = get_or_create_split(str(tmp_path), 50)
    assert s1["train"] == s2["train"]
    # size mismatch forces re-creation
    s3 = get_or_create_split(str(tmp_path), 60)
    assert s3["metadata"]["num_samples"] == 60


@pytest.fixture()
def synthetic_root(tmp_path):
    """Write a tiny synthetic dataset in the reference .pt layout."""
    r = np.random.default_rng(0)
    n, s, h, w = 12, 3, 16, 16
    x = tmp_path / "data" / "x"
    x.mkdir(parents=True)
    torch.save(torch.from_numpy((r.random((n, s, 1, h, w)) > 0.3).astype(np.float32)), x / "domain.pt")
    u2d = r.standard_normal((n, s, 3, h, w)).astype(np.float32)
    u2d[:, :, 2] = 0.0
    torch.save(torch.from_numpy(u2d), x / "U_2d.pt")
    torch.save(torch.from_numpy(r.standard_normal((n, s, 3, h, w)).astype(np.float32)), x / "U.pt")
    torch.save(torch.from_numpy(r.standard_normal((n, s, 1, h, w)).astype(np.float32)), x / "p.pt")
    torch.save(torch.from_numpy(np.ones((n, 3), np.float32)), x / "dxyz.pt")
    return tmp_path / "data"


def test_dataset_loads_and_shapes(synthetic_root):
    ds = MicroFlowDataset(str(synthetic_root), use_3d=True)
    assert len(ds) == 12
    sample = ds[0]
    assert sample["microstructure"].shape == (3, 1, 16, 16)
    assert sample["velocity"].shape == (3, 3, 16, 16)
    assert sample["velocity_input"].shape == (3, 3, 16, 16)


def test_get_loader_split_and_stats(synthetic_root):
    loaders = get_loader(str(synthetic_root), batch_size=4, use_3d=True, seed=2024)
    train_loader, val_loader, test_loader = loaders[0]
    # 70/15/15 of 12: 8/1/3
    assert len(train_loader.dataset) == 8
    assert len(val_loader.dataset) == 1
    assert len(test_loader.dataset) == 3
    stats = json.loads((synthetic_root / "statistics.json").read_text())
    assert "U_per_component" in stats and "max_w" in stats["U_per_component"]
    batch = next(iter(train_loader))
    assert batch["velocity"].shape == (4, 3, 3, 16, 16)


def test_statistics_writer_matches_reference_contract(synthetic_root, tmp_path):
    """The in-loader statistics.json must carry the reference writer's full
    field set with equal values (reference Diffusion_model/utils/dataset.py:344-438)."""
    # torchvision isn't installed; the reference module imports it at top
    # level but _save_statistics never touches it
    import sys, types
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_tf = types.ModuleType("torchvision.transforms")
        tv_tf.v2 = types.ModuleType("torchvision.transforms.v2")
        tv.transforms = tv_tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_tf
    load_ref("refdm_utils.zenodo", REF / "Diffusion_model/utils/zenodo.py")
    ref_ds_mod = load_ref("refdm_utils.dataset",
                          REF / "Diffusion_model/utils/dataset.py")

    ours_ds = MicroFlowDataset(str(synthetic_root), use_3d=True, save_stats=True)
    ours = json.loads((synthetic_root / "statistics.json").read_text())

    ref_root = tmp_path / "ref_stats"
    ref_root.mkdir()
    stub = type("Stub", (), {})()
    stub.root_dir = str(ref_root)
    stub.use_3d = True
    # np.array copies: our arrays may be read-only .npy_cache memmaps, which
    # torch.from_numpy can't wrap without warnings
    stub.data = {k: torch.from_numpy(np.array(v))
                 for k, v in ours_ds.data.items()}
    ref_ds_mod.MicroFlowDataset._save_statistics(stub)
    theirs = json.loads((ref_root / "statistics.json").read_text())

    assert set(ours) == set(theirs), (set(ours), set(theirs))
    for section in theirs:
        assert set(ours[section]) == set(theirs[section]), section
        for field, val in theirs[section].items():
            if isinstance(val, str):
                assert ours[section][field] == val, (section, field)
            else:
                np.testing.assert_allclose(ours[section][field], val,
                                           rtol=1e-6, err_msg=f"{section}.{field}")


def _load_ref_vae_dataset_mod():
    """Reference VAE_model/utils/dataset.py with a torchvision.functional shim
    (hflip/vflip are imported at module top but unused by the parts under test)."""
    import sys, types
    if "torchvision.transforms.functional" not in sys.modules:
        tv = sys.modules.get("torchvision", types.ModuleType("torchvision"))
        tv_tf = getattr(tv, "transforms", types.ModuleType("torchvision.transforms"))
        tv_f = types.ModuleType("torchvision.transforms.functional")
        tv_f.hflip = tv_f.vflip = lambda x: x
        tv_tf.functional = tv_f
        tv.transforms = tv_tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_tf
        sys.modules["torchvision.transforms.functional"] = tv_f
    return load_ref("refvae_utils.dataset", REF / "VAE_model/utils/dataset.py")


def test_dataset_transform_matches_reference(synthetic_root, tmp_path):
    """Legacy DatasetTransform: same statistics.json (incl. the U-abs vs
    p/d-plain max quirk) and same (inverse-)transforms
    (reference VAE dataset.py:505-638)."""
    from diffusion_model_project_tpu.data import DatasetTransform
    ref_mod = _load_ref_vae_dataset_mod()

    ref_root = tmp_path / "refdt"
    import shutil
    shutil.copytree(synthetic_root, ref_root)

    ours = DatasetTransform(str(synthetic_root))
    theirs = ref_mod.DatasetTransform(str(ref_root))
    ours_stats = json.loads((synthetic_root / "statistics.json").read_text())
    ref_stats = json.loads((ref_root / "statistics.json").read_text())
    assert ours_stats == ref_stats

    r = np.random.default_rng(1)
    sample_np = {"velocity": r.standard_normal((3, 4, 4)).astype(np.float32),
                 "pressure": r.standard_normal((1, 4, 4)).astype(np.float32),
                 "dxyz": np.ones(3, np.float32)}
    sample_t = {k: torch.from_numpy(v.copy()) for k, v in sample_np.items()}
    out_np = ours(dict(sample_np))
    out_t = theirs(dict(sample_t))
    for k in sample_np:
        np.testing.assert_allclose(out_np[k], out_t[k].numpy(), rtol=1e-6)
    back = ours.inverse_transform(dict(out_np))
    for k in sample_np:
        np.testing.assert_allclose(back[k], sample_np[k], rtol=1e-5, atol=1e-7)

    # dict-init path
    ours2 = DatasetTransform(ours_stats)
    np.testing.assert_allclose(ours2.transform_U(sample_np["velocity"]),
                               out_np["velocity"], rtol=1e-6)


def test_vae_paired_view_matches_reference(synthetic_root, tmp_path):
    """Legacy paired VAE view: item layout + fluid-masked statistics writer
    (reference VAE dataset.py:16-282, 186-260)."""
    from diffusion_model_project_tpu.data import MicroFlowDatasetVAEPaired
    ref_mod = _load_ref_vae_dataset_mod()

    import shutil
    ref_root = tmp_path / "refpaired"
    shutil.copytree(synthetic_root, ref_root)

    ours = MicroFlowDatasetVAEPaired(str(synthetic_root), save_stats=True)
    theirs = ref_mod.MicroFlowDataset(str(ref_root))
    assert len(ours) == len(theirs)
    for idx in (0, len(ours) - 1):
        o, t = ours[idx], theirs[idx]
        assert set(o) == set(t)
        for k in o:
            np.testing.assert_allclose(np.asarray(o[k]), t[k].numpy(), rtol=1e-6,
                                       err_msg=f"item {idx} key {k}")

    ours_stats = json.loads((synthetic_root / "statistics.json").read_text())
    ref_stats = json.loads((ref_root / "statistics.json").read_text())
    assert set(ours_stats) == set(ref_stats)
    for section in ref_stats:
        assert set(ours_stats[section]) == set(ref_stats[section]), section
        for field, val in ref_stats[section].items():
            np.testing.assert_allclose(ours_stats[section][field], val, rtol=1e-5,
                                       err_msg=f"{section}.{field}")


def test_get_loader_respects_splits_json(synthetic_root):
    split = {"train": [0, 1, 2, 3], "val": [4, 5], "test": [6, 7],
             "metadata": {"num_samples": 12}}
    (synthetic_root / "splits.json").write_text(json.dumps(split))
    loaders = get_loader(str(synthetic_root), batch_size=2, use_3d=True)
    train_loader, val_loader, test_loader = loaders[0]
    assert len(train_loader.dataset) == 4
    assert len(val_loader.dataset) == 2
    assert len(test_loader.dataset) == 2


def test_kfold_loader(synthetic_root):
    folds = get_loader(str(synthetic_root), batch_size=2, use_3d=True, k_folds=3)
    assert len(folds) == 3
    sizes = [len(tr.dataset) + len(va.dataset) for tr, va, _ in folds]
    assert all(s == 12 for s in sizes)


def test_vae_dataset_pairing(synthetic_root):
    ds = MicroFlowDatasetVAE(str(synthetic_root))
    n = ds.num_microstructures
    assert len(ds) == 2 * n
    s2d = ds[1]
    s3d = ds[1 + n]
    assert bool(s2d["is_2d"]) and not bool(s3d["is_2d"])
    assert int(s2d["original_idx"]) == int(s3d["original_idx"]) == 1
    assert s2d["velocity"].shape == (3, 3, 16, 16)  # (C, D, H, W)
    np.testing.assert_array_equal(s2d["velocity"][2], 0.0)  # 2D sample has w=0


def test_augmentation_sign_flips(synthetic_root):
    ds = MicroFlowDataset(str(synthetic_root), use_3d=True, augment=True, seed=1)
    base = MicroFlowDataset(str(synthetic_root), use_3d=True, augment=False)
    # over several draws, augmented velocity magnitude must equal base magnitude
    for idx in range(4):
        aug = ds[idx]
        ref = base[idx]
        np.testing.assert_allclose(
            np.sort(np.abs(aug["velocity"]).ravel()),
            np.sort(np.abs(ref["velocity"]).ravel()), rtol=1e-6)


def test_rotate_y_field_5d(synthetic_root):
    """y-direction data in the 5-D use_3d layout: rotation must act on the
    CHANNEL axis (2), not the slice axis (the reference crashes on 5-D)."""
    from diffusion_model_project_tpu.data.dataset import _rotate_y_field

    r = np.random.default_rng(1)
    vel = r.standard_normal((2, 5, 3, 8, 8)).astype(np.float32)  # (N,S,C,H,W)
    out = _rotate_y_field(vel)
    assert out.shape == (2, 5, 3, 8, 8)
    rot = np.rot90(vel, k=1, axes=(-2, -1))
    np.testing.assert_allclose(out[:, :, 0], rot[:, :, 1])   # new u = old v
    np.testing.assert_allclose(out[:, :, 1], -rot[:, :, 0])  # new v = -old u
    np.testing.assert_allclose(out[:, :, 2], rot[:, :, 2])   # w unchanged

    # 1-channel 5-D field (microstructure): rotate only
    micro = r.standard_normal((2, 5, 1, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(_rotate_y_field(micro),
                               np.rot90(micro, k=1, axes=(-2, -1)))

    # 4-D field still matches the reference behavior
    vel4 = r.standard_normal((2, 3, 8, 8)).astype(np.float32)
    out4 = _rotate_y_field(vel4)
    rot4 = np.rot90(vel4, k=1, axes=(-2, -1))
    np.testing.assert_allclose(out4[:, 0], rot4[:, 1])
    np.testing.assert_allclose(out4[:, 1], -rot4[:, 0])


def test_loader_with_y_direction_data(synthetic_root):
    """A y/ directory is rotated + concatenated onto the x data."""
    import shutil
    y = synthetic_root / "y"
    if y.exists():
        shutil.rmtree(y)
    shutil.copytree(synthetic_root / "x", y)
    try:
        ds = MicroFlowDataset(str(synthetic_root), use_3d=True)
        assert len(ds) == 24  # 12 x + 12 y
        assert np.isfinite(ds[23]["velocity"]).all()
    finally:
        shutil.rmtree(y)


def test_numpy_loader_batching():
    class Tiny:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    loader = NumpyLoader(Tiny(), batch_size=2)
    batches = list(loader)
    assert [b["x"].shape[0] for b in batches] == [2, 2, 1]
    loader2 = NumpyLoader(Tiny(), batch_size=2, drop_last=True)
    assert [b["x"].shape[0] for b in loader2] == [2, 2]


def test_npy_cache_round_trip_and_invalidation(synthetic_root):
    """_load_pt writes a .npy_cache sibling once, memory-maps it on later
    loads (identical values), and invalidates when the .pt changes."""
    import os
    import os.path as osp
    import time
    from diffusion_model_project_tpu.data.dataset import _load_pt

    path = str(synthetic_root / "x" / "U.pt")
    first = np.asarray(_load_pt(path))          # writes the cache
    cache_dir = osp.join(osp.dirname(path), ".npy_cache")
    entries = [f for f in os.listdir(cache_dir) if f.startswith("U.pt.")]
    assert len(entries) == 1

    second = _load_pt(path)                      # served from the cache
    assert isinstance(second, np.memmap)
    np.testing.assert_array_equal(np.asarray(second), first)

    # rewriting the source invalidates (size+mtime keyed name)
    new = np.zeros_like(first)
    time.sleep(0.01)
    torch.save(torch.from_numpy(new), path)
    third = _load_pt(path)
    np.testing.assert_array_equal(np.asarray(third), new)
    entries = [f for f in os.listdir(cache_dir) if f.startswith("U.pt.")]
    assert len(entries) == 1  # stale entry replaced


def test_npy_cache_tmp_reclaim_is_pid_guarded(synthetic_root):
    """Orphan .tmp entries from a SIGKILLed writer are reclaimed on the next
    cache write, but a LIVE concurrent writer's .tmp is never touched
    (data/dataset.py:63-86) — and a concurrent second reader process gets
    identical data while the parent races it for the first conversion.
    The 2 GB-scale version of this is scripts/soak_ingest_cache.py."""
    import os
    import os.path as osp
    import subprocess
    import sys
    from diffusion_model_project_tpu.data.dataset import _load_pt

    path = str(synthetic_root / "x" / "U_2d.pt")
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))

    # concurrent second reader racing the parent's first conversion
    child = subprocess.Popen(
        [sys.executable, "-c",
         "import sys, numpy as np\n"
         f"sys.path.insert(0, {repo!r})\n"
         "from diffusion_model_project_tpu.data.dataset import _load_pt\n"
         f"a = np.asarray(_load_pt({path!r}))\n"
         "print('child_sum', float(a.sum()))"],
        stdout=subprocess.PIPE, text=True)
    parent = np.asarray(_load_pt(path))
    out, _ = child.communicate(timeout=300)
    assert child.returncode == 0
    assert abs(float(out.split()[-1]) - float(parent.sum())) < 1e-3

    cache_dir = osp.join(osp.dirname(path), ".npy_cache")
    name = osp.basename(path)
    # plant: one dead-pid orphan, one live-pid (our own) in-flight tmp
    probe = subprocess.run(
        [sys.executable, "-c", "import os; print(os.getpid())"],
        capture_output=True, text=True)
    dead = osp.join(cache_dir, f"{name}.1.1.npy.tmp{probe.stdout.strip()}.npy")
    live = osp.join(cache_dir, f"{name}.2.2.npy.tmp{os.getpid()}.npy")
    for p in (dead, live):
        with open(p, "wb") as f:
            f.write(b"x")
    os.utime(path)  # invalidate -> next load takes the write path
    arr = np.asarray(_load_pt(path))
    np.testing.assert_array_equal(arr, parent)
    assert not osp.exists(dead), "dead-pid orphan must be reclaimed"
    assert osp.exists(live), "live-pid tmp must NOT be reclaimed"
    os.remove(live)


def test_npy_cache_opt_out(synthetic_root, monkeypatch):
    from diffusion_model_project_tpu.data.dataset import _load_pt

    monkeypatch.setenv("DIFFUSION_TPU_NPY_CACHE", "0")
    path = str(synthetic_root / "x" / "p.pt")
    arr = _load_pt(path)
    assert not isinstance(arr, np.memmap)
    import os.path as osp
    assert not osp.exists(osp.join(osp.dirname(path), ".npy_cache"))


def test_dataset_with_cache_matches_uncached(synthetic_root, monkeypatch):
    ds_cached = MicroFlowDataset(str(synthetic_root), use_3d=True)  # warm+use
    monkeypatch.setenv("DIFFUSION_TPU_NPY_CACHE", "0")
    ds_plain = MicroFlowDataset(str(synthetic_root), use_3d=True)
    for idx in (0, 5):
        a, b = ds_cached[idx], ds_plain[idx]
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_split_cli(tmp_path, capsys):
    """The reference's `python shared/data_split.py` CLI surface
    (data_split.py:401-512): --generate with x/domain.pt auto-detect,
    --paired-vae, --verify, and the --force guard."""
    from diffusion_model_project_tpu.data import split as split_mod

    x = tmp_path / "x"
    x.mkdir()
    # only shape[0] is read by the auto-detect (mmap'd); keep the payload tiny
    torch.save(torch.zeros(20, 1, 1, 1), x / "domain.pt")

    # generate with auto-detected N
    assert split_mod.main(["--dataset-dir", str(tmp_path), "--generate"]) == 0
    out = capsys.readouterr().out
    assert "Auto-detected 20 samples" in out
    written = json.loads((tmp_path / "splits.json").read_text())
    assert written["train"] == create_split(20)["train"]  # same membership

    # existing file is guarded; --force clobbers with the paired expansion
    assert split_mod.main(["--dataset-dir", str(tmp_path), "--generate"]) == 1
    assert split_mod.main(["--dataset-dir", str(tmp_path), "--generate",
                           "--force", "--paired-vae"]) == 0
    paired = json.loads((tmp_path / "splits.json").read_text())
    assert paired["metadata"]["type"] == "paired_vae"
    assert sorted(paired["train"]) == sorted(
        create_paired_split_for_vae(20)["train"])

    # verify mode prints the summary; missing file errors
    capsys.readouterr()
    assert split_mod.main(["--dataset-dir", str(tmp_path), "--verify"]) == 0
    assert "paired_vae" in capsys.readouterr().out
    assert split_mod.main(["--dataset-dir", str(tmp_path), "--verify",
                           "--output", "nope.json"]) == 1

    # neither --generate nor --verify -> help + nonzero
    assert split_mod.main(["--dataset-dir", str(tmp_path)]) == 1

    # explicit --num-samples bypasses auto-detect
    other = tmp_path / "no_data"
    other.mkdir()
    assert split_mod.main(["--dataset-dir", str(other), "--generate",
                           "--num-samples", "12", "--seed", "7"]) == 0
    s = json.loads((other / "splits.json").read_text())
    assert s["metadata"]["num_samples"] == 12 and s["metadata"]["seed"] == 7
