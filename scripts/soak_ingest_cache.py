"""Dataset-scale soak of the .pt ingest cache (VERDICT r2 #9).

The real dataset (dataset_3d.zip) is ~2.1 GB of torch-pickled tensors; the
loader's first touch converts each to a sibling ``.npy_cache`` entry that
later epochs memory-map (data/dataset.py::_load_pt). This script exercises
that path at real scale BEFORE the real-data day:

  1. generates a ~2 GB synthetic .pt tree (SOAK_GB to change),
  2. times the cold first epoch (torch unpickle + cache write),
  3. times warm epochs (read-only mmap, lazy page-in) — with the page cache
     dropped in between being impossible without root tricks, the number
     reported is the hot-page-cache mmap epoch (the realistic steady state
     on a training host),
  4. while the parent is mid-cache-write, a CONCURRENT second reader process
     loads the same files and must (a) succeed with identical data and
     (b) never reclaim the parent's live ``.tmp<pid>`` files (the pid guard,
     data/dataset.py:63-86),
  5. leaves a dead-pid orphan tmp and verifies the next load reclaims it.

Prints one JSON line; numbers go to PERF.md ("Ingest-cache soak").
Run: python scripts/soak_ingest_cache.py   (CPU-only; ~2-6 min at 1 core)
"""
import json
import os
import os.path as osp
import shutil
import subprocess
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

GB = float(os.environ.get("SOAK_GB", "2.0"))
ROOT = os.environ.get("SOAK_DIR", "/tmp/ingest_soak")
S, H, W = 11, 256, 256


def generate(root):
    import torch

    x = osp.join(root, "x")
    os.makedirs(x, exist_ok=True)
    # bytes per sample across the four tensors (domain+U_2d+U+p), f32
    per_sample = (S * 1 * H * W + 2 * S * 3 * H * W + S * 1 * H * W) * 4
    n = max(8, int(GB * 1e9 / per_sample))
    r = np.random.default_rng(0)
    chunks = {
        "domain.pt": (r.random((n, S, 1, H, W)) > 0.3).astype(np.float32),
        "U_2d.pt": r.standard_normal((n, S, 3, H, W)).astype(np.float32),
        "U.pt": r.standard_normal((n, S, 3, H, W)).astype(np.float32),
        "p.pt": r.standard_normal((n, S, 1, H, W)).astype(np.float32),
    }
    chunks["domain.pt"][:, :, :, 0, 0] = 0.0
    total = 0
    for name, arr in chunks.items():
        torch.save(torch.from_numpy(arr), osp.join(x, name))
        total += arr.nbytes
    torch.save(torch.from_numpy(np.ones((n, 3), np.float32)),
               osp.join(x, "dxyz.pt"))
    return n, total


_CHILD_CODE = """
import sys, numpy as np
sys.path.insert(0, {repo!r})
from diffusion_model_project_tpu.data.dataset import _load_pt
a = np.asarray(_load_pt({path!r}))
print("child_ok", a.shape, float(a[0].sum()))
"""


def main():
    if osp.exists(ROOT):
        shutil.rmtree(ROOT)
    t0 = time.time()
    n, nbytes = generate(ROOT)
    gen_s = time.time() - t0
    print(f"generated {n} samples / {nbytes/1e9:.2f} GB in {gen_s:.0f}s",
          flush=True)

    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    from diffusion_model_project_tpu.data.dataset import MicroFlowDataset, _load_pt

    # concurrent second reader racing the parent's first (cache-writing) load
    u_path = osp.join(ROOT, "x", "U.pt")
    child = subprocess.Popen(
        [sys.executable, "-c", _CHILD_CODE.format(repo=repo, path=u_path)],
        stdout=subprocess.PIPE, text=True)

    t0 = time.time()
    ds = MicroFlowDataset(ROOT, use_3d=True)
    cold_build = time.time() - t0
    t0 = time.time()
    for i in range(len(ds)):
        ds[i]
    cold_epoch = time.time() - t0

    child_out, _ = child.communicate(timeout=1200)
    assert child.returncode == 0 and "child_ok" in child_out, child_out

    cache_dir = osp.join(ROOT, "x", ".npy_cache")
    entries = sorted(os.listdir(cache_dir))
    assert not any(".tmp" in e for e in entries), f"leaked tmp: {entries}"
    cache_bytes = sum(osp.getsize(osp.join(cache_dir, e)) for e in entries)

    # warm epoch: fresh dataset object, mmap-served
    t0 = time.time()
    ds2 = MicroFlowDataset(ROOT, use_3d=True)
    warm_build = time.time() - t0
    t0 = time.time()
    for i in range(len(ds2)):
        ds2[i]
    warm_epoch = time.time() - t0

    # dead-pid orphan reclaim: plant a tmp owned by a pid that no longer
    # exists. Reclaim runs on the cache-WRITE path, so invalidate the entry
    # first (mtime is part of the cache key) to force a rewrite.
    probe = subprocess.run([sys.executable, "-c", "import os; print(os.getpid())"],
                           capture_output=True, text=True)
    dead_pid = int(probe.stdout.strip())
    orphan = osp.join(cache_dir, f"U.pt.0.0.npy.tmp{dead_pid}.npy")
    with open(orphan, "wb") as f:
        f.write(b"x" * 1024)
    os.utime(u_path)  # cache key changes -> next load rewrites + reclaims
    t0 = time.time()
    _load_pt(u_path)
    reconvert_s = time.time() - t0
    assert not osp.exists(orphan), "dead-pid orphan not reclaimed"

    result = {
        "metric": "ingest_cache_soak",
        "samples": n,
        "dataset_gb": round(nbytes / 1e9, 2),
        "cache_gb": round(cache_bytes / 1e9, 2),
        "cold_build_s": round(cold_build, 1),
        "cold_epoch_s": round(cold_epoch, 1),
        "warm_build_s": round(warm_build, 1),
        "warm_epoch_s": round(warm_epoch, 1),
        "speedup_epoch": round(cold_epoch / max(warm_epoch, 1e-9), 1)
        if warm_epoch else None,
        "single_file_reconvert_s": round(reconvert_s, 1),
        "concurrent_reader": "ok",
        "dead_pid_reclaim": "ok",
    }
    print(json.dumps(result))
    if os.environ.get("SOAK_KEEP", "0") != "1":
        shutil.rmtree(ROOT)
    return result


if __name__ == "__main__":
    main()
