"""Loop-level full-scale training demo on one TPU chip.

Runs the COMPLETE reference workflow at the published scale (256**2 x 11,
VAE widths 128/256/512, latent 8, in-17/out-8 UNet) on synthetic smooth flow
fields: stage-1 3D VAE -> stage-2 dual-branch VAE -> latent-diffusion
training via the real CLIs, then prints each stage's loss trajectory from
the logs the trainers wrote. Everything runs through the same entry points a
user runs (train_3d_vae_only / train_2d_with_cross shims' trainers, root
train.py) — this is the loop-level complement to PERF.md's step-level
timings, demonstrating multi-epoch convergence, checkpointing, and the
stage-1 -> stage-2 -> diffusion hand-off on real hardware.

Synthetic data: divergence-reducing smoothed Gaussian velocity fields inside
a porous mask (structured enough for the VAE/diffusion losses to have signal;
the real dataset is Zenodo-gated in this environment).

Usage: python scripts/train_demo_full_scale.py [--work-dir DIR]
       [--samples 16] [--epochs-s1 3 --epochs-s2 2 --epochs-diff 8]
"""
import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset(root, n=16, s=11, hw=256, seed=0):
    import torch
    from scipy.ndimage import gaussian_filter

    x = osp.join(root, "x")
    os.makedirs(x, exist_ok=True)
    r = np.random.default_rng(seed)
    dom = (gaussian_filter(r.random((n, s, 1, hw, hw)), (0, 1, 0, 6, 6)) > 0.5
           ).astype(np.float32)
    dom[:, :, :, 0, 0] = 0.0
    u = gaussian_filter(r.standard_normal((n, s, 3, hw, hw)), (0, 1, 0, 8, 8))
    u = (u / (np.abs(u).max(axis=(1, 3, 4), keepdims=True) + 1e-9) * 2e-2
         ).astype(np.float32)
    u *= dom  # no-slip: flow only inside the pore space
    u2d = u.copy()
    u2d[:, :, 2] = 0.0
    torch.save(torch.from_numpy(dom), osp.join(x, "domain.pt"))
    torch.save(torch.from_numpy(u2d), osp.join(x, "U_2d.pt"))
    torch.save(torch.from_numpy(u), osp.join(x, "U.pt"))
    torch.save(torch.from_numpy(
        gaussian_filter(r.standard_normal((n, s, 1, hw, hw)), (0, 1, 0, 8, 8))
        .astype(np.float32)), osp.join(x, "p.pt"))
    torch.save(torch.from_numpy(np.full((n, 3), 5e-6, np.float32)),
               osp.join(x, "dxyz.pt"))
    from diffusion_model_project_tpu.data import get_loader
    get_loader(root, batch_size=2, use_3d=True, seed=2024)  # statistics.json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/train_demo")
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--epochs-s1", type=int, default=3)
    ap.add_argument("--epochs-s2", type=int, default=2)
    ap.add_argument("--epochs-diff", type=int, default=8)
    args = ap.parse_args(argv)

    w = args.work_dir
    data = osp.join(w, "data")
    s1, s2, dd = osp.join(w, "stage1"), osp.join(w, "stage2"), osp.join(w, "diff")
    for d in (data, s1, s2, dd):
        os.makedirs(d, exist_ok=True)

    if not osp.exists(osp.join(data, "statistics.json")):
        t0 = time.time()
        make_dataset(data, n=args.samples)
        print(f"[demo] dataset: {args.samples} samples 256^2x11 "
              f"({time.time()-t0:.0f}s)", flush=True)

    from diffusion_model_project_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from diffusion_model_project_tpu.training.train_vae_stage1 import main as s1_main
    from diffusion_model_project_tpu.training.train_vae_stage2 import main as s2_main
    import train as train_cli

    t0 = time.time()
    s1_main(["--dataset-dir", data, "--save-dir", s1,
             "--latent-channels", "8", "--batch-size", "1",
             "--num-epochs", str(args.epochs_s1), "--grad-accum", "10"])
    print(f"[demo] stage-1 done ({time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    s2_main(["--dataset-dir", data, "--stage1-checkpoint", s1,
             "--save-dir", s2, "--latent-channels", "8", "--batch-size", "1",
             "--num-epochs", str(args.epochs_s2), "--grad-accum", "5"])
    print(f"[demo] stage-2 done ({time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    train_cli.main([
        "--root-dir", data, "--save-dir", dd,
        "--in-channels", "17", "--out-channels", "8",
        "--features", "64", "128", "256", "512", "1024",
        "--attention", "3..2", "--batch-size", "2",
        "--num-epochs", str(args.epochs_diff),
        "--vae-encoder-path", s2, "--vae-decoder-path", s1,
        "--shuffle", "true",
    ])
    print(f"[demo] diffusion done ({time.time()-t0:.0f}s)", flush=True)

    out = {}
    log1 = json.load(open(osp.join(s1, "vae_log.json")))
    out["stage1_train_recons"] = log1["loss"]["recons_train"]
    out["stage1_val_recons"] = log1["loss"]["recons_val"]
    log2 = json.load(open(osp.join(s2, "vae_log.json")))
    out["stage2_train_recons2d"] = log2["loss"]["recons_2d_train"]
    out["stage2_train_align"] = log2["loss"]["align_train"]
    # newest run dir: re-running with the same --work-dir adds a second
    # timestamped folder, and listdir order is arbitrary
    run = max((d for d in os.listdir(dd)
               if osp.isdir(osp.join(dd, d))),
              key=lambda d: osp.getmtime(osp.join(dd, d)))
    log3 = json.load(open(osp.join(dd, run, "log.json")))
    out["diffusion_train_loss"] = log3["train_loss"]
    out["diffusion_val_loss"] = log3["val_loss"]
    print("[demo] RESULT " + json.dumps(out))
    return out


if __name__ == "__main__":
    main()
