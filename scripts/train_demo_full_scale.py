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

Synthetic data (v2, round 4): smoothed Gaussian in-plane velocities inside a
porous mask with **vz derived from continuity** (dvz/dz = -(dvx/dx + dvy/dy),
integrated over the slice axis) — the same physical coupling the real resin-
flow dataset has (reference README.md:3-7). This matters for evaluation: the
2D input U_2d carries all 11 slices of (vx, vy), so a converged model can in
principle recover vz too, giving the end-to-end cosine metric a ceiling near
1.0 instead of the ~sqrt(2/3) ceiling of the v1 generator whose vz was
independent noise (see VERDICT.md r3 weak #1). The v1 behavior is NOT kept;
TRAIN_DEMO_r03.json documents the v1 trajectories.

Usage: python scripts/train_demo_full_scale.py [--work-dir DIR]
       [--samples 16] [--epochs-s1 3 --epochs-s2 2 --epochs-diff 8]
       [--lr-s1 1e-4] [--lr-s2 5e-5] [--lr-diff 1e-4]
       [--lambda-align 0.1] [--lambda-cross 1.0]
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
    uxy = gaussian_filter(r.standard_normal((n, s, 2, hw, hw)), (0, 1, 0, 8, 8))
    uxy *= dom  # no-slip first, so vz below is a function of the MASKED field
    # vz from continuity: dvz/dz = -(dvx/dx + dvy/dy), vz=0 at the first
    # slice, unit grid spacing (dxyz is isotropic 5e-6). Computed from the
    # already-masked in-plane field — exactly what the 2D input carries — so
    # the 2D->3D task is learnable end-to-end (cosine ceiling ~1.0, not the
    # ~sqrt(2/3) of the v1 generator whose vz was independent noise).
    div_xy = (np.gradient(uxy[:, :, 0], axis=3)
              + np.gradient(uxy[:, :, 1], axis=2))
    uz = -np.cumsum(div_xy, axis=1)[:, :, None]
    u = np.concatenate([uxy, uz], axis=2)
    u = (u / (np.abs(u).max(axis=(1, 3, 4), keepdims=True) + 1e-9) * 2e-2
         ).astype(np.float32)
    u *= dom  # re-mask: vz is zeroed in the solid like every component
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
    # converged-run knobs (VERDICT r3 item 1): trainer defaults unchanged;
    # the published diffusion model used lr 1e-3 (zenodo.py:19 dirname) and
    # the README stage-2 recipe is lambda_align=5, lambda_cross=50
    # (reference README.md:186-189)
    ap.add_argument("--lr-s1", type=float, default=1e-4)
    ap.add_argument("--lr-s2", type=float, default=5e-5)
    ap.add_argument("--lr-diff", type=float, default=1e-4)
    ap.add_argument("--lambda-align", type=float, default=0.1)
    ap.add_argument("--lambda-cross", type=float, default=1.0)
    # accum 10/5 mirrors the reference's GPU-memory-driven recipe; smaller
    # values give more optimizer updates per epoch for converged-run speed
    ap.add_argument("--accum-s1", type=int, default=10)
    ap.add_argument("--accum-s2", type=int, default=5)
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
             "--learning-rate", str(args.lr_s1),
             "--num-epochs", str(args.epochs_s1),
             "--grad-accum", str(args.accum_s1)])
    print(f"[demo] stage-1 done ({time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    s2_main(["--dataset-dir", data, "--stage1-checkpoint", s1,
             "--save-dir", s2, "--latent-channels", "8", "--batch-size", "1",
             "--learning-rate", str(args.lr_s2),
             "--lambda-align", str(args.lambda_align),
             "--lambda-cross", str(args.lambda_cross),
             "--num-epochs", str(args.epochs_s2),
             "--grad-accum", str(args.accum_s2)])
    print(f"[demo] stage-2 done ({time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    train_cli.main([
        "--root-dir", data, "--save-dir", dd,
        "--in-channels", "17", "--out-channels", "8",
        "--features", "64", "128", "256", "512", "1024",
        "--attention", "3..2", "--batch-size", "2",
        "--learning-rate", str(args.lr_diff),
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
