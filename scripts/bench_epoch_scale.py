"""Epoch-scale wall-clock accounting for all three trainers (VERDICT r3
weak #5 / item 3): proves what a real epoch costs at the 2 GB dataset scale
(96 x 256^2 x 11 volumes) and decomposes wall into device compute, tunnel
transfer, and host slack.

Inputs are the logs a full-scale training run wrote (stage-1/stage-2
vae_log.json now carry per-epoch `epoch_time`; diffusion log.json has the
reference `time` series) plus the regenerable on-device step times
(BENCH_MATRIX, bench.py BENCH_MODE=train*). The cached-latents diffusion row
is the control: with zero per-epoch host->device bytes its wall collapses to
~steps x step-time, which isolates the transfer term the regular rows pay.

Decomposition per row (assumptions are printed into the artifact):
  device_lower_bound_s = train_steps * grad_step_ms   (val/eval excluded —
      the eval step is a forward-only subset of the grad step)
  transfer_estimate_s  = epoch_upload_MB / h2d_MBps   (regular rows only)
  residual_s           = wall_median - device_lower_bound - transfer_estimate
      (loader, dispatch latency, val steps, async-checkpoint interference)

Usage:
  python scripts/bench_epoch_scale.py --stage1-dir D1 --stage2-dir D2
      --diffusion-run-dir D3 [--diffusion-cached-run-dir D4]
      [--n-train 67 --n-val 14] [--h2d-mbps 33]
      [--step-ms-diffusion 295.6 --step-ms-vae1 205 --step-ms-vae2 208]
      [--out BENCH_EPOCH_r04.json]
"""
import argparse
import json
import os.path as osp
import sys

import numpy as np

BYTES_PER_VOXEL = 4
VOXELS = 11 * 256 * 256


def _epoch_walls(times, drop=2):
    """Median post-compile epoch wall. The first `drop` epochs carry
    compiles and are excluded when the log is long enough; for short logs
    (<= drop+2 epochs) every epoch is kept and the row records
    warmup_epochs_dropped=0 so the artifact never claims a drop it did not
    perform (round-4 review finding)."""
    t = np.asarray(times, dtype=float)
    dropped = drop if len(t) > drop + 2 else 0
    t = t[dropped:]
    return float(np.median(t)), len(t), dropped


def row(name, walls, n_epochs, train_steps, step_ms, upload_mb, h2d_mbps):
    wall, n_used, dropped = walls
    device = train_steps * step_ms / 1e3
    transfer = upload_mb / h2d_mbps if upload_mb else 0.0
    return {
        "row": name,
        "epoch_wall_s_median": round(wall, 1),
        "epochs_measured": n_used,
        "warmup_epochs_dropped": dropped,
        "epochs_total": n_epochs,
        "train_steps_per_epoch": train_steps,
        "grad_step_ms": step_ms,
        "device_lower_bound_s": round(device, 1),
        "epoch_upload_MB": round(upload_mb, 0),
        "transfer_estimate_s": round(transfer, 1),
        "residual_s": round(wall - device - transfer, 1),
        "wall_over_device": round(wall / device, 2) if device else None,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage1-dir", required=True)
    ap.add_argument("--stage2-dir", required=True)
    ap.add_argument("--diffusion-run-dir", default=None,
                    help="regular (per-batch re-encode) diffusion run")
    ap.add_argument("--diffusion-cached-run-dir", default=None,
                    help="--cache-latents diffusion run (the zero-upload "
                         "control row)")
    ap.add_argument("--n-train", type=int, default=67)
    ap.add_argument("--n-val", type=int, default=14)
    ap.add_argument("--batch-diffusion", type=int, default=2)
    ap.add_argument("--h2d-mbps", type=float, required=True,
                    help="measured tunnel h2d bandwidth at run time "
                         "(scripts/perf_serve_latency.py probe)")
    ap.add_argument("--step-ms-diffusion", type=float, default=295.6)
    ap.add_argument("--step-ms-diffusion-cached", type=float, default=None,
                    help="cached-latent UNet-only step ms (defaults to the "
                         "regular step minus nothing — pass the measured "
                         "value for an honest cached device bound)")
    ap.add_argument("--step-ms-vae1", type=float, default=205.0)
    ap.add_argument("--step-ms-vae2", type=float, default=208.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--what", default=None)
    args = ap.parse_args(argv)

    rows = []

    # stage-1: B=1 -> n_train grad steps; upload = (3+1) ch volumes
    with open(osp.join(args.stage1_dir, "vae_log.json")) as f:
        log1 = json.load(f)
    if log1.get("epoch_time"):
        mb = (args.n_train + args.n_val) * 4 * VOXELS * BYTES_PER_VOXEL / 2**20
        rows.append(row("epoch_vae1", _epoch_walls(log1["epoch_time"]),
                        len(log1["epoch_time"]), args.n_train,
                        args.step_ms_vae1, mb, args.h2d_mbps))

    # stage-2: B=1 pairs -> n_train grad steps; upload = 2d+3d+2 masks = 8 ch
    with open(osp.join(args.stage2_dir, "vae_log.json")) as f:
        log2 = json.load(f)
    if log2.get("epoch_time"):
        mb = (args.n_train + args.n_val) * 8 * VOXELS * BYTES_PER_VOXEL / 2**20
        rows.append(row("epoch_vae2", _epoch_walls(log2["epoch_time"]),
                        len(log2["epoch_time"]), args.n_train,
                        args.step_ms_vae2, mb, args.h2d_mbps))

    def diffusion_row(run_dir, name, step_ms, upload):
        with open(osp.join(run_dir, "log.json")) as f:
            log = json.load(f)
        steps = int(np.ceil(args.n_train / args.batch_diffusion))
        mb = ((args.n_train + args.n_val) * 7 * VOXELS * BYTES_PER_VOXEL
              / 2**20) if upload else 0.0
        rows.append(row(name, _epoch_walls(log["time"]), len(log["time"]),
                        steps, step_ms, mb, args.h2d_mbps))

    if args.diffusion_run_dir:
        diffusion_row(args.diffusion_run_dir, "epoch_diffusion",
                      args.step_ms_diffusion, upload=True)
    if args.diffusion_cached_run_dir:
        diffusion_row(args.diffusion_cached_run_dir, "epoch_diffusion_cached",
                      args.step_ms_diffusion_cached or args.step_ms_diffusion,
                      upload=False)

    doc = {
        "what": args.what or (
            "epoch wall-clock vs on-device step time at the 2 GB scale "
            "(96 samples, 256^2x11): device lower bound = train_steps x "
            "grad_step_ms; transfer = uploads / measured tunnel h2d; "
            "residual = loader + dispatch + val steps + async-ckpt overlap. "
            "The cached-latents row uploads nothing per epoch — its "
            "wall/device ratio isolates what the tunnel costs the regular "
            "rows. On a co-located TPU-VM host the transfer term shrinks "
            "~100x (PERF.md bandwidth notes)."),
        "assumptions": [
            "first 2 epochs dropped (compile) when the log has >4 epochs — "
            "each row's warmup_epochs_dropped records what actually applied",
            "device bound counts grad steps only (val eval steps are a "
            "forward-only subset, inflating residual slightly)",
            f"h2d bandwidth {args.h2d_mbps} MB/s measured at run time, not "
            "a constant of the environment (known 10x drift)",
        ],
        "rows": rows,
    }
    out = args.out or osp.join(
        osp.dirname(osp.dirname(osp.abspath(__file__))),
        "BENCH_EPOCH_r04.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(rows, indent=1))
    print(f"wrote {out}")
    return doc


if __name__ == "__main__":
    main()
