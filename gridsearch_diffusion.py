#!/usr/bin/env python
"""Grid search over diffusion hyperparameters
(reference Diffusion_model/gridsearch_diffusion.py).

Same contract: a 16-combo grid (4 feature stacks x 4 learning rates, fixed
k=3, attention '3..2', dropout 0, time-emb 64), a dry-run forward pass before
each run (random 128x128x11 tensors, gridsearch_diffusion.py:197-229),
crash-safe incremental results.csv with resume-by-run-name, and top10.csv +
summary.txt reports via pandas.

TPU-native: each config is one jitted training program; on a multi-chip mesh
configs are trivially parallel (one per slice) — run several processes with
--grid-index to shard the grid.
"""
import argparse
import csv
import json
import os
import os.path as osp
import time

import numpy as np

FEATURE_STACKS = ([32, 64, 128, 256], [64, 128, 256, 512],
                  [32, 64, 128, 256, 512], [64, 128, 256, 512, 1024])

GRID = []
for features in FEATURE_STACKS:
    for lr in (1e-3, 5e-4, 1e-4, 5e-5):
        GRID.append({
            "features": features, "learning_rate": lr, "kernel_size": 3,
            "attention": "3..2", "dropout": 0.0, "time_embedding_dim": 64,
        })


def _fixed_cfg(features, learning_rate):
    return {"features": list(features), "learning_rate": float(learning_rate),
            "kernel_size": 3, "attention": "3..2", "dropout": 0.0,
            "time_embedding_dim": 64}


def run_name(cfg: dict) -> str:
    return f"f{len(cfg['features'])}-{cfg['features'][0]}_lr{cfg['learning_rate']:.0e}"


def dry_run_forward_pass(predictor, num_slices: int = 11, hw: int = 128) -> bool:
    """Smoke-test the full predictor forward on random tensors before training."""
    import jax
    import jax.numpy as jnp

    r = np.random.default_rng(0)
    img = jnp.asarray((r.random((1, num_slices, 1, hw, hw)) > 0.3).astype(np.float32))
    v2d = jnp.asarray(r.standard_normal((1, num_slices, 3, hw, hw)).astype(np.float32))
    u3d = jnp.asarray(r.standard_normal((1, num_slices, 3, hw, hw)).astype(np.float32))
    x_start = predictor.encode_target(u3d)
    eps_pred, noise, _, _ = predictor.forward(img, v2d, x_start, rng=jax.random.key(0))
    assert eps_pred.shape == noise.shape, (eps_pred.shape, noise.shape)
    return bool(jnp.isfinite(eps_pred).all())


def load_completed(results_csv: str) -> set:
    if not osp.exists(results_csv):
        return set()
    with open(results_csv) as f:
        return {row["run_name"] for row in csv.DictReader(f)}


def append_result(results_csv: str, row: dict) -> None:
    exists = osp.exists(results_csv)
    with open(results_csv, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(row))
        if not exists:
            writer.writeheader()
        writer.writerow(row)


def train_single_config(cfg, args, name: str = None) -> dict:
    from diffusion_model_project_tpu.utils.config import parser as train_parser
    from diffusion_model_project_tpu.training.train_diffusion import train
    from diffusion_model_project_tpu.data import get_loader

    name = name or run_name(cfg)
    argv = [
        "--root-dir", args.root_dir,
        "--save-dir", osp.join(args.save_dir, name),
        "--name", name,
        "--in-channels", str(args.in_channels),
        "--out-channels", str(args.out_channels),
        "--features", *[str(f) for f in cfg["features"]],
        "--kernel-size", str(cfg["kernel_size"]),
        "--attention", cfg["attention"],
        "--dropout", str(cfg["dropout"]),
        "--learning-rate", str(cfg["learning_rate"]),
        "--batch-size", str(args.batch_size),
        "--num-epochs", str(args.epochs),
        "--num-slices", str(args.num_slices),
        "--num-timesteps", str(args.num_timesteps),
        "--padding-mode", "zeros",
        "--shuffle", "true",
    ]
    if args.vae_encoder_path:
        argv += ["--vae-encoder-path", args.vae_encoder_path]
    if args.vae_decoder_path:
        argv += ["--vae-decoder-path", args.vae_decoder_path]
    if args.vae_path:
        argv += ["--vae-path", args.vae_path]
    if args.device:
        argv += ["--device", args.device]
    targs = train_parser.parse_args(argv)

    # dry-run smoke test before committing to the full run
    from diffusion_model_project_tpu.training.helper import set_model
    from diffusion_model_project_tpu.utils.config import process_args
    pdict = process_args(targs)
    predictor = set_model("latent-diffusion", pdict["training"]["predictor"],
                          osp.join(args.root_dir, "statistics.json"),
                          image_hw=(128, 128))
    assert dry_run_forward_pass(predictor, num_slices=args.num_slices), \
        "dry-run forward produced non-finite outputs"

    # an interrupted attempt of THIS config left a run dir: resume it
    # full-state instead of retraining (results.csv already skips COMPLETE
    # configs; this closes the mid-run gap the same way CV/optimize do)
    from diffusion_model_project_tpu.training.train_diffusion import (
        find_resumable_run)
    targs.resume, _ = find_resumable_run(
        osp.join(args.save_dir, name, "*"))
    if targs.resume:
        print(f"[resume] {name} from {targs.resume}")

    train_loader, val_loader, test_loader = get_loader(
        root_dir=args.root_dir, batch_size=args.batch_size, shuffle=True,
        use_3d=True)[0]
    t0 = time.time()
    train_loss, val_loss = train(targs, train_loader, val_loader, test_loader)
    return {
        "run_name": name,
        "features": json.dumps(cfg["features"]),
        "learning_rate": cfg["learning_rate"],
        "train_loss": train_loss,
        "val_loss": val_loss,
        "wall_time_s": round(time.time() - t0, 1),
    }


def create_top10_report(results_csv: str, save_dir: str) -> None:
    import pandas as pd

    df = pd.read_csv(results_csv)
    df = df.sort_values("val_loss")
    df.head(10).to_csv(osp.join(save_dir, "top10.csv"), index=False)
    with open(osp.join(save_dir, "summary.txt"), "w") as f:
        f.write(f"Grid search: {len(df)} completed runs\n\n")
        f.write("Top 10 by validation loss:\n")
        f.write(df.head(10).to_string(index=False))
        f.write("\n\nBest config:\n")
        best = df.iloc[0]
        f.write(f"  run: {best['run_name']}\n  features: {best['features']}\n")
        f.write(f"  lr: {best['learning_rate']}\n  val_loss: {best['val_loss']}\n")
    print(f"Reports written to {save_dir}/top10.csv and summary.txt")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--root-dir", type=str, required=True)
    parser.add_argument("--save-dir", type=str, default="gridsearch_results")
    parser.add_argument("--in-channels", type=int, default=17)
    parser.add_argument("--out-channels", type=int, default=8)
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--num-slices", type=int, default=11)
    parser.add_argument("--num-timesteps", type=int, default=1000)
    parser.add_argument("--vae-path", type=str, default=None)
    parser.add_argument("--vae-encoder-path", type=str, default=None)
    parser.add_argument("--vae-decoder-path", type=str, default=None)
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--grid-index", type=int, default=None,
                        help="Run only this grid entry (for sharding across hosts)")
    parser.add_argument("--algo", choices=("grid", "tpe"), default="grid",
                        help="grid = the reference's 16-combo sweep; tpe = "
                             "TPE (training/tpe.py) over the same (feature-"
                             "stack, log-lr) space under the same results.csv "
                             "resume contract (VERDICT r3 item 7)")
    parser.add_argument("--n-trials", type=int, default=16,
                        help="TPE trial budget (--algo tpe; default = the "
                             "grid's combo count)")
    parser.add_argument("--tpe-seed", type=int, default=2024)
    args = parser.parse_args(argv)
    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)
    from diffusion_model_project_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    os.makedirs(args.save_dir, exist_ok=True)
    results_csv = osp.join(args.save_dir, "results.csv")
    completed = load_completed(results_csv)

    if args.algo == "tpe":
        if args.grid_index is not None:
            # TPE is sequential (trial t's draw conditions on trials < t);
            # silently ignoring the sharding flag would duplicate work
            # across hosts
            raise SystemExit(
                "--grid-index shards the GRID; --algo tpe is sequential "
                "(each trial conditions on the previous ones) and cannot "
                "be index-sharded — drop one of the flags")
        run_tpe_search(args, results_csv)
        create_top10_report(results_csv, args.save_dir)
        return

    print(f"Grid: {len(GRID)} configs; {len(completed)} already completed (resume)")

    grid = GRID if args.grid_index is None else [GRID[args.grid_index]]
    for cfg in grid:
        name = run_name(cfg)
        if name in completed:
            print(f"[skip] {name} (already in results.csv)")
            continue
        print(f"[run ] {name}")
        row = train_single_config(cfg, args)
        append_result(results_csv, row)

    create_top10_report(results_csv, args.save_dir)


def _completed_values(results_csv: str) -> dict:
    if not osp.exists(results_csv):
        return {}
    with open(results_csv) as f:
        return {row["run_name"]: float(row["val_loss"])
                for row in csv.DictReader(f)}


def run_tpe_search(args, results_csv: str) -> None:
    """TPE over (feature-stack index, log-uniform lr) with crash-safe resume.

    Resume needs NO stored sampler state: suggest(t, history) is pure in
    (seed, trial, history) (training/tpe.py), so the loop REPLAYS trials
    0..t-1 — each draw re-derives the same params, its run name looks up the
    recorded val_loss in results.csv, and the first name missing from the
    ledger is the next trial to run. Identical redraws are asserted in
    tests/test_gridsearch.py. A mid-trial crash resumes full-state through
    the same find_resumable_run path as the grid."""
    from diffusion_model_project_tpu.training.tpe import Dim, TPESampler

    space = [
        Dim("fidx", 0, len(FEATURE_STACKS) - 1, integer=True),
        Dim("learning_rate", 5e-5, 1e-3, log=True),
    ]
    sampler = TPESampler(space, seed=args.tpe_seed,
                         n_startup_trials=max(2, args.n_trials // 3))
    values = _completed_values(results_csv)
    n_tpe = sum(1 for name in values if name.startswith("tpe"))
    print(f"TPE: {args.n_trials} trials; {n_tpe} tpe rows already in "
          f"the ledger (resume; {len(values) - n_tpe} non-tpe rows ignored)")

    history = []
    for t in range(args.n_trials):
        params = sampler.suggest(t, history)
        cfg = _fixed_cfg(FEATURE_STACKS[int(params["fidx"])],
                         params["learning_rate"])
        # the seed is part of the name: run_name renders lr at one
        # significant digit, so two DIFFERENT seeds' searches in one save
        # dir could otherwise collide (2.8e-4 and 3.2e-4 both 'lr3e-04')
        # and replay a stale val_loss into the new search's history
        # (round-4 advisor finding)
        name = f"tpe-s{args.tpe_seed}-{t:02d}-" + run_name(cfg)
        if name in values:
            print(f"[skip] {name} (already in results.csv)")
            history.append((params, values[name]))
            continue
        print(f"[run ] {name}")
        row = train_single_config(cfg, args, name=name)
        append_result(results_csv, row)
        history.append((params, float(row["val_loss"])))


if __name__ == "__main__":
    main()
