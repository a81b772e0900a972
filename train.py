#!/usr/bin/env python
"""Diffusion training CLI — flag-compatible with the reference
Diffusion_model/train.py (modes train / CV / optimize).

Usage:
    python train.py \
        --root-dir path/to/dataset_3d \
        --vae-encoder-path trained/stage2 \
        --vae-decoder-path trained/stage1 \
        --in-channels 17 --out-channels 8 \
        --features 64 128 256 512 1024 --attention "3..2" \
        --batch-size 2 --num-epochs 100
"""
import sys

from diffusion_model_project_tpu.utils.config import parser
from diffusion_model_project_tpu.data import get_loader
from diffusion_model_project_tpu.training.train_diffusion import train, optimize


def main(argv=None):
    args = parser.parse_args(argv)
    if args.device:
        # the axon TPU plugin ignores JAX_PLATFORMS; select explicitly
        import jax
        jax.config.update("jax_platforms", args.device)
    from diffusion_model_project_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    # multi-host: must run before the backend initializes
    from diffusion_model_project_tpu.parallel import initialize_distributed
    if initialize_distributed(args.coordinator, args.num_processes,
                              args.process_id):
        import jax
        print(f"jax.distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} global devices")
    if args.debug_nans:
        from diffusion_model_project_tpu.utils.profiling import enable_nan_debugging
        enable_nan_debugging()

    def load(args):
        return get_loader(
            root_dir=args.root_dir, batch_size=args.batch_size,
            shuffle=args.shuffle, augment=args.augment,
            k_folds=None, use_3d=args.use_3d,
        )

    # SIGTERM/SIGINT (TPU-VM preemption, Ctrl-C) stops within one training
    # step, drains checkpoints, prints the --resume hint, and exits 0; a
    # second signal force-kills (diffusion_model_project_tpu/utils/preempt.py)
    from diffusion_model_project_tpu.utils.preempt import GracefulShutdown

    with GracefulShutdown() as shutdown:
        if args.mode == "train":
            train_loader, val_loader, test_loader = load(args)[0]
            train(args, train_loader, val_loader, test_loader,
                  should_stop=shutdown)
        elif args.mode == "CV":
            import os.path as osp

            from diffusion_model_project_tpu.training.train_diffusion import (
                find_resumable_run)
            from diffusion_model_project_tpu.utils.config import (
                process_args, run_descr)

            folds = get_loader(
                root_dir=args.root_dir, batch_size=args.batch_size,
                shuffle=args.shuffle, augment=args.augment,
                k_folds=args.k_folds, use_3d=args.use_3d,
            )
            for i, (train_loader, val_loader, test_loader) in enumerate(folds):
                if shutdown.requested:
                    print(f"CV preempted after fold {i}/{args.k_folds}")
                    break
                name = f"kfold-{i + 1}.{args.k_folds}"
                args.name = name
                # crash-safe CV (mirrors grid search's results.csv resume):
                # a fold whose run dir is complete is skipped; an interrupted
                # fold resumes full-state; only untouched folds train from
                # scratch. The match key includes every hyperparameter in the
                # dirname (minus the extendable epoch budget) so a CV re-run
                # with a changed config never skips into — or restores
                # mismatched weights from — another config's folds.
                descr = run_descr(process_args(args), with_epochs=False)
                pattern = osp.join(args.save_dir, f"*_{name}_*{descr}*")
                args.resume = None
                # completeness by log alone (a finished run may predate — or
                # have deleted — its train_state.msgpack). A fold is only
                # complete once its TEST loss landed too: a kill between the
                # last epoch's checkpoints and the test evaluation leaves all
                # epochs logged but no test_loss, and skipping then would
                # lose the metric CV exists to produce — resume instead
                # (zero epochs retrain; the test eval re-runs and lands).
                import json as _json
                done_dir, done = find_resumable_run(pattern,
                                                    require_state=False)
                if done_dir and done >= args.num_epochs:
                    with open(osp.join(done_dir, "log.json")) as f:
                        has_test = "test_loss" in _json.load(f)
                    if has_test:
                        print(f"Fold {i + 1}/{args.k_folds} already complete "
                              f"({done} epochs) in {done_dir}; skipping")
                        continue
                run_dir, _ = find_resumable_run(pattern)  # state required
                if run_dir:
                    print(f"Fold {i + 1}/{args.k_folds} resuming "
                          f"from {run_dir}")
                    args.resume = run_dir
                print(f"Cross-Validation [{i + 1}/{args.k_folds}]")
                train(args, train_loader, val_loader, test_loader,
                      should_stop=shutdown)
        elif args.mode == "optimize":
            optimize(args, load, should_stop=shutdown)


if __name__ == "__main__":
    main(sys.argv[1:])
