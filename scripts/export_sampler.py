"""Export a trained checkpoint's sampling pipeline as a serving artifact.

Ahead-of-time deployment (see utils/export.py): lowers the whole pipeline
(EDT -> conditioning encode -> fused DDIM scan -> decode -> denormalize ->
mask) to a self-contained StableHLO blob with the weights baked in. A serving
host needs only jax + the blob:

    from diffusion_model_project_tpu.utils.export import load_sampler_file
    sample = load_sampler_file("sampler_b8.stablehlo")
    velocity = sample(img, velocity_2d, noise)

Usage:
    python scripts/export_sampler.py --model-dir <run dir> --out sampler.stablehlo \
        [--batch 8] [--steps 50] [--size 256] [--slices 11] [--device cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True,
                    help="training run directory (log.json + model .pt/.msgpack)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--slices", type=int, default=11)
    ap.add_argument("--platforms", default="tpu,cpu",
                    help="comma-separated lowering platforms")
    ap.add_argument("--bake-weights", type=lambda s: s.lower() == "true",
                    default=False,
                    help="true: weights as StableHLO constants (small models; "
                         "compile chews the constants). false (default): "
                         "weights ship as module arguments in the same file — "
                         "compiles like the in-process pipeline")
    ap.add_argument("--sampler", default="ddim", choices=["ddim", "dpm"],
                    help="dpm = DPM-Solver++(2M): ~DDIM-50 quality in ~10 steps")
    ap.add_argument("--device", default=None, choices=[None, "cpu", "tpu"],
                    help="backend used for tracing (not the serving target)")
    args = ap.parse_args(argv)

    import jax
    if args.device:
        jax.config.update("jax_platforms", args.device)

    from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor
    from diffusion_model_project_tpu.utils.export import save_sampler

    pred = LatentDiffusionPredictor.from_directory(args.model_dir)
    save_sampler(
        args.out, pred, batch=args.batch, num_steps=args.steps,
        image_hw=(args.size, args.size), num_slices=args.slices,
        platforms=tuple(p.strip() for p in args.platforms.split(",") if p.strip()),
        bake_weights=args.bake_weights, sampler=args.sampler,
    )
    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes): "
          f"batch={args.batch} steps={args.steps} "
          f"{args.size}^2x{args.slices}, platforms={args.platforms}")


if __name__ == "__main__":
    main()
