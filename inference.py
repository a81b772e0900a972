#!/usr/bin/env python
"""End-to-end inference CLI (reference Inference/inference.py).

Loads a trained diffusion run dir (log.json + weights), picks a sample from
the test split (or a user file), runs the full DDPM/DDIM 2D->3D prediction,
and writes a matplotlib comparison PNG (napari 3D viewing is optional and
gated on availability, as in the reference).
"""
import argparse
import json
import os.path as osp
import sys

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-dir", type=str, required=True,
                        help="Trained diffusion run directory (log.json + weights)")
    parser.add_argument("--root-dir", type=str, default=None,
                        help="Dataset dir (default: from log.json)")
    parser.add_argument("--vae-path", type=str, default=None)
    parser.add_argument("--vae-encoder-path", type=str, default=None)
    parser.add_argument("--vae-decoder-path", type=str, default=None)
    parser.add_argument("--index", type=int, default=0,
                        help="Test-split sample index")
    parser.add_argument("--input-file", type=str, default=None,
                        help="Optional .pt/.npz file with microstructure + velocity_input")
    parser.add_argument("--sampler", type=str, default="ddpm",
                        choices=["ddpm", "ddim", "dpm"])
    parser.add_argument("--steps", type=int, default=50, help="DDIM steps")
    parser.add_argument("--seed", type=int, default=2024)
    parser.add_argument("--output", type=str, default=None,
                        help="Output PNG path (default: <model-dir>/prediction_<idx>.png)")
    parser.add_argument("--napari", action="store_true",
                        help="Open interactive napari 3D viewer if installed")
    parser.add_argument("--slice", dest="slice_idx", type=int, default=None,
                        help="z-slice to plot (default: middle)")
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--use-ema", action="store_true",
                        help="Prefer ema_model.msgpack (train.py --ema-decay)")
    return parser.parse_args(argv)


def load_sample(args, params):
    if args.input_file:
        if args.input_file.endswith(".npz"):
            data = dict(np.load(args.input_file))
        else:
            import torch
            raw = torch.load(args.input_file, map_location="cpu", weights_only=False)
            data = {k: np.asarray(v) for k, v in raw.items()}
        img = data["microstructure"].astype(np.float32)
        v2d = data["velocity_input"].astype(np.float32)
        target = data.get("velocity")
        return img[None], v2d[None], None if target is None else target[None].astype(np.float32)

    from diffusion_model_project_tpu.data import get_loader

    root_dir = args.root_dir or params["dataset"]["root_dir"]
    _, _, test_loader = get_loader(root_dir=root_dir, batch_size=1,
                                   use_3d=True, seed=args.seed)[0]
    data = test_loader.dataset[args.index]
    return (data["microstructure"][None], data["velocity_input"][None],
            data["velocity"][None])


def plot_comparison(prediction, target, img, out_path, slice_idx=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    s = prediction.shape[1]
    k = slice_idx if slice_idx is not None else s // 2
    names = ["vx", "vy", "vz"]
    rows = 3 if target is not None else 2
    fig, axes = plt.subplots(rows, 3, figsize=(12, 3.5 * rows))
    for c in range(3):
        vmax = np.abs(prediction[0, k, c]).max() or 1.0
        axes[0, c].imshow(prediction[0, k, c], cmap="RdBu_r", vmin=-vmax, vmax=vmax)
        axes[0, c].set_title(f"pred {names[c]} (slice {k})")
        if target is not None:
            tmax = np.abs(target[0, k, c]).max() or 1.0
            axes[1, c].imshow(target[0, k, c], cmap="RdBu_r", vmin=-tmax, vmax=tmax)
            axes[1, c].set_title(f"target {names[c]}")
            err = np.abs(prediction[0, k, c] - target[0, k, c])
            axes[2, c].imshow(err, cmap="magma")
            axes[2, c].set_title(f"|error| {names[c]}")
        else:
            axes[1, c].imshow(img[0, k, 0], cmap="gray")
            axes[1, c].set_title("microstructure")
    for ax in axes.ravel():
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print(f"Wrote {out_path}")


def show_napari(prediction, img):
    try:
        import napari
    except ImportError:
        print("napari not installed; skipping 3D viewer")
        return
    mag = np.linalg.norm(prediction[0], axis=1)
    p99 = np.percentile(np.abs(mag), 99) or 1.0
    viewer = napari.Viewer()
    viewer.add_image(mag / p99, name="velocity magnitude", scale=(50.0, 5.0, 5.0))
    viewer.add_image(img[0, :, 0], name="microstructure", scale=(50.0, 5.0, 5.0))
    napari.run()


def main(argv=None):
    args = parse_args(argv)
    if bool(args.vae_encoder_path) != bool(args.vae_decoder_path):
        raise SystemExit(
            "--vae-encoder-path and --vae-decoder-path must be given "
            "together (one alone would be silently ignored and the model "
            "dir's logged VAE paths used instead)")
    import jax
    import jax.numpy as jnp
    if args.device:
        jax.config.update("jax_platforms", args.device)
    from diffusion_model_project_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from diffusion_model_project_tpu.utils.checkpoint import predictor_from_directory

    with open(osp.join(args.model_dir, "log.json")) as f:
        params = json.load(f)["params"]
    overrides = None
    if args.vae_path or (args.vae_encoder_path and args.vae_decoder_path):
        overrides = {"vae_path": args.vae_path,
                     "vae_encoder_path": args.vae_encoder_path,
                     "vae_decoder_path": args.vae_decoder_path}

    img, v2d, target = load_sample(args, params)
    image_hw = tuple(img.shape[-2:])
    predictor, _ = predictor_from_directory(
        args.model_dir, image_hw=image_hw, vae_path_overrides=overrides,
        use_ema=args.use_ema)

    img_j, v2d_j = jnp.asarray(img), jnp.asarray(v2d)
    rng = jax.random.key(args.seed + args.index)
    if args.sampler == "ddim":
        fn = jax.jit(lambda p, i, v, k: p.predict_ddim(i, v, num_steps=args.steps,
                                                       eta=0.0, rng=k))
    elif args.sampler == "dpm":
        fn = jax.jit(lambda p, i, v, k: p.predict_dpm(i, v, num_steps=args.steps,
                                                      rng=k))
    else:
        fn = jax.jit(lambda p, i, v, k: p.predict(i, v, rng=k))
    prediction = np.asarray(jax.block_until_ready(fn(predictor, img_j, v2d_j, rng)))

    out_path = args.output or osp.join(args.model_dir, f"prediction_{args.index}.png")
    plot_comparison(prediction, target, img, out_path, args.slice_idx)
    if args.napari:
        show_napari(prediction, img)


if __name__ == "__main__":
    main(sys.argv[1:])
