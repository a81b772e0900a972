#!/usr/bin/env python
"""VAE inference / visualization CLI (reference VAE_model/inference_vae.py).

Loads a VAE checkpoint (native msgpack or reference .pt, with model-type
auto-detection from state-dict prefixes), runs encode/decode in one of three
modes — '2d' (E2D->D2D), '3d' (E3D->D3D), 'cross' (E2D->D3D) — computes
masked per-component MAE metrics, and writes visualization panels:
original/reconstruction/error triptychs, latent-channel grids, and
w-component depth strips.
"""
import argparse
import json
import os.path as osp
import sys

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="VAE inference and visualization")
    parser.add_argument("--vae-path", type=str, required=True,
                        help="Checkpoint dir (native msgpack or reference .pt)")
    parser.add_argument("--dataset-dir", type=str, required=True)
    parser.add_argument("--mode", type=str, default="3d", choices=["2d", "3d", "cross"])
    parser.add_argument("--index", type=int, default=0,
                        help="Microstructure index")
    parser.add_argument("--latent-channels", type=int, default=None,
                        help="Override latent channels (default from vae_log.json)")
    parser.add_argument("--output-dir", type=str, default=None,
                        help="Where to write PNGs (default: vae-path)")
    parser.add_argument("--slice", dest="slice_idx", type=int, default=None)
    parser.add_argument("--device", type=str, default=None)
    return parser.parse_args(argv)


def detect_model_type(vae_path: str) -> str:
    """Auto-detect checkpoint flavor (reference inference_vae.py:128-175)."""
    from diffusion_model_project_tpu.utils import torch_import as ti
    from diffusion_model_project_tpu.utils.checkpoint import _load_native_branches

    native = _load_native_branches(vae_path)
    if native is not None:
        has_2d = "encoder_2d" in native
        has_3d = "encoder_3d" in native
        if has_2d and has_3d:
            return "dual_full"
        if has_3d:
            return "dual_stage1_3d_only"
        return "dual_stage2"
    sd = ti.load_torch_state_dict(ti.find_model_file(vae_path))
    return {
        "dual_full": "dual_full", "dual_stage1_3d": "dual_stage1_3d_only",
        "dual_stage2_2d": "dual_stage2", "standard": "standard", None: "unknown",
    }[ti.detect_vae_checkpoint_type(sd)]


def load_vae(vae_path: str, latent_channels=None):
    from diffusion_model_project_tpu.models.vae import DualBranchVAE
    from diffusion_model_project_tpu.utils.checkpoint import load_dual_vae_from_paths

    log_path = osp.join(vae_path, "vae_log.json")
    if latent_channels is None and osp.exists(log_path):
        with open(log_path) as f:
            latent_channels = json.load(f).get("latent_channels", 8)
    latent_channels = latent_channels or 8
    params, norm_factors, flavor = load_dual_vae_from_paths(vae_path=vae_path)
    from diffusion_model_project_tpu.models.vae import features_from_decoder_params
    vae = DualBranchVAE(latent_channels=latent_channels,
                        # conditional standard checkpoints (FiLM) bake the
                        # reference's per-branch condition constants — see
                        # DualBranchVAE.conditional
                        conditional=(flavor == "standard_conditional"),
                        features=features_from_decoder_params(params["decoder_3d"]))
    return vae, params, norm_factors, flavor


def encode_decode(vae, params, mode, v2d_cl, v3d_cl):
    """Dispatch (reference inference_vae.py:518-561). Inputs channels-last
    (B, D, H, W, 3); returns (recon, mu, source)."""
    if mode == "2d":
        mu, _ = vae.apply({"params": params}, v2d_cl, method="encode_2d_deterministic")
        recon = vae.apply({"params": params}, mu, method="decode_2d")
        return recon, mu, v2d_cl
    if mode == "3d":
        mu, _ = vae.apply({"params": params}, v3d_cl, method="encode_3d_deterministic")
        recon = vae.apply({"params": params}, mu, method="decode_3d")
        return recon, mu, v3d_cl
    if mode == "cross":
        mu, _ = vae.apply({"params": params}, v2d_cl, method="encode_2d_deterministic")
        recon = vae.apply({"params": params}, mu, method="decode_3d")
        return recon, mu, v3d_cl
    raise ValueError(mode)


def masked_mae_per_component(recon, target, mask):
    """Fluid-masked per-component MAE (reference inference_vae.py:472-515)."""
    out = {}
    m = mask[..., 0]
    n = m.sum() + 1e-8
    for c, name in enumerate("uvw"):
        out[f"mae_{name}"] = float((np.abs(recon[..., c] - target[..., c]) * m).sum() / n)
    out["mae_total"] = float(np.mean([out[f"mae_{n}"] for n in "uvw"]))
    return out


def plot_triptych(recon, target, out_path, slice_idx):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    k = slice_idx
    fig, axes = plt.subplots(3, 3, figsize=(12, 11))
    for c, name in enumerate(["vx", "vy", "vz"]):
        vmax = max(np.abs(target[0, k, :, :, c]).max(), 1e-8)
        axes[0, c].imshow(target[0, k, :, :, c], cmap="RdBu_r", vmin=-vmax, vmax=vmax)
        axes[0, c].set_title(f"original {name}")
        axes[1, c].imshow(recon[0, k, :, :, c], cmap="RdBu_r", vmin=-vmax, vmax=vmax)
        axes[1, c].set_title(f"reconstruction {name}")
        axes[2, c].imshow(np.abs(recon[0, k, :, :, c] - target[0, k, :, :, c]), cmap="magma")
        axes[2, c].set_title(f"|error| {name}")
    for ax in axes.ravel():
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)


def plot_latent_grid(mu, out_path, slice_idx):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    c = mu.shape[-1]
    cols = min(c, 4)
    rows = (c + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows), squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        if i < c:
            ax.imshow(mu[0, slice_idx, :, :, i], cmap="viridis")
            ax.set_title(f"latent ch {i}", fontsize=8)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)


def plot_w_depth_strip(recon, target, out_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = recon.shape[1]
    fig, axes = plt.subplots(2, d, figsize=(1.6 * d, 3.6), squeeze=False)
    vmax = max(np.abs(target[0, :, :, :, 2]).max(), 1e-8)
    for k in range(d):
        axes[0][k].imshow(target[0, k, :, :, 2], cmap="RdBu_r", vmin=-vmax, vmax=vmax)
        axes[1][k].imshow(recon[0, k, :, :, 2], cmap="RdBu_r", vmin=-vmax, vmax=vmax)
        axes[0][k].axis("off")
        axes[1][k].axis("off")
        axes[0][k].set_title(f"z={k}", fontsize=7)
    axes[0][0].set_ylabel("target w")
    axes[1][0].set_ylabel("recon w")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    if args.device:
        jax.config.update("jax_platforms", args.device)
    from diffusion_model_project_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from diffusion_model_project_tpu.data.dataset import MicroFlowDatasetVAE

    model_type = detect_model_type(args.vae_path)
    print(f"Detected model type: {model_type}")
    if model_type == "dual_stage2" and args.mode != "2d":
        print(f"NOTE: stage-2 checkpoint has no 3D branch; forcing mode '2d'")
        args.mode = "2d"
    if model_type == "dual_stage1_3d_only" and args.mode != "3d":
        print(f"NOTE: stage-1 checkpoint shares E3D for both branches")

    vae, params, norm_factors, _ = load_vae(args.vae_path, args.latent_channels)
    nf = np.asarray(norm_factors or [1.0, 1.0, 1.0], np.float32)
    print(f"Normalization factors: {nf.tolist()}")

    ds = MicroFlowDatasetVAE(args.dataset_dir)
    n = ds.num_microstructures
    s2d = ds[args.index]
    s3d = ds[args.index + n]
    to_cl = lambda x: jnp.moveaxis(jnp.asarray(x)[None], 1, -1)  # (1,D,H,W,C)
    v2d = to_cl(s2d["velocity"]) / nf
    v3d = to_cl(s3d["velocity"]) / nf
    mask = to_cl(s3d["microstructure"] if args.mode != "2d" else s2d["microstructure"])

    recon, mu, target = jax.jit(
        lambda p, a, b: encode_decode(vae, p, args.mode, a, b))(params, v2d, v3d)
    recon, mu, target = map(np.asarray, (recon, mu, target))
    recon = recon * np.asarray(mask)
    target = target * np.asarray(mask)

    metrics = masked_mae_per_component(recon, target, np.asarray(mask))
    print(f"Masked per-component MAE ({args.mode}): " +
          ", ".join(f"{k}={v:.6f}" for k, v in metrics.items()))

    out_dir = args.output_dir or args.vae_path
    k = args.slice_idx if args.slice_idx is not None else recon.shape[1] // 2
    plot_triptych(recon, target, osp.join(out_dir, f"vae_{args.mode}_triptych_{args.index}.png"), k)
    plot_latent_grid(np.asarray(mu), osp.join(out_dir, f"vae_{args.mode}_latent_{args.index}.png"), k)
    plot_w_depth_strip(recon, target, osp.join(out_dir, f"vae_{args.mode}_wstrip_{args.index}.png"))
    print(f"Wrote visualization PNGs to {out_dir}")
    return metrics


if __name__ == "__main__":
    main()
