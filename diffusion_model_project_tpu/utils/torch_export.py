"""PyTorch-checkpoint exporter: flax param trees -> reference .pt state dicts.

The exact inverse of utils/torch_import.py, completing bidirectional
checkpoint interchange: models trained in THIS framework export to the
reference's on-disk contract and load into the unmodified reference torch
code through its normal paths —
  - stage-1 VAE dirs:  vae.pt / best_model.pt with encoder_3d./decoder_3d.
    keys (the reference VAE3DWrapper state dict,
    reference VAE_model/train_3d_vae_only.py:272-305, 572-585)
  - stage-2 / dual dirs: model.pt / best_model.pt with all four branch
    prefixes (DualBranchVAE state dict, train_2d_with_cross.py:610-631)
  - diffusion run dirs: model.pt / best_model.pt holding the FULL predictor
    state dict (model.* UNet keys in torch ModuleList naming, vae.* branches,
    scheduler.* buffers, normalizer.{input,output}.scale_factors,
    distance_transform) exactly as reference train.py:204-206 saves it, so
    reference load_weights(strict=True) accepts it
    (Diffusion_model/src/predictor.py:194-218).

Layout transforms (channels-last flax -> torch):
  Conv3d  (kD, kH, kW, I, O) -> (O, I, kD, kH, kW)
  Conv2d  (kH, kW, I, O)     -> (O, I, kH, kW)
  ConvT2d                     unchanged (stored in torch (I, O, kH, kW) layout)
  Linear  (I, O)             -> (O, I)
  Conv1d  (I, O)             -> (O, I, 1)
  MHA in_proj_weight (E, 3E) -> (3E, E)

Only numpy arrays cross this module's boundary; torch is imported lazily and
solely to serialize .pt files.
"""
from __future__ import annotations

import os.path as osp
from typing import Dict, Optional

import numpy as np

Array = np.ndarray
StateDict = Dict[str, Array]


# --------------------------------------------------------------------------
# layout transforms (inverses of torch_import)
# --------------------------------------------------------------------------

def _a(x) -> Array:
    return np.asarray(x, dtype=np.float32)


def _conv3d_w(w: Array) -> Array:
    return np.transpose(_a(w), (4, 3, 0, 1, 2))


def _conv2d_w(w: Array) -> Array:
    return np.transpose(_a(w), (3, 2, 0, 1))


def _linear_w(w: Array) -> Array:
    return np.transpose(_a(w), (1, 0))


def _conv(params: dict, key: str, sd: StateDict, *, transpose2d: bool = False) -> None:
    w = _a(params["weight"])
    if transpose2d:
        sd[f"{key}.weight"] = w  # ConvTranspose2x2 keeps torch (I, O, kH, kW)
    elif w.ndim == 5:
        sd[f"{key}.weight"] = _conv3d_w(w)
    elif w.ndim == 4:
        sd[f"{key}.weight"] = _conv2d_w(w)
    else:
        raise ValueError(f"Unexpected conv weight rank for {key}: {w.shape}")
    if "bias" in params:
        sd[f"{key}.bias"] = _a(params["bias"])


def _norm(params: dict, key: str, sd: StateDict) -> None:
    sd[f"{key}.weight"] = _a(params["weight"])
    sd[f"{key}.bias"] = _a(params["bias"])


def _linear(params: dict, key: str, sd: StateDict) -> None:
    sd[f"{key}.weight"] = _linear_w(params["weight"])
    if "bias" in params:
        sd[f"{key}.bias"] = _a(params["bias"])


def _film(params: dict, key: str, sd: StateDict) -> None:
    _linear(params["mlp_0"], f"{key}.mlp.0", sd)
    _linear(params["mlp_2"], f"{key}.mlp.2", sd)
    _linear(params["mlp_4"], f"{key}.mlp.4", sd)


def _res_block(params: dict, key: str, sd: StateDict) -> None:
    _norm(params["norm1"], f"{key}.norm1", sd)
    _conv(params["conv1"], f"{key}.conv1", sd)
    _norm(params["norm2"], f"{key}.norm2", sd)
    _conv(params["conv2"], f"{key}.conv2", sd)
    if "residual_layer" in params:
        _conv(params["residual_layer"], f"{key}.residual_layer", sd)
    for film in ("film1", "film2"):
        if film in params:
            _film(params[film], f"{key}.{film}", sd)


# --------------------------------------------------------------------------
# VAE exporters
# --------------------------------------------------------------------------

def export_vae_encoder(params: dict) -> StateDict:
    """One Encoder's flax params -> torch state dict (keys relative)."""
    sd: StateDict = {}
    _conv(params["conv_in"], "conv_in", sd)
    for name in ("res1_1", "res1_2"):
        _res_block(params[name], name, sd)
    _conv(params["down1"], "down1", sd)
    for name in ("res2_1", "res2_2"):
        _res_block(params[name], name, sd)
    _conv(params["down2"], "down2", sd)
    for name in ("res3_1", "res3_2"):
        _res_block(params[name], name, sd)
    _norm(params["norm_out"], "norm_out", sd)
    _conv(params["conv_out"], "conv_out", sd)
    for film in ("film_in", "film_out"):
        if film in params:
            _film(params[film], film, sd)
    return sd


def export_vae_decoder(params: dict) -> StateDict:
    sd: StateDict = {}
    _conv(params["conv_in"], "conv_in", sd)
    for name in ("res1_1", "res1_2"):
        _res_block(params[name], name, sd)
    _conv(params["conv_up1"], "conv_up1", sd)
    for name in ("res2_1", "res2_2"):
        _res_block(params[name], name, sd)
    _conv(params["conv_up2"], "conv_up2", sd)
    for name in ("res3_1", "res3_2"):
        _res_block(params[name], name, sd)
    _norm(params["norm_out"], "norm_out", sd)
    _conv(params["conv_out"], "conv_out", sd)
    for film in ("film_in", "film_pre_out"):
        if film in params:
            _film(params[film], film, sd)
    return sd


def export_dual_vae(branches: dict) -> StateDict:
    """Branch params {'encoder_3d': ..., ...} -> prefixed DualBranchVAE /
    VAE3DWrapper state dict. Only the branches present are emitted, so the
    result round-trips through the reference's flavor detection
    (predictor.py:396-413): 3d-only -> dual_stage1_3d, all four -> dual_full.
    """
    sd: StateDict = {}
    for name, params in branches.items():
        if params is None:
            continue
        sub = (export_vae_encoder(params) if name.startswith("encoder")
               else export_vae_decoder(params))
        for k, v in sub.items():
            sd[f"{name}.{k}"] = v
    return sd


# --------------------------------------------------------------------------
# UNet / predictor exporters
# --------------------------------------------------------------------------

def _double_block(params: dict, key: str, sd: StateDict) -> None:
    _conv(params["block1"]["conv"], f"{key}.block1.conv", sd)
    _norm(params["block1"]["norm"], f"{key}.block1.norm", sd)
    _conv(params["block2"]["conv"], f"{key}.block2.conv", sd)
    _norm(params["block2"]["norm"], f"{key}.block2.norm", sd)
    if "time_mlp_1" in params:
        _linear(params["time_mlp_1"], f"{key}.time_mlp.1", sd)


def _self_attention(params: dict, key: str, sd: StateDict) -> None:
    _norm(params["norm"], f"{key}.norm", sd)
    mha = params["mha"]
    sd[f"{key}.mha.in_proj_weight"] = _linear_w(mha["in_proj_weight"])
    sd[f"{key}.mha.in_proj_bias"] = _a(mha["in_proj_bias"])
    sd[f"{key}.mha.out_proj.weight"] = _linear_w(mha["out_proj_weight"])
    sd[f"{key}.mha.out_proj.bias"] = _a(mha["out_proj_bias"])
    sd[f"{key}.proj_out.weight"] = _linear_w(params["proj_out_weight"])[..., None]
    sd[f"{key}.proj_out.bias"] = _a(params["proj_out_bias"])


def export_unet(params: dict) -> StateDict:
    """Flax UNet params -> reference UNet state dict (torch ModuleList naming:
    encoder.{k}.{0,1,2}, bottleneck, decoder.{k}.{0,1,2}, final_conv,
    time_mlp; reference unet/models.py:84-128). Levels inferred from keys."""
    sd: StateDict = {}
    if "time_mlp_0" in params:
        _linear(params["time_mlp_0"], "time_mlp.0", sd)
        _linear(params["time_mlp_2"], "time_mlp.2", sd)
    num_levels = sum(1 for k in params if k.startswith("enc") and k.endswith("_conv"))
    for k in range(num_levels):
        _double_block(params[f"enc{k}_conv"], f"encoder.{k}.0", sd)
        if f"enc{k}_attn" in params:
            _self_attention(params[f"enc{k}_attn"], f"encoder.{k}.1", sd)
        _norm(params[f"enc{k}_down"]["norm"], f"encoder.{k}.2.norm", sd)
    _double_block(params["bottleneck"], "bottleneck", sd)
    for k in range(num_levels):
        _conv(params[f"dec{k}_up"]["conv"], f"decoder.{k}.0.conv", sd, transpose2d=True)
        _norm(params[f"dec{k}_up"]["norm"], f"decoder.{k}.0.norm", sd)
        _double_block(params[f"dec{k}_conv"], f"decoder.{k}.1", sd)
        if f"dec{k}_attn" in params:
            _self_attention(params[f"dec{k}_attn"], f"decoder.{k}.2", sd)
    _conv(params["final_conv"], "final_conv", sd)
    return sd


_SCHEDULER_BUFFERS = (
    "betas", "alphas", "alphas_cumprod", "alphas_cumprod_prev",
    "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
    "posterior_variance", "posterior_log_variance",
    "posterior_mean_coef1", "posterior_mean_coef2",
)


def export_predictor(predictor) -> StateDict:
    """Our LatentDiffusionPredictor -> the reference's full predictor state
    dict (reference train.py:204 saves predictor.state_dict()), loadable with
    load_state_dict(strict=True)."""
    return export_predictor_parts(
        unet_params=predictor.unet_params,
        vae_params=predictor.vae_params,
        scheduler=predictor.scheduler,
        norm_input=predictor.norm_input.scale_factors,
        norm_output=predictor.norm_output.scale_factors,
        distance_transform=predictor.distance_transform,
    )


def export_predictor_parts(*, unet_params: dict, vae_params: dict, scheduler,
                           norm_input, norm_output,
                           distance_transform: bool) -> StateDict:
    """Assemble the reference predictor state dict from raw parts, so run-dir
    conversion never has to build (jit-init) the model."""
    sd: StateDict = {}
    for k, v in export_unet(unet_params).items():
        sd[f"model.{k}"] = v
    for k, v in export_dual_vae(vae_params).items():
        sd[f"vae.{k}"] = v
    for name in _SCHEDULER_BUFFERS:
        sd[f"scheduler.{name}"] = _a(getattr(scheduler, name))
    sd["normalizer.input.scale_factors"] = _a(norm_input)
    sd["normalizer.output.scale_factors"] = _a(norm_output)
    sd["distance_transform"] = np.asarray(
        [1.0 if distance_transform else 0.0], np.float32)
    return sd


# --------------------------------------------------------------------------
# serialization + run-dir converters
# --------------------------------------------------------------------------

def save_torch_state_dict(sd: StateDict, path: str) -> None:
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)


def export_vae_dir(run_dir: str, out_dir: Optional[str] = None) -> list:
    """Convert every native msgpack VAE checkpoint in a stage-1/stage-2 run
    dir to its reference .pt twin (vae.msgpack -> vae.pt, best_model.msgpack
    -> best_model.pt, model.msgpack -> model.pt). vae_log.json is already
    written in the reference contract by our trainers; together they form a
    directory the reference loaders accept as-is."""
    from flax import serialization

    out_dir = out_dir or run_dir
    written = []
    for stem in ("vae", "best_model", "model"):
        src = osp.join(run_dir, f"{stem}.msgpack")
        if not osp.exists(src):
            continue
        with open(src, "rb") as f:
            branches = serialization.msgpack_restore(f.read())
        dst = osp.join(out_dir, f"{stem}.pt")
        save_torch_state_dict(export_dual_vae(branches), dst)
        written.append(dst)
    if not written:
        raise FileNotFoundError(f"No native VAE checkpoints (*.msgpack) in {run_dir}")
    return written


def export_diffusion_dir(run_dir: str, out_dir: Optional[str] = None) -> list:
    """Convert a diffusion run dir's native checkpoints to reference .pt files
    (model.msgpack -> model.pt etc., each a full predictor state dict). The
    run dir's log.json already follows the reference contract, so the
    converted dir drives the reference's inference.py / evaluate.py directly.

    Works on the raw msgpack trees (utils/checkpoint.predictor_state layout)
    — no model build or device touch; scheduler tables are regenerated from
    log.json's num_timesteps, exactly how both codebases construct them."""
    import json

    from flax import serialization

    from ..diffusion.scheduler import DiffusionScheduler

    with open(osp.join(run_dir, "log.json")) as f:
        pk = json.load(f)["params"]["training"]["predictor"]
    scheduler = DiffusionScheduler.create(pk.get("num_timesteps", 1000))

    out_dir = out_dir or run_dir
    written = []
    for stem in ("best_model", "model", "ema_model"):
        src = osp.join(run_dir, f"{stem}.msgpack")
        if not osp.exists(src):
            continue
        with open(src, "rb") as f:
            state = serialization.msgpack_restore(f.read())
        sd = export_predictor_parts(
            unet_params=state["unet_params"], vae_params=state["vae_params"],
            scheduler=scheduler, norm_input=state["norm_input"],
            norm_output=state["norm_output"],
            distance_transform=pk.get("distance_transform", True),
        )
        dst = osp.join(out_dir, f"{stem}.pt")
        save_torch_state_dict(sd, dst)
        written.append(dst)
    if not written:
        raise FileNotFoundError(f"No native diffusion checkpoints (*.msgpack) in {run_dir}")
    return written
