"""PyTorch-checkpoint importer: reference .pt state dicts -> flax param trees.

Replays the reference's checkpoint-flavor conventions so the published Zenodo
weights load directly:
  - legacy 'layers.N' <-> named-layer remapping with Upsample/SiLU index gaps
    (Diffusion_model/src/predictor.py:51-122)
  - flavor detection from key prefixes: dual_full / dual_stage1_3d /
    dual_stage2_2d / standard (predictor.py:390-413)
  - filename fallback chains (vae.pt -> best_model.pt -> model.pt)

Layout transforms (torch -> channels-last flax):
  Conv3d  (O, I, kD, kH, kW) -> (kD, kH, kW, I, O)
  Conv2d  (O, I, kH, kW)     -> (kH, kW, I, O)
  ConvT2d (I, O, kH, kW)     -> unchanged (models.layers.ConvTranspose2x2 uses
                                torch layout directly)
  Linear  (O, I)             -> (I, O)
  Conv1d  (O, I, 1)          -> (I, O)
  MHA in_proj_weight (3E, E) -> (E, 3E)

Only numpy arrays cross this module's boundary; torch is imported lazily and
solely to deserialize .pt files.
"""
from __future__ import annotations

import os.path as osp
from typing import Dict, List, Optional, Sequence

import numpy as np

Array = np.ndarray
StateDict = Dict[str, Array]


# --------------------------------------------------------------------------
# .pt deserialization + legacy key remapping
# --------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> StateDict:
    """Load a .pt state dict as {key: np.float32 array}.

    Checkpoints saved as ``torch.save(model)`` (whole nn.Module, a legacy
    pattern the reference's loaders tolerate) cannot be unpickled under
    weights_only=True — torch raises before the ``state_dict()`` fallback
    could ever run — so that case retries with weights_only=False.
    """
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # full-module pickle; requires trusting the file like the reference
        # does (its torch.load predates weights_only)
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}


_ENCODER_LAYER_MAP = {
    "layers.0": "conv_in", "layers.1": "res1_1", "layers.2": "res1_2",
    "layers.3": "down1", "layers.4": "res2_1", "layers.5": "res2_2",
    "layers.6": "down2", "layers.7": "res3_1", "layers.8": "res3_2",
    "layers.9": "norm_out", "layers.11": "conv_out",
}

_DECODER_LAYER_MAP = {
    "layers.0": "conv_in", "layers.1": "res1_1", "layers.2": "res1_2",
    # layers.3 = Upsample (no params)
    "layers.4": "conv_up1", "layers.5": "res2_1", "layers.6": "res2_2",
    # layers.7 = Upsample
    "layers.8": "conv_up2", "layers.9": "res3_1", "layers.10": "res3_2",
    "layers.11": "norm_out",
    # layers.12 = SiLU
    "layers.13": "conv_out",
}


def _apply_layer_map(sd: StateDict, mapping: Dict[str, str]) -> StateDict:
    out = {}
    for key, value in sd.items():
        new_key = key
        for old, new in mapping.items():
            if key.startswith(old + "."):
                new_key = new + key[len(old):]
                break
        out[new_key] = value
    return out


def needs_key_mapping(sd: StateDict) -> bool:
    return any(k.startswith("layers.") for k in sd)


def map_encoder_keys(sd: StateDict) -> StateDict:
    return _apply_layer_map(sd, _ENCODER_LAYER_MAP)


def map_decoder_keys(sd: StateDict) -> StateDict:
    return _apply_layer_map(sd, _DECODER_LAYER_MAP)


def detect_vae_checkpoint_type(sd: StateDict) -> Optional[str]:
    """predictor.py:396-413 flavor detection."""
    has_e2d = any(k.startswith("encoder_2d.") for k in sd)
    has_e3d = any(k.startswith("encoder_3d.") for k in sd)
    has_enc = any(k.startswith("encoder.") for k in sd)
    if has_e2d and has_e3d:
        return "dual_full"
    if has_e3d and not has_e2d:
        return "dual_stage1_3d"
    if has_e2d and not has_e3d:
        return "dual_stage2_2d"
    if has_enc:
        return "standard"
    return None


def find_model_file(folder: str, order: Sequence[str] = ("vae.pt", "best_model.pt", "model.pt")) -> str:
    for fname in order:
        candidate = osp.join(folder, fname)
        if osp.exists(candidate):
            return candidate
    raise FileNotFoundError(f"No model file found in {folder}. Looked for: {', '.join(order)}")


def strip_prefix(sd: StateDict, prefix: str) -> StateDict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# --------------------------------------------------------------------------
# layout transforms
# --------------------------------------------------------------------------

def _conv3d_w(w: Array) -> Array:
    return np.transpose(w, (2, 3, 4, 1, 0))


def _conv2d_w(w: Array) -> Array:
    return np.transpose(w, (2, 3, 1, 0))


def _linear_w(w: Array) -> Array:
    return np.transpose(w, (1, 0))


def _conv(sd: StateDict, key: str, *, transpose2d: bool = False) -> dict:
    w = sd[f"{key}.weight"]
    if transpose2d:
        out = {"weight": w}  # ConvTranspose2x2 keeps torch (I, O, kH, kW)
    elif w.ndim == 5:
        out = {"weight": _conv3d_w(w)}
    elif w.ndim == 4:
        out = {"weight": _conv2d_w(w)}
    elif w.ndim == 3:  # Conv1d k=1 imports as a Linear
        if w.shape[-1] != 1:
            # w[..., 0] would silently drop the other k-1 taps and load a
            # numerically wrong model — no current reference module has a
            # k>1 Conv1d, so loud is the only correct answer
            raise ValueError(
                f"Conv1d weight for {key} has kernel_size {w.shape[-1]}; "
                f"only k=1 Conv1d (Linear-equivalent) import is supported")
        out = {"weight": _linear_w(w[..., 0])}
    else:
        raise ValueError(f"Unexpected conv weight rank for {key}: {w.shape}")
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _norm(sd: StateDict, key: str) -> dict:
    return {"weight": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _linear(sd: StateDict, key: str) -> dict:
    out = {"weight": _linear_w(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _film(sd: StateDict, key: str) -> dict:
    return {
        "mlp_0": _linear(sd, f"{key}.mlp.0"),
        "mlp_2": _linear(sd, f"{key}.mlp.2"),
        "mlp_4": _linear(sd, f"{key}.mlp.4"),
    }


def _res_block(sd: StateDict, key: str) -> dict:
    out = {
        "norm1": _norm(sd, f"{key}.norm1"),
        "conv1": _conv(sd, f"{key}.conv1"),
        "norm2": _norm(sd, f"{key}.norm2"),
        "conv2": _conv(sd, f"{key}.conv2"),
    }
    if f"{key}.residual_layer.weight" in sd:
        out["residual_layer"] = _conv(sd, f"{key}.residual_layer")
    for film in ("film1", "film2"):
        if f"{key}.{film}.mlp.0.weight" in sd:
            out[film] = _film(sd, f"{key}.{film}")
    return out


# --------------------------------------------------------------------------
# VAE importers
# --------------------------------------------------------------------------

def import_vae_encoder(sd: StateDict) -> dict:
    """Import one Encoder's state dict (keys relative to the encoder)."""
    if needs_key_mapping(sd):
        sd = map_encoder_keys(sd)
    out = {
        "conv_in": _conv(sd, "conv_in"),
        "res1_1": _res_block(sd, "res1_1"),
        "res1_2": _res_block(sd, "res1_2"),
        "down1": _conv(sd, "down1"),
        "res2_1": _res_block(sd, "res2_1"),
        "res2_2": _res_block(sd, "res2_2"),
        "down2": _conv(sd, "down2"),
        "res3_1": _res_block(sd, "res3_1"),
        "res3_2": _res_block(sd, "res3_2"),
        "norm_out": _norm(sd, "norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    for film in ("film_in", "film_out"):
        if f"{film}.mlp.0.weight" in sd:
            out[film] = _film(sd, film)
    return out


def import_vae_decoder(sd: StateDict) -> dict:
    if needs_key_mapping(sd):
        sd = map_decoder_keys(sd)
    out = {
        "conv_in": _conv(sd, "conv_in"),
        "res1_1": _res_block(sd, "res1_1"),
        "res1_2": _res_block(sd, "res1_2"),
        "conv_up1": _conv(sd, "conv_up1"),
        "res2_1": _res_block(sd, "res2_1"),
        "res2_2": _res_block(sd, "res2_2"),
        "conv_up2": _conv(sd, "conv_up2"),
        "res3_1": _res_block(sd, "res3_1"),
        "res3_2": _res_block(sd, "res3_2"),
        "norm_out": _norm(sd, "norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    for film in ("film_in", "film_pre_out"):
        if f"{film}.mlp.0.weight" in sd:
            out[film] = _film(sd, film)
    return out


def import_vae(sd: StateDict) -> dict:
    """Standard VariationalAutoencoder (encoder./decoder. prefixes)."""
    return {
        "encoder": import_vae_encoder(strip_prefix(sd, "encoder.")),
        "decoder": import_vae_decoder(strip_prefix(sd, "decoder.")),
    }


def import_dual_vae(
    sd_full: Optional[StateDict] = None,
    *,
    encoder_2d: Optional[StateDict] = None,
    encoder_3d: Optional[StateDict] = None,
    decoder_2d: Optional[StateDict] = None,
    decoder_3d: Optional[StateDict] = None,
) -> dict:
    """Import a DualBranchVAE from a full checkpoint and/or per-branch dicts."""
    branches: Dict[str, Optional[StateDict]] = {
        "encoder_2d": encoder_2d, "encoder_3d": encoder_3d,
        "decoder_2d": decoder_2d, "decoder_3d": decoder_3d,
    }
    if sd_full is not None:
        for name in branches:
            if branches[name] is None:
                sub = strip_prefix(sd_full, name + ".")
                if sub:
                    branches[name] = sub
    out = {}
    for name, sub in branches.items():
        if sub is None:
            continue
        out[name] = import_vae_encoder(sub) if name.startswith("encoder") else import_vae_decoder(sub)
    return out


# --------------------------------------------------------------------------
# UNet importer
# --------------------------------------------------------------------------

def _double_block(sd: StateDict, key: str) -> dict:
    out = {
        "block1": {"conv": _conv(sd, f"{key}.block1.conv"), "norm": _norm(sd, f"{key}.block1.norm")},
        "block2": {"conv": _conv(sd, f"{key}.block2.conv"), "norm": _norm(sd, f"{key}.block2.norm")},
    }
    if f"{key}.time_mlp.1.weight" in sd:
        out["time_mlp_1"] = _linear(sd, f"{key}.time_mlp.1")
    return out


def _self_attention(sd: StateDict, key: str) -> dict:
    return {
        "norm": _norm(sd, f"{key}.norm"),
        "mha": {
            "in_proj_weight": _linear_w(sd[f"{key}.mha.in_proj_weight"]),
            "in_proj_bias": sd[f"{key}.mha.in_proj_bias"],
            "out_proj_weight": _linear_w(sd[f"{key}.mha.out_proj.weight"]),
            "out_proj_bias": sd[f"{key}.mha.out_proj.bias"],
        },
        "proj_out_weight": _linear_w(sd[f"{key}.proj_out.weight"][..., 0]),
        "proj_out_bias": sd[f"{key}.proj_out.bias"],
    }


def import_unet(sd: StateDict, num_levels: int) -> dict:
    """Import a reference UNet state dict (torch ModuleList naming:
    encoder.{k}.{0,1,2}, bottleneck, decoder.{k}.{0,1,2}, final_conv, time_mlp)."""
    out: dict = {}
    if "time_mlp.0.weight" in sd:
        out["time_mlp_0"] = _linear(sd, "time_mlp.0")
        out["time_mlp_2"] = _linear(sd, "time_mlp.2")
    for k in range(num_levels):
        out[f"enc{k}_conv"] = _double_block(sd, f"encoder.{k}.0")
        if f"encoder.{k}.1.norm.weight" in sd:
            out[f"enc{k}_attn"] = _self_attention(sd, f"encoder.{k}.1")
        out[f"enc{k}_down"] = {"norm": _norm(sd, f"encoder.{k}.2.norm")}
    out["bottleneck"] = _double_block(sd, "bottleneck")
    for k in range(num_levels):
        out[f"dec{k}_up"] = {
            "conv": _conv(sd, f"decoder.{k}.0.conv", transpose2d=True),
            "norm": _norm(sd, f"decoder.{k}.0.norm"),
        }
        out[f"dec{k}_conv"] = _double_block(sd, f"decoder.{k}.1")
        if f"decoder.{k}.2.norm.weight" in sd:
            out[f"dec{k}_attn"] = _self_attention(sd, f"decoder.{k}.2")
    out["final_conv"] = _conv(sd, "final_conv")
    return out
