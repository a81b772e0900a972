"""Import modules from the read-only reference repo for numerical parity tests.

The reference packages lack __init__.py files and use ``sys.path`` surgery
internally, so modules are loaded by file path with a synthetic package
context. Tests that use these helpers compare OUR implementation's numerics
against the reference's torch implementation; no reference code is copied.
"""
import importlib.util
import sys
import types
from pathlib import Path

REF = Path("/root/reference")


def _ensure_pkg(name: str) -> None:
    if name not in sys.modules:
        pkg = types.ModuleType(name)
        pkg.__path__ = []
        sys.modules[name] = pkg


def load_ref(module_name: str, file_path: Path):
    """Load a reference module under a synthetic package name.

    module_name must contain dots matching the relative-import depth used by
    the module (e.g. 'refdm.src.unet.models' so 'from .blocks import ...'
    resolves to 'refdm.src.unet.blocks').
    """
    parts = module_name.split(".")
    for i in range(1, len(parts)):
        parent = ".".join(parts[:i])
        _ensure_pkg(parent)
        sys.modules[parent].__path__ = [str(file_path.parent.parents[len(parts) - i - 1])]
    if module_name in sys.modules:
        return sys.modules[module_name]
    spec = importlib.util.spec_from_file_location(module_name, file_path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_diffusion_scheduler():
    mod = load_ref("refdm.src.diffusion", REF / "Diffusion_model/src/diffusion.py")
    return mod.DiffusionScheduler


def ref_unet():
    load_ref("refdm.src.unet.blocks", REF / "Diffusion_model/src/unet/blocks.py")
    mod = load_ref("refdm.src.unet.models", REF / "Diffusion_model/src/unet/models.py")
    return mod


def ref_vae():
    load_ref("refvae.src.common", REF / "VAE_model/src/common.py")
    load_ref("refvae.src.vae.blocks", REF / "VAE_model/src/vae/blocks.py")
    enc = load_ref("refvae.src.vae.encoder", REF / "VAE_model/src/vae/encoder.py")
    dec = load_ref("refvae.src.vae.decoder", REF / "VAE_model/src/vae/decoder.py")
    ae = load_ref("refvae.src.vae.autoencoder", REF / "VAE_model/src/vae/autoencoder.py")
    return enc, dec, ae


def ref_dual_vae():
    ref_vae()
    mod = load_ref("refvae.src.dual_vae.model", REF / "VAE_model/src/dual_vae/model.py")
    return mod


def ref_predictor():
    """Load the reference LatentDiffusionPredictor with its import tangle.

    predictor.py does absolute imports of 'utils.zenodo' and path-hacked
    imports of 'VAE_model.*'; satisfy both against /root/reference.
    """
    load_ref("utils.zenodo", REF / "Diffusion_model/utils/zenodo.py")
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))  # for 'from VAE_model.src...' imports
    load_ref("refdm.src.normalizer", REF / "Diffusion_model/src/normalizer.py")
    load_ref("refdm.src.diffusion", REF / "Diffusion_model/src/diffusion.py")
    load_ref("refdm.src.unet.blocks", REF / "Diffusion_model/src/unet/blocks.py")
    load_ref("refdm.src.unet.models", REF / "Diffusion_model/src/unet/models.py")
    mod = load_ref("refdm.src.predictor", REF / "Diffusion_model/src/predictor.py")
    return mod
