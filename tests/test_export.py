"""Serving export (utils/export.py): the StableHLO artifact must reproduce
the jitted sampler exactly and be callable without the package's model code.

The reference has no AOT deployment story (serving = re-run inference.py with
the torch checkpoint, reference Inference/inference.py); this is the
TPU-native extension documented in COMPONENTS.md.
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor
from diffusion_model_project_tpu.utils.export import export_sampler, load_sampler

S, H, W = 3, 32, 32


def _tiny_pred():
    kw = dict(in_channels=9, out_channels=4, features=(8, 16), kernel_size=3,
              padding_mode="zeros", activation="silu", final_activation=None,
              attention="", dropout=0.0, time_embedding_dim=16)
    return LatentDiffusionPredictor.create(
        dict(kw), rng=jax.random.key(0), num_slices=S, num_timesteps=20,
        distance_transform=True, image_hw=(H, W), vae_features=(32, 32, 32),
    ).set_normalizer({"input": [1.0], "output": [2.0, 3.0, 4.0]})


def test_export_round_trip_matches_jitted_sampler():
    pred = _tiny_pred()
    blob = export_sampler(pred, batch=1, num_steps=3, image_hw=(H, W),
                          num_slices=S, platforms=("cpu",))
    assert isinstance(blob, bytes) and len(blob) > 1000

    r = np.random.default_rng(3)
    img = (r.random((1, S, 1, H, W)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    v2d = r.standard_normal((1, S, 3, H, W)).astype(np.float32)
    noise = r.standard_normal((3, 4, 8, 8)).astype(np.float32)

    direct = jax.jit(
        lambda i, v, n: pred.predict_ddim(i, v, num_steps=3, noise=n))(
        jnp.asarray(img), jnp.asarray(v2d), jnp.asarray(noise))
    served = load_sampler(blob)(
        jnp.asarray(img), jnp.asarray(v2d), jnp.asarray(noise))
    # same lowered program -> bitwise-identical on the same backend
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(served))


def test_export_dpm_sampler_round_trip():
    pred = _tiny_pred()
    blob = export_sampler(pred, batch=1, num_steps=3, image_hw=(H, W),
                          num_slices=S, platforms=("cpu",), sampler="dpm")
    r = np.random.default_rng(5)
    img = (r.random((1, S, 1, H, W)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    v2d = r.standard_normal((1, S, 3, H, W)).astype(np.float32)
    noise = r.standard_normal((3, 4, 8, 8)).astype(np.float32)

    direct = jax.jit(
        lambda i, v, n: pred.predict_dpm(i, v, num_steps=3, noise=n))(
        jnp.asarray(img), jnp.asarray(v2d), jnp.asarray(noise))
    served = load_sampler(blob)(
        jnp.asarray(img), jnp.asarray(v2d), jnp.asarray(noise))
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(served))


def test_export_weights_as_arguments_mode():
    """bake_weights=False ships the weights as module ARGUMENTS in the same
    container file (small module, fast compile for big models); the loader
    feeds them back transparently. Not bitwise vs the constant-baked program
    (different XLA simplification opportunities), but numerically tight."""
    pred = _tiny_pred()
    blob = export_sampler(pred, batch=1, num_steps=3, image_hw=(H, W),
                          num_slices=S, platforms=("cpu",), bake_weights=False)

    r = np.random.default_rng(3)
    img = (r.random((1, S, 1, H, W)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    v2d = r.standard_normal((1, S, 3, H, W)).astype(np.float32)
    noise = r.standard_normal((3, 4, 8, 8)).astype(np.float32)

    direct = jax.jit(
        lambda i, v, n: pred.predict_ddim(i, v, num_steps=3, noise=n))(
        jnp.asarray(img), jnp.asarray(v2d), jnp.asarray(noise))
    served = load_sampler(blob)(
        jnp.asarray(img), jnp.asarray(v2d), jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(direct), np.asarray(served),
                               rtol=1e-4, atol=1e-5)


def test_save_sampler_is_atomic(tmp_path, monkeypatch):
    """A failed export (trace OOM, interrupt mid-minutes-long lowering) must
    not destroy the previous good artifact or leave a 0-byte/temp file."""
    import pytest
    from diffusion_model_project_tpu.utils import export as ex

    path = tmp_path / "sampler.stablehlo"
    path.write_bytes(b"GOOD_ARTIFACT")

    def boom(*a, **k):
        raise RuntimeError("trace OOM")

    monkeypatch.setattr(ex, "export_sampler", boom)
    with pytest.raises(RuntimeError, match="trace OOM"):
        ex.save_sampler(str(path), None)
    assert path.read_bytes() == b"GOOD_ARTIFACT"
    assert list(tmp_path.glob("*.tmp")) == []

    monkeypatch.setattr(ex, "export_sampler", lambda *a, **k: b"NEW_ARTIFACT")
    ex.save_sampler(str(path), None)
    assert path.read_bytes() == b"NEW_ARTIFACT"
    assert list(tmp_path.glob("*.tmp")) == []


def test_export_rejects_wrong_shapes():
    import pytest

    pred = _tiny_pred()
    blob = export_sampler(pred, batch=1, num_steps=3, image_hw=(H, W),
                          num_slices=S, platforms=("cpu",))
    f = load_sampler(blob)
    bad_noise = jnp.zeros((3, 8, 8, 4))  # channels-last: must be rejected
    with pytest.raises(ValueError, match="[Ss]hape"):
        f(jnp.zeros((1, S, 1, H, W)), jnp.zeros((1, S, 3, H, W)), bad_noise)
