"""int8 fast path for the frozen VAE (ops/quant.py, Conv int8 routing)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from diffusion_model_project_tpu.ops.quant import (
    int8_conv, int8_conv3d_decomposed, quantize_act, quantize_weight)


def test_quantize_roundtrip_error_bounds():
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((4, 16, 16, 32)), jnp.float32)
    x_q, sx = quantize_act(x)
    err = np.abs(np.asarray(x_q, np.float32) * float(sx) - np.asarray(x))
    assert err.max() <= float(sx) * 0.5 + 1e-6  # round-to-nearest bound

    w = jnp.asarray(r.standard_normal((3, 3, 32, 16)), jnp.float32)
    w_q, sw = quantize_weight(w)
    deq = np.asarray(w_q, np.float32) * np.asarray(sw)
    assert np.abs(deq - np.asarray(w)).max() <= float(np.asarray(sw).max()) * 0.5 + 1e-6


def test_int8_conv_close_to_f32():
    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal((2, 16, 16, 32)), jnp.float32)
    w = jnp.asarray(r.standard_normal((3, 3, 32, 32)) * 0.1, jnp.float32)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    ref = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                   dimension_numbers=dn)
    q = int8_conv(x, w, (1, 1), [(1, 1), (1, 1)], dn, jnp.float32)
    rel = float(jnp.linalg.norm(q - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_int8_conv3d_decomposed_matches_direct_quant():
    """Depth-decomposed int8 conv3d == int8 2D convs with shared scales."""
    r = np.random.default_rng(2)
    x = jnp.asarray(r.standard_normal((1, 5, 8, 8, 16)), jnp.float32)
    w = jnp.asarray(r.standard_normal((3, 3, 3, 16, 32)) * 0.1, jnp.float32)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = int8_conv3d_decomposed(xp, w, (1, 1), [(1, 1), (1, 1)], jnp.float32)
    # f32 reference conv3d
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    ref = lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1), (1, 1), (1, 1)],
                                   dimension_numbers=dn)
    assert out.shape == ref.shape
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


@pytest.fixture(scope="module")
def tiny_pred():
    from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor

    unet_kwargs = dict(
        in_channels=9, out_channels=4, features=(8, 16), kernel_size=3,
        padding_mode="zeros", activation="silu", final_activation=None,
        attention="", dropout=0.0, time_embedding_dim=16,
    )
    return LatentDiffusionPredictor.create(
        dict(unet_kwargs), rng=jax.random.key(0), num_slices=3,
        num_timesteps=20, distance_transform=True, image_hw=(32, 32),
        vae_features=(32, 64, 64),
    ).set_normalizer({"input": [1.0], "output": [2.0, 3.0, 4.0]})


def test_vae_int8_survives_pytree_and_jit(tiny_pred):
    pred8 = tiny_pred.with_vae_int8()
    leaves, aux = pred8.tree_flatten()
    back = type(pred8).tree_unflatten(aux, leaves)
    assert back.vae_int8 is True

    captured = {}

    @jax.jit
    def f(p, z):
        captured["int8"] = p.vae_int8
        return p.vae_params["decoder_3d"]["conv_in"]["bias"][0] + z

    f(pred8, jnp.float32(0.0))
    assert captured["int8"] is True


def test_unet_int8_survives_pytree_and_engages():
    """with_unet_int8 survives pytree round-trips and changes the UNet's
    numerics (i.e. the int8 conv path really engages at >=16/32 channels)."""
    from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor

    kw = dict(
        in_channels=17, out_channels=8, features=(32, 64), kernel_size=3,
        padding_mode="zeros", activation="silu", final_activation=None,
        attention="", dropout=0.0, time_embedding_dim=16,
    )
    pred = LatentDiffusionPredictor.create(
        dict(kw), rng=jax.random.key(0), num_slices=3, num_timesteps=20,
        distance_transform=True, image_hw=(32, 32), vae_features=(32, 64, 64),
    ).set_normalizer({"input": [1.0], "output": [2.0, 3.0, 4.0]})
    # the zero-initialized final conv makes a fresh UNet output identically
    # zero (and thus int8-invariant) — randomize it so the paths can differ
    r = np.random.default_rng(7)
    fc = pred.unet_params["final_conv"]["weight"]
    pred.unet_params["final_conv"]["weight"] = jnp.asarray(
        r.standard_normal(fc.shape).astype(np.float32) * 0.05)

    pred8 = pred.with_unet_int8()
    leaves, aux = pred8.tree_flatten()
    assert type(pred8).tree_unflatten(aux, leaves).unet_int8 is True

    x = jnp.asarray(r.standard_normal((3, 8, 8, 8)).astype(np.float32))
    z = jnp.asarray(r.standard_normal((3, 8, 8, 8)).astype(np.float32))
    m = jnp.asarray(r.random((3, 8, 8, 1)).astype(np.float32))
    t = jnp.full((3,), 5, jnp.int32)
    a = jax.jit(lambda p: p._unet_eps(x, z, m, t))(pred)
    b = jax.jit(lambda p: p._unet_eps(x, z, m, t))(pred8)
    diff = float(jnp.abs(a - b).max())
    assert diff > 0.0, "int8 path did not engage"
    rel = float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-12))
    assert rel < 0.05, rel

    # e2e: per-step quantization error largely averages out through the DDIM
    # trajectory (measured ~3e-5 relative MSE at this scale)
    img = (r.random((1, 3, 1, 32, 32)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    v2d = r.standard_normal((1, 3, 3, 32, 32)).astype(np.float32)
    noise = r.standard_normal((3, 8, 8, 8)).astype(np.float32)
    kw2 = dict(num_steps=5, eta=0.0, noise=jnp.asarray(noise))
    out_f = jax.jit(lambda p: p.predict_ddim(
        jnp.asarray(img), jnp.asarray(v2d), **kw2))(pred)
    out_q = jax.jit(lambda p: p.predict_ddim(
        jnp.asarray(img), jnp.asarray(v2d), **kw2))(pred8)
    rel_mse = float(jnp.mean(jnp.square(out_f - out_q))
                    / (jnp.mean(jnp.square(out_f)) + 1e-12))
    assert rel_mse < 1e-3, rel_mse


def test_e2e_int8_close_to_f32(tiny_pred):
    """predict_ddim with the int8 VAE stays close to the f32 pipeline.

    Measured: ~1.4e-3 relative per-voxel MSE, all of it from the decoder
    (conditioning-path quantization washes out through the diffusion steps).
    That is the expected rounding accumulation of 14 int8 conv layers — close
    to but not inside the 1e-3 parity budget, which is why vae_int8 is an
    OPT-IN throughput knob (BENCH_INT8=1), not the parity path."""
    r = np.random.default_rng(3)
    img = (r.random((1, 3, 1, 32, 32)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    v2d = r.standard_normal((1, 3, 3, 32, 32)).astype(np.float32)
    noise = r.standard_normal((3, 4, 8, 8)).astype(np.float32)

    kw = dict(num_steps=5, eta=0.0, noise=jnp.asarray(noise))
    out_f32 = jax.jit(lambda p: p.predict_ddim(jnp.asarray(img), jnp.asarray(v2d), **kw))(tiny_pred)
    out_int8 = jax.jit(lambda p: p.predict_ddim(jnp.asarray(img), jnp.asarray(v2d), **kw))(
        tiny_pred.with_vae_int8())
    mse = float(jnp.mean(jnp.square(out_f32 - out_int8)))
    denom = float(jnp.mean(jnp.square(out_f32))) + 1e-12
    assert mse / denom < 3e-3, (mse, denom)


def test_train_step_rejects_int8_predictor(tiny_pred):
    """Training through round/clip quantizers yields zero grads a.e. — the
    train step must fail fast instead (trace-time ValueError)."""
    import optax
    from diffusion_model_project_tpu.training.steps import make_diffusion_train_step

    opt = optax.adam(1e-3)
    step = make_diffusion_train_step(opt)
    p8 = tiny_pred.with_unet_int8()
    with pytest.raises(ValueError, match="int8"):
        step(p8, opt.init(p8.unet_params), {}, jax.random.key(0))
