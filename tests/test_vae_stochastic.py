"""Stochastic VAE paths: reparameterized encodes, VariationalAutoencoder."""
import numpy as np
import jax
import jax.numpy as jnp

from diffusion_model_project_tpu.models.vae import (
    DualBranchVAE, VariationalAutoencoder, kl_divergence_sum)


def _init_dual(rng_seed=0):
    vae = DualBranchVAE(latent_channels=4, features=(32, 32, 32))
    dummy = jnp.zeros((1, 2, 16, 16, 3))
    params = vae.init({"params": jax.random.key(rng_seed),
                       "sample": jax.random.key(1)}, dummy, dummy)["params"]
    return vae, params


def test_stochastic_encode_differs_from_mu_and_across_keys(rng):
    vae, params = _init_dual()
    x = jnp.asarray(rng.standard_normal((1, 2, 16, 16, 3)).astype(np.float32))
    mu, _ = vae.apply({"params": params}, x, method="encode_2d_deterministic")
    z1, (mu1, logvar1) = vae.apply({"params": params}, x, method="encode_2d",
                                   rngs={"sample": jax.random.key(7)})
    z2, _ = vae.apply({"params": params}, x, method="encode_2d",
                      rngs={"sample": jax.random.key(8)})
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu), rtol=1e-6)
    assert not np.allclose(np.asarray(z1), np.asarray(mu1))  # sampled
    assert not np.allclose(np.asarray(z1), np.asarray(z2))   # key-dependent
    # reparameterization: (z - mu) / std must be standard-normal-ish
    std = np.exp(0.5 * np.asarray(logvar1))
    eps = (np.asarray(z1) - np.asarray(mu1)) / std
    assert abs(eps.mean()) < 0.1 and abs(eps.std() - 1.0) < 0.1


def test_logvar_clamped(rng):
    vae, params = _init_dual()
    x = jnp.asarray(100.0 * rng.standard_normal((1, 2, 16, 16, 3)).astype(np.float32))
    _, (_, logvar) = vae.apply({"params": params}, x, method="encode_3d",
                               rngs={"sample": jax.random.key(0)})
    lv = np.asarray(logvar)
    assert lv.min() >= -10.0 and lv.max() <= 10.0


def test_variational_autoencoder_roundtrip(rng):
    vae = VariationalAutoencoder(latent_channels=4, features=(32, 32, 32))
    x = jnp.asarray(rng.standard_normal((1, 2, 16, 16, 3)).astype(np.float32))
    params = vae.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, x)["params"]
    recon, (mu, logvar) = vae.apply({"params": params}, x,
                                    rngs={"sample": jax.random.key(2)})
    assert recon.shape == x.shape
    assert mu.shape == (1, 2, 4, 4, 4)
    assert np.isfinite(np.asarray(recon)).all()
    # deterministic encode returns mu
    z, _ = vae.apply({"params": params}, x, method="encode_deterministic")
    np.testing.assert_allclose(np.asarray(z), np.asarray(mu), rtol=1e-6)


def test_predict_2d_to_3d_and_cross_3d_to_2d(rng):
    vae, params = _init_dual()
    x = jnp.asarray(rng.standard_normal((1, 2, 16, 16, 3)).astype(np.float32))
    out = vae.apply({"params": params}, x, method="predict_2d_to_3d",
                    rngs={"sample": jax.random.key(3)})
    assert out.shape == x.shape
    x2d, z3d = vae.apply({"params": params}, x, method="forward_cross_3d_to_2d",
                         rngs={"sample": jax.random.key(4)})
    assert x2d.shape == x.shape
    np.testing.assert_array_equal(np.asarray(x2d)[..., 2], 0.0)  # w zeroed


def test_features_derived_from_decoder_params(rng):
    """Loaders size custom-width VAEs from checkpoint conv shapes, not config
    (stage-2 and inference_vae must reconstruct the stage-1 widths exactly)."""
    from diffusion_model_project_tpu.models.vae import (
        Decoder, features_from_decoder_params)

    feats = (32, 64, 96)  # each must divide by the GroupNorm's 32 groups
    dec = Decoder(out_channels=3, features=feats)
    params = dec.init(jax.random.key(0), jnp.zeros((1, 2, 4, 4, 4)))["params"]
    assert features_from_decoder_params(params) == feats


def test_kl_sum_form(rng):
    mu = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
    logvar = jnp.zeros((2, 3))
    # logvar=0: KL = -0.5 * sum(1 - mu^2 - 1) = 0.5 * sum(mu^2)
    np.testing.assert_allclose(float(kl_divergence_sum(mu, logvar)),
                               0.5 * float(jnp.sum(mu ** 2)), rtol=1e-5)


def test_invalid_vae_features_fail_fast():
    import pytest
    from diffusion_model_project_tpu.models.vae import validate_features

    with pytest.raises(ValueError, match="multiples of 32"):
        validate_features((48, 96, 192))
    assert validate_features((32, 64, 128)) == (32, 64, 128)
