"""End-to-end predictor parity vs the reference LatentDiffusionPredictor.

This is the BASELINE.json north-star check on tiny shapes: identical VAE +
UNet weights, identical initial noise, deterministic DDIM (eta=0) => the
full 2D->3D pipeline (encode conditioning -> reverse diffusion -> decode ->
denormalize -> mask) must agree to ~1e-3.
"""
import json

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor
from diffusion_model_project_tpu.utils import torch_import as ti

from ref_loader import ref_predictor, ref_dual_vae

S, H, W = 3, 32, 32
LATENT = 4
T = 20
UNET_KW = dict(
    in_channels=2 * LATENT + 1, out_channels=LATENT, features=[8, 16],
    kernel_size=3, padding_mode="zeros", activation="silu",
    final_activation=None, attention="2.2.2", dropout=0.0,
)
NORM_FACTORS = [2.0, 3.0, 4.0]


@pytest.fixture(scope="module")
def ref_pred(tmp_path_factory):
    torch.manual_seed(7)
    pred_mod = ref_predictor()
    dv_mod = ref_dual_vae()

    vae = dv_mod.DualBranchVAE(in_channels=3, latent_channels=LATENT)
    folder = tmp_path_factory.mktemp("vae_ckpt")
    torch.save(vae.state_dict(), folder / "vae.pt")
    (folder / "vae_log.json").write_text(json.dumps({
        "model_type": "dual", "latent_channels": LATENT, "in_channels": 3,
        "norm_factors": NORM_FACTORS,
    }))

    ref = pred_mod.LatentDiffusionPredictor(
        model_name="UNet", model_kwargs=dict(UNET_KW),
        distance_transform=True, vae_path=str(folder),
        num_slices=S, num_timesteps=T,
    )
    ref.eval()
    # make the zero-init final conv non-trivial so the UNet actually denoises
    with torch.no_grad():
        ref.model.final_conv.weight.normal_(0, 0.05)
        ref.model.final_conv.bias.normal_(0, 0.05)
    return ref


@pytest.fixture(scope="module")
def our_pred(ref_pred):
    pred = LatentDiffusionPredictor.create(
        dict(UNET_KW), rng=jax.random.key(0), num_slices=S, num_timesteps=T,
        distance_transform=True, image_hw=(H, W),
    )
    unet_params = ti.import_unet(
        {k: v.detach().numpy() for k, v in ref_pred.model.state_dict().items()},
        num_levels=len(UNET_KW["features"]),
    )
    vae_params = ti.import_dual_vae(
        {k: v.detach().numpy() for k, v in ref_pred.vae.state_dict().items()}
    )
    import dataclasses
    pred = dataclasses.replace(pred, unet_params=unet_params, vae_params=vae_params)
    pred = pred.set_normalizer({"input": [1.0], "output": NORM_FACTORS})
    return pred


@pytest.fixture(scope="module")
def sample(rng=None):
    r = np.random.default_rng(11)
    img = (r.random((1, S, 1, H, W)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0  # ensure a solid pixel for the EDT
    v2d = r.standard_normal((1, S, 3, H, W)).astype(np.float32)
    v2d[:, :, 2] = 0.0
    return img, v2d


def test_encode_target_parity(ref_pred, our_pred, sample):
    img, _ = sample
    r = np.random.default_rng(5)
    v3d = r.standard_normal((1, S, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        theirs = ref_pred.encode_target(torch.from_numpy(v3d)).numpy()
    ours = np.asarray(our_pred.encode_target(jnp.asarray(v3d)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_training_forward_parity(ref_pred, our_pred, sample):
    """Same x_start/noise/t => same predicted noise.

    The reference samples t internally (torch.randint); we fix torch's seed,
    replay the same t, and inject it into our forward.
    """
    img, v2d = sample
    r = np.random.default_rng(6)
    v3d = r.standard_normal((1, S, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        x_start_t = ref_pred.encode_target(torch.from_numpy(v3d))
    noise = r.standard_normal(x_start_t.shape).astype(np.float32)

    torch.manual_seed(99)
    with torch.no_grad():
        eps_ref, noise_ref = ref_pred.forward(
            torch.from_numpy(img), torch.from_numpy(v2d),
            x_start=x_start_t, noise=torch.from_numpy(noise),
        )
    torch.manual_seed(99)
    t_replay = torch.randint(0, T, (1 * S,)).numpy()

    eps_ours, noise_ours, _, _ = our_pred.forward(
        jnp.asarray(img), jnp.asarray(v2d), jnp.asarray(x_start_t.numpy()),
        noise=jnp.asarray(noise), t=jnp.asarray(t_replay),
    )
    # ours is channels-last (B*S, lh, lw, C); reference (B*S, C, lh, lw)
    eps_ours = np.moveaxis(np.asarray(eps_ours), -1, 1)
    np.testing.assert_allclose(eps_ours, eps_ref.numpy(), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("num_steps", [1, 5, 50])
def test_predict_ddim_end_to_end_parity(ref_pred, our_pred, sample, num_steps):
    img, v2d = sample
    r = np.random.default_rng(13)
    init_noise = r.standard_normal((S, LATENT, H // 4, W // 4)).astype(np.float32)

    with torch.no_grad():
        theirs = ref_pred.predict_ddim(
            torch.from_numpy(img), torch.from_numpy(v2d),
            num_steps=num_steps, eta=0.0, noise=torch.from_numpy(init_noise),
        ).numpy()

    ours = np.asarray(our_pred.predict_ddim(
        jnp.asarray(img), jnp.asarray(v2d), num_steps=num_steps, eta=0.0,
        noise=jnp.asarray(init_noise),
    ))
    mse = float(np.mean((ours - theirs) ** 2))
    assert mse <= 1e-3, f"end-to-end MSE {mse} above north-star threshold"
    np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-3)


def test_predict_ddpm_full_loop_parity(ref_pred, our_pred, sample, monkeypatch):
    """Full T-step ancestral loop vs the reference predict().

    The reference draws ancestral noise inside scheduler.p_sample via
    torch.randn_like (diffusion.py:175); record those draws and feed the same
    table through our scan's ``step_noise`` hook so the stochastic loop is
    numerically comparable end-to-end.
    """
    img, v2d = sample
    r = np.random.default_rng(21)
    init = r.standard_normal((S, LATENT, H // 4, W // 4)).astype(np.float32)

    recorded = []
    orig_randn_like = torch.randn_like

    def recording_randn_like(x, *a, **k):
        n = orig_randn_like(x, *a, **k)
        recorded.append(n.detach().numpy().copy())
        return n

    monkeypatch.setattr(torch, "randn_like", recording_randn_like)
    torch.manual_seed(123)
    with torch.no_grad():
        theirs = ref_pred.predict(
            torch.from_numpy(img), torch.from_numpy(v2d),
            noise=torch.from_numpy(init),
        ).numpy()
    monkeypatch.undo()
    assert len(recorded) == T, f"expected {T} ancestral draws, saw {len(recorded)}"
    table = np.stack(recorded)  # (T, S, LATENT, lh, lw), draw order t=T-1..0

    ours = np.asarray(our_pred.predict(
        jnp.asarray(img), jnp.asarray(v2d), noise=jnp.asarray(init),
        step_noise=jnp.asarray(table),
    ))
    mse = float(np.mean((ours - theirs) ** 2))
    assert mse <= 1e-3, f"DDPM full-loop MSE {mse} above north-star threshold"
    np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-3)


def test_predict_ddpm_runs_and_masks(our_pred, sample):
    img, v2d = sample
    out = np.asarray(our_pred.predict(
        jnp.asarray(img), jnp.asarray(v2d), rng=jax.random.key(3)))
    assert out.shape == (1, S, 3, H, W)
    assert np.isfinite(out).all()
    # masked: zero wherever the microstructure is solid
    solid = np.asarray(img)[:, :, 0] == 0
    assert np.all(np.abs(out[:, :, 0][solid]) == 0)


def test_one_step_branch(ref_pred, our_pred, sample):
    """num_timesteps==1 uses the dedicated one-step denoise branch."""
    import dataclasses
    from diffusion_model_project_tpu.diffusion.scheduler import DiffusionScheduler
    img, v2d = sample
    one = dataclasses.replace(
        our_pred, num_timesteps=1, scheduler=DiffusionScheduler.create(1))
    r = np.random.default_rng(17)
    init = r.standard_normal((S, LATENT, H // 4, W // 4)).astype(np.float32)
    out = np.asarray(one.predict(jnp.asarray(img), jnp.asarray(v2d), noise=jnp.asarray(init)))
    assert out.shape == (1, S, 3, H, W) and np.isfinite(out).all()
