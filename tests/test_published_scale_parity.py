"""Published-architecture end-to-end parity at the 128^2 dry-run scale.

The BASELINE north star is <=1e-3 per-voxel MSE vs the reference checkpoints
over DDIM-50 (reference predictor.py:898-1023, eval_testset_end2end.py:806-818)
at the published architecture: latent 8, 17->8 UNet with features
[64,128,256,512,1024], attention "3..2", T=1000, 11 z-slices. Zenodo (and thus
the published weights) is unreachable from this environment, so this test runs
the exact published architecture with randomly-initialized reference weights
imported into our predictor, at the reference's own 128^2 dry-run spatial
scale (gridsearch_diffusion.py:197-229) to keep CPU wall-clock tractable.
Everything that makes the published config distinct — channel widths, depth-5
feature stack, attention placement, latent 8, the full 50-step DDIM schedule
over T=1000 — is exercised.
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

S, H, W = 11, 128, 128
LATENT = 8
T = 1000
PUBLISHED_UNET_KW = dict(
    in_channels=2 * LATENT + 1, out_channels=LATENT,
    features=[64, 128, 256, 512, 1024], kernel_size=3, padding_mode="zeros",
    activation="silu", final_activation=None, attention="3..2", dropout=0.0,
)
# realistic per-component velocity maxima (statistics.json scale)
NORM_FACTORS = [2.1e-2, 1.6e-2, 7.9e-3]


def _write_artifact_row(name, row):
    """Merge one parity row into PARITY_PUBLISHED.json (under
    PARITY_ARTIFACT=1). Rows accumulate across the gate's tests so one
    slow-marked run regenerates the whole artifact: ddim50 + ddpm50 +
    train_grad (VERDICT r2 #2)."""
    import os
    if not os.environ.get("PARITY_ARTIFACT"):
        return
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "PARITY_PUBLISHED.json")
    doc = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                doc = json.load(f)
        except ValueError:
            doc = {}
    if "rows" not in doc:
        doc = {
            "what": "published-architecture end-to-end parity, random-init "
                    "reference weights imported (Zenodo unreachable)",
            "config": {"unet": PUBLISHED_UNET_KW, "latent_channels": LATENT,
                       "num_slices": S, "image_hw": [H, W],
                       "num_timesteps": T, "norm_factors": NORM_FACTORS},
            "repro": "PARITY_ARTIFACT=1 python -m pytest "
                     "tests/test_published_scale_parity.py -q -m slow",
            "rows": {},
        }
    doc["rows"][name] = row
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)


@pytest.fixture(scope="module")
def ref_pred(tmp_path_factory):
    torch.manual_seed(104)
    pred_mod = ref_predictor()
    dv_mod = ref_dual_vae()

    vae = dv_mod.DualBranchVAE(in_channels=3, latent_channels=LATENT)
    folder = tmp_path_factory.mktemp("published_vae_ckpt")
    torch.save(vae.state_dict(), folder / "vae.pt")
    (folder / "vae_log.json").write_text(json.dumps({
        "model_type": "dual", "latent_channels": LATENT, "in_channels": 3,
        "norm_factors": NORM_FACTORS,
    }))

    ref = pred_mod.LatentDiffusionPredictor(
        model_name="UNet", model_kwargs=dict(PUBLISHED_UNET_KW),
        distance_transform=True, vae_path=str(folder),
        num_slices=S, num_timesteps=T,
    )
    ref.eval()
    # the final conv is zero-initialized (unet/models.py:120-128); give it
    # random weights so the 50-step trajectory actually evolves
    with torch.no_grad():
        ref.model.final_conv.weight.normal_(0, 0.05)
        ref.model.final_conv.bias.normal_(0, 0.05)
    return ref


@pytest.fixture(scope="module")
def our_pred(ref_pred):
    import dataclasses
    pred = LatentDiffusionPredictor.create(
        dict(PUBLISHED_UNET_KW), rng=jax.random.key(0), num_slices=S,
        num_timesteps=T, distance_transform=True, image_hw=(H, W),
    )
    unet_params = ti.import_unet(
        {k: v.detach().numpy() for k, v in ref_pred.model.state_dict().items()},
        num_levels=len(PUBLISHED_UNET_KW["features"]),
    )
    vae_params = ti.import_dual_vae(
        {k: v.detach().numpy() for k, v in ref_pred.vae.state_dict().items()}
    )
    pred = dataclasses.replace(pred, unet_params=unet_params, vae_params=vae_params)
    return pred.set_normalizer({"input": [1.0], "output": NORM_FACTORS})


@pytest.mark.slow
def test_published_arch_ddim50_end_to_end(ref_pred, our_pred):
    """2D->3D pipeline at published config, DDIM-50, identical initial noise."""
    r = np.random.default_rng(2026)
    img = (r.random((1, S, 1, H, W)) > 0.35).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0  # ensure a solid voxel for the EDT
    v2d = (r.standard_normal((1, S, 3, H, W)) * 0.01).astype(np.float32)
    v2d[:, :, 2] = 0.0
    init_noise = r.standard_normal((S, LATENT, H // 4, W // 4)).astype(np.float32)

    with torch.no_grad():
        theirs = ref_pred.predict_ddim(
            torch.from_numpy(img), torch.from_numpy(v2d),
            num_steps=50, eta=0.0, noise=torch.from_numpy(init_noise),
        ).numpy()

    ours = np.asarray(our_pred.predict_ddim(
        jnp.asarray(img), jnp.asarray(v2d), num_steps=50, eta=0.0,
        noise=jnp.asarray(init_noise),
    ))

    assert ours.shape == theirs.shape == (1, S, 3, H, W)
    # per-voxel velocity MSE normalized like the north star (velocities are
    # O(norm_factor), so compare raw AND relative-to-scale)
    mse = float(np.mean((ours - theirs) ** 2))
    scale = float(np.mean(theirs**2))
    assert mse <= 1e-3, f"published-scale DDIM-50 MSE {mse:.3e} > 1e-3"
    # drift over 50 steps must stay tiny relative to signal energy too
    assert mse <= 1e-3 * max(scale, 1e-12) or mse < 1e-9, (
        f"relative drift {mse / max(scale, 1e-12):.3e}")

    # evidence artifact for the repo root (PARITY_PUBLISHED.json)
    _write_artifact_row("ddim50", {
        "sampler": "ddim", "steps": 50, "eta": 0.0,
        "per_voxel_mse_vs_reference": mse,
        "reference_signal_energy": scale,
        "relative_mse": mse / max(scale, 1e-30),
        "threshold": 1e-3,
    })


@pytest.mark.slow
def test_published_arch_ddpm_full_loop(ref_pred, our_pred, monkeypatch):
    """Full ancestral predict() at the published architecture, T truncated to
    50 on BOTH sides for wall-clock (VERDICT r2 #2; the T=1000 tables are
    exercised by the DDIM row). The reference's per-step torch.randn_like
    draws are recorded and fed through our scan's step_noise hook, so the
    stochastic loop is numerically comparable end-to-end (same mechanism as
    tests/test_predictor_parity.py::test_predict_ddpm_full_loop_parity,
    reference predictor.py:754-896 + diffusion.py:175)."""
    import dataclasses
    from diffusion_model_project_tpu.diffusion.scheduler import DiffusionScheduler
    from ref_loader import ref_diffusion_scheduler

    t_steps = 50
    r = np.random.default_rng(2027)
    img = (r.random((1, S, 1, H, W)) > 0.35).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    v2d = (r.standard_normal((1, S, 3, H, W)) * 0.01).astype(np.float32)
    v2d[:, :, 2] = 0.0
    init = r.standard_normal((S, LATENT, H // 4, W // 4)).astype(np.float32)

    recorded = []
    orig_randn_like = torch.randn_like

    def recording_randn_like(x, *a, **k):
        n = orig_randn_like(x, *a, **k)
        recorded.append(n.detach().numpy().copy())
        return n

    RefScheduler = ref_diffusion_scheduler()
    saved_sched, saved_T = ref_pred.scheduler, ref_pred.num_timesteps
    try:
        ref_pred.scheduler = RefScheduler(num_timesteps=t_steps, device="cpu")
        ref_pred.num_timesteps = t_steps
        monkeypatch.setattr(torch, "randn_like", recording_randn_like)
        torch.manual_seed(321)
        with torch.no_grad():
            theirs = ref_pred.predict(
                torch.from_numpy(img), torch.from_numpy(v2d),
                noise=torch.from_numpy(init),
            ).numpy()
        monkeypatch.undo()
    finally:
        ref_pred.scheduler, ref_pred.num_timesteps = saved_sched, saved_T
    assert len(recorded) == t_steps, len(recorded)
    table = np.stack(recorded)

    ours_pred50 = dataclasses.replace(
        our_pred, num_timesteps=t_steps,
        scheduler=DiffusionScheduler.create(t_steps))
    ours = np.asarray(ours_pred50.predict(
        jnp.asarray(img), jnp.asarray(v2d), noise=jnp.asarray(init),
        step_noise=jnp.asarray(table),
    ))

    assert ours.shape == theirs.shape == (1, S, 3, H, W)
    mse = float(np.mean((ours - theirs) ** 2))
    scale = float(np.mean(theirs ** 2))
    assert mse <= 1e-3, f"published-scale DDPM-{t_steps} MSE {mse:.3e} > 1e-3"
    _write_artifact_row("ddpm50", {
        "sampler": "ddpm_ancestral", "steps": t_steps,
        "note": "T truncated to 50 both sides; per-step noise table injected",
        "per_voxel_mse_vs_reference": mse,
        "reference_signal_energy": scale,
        "relative_mse": mse / max(scale, 1e-30),
        "threshold": 1e-3,
    })


@pytest.mark.slow
def test_published_arch_training_forward_and_grad(ref_pred, our_pred):
    """One training forward + gradient step vs torch autograd at the
    published architecture (VERDICT r2 #2): same x_start/noise/t => same
    noise-prediction loss (reference helper.py:316-330 with the default
    normalized_mse_loss_per_component, config.py:148-156) and matching UNet
    gradients. Torch grads are mapped through the SAME importer as the
    weights (gradients transform like their tensors), so the comparison is
    leaf-exact across the whole tree."""
    from ref_loader import load_ref, REF
    from diffusion_model_project_tpu.losses.metrics import (
        normalized_mse_loss_per_component as our_loss)

    ref_metrics = load_ref("refdm.src.unet.metrics",
                           REF / "Diffusion_model/src/unet/metrics.py")

    r = np.random.default_rng(8)
    img = (r.random((1, S, 1, H, W)) > 0.35).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    v2d = (r.standard_normal((1, S, 3, H, W)) * 0.01).astype(np.float32)
    v3d = (r.standard_normal((1, S, 3, H, W)) * 0.01).astype(np.float32)

    with torch.no_grad():
        x_start_t = ref_pred.encode_target(torch.from_numpy(v3d))
    noise = r.standard_normal(x_start_t.shape).astype(np.float32)

    # --- reference: forward (internal seeded t) -> loss -> autograd
    ref_pred.model.zero_grad(set_to_none=True)
    torch.manual_seed(99)
    eps_ref, noise_ref = ref_pred.forward(
        torch.from_numpy(img), torch.from_numpy(v2d),
        x_start=x_start_t, noise=torch.from_numpy(noise))
    loss_ref = ref_metrics.normalized_mse_loss_per_component(eps_ref, noise_ref)
    loss_ref.backward()
    loss_ref = loss_ref.detach()
    grads_ref = {k: p.grad.detach().numpy()
                 for k, p in ref_pred.model.named_parameters()}
    torch.manual_seed(99)
    t_replay = torch.randint(0, T, (1 * S,)).numpy()

    # --- ours: identical t injected; jax.grad through the same loss
    import dataclasses

    def loss_fn(unet_params):
        p = dataclasses.replace(our_pred, unet_params=unet_params)
        eps, noise_r, _, _ = p.forward(
            jnp.asarray(img), jnp.asarray(v2d), jnp.asarray(x_start_t.numpy()),
            noise=jnp.asarray(noise), t=jnp.asarray(t_replay))
        # forward returns channels-last; losses take channels-first
        return our_loss(jnp.moveaxis(eps, -1, 1), jnp.moveaxis(noise_r, -1, 1))

    loss_ours, grads_ours = jax.jit(jax.value_and_grad(loss_fn))(
        our_pred.unet_params)
    loss_ours = float(loss_ours)
    np.testing.assert_allclose(loss_ours, float(loss_ref), rtol=1e-4)

    # map torch grads through the weight importer: same renames/transposes
    grads_ref_tree = ti.import_unet(
        grads_ref, num_levels=len(PUBLISHED_UNET_KW["features"]))
    flat_ours = {"/".join(map(str, path)): np.asarray(leaf) for path, leaf in
                 jax.tree_util.tree_flatten_with_path(grads_ours)[0]}
    flat_ref = {"/".join(map(str, path)): np.asarray(leaf) for path, leaf in
                jax.tree_util.tree_flatten_with_path(grads_ref_tree)[0]}
    assert flat_ours.keys() == flat_ref.keys()
    worst_rel = 0.0
    dot = na = nb = 0.0
    for key in flat_ours:
        a, b = flat_ours[key], flat_ref[key]
        assert a.shape == b.shape, key
        denom = float(np.linalg.norm(b)) or 1e-30
        rel = float(np.linalg.norm(a - b)) / denom
        worst_rel = max(worst_rel, rel)
        dot += float(np.sum(a * b))
        na += float(np.sum(a * a))
        nb += float(np.sum(b * b))
    cosine = dot / max(np.sqrt(na * nb), 1e-30)
    # fp32 accumulation over a 100M-param backward: per-leaf relative L2
    # within 1e-2, global cosine essentially 1
    assert worst_rel <= 1e-2, f"worst per-leaf grad rel-L2 {worst_rel:.3e}"
    assert cosine >= 1.0 - 1e-6, f"global grad cosine {cosine}"

    _write_artifact_row("train_grad", {
        "loss": "normalized_mse_loss_per_component",
        "loss_ours": loss_ours, "loss_reference": float(loss_ref),
        "grad_leaves": len(flat_ours),
        "worst_leaf_rel_l2": worst_rel,
        "global_grad_cosine": cosine,
        "thresholds": {"leaf_rel_l2": 1e-2, "cosine": "1 - 1e-6"},
    })


@pytest.mark.slow
def test_published_arch_encode_target_parity(ref_pred, our_pred):
    r = np.random.default_rng(7)
    v3d = (r.standard_normal((1, S, 3, H, W)) * 0.01).astype(np.float32)
    with torch.no_grad():
        theirs = ref_pred.encode_target(torch.from_numpy(v3d)).numpy()
    ours = np.asarray(our_pred.encode_target(jnp.asarray(v3d)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
