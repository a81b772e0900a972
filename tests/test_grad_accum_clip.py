"""Parity of the VAE trainers' gradient accumulation + clipping vs torch.

The reference divides the loss by the fixed accumulation count, backwards into
persistent .grad buffers, and calls torch.nn.utils.clip_grad_norm_(max_norm=1)
after EVERY backward — so the clip acts on the running accumulated gradient
(reference VAE_model/train_3d_vae_only.py:435-456,
train_2d_with_cross.py:455-480). accumulate_clipped replays that chain.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusion_model_project_tpu.training.accum import accumulate_clipped


def _torch_reference_chain(grad_list, accum_steps, skip=()):
    """Replay the reference loop: p.grad += g/accum; clip_grad_norm_(1.0)."""
    params = [torch.nn.Parameter(torch.zeros_like(torch.as_tensor(g)))
              for g in grad_list[0]]
    for p in params:
        p.grad = torch.zeros_like(p)
    for i, grads in enumerate(grad_list):
        if i in skip:
            continue
        for p, g in zip(params, grads):
            p.grad += torch.as_tensor(g) / accum_steps
        torch.nn.utils.clip_grad_norm_(params, max_norm=1.0)
    return [p.grad.numpy() for p in params]


@pytest.mark.parametrize("scale,skip", [(30.0, ()), (0.05, ()), (30.0, (1,))])
def test_accumulate_clipped_matches_torch(scale, skip):
    """Large grads (clip active every microbatch), small grads (clip never
    fires), and a skipped microbatch (reference `continue`)."""
    rng = np.random.default_rng(0)
    accum = 4
    grad_list = [
        [rng.standard_normal((3, 5)).astype(np.float32) * scale,
         rng.standard_normal((7,)).astype(np.float32) * scale]
        for _ in range(accum)
    ]
    expected = _torch_reference_chain(grad_list, accum, skip=skip)

    g_acc = [jnp.zeros((3, 5)), jnp.zeros((7,))]
    for i, grads in enumerate(grad_list):
        g_acc = accumulate_clipped(
            g_acc, [jnp.asarray(g) for g in grads], keep=i not in skip,
            accum_steps=accum)
    for ours, ref in zip(g_acc, expected):
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6, atol=1e-7)


def test_accumulated_not_per_microbatch():
    """Two opposing large gradients must largely cancel AFTER the running-sum
    clip — per-microbatch clipping would leave a different magnitude."""
    g1 = [jnp.full((4,), 100.0)]
    g2 = [jnp.full((4,), -99.0)]
    g_acc = [jnp.zeros((4,))]
    g_acc = accumulate_clipped(g_acc, g1, keep=True, accum_steps=2)
    # after clip: norm 1 in +direction
    assert np.isclose(float(optax_norm(g_acc)), 1.0, atol=1e-5)
    g_acc = accumulate_clipped(g_acc, g2, keep=True, accum_steps=2)
    expected = _torch_reference_chain(
        [[np.full((4,), 100.0, np.float32)], [np.full((4,), -99.0, np.float32)]], 2)
    np.testing.assert_allclose(np.asarray(g_acc[0]), expected[0], rtol=1e-5)


def optax_norm(tree):
    import optax
    return optax.global_norm(tree)


def test_skipped_nan_grads_do_not_poison_accumulator():
    """Skipped batches are skipped precisely BECAUSE their grads are
    non-finite; the mask must be a select, not a 0*g multiply (0*NaN=NaN
    would silently destroy the whole accumulation window and then the
    params)."""
    g_acc = [jnp.asarray([0.1, 0.2]), jnp.asarray([[0.3]])]
    nan_grads = [jnp.full((2,), jnp.nan), jnp.full((1, 1), jnp.inf)]
    out = accumulate_clipped(g_acc, nan_grads, keep=False, accum_steps=10)
    for a, o in zip(g_acc, out):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(a))
    # and under jit (the trainers' grad_step jits this)
    out_j = jax.jit(lambda a, g: accumulate_clipped(a, g, False, 10))(
        g_acc, nan_grads)
    for a, o in zip(g_acc, out_j):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(a))
