"""Reference-semantics gradient accumulation with in-place norm clipping.

The reference VAE trainers divide the loss by the fixed accumulation count,
``backward()`` into the persistent ``.grad`` buffers, and then call
``torch.nn.utils.clip_grad_norm_(params, max_norm=1.0)`` after EVERY backward
— i.e. the clip acts on the running accumulated gradient, not on each
microbatch's gradient (reference VAE_model/train_3d_vae_only.py:435-442,
train_2d_with_cross.py:455-459). The optimizer step then applies the
accumulated (pre-divided, clipped) gradient with no count rescale — including
the end-of-epoch remainder step (train_3d_vae_only.py:453-456).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def accumulate_clipped(g_acc, grads, keep, accum_steps: int, max_norm: float = 1.0):
    """One reference microbatch: g_acc <- clip(g_acc + grads/accum_steps).

    ``keep`` is a scalar bool; False replays the reference's skip-batch
    ``continue`` (g_acc returned unchanged and NOT re-clipped). The clip
    coefficient matches torch.nn.utils.clip_grad_norm_:
    ``max_norm / (total_norm + 1e-6)`` applied only when < 1.
    """
    # jnp.where, NOT keep * g: skipped batches are skipped precisely because
    # their grads are non-finite, and 0 * NaN = NaN would poison g_acc forever
    keep_b = jnp.asarray(keep, dtype=bool)
    g_sum = jax.tree_util.tree_map(
        lambda a, g: jnp.where(keep_b, a + g / accum_steps, a), g_acc, grads)
    gnorm = optax.global_norm(g_sum)
    coef = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    scale = jnp.where(keep_b, coef, 1.0)
    return jax.tree_util.tree_map(lambda g: g * scale, g_sum)
