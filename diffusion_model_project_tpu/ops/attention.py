"""Multi-head self-attention with torch.nn.MultiheadAttention semantics.

The UNet's SelfAttention block wraps nn.MultiheadAttention(batch_first=True)
over H*W tokens (reference Diffusion_model/src/unet/blocks.py:196-226), and the
VAE package carries a hand-rolled equivalent (VAE_model/src/common.py:8-74).
Both reduce to the same fused-projection math reproduced here, so imported
PyTorch weights map 1:1 (in_proj_weight is (3E, E) in torch; we store its
transpose as ``w_qkv`` (E, 3E)).

Token counts here are small (<=4096), so a plain XLA softmax-attention is
already MXU-bound; a fused Pallas flash kernel is provided separately in
ops/pallas/ for the hot shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def multihead_attention(
    x: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    num_heads: int,
) -> jnp.ndarray:
    """Self-attention on ``(B, T, E)`` tokens.

    w_qkv: (E, 3E), b_qkv: (3E,), w_out: (E, E), b_out: (E,).
    """
    b, t, e = x.shape
    assert e % num_heads == 0
    hd = e // num_heads

    qkv = jnp.einsum("bte,ef->btf", x, w_qkv) + b_qkv  # (B, T, 3E)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(z):
        return z.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    # scores in float32 for stability regardless of activation dtype
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k,
        preferred_element_type=jnp.float32 if q.dtype == jnp.float32 else None,
    ).astype(jnp.float32) / jnp.sqrt(jnp.float32(hd))
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, e)
    return jnp.einsum("bte,ef->btf", out, w_out) + b_out
