"""Pallas kernel correctness (interpret mode on CPU) vs the XLA reference ops."""
import numpy as np
import pytest
import jax.numpy as jnp

from diffusion_model_project_tpu.ops.basic import activation_function, group_norm
from diffusion_model_project_tpu.ops.attention import multihead_attention
from diffusion_model_project_tpu.ops.pallas import fused_attention, fused_groupnorm_act


@pytest.mark.parametrize("groups,channels,spatial", [(1, 64, (16, 16)), (32, 128, (4, 8, 8))])
def test_fused_groupnorm_act_matches(rng, groups, channels, spatial):
    x = rng.standard_normal((2, *spatial, channels)).astype(np.float32)
    w = rng.standard_normal(channels).astype(np.float32)
    b = rng.standard_normal(channels).astype(np.float32)
    expected = activation_function("silu")(
        group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), groups))
    got = fused_groupnorm_act(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                              groups, act="silu", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-6)


def test_fused_groupnorm_fallback_large(rng):
    # slab above the VMEM budget silently falls back to XLA ops
    x = rng.standard_normal((1, 64, 256, 128)).astype(np.float32)  # 8.4 MB > 8 MB/2
    w = np.ones(128, np.float32)
    b = np.zeros(128, np.float32)
    got = fused_groupnorm_act(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1, interpret=True)
    expected = activation_function("silu")(group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("heads,tokens,embed", [(2, 64, 64), (4, 256, 128)])
def test_fused_attention_matches(rng, heads, tokens, embed):
    x = rng.standard_normal((2, tokens, embed)).astype(np.float32)
    w_qkv = (rng.standard_normal((embed, 3 * embed)) * 0.05).astype(np.float32)
    b_qkv = rng.standard_normal(3 * embed).astype(np.float32) * 0.01
    w_out = (rng.standard_normal((embed, embed)) * 0.05).astype(np.float32)
    b_out = rng.standard_normal(embed).astype(np.float32) * 0.01
    args = [jnp.asarray(a) for a in (x, w_qkv, b_qkv, w_out, b_out)]
    expected = multihead_attention(*args, num_heads=heads)
    got = fused_attention(*args, num_heads=heads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-4, atol=1e-5)
