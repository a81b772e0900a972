"""Conditional 2D UNet denoiser (flax.linen, channels-last).

Architecture contract mirrors the reference UNet
(Diffusion_model/src/unet/models.py:29-188, blocks.py):
  - Block = Conv2d(bias=False) + GroupNorm(groups=1) + activation
  - DoubleBlock = Block + time-embedding add between the blocks + Block + Dropout
  - Down = MaxPool2d(2) + GN(1) + act;  Up = ConvTranspose2d(k=2,s=2) + GN(1) + act
  - SelfAttention = GN(1) + MultiheadAttention over H*W tokens +
    zero-initialized 1x1 projection + residual (identity at init)
  - sinusoidal time embedding (dim) -> MLP dim -> 4*dim -> 4*dim
  - zero-initialized final conv
  - attention placement parsed from a 'start.end.heads' expression
    ('3..2' = 2 heads from level 3 up; models.py:326-370)

Published config: in 17 / out 8, features [64,128,256,512,1024], k=3,
padding zeros, attention '3..2', time_embedding_dim 64.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.basic import activation_function, get_padding, max_pool_2x2
from .layers import Conv, ConvTranspose2x2, Dense, GroupNorm, MultiheadSelfAttention


def eval_expression(expr: str, max_levels: int) -> List[Optional[int]]:
    """Parse the attention placement expression 'start.end.heads'.

    '' -> no attention; '1.1.1' -> level 1 only, 1 head; '3..2' -> levels 3..max,
    2 heads. Levels are 1-based in the expression.
    """
    expr = (expr or "").strip()
    out: List[Optional[int]] = [None] * max_levels
    if not expr:
        return out
    try:
        start_s, end_s, heads_s = expr.split(".")
        if not end_s.strip():
            end_s = str(max_levels)
        start, end, heads = int(start_s), int(end_s), int(heads_s)
        for i in range(start - 1, end):
            out[i] = heads
    except Exception as e:  # same contract as the reference
        raise ValueError("Check validity of expression string.") from e
    return out


def sinusoidal_time_embedding(time: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(B,) timesteps -> (B, dim) sin/cos embedding (models.py:14-26)."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1)))
    args = time.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class Block(nn.Module):
    out_channels: int
    kernel_size: int
    padding_mode: str
    activation: str

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv(
            self.out_channels, self.kernel_size,
            padding=get_padding(self.kernel_size),
            padding_mode=self.padding_mode, use_bias=False, name="conv",
        )(x)
        fused = self.activation if self.activation in ("silu", "relu") else ""
        x = GroupNorm(1, act=fused, name="norm")(x)
        return x if fused else activation_function(self.activation)(x)


class DoubleBlock(nn.Module):
    mid_channels: int
    out_channels: int
    kernel_size: int
    padding_mode: str
    activation: str
    dropout: float = 0.0
    use_time: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, time_emb: Optional[jnp.ndarray] = None, train: bool = False
    ) -> jnp.ndarray:
        x = Block(self.mid_channels, self.kernel_size, self.padding_mode,
                  self.activation, name="block1")(x)
        if self.use_time and time_emb is not None:
            act = activation_function(self.activation)
            t = Dense(self.mid_channels, name="time_mlp_1")(act(time_emb))
            x = x + t[:, None, None, :]
        x = Block(self.out_channels, self.kernel_size, self.padding_mode,
                  self.activation, name="block2")(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class Down(nn.Module):
    activation: str

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = max_pool_2x2(x)
        fused = self.activation if self.activation in ("silu", "relu") else ""
        x = GroupNorm(1, act=fused, name="norm")(x)
        return x if fused else activation_function(self.activation)(x)


class Up(nn.Module):
    out_channels: int
    activation: str

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ConvTranspose2x2(self.out_channels, name="conv")(x)
        fused = self.activation if self.activation in ("silu", "relu") else ""
        x = GroupNorm(1, act=fused, name="norm")(x)
        return x if fused else activation_function(self.activation)(x)


class SelfAttention2D(nn.Module):
    """GN(1) + MHA over H*W tokens + zero-init projection + residual."""

    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        y = GroupNorm(1, name="norm")(x)
        y = y.reshape(b, h * w, c)
        y = MultiheadSelfAttention(self.num_heads, name="mha")(y)
        # zero-initialized 1x1 conv projection (identity block at init)
        proj_w = self.param("proj_out_weight", nn.initializers.zeros, (c, c))
        proj_b = self.param("proj_out_bias", nn.initializers.zeros, (c,))
        y = jnp.einsum("btc,cd->btd", y, proj_w.astype(y.dtype)) + proj_b.astype(y.dtype)
        return x + y.reshape(b, h, w, c)


class UNet(nn.Module):
    in_channels: int = 9
    out_channels: int = 4
    features: Sequence[int] = (64, 128, 256, 512)
    kernel_size: int = 3
    padding_mode: str = "reflect"
    activation: str = "silu"
    final_activation: Optional[str] = None
    attention: str = ""
    dropout: float = 0.0
    time_embedding_dim: Optional[int] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, time: Optional[jnp.ndarray] = None, train: bool = False
    ) -> jnp.ndarray:
        """x: (B, H, W, in_channels); time: (B,) integer timesteps."""
        features = list(self.features)
        heads = eval_expression(self.attention, len(features))
        use_time = self.time_embedding_dim is not None

        time_emb = None
        if use_time:
            if time is None:
                raise ValueError("Model requires time input but None was provided")
            act = activation_function(self.activation)
            t = sinusoidal_time_embedding(time, self.time_embedding_dim).astype(x.dtype)
            t = Dense(4 * self.time_embedding_dim, name="time_mlp_0")(t)
            time_emb = Dense(4 * self.time_embedding_dim, name="time_mlp_2")(act(t))

        skips = []
        for k, f in enumerate(features):
            x = DoubleBlock(f, f, self.kernel_size, self.padding_mode,
                            self.activation, self.dropout, use_time,
                            name=f"enc{k}_conv")(x, time_emb, train)
            if heads[k] is not None:
                x = SelfAttention2D(heads[k], name=f"enc{k}_attn")(x)
            skips.append(x)
            x = Down(self.activation, name=f"enc{k}_down")(x)

        f_bot = 2 * features[-1]
        x = DoubleBlock(f_bot, f_bot, self.kernel_size, self.padding_mode,
                        self.activation, self.dropout, use_time,
                        name="bottleneck")(x, time_emb, train)

        rheads = heads[::-1]
        for k, f in enumerate(reversed(features)):
            x = Up(f, self.activation, name=f"dec{k}_up")(x)
            x = jnp.concatenate([skips[-1 - k], x], axis=-1)
            x = DoubleBlock(f, f, self.kernel_size, self.padding_mode,
                            self.activation, self.dropout, use_time,
                            name=f"dec{k}_conv")(x, time_emb, train)
            h_k = rheads[k]
            if h_k is not None:
                x = SelfAttention2D(h_k, name=f"dec{k}_attn")(x)

        x = Conv(
            self.out_channels, self.kernel_size,
            padding=get_padding(self.kernel_size), padding_mode=self.padding_mode,
            weight_init=nn.initializers.zeros, name="final_conv",
        )(x)
        return activation_function(self.final_activation)(x)
