"""Dual-branch 3D VAE (flax.linen, channels-last).

Architecture contract mirrors the reference:
  - Encoder: conv_in(->128) | 2xResBlock(128) | asym-pad + stride-(1,2,2) down
    | 2xResBlock(->256) | asym-pad + down | 2xResBlock(->512) | GN(32)+SiLU+
    conv_out(->2*latent) | chunk -> (mu, logvar).  Depth D is preserved; H,W
    are each halved twice (VAE_model/src/vae/encoder.py:30-150).
  - Decoder: mirror with nearest (1,2,2) upsampling
    (VAE_model/src/vae/decoder.py:31-151).
  - ResidualBlock: GN(32)->SiLU->Conv3d x2 with 1x1 projection on channel
    change (VAE_model/src/vae/blocks.py:136-186); FiLM / conditional variants
    (blocks.py:8-133) and the token-attention block (blocks.py:189-227) are
    kept for API parity though the published pipeline doesn't instantiate them.
  - DualBranchVAE: encoder_2d/decoder_2d/encoder_3d/decoder_3d with logvar
    clamped to [-10, 10] at every encode, w-channel zeroing in decode_2d,
    deterministic mu-only encode variants, cross paths and alignment loss
    (VAE_model/src/dual_vae/model.py:32-382).

TPU-first notes: all tensors are (B, D, H, W, C); the stride-(1,2,2)
downsampling uses the exact asymmetric pad (D:1,1 | H:0,1 | W:0,1) as conv
``extra_pad`` so XLA sees one fused padded conv. Stochastic encodes draw from
flax's 'sample' RNG stream; deterministic variants are pure.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.basic import silu, get_padding
from ..ops.resize import upsample_nearest_hw
from .layers import Conv, Dense, GroupNorm, MultiheadSelfAttention

_ASYM_PAD = ((1, 1), (0, 1), (0, 1))  # (D, H, W) pre-pad for stride-(1,2,2)

# The reference hardwires the stage widths (128, 256, 512)
# (VAE_model/src/vae/encoder.py:30-150, decoder.py:31-151). We expose them as
# a ``features`` knob (defaults preserve the reference architecture and all
# published-checkpoint parity); each width must divide by the GroupNorm's 32
# groups. Loaders derive the widths from checkpoint param shapes
# (features_from_decoder_params) so custom-width checkpoints round-trip.
REFERENCE_FEATURES = (128, 256, 512)


def validate_features(features) -> Tuple[int, int, int]:
    """Fail fast on stage widths the GroupNorm(32) layers can't support —
    otherwise an invalid --features dies much later as a bare shape assert
    deep inside ops.group_norm during the first jit trace."""
    features = tuple(int(f) for f in features)
    bad = [f for f in features if f % 32 != 0 or f <= 0]
    if bad:
        raise ValueError(
            f"VAE stage widths {features} must be positive multiples of 32 "
            f"(the GroupNorm group count); offending values: {bad}.")
    return features


def features_from_decoder_params(decoder_params: dict) -> Tuple[int, int, int]:
    """Derive (f1, f2, f3) stage widths from a Decoder param dict's conv
    output-channel shapes (weights are (*spatial, in, out))."""
    f3 = decoder_params["conv_in"]["weight"].shape[-1]
    f2 = decoder_params["conv_up1"]["weight"].shape[-1]
    f1 = decoder_params["conv_up2"]["weight"].shape[-1]
    return validate_features((f1, f2, f3))


class FiLM(nn.Module):
    """Feature-wise linear modulation: 3-layer MLP cond -> (gamma, beta)."""

    feature_channels: int
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: jnp.ndarray) -> jnp.ndarray:
        if condition.ndim == 1:
            condition = condition.astype(jnp.float32)[:, None]
        h = silu(Dense(self.hidden_dim, name="mlp_0")(condition))
        h = silu(Dense(self.hidden_dim, name="mlp_2")(h))
        # reference last-layer init (blocks.py:36-40): xavier_uniform with
        # gain 0.1 (= variance_scaling(gain^2, fan_avg, uniform)) and the
        # gamma half of the bias at 1.0 — FiLM starts as ~identity. Default
        # inits start gamma at ~0 and multiplicatively annihilate features.
        # (Hidden mlp_0/mlp_2 keep this codebase's zero-bias Dense convention
        # vs torch's uniform default — loaded-weight parity is unaffected,
        # from-scratch early dynamics differ negligibly.)
        fc = self.feature_channels

        def gamma_one_bias(key, shape, dtype=jnp.float32):
            del key
            return jnp.concatenate([jnp.ones((fc,), dtype),
                                    jnp.zeros((shape[0] - fc,), dtype)])

        params = Dense(
            2 * fc, name="mlp_4",
            weight_init=nn.initializers.variance_scaling(
                0.1 ** 2, "fan_avg", "uniform"),
            bias_init=gamma_one_bias)(h)
        gamma, beta = jnp.split(params, 2, axis=-1)
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (self.feature_channels,)
        return gamma.reshape(shape) * x + beta.reshape(shape)


class ResidualBlock(nn.Module):
    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = get_padding(self.kernel_size)
        h = GroupNorm(32, act="silu", name="norm1")(x)
        h = Conv(self.out_channels, self.kernel_size, padding=pad, name="conv1")(h)
        h = GroupNorm(32, act="silu", name="norm2")(h)
        h = Conv(self.out_channels, self.kernel_size, padding=pad, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = Conv(self.out_channels, 1, name="residual_layer")(x)
        return h + x


class ConditionalResidualBlock(nn.Module):
    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        pad = get_padding(self.kernel_size)
        h = GroupNorm(32, act="silu", name="norm1")(x)
        h = Conv(self.out_channels, self.kernel_size, padding=pad, name="conv1")(h)
        if condition is not None:
            h = FiLM(self.out_channels, name="film1")(h, condition)
        h = GroupNorm(32, act="silu", name="norm2")(h)
        h = Conv(self.out_channels, self.kernel_size, padding=pad, name="conv2")(h)
        if condition is not None:
            h = FiLM(self.out_channels, name="film2")(h, condition)
        if x.shape[-1] != self.out_channels:
            x = Conv(self.out_channels, 1, name="residual_layer")(x)
        return h + x


class AttentionBlock(nn.Module):
    """GN(32) + full self-attention over D*H*W tokens + residual
    (reference VAE_model/src/vae/blocks.py:189-227; unused by the final
    encoder/decoder but part of the public surface)."""

    num_heads: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, d, h, w, c = x.shape
        y = GroupNorm(32, name="norm")(x)
        y = y.reshape(b, d * h * w, c)
        y = MultiheadSelfAttention(self.num_heads, name="attention")(y)
        return x + y.reshape(b, d, h, w, c)


class Encoder(nn.Module):
    """3D conv encoder; (B, D, H, W, in_channels) -> (mu, logvar) each
    (B, D, H/4, W/4, out_channels).

    ``remat``: rematerialize residual blocks during backprop (training at the
    full 256^2 resolution exceeds HBM otherwise; param structure unchanged).
    """

    out_channels: int
    kernel_size: int = 3
    conditional: bool = False
    remat: bool = False
    features: Sequence[int] = REFERENCE_FEATURES

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, condition: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pad = get_padding(self.kernel_size)
        f1, f2, f3 = validate_features(self.features)
        if self.conditional and condition is None:
            # flax creates params lazily at call time: tracing the FiLM-less
            # path would build a param tree MISSING every film_* subtree, and
            # a later conditioned apply dies with an opaque
            # ScopeParamNotFoundError. Fail clearly instead (a conditional
            # model must always be initialized AND applied with a condition).
            raise ValueError("conditional=True Encoder requires a condition "
                             "(including at init)")
        if not self.conditional and condition is not None:
            # mirror guard: silently dropping a passed condition would train
            # an unconditioned model and surface only as quality degradation
            raise ValueError("Encoder got a condition but conditional=False")
        cond = condition if self.conditional else None
        res_cls = ConditionalResidualBlock if self.conditional else ResidualBlock
        if self.remat:
            res_cls = nn.remat(res_cls)
        Res = lambda ch, name: res_cls(ch, name=name)

        def res(block, h):
            return block(h, cond) if self.conditional else block(h)

        x = Conv(f1, self.kernel_size, padding=pad, name="conv_in")(x)
        if cond is not None:
            x = FiLM(f1, name="film_in")(x, cond)
        x = res(Res(f1, "res1_1"), x)
        x = res(Res(f1, "res1_2"), x)
        x = Conv(f1, self.kernel_size, strides=(1, 2, 2), padding=0,
                 extra_pad=_ASYM_PAD, name="down1")(x)
        x = res(Res(f2, "res2_1"), x)
        x = res(Res(f2, "res2_2"), x)
        x = Conv(f2, self.kernel_size, strides=(1, 2, 2), padding=0,
                 extra_pad=_ASYM_PAD, name="down2")(x)
        x = res(Res(f3, "res3_1"), x)
        x = res(Res(f3, "res3_2"), x)
        x = GroupNorm(32, act="silu", name="norm_out")(x)
        x = Conv(2 * self.out_channels, self.kernel_size, padding=pad, name="conv_out")(x)
        if cond is not None:
            x = FiLM(2 * self.out_channels, name="film_out")(x, cond)
        mu, logvar = jnp.split(x, 2, axis=-1)
        return mu, logvar


class Decoder(nn.Module):
    """3D conv decoder; (B, D, H/4, W/4, latent) -> (B, D, H, W, out_channels).

    ``remat``: rematerialize each residual block during backprop (param
    structure unchanged) — needed when differentiating THROUGH the decoder at
    full 256^2 scale (physics losses), where stored block activations would
    exceed HBM.
    """

    out_channels: int = 3
    kernel_size: int = 3
    conditional: bool = False
    remat: bool = False
    features: Sequence[int] = REFERENCE_FEATURES

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, condition: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        pad = get_padding(self.kernel_size)
        f1, f2, f3 = validate_features(self.features)
        if self.conditional and condition is None:
            # see Encoder: lazy flax params would silently omit film_*
            raise ValueError("conditional=True Decoder requires a condition "
                             "(including at init)")
        if not self.conditional and condition is not None:
            raise ValueError("Decoder got a condition but conditional=False")
        cond = condition if self.conditional else None
        res_cls = ConditionalResidualBlock if self.conditional else ResidualBlock
        if self.remat:
            res_cls = nn.remat(res_cls)
        Res = lambda ch, name: res_cls(ch, name=name)

        def res(block, h):
            return block(h, cond) if self.conditional else block(h)

        x = Conv(f3, self.kernel_size, padding=pad, name="conv_in")(x)
        if cond is not None:
            x = FiLM(f3, name="film_in")(x, cond)
        x = res(Res(f3, "res1_1"), x)
        x = res(Res(f3, "res1_2"), x)
        x = upsample_nearest_hw(x)
        x = Conv(f2, self.kernel_size, padding=pad, name="conv_up1")(x)
        x = res(Res(f2, "res2_1"), x)
        x = res(Res(f2, "res2_2"), x)
        x = upsample_nearest_hw(x)
        x = Conv(f1, self.kernel_size, padding=pad, name="conv_up2")(x)
        x = res(Res(f1, "res3_1"), x)
        x = res(Res(f1, "res3_2"), x)
        if cond is not None:
            x = FiLM(f1, name="film_pre_out")(x, cond)
        x = GroupNorm(32, act="silu", name="norm_out")(x)
        x = Conv(self.out_channels, self.kernel_size, padding=pad, name="conv_out")(x)
        if cond is not None:
            # zero the w channel for 2D samples (condition False => 2D)
            mask_3d = cond.astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
            w_zeroed = x.at[..., 2].multiply(0.0)
            x = mask_3d * x + (1.0 - mask_3d) * w_zeroed
        return x


def _clamp_logvar(logvar: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(logvar, -10.0, 10.0)


def reparameterize(rng: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(rng, mu.shape, dtype=mu.dtype)


class VariationalAutoencoder(nn.Module):
    """Standard single-branch VAE (reference VAE_model/src/vae/autoencoder.py)."""

    in_channels: int = 3
    latent_channels: int = 8
    kernel_size: int = 3
    conditional: bool = False
    features: Sequence[int] = REFERENCE_FEATURES

    def setup(self):
        self.encoder = Encoder(self.latent_channels, self.kernel_size,
                               self.conditional, features=self.features)
        self.decoder = Decoder(self.in_channels, self.kernel_size,
                               self.conditional, features=self.features)

    def encode(self, x, condition=None):
        mu, logvar = self.encoder(x, condition)
        logvar = _clamp_logvar(logvar)
        z = reparameterize(self.make_rng("sample"), mu, logvar)
        return z, (mu, logvar)

    def encode_deterministic(self, x, condition=None):
        mu, logvar = self.encoder(x, condition)
        return mu, (mu, _clamp_logvar(logvar))

    def decode(self, z, condition=None):
        return self.decoder(z, condition)

    def __call__(self, x, condition=None):
        z, (mu, logvar) = self.encode(x, condition)
        return self.decode(z, condition), (mu, logvar)


class DualBranchVAE(nn.Module):
    """Four-module dual-branch VAE (reference VAE_model/src/dual_vae/model.py:32-377).

    2D->3D inference path: x_2d -> encoder_2d -> [latent diffusion] -> decoder_3d.

    ``conditional``: the CONDITIONAL STANDARD VAE mapped onto the dual-branch
    surface. The reference builds a single FiLM-conditioned VAE and passes a
    per-sample bool — False for 2D flow, True for 3D — at each predictor call
    site (Diffusion_model/src/predictor.py:686-688 encode U_2d with zeros,
    :864-866 decode with ones, :1079-1081 encode_target with ones). Here the
    2D-branch methods bake condition=False and the 3D-branch methods
    condition=True, so the predictor's branch dispatch reproduces exactly
    those constants; loaders alias the one checkpoint's params into all four
    branches (utils/checkpoint.py standard flavor).
    """

    in_channels: int = 3
    latent_channels: int = 8
    kernel_size: int = 3
    share_encoders: bool = False
    share_decoders: bool = False
    remat_decoders: bool = False  # per-block remat (see Decoder.remat)
    remat_encoders: bool = False  # per-block remat (see Encoder.remat)
    conditional: bool = False
    features: Sequence[int] = REFERENCE_FEATURES

    def setup(self):
        self.encoder_2d = Encoder(self.latent_channels, self.kernel_size,
                                  self.conditional,
                                  remat=self.remat_encoders,
                                  features=self.features, name="encoder_2d")
        self.decoder_2d = Decoder(self.in_channels, self.kernel_size,
                                  self.conditional,
                                  remat=self.remat_decoders,
                                  features=self.features, name="decoder_2d")
        self.encoder_3d = (
            self.encoder_2d if self.share_encoders
            else Encoder(self.latent_channels, self.kernel_size,
                         self.conditional,
                         remat=self.remat_encoders,
                         features=self.features, name="encoder_3d")
        )
        self.decoder_3d = (
            self.decoder_2d if self.share_decoders
            else Decoder(self.in_channels, self.kernel_size,
                         self.conditional,
                         remat=self.remat_decoders,
                         features=self.features, name="decoder_3d")
        )

    def _cond(self, x, is_3d: bool):
        """Per-sample condition constant for a branch (None when the model
        is unconditional): zeros for the 2D branch, ones for the 3D branch —
        the reference predictor's torch.zeros/ones bool vectors."""
        if not self.conditional:
            return None
        return jnp.full((x.shape[0],), float(is_3d), dtype=jnp.float32)

    # --- stochastic encodes (flax 'sample' RNG stream) ---------------------

    def encode_2d(self, x):
        mu, logvar = self.encoder_2d(x, self._cond(x, False))
        logvar = _clamp_logvar(logvar)
        z = reparameterize(self.make_rng("sample"), mu, logvar)
        return z, (mu, logvar)

    def encode_3d(self, x):
        mu, logvar = self.encoder_3d(x, self._cond(x, True))
        logvar = _clamp_logvar(logvar)
        z = reparameterize(self.make_rng("sample"), mu, logvar)
        return z, (mu, logvar)

    # --- deterministic (mu-only) encodes ------------------------------------

    def encode_2d_deterministic(self, x):
        mu, logvar = self.encoder_2d(x, self._cond(x, False))
        return mu, (mu, _clamp_logvar(logvar))

    def encode_3d_deterministic(self, x):
        mu, logvar = self.encoder_3d(x, self._cond(x, True))
        return mu, (mu, _clamp_logvar(logvar))

    # --- decodes -------------------------------------------------------------

    def decode_2d(self, z):
        x = self.decoder_2d(z, self._cond(z, False))
        return x.at[..., 2].set(0.0)  # w == 0 for 2D flow

    def decode_3d(self, z):
        return self.decoder_3d(z, self._cond(z, True))

    # --- composite paths ------------------------------------------------------

    def forward_2d(self, x_2d):
        z, (mu, logvar) = self.encode_2d(x_2d)
        return self.decode_2d(z), (mu, logvar)

    def forward_2d_deterministic(self, x_2d):
        z, (mu, _) = self.encode_2d_deterministic(x_2d)
        return self.decode_2d(z), mu

    def forward_3d(self, x_3d):
        z, (mu, logvar) = self.encode_3d(x_3d)
        return self.decode_3d(z), (mu, logvar)

    def forward_cross_2d_to_3d(self, x_2d):
        z_2d, _ = self.encode_2d_deterministic(x_2d)
        return self.decode_3d(z_2d), z_2d

    def forward_cross_3d_to_2d(self, x_3d):
        z_3d, _ = self.encode_3d(x_3d)
        return self.decode_2d(z_3d), z_3d

    def compute_alignment_loss(self, x_2d, x_3d, mode: str = "symmetric"):
        z_2d, _ = self.encode_2d_deterministic(x_2d)
        z_3d, _ = self.encode_3d_deterministic(x_3d)
        if mode == "symmetric":
            pass
        elif mode in ("one_way", "stop_grad"):
            z_3d = jax.lax.stop_gradient(z_3d)
        else:
            raise ValueError(f"Unknown alignment mode: {mode}")
        return jnp.mean(jnp.square(z_2d - z_3d))

    def predict_2d_to_3d(self, x_2d):
        z_2d, _ = self.encode_2d(x_2d)
        return self.decode_3d(z_2d)

    def __call__(self, x_2d, x_3d):
        """Init-friendly forward touching all four branches."""
        r2d, stats2d = self.forward_2d(x_2d)
        r3d, stats3d = self.forward_3d(x_3d)
        return (r2d, stats2d), (r3d, stats3d)


def kl_divergence_sum(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Sum-form KL (reference dual_vae/model.py:380-382)."""
    return -0.5 * jnp.sum(1 + logvar - jnp.square(mu) - jnp.exp(logvar))
