"""LatentDiffusionPredictor: frozen dual-branch VAE + UNet + scheduler.

Reimplements the reference predictor's orchestration
(Diffusion_model/src/predictor.py:295-1116) as a jit-friendly pytree:

  training forward: encode targets with E3D (mu-only), draw an INDEPENDENT
    timestep per latent slice (batch*depth), q_sample, predict noise
    (predictor.py:636-751);
  inference: x ~ N(0,1) -> T-step DDPM ancestral loop or N-step DDIM ->
    D3D decode -> per-channel denormalize -> optional depth resize -> mask
    (predictor.py:754-1023).

TPU-first design decisions (vs the reference):
  - The whole reverse process is ONE ``lax.scan`` inside one jit; scheduler
    tables are scan constants. No per-timestep Python dispatch.
  - Latent shapes are computed statically (depth preserved, H/4, W/4) instead
    of the reference's per-call dummy encoder forward (predictor.py:652-662).
  - The scipy host-side distance transform becomes the on-device exact EDT
    (ops/distance.py), so conditioning prep lives in the same XLA graph.
  - Public API keeps the reference's channels-first contract
    (img (B,S,1,H,W), velocity (B,S,3,H,W)); internals are channels-last.

The predictor is a registered pytree: pass it as an argument to jitted
functions; params/normalizers are leaves, module defs and static config are
aux data.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet import UNet
from ..models.vae import DualBranchVAE
from ..ops.distance import distance_transform_edt
from ..ops.normalizer import MaxNormalizer
from ..ops.resize import interpolate_bilinear, interpolate_trilinear
from .scheduler import (
    DiffusionScheduler, ddim_timesteps, dpm_solver_coefficients)


def _cf_to_cl(x: jnp.ndarray) -> jnp.ndarray:
    """(..., C, H, W) -> (..., H, W, C)."""
    return jnp.moveaxis(x, -3, -1)


def _cl_to_cf(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, -1, -3)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LatentDiffusionPredictor:
    # static (aux)
    unet: UNet
    vae: DualBranchVAE
    num_slices: int = 11
    num_timesteps: int = 1000
    distance_transform: bool = True
    # compute dtype for the UNet/VAE networks. Scheduler math, normalization
    # and GroupNorm statistics always stay float32; bfloat16 here trades a
    # ~1e-2 relative network-output error (well inside the 1e-3 MSE parity
    # budget after denormalization) for MXU throughput.
    compute_dtype: str = "float32"
    # depth downsampling factor of the VAE (latent_depth = num_slices //
    # vae_depth_factor). The published architecture preserves depth (factor 1);
    # the reference probes this dynamically (predictor.py:652-662) and resizes
    # back with trilinear interpolation when it differs (predictor.py:878-884).
    vae_depth_factor: int = 1
    # run the FROZEN VAE's convolutions in dynamic int8 (v5e MXU int8 is 2x
    # bf16; see ops/quant.py). Inference fast path — the VAE is frozen so
    # static-weight quantization is safe; accuracy is measured e2e in
    # tests/test_quant.py and gated well inside the 1e-3 parity budget.
    vae_int8: bool = False
    # optional NamedSharding over the fused batch*latent-slice axis: shards
    # one volume's reverse-diffusion scan across chips for serving latency
    # (see with_latent_sharding). Static/aux — part of the compiled program.
    latent_sharding: object = None
    # run the UNet's convolutions in dynamic int8 during sampling. The UNet is
    # frozen at inference; its convs run at ~100 TFLOP/s bf16 (near their
    # structural roofline, scripts/perf_probe_unet.py) so int8 is the one lever
    # left for the DDIM scan. Per-step quantization error feeds back through
    # the sampler, so the e2e error is larger than the VAE path's — measured
    # in tests/test_quant.py and NOT part of the parity path.
    unet_int8: bool = False
    # leaves
    unet_params: dict = None
    vae_params: dict = None
    scheduler: DiffusionScheduler = None
    norm_input: MaxNormalizer = None
    norm_output: MaxNormalizer = None

    @property
    def _cdtype(self):
        return jnp.dtype(self.compute_dtype)

    def with_compute_dtype(self, dtype: str) -> "LatentDiffusionPredictor":
        return dataclasses.replace(self, compute_dtype=str(jnp.dtype(dtype)))

    def with_vae_int8(self, enabled: bool = True) -> "LatentDiffusionPredictor":
        return dataclasses.replace(self, vae_int8=enabled)

    def with_unet_int8(self, enabled: bool = True) -> "LatentDiffusionPredictor":
        return dataclasses.replace(self, unet_int8=enabled)

    def with_latent_sharding(self, mesh, axis: str = "slice"
                             ) -> "LatentDiffusionPredictor":
        """Shard the fused batch*latent-slice axis over a mesh axis for
        SINGLE-SAMPLE serving latency (beyond the reference, which has no
        inference parallelism): each slice is denoised independently in the
        DDIM/DPM/DDPM scan, so the UNet work for one volume spreads across
        chips; GSPMD inserts the gathers the cross-slice Conv3D stages (E2D
        conditioning, D3D decode) need. Complements batch sharding
        (parallel.shard_batch), which scales throughput, not latency."""
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec(axis))
        return dataclasses.replace(self, latent_sharding=sharding)

    def _shard_latents(self, *arrays):
        """Apply the latent-axis sharding constraint (no-op when unset)."""
        if self.latent_sharding is None:
            return arrays if len(arrays) > 1 else arrays[0]
        out = tuple(jax.lax.with_sharding_constraint(a, self.latent_sharding)
                    for a in arrays)
        return out if len(out) > 1 else out[0]

    def _vae_apply(self, *args, **kwargs):
        """vae.apply, optionally tracing its Convs through the int8 path."""
        if self.vae_int8:
            from ..models.layers import int8_convs

            with int8_convs():
                return self.vae.apply(*args, **kwargs)
        return self.vae.apply(*args, **kwargs)

    # convenience constructors mirroring the reference classmethod surface
    # (predictor.py:222-292)
    @classmethod
    def from_directory(cls, folder: str, **kwargs):
        from ..utils.checkpoint import predictor_from_directory

        predictor, _ = predictor_from_directory(folder, **kwargs)
        return predictor

    @classmethod
    def from_directory_or_url(cls, directory_or_url: str, **kwargs):
        from ..utils.checkpoint import predictor_from_directory_or_url

        predictor, _ = predictor_from_directory_or_url(directory_or_url, **kwargs)
        return predictor

    # ---------------------------------------------------------------- setup

    @classmethod
    def create(
        cls,
        model_kwargs: dict,
        *,
        rng: jax.Array,
        num_slices: int = 11,
        num_timesteps: int = 1000,
        distance_transform: bool = True,
        latent_channels: Optional[int] = None,
        vae_params: Optional[dict] = None,
        image_hw: Tuple[int, int] = (256, 256),
        vae_features: Optional[Tuple[int, int, int]] = None,
        vae_conditional: bool = False,
    ) -> "LatentDiffusionPredictor":
        from ..models.vae import (
            REFERENCE_FEATURES, features_from_decoder_params, validate_features)

        model_kwargs = dict(model_kwargs)
        model_kwargs.setdefault("time_embedding_dim", 64)
        if "features" in model_kwargs:
            model_kwargs["features"] = tuple(model_kwargs["features"])
        unet = UNet(**model_kwargs)
        latent_channels = latent_channels or model_kwargs.get("out_channels", 4)
        if vae_params is not None:
            # widths live in the checkpoint's conv shapes — derive, don't trust
            # config (custom-features checkpoints round-trip automatically)
            vae_features = features_from_decoder_params(vae_params["decoder_3d"])
        elif vae_features is not None:
            vae_features = validate_features(vae_features)
        # vae_conditional: conditional STANDARD VAE checkpoints map onto the
        # dual-branch surface with FiLM conditions baked per branch — 2D
        # branch False, 3D branch True, the exact constants the reference
        # passes at each predictor call site (predictor.py:686-688, 864-866,
        # 1079-1081; see DualBranchVAE.conditional)
        vae = DualBranchVAE(latent_channels=latent_channels,
                            conditional=vae_conditional,
                            features=tuple(vae_features or REFERENCE_FEATURES))

        r_unet, r_vae, r_sample = jax.random.split(rng, 3)
        h, w = image_hw
        lh, lw = h // 4, w // 4
        dummy_x = jnp.zeros((1, lh, lw, model_kwargs["in_channels"]), jnp.float32)
        dummy_t = jnp.zeros((1,), jnp.int32)
        # init under jit: eager flax init dispatches thousands of tiny ops,
        # which is pathologically slow on remote/tunneled TPU backends
        unet_params = jax.jit(
            lambda k: unet.init(k, dummy_x, dummy_t)["params"]
        )(r_unet)
        if vae_params is None:
            dummy_v = jnp.zeros((1, num_slices, 32, 32, 3), jnp.float32)
            vae_params = jax.jit(
                lambda k1, k2: vae.init(
                    {"params": k1, "sample": k2}, dummy_v, dummy_v)["params"]
            )(r_vae, r_sample)

        return cls(
            unet=unet,
            vae=vae,
            num_slices=num_slices,
            num_timesteps=num_timesteps,
            distance_transform=distance_transform,
            unet_params=unet_params,
            vae_params=vae_params,
            scheduler=DiffusionScheduler.create(num_timesteps),
            norm_input=MaxNormalizer([1.0]),
            norm_output=MaxNormalizer([1.0] * 3),
        )

    @property
    def latent_channels(self) -> int:
        return self.vae.latent_channels

    def set_normalizer(self, norm_dict: dict) -> "LatentDiffusionPredictor":
        """Functional version of the reference set_normalizer (returns a copy)."""
        kwargs = {}
        if norm_dict.get("input") is not None:
            kwargs["norm_input"] = MaxNormalizer(norm_dict["input"])
        if norm_dict.get("output") is not None:
            kwargs["norm_output"] = MaxNormalizer(norm_dict["output"])
        return dataclasses.replace(self, **kwargs)

    # ----------------------------------------------------------- conditioning

    def pre_process(self, img_flat_cl: jnp.ndarray) -> jnp.ndarray:
        """EDT (if enabled) + input normalization of (N, H, W, 1) masks."""
        if self.distance_transform:
            img_flat_cl = distance_transform_edt(img_flat_cl[..., 0])[..., None]
        return self.norm_input.normalize(img_flat_cl, channel_axis=-1)

    def prepare_conditioning(
        self, img: jnp.ndarray, velocity_2d: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """img (B,S,1,H,W), velocity_2d (B,S,3,H,W) ->
        z_cond (B*S, lh, lw, latent), m_cond (B*S, lh, lw, 1)."""
        b, s = img.shape[0], velocity_2d.shape[1]
        h, w = img.shape[-2], img.shape[-1]
        lh, lw, ld = h // 4, w // 4, s // self.vae_depth_factor

        # --- E2D conditioning latent (deterministic mu) ---
        v2d_cl = _cf_to_cl(velocity_2d)                       # (B,S,H,W,3)
        v2d_norm = self.norm_output.normalize(v2d_cl, channel_axis=-1)
        z_cond, _ = self._vae_apply(
            {"params": self.vae_params}, v2d_norm.astype(self._cdtype),
            method="encode_2d_deterministic"
        )                                                     # (B,S,lh,lw,C)
        if z_cond.shape[1] != ld:
            # the reference probes the VAE's real latent depth instead of
            # trusting config (predictor.py:652-662); here the static factor
            # must agree with what the encoder actually produced, else the
            # reshape below would fail as an opaque error deep inside jit
            raise ValueError(
                f"vae_depth_factor={self.vae_depth_factor} implies latent "
                f"depth {ld}, but encode_2d produced depth "
                f"{z_cond.shape[1]}; the factor must match the VAE's depth "
                f"compression (the shipped Encoder preserves depth -> 1)")
        z_cond = z_cond.astype(jnp.float32).reshape(b * ld, lh, lw, self.latent_channels)

        # --- microstructure features ---
        img_flat = _cf_to_cl(img).reshape(b * s, h, w, 1)
        feats = self.pre_process(img_flat)
        feats = interpolate_bilinear(feats, lh, lw)           # (B*S, lh, lw, 1)
        if ld != s:
            feats5 = feats.reshape(b, s, lh, lw, 1)
            feats5 = interpolate_trilinear(feats5, ld, lh, lw)
            feats = feats5.reshape(b * ld, lh, lw, 1)
        return z_cond, feats

    def _unet_eps(self, x, z_cond, m_cond, t):
        unet_in = jnp.concatenate(
            [x.astype(self._cdtype), z_cond.astype(self._cdtype),
             m_cond.astype(self._cdtype)], axis=-1)
        if self.unet_int8:
            from ..models.layers import int8_convs

            with int8_convs():
                out = self.unet.apply({"params": self.unet_params}, unet_in, t)
        else:
            out = self.unet.apply({"params": self.unet_params}, unet_in, t)
        return out.astype(jnp.float32)

    # ----------------------------------------------------------------- train

    def encode_target(self, velocity_3d: jnp.ndarray) -> jnp.ndarray:
        """(B,S,3,H,W) -> E3D mu latents (B,S,latent,lh,lw) (channels-first API,
        reference predictor.py:1042-1085)."""
        v_cl = _cf_to_cl(velocity_3d)
        v_norm = self.norm_output.normalize(v_cl, channel_axis=-1)
        mu, _ = self._vae_apply(
            {"params": self.vae_params}, v_norm.astype(self._cdtype),
            method="encode_3d_deterministic"
        )
        return _cl_to_cf(mu.astype(jnp.float32))

    def forward(
        self,
        img: jnp.ndarray,
        velocity_2d: jnp.ndarray,
        x_start: jnp.ndarray,
        *,
        noise: Optional[jnp.ndarray] = None,
        t: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Training noise-prediction step.

        x_start: target latents (B, S, latent, lh, lw) from encode_target.
        ``noise`` follows the same channels-first contract as x_start.
        Each latent slice draws an independent timestep (predictor.py:736).

        Returns (noise_pred, noise, t, x_t) with noise_pred/noise as
        (B*S, lh, lw, latent) CHANNELS-LAST — a deliberate exception to the
        channels-first-at-public-boundaries rule: these tensors exist only to
        be subtracted inside the loss, and round-tripping them through the
        reference layout would put two transposes in the training hot path
        for nothing. Callers comparing against reference tensors transpose
        once at the comparison site (training/steps.py::_cl_to_cf,
        tests/test_predictor_parity.py).
        """
        b = img.shape[0]
        z_cond, m_cond = self.prepare_conditioning(img, velocity_2d)
        ld, (lh, lw) = x_start.shape[1], x_start.shape[-2:]
        x0 = _cf_to_cl(x_start).reshape(b * ld, lh, lw, self.latent_channels)

        if noise is not None:
            noise = _cf_to_cl(
                noise.reshape(b, ld, self.latent_channels, lh, lw)
            ).reshape(x0.shape)
        if noise is None or t is None:
            assert rng is not None, "forward() needs rng when noise/t not given"
            r_noise, r_t = jax.random.split(rng)
            if noise is None:
                noise = jax.random.normal(r_noise, x0.shape, x0.dtype)
            if t is None:
                t = jax.random.randint(r_t, (b * ld,), 0, self.num_timesteps)

        x_t = self.scheduler.q_sample(x0, t, noise)
        eps_pred = self._unet_eps(x_t, z_cond, m_cond, t)
        return eps_pred, noise, t, x_t

    # ------------------------------------------------------------- inference

    def _init_latent_noise(self, shape, noise, rng):
        """``noise`` (if given) follows the reference channels-first contract:
        (B*ld, C, lh, lw) or (B, ld, C, lh, lw). Internally channels-last."""
        if noise is not None:
            n, lh, lw, c = shape
            # f32 regardless of the caller's dtype: the samplers' lax.scan
            # carries must match the f32 step outputs (scheduler tables and
            # _unet_eps are f32)
            return _cf_to_cl(noise.reshape(n, c, lh, lw)).astype(jnp.float32)
        if rng is None:
            raise ValueError("predict() needs rng when noise is not given")
        return jax.random.normal(rng, shape, jnp.float32)

    def _setup_sampling(self, img, velocity_2d, noise, rng):
        """Shared sampler preamble: conditioning, initial latents, sharding.

        One implementation for all three samplers (DDPM/DDIM/DPM) so a change
        to conditioning prep or latent sharding cannot silently diverge them.
        """
        b, s = img.shape[0], velocity_2d.shape[1]
        lh, lw = img.shape[-2] // 4, img.shape[-1] // 4
        ld = s // self.vae_depth_factor
        z_cond, m_cond = self.prepare_conditioning(img, velocity_2d)
        shape = (b * ld, lh, lw, self.latent_channels)
        x = self._init_latent_noise(shape, noise, rng)
        x, z_cond, m_cond = self._shard_latents(x, z_cond, m_cond)
        return x, z_cond, m_cond, b, ld, lh, lw

    def _decode_and_finish(self, x, img, b, ld, lh, lw):
        """Latents (B*ld, lh, lw, C) -> masked velocity (B, S, 3, H, W)."""
        s = img.shape[1]
        h, w = img.shape[-2], img.shape[-1]
        z = x.reshape(b, ld, lh, lw, self.latent_channels)
        vel = self._vae_apply(
            {"params": self.vae_params}, z.astype(self._cdtype), method="decode_3d")
        vel = self.norm_output.inverse(vel.astype(jnp.float32), channel_axis=-1)
        if ld != s:
            vel = interpolate_trilinear(vel, s, h, w)
        vel = _cl_to_cf(vel)                                   # (B,S,3,H,W)
        return vel * img                                       # mask (broadcast over C)

    def predict(
        self,
        img: jnp.ndarray,
        velocity_2d: jnp.ndarray,
        *,
        noise: Optional[jnp.ndarray] = None,
        step_noise: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Full DDPM reverse process fused into one lax.scan
        (reference predict(): predictor.py:754-896, clip +/-30).

        ``step_noise``: optional deterministic per-step ancestral noise table,
        channels-first (T, B*latent_depth, C, lh, lw); index i is the noise for
        the i-th step taken (t = T-1-i), matching the reference's
        ``torch.randn_like`` draw order inside p_sample (diffusion.py:175).
        Enables exact numerical comparison of the full ancestral loop.
        """
        if rng is None and step_noise is None and self.num_timesteps > 1:
            # ancestral sampling draws fresh noise EVERY step; silently
            # falling back to a fixed key would make every call's noise
            # identical (correlated "ensembles" with no warning)
            raise ValueError(
                "predict() needs rng (or a deterministic step_noise table) "
                "for the per-step ancestral noise")
        x, z_cond, m_cond, b, ld, lh, lw = self._setup_sampling(
            img, velocity_2d, noise, rng)
        step_rng = rng if rng is not None else jax.random.key(0)

        if self.num_timesteps == 1:
            # one-step branch (predictor.py:823-838)
            t_batch = jnp.zeros((b * ld,), jnp.int32)
            eps = self._unet_eps(x, z_cond, m_cond, t_batch)
            alpha_bar = self.scheduler.alphas_cumprod[0]
            x = (x - jnp.sqrt(1 - alpha_bar) * eps) / jnp.sqrt(alpha_bar)
            x = jnp.clip(x, -30.0, 30.0)
            return self._decode_and_finish(x, img, b, ld, lh, lw)

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        if step_noise is not None:
            n = b * ld
            table = step_noise.reshape(
                self.num_timesteps, n, self.latent_channels, lh, lw)
            table = jnp.moveaxis(table, 2, -1)  # (T, N, lh, lw, C)
            xs = (ts, table)
        else:
            xs = (ts, None)

        def step(x, xs_i):
            t, given = xs_i
            t_batch = jnp.full((b * ld,), t, jnp.int32)
            eps = self._unet_eps(x, z_cond, m_cond, t_batch)
            anc_noise = given if given is not None else jax.random.normal(
                jax.random.fold_in(step_rng, t), x.shape, x.dtype)
            x = self.scheduler.p_sample(
                eps, x, t_batch, noise=anc_noise,
                clip_denoised=True, clip_range=(-30.0, 30.0),
            )
            return x, None

        x, _ = jax.lax.scan(step, x, xs)
        return self._decode_and_finish(x, img, b, ld, lh, lw)

    def predict_ddim(
        self,
        img: jnp.ndarray,
        velocity_2d: jnp.ndarray,
        num_steps: int = 50,
        eta: float = 0.0,
        *,
        noise: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """N-step DDIM sampling fused into one lax.scan
        (reference predict_ddim(): predictor.py:898-1023)."""
        if eta > 0 and rng is None:
            raise ValueError(
                "predict_ddim(eta>0) draws stochastic step noise; pass rng=")
        x, z_cond, m_cond, b, ld, lh, lw = self._setup_sampling(
            img, velocity_2d, noise, rng)
        step_rng = rng if rng is not None else jax.random.key(0)

        ts = ddim_timesteps(self.num_timesteps, num_steps)
        ts_prev = np.concatenate([ts[1:], [-1]])
        pairs = jnp.stack([jnp.asarray(ts), jnp.asarray(ts_prev)], axis=1)

        def step(x, pair):
            t, t_prev = pair[0], pair[1]
            t_batch = jnp.full((b * ld,), t, jnp.int32)
            eps = self._unet_eps(x, z_cond, m_cond, t_batch)
            step_noise = None
            if eta > 0:
                step_noise = jax.random.normal(jax.random.fold_in(step_rng, t), x.shape, x.dtype)
            x = self.scheduler.ddim_sample(
                eps, x, t_batch, t_prev, eta=eta, noise=step_noise,
                clip_range=(-30.0, 30.0),
            )
            return x, None

        x, _ = jax.lax.scan(step, x, pairs)
        return self._decode_and_finish(x, img, b, ld, lh, lw)

    def predict_dpm(
        self,
        img: jnp.ndarray,
        velocity_2d: jnp.ndarray,
        num_steps: int = 10,
        *,
        order: int = 2,
        noise: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """DPM-Solver++ (multistep, deterministic) sampling fused into one
        lax.scan. Beyond the reference's DDPM/DDIM samplers: a second-order
        ODE solver over the same noise schedule and timestep spacing that
        reaches DDIM-50 quality in ~10 UNet evaluations. ``order=1`` is
        mathematically DDIM(eta=0) when the +/-30 x0 clip is inactive.
        Coefficients precomputed on host (see scheduler.dpm_solver_coefficients).
        """
        x, z_cond, m_cond, b, ld, lh, lw = self._setup_sampling(
            img, velocity_2d, noise, rng)

        # dedupe truncation-repeated nodes (num_steps > T): DDIM treats a
        # repeated node as an identity step, but a zero-width DPM step would
        # divide by h=0; unique+descending preserves the trajectory exactly
        ts = np.unique(ddim_timesteps(self.num_timesteps, num_steps))[::-1]
        coefs = dpm_solver_coefficients(
            self.scheduler.alphas_cumprod, ts, order=order)

        def step(carry, c):
            x, prev_x0 = carry
            t_batch = jnp.full((b * ld,), c["t"], jnp.int32)
            eps = self._unet_eps(x, z_cond, m_cond, t_batch)
            x0 = (x - c["sigma_cur"] * eps) / jnp.maximum(c["alpha_cur"], 1e-8)
            x0 = jnp.clip(x0, -30.0, 30.0)
            d = x0 + c["c2"] * (x0 - prev_x0)
            x = c["sigma_ratio"] * x + c["x0_coef"] * d
            return (x, x0), None

        (x, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(x)), coefs)
        return self._decode_and_finish(x, img, b, ld, lh, lw)

    # --------------------------------------------------------------- pytree

    _LEAF_FIELDS = ("unet_params", "vae_params", "scheduler", "norm_input", "norm_output")
    _AUX_FIELDS = ("unet", "vae", "num_slices", "num_timesteps",
                   "distance_transform", "compute_dtype", "vae_depth_factor",
                   "vae_int8", "unet_int8", "latent_sharding")

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self._LEAF_FIELDS)
        aux = tuple(getattr(self, f) for f in self._AUX_FIELDS)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        kwargs = dict(zip(cls._AUX_FIELDS, aux))
        kwargs.update(dict(zip(cls._LEAF_FIELDS, children)))
        return cls(**kwargs)
