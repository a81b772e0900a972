"""DDPM/DDIM noise scheduler with precomputed static tables.

Numerical contract mirrors the reference DiffusionScheduler
(Diffusion_model/src/diffusion.py:33-234): linear betas 1e-4 -> 0.02 over T
computed in float64 then stored float32; posterior variance clamped >= 1e-20;
sqrt(alpha_bar) clamped >= 1e-8 in x0 prediction; p_sample clips x0_hat
(callers use +/-30) and adds no noise at t=0; ddim_sample is the
eta-parameterized DDIM update with alpha_bar_prev = 1 at t_prev < 0.

TPU-first design: the scheduler is a frozen pytree of tables, so the whole
reverse process can run as one ``lax.scan`` over timesteps with these tables
as scan constants — every step indexes the tables with a traced ``t`` instead
of Python-level branching. All step functions take explicit noise so samplers
control their PRNG streams.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DiffusionScheduler:
    num_timesteps: int
    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @classmethod
    def create(
        cls,
        num_timesteps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
    ) -> "DiffusionScheduler":
        # float64 on host for table precision, stored as float32 (matches the
        # reference's registered buffers).
        betas = np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)
        alphas = 1.0 - betas
        alphas_cumprod = linear_alphas_cumprod_f64(num_timesteps, beta_start, beta_end)
        alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

        posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        posterior_variance = np.clip(posterior_variance, 1e-20, None)
        posterior_mean_coef1 = betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        posterior_mean_coef2 = (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)

        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            num_timesteps=num_timesteps,
            betas=f32(betas),
            alphas=f32(alphas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance=f32(np.log(posterior_variance)),
            posterior_mean_coef1=f32(posterior_mean_coef1),
            posterior_mean_coef2=f32(posterior_mean_coef2),
        )

    # ---- helpers ---------------------------------------------------------

    @staticmethod
    def _bcast(table_t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """Broadcast a per-sample (B,) gather to x's rank (B, 1, 1, ...)."""
        return table_t.reshape(table_t.shape + (1,) * (x.ndim - table_t.ndim))

    # ---- forward process -------------------------------------------------

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """q(x_t | x_0): sqrt(a_bar_t) x_0 + sqrt(1 - a_bar_t) eps. t: () or (B,)."""
        t = jnp.asarray(t)
        sac = self._bcast(self.sqrt_alphas_cumprod[t], x_start)
        somac = self._bcast(self.sqrt_one_minus_alphas_cumprod[t], x_start)
        return sac * x_start + somac * noise

    def predict_x0_from_noise(self, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        t = jnp.asarray(t)
        sac = jnp.maximum(self._bcast(self.sqrt_alphas_cumprod[t], x_t), 1e-8)
        somac = self._bcast(self.sqrt_one_minus_alphas_cumprod[t], x_t)
        return (x_t - somac * noise) / sac

    def q_posterior_mean_variance(
        self, x_0: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        t = jnp.asarray(t)
        c1 = self._bcast(self.posterior_mean_coef1[t], x_0)
        c2 = self._bcast(self.posterior_mean_coef2[t], x_0)
        var = self._bcast(self.posterior_variance[t], x_0)
        return c1 * x_0 + c2 * x_t, var

    # ---- reverse process -------------------------------------------------

    def p_sample(
        self,
        model_output: jnp.ndarray,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        noise: jnp.ndarray,
        clip_denoised: bool = True,
        clip_range: Tuple[float, float] = (-20.0, 20.0),
    ) -> jnp.ndarray:
        """One DDPM ancestral step. ``noise`` must be provided (caller's PRNG);
        it is masked out where t == 0 (trace-friendly version of the
        reference's t==0 branch)."""
        t = jnp.asarray(t)
        x0_pred = self.predict_x0_from_noise(x_t, t, model_output)
        if clip_denoised:
            x0_pred = jnp.clip(x0_pred, clip_range[0], clip_range[1])
        mean, var = self.q_posterior_mean_variance(x0_pred, x_t, t)
        nonzero = self._bcast((t != 0).astype(x_t.dtype), x_t)
        return mean + nonzero * jnp.sqrt(var) * noise

    def ddim_sample(
        self,
        model_output: jnp.ndarray,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        t_prev: jnp.ndarray,
        eta: float = 0.0,
        noise: Optional[jnp.ndarray] = None,
        clip_range: Tuple[float, float] = (-30.0, 30.0),
    ) -> jnp.ndarray:
        """One DDIM step from t to t_prev (t_prev < 0 means 'to x_0')."""
        t = jnp.asarray(t)
        t_prev = jnp.asarray(t_prev)
        alpha_bar_t = self._bcast(self.alphas_cumprod[t], x_t)
        alpha_bar_prev = jnp.where(
            self._bcast(t_prev, x_t) >= 0,
            self._bcast(self.alphas_cumprod[jnp.maximum(t_prev, 0)], x_t),
            jnp.ones_like(alpha_bar_t),
        )

        x0_pred = self.predict_x0_from_noise(x_t, t, model_output)
        x0_pred = jnp.clip(x0_pred, clip_range[0], clip_range[1])

        sigma_t = eta * jnp.sqrt(
            (1 - alpha_bar_prev) / (1 - alpha_bar_t) * (1 - alpha_bar_t / alpha_bar_prev)
        )
        pred_dir = jnp.sqrt(1 - alpha_bar_prev - sigma_t**2) * model_output
        x_prev = jnp.sqrt(alpha_bar_prev) * x0_pred + pred_dir
        if eta > 0:
            assert noise is not None, "eta > 0 requires explicit noise"
            nonzero = self._bcast((t > 0).astype(x_t.dtype), x_t)
            x_prev = x_prev + nonzero * sigma_t * noise
        return x_prev

    # ---- pytree protocol ---------------------------------------------------

    def tree_flatten(self):
        fields = dataclasses.fields(self)
        children = tuple(getattr(self, f.name) for f in fields if f.name != "num_timesteps")
        return children, self.num_timesteps

    @classmethod
    def tree_unflatten(cls, num_timesteps, children):
        return cls(num_timesteps, *children)


def linear_alphas_cumprod_f64(
    num_timesteps: int, beta_start: float = 1e-4, beta_end: float = 0.02
) -> np.ndarray:
    """The linear-beta cumulative-alpha table in float64 on host. Usable at
    trace time (the device copies inside a jitted DiffusionScheduler are
    tracers, so host-side coefficient precomputation recomputes the table)."""
    betas = np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)
    return np.cumprod(1.0 - betas)


def dpm_solver_coefficients(alphas_cumprod, ts: np.ndarray, order: int = 2) -> dict:
    """Per-step coefficients for DPM-Solver++ multistep sampling
    (Lu et al. 2022, arXiv:2211.01095; data-prediction / "++" formulation).

    This sampler goes beyond the reference (which only has DDPM/DDIM,
    Diffusion_model/src/diffusion.py:152-234): a second-order multistep ODE
    solver reaches DDIM-50 quality in ~10 steps. With ``order=1`` the update
    is mathematically identical to DDIM(eta=0) whenever the x0 clip is
    inactive — the parity anchor tests/test_dpm_sampler.py exploits.

    The solver moves along nodes ``ts`` (descending, strictly decreasing —
    callers must deduplicate truncation-repeated timesteps) plus a final
    boundary node at alpha_bar=1 (fully denoised). In log-SNR coordinates
    lambda = log(alpha/sigma), one step from node i to i+1 is::

        x_{i+1} = (sigma_{i+1}/sigma_i) * x_i - alpha_{i+1}*expm1(-h_i) * D_i

    where h_i = lambda_{i+1}-lambda_i and D_i is the (possibly second-order
    extrapolated) x0 prediction.

    ``alphas_cumprod`` may be a traced jnp array (the predictor's actual —
    possibly checkpoint-restored — scheduler table; coefficients derive from
    it in-graph so DPM stays consistent with DDIM/DDPM for non-default
    schedules) or a concrete numpy array. ``ts`` must be static.

    Returns arrays of length len(ts): t (int32 UNet timestep), alpha_cur,
    sigma_cur (eps -> x0 conversion at the current node), sigma_ratio,
    x0_coef (the two update coefficients), and c2 (second-order correction
    weight h_i/(2*h_{i-1}); zero on first/final steps, which are first-order
    — the standard multistep warm-up and "lower-order-final" rule that also
    keeps the h=inf boundary step finite).
    """
    if order not in (1, 2):
        # only first and second order are implemented; silently running a
        # requested order=3 as 2M would misreport benchmark/quality numbers
        raise ValueError(f"DPM-Solver++ order must be 1 or 2, got {order}")
    ts = np.asarray(ts, np.int64)
    if len(ts) > 1 and not np.all(np.diff(ts) < 0):
        # ValueError, not assert: under python -O a non-decreasing ts would
        # silently produce h<=0 -> NaN coefficients and garbage latents
        raise ValueError(
            f"DPM timesteps must be strictly decreasing, got {ts}")
    abar = jnp.asarray(alphas_cumprod, jnp.float32)[jnp.asarray(ts)]
    alpha = jnp.concatenate([jnp.sqrt(abar), jnp.ones((1,), jnp.float32)])
    sigma = jnp.concatenate([jnp.sqrt(1.0 - abar), jnp.zeros((1,), jnp.float32)])
    lam = jnp.log(alpha) - jnp.log(sigma)            # +inf at the boundary
    h = jnp.diff(lam)                                 # per-step, len(ts)
    x0_coef = -alpha[1:] * jnp.expm1(-h)              # boundary: -1*(-1) = 1
    sigma_ratio = sigma[1:] / jnp.maximum(sigma[:-1], 1e-20)  # 0 at boundary
    # first and final steps are first-order: static masks keep the h=inf
    # boundary out of the c2 ratio (no data-dependent control flow)
    n = len(ts)
    second = np.zeros((n,), np.float32)
    if order >= 2 and n > 2:
        second[1:-1] = 1.0
    c2 = jnp.asarray(second) * jnp.where(
        jnp.isfinite(h) & (jnp.roll(h, 1) > 0), h / (2.0 * jnp.roll(h, 1)), 0.0)
    return dict(
        t=jnp.asarray(ts, jnp.int32),
        alpha_cur=alpha[:-1], sigma_cur=sigma[:-1],
        sigma_ratio=sigma_ratio, x0_coef=x0_coef, c2=c2,
    )


def ddim_timesteps(num_timesteps: int, num_steps: int) -> np.ndarray:
    """The reference's DDIM schedule: torch.linspace(T-1, 0, num_steps, long)
    (scripts/eval_testset_end2end.py uses num_steps=50 by default).

    torch's CPU linspace evaluates the first half as start + i*step and the
    second half as end - (n-1-i)*step in float64 before truncating; replicated
    here so truncation-sensitive indices match exactly.
    """
    n = num_steps
    if n == 1:
        return np.array([num_timesteps - 1], dtype=np.int64)
    start, end = float(num_timesteps - 1), 0.0
    step = (end - start) / (n - 1)
    i = np.arange(n)
    vals = np.where(i < n // 2, start + i * step, end - (n - 1 - i) * step)
    return vals.astype(np.int64)
