"""Stage-1 VAE trainer: E3D + D3D on 3D velocity samples only.

Mirrors the reference VAE_model/train_3d_vae_only.py:
  - 3D-only subset of MicroFlowDatasetVAE (indices >= N), 70/15/15 split with
    torch.Generator().manual_seed(2024) membership (replayed via torch.randperm
    so splits are identical)
  - per-component norm factors = max over U and U_2d stats per channel
  - KL annealing 1e-5 -> 1e-3 over 10 warmup epochs; mean-form KL
  - gradient accumulation x10 with the reference's clip-after-every-backward
    semantics: the ACCUMULATED gradient is clipped to max_norm=1.0 after each
    microbatch, and the optimizer applies the pre-divided sum with no count
    rescale (reference train_3d_vae_only.py:435-456)
  - mask-multiplied preds/targets before the selected per-channel loss
  - NaN/Inf health checks (skip batch) + KL-explosion abort (> 1000)
  - per-epoch save (vae.msgpack + vae_log.json) and best_model on val loss

TPU-native: the whole microbatch — gradient, skip-batch-aware accumulation,
AND the step-on-accum-boundary decision — is one jitted, buffer-donating
function; the host loop dispatches every batch without fetching and reads the
epoch's metrics in one device_get at the end, so uploads overlap compute
instead of serializing on per-batch float() fetches (the round-4 6.5x
wall/device gap, BENCH_EPOCH_r04). With --cache-data (default auto) the
normalized volumes are device-resident and the ENTIRE epoch is one jitted
lax.scan (make_epoch_steps): one dispatch per epoch makes the epoch wall
immune to host CPU contention (measured: the dispatched loop's epochs
inflate 3-23x when the 1-core host is busy; the fused epoch holds its
device-bound wall throughout); batches, order and rng draws replay the
streaming path exactly (tests/test_vae_device_step.py). Params are
{'encoder_3d': ..., 'decoder_3d': ...} so saved checkpoints carry the same
branch names as the reference's VAE3DWrapper state dicts.
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import MicroFlowDatasetVAE, NumpyLoader
from ..losses.metrics import (
    kl_divergence, mae_loss_per_channel, normalized_mae_loss_per_channel,
    normalized_mse_per_channel)
from ..models.vae import Decoder, Encoder, reparameterize

LOSS_FUNCTIONS = {
    "mae_per_channel": mae_loss_per_channel,
    "normalized_mae_per_channel": normalized_mae_loss_per_channel,
    "normalized_mse_per_channel": normalized_mse_per_channel,
}


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Train 3D VAE only (Stage 1)")
    parser.add_argument("--dataset-dir", type=str, required=True)
    parser.add_argument("--save-dir", type=str, default="trained/dual_vae_stage1_3d")
    parser.add_argument("--in-channels", type=int, default=3)
    parser.add_argument("--latent-channels", type=int, default=8)
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--num-epochs", type=int, default=100)
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--loss-function", type=str, default="normalized_mae_per_channel",
                        choices=sorted(LOSS_FUNCTIONS))
    parser.add_argument("--norm-mode", type=str, default="max", choices=["max", "mean"])
    parser.add_argument("--conditional", action="store_true")
    parser.add_argument("--debug-latent", action="store_true")
    parser.add_argument("--debug-batches", type=int, default=3)
    parser.add_argument("--kl-warmup-epochs", type=int, default=10)
    parser.add_argument("--max-kl-coeff", type=float, default=1e-3)
    parser.add_argument("--grad-accum", type=int, default=10)
    parser.add_argument("--seed", type=int, default=2024)
    parser.add_argument("--features", type=int, nargs=3, default=None,
                        help="stage widths (default: the reference's hardwired "
                             "128 256 512; each must divide by the GroupNorm's "
                             "32 groups)")
    parser.add_argument("--resume", action="store_true",
                        help="continue from save-dir/train_state.msgpack "
                             "(full state: params, optimizer moments, the "
                             "cross-epoch accumulated-grad buffer, epoch and "
                             "best-loss counters — the reference can only "
                             "restart stage 1 from scratch)")
    parser.add_argument("--cache-data", default="auto",
                        choices=["auto", "true", "false"],
                        help="keep the normalized train/val volumes device-"
                             "resident (one upload for the whole run instead "
                             "of ~1 GB re-uploaded per epoch — the dominant "
                             "epoch cost through a thin host link). Batches "
                             "are device gathers replaying the host loader's "
                             "exact shuffle stream, so the math is identical "
                             "to the streaming path. 'auto' enables it when "
                             "the subsets fit the cap; incompatible with "
                             "--augment (host-side flips)")
    parser.add_argument("--cache-data-cap-gb", type=float, default=4.0,
                        help="--cache-data auto threshold on the device-"
                             "resident bytes (train+val)")
    parser.add_argument("--ckpt-freq", type=int, default=1,
                        help="write the checkpoint set (vae.msgpack, "
                             "vae_log.json, train_state.msgpack, best_model "
                             "gating) every N epochs instead of every epoch "
                             "(default 1 = the reference contract). With "
                             "--cache-data the epoch is seconds while the "
                             "checkpoint set is ~1 GB of device->host fetch; "
                             "the final epoch, new-best-on-grid, and a "
                             "graceful stop always write (same best-on-grid "
                             "semantics as the diffusion trainer)")
    from ..utils.config import str_to_bool
    parser.add_argument("--data-parallel", type=str_to_bool, default=True,
                        help="enter a 1-D 'data' mesh over all visible "
                             "devices: batch sharded over ICI, params/"
                             "optimizer replicated, gradient psum by XLA — "
                             "the TPU replacement for the reference's "
                             "torch.nn.DataParallel VAE training "
                             "(train_3d_vae_only.py:310-312)")
    parser.add_argument("--tensorboard", type=str_to_bool, nargs="?",
                        const=True, default=False,
                        help="mirror the vae_log.json loss scalars into "
                             "TensorBoard events under <save-dir>/tb/ "
                             "(bare flag or an explicit true/false, matching "
                             "the diffusion trainer's boolean-flag style)")
    return parser.parse_args(argv)


def torch_random_split_indices(n: int, sizes, seed: int = 2024):
    """Replicate torch.utils.data.random_split membership exactly."""
    import torch

    perm = torch.randperm(n, generator=torch.Generator().manual_seed(seed)).tolist()
    out, ofs = [], 0
    for size in sizes:
        out.append(perm[ofs:ofs + size])
        ofs += size
    return out


def norm_factors_from_stats(stats: dict, norm_mode: str = "max") -> np.ndarray:
    """Per-component normalization = max over U and U_2d stats per channel
    (reference train_3d_vae_only.py:203-251)."""
    if "U_per_component" in stats:
        pc = stats["U_per_component"]
        pc2 = stats.get("U_2d_per_component", {})
        if norm_mode == "max":
            return np.array([
                max(pc["max_u"], pc2.get("max_u", 0)),
                max(pc["max_v"], pc2.get("max_v", 0)),
                max(pc["max_w"], pc2.get("max_w", 0)),
            ], np.float32)
        return np.array([
            max(pc.get("mean_u", pc["max_u"]), pc2.get("mean_u", pc2.get("max_u", 0))),
            max(pc.get("mean_v", pc["max_v"]), pc2.get("mean_v", pc2.get("max_v", 0))),
            max(pc.get("mean_w", pc["max_w"]), pc2.get("mean_w", pc2.get("max_w", 0))),
        ], np.float32)
    max_u2d = stats.get("U_2d", stats["U"])["max"]
    mv = max(max_u2d, stats["U"]["max"])
    return np.array([mv, mv, mv], np.float32)


class Stage1VAE:
    """Functional E3D+D3D pair with reference-compatible param naming.

    Blocks are rematerialized during backprop: full-scale 256^2x11 training
    needs ~29 GB of stored activations otherwise (v5e has 15.75 GB)."""

    def __init__(self, in_channels=3, latent_channels=8, remat=True,
                 features=None):
        from ..models.vae import REFERENCE_FEATURES, validate_features
        features = validate_features(features or REFERENCE_FEATURES)
        self.encoder = Encoder(out_channels=latent_channels, remat=remat,
                               features=features)
        self.decoder = Decoder(out_channels=in_channels, remat=remat,
                               features=features)
        self.latent_channels = latent_channels
        self.features = features

    def init(self, rng, sample_shape):
        r1, r2 = jax.random.split(rng)
        dummy = jnp.zeros(sample_shape, jnp.float32)
        enc = jax.jit(lambda k: self.encoder.init(k, dummy)["params"])(r1)
        lat = jnp.zeros(sample_shape[:1] + (sample_shape[1],
                        sample_shape[2] // 4, sample_shape[3] // 4,
                        self.latent_channels), jnp.float32)
        dec = jax.jit(lambda k: self.decoder.init(k, lat)["params"])(r2)
        return {"encoder_3d": enc, "decoder_3d": dec}

    def forward(self, params, x, rng):
        mu, logvar = self.encoder.apply({"params": params["encoder_3d"]}, x)
        logvar = jnp.clip(logvar, -10.0, 10.0)
        z = reparameterize(rng, mu, logvar)
        recon = self.decoder.apply({"params": params["decoder_3d"]}, z)
        return recon, (mu, logvar)


def _to_cl(x):  # (B, C, D, H, W) -> (B, D, H, W, C)
    return jnp.moveaxis(jnp.asarray(x), 1, -1)


def make_loss_fn(vae: Stage1VAE, loss_name: str):
    """Shared by the per-step path and the fused-epoch scan: identical ops
    in identical order is what makes the two paths numerically equal."""
    loss_fn_cf = LOSS_FUNCTIONS[loss_name]

    def losses(params, batch, rng, kl_coeff):
        x = _to_cl(batch["velocity"])
        mask = _to_cl(batch["microstructure"])
        recon, (mu, logvar) = vae.forward(params, x, rng)
        preds = jnp.moveaxis(recon * mask, -1, 1)
        targets = jnp.moveaxis(x * mask, -1, 1)
        mask_cf = jnp.moveaxis(mask, -1, 1)
        recon_loss = loss_fn_cf(preds, targets, mask=mask_cf)
        kl = kl_divergence(mu, logvar=logvar)
        total = recon_loss + kl_coeff * kl
        bad = jnp.logical_or(
            ~jnp.isfinite(mu).all(), ~jnp.isfinite(logvar).all())
        return total, {"recons": recon_loss, "kl": kl, "bad": bad,
                       "mu_absmax": jnp.max(jnp.abs(mu))}

    return losses


def make_steps(vae: Stage1VAE, loss_name: str, optimizer, accum_steps: int = 10):
    losses = make_loss_fn(vae, loss_name)

    def _apply(params, opt_state, g_acc):
        updates, opt_state = optimizer.update(g_acc, opt_state, params)
        params = optax.apply_updates(params, updates)
        g_acc = jax.tree_util.tree_map(jnp.zeros_like, g_acc)
        return params, opt_state, g_acc

    # donate (params, opt_state, g_acc): the loop only ever reassigns them,
    # and checkpoints snapshot on device first (utils/async_ckpt)
    donate = () if jax.config.jax_debug_nans else (0, 1, 2)

    @partial(jax.jit, donate_argnums=donate)
    def train_step(params, opt_state, g_acc, batch, rng, kl_coeff, boundary):
        """Whole microbatch ON DEVICE: grad + skip-batch-aware accumulate +
        the reference's step-on-boundary decision as a lax.cond — the host
        loop dispatches without fetching anything, so upload/compute pipeline
        instead of serializing on a per-batch float() (VERDICT r4 weak #1;
        the reference consumes the bad flag and the (i+1) % accum check on
        host, train_3d_vae_only.py:399-456). ``boundary`` is the traced
        (i + 1) % accum == 0 bool; a bad batch on a boundary suppresses the
        optimizer step exactly like the reference's skip-batch ``continue``
        bypassing the step check."""
        from .accum import accumulate_clipped
        from ..models.layers import train_trace

        with train_trace():  # backward-friendly conv3d decomposition
            (_, metrics), grads = jax.value_and_grad(losses, has_aux=True)(
                params, batch, rng, kl_coeff)
        g_acc = accumulate_clipped(g_acc, grads, ~metrics["bad"], accum_steps)
        params, opt_state, g_acc = jax.lax.cond(
            jnp.logical_and(~metrics["bad"], boundary),
            _apply, lambda p, o, g: (p, o, g), params, opt_state, g_acc)
        return params, opt_state, g_acc, metrics

    @jax.jit
    def apply_step(params, opt_state, g_acc):
        updates, opt_state = optimizer.update(g_acc, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    @jax.jit
    def eval_step(params, batch, rng, kl_coeff):
        _, metrics = losses(params, batch, rng, kl_coeff)
        return metrics

    return train_step, apply_step, eval_step


def split_chain(rng, n: int):
    """Replay ``n`` sequential ``rng, r = jax.random.split(rng)`` draws in
    ONE device dispatch: returns (advanced rng, (n,) step keys) — the exact
    keys the dispatched per-batch loop consumes, so the fused-epoch scan and
    the per-step path draw identical noise."""
    @partial(jax.jit, static_argnums=1)
    def _chain(rng, n):
        def body(c, _):
            c, r = jax.random.split(c)
            return c, r
        return jax.lax.scan(body, rng, None, length=n)

    return _chain(rng, int(n))


def make_epoch_steps(vae: Stage1VAE, loss_name: str, optimizer,
                     accum_steps: int = 10):
    """Fused-epoch scans over a device-resident data store: the ENTIRE
    train (or val) epoch is one jitted ``lax.scan`` whose body is exactly
    the per-step path's math — gather batch rows, grad, skip-aware
    accumulate+clip, lax.cond optimizer step — so one dispatch replaces
    ~num_batches round-trips. On an idle host the dispatched loop already
    pipelines to the device bound (measured equal walls); what the fused
    epoch buys on a 1-core host is contention immunity — a busy host
    inflated the dispatched loop's epochs 3-23x while the fused epoch held
    its wall (PERF.md round-5 section). It is the bench.py timing-loop
    pattern applied to training.

    Returns (train_epoch, eval_epoch):
      train_epoch(params, opt_state, g_acc, store, idx, rngs, boundaries,
                  kl_coeff) -> (params, opt_state, g_acc, stacked_metrics)
      eval_epoch(params, store, idx, rngs, kl_coeff) -> stacked_metrics
    ``idx`` is (num_batches, B) int32; stacked metrics match the per-step
    dicts leaf-for-leaf with a leading num_batches axis."""
    losses = make_loss_fn(vae, loss_name)

    def _apply(params, opt_state, g_acc):
        updates, opt_state = optimizer.update(g_acc, opt_state, params)
        params = optax.apply_updates(params, updates)
        g_acc = jax.tree_util.tree_map(jnp.zeros_like, g_acc)
        return params, opt_state, g_acc

    donate = () if jax.config.jax_debug_nans else (0, 1, 2)

    @partial(jax.jit, donate_argnums=donate)
    def train_epoch(params, opt_state, g_acc, store, idx, rngs, boundaries,
                    kl_coeff):
        from .accum import accumulate_clipped
        from ..models.layers import train_trace

        def body(carry, xs):
            params, opt_state, g_acc = carry
            ids, r, boundary = xs
            batch = {k: jnp.take(v, ids, axis=0) for k, v in store.items()}
            with train_trace():
                (_, metrics), grads = jax.value_and_grad(
                    losses, has_aux=True)(params, batch, r, kl_coeff)
            g_acc = accumulate_clipped(g_acc, grads, ~metrics["bad"],
                                       accum_steps)
            params, opt_state, g_acc = jax.lax.cond(
                jnp.logical_and(~metrics["bad"], boundary),
                _apply, lambda p, o, g: (p, o, g), params, opt_state, g_acc)
            return (params, opt_state, g_acc), metrics

        (params, opt_state, g_acc), metrics = jax.lax.scan(
            body, (params, opt_state, g_acc), (idx, rngs, boundaries))
        return params, opt_state, g_acc, metrics

    @jax.jit
    def eval_epoch(params, store, idx, rngs, kl_coeff):
        def body(carry, xs):
            ids, r = xs
            batch = {k: jnp.take(v, ids, axis=0) for k, v in store.items()}
            _, metrics = losses(params, batch, r, kl_coeff)
            return carry, metrics

        _, metrics = jax.lax.scan(body, 0, (idx, rngs))
        return metrics

    return train_epoch, eval_epoch


def stacked_to_dicts(stacked) -> list:
    """(leading-axis-stacked metrics pytree) -> per-step list of dicts, the
    shape scan_train_metrics consumes."""
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return [{k: v[i] for k, v in stacked.items()} for i in range(n)]


def scan_train_metrics(metricses, kl_abort: float = 1000.0):
    """Replay the reference's per-batch host decisions over an epoch's
    FETCHED metrics (train_3d_vae_only.py:399-433): skipped batches are
    excluded from the running sums; the first non-skipped batch whose raw KL
    exceeds ``kl_abort`` stops the scan (the reference sys.exit(1)s there
    mid-epoch — deferring the exit to the epoch boundary is observably
    identical because nothing after the explosion is ever persisted).

    Returns (recons_sum, kl_sum, skipped_indices, exploded_kl_or_None).
    """
    recons_sum = kl_sum = 0.0
    skipped = []
    for bi, m in enumerate(metricses):
        if bool(m["bad"]):
            skipped.append(bi)
        elif float(m["kl"]) > kl_abort:
            return recons_sum, kl_sum, skipped, float(m["kl"])
        else:
            recons_sum += float(m["recons"])
            kl_sum += float(m["kl"])
    return recons_sum, kl_sum, skipped, None


def loader_shuffle_order(n: int, seed: int, epoch: int,
                         shuffle: bool) -> np.ndarray:
    """Replay NumpyLoader's epoch-``set_epoch`` shuffle stream
    (data/dataset.py:585-590) without a loader: the device-resident data
    path visits EXACTLY the batches (same order, same membership) the
    streaming path would, so the two paths run the same optimizer updates."""
    order = np.arange(n)
    if shuffle:
        np.random.default_rng((seed, epoch)).shuffle(order)
    return order


def build_device_store(subset, transform, *, mesh=None):
    """One pass over an indexable subset -> device-resident stacked arrays
    (row i == subset sample i), the VAE-trainer analog of the diffusion
    trainer's --cache-latents: through a thin host<->device link the
    per-epoch re-upload of identical volumes is the dominant epoch cost
    (BENCH_EPOCH_r04: wall 6.5-11x the device bound), so upload ONCE and
    gather batches on device. ``transform(sample)`` returns the (already
    normalized) np arrays to store. Under a mesh, rows are sharded over the
    'data' axis (helper._shard_cache_rows)."""
    rows = [transform(subset[i]) for i in range(len(subset))]
    store = {k: jnp.asarray(np.stack([r[k] for r in rows]))
             for k in rows[0]}
    if mesh is not None:
        from .helper import _shard_cache_rows
        store = _shard_cache_rows(store, mesh)
    return store


def main(argv=None):
    args = parse_args(argv)
    if args.device:
        jax.config.update("jax_platforms", args.device)
    print("=" * 60 + "\nSTAGE 1: Training 3D VAE Only\n" + "=" * 60)
    from diffusion_model_project_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    if not os.path.exists(args.dataset_dir):
        print(f"ERROR: Dataset directory not found: {args.dataset_dir}")
        sys.exit(1)
    os.makedirs(args.save_dir, exist_ok=True)

    full_dataset = MicroFlowDatasetVAE(args.dataset_dir, augment=args.augment)
    n = full_dataset.num_microstructures
    indices_3d = list(range(n, 2 * n))  # is_2d == False <=> idx >= N
    num = len(indices_3d)
    train_size = int(0.7 * num)
    val_size = int(0.15 * num)
    test_size = num - train_size - val_size
    tr, va, te = torch_random_split_indices(num, (train_size, val_size, test_size),
                                            seed=args.seed)

    class Subset:
        def __init__(self, idx):
            self.idx = [indices_3d[i] for i in idx]

        def __len__(self):
            return len(self.idx)

        def __getitem__(self, i):
            return full_dataset[self.idx[i]]

        def set_epoch(self, epoch):  # deterministic-resume augmentation
            full_dataset.set_epoch(epoch)

    train_loader = NumpyLoader(Subset(tr), args.batch_size, shuffle=True, seed=args.seed)
    val_loader = NumpyLoader(Subset(va), args.batch_size)
    test_loader = NumpyLoader(Subset(te), args.batch_size)
    print(f"Train: {train_size}, Val: {val_size}, Test: {test_size}")

    stats_file = osp.join(args.dataset_dir, "statistics.json")
    if not os.path.exists(stats_file):
        print(f"ERROR: statistics.json not found at {stats_file}")
        sys.exit(1)
    with open(stats_file) as f:
        statistics = json.load(f)
    norm_factors = norm_factors_from_stats(statistics, args.norm_mode)
    nf = jnp.asarray(norm_factors).reshape(1, 3, 1, 1, 1)

    vae = Stage1VAE(args.in_channels, args.latent_channels,
                    features=args.features)
    sample0 = full_dataset[indices_3d[0]]
    c, d, h, w = sample0["velocity"].shape
    params = vae.init(jax.random.key(args.seed), (1, d, h, w, c))
    optimizer = optax.adam(args.learning_rate)
    opt_state = optimizer.init(params)
    train_step, apply_step, eval_step = make_steps(
        vae, args.loss_function, optimizer, accum_steps=args.grad_accum)

    log_dict = {
        "loss": {"recons_train": [], "recons_val": [], "kl_train": [],
                 "kl_val": [], "kl_coeff": []},
        "in_channels": args.in_channels,
        "latent_channels": args.latent_channels,
        # extension: stage widths (reference hardwires (128, 256, 512));
        # loaders derive widths from param shapes, this is informational
        "features": list(vae.features),
        "per_component_norm": True,
        "norm_mode": args.norm_mode,
        "norm_factors": norm_factors.tolist(),
        "conditional": False,  # stage 1 overrides conditional to False
        "loss_function": args.loss_function,
        # extension: per-epoch wall seconds (diffusion log.json has "time";
        # the reference vae_log has none) — feeds the epoch-scale bench
        "epoch_time": [],
    }
    best_val_loss = float("inf")
    rng = jax.random.key(args.seed + 1)
    min_kl = 1e-5

    from ..utils.async_ckpt import AsyncCheckpointWriter, device_snapshot
    ckpt_writer = AsyncCheckpointWriter()

    def save(folder, params, log):
        # weights then log through the same FIFO writer: a crash can leave
        # the log an epoch behind the weights but never ahead (the log is
        # encoded eagerly because log_dict mutates next epoch).
        # device_snapshot: train_step DONATES params, so the queued tree must
        # be an on-device copy or the next epoch's first step deletes the
        # buffers under the writer thread (see utils/async_ckpt).
        ckpt_writer.submit(osp.join(folder, "vae.msgpack"),
                           device_snapshot(params))
        ckpt_writer.submit(osp.join(folder, "vae_log.json"),
                           json.dumps(log, indent=2).encode(), serialize=bytes)

    # accumulated gradients persist ACROSS epochs like the reference's .grad
    # buffers (zeroed only after an optimizer step): if the last batch of an
    # epoch is skipped exactly on an accumulation boundary, the window's
    # gradients carry into the next epoch's first step instead of vanishing
    g_acc = jax.tree_util.tree_map(jnp.zeros_like, params)

    # full-state resume (params + optimizer moments + the cross-epoch grad
    # buffer + counters) — the reference can only restart stage 1 from scratch
    from flax import serialization
    start_epoch = 0
    state_path = osp.join(args.save_dir, "train_state.msgpack")
    if args.resume:
        with open(state_path, "rb") as f:
            state = serialization.msgpack_restore(f.read())
        params = serialization.from_state_dict(params, state["params"])
        opt_state = serialization.from_state_dict(opt_state, state["opt_state"])
        g_acc = serialization.from_state_dict(g_acc, state["g_acc"])
        start_epoch = int(state["epoch"]) + 1
        best_val_loss = float(state["best_val_loss"])
        with open(osp.join(args.save_dir, "vae_log.json")) as f:
            prev = json.load(f)
        for key in log_dict["loss"]:
            log_dict["loss"][key] = prev["loss"].get(key, [])[:start_epoch]
        log_dict["epoch_time"] = prev.get("epoch_time", [])[:start_epoch]
        print(f"Resumed from {state_path} at epoch {start_epoch} "
              f"(best val loss {best_val_loss:.6f})")

    # best among epochs whose checkpoint actually wrote (--ckpt-freq
    # gating): fresh run -> nothing saved; resume -> the restored tracker
    # (can sit below the true saved best at freq>1, which errs safe — the
    # on-disk best_model is never overwritten by a worse epoch)
    best_saved_loss = best_val_loss

    # optional TensorBoard mirror of vae_log.json (utils/tb.py); purge_step
    # on resume drops abandoned-epoch events like the JSON truncation above
    from ..utils.tb import TensorBoardLogger
    tb = TensorBoardLogger(
        osp.join(args.save_dir, "tb") if getattr(args, "tensorboard", False)
        else None,
        purge_step=start_epoch if args.resume else None)

    # data-parallel mesh: the reference wraps THIS trainer in
    # torch.nn.DataParallel when >1 GPU is visible (train_3d_vae_only.py:
    # 310-312); here the mesh shards batches over ICI and XLA inserts the
    # gradient psum. Entered after resume so restored arrays re-replicate.
    from ..parallel import maybe_shard_batch  # no-op when mesh is None

    mesh = None
    if args.data_parallel and jax.device_count() > 1:
        from ..parallel import make_mesh, replicate

        mesh = make_mesh(("data",))
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        g_acc = replicate(g_acc, mesh)
        print(f"Data-parallel mesh over {jax.device_count()} devices")

    # --cache-data: normalized volumes uploaded ONCE and gathered on device
    # per batch (replaying the loader's exact shuffle stream) — the epoch's
    # host->device traffic drops from ~1 GB to an index array. Normalization
    # happens on host with the same np divide the streaming path applies,
    # so both paths feed bit-identical batches to the same jitted step.
    sample_bytes = (sample0["velocity"].nbytes
                    + sample0["microstructure"].nbytes)
    est_bytes = (train_size + val_size) * sample_bytes
    cache_data = (args.cache_data == "true"
                  or (args.cache_data == "auto"
                      and est_bytes <= args.cache_data_cap_gb * 2**30))
    if args.augment and cache_data:
        if args.cache_data == "true":
            raise ValueError(
                "--cache-data true is incompatible with --augment (flips "
                "are applied host-side in the streaming path); drop one")
        cache_data = False
    train_store = val_store = None
    if cache_data:
        t0s = time.time()
        nf0 = np.asarray(nf)[0]  # (3,1,1,1): per-sample == batched divide
        tx = lambda s: {  # noqa: E731
            "velocity": (s["velocity"] / nf0).astype(np.float32),
            "microstructure": s["microstructure"]}
        train_store = build_device_store(train_loader.dataset, tx, mesh=mesh)
        val_store = build_device_store(val_loader.dataset, tx, mesh=mesh)
        mb = sum(v.size * v.dtype.itemsize
                 for st in (train_store, val_store)
                 for v in st.values()) / 2**20
        print(f"Device data store: {train_size}+{val_size} volumes, "
              f"{mb:.0f} MB resident "
              f"({time.time() - t0s:.1f}s one-time build+upload)")
        train_epoch_fn, eval_epoch_fn = make_epoch_steps(
            vae, args.loss_function, optimizer, accum_steps=args.grad_accum)
    elif args.cache_data == "auto" and not args.augment:
        print(f"--cache-data auto: {est_bytes / 2**30:.1f} GB exceeds the "
              f"{args.cache_data_cap_gb:.1f} GB cap; streaming batches")

    # SIGTERM/SIGINT (TPU-VM preemption, Ctrl-C) stops within one batch,
    # discards the partial epoch, drains the writer, exits cleanly
    from ..utils.preempt import GracefulShutdown
    preempted = False
    with GracefulShutdown() as shutdown:
        for epoch in range(start_epoch, args.num_epochs):
            t0 = time.time()
            # deterministic resume: noise chain, shuffle order, and
            # augmentation draws are pure functions of (seed, epoch)
            rng = jax.random.fold_in(jax.random.key(args.seed + 1), epoch)
            for loader in (train_loader, val_loader):
                loader.set_epoch(epoch)
            if epoch < args.kl_warmup_epochs:
                kl_coeff = min_kl + (args.max_kl_coeff - min_kl) * (epoch / args.kl_warmup_epochs)
            else:
                kl_coeff = args.max_kl_coeff
            print(f"\nEpoch {epoch + 1}/{args.num_epochs} - KL coefficient: {kl_coeff:.6f}")

            # per-batch metrics stay ON DEVICE during the loop; the single
            # device_get after it is the epoch's only train-loop host sync
            # (the run_epoch pattern, helper.py:177-203; VERDICT r4 weak #1)
            metricses = []
            i = -1
            if cache_data:
                # fused epoch: ONE dispatch runs every full batch (scan over
                # the device store, make_epoch_steps); a ragged final batch
                # reuses the per-step path. Preemption granularity becomes
                # one epoch on this path (seconds) instead of one batch.
                if shutdown.requested:
                    preempted = True
                    break
                bs = args.batch_size
                order = loader_shuffle_order(train_size, args.seed, epoch,
                                             shuffle=True)
                num_b = (train_size + bs - 1) // bs
                n_full = train_size // bs
                rng, step_keys = split_chain(rng, num_b)
                boundaries = np.asarray(
                    [(t + 1) % args.grad_accum == 0 for t in range(num_b)])
                if n_full:
                    idx = jnp.asarray(
                        order[:n_full * bs].reshape(n_full, bs))
                    params, opt_state, g_acc, stacked = train_epoch_fn(
                        params, opt_state, g_acc, train_store, idx,
                        step_keys[:n_full],
                        jnp.asarray(boundaries[:n_full]), kl_coeff)
                    metricses = stacked_to_dicts(stacked)
                    i = n_full - 1
                if train_size % bs:
                    rem = jnp.asarray(order[n_full * bs:])
                    batch = maybe_shard_batch(
                        {k: jnp.take(v, rem, axis=0)
                         for k, v in train_store.items()}, mesh)
                    params, opt_state, g_acc, metrics = train_step(
                        params, opt_state, g_acc, batch, step_keys[-1],
                        kl_coeff, bool(boundaries[-1]))
                    metricses.append(metrics)
                    i = num_b - 1
            else:
                train_iter = (maybe_shard_batch(
                    {"velocity": b["velocity"] / np.asarray(nf),
                     "microstructure": b["microstructure"]}, mesh)
                    for b in train_loader)
                for i, batch in enumerate(train_iter):
                    if shutdown.requested:
                        preempted = True
                        break
                    rng, r = jax.random.split(rng)
                    params, opt_state, g_acc, metrics = train_step(
                        params, opt_state, g_acc, batch, r, kl_coeff,
                        (i + 1) % args.grad_accum == 0)
                    metricses.append(metrics)
            if preempted:
                break  # partial epoch discarded; state is at the last boundary
            running_recons, running_kl, skipped_batches, exploded_kl = \
                scan_train_metrics(jax.device_get(metricses))
            for bi in skipped_batches:
                print(f"  Skipping batch {bi} due to bad mu/logvar values")
            if exploded_kl is not None:
                # nothing after the explosion is saved, so the deferred exit
                # is observably identical to the reference's mid-epoch one
                print(f"  ERROR: KL loss exploded to {exploded_kl:.2f}! "
                      f"Training unstable.")
                sys.exit(1)
            if i >= 0 and (i + 1) % args.grad_accum != 0:
                params, opt_state = apply_step(params, opt_state, g_acc)
                g_acc = jax.tree_util.tree_map(jnp.zeros_like, params)
            if i == -1:
                print("ERROR: No training batches found!")
                continue
            avg_recons_train = running_recons / (i + 1)
            avg_kl_train = running_kl / (i + 1)

            val_metricses = []
            j = -1
            if cache_data:
                if shutdown.requested:
                    preempted = True
                    break
                bs = args.batch_size
                num_vb = (val_size + bs - 1) // bs
                nv_full = val_size // bs
                rng, vkeys = split_chain(rng, num_vb)
                if nv_full:
                    vidx = jnp.asarray(
                        np.arange(nv_full * bs).reshape(nv_full, bs))
                    val_metricses = stacked_to_dicts(eval_epoch_fn(
                        params, val_store, vidx, vkeys[:nv_full], kl_coeff))
                    j = nv_full - 1
                if val_size % bs:
                    rem = jnp.asarray(np.arange(nv_full * bs, val_size))
                    batch = maybe_shard_batch(
                        {k: jnp.take(v, rem, axis=0)
                         for k, v in val_store.items()}, mesh)
                    val_metricses.append(
                        eval_step(params, batch, vkeys[-1], kl_coeff))
                    j = num_vb - 1
            else:
                val_iter = (maybe_shard_batch(
                    {"velocity": b["velocity"] / np.asarray(nf),
                     "microstructure": b["microstructure"]}, mesh)
                    for b in val_loader)
                for j, batch in enumerate(val_iter):
                    if shutdown.requested:
                        preempted = True
                        break
                    rng, r = jax.random.split(rng)
                    val_metricses.append(
                        eval_step(params, batch, r, kl_coeff))
            if preempted:
                break
            val_recons = val_kl = 0.0
            for m in jax.device_get(val_metricses):
                val_recons += float(m["recons"])
                val_kl += float(m["kl"])
            avg_recons_val = val_recons / max(j + 1, 1)
            avg_kl_val = val_kl / max(j + 1, 1)

            log_dict["loss"]["recons_train"].append(avg_recons_train)
            log_dict["loss"]["kl_train"].append(avg_kl_train)
            log_dict["loss"]["recons_val"].append(avg_recons_val)
            log_dict["loss"]["kl_val"].append(avg_kl_val)
            log_dict["loss"]["kl_coeff"].append(kl_coeff)
            log_dict["epoch_time"].append(time.time() - t0)
            tb.add_scalars(
                epoch, {k: v[-1] for k, v in log_dict["loss"].items()},
                prefix="loss/")

            val_loss = avg_recons_val + kl_coeff * avg_kl_val
            # best tracked EVERY epoch (resume semantics); the WRITE is
            # best-on-grid under --ckpt-freq, exactly like the diffusion
            # trainer (train_diffusion.py:396-447): an off-grid improvement
            # must not suppress a later grid epoch's best write
            if val_loss < best_val_loss:
                best_val_loss = val_loss
            ckpt_freq = max(1, int(args.ckpt_freq or 1))
            save_this_epoch = (epoch % ckpt_freq == 0
                               or epoch == args.num_epochs - 1)

            def write_checkpoint_set():
                nonlocal best_saved_loss
                save(args.save_dir, params, log_dict)
                if val_loss < best_saved_loss:
                    best_saved_loss = val_loss
                    ckpt_writer.submit(
                        osp.join(args.save_dir, "best_model.msgpack"),
                        device_snapshot(params))
                ckpt_writer.submit(state_path, device_snapshot({
                    "params": params,
                    "opt_state": serialization.to_state_dict(opt_state),
                    "g_acc": g_acc,
                    "epoch": np.int64(epoch),
                    "best_val_loss": np.float64(best_val_loss),
                }))

            if save_this_epoch:
                write_checkpoint_set()
            print(f"Epoch {epoch + 1}: recons {avg_recons_train:.6f}/{avg_recons_val:.6f} "
                  f"kl {avg_kl_train:.2f}/{avg_kl_val:.2f} time {time.time() - t0:.1f}s")
            if shutdown.requested:
                # a graceful stop leaves THIS epoch on disk even when
                # --ckpt-freq gated the regular write above
                if not save_this_epoch:
                    write_checkpoint_set()
                preempted = True
                break

    try:
        ckpt_writer.close()  # every queued write landed (or raises its failure)
    finally:
        tb.close()

    if preempted:
        if os.path.exists(state_path):
            print(f"Preempted; completed epochs are on disk. Resume with:\n"
                  f"  --save-dir {args.save_dir} --resume", flush=True)
        else:
            print("Preempted before the first epoch completed; nothing saved.",
                  flush=True)
        return params, log_dict

    # final test evaluation (same fetch-once pattern as the epoch loops)
    rng = jax.random.fold_in(jax.random.key(args.seed + 1), args.num_epochs)
    test_metricses = []
    k = -1
    for k, batch in enumerate(test_loader):
        batch = maybe_shard_batch(
            {"velocity": batch["velocity"] / np.asarray(nf),
             "microstructure": batch["microstructure"]}, mesh)
        rng, r = jax.random.split(rng)
        test_metricses.append(eval_step(params, batch, r, args.max_kl_coeff))
    if k >= 0:
        test_recons = sum(float(m["recons"])
                          for m in jax.device_get(test_metricses))
        print(f"\nTest reconstruction loss: {test_recons / (k + 1):.6f}")
    return params, log_dict


if __name__ == "__main__":
    main()
