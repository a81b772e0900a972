#!/usr/bin/env python
"""End-to-end evaluation of the latent diffusion pipeline on the test set.

Flag-compatible with the reference scripts/eval_testset_end2end.py: two modes
(end-to-end diffusion: 2D input -> E2D -> DDIM/DDPM -> D3D vs --sanity-mode
VAE-only: GT -> E3D -> D3D), per-sample seeded noise (seed + sample_idx),
masked metric suite, mean/std/min/max aggregation, JSON + optional CSV
reports, and the samples/sec throughput print.

TPU-native: the whole per-sample pipeline is one jitted program; the reverse
process is a fused lax.scan. Per-sample noise uses jax.random.key(seed+idx)
(torch noise streams are not reproducible cross-framework); use
--noise-dir <dir> with <idx>.npy files to inject reference-generated noise
for exact parity runs.
"""
import argparse
import csv
import json
import os
import os.path as osp
import sys
import time
from datetime import datetime

import numpy as np

sys.path.insert(0, osp.abspath(osp.join(osp.dirname(__file__), "..")))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusion_model_project_tpu.losses.eval_metrics import (  # noqa: E402
    compute_accuracy_score, compute_all_metrics)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="End-to-end evaluation of latent diffusion pipeline on test set")
    parser.add_argument("--diffusion-model-path", type=str, required=True,
                        help="Path to trained diffusion model directory")
    parser.add_argument("--vae-path", type=str, default=None)
    parser.add_argument("--vae-encoder-path", type=str, default=None)
    parser.add_argument("--vae-decoder-path", type=str, default=None)
    parser.add_argument("--dataset-dir", type=str, required=True)
    parser.add_argument("--split", type=str, default="test",
                        choices=["train", "valid", "test"])
    parser.add_argument("--index", type=int, default=None)
    parser.add_argument("--num-samples", type=int, default=None)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--sampler", type=str, default="ddim",
                        choices=["ddpm", "ddim", "dpm"],
                        help="dpm = DPM-Solver++(2M), beyond the reference: "
                             "~DDIM-50 quality in ~10 steps")
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--batch-size", type=int, default=1,
                        help="Samples predicted per device dispatch (per-sample "
                             "seeded noise is preserved, so deterministic-sampler "
                             "results are batch-size-independent; ~45%% faster "
                             "per volume at 8 on a v5e)")
    parser.add_argument("--save-csv", type=str, default=None)
    parser.add_argument("--save-npz-preds", action="store_true")
    parser.add_argument("--output-dir", type=str, default=None)
    parser.add_argument("--sanity-mode", action="store_true",
                        help="VAE-ONLY mode: bypass diffusion, test VAE reconstruction only")
    parser.add_argument("--cross-mode", action="store_true",
                        help="VAE-ONLY cross path: 2D input -> E2D -> D3D, "
                             "no diffusion — the composed conditioning+"
                             "decode ceiling sitting between --sanity-mode "
                             "(E3D -> D3D) and the full sampler rows; "
                             "measures what the stage-2 alignment + frozen "
                             "decoder give before any sampler error")
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--int8", action="store_true",
                        help="int8 frozen-VAE fast path (the serve.py knob) "
                             "for measuring its end-to-end accuracy cost")
    parser.add_argument("--use-ema", action="store_true",
                        help="Prefer ema_model.msgpack (written by train.py "
                             "--ema-decay) over best_model/model weights")
    parser.add_argument("--noise-dir", type=str, default=None,
                        help="Directory with <sample_idx>.npy initial-noise tensors "
                             "(channels-first) for exact parity with reference runs")
    parser.add_argument("--torch-noise", action="store_true",
                        help="Draw the initial noise with torch.manual_seed(seed+idx) "
                             "exactly like the reference (eval:806-810), so DDIM "
                             "eta=0 results are directly comparable to reference "
                             "runs on the same checkpoints")
    parser.add_argument("--precision", type=str, default=None,
                        choices=["default", "high", "highest"],
                        help="jax matmul/conv precision (use 'highest' for "
                             "numerical-fidelity runs on TPU)")
    args = parser.parse_args(argv)
    if bool(args.vae_encoder_path) != bool(args.vae_decoder_path):
        parser.error(
            "--vae-encoder-path and --vae-decoder-path must be given "
            "together (one alone would be silently ignored and the model "
            "dir's logged VAE paths used instead)")
    return args


def load_model_and_config(args, image_hw):
    from diffusion_model_project_tpu.utils.checkpoint import (
        load_diffusion_torch_checkpoint, load_predictor_state)
    from diffusion_model_project_tpu.training.helper import get_norm_params
    from diffusion_model_project_tpu.utils.checkpoint import build_predictor

    with open(osp.join(args.diffusion_model_path, "log.json")) as f:
        log_data = json.load(f)
    predictor_kwargs = dict(log_data["params"]["training"]["predictor"])
    # VAE paths from CLI override the (possibly machine-specific) logged paths
    if args.vae_path or (args.vae_encoder_path and args.vae_decoder_path):
        predictor_kwargs["vae_path"] = args.vae_path
        predictor_kwargs["vae_encoder_path"] = args.vae_encoder_path
        predictor_kwargs["vae_decoder_path"] = args.vae_decoder_path
    pred, vae_norm_factors = build_predictor(predictor_kwargs, image_hw=image_hw)

    # diffusion weights: best_model first (reference inference.py:48-55);
    # --use-ema prefers the EMA weights written by train.py --ema-decay
    from diffusion_model_project_tpu.utils.checkpoint import diffusion_weight_chain
    chain = diffusion_weight_chain(use_ema=getattr(args, "use_ema", False),
                                   folder=args.diffusion_model_path)
    for name in chain:
        path = osp.join(args.diffusion_model_path, name)
        if osp.exists(path):
            if name.endswith(".msgpack"):
                pred = load_predictor_state(pred, path)
            else:
                num_levels = len(predictor_kwargs["model_kwargs"]["features"])
                pred = load_diffusion_torch_checkpoint(pred, path, num_levels)
            print(f"Loaded diffusion weights from {path}")
            break
    else:
        raise FileNotFoundError(f"No model weights in {args.diffusion_model_path}")

    stats_file = osp.join(args.dataset_dir, "statistics.json")
    if vae_norm_factors is not None:
        norm_factors = tuple(vae_norm_factors)
    else:
        norm_factors = tuple(get_norm_params(stats_file)["output"])
        pred = pred.set_normalizer({"output": list(norm_factors)})
    if getattr(args, "int8", False):
        # frozen-VAE int8 fast path (scripts/serve.py has the same knob) —
        # lets the sampler study quote int8 accuracy on a REAL trained
        # checkpoint instead of random-weight error bounds (VERDICT r3 #1)
        pred = pred.with_vae_int8()
        print("int8 frozen-VAE path enabled")
    return pred, norm_factors


def run_evaluation(predictor, test_dataset, norm_factors, *, sampler="ddim",
                   num_steps=50, seed=42, sanity_mode=False, cross_mode=False,
                   num_samples=None,
                   single_index=None, noise_dir=None, torch_noise=False,
                   save_npz_dir=None, batch_size=1):
    if sanity_mode and cross_mode:
        raise ValueError("--sanity-mode and --cross-mode are exclusive")
    if sampler == "ddpm" and batch_size > 1:
        raise ValueError(
            "--sampler ddpm requires --batch-size 1: the ancestral noise "
            "stream is seeded per sample, which a shared batched scan cannot "
            "preserve (per-sample results would depend on batch position). "
            "Use ddim/dpm for batched evaluation.")
    per_sample_results = []
    sanity_stats = {k: [] for k in (
        "pred_min", "pred_max", "pred_mean", "pred_std",
        "target_min", "target_max", "target_mean", "target_std")}

    total_available = len(test_dataset)
    if single_index is not None:
        if not 0 <= single_index < total_available:
            raise ValueError(f"Index {single_index} out of range [0, {total_available - 1}]")
        sample_indices = [single_index]
    elif num_samples is not None:
        sample_indices = list(range(min(num_samples, total_available)))
    else:
        sample_indices = list(range(total_available))
    total = len(sample_indices)

    print("=" * 60)
    if sanity_mode:
        print(f"VAE-ONLY SANITY CHECK on {total} sample(s)  (GT -> E3D -> D3D)")
    elif cross_mode:
        print(f"VAE-ONLY CROSS CHECK on {total} sample(s)  (2D -> E2D -> D3D)")
    else:
        print(f"END-TO-END DIFFUSION EVALUATION on {total} sample(s)")
        print(f"    2D input -> E2D -> {sampler.upper()} ({num_steps} steps) -> D3D")
    print("=" * 60)

    # jitted pipelines (compiled once, reused across samples)
    if sanity_mode:
        @jax.jit
        def predict_fn(pred, img, v2d, target, noise, rng):
            v_cl = jnp.moveaxis(target, 2, -1)
            v_norm = pred.norm_output.normalize(v_cl, channel_axis=-1)
            mu, _ = pred.vae.apply({"params": pred.vae_params}, v_norm,
                                   method="encode_3d_deterministic")
            recon = pred.vae.apply({"params": pred.vae_params}, mu, method="decode_3d")
            recon = pred.norm_output.inverse(recon, channel_axis=-1)
            return jnp.moveaxis(recon, -1, 2) * img
    elif cross_mode:
        @jax.jit
        def predict_fn(pred, img, v2d, target, noise, rng):
            # the composed conditioning+decode ceiling: normalize the 2D
            # input with the SAME output normalizer stage-2 trained under,
            # take E2D's deterministic mu, decode through the frozen D3D
            v_cl = jnp.moveaxis(v2d, 2, -1)
            v_norm = pred.norm_output.normalize(v_cl, channel_axis=-1)
            mu, _ = pred.vae.apply({"params": pred.vae_params}, v_norm,
                                   method="encode_2d_deterministic")
            recon = pred.vae.apply({"params": pred.vae_params}, mu, method="decode_3d")
            recon = pred.norm_output.inverse(recon, channel_axis=-1)
            return jnp.moveaxis(recon, -1, 2) * img
    elif sampler == "ddim":
        @jax.jit
        def predict_fn(pred, img, v2d, target, noise, rng):
            return pred.predict_ddim(img, v2d, num_steps=num_steps, eta=0.0,
                                     noise=noise, rng=rng)
    elif sampler == "dpm":
        @jax.jit
        def predict_fn(pred, img, v2d, target, noise, rng):
            return pred.predict_dpm(img, v2d, num_steps=num_steps,
                                    noise=noise, rng=rng)
    else:
        @jax.jit
        def predict_fn(pred, img, v2d, target, noise, rng):
            # rng drives the per-step ancestral noise; without it every
            # sample would reuse the same DDPM noise stream
            return pred.predict(img, v2d, noise=noise, rng=rng)

    def _sample_noise(sample_idx, ld, lh, lw):
        """Initial latents for one sample: (latent_depth, C, lh, lw) — the
        reference probes the VAE's real latent depth (eval:793-810), so a
        vae_depth_factor>1 model draws ld = S//factor slices, not S."""
        if noise_dir is not None:
            return jnp.asarray(np.load(osp.join(noise_dir, f"{sample_idx}.npy")))
        if torch_noise:
            # reference-identical stream: torch.manual_seed(seed + idx) then
            # torch.randn (scripts/eval_testset_end2end.py:806-810)
            import torch
            torch.manual_seed(seed + sample_idx)
            return jnp.asarray(torch.randn(
                ld, predictor.latent_channels, lh, lw).numpy())
        return jax.random.normal(
            jax.random.key(seed + sample_idx),
            (ld, predictor.latent_channels, lh, lw))

    def _dispatch(chunk):
        """Host-side prep of a chunk of samples + async device dispatch.

        A chunk shorter than batch_size is padded by repeating its last
        sample (keeps one compiled shape); padded outputs are dropped by the
        caller. Per-sample noise stays seeded by (seed + sample_idx) so
        results are batch-size-independent for the deterministic samplers.
        """
        true_n = len(chunk)
        padded = list(chunk) + [chunk[-1]] * (batch_size - true_n)
        datas = [test_dataset[i] for i in padded]
        # host numpy stacks; the jit dispatch transfers what the device
        # needs, and the metric loop reads these directly (no D2H fetch-back)
        img = np.stack([d["microstructure"] for d in datas])
        velocity_2d = np.stack([d["velocity_input"] for d in datas])
        target = np.stack([d["velocity"] for d in datas])

        if sanity_mode or cross_mode:
            # the VAE-only paths ignore the initial latents; drawing (or
            # np.load-ing, for --noise-dir) them would waste work or crash
            noise, target_arg = None, (target if sanity_mode else None)
        else:
            ld = velocity_2d.shape[1] // predictor.vae_depth_factor
            lh, lw = img.shape[-2] // 4, img.shape[-1] // 4
            noise = jnp.stack([_sample_noise(i, ld, lh, lw) for i in padded])
            # the samplers never read the target; None (an empty pytree)
            # skips its H2D transfer entirely
            target_arg = None

        pred_dev = predict_fn(predictor, img, velocity_2d, target_arg, noise,
                              jax.random.key(seed + chunk[0]))
        return img, target, pred_dev

    chunks = [sample_indices[i:i + batch_size]
              for i in range(0, total, batch_size)]

    # Software-pipelined loop: chunk i+1 is prepared and dispatched to the
    # device BEFORE chunk i's result is fetched, so host-side work (noise
    # gen, metric numpy reductions, npz writes) overlaps device sampling.
    # time_sec is the per-sample pipeline time (gap between consecutive
    # result completions / chunk size). NB the FIRST chunk's time includes
    # jit trace+compile (minutes through the TPU tunnel on a cold cache) —
    # the steady-state rate printed at the end excludes it.
    start_time = time.time()
    inflight = None  # (chunk, first_eval_idx, img, target, pred_dev)
    last_done = start_time
    eval_idx = 0
    for step in range(len(chunks) + 1):
        nxt = None
        if step < len(chunks):
            chunk = chunks[step]
            img, target, pred_dev = _dispatch(chunk)
            nxt = (chunk, img, target, pred_dev)
        if inflight is None:
            inflight = nxt
            continue
        chunk, img, target, pred_dev = inflight
        inflight = nxt

        predictions = np.asarray(jax.block_until_ready(pred_dev))
        now = time.time()
        sample_time = (now - last_done) / len(chunk)
        last_done = now

        assert predictions.shape[1:] == np.asarray(target).shape[1:], \
            f"Shape mismatch: pred {predictions.shape} vs target {target.shape}"

        targets_np = np.asarray(target)
        imgs_np = np.asarray(img)
        for j, sample_idx in enumerate(chunk):
            prediction = predictions[j:j + 1]
            target_np = targets_np[j:j + 1]
            metrics = compute_all_metrics(prediction, target_np, norm_factors,
                                          mask=imgs_np[j:j + 1],
                                          compute_optional=True)
            metrics["sample_id"] = sample_idx
            metrics["time_sec"] = sample_time
            metrics["accuracy_score"] = compute_accuracy_score(metrics["nmae_total"])
            per_sample_results.append(metrics)

            if save_npz_dir is not None:
                np.savez(osp.join(save_npz_dir, f"pred_{sample_idx:04d}.npz"),
                         prediction=prediction, target=target_np)

            sanity_stats["pred_min"].append(float(prediction.min()))
            sanity_stats["pred_max"].append(float(prediction.max()))
            sanity_stats["pred_mean"].append(float(prediction.mean()))
            sanity_stats["pred_std"].append(float(prediction.std()))
            sanity_stats["target_min"].append(float(target_np.min()))
            sanity_stats["target_max"].append(float(target_np.max()))
            sanity_stats["target_mean"].append(float(target_np.mean()))
            sanity_stats["target_std"].append(float(target_np.std()))

            eval_idx += 1
            elapsed = time.time() - start_time
            samples_per_sec = eval_idx / elapsed if elapsed > 0 else 0
            mode_prefix = ("[VAE]" if sanity_mode
                           else "[XVAE]" if cross_mode else "[DIFF]")
            print(f"{mode_prefix} Sample {sample_idx:4d} ({eval_idx}/{total}) | "
                  f"nMAE={metrics['nmae_total']:.4f} | "
                  f"Acc={metrics['accuracy_score']:.4f} | "
                  f"Time={sample_time:.2f}s | "
                  f"Speed={samples_per_sec:.2f} samples/sec")

    total_time = time.time() - start_time
    print(f"\nTotal evaluation time: {total_time:.2f}s")
    print(f"Average time per sample: {total_time / max(1, len(per_sample_results)):.2f}s")
    if chunks and len(per_sample_results) > len(chunks[0]):
        # exclude the first chunk: its time_sec carries the one-off jit
        # trace+compile, which would overstate the per-sample cost
        steady = [r["time_sec"] for r in per_sample_results[len(chunks[0]):]]
        print(f"Steady-state (excl. first-chunk compile): "
              f"{float(np.mean(steady)):.2f}s/sample "
              f"({1.0 / max(float(np.mean(steady)), 1e-9):.2f} samples/sec)")
    return per_sample_results, sanity_stats


def aggregate_results(per_sample_results):
    if not per_sample_results:
        return {}
    keys = [k for k in per_sample_results[0] if k != "sample_id"]
    out = {}
    for key in keys:
        vals = [r[key] for r in per_sample_results if key in r]
        if vals:
            out[f"{key}_mean"] = float(np.mean(vals))
            out[f"{key}_std"] = float(np.std(vals))
            out[f"{key}_min"] = float(np.min(vals))
            out[f"{key}_max"] = float(np.max(vals))
    return out


def save_results(per_sample_results, aggregated, sanity_stats, args, output_dir):
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    mode_str = ("vae_only" if args.sanity_mode
                else "vae_cross" if args.cross_mode
                else f"diffusion_{args.sampler}_{args.steps}steps")
    results = {
        "timestamp": timestamp,
        "evaluation_mode": ("VAE_ONLY_SANITY_CHECK" if args.sanity_mode
                            else "VAE_CROSS_CHECK" if args.cross_mode
                            else "END_TO_END_DIFFUSION"),
        "pipeline": ("GT -> E3D -> D3D -> compare" if args.sanity_mode
                     else "2D input -> E2D -> D3D -> compare" if args.cross_mode
                     else f"2D input -> E2D -> {args.sampler.upper()} ({args.steps} steps) -> D3D -> compare"),
        "args": vars(args),
        "summary": aggregated,
        "sanity_stats": {k: {"mean": float(np.mean(v)), "std": float(np.std(v))}
                         for k, v in sanity_stats.items()},
        "accuracy_definition": "Accuracy = 1 / (1 + normalized_MAE_total), bounded in (0, 1], higher is better",
        "per_sample_results": per_sample_results,
    }
    json_path = osp.join(output_dir, f"eval_results_{mode_str}_{timestamp}.json")
    with open(json_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nResults saved to: {json_path}")

    if args.save_csv:
        csv_path = args.save_csv if osp.isabs(args.save_csv) else osp.join(output_dir, args.save_csv)
        os.makedirs(osp.dirname(csv_path) or ".", exist_ok=True)
        fieldnames = ["sample_id", "mae_u", "mae_v", "mae_w", "nmae_total",
                      "rmse_total", "cosine_similarity", "iou_top10", "time_sec",
                      "accuracy_score"]
        with open(csv_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=fieldnames, extrasaction="ignore")
            writer.writeheader()
            writer.writerows(per_sample_results)
        print(f"CSV saved to: {csv_path}")
    return json_path


def main(argv=None):
    args = parse_args(argv)
    if args.device:
        # the axon TPU plugin ignores JAX_PLATFORMS; select explicitly
        jax.config.update("jax_platforms", args.device)
    from diffusion_model_project_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    if args.precision:
        jax.config.update("jax_default_matmul_precision", args.precision)
    from diffusion_model_project_tpu.data import get_loader

    loaders = get_loader(root_dir=args.dataset_dir, batch_size=args.batch_size,
                         use_3d=True, seed=2024)
    train_loader, val_loader, test_loader = loaders[0]
    dataset = {"train": train_loader, "valid": val_loader, "test": test_loader}[args.split].dataset

    sample0 = dataset[0]
    image_hw = sample0["microstructure"].shape[-2:]
    predictor, norm_factors = load_model_and_config(args, image_hw)
    print(f"Normalization factors (max_u, max_v, max_w): {norm_factors}")

    output_dir = args.output_dir or args.diffusion_model_path
    os.makedirs(output_dir, exist_ok=True)
    npz_dir = None
    if args.save_npz_preds:
        npz_dir = osp.join(output_dir, "predictions_npz")
        os.makedirs(npz_dir, exist_ok=True)

    per_sample, sanity = run_evaluation(
        predictor, dataset, norm_factors,
        sampler=args.sampler, num_steps=args.steps, seed=args.seed,
        sanity_mode=args.sanity_mode, cross_mode=args.cross_mode,
        num_samples=args.num_samples,
        single_index=args.index, noise_dir=args.noise_dir,
        torch_noise=args.torch_noise, save_npz_dir=npz_dir,
        batch_size=max(1, args.batch_size))
    aggregated = aggregate_results(per_sample)

    print("\n--- Total Metrics ---")
    print(f"  nMAE_total: {aggregated.get('nmae_total_mean', 0):.6f} "
          f"+/- {aggregated.get('nmae_total_std', 0):.6f}")
    print(f"  Accuracy = 1/(1+nMAE_total) = {aggregated.get('accuracy_score_mean', 0):.4f}")
    save_results(per_sample, aggregated, sanity, args, output_dir)


if __name__ == "__main__":
    main()
