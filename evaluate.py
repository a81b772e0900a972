#!/usr/bin/env python
"""Noise-prediction-loss evaluation over the test split
(reference Diffusion_model/evaluate.py).

Loads a run dir's log.json config + best weights, evaluates the training
criterion over the test split, and writes test_result.txt in the run dir.
"""
import argparse
import json
import os.path as osp
import sys

import jax
import numpy as np


def get_latest_model_dir(save_dir: str) -> str:
    import os

    candidates = [d for d in sorted(os.listdir(save_dir))
                  if osp.isdir(osp.join(save_dir, d))
                  and osp.exists(osp.join(save_dir, d, "log.json"))]
    if not candidates:
        raise FileNotFoundError(f"No model directories with log.json under {save_dir}")
    return osp.join(save_dir, candidates[-1])


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-dir", type=str, default=None,
                        help="Run directory (default: latest under --save-dir)")
    parser.add_argument("--save-dir", type=str, default="./trained/")
    parser.add_argument("--root-dir", type=str, default=None,
                        help="Dataset dir (default: from the run's log.json)")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--seed", type=int, default=2024)
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--use-ema", action="store_true",
                        help="Prefer ema_model.msgpack (train.py --ema-decay)")
    args = parser.parse_args(argv)
    if args.device:
        jax.config.update("jax_platforms", args.device)
    from diffusion_model_project_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    model_dir = args.model_dir or get_latest_model_dir(args.save_dir)
    with open(osp.join(model_dir, "log.json")) as f:
        log_data = json.load(f)
    params = log_data["params"]
    root_dir = args.root_dir or params["dataset"]["root_dir"]
    batch_size = args.batch_size or params["dataset"]["batch_size"]
    cost_name = params["training"]["cost_function"]

    from diffusion_model_project_tpu.data import get_loader
    from diffusion_model_project_tpu.training.helper import select_input_output
    from diffusion_model_project_tpu.training.steps import make_diffusion_eval_step
    from diffusion_model_project_tpu.utils.checkpoint import predictor_from_directory

    _, _, test_loader = get_loader(root_dir=root_dir, batch_size=batch_size,
                                   use_3d=params["dataset"]["use_3d"],
                                   seed=args.seed)[0]
    sample0 = test_loader.dataset[0]
    image_hw = tuple(sample0["microstructure"].shape[-2:])
    try:
        predictor, _ = predictor_from_directory(model_dir, image_hw=image_hw,
                                                use_ema=args.use_ema)
    except Exception as e:
        # legacy checkpoints predate time embeddings: retry with
        # time_embedding_dim=None (reference evaluate.py:135-151)
        if "time_mlp" not in str(e):
            raise
        print("\nWarning: Model checkpoint missing time embeddings. "
              "Identifying as legacy model.")
        print("Retrying with time_embedding_dim=None...")
        predictor, _ = predictor_from_directory(
            model_dir, image_hw=image_hw, use_ema=args.use_ema,
            model_kwargs_overrides={"time_embedding_dim": None})

    eval_step = jax.jit(make_diffusion_eval_step(cost_name=cost_name))
    rng = jax.random.key(args.seed)
    losses = []
    for data in test_loader:
        (img, v2d), targets = select_input_output(data)
        rng, r = jax.random.split(rng)
        metrics = eval_step(predictor, {"img": img, "U_2d": v2d, "U": targets}, r)
        losses.append(float(metrics["val_loss"]))
    avg = float(np.mean(losses)) if losses else float("nan")

    result_path = osp.join(model_dir, "test_result.txt")
    with open(result_path, "w") as f:
        f.write(f"cost_function: {cost_name}\n")
        f.write(f"test_loss: {avg}\n")
        f.write(f"num_batches: {len(losses)}\n")
    print(f"Test loss ({cost_name}): {avg}")
    print(f"Wrote {result_path}")


if __name__ == "__main__":
    main(sys.argv[1:])
