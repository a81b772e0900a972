"""EMA weight tracking (--ema-decay): an extension over the reference.

The EMA lives at the tail of the optax chain so it is persisted inside
train_state.msgpack, replicated by the mesh code, and requires no signature
changes anywhere in the step/epoch plumbing.
"""
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from diffusion_model_project_tpu.training.train_diffusion import (
    ema_params, make_optimizer)

from conftest import SHARED_UNET_ARGS


def test_ema_tracker_matches_closed_form():
    decay = 0.9
    opt = make_optimizer(1e-2, weight_decay=0.0, ema_decay=decay)
    params = {"w": jnp.arange(4.0), "b": jnp.ones(())}
    state = opt.init(params)
    np.testing.assert_array_equal(ema_params(state)["w"], params["w"])

    expected_ema = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    r = np.random.default_rng(0)
    for _ in range(5):
        grads = jax.tree_util.tree_map(
            lambda x: jnp.asarray(r.standard_normal(x.shape), jnp.float32), params)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        expected_ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1 - decay) * np.asarray(p),
            expected_ema, params)
        got = ema_params(state)
        for k in params:
            np.testing.assert_allclose(got[k], expected_ema[k], rtol=1e-6)


def test_no_ema_by_default():
    opt = make_optimizer(1e-2)
    state = opt.init({"w": jnp.ones(3)})
    assert ema_params(state) is None


def test_ema_hyperparams_lr_still_mutable():
    # train() mutates opt_state.hyperparams["learning_rate"] per epoch; the
    # chained EMA tracker must not break the inject_hyperparams surface
    opt = make_optimizer(1e-2, ema_decay=0.99)
    state = opt.init({"w": jnp.ones(3)})
    state.hyperparams["learning_rate"] = 5e-3
    updates, state = opt.update({"w": jnp.ones(3)}, state, {"w": jnp.ones(3)})
    assert np.isfinite(float(updates["w"][0]))


def test_ema_cli_training_writes_loadable_ema_model(
        shared_data_dir, shared_stage1_dir, shared_stage2_dir, tmp_path):
    import train as train_cli
    from diffusion_model_project_tpu.utils.checkpoint import (
        build_predictor, load_predictor_state)
    import json

    save_dir = str(tmp_path / "ema_runs")
    train_cli.main([
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        *SHARED_UNET_ARGS, "--batch-size", "2", "--num-epochs", "2",
        "--vae-encoder-path", shared_stage2_dir,
        "--vae-decoder-path", shared_stage1_dir,
        "--data-parallel", "false", "--ema-decay", "0.5",
    ])
    import os
    run = osp.join(save_dir, os.listdir(save_dir)[0])
    assert osp.exists(osp.join(run, "ema_model.msgpack"))

    log = json.load(open(osp.join(run, "log.json")))
    kwargs = dict(log["params"]["training"]["predictor"])
    kwargs["vae_encoder_path"] = shared_stage2_dir
    kwargs["vae_decoder_path"] = shared_stage1_dir
    pred, _ = build_predictor(kwargs, image_hw=(16, 16))
    raw = load_predictor_state(pred, osp.join(run, "model.msgpack"))
    ema = load_predictor_state(pred, osp.join(run, "ema_model.msgpack"))

    # same structure, different values (EMA lags the raw weights)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        raw.unet_params, ema.unet_params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0
    # VAE (frozen) weights identical
    for a, b in zip(jax.tree_util.tree_leaves(raw.vae_params),
                    jax.tree_util.tree_leaves(ema.vae_params)):
        np.testing.assert_array_equal(a, b)

    # the loss-space eval CLI runs on the EMA weights via --use-ema
    import evaluate as evaluate_cli
    evaluate_cli.main(["--model-dir", run, "--root-dir", shared_data_dir,
                       "--use-ema"])
    assert osp.exists(osp.join(run, "test_result.txt"))
