"""Default-suite guard on the GSPMD communication pattern (VERDICT r3 weak
#6): a regression in the sharding annotations would otherwise surface as a
silent perf cliff, not a test failure.

Asserts, on the virtual 8-device CPU mesh (conftest):
  - batch-sharded INFERENCE compiles to ZERO inter-chip collectives (each
    chip runs the single-chip program on its shard -> linear scaling);
  - data-parallel TRAINING compiles to exactly the gradient all-reduce
    (one fused psum) and nothing else.

scripts/sharding_audit.py remains the full-size audit across all mesh
configs (dp x slice x model, fsdp)."""
import re
from collections import Counter

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor
from diffusion_model_project_tpu.parallel import make_mesh, replicate, shard_batch
from diffusion_model_project_tpu.training.steps import make_diffusion_train_step

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def _collective_counts(compiled) -> Counter:
    text = compiled.as_text()
    c = Counter()
    for op in COLLECTIVES:
        c[op] = len(re.findall(rf"\b{op}(?:-start)?\(", text))
    return c


S, H, W, B = 3, 16, 16, 8


@pytest.fixture(scope="module")
def pred():
    kw = dict(in_channels=9, out_channels=4, features=(8, 16), kernel_size=3,
              padding_mode="zeros", activation="silu", final_activation=None,
              attention="", dropout=0.0, time_embedding_dim=16)
    return LatentDiffusionPredictor.create(
        dict(kw), rng=jax.random.key(0), num_slices=S, num_timesteps=8,
        distance_transform=True, image_hw=(H, W), vae_features=(32, 32, 32),
    ).set_normalizer({"input": [1.0], "output": [1.0, 1.0, 1.0]})


@pytest.fixture(scope="module")
def batch_np():
    r = np.random.default_rng(0)
    img = (r.random((B, S, 1, H, W)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    return {
        "img": img,
        "U_2d": r.standard_normal((B, S, 3, H, W)).astype(np.float32),
        "U": r.standard_normal((B, S, 3, H, W)).astype(np.float32),
    }


@pytest.mark.skipif(jax.device_count() < 2, reason="needs the virtual mesh")
def test_dp_inference_is_collective_free(pred, batch_np):
    mesh = make_mesh(("data",))
    with mesh:
        p = replicate(pred, mesh)
        b = shard_batch({"img": jnp.asarray(batch_np["img"]),
                         "v2d": jnp.asarray(batch_np["U_2d"])}, mesh)
        fn = lambda p, i, v, r: p.predict_ddim(i, v, num_steps=2, eta=0.0,
                                               rng=r)
        compiled = jax.jit(fn).lower(
            p, b["img"], b["v2d"], jax.random.key(0)).compile()
    counts = _collective_counts(compiled)
    assert sum(counts.values()) == 0, (
        f"batch-sharded inference must be collective-free, got {dict(counts)}")


@pytest.mark.skipif(jax.device_count() < 2, reason="needs the virtual mesh")
def test_dp_training_has_exactly_the_gradient_psum(pred, batch_np):
    opt = optax.adam(1e-3)
    step = make_diffusion_train_step(opt)
    mesh = make_mesh(("data",))
    with mesh:
        p = replicate(pred, mesh)
        b = shard_batch({k: jnp.asarray(v) for k, v in batch_np.items()}, mesh)
        o = opt.init(p.unet_params)
        compiled = jax.jit(step).lower(p, o, b, jax.random.key(0)).compile()
    counts = _collective_counts(compiled)
    assert counts["all-reduce"] == 1, (
        f"dp training must fuse the gradient reduction into ONE all-reduce, "
        f"got {dict(counts)}")
    others = {k: v for k, v in counts.items() if k != "all-reduce" and v}
    assert not others, f"unexpected collectives in dp training: {others}"
