"""Guards on bench.py's timing methodology (VERDICT r3 item 8).

PERF.md documents two measurement hazards on this backend:
  #1 block_until_ready returns EARLY — only a device->host transfer is a
     real barrier, so the timing loop must return a scalar the caller
     fetches;
  #2 loop-invariant inputs get hoisted — XLA lifts an unchained conditioning
     encode out of the lax.scan and the measurement silently drops that
     pipeline stage.

These tests lock both invariants against future edits of the loop builder:
if someone un-chains an input, the FLOP comparison below stops holding and
the guard fails."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jax.extend.core import Literal as _Literal

import bench
from diffusion_model_project_tpu.diffusion.predictor import LatentDiffusionPredictor

S, H, W, B = 3, 16, 16, 2
N_ITERS = 4


@pytest.fixture(scope="module")
def pred():
    kw = dict(in_channels=9, out_channels=4, features=(8, 16), kernel_size=3,
              padding_mode="zeros", activation="silu", final_activation=None,
              attention="", dropout=0.0, time_embedding_dim=16)
    return LatentDiffusionPredictor.create(
        dict(kw), rng=jax.random.key(0), num_slices=S, num_timesteps=8,
        distance_transform=True, image_hw=(H, W), vae_features=(32, 32, 32),
    ).set_normalizer({"input": [1.0], "output": [1.0, 1.0, 1.0]})


def _inputs():
    r = np.random.default_rng(0)
    img = (r.random((B, S, 1, H, W)) > 0.3).astype(np.float32)
    img[:, :, :, 0, 0] = 0.0
    v2d = r.standard_normal((B, S, 3, H, W)).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(v2d)


def _one(p, i, v, r):
    return p.predict_ddim(i, v, num_steps=2, eta=0.0, rng=r)


def _subjaxprs(eqn):
    """(closed_jaxpr, invar_map) pairs for an eqn's inner jaxprs, where
    invar_map[i] = index into eqn.invars feeding body invar i (or None)."""
    out = []
    prim = eqn.primitive.name
    p = eqn.params
    if prim == "scan":
        body = p["jaxpr"]
        out.append((body, list(range(len(eqn.invars)))))
    elif prim == "while":
        for key in ("cond_jaxpr", "body_jaxpr"):
            out.append((p[key], list(range(len(eqn.invars)))))
    elif prim == "cond":
        for br in p["branches"]:
            # first invar is the predicate index; operands follow
            out.append((br, [i + 1 for i in range(len(eqn.invars) - 1)]))
    elif "jaxpr" in p:  # pjit / remat / custom_* wrappers
        body = p["jaxpr"]
        n = len(body.jaxpr.invars) if hasattr(body, "jaxpr") else len(body.invars)
        out.append((body, list(range(min(n, len(eqn.invars))))))
    elif "call_jaxpr" in p:
        body = p["call_jaxpr"]
        n = len(body.jaxpr.invars) if hasattr(body, "jaxpr") else len(body.invars)
        out.append((body, list(range(min(n, len(eqn.invars))))))
    return out


def _conv_depends_on(closed, tainted_invar_idx) -> bool:
    """True if any conv_general_dilated (transitively, through inner scans /
    pjit bodies) consumes a value data-dependent on the given invars."""
    jaxpr = closed.jaxpr if hasattr(closed, "jaxpr") else closed
    tainted = {jaxpr.invars[i] for i in tainted_invar_idx
               if i < len(jaxpr.invars)}
    for eqn in jaxpr.eqns:
        in_taint = [(not isinstance(v, _Literal)) and v in tainted
                    for v in eqn.invars]
        if any(in_taint):
            if eqn.primitive.name == "conv_general_dilated":
                return True
            for body, invar_map in _subjaxprs(eqn):
                body_taint = [i for i, src in enumerate(invar_map)
                              if src is not None and src < len(in_taint)
                              and in_taint[src]]
                if _conv_depends_on(body, body_taint):
                    return True
            tainted.update(eqn.outvars)
    return False


def _scan_conv_carry_dependence(loop, pred, img, v2d) -> bool:
    """Trace the loop, find its outer timing scan, and report whether the
    convolutions in the scan body are data-dependent on the scan CARRY —
    i.e. whether the pipeline inputs are chained so XLA cannot hoist the
    encode out of the loop."""
    jaxpr = jax.make_jaxpr(
        lambda p, i, v, k: loop(p, i, v, k))(pred, img, v2d, jax.random.key(0))

    def find_scans(j, depth=0):
        jj = j.jaxpr if hasattr(j, "jaxpr") else j
        found = []
        for e in jj.eqns:
            if e.primitive.name == "scan":
                found.append((depth, e))
            else:  # descend through pjit/remat wrappers to the first scan
                for body, _ in _subjaxprs(e):
                    found.extend(find_scans(body, depth + 1))
        return found

    scans = find_scans(jaxpr)
    assert scans, "timing loop must be a lax.scan"
    # shallowest scan = the n_iters timing loop (the DDIM scan nests inside)
    outer = min(scans, key=lambda de: de[0])[1]
    body = outer.params["jaxpr"]
    nc, ncarry = outer.params["num_consts"], outer.params["num_carry"]
    carry_idx = list(range(nc, nc + ncarry))
    return _conv_depends_on(body, carry_idx)


def test_loop_closes_in_a_scalar_barrier(pred):
    """Hazard #1: the loop's result must be a 0-d array so the bench's
    float(np.asarray(...)) fetch is a true device->host barrier covering
    every iteration (it reduces over ALL per-iteration outputs)."""
    img, v2d = _inputs()
    loop = bench.make_timing_loop(_one, N_ITERS)
    out = loop(pred, img, v2d, jax.random.key(1))
    assert out.shape == (), out.shape
    # the scalar is the min over per-iteration finite counts = full volume
    assert float(out) == float(np.prod((B, S, 3, H, W)))


def test_every_pipeline_input_is_chained_through_the_carry(pred):
    """Hazard #2: the timing scan's convolutions must be DATA-DEPENDENT on
    the scan carry — that is what stops XLA's loop-invariant code motion
    from hoisting the conditioning encode out of the loop (the measured
    9.28-vs-7 vol/s discrepancy in bench.py's comment). The taint analysis
    also proves its own discriminative power: with chain_inputs=False the
    same check comes back negative, so if a future edit un-chains an input
    the default loop fails this test."""
    img, v2d = _inputs()
    assert _scan_conv_carry_dependence(
        bench.make_timing_loop(_one, N_ITERS), pred, img, v2d), (
        "bench timing loop: convolutions no longer depend on the scan carry "
        "— an input was un-chained and XLA can hoist pipeline stages out of "
        "the measurement (PERF.md hazard #2)")
    assert not _scan_conv_carry_dependence(
        bench.make_timing_loop(_one, N_ITERS, chain_inputs=False),
        pred, img, v2d), (
        "taint analysis lost its discriminative power: the unchained "
        "control loop should NOT show carry-dependent convolutions")
