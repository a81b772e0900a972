"""Microbenchmark: candidate implementations of the VAE's hot 3x3 Conv2D
stages (the depth-decomposed Conv3D inner op) on the real TPU.

Stages (per depth-decomposition, B=4 volumes x 11 slices => N=44 images):
  A: 256x256 x 128->128   (decoder res3 / encoder res1)   0.64 TFLOP/conv-vol
  B: 128x128 x 256->256   (decoder res2 / encoder res2)
  C:  64x64  x 512->512   (decoder res1 / encoder res3)

Candidates:
  xla_bf16   : lax.conv_general_dilated, bf16 (current production path)
  xla_int8   : int8 activations+weights -> int32 conv -> rescale
  pallas_9s  : Pallas kernel, 9 shifted [pix,C]@[C,C'] MXU matmuls from VMEM

Usage: python scripts/perf_probe_conv.py [stage ...]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

STAGES = {
    "A": (44, 256, 256, 128, 128),
    "B": (44, 128, 128, 256, 256),
    "C": (44, 64, 64, 512, 512),
}


def timeit(fn, x, *args, iters=20, chain=None):
    """One dispatch, iters chained applications inside a single jit (host-side
    loops are untrustworthy through the axon tunnel even with data deps)."""
    chain = chain or (lambda y: y)

    @jax.jit
    def chained(x, *a):
        out = lax.fori_loop(0, iters, lambda i, v: chain(fn(v, *a)), x)
        # reduce to a scalar INSIDE the jit so the timed fetch is tiny
        return jnp.sum(out.astype(jnp.float32))

    float(chained(x, *args))  # compile + warm (fetch forces real execution)
    # axon memoizes identical dispatches — time on a FRESH input value, and
    # fetch the scalar (block_until_ready alone can return before execution)
    x2 = x + x.dtype.type(1)
    float(jnp.sum(x2.astype(jnp.float32)))  # materialize x2 outside the clock
    t0 = time.perf_counter()
    float(chained(x2, *args))
    return (time.perf_counter() - t0) / iters


def flops(n, h, w, cin, cout):
    return 2 * 9 * n * h * w * cin * cout


# ---------------------------------------------------------------- xla bf16
@functools.partial(jax.jit, static_argnames=())
def conv_xla(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                    dimension_numbers=dn)


# ---------------------------------------------------------------- xla int8
@jax.jit
def conv_int8(x_q, w_q, scale):
    """int8 x int8 -> int32 conv, rescaled to bf16."""
    dn = lax.conv_dimension_numbers(x_q.shape, w_q.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x_q, w_q, (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=dn,
                                 preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * scale).astype(jnp.bfloat16)


# ---------------------------------------------------------------- pallas 9-shift
def make_pallas_conv(n, h, w, cin, cout, th=32, tw=256, dtype=jnp.bfloat16):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert h % th == 0 and w % tw == 0

    def kernel(x_ref, w_ref, o_ref):
        # x_ref: (1, th+2, tw+2, cin) halo tile; w_ref: (3,3,cin,cout)
        acc = jnp.zeros((th * tw, cout), jnp.float32)
        for di in range(3):
            for dj in range(3):
                xs = x_ref[0, di:di + th, dj:dj + tw, :].reshape(th * tw, cin)
                acc += jnp.dot(xs, w_ref[di, dj],
                               preferred_element_type=jnp.float32)
        o_ref[0, :, :, :] = acc.reshape(th, tw, cout).astype(o_ref.dtype)

    grid = (n, h // th, w // tw)

    def xmap(i, j, k):  # block index -> offsets (block-sized units)
        return (i, j, k, 0)

    # input is pre-padded (h+2, w+2); index in elements via block shape 1 trick:
    in_spec = pl.BlockSpec((1, th + 2, tw + 2, cin),
                           lambda i, j, k: (i, j * th, k * tw, 0),
                           memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((3, 3, cin, cout), lambda i, j, k: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, th, tw, cout),
                            lambda i, j, k: (i, j, k, 0),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(x, wgt):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, h, w, cout), dtype),
            grid=grid,
            in_specs=[in_spec, w_spec],
            out_specs=out_spec,
            scratch_shapes=[],
        )(xp, wgt)

    return run


def main(stages):
    r = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    for s in stages:
        n, h, w, cin, cout = STAGES[s]
        fl = flops(n, h, w, cin, cout)
        x = jnp.asarray(r.standard_normal((n, h, w, cin)), jnp.bfloat16)
        wgt = jnp.asarray(r.standard_normal((3, 3, cin, cout)) * 0.05, jnp.bfloat16)
        print(f"\n=== stage {s}: ({n},{h},{w},{cin})->{cout}  {fl/1e12:.2f} TFLOP")

        t = timeit(conv_xla, x, wgt)
        print(f"  xla_bf16 : {t*1e3:8.2f} ms  {fl/t/1e12:7.1f} TFLOP/s")

        x_q = jnp.asarray(r.integers(-127, 127, (n, h, w, cin)), jnp.int8)
        w_q = jnp.asarray(r.integers(-127, 127, (3, 3, cin, cout)), jnp.int8)
        requant = jax.jit(lambda y: jnp.clip(y.astype(jnp.float32) * 127.0,
                                             -127, 127).astype(jnp.int8))
        try:
            t = timeit(conv_int8, x_q, w_q, jnp.float32(1e-4), chain=requant)
            print(f"  xla_int8 : {t*1e3:8.2f} ms  {fl/t/1e12:7.1f} TFLOP/s (incl requant chain)")
        except Exception as e:
            print(f"  xla_int8 : FAILED {type(e).__name__}: {str(e)[:120]}")

        for th, tw in ((8, min(w, 512)), (16, min(w, 256)), (32, min(w, 256)),
                       (32, min(w, 128)), (64, 64)):
            if h % th or w % tw:
                continue
            try:
                run = make_pallas_conv(n, h, w, cin, cout, th, tw)
                t = timeit(run, x, wgt)
                print(f"  pallas_9s[{th}x{tw}]: {t*1e3:8.2f} ms  {fl/t/1e12:7.1f} TFLOP/s")
            except Exception as e:
                print(f"  pallas_9s[{th}x{tw}]: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["A", "B", "C"])
