"""Hypothesis probe: per-tile fixed cost = narrow-minor-dim block DMAs.

The kernels' per-tile VMEM blocks have minor dims of 8 (accum [512,8]) and
1 (tfinal/bestidx [512,1]) — far below the 128-lane tile width, so the
in/out pipeline DMAs are lane-strided. Compare three trivial kernels that
stream the SAME bytes per tile with different block layouts:
  A: out [T, 512, 8] + [T, 512, 1] x2      (current forward layout)
  B: out [T, 16, 512] single               (pixel axis minor = 4x128 lanes)
  C: out [T, 512, 8] single                (accum only, no narrow outs)
and the same for INPUT streaming (backward reads gacc + 3 narrow blocks):
  D: in  [T, 512, 8] + [T, 512, 1] x3 -> out [T, 16, 512]
  E: in  [T, 16, 512] single           -> out [T, 16, 512]
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 2752
N_PIX = 512


def timeit(name, fn, *args, n=30):
    jf = jax.jit(fn)
    out = jax.block_until_ready(jf(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.2f} ms ({dt / T * 1e3:.2f} us/tile)", flush=True)


def kernel_a(acc_ref, tf_ref, bid_ref):
    acc_ref[:] = jnp.full(acc_ref.shape, 1.0, jnp.float32)
    tf_ref[:] = jnp.full(tf_ref.shape, 2.0, jnp.float32)
    bid_ref[:] = jnp.full(bid_ref.shape, 3, jnp.int32)


def run_a():
    return pl.pallas_call(
        kernel_a,
        grid=(T,),
        out_specs=[
            pl.BlockSpec((1, N_PIX, 8), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, N_PIX, 1), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, N_PIX, 1), lambda p: (p, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, N_PIX, 8), jnp.float32),
            jax.ShapeDtypeStruct((T, N_PIX, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, N_PIX, 1), jnp.int32),
        ],
    )()


def kernel_b(out_ref):
    out_ref[:] = jnp.full(out_ref.shape, 1.0, jnp.float32)


def run_b():
    return pl.pallas_call(
        kernel_b,
        grid=(T,),
        out_specs=pl.BlockSpec((1, 16, N_PIX), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 16, N_PIX), jnp.float32),
    )()


def run_c():
    return pl.pallas_call(
        kernel_b,
        grid=(T,),
        out_specs=pl.BlockSpec((1, N_PIX, 8), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, N_PIX, 8), jnp.float32),
    )()


def kernel_d(gacc, a1, a2, a3, out_ref):
    s = gacc[0].sum() + a1[0].sum() + a2[0].sum() + a3[0].sum()
    out_ref[:] = jnp.full(out_ref.shape, 1.0, jnp.float32) * s


def run_d(gacc, a1, a2, a3):
    return pl.pallas_call(
        kernel_d,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, N_PIX, 8), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, N_PIX, 1), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, N_PIX, 1), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, N_PIX, 1), lambda p: (p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 16, N_PIX), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 16, N_PIX), jnp.float32),
    )(gacc, a1, a2, a3)


def kernel_e(gin, out_ref):
    out_ref[:] = jnp.full(out_ref.shape, 1.0, jnp.float32) * gin[0].sum()


def run_e(gin):
    return pl.pallas_call(
        kernel_e,
        grid=(T,),
        in_specs=[pl.BlockSpec((1, 16, N_PIX), lambda p: (p, 0, 0))],
        out_specs=pl.BlockSpec((1, 16, N_PIX), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 16, N_PIX), jnp.float32),
    )(gin)


timeit("A 3-out narrow (current fwd)", run_a)
timeit("B 1-out wide [16,512]", run_b)
timeit("C 1-out [512,8]", run_c)
gacc = jnp.ones((T, N_PIX, 8), jnp.float32)
a1 = jnp.ones((T, N_PIX, 1), jnp.float32)
gin = jnp.ones((T, 16, N_PIX), jnp.float32)
timeit("D 4-in narrow -> wide out (bwd-like)", run_d, gacc, a1, a1, a1)
timeit("E 1-in wide -> wide out", run_e, gin)
