"""Probe: can make_async_copy DMA a [16, 256] window from an UNALIGNED
dynamic lane offset of a [16, N] HBM array? If yes (and fast), the
compositing kernels can start windows at each tile's exact range start
instead of 256-aligned bases — average 128 wasted lanes per tile removed.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 20
ROWS, G = 16, 256


def kern(offs, src_hbm, out, buf, sem):
    p = pl.program_id(0)
    off = offs[p]
    cp = pltpu.make_async_copy(src_hbm.at[:, pl.ds(off, G)], buf, sem)
    cp.start()
    cp.wait()
    out[0] = buf[:]


def run(offsets, label):
    T = offsets.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((1, ROWS, G), lambda p, *_: (p, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((ROWS, G), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    f = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T, ROWS, G), jnp.float32)],
    )
    src = jnp.asarray(
        np.random.default_rng(0).normal(size=(ROWS, N)).astype(np.float32))
    jf = jax.jit(lambda o, s: f(o, s)[0])
    out = jax.block_until_ready(jf(offsets, src))
    # correctness
    o0 = int(offsets[7])
    np.testing.assert_allclose(
        np.asarray(out[7]), np.asarray(src[:, o0:o0 + G]), atol=0)
    t0 = time.perf_counter()
    for _ in range(20):
        out = jf(offsets, src)
    jax.block_until_ready(out)
    print(f"{label}: {(time.perf_counter() - t0) / 20 * 1e3:.2f}ms",
          flush=True)


T = 4096
rng = np.random.default_rng(1)
aligned = (rng.integers(0, (N - G) // 256, T) * 256).astype(np.int32)
unaligned = rng.integers(0, N - G, T).astype(np.int32)
run(jnp.asarray(aligned), "aligned-256")
run(jnp.asarray(unaligned), "unaligned")
