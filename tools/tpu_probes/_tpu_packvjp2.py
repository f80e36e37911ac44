"""Pack-VJP component costs at production capacity (in-graph prefix method:
each timing is a jitted graph returning prefix.sum(); differences between
cumulative graphs isolate stages — standalone stage timings lie on this
stack, see CLAUDE.md).

Stages of _gather_rows_t_bwd (ops/rasterize_pallas.py): 1-key stable sort of
(order, slot), row gather of ct.T, two-level block-cumsum (tri-dot), window
gathers + differences. Also A/B: tri-dot split (default) vs HIGHEST 6-pass.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

CAP = int(os.environ.get("PV_CAP", 917504))
P = int(os.environ.get("PV_P", 120_000))

rng = np.random.default_rng(0)
counts = rng.integers(0, 14, size=P).astype(np.int32)
scale = CAP * 0.92 / counts.sum()
counts = (counts * scale).astype(np.int32)
total = int(counts.sum())
order = np.repeat(np.arange(P, dtype=np.int32), counts)
order = np.concatenate([order, np.full(CAP - total, P - 1, np.int32)])
rng.shuffle(order[:total])  # tile/depth-sorted order is id-shuffled
cum = jnp.asarray(np.cumsum(counts).astype(np.int32))
counts_j = jnp.asarray(counts)
order_j = jnp.asarray(order)
ct = jnp.asarray(rng.normal(size=(16, CAP)).astype(np.float32))


def timeit(fn, *args, n=20):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3


def s1_sort(ct):
    slot = jax.lax.iota(jnp.int32, CAP)
    g_s, slot_s = jax.lax.sort((order_j, slot), num_keys=1, is_stable=True)
    return slot_s.sum() + ct[0, 0]


def s2_gather(ct):
    slot = jax.lax.iota(jnp.int32, CAP)
    g_s, slot_s = jax.lax.sort((order_j, slot), num_keys=1, is_stable=True)
    rows = jnp.take(ct.T, slot_s, axis=0)
    return rows.sum()


def s3_cumsum(ct):
    from ex4dgs_tpu.ops.scan_ops import matmul_block_cumsum_parts

    slot = jax.lax.iota(jnp.int32, CAP)
    g_s, slot_s = jax.lax.sort((order_j, slot), num_keys=1, is_stable=True)
    rows = jnp.take(ct.T, slot_s, axis=0)
    local, carry = matmul_block_cumsum_parts(rows)
    return local.sum() + carry.sum()


def s4_full(ct):
    from ex4dgs_tpu.ops import rasterize_pallas as rp

    f = lambda c: jnp.vdot(rp._gather_rows_t(c, order_j, cum, counts_j), ct)
    cols = jnp.zeros((P, 16), jnp.float32)
    return jax.grad(f)(cols).sum()


print(f"CAP={CAP} P={P} total={total}", flush=True)
print(f"s1 sort:        {timeit(s1_sort, ct):7.2f} ms", flush=True)
print(f"s2 +row gather: {timeit(s2_gather, ct):7.2f} ms", flush=True)
print(f"s3 +blk cumsum: {timeit(s3_cumsum, ct):7.2f} ms", flush=True)
print(f"s4 full VJP:    {timeit(s4_full, ct):7.2f} ms", flush=True)
os.environ["EX4DGS_SCAN_DOT"] = "highest"
import importlib

from ex4dgs_tpu.ops import scan_ops

importlib.reload(scan_ops)
print(f"s3 HIGHEST:     {timeit(s3_cumsum, ct):7.2f} ms", flush=True)
