"""One-process TPU probe: decompose binning costs and candidate replacements.

Run: python tools/tpu_binning_probe.py   (single TPU process!)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ex4dgs_tpu.ops.scan_ops import blocked_cumsum

P = 110_592
CAP = 2 * 1024 * 1024
CAP2 = 1536 * 1024

rng = np.random.default_rng(0)
# realistic counts: most 0 (culled), visible mean ~12
counts_np = np.zeros(P, np.int32)
vis = rng.uniform(size=P) < 0.55
counts_np[vis] = rng.poisson(12.0, vis.sum()).astype(np.int32)
total = int(counts_np.sum())
print("total instances:", total, flush=True)
counts = jnp.asarray(counts_np)
tile_np = rng.integers(0, 5440, size=CAP).astype(np.int32)
depth_np = rng.uniform(0.1, 100, size=CAP).astype(np.float32)
gc_np = rng.integers(0, P, size=CAP).astype(np.int32)
tile_j, depth_j, gc_j = map(jnp.asarray, (tile_np, depth_np, gc_np))


def timeit(name, fn, *args, n=20):
    jf = jax.jit(fn)
    out = jax.block_until_ready(jf(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1e3:.2f} ms", flush=True)
    return out


# --- current repeat
timeit("repeat(cap=2M)", lambda c: jnp.repeat(
    jnp.arange(P, dtype=jnp.int32), c, total_repeat_length=CAP), counts)
timeit("repeat(cap=1.5M)", lambda c: jnp.repeat(
    jnp.arange(P, dtype=jnp.int32), c, total_repeat_length=CAP2), counts)

# --- components
def scatter_marks(c):
    excl = jnp.cumsum(c) - c
    return jnp.zeros((CAP,), jnp.int32).at[excl].add(1, mode="drop")

marks = timeit("scatter-add 110k->2M", scatter_marks, counts)
timeit("cumsum 1D 2M", lambda m: jnp.cumsum(m), marks)
timeit("blocked_cumsum 2M", lambda m: blocked_cumsum(m), marks)

def scatter_max_marks(c):
    excl = jnp.cumsum(c) - c
    ids = jnp.arange(P, dtype=jnp.int32) + 1
    return jnp.zeros((CAP,), jnp.int32).at[excl].max(ids, mode="drop")

timeit("scatter-max variant", scatter_max_marks, counts)

def fast_repeat(c):
    m = scatter_marks(c)
    return blocked_cumsum(m) - 1

out_fast = timeit("fast_repeat = scatter + blocked_cumsum", fast_repeat, counts)
ref = jnp.repeat(jnp.arange(P, dtype=jnp.int32), counts, total_repeat_length=CAP)
print("fast_repeat == repeat:",
      bool((jnp.asarray(out_fast) == ref)[: total].all()), flush=True)

# --- sorts
timeit("sort 2-key (tile,f32depth)+payload 2M", lambda t, d, g: jax.lax.sort(
    (t, d, g), dimension=0, num_keys=2, is_stable=True), tile_j, depth_j, gc_j)
timeit("sort 2-key 1.5M", lambda t, d, g: jax.lax.sort(
    (t[:CAP2], d[:CAP2], g[:CAP2]), dimension=0, num_keys=2, is_stable=True),
    tile_j, depth_j, gc_j)

def packed_key(t, d):
    # depth f32 > 0 -> order-preserving int32 bits; quantize to 18 bits
    bits = jax.lax.bitcast_convert_type(d, jnp.int32) >> 13
    return t * (1 << 18) + bits

timeit("sort 1-key packed int32 + 2 payloads", lambda t, d, g: jax.lax.sort(
    (packed_key(t, d), d, g), dimension=0, num_keys=1, is_stable=True),
    tile_j, depth_j, gc_j)
timeit("sort 1-key + 1 payload", lambda t, d, g: jax.lax.sort(
    (packed_key(t, d), g), dimension=0, num_keys=1, is_stable=True),
    tile_j, depth_j, gc_j)

# --- row gather (pack)
cols16 = jnp.asarray(rng.normal(size=(P, 16)).astype(np.float32))
timeit("row-gather [2M,16] + T", lambda c, g: jnp.take(c, g, axis=0).T,
       cols16, gc_j)
timeit("row-gather [1.5M,16] + T", lambda c, g: jnp.take(c, g[:CAP2], axis=0).T,
       cols16, gc_j)
# gather to bf16 (half the write traffic)
timeit("row-gather bf16 [2M,16] + T",
       lambda c, g: jnp.take(c.astype(jnp.bfloat16), g, axis=0).T, cols16, gc_j)

# --- searchsorted ranges (current) for reference
svals = jnp.sort(tile_j)
timeit("searchsorted 5440 queries x2", lambda s: (
    jnp.searchsorted(s, jnp.arange(5440, dtype=jnp.int32), side="left"),
    jnp.searchsorted(s, jnp.arange(5440, dtype=jnp.int32), side="right")), svals)
