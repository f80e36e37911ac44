"""Probe instance->Gaussian gradient reduction strategies (pack_sorted VJP)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ex4dgs_tpu.ops.scan_ops import blocked_cumsum

P = 110_592
CAP = 2 * 1024 * 1024
rng = np.random.default_rng(0)
counts_np = np.zeros(P, np.int32)
vis = rng.uniform(size=P) < 0.55
counts_np[vis] = rng.poisson(12.0, vis.sum()).astype(np.int32)
total = int(counts_np.sum())
print("total:", total, flush=True)
order_np = np.repeat(np.arange(P, dtype=np.int32), counts_np)[:CAP]
order_np = np.concatenate([order_np, np.full(CAP - order_np.size, P - 1, np.int32)])
perm = rng.permutation(total)  # shuffled like a (tile,depth) sort
order_np[:total] = order_np[:total][perm]
order = jnp.asarray(order_np)
counts = jnp.asarray(counts_np)
ct = jnp.asarray(rng.normal(size=(16, CAP)).astype(np.float32))


def timeit(name, fn, *args, n=10):
    jf = jax.jit(fn)
    out = jax.block_until_ready(jf(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1e3:.2f} ms", flush=True)
    return out


def scatter_current(ct, order):
    return jnp.zeros((P, 16), jnp.float32).at[order].add(ct.T)


def scatter_sorted(ct, order):
    g_s, slot_s = jax.lax.sort((order, jnp.arange(CAP, dtype=jnp.int32)),
                               num_keys=1, is_stable=True)
    rows = jnp.take(ct.T, slot_s, axis=0)
    return jnp.zeros((P, 16), jnp.float32).at[g_s].add(
        rows, indices_are_sorted=True)


def sort_cumsum_bounds(ct, order, counts):
    g_s, slot_s = jax.lax.sort((order, jnp.arange(CAP, dtype=jnp.int32)),
                               num_keys=1, is_stable=True)
    rows = jnp.take(ct.T, slot_s, axis=0)  # [CAP, 16] in gaussian order
    S = jnp.cumsum(rows, axis=0)
    S = jnp.concatenate([jnp.zeros((1, 16), jnp.float32), S], axis=0)
    cum = blocked_cumsum(counts)
    hi = cum
    lo = cum - counts
    return jnp.take(S, hi, axis=0) - jnp.take(S, lo, axis=0)


def sort_cumsum_blocked(ct, order, counts):
    g_s, slot_s = jax.lax.sort((order, jnp.arange(CAP, dtype=jnp.int32)),
                               num_keys=1, is_stable=True)
    rows = jnp.take(ct.T, slot_s, axis=0)  # [CAP, 16]
    # two-level cumsum along axis 0: blocks of 2048 rows
    B = 2048
    C = CAP // B
    r3 = rows.reshape(C, B, 16)
    cs = jnp.cumsum(r3, axis=1)
    carry = jnp.concatenate(
        [jnp.zeros((1, 16), jnp.float32), jnp.cumsum(cs[:, -1], axis=0)[:-1]], 0)
    S = (cs + carry[:, None]).reshape(CAP, 16)
    S = jnp.concatenate([jnp.zeros((1, 16), jnp.float32), S], axis=0)
    cum = blocked_cumsum(counts)
    return jnp.take(S, cum, axis=0) - jnp.take(S, cum - counts, axis=0)


ref = timeit("scatter (current transpose)", scatter_current, ct, order)
out2 = timeit("sorted scatter", scatter_sorted, ct, order)
out3 = timeit("sort+cumsum+bounds", sort_cumsum_bounds, ct, order, counts)
out4 = timeit("sort+blocked_cumsum+bounds", sort_cumsum_blocked, ct, order, counts)

for name, o in (("sorted_scatter", out2), ("cumsum", out3), ("blocked", out4)):
    d = float(jnp.max(jnp.abs(o - ref)))
    rel = d / (float(jnp.max(jnp.abs(ref))) + 1e-9)
    print(f"{name} max|diff|={d:.3e} rel={rel:.2e}", flush=True)
