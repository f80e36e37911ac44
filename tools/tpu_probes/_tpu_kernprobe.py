"""Kernel cost model probe: composite_tiles fwd+bwd on SYNTHETIC instance
lists — same total instances, different (tiles x list-length) splits — to
separate per-tile fixed costs from per-chunk steady-state costs."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ex4dgs_tpu.ops import rasterize_pallas as rp

CAP = 1441792  # bench-scale snug capacity
GRID_X = 85


def timeit(name, fn, *args, n=20):
    jf = jax.jit(fn)
    out = jax.block_until_ready(jf(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.2f}ms", flush=True)
    return dt


rng = np.random.default_rng(0)
# plausible instance rows: gaussians centered inside their tile, moderate size
def make_data(T, L):
    total = T * L
    assert total <= CAP
    tid = np.repeat(np.arange(T, dtype=np.int32), L)
    ox = (tid % GRID_X) * 16.0
    oy = (tid // GRID_X) * 16.0
    xs = ox + rng.uniform(-4, 20, total)
    ys = oy + rng.uniform(-4, 20, total)
    sig = rng.uniform(1.5, 6.0, total)
    conic_a = 1.0 / (sig * sig)
    data = np.zeros((16, CAP), np.float32)
    data[0, :total] = xs
    data[1, :total] = ys
    data[2, :total] = conic_a
    data[3, :total] = 0.0
    data[4, :total] = conic_a
    data[5, :total] = rng.uniform(0.02, 0.8, total)  # opacity
    data[6:9, :total] = rng.uniform(0, 1, (3, total))
    data[9, :total] = rng.uniform(1, 30, total)  # depth
    data[13, :total] = 1.0
    starts = (np.arange(T, dtype=np.int32) * L)
    stops = starts + L
    tids = np.arange(T, dtype=np.int32)
    return (jnp.asarray(data), jnp.asarray(starts), jnp.asarray(stops),
            jnp.asarray(tids))


def run(T, L):
    data, starts, stops, tids = make_data(T, L)
    gid = jnp.zeros((1, CAP), jnp.int32)

    def fwd(d):
        c, a, tf, bi = rp.composite_tiles(
            d, jnp.zeros(3), gid, starts, stops, tids, None, T, GRID_X,
            False, False)
        return c.sum()

    tF = timeit(f"T={T:5d} L={L:5d} fwd ", fwd, data)
    g = jax.grad(fwd)
    tB = timeit(f"T={T:5d} L={L:5d} grad", g, data)
    return tF, tB


for T, L in ((5440, 211), (2720, 422), (1360, 844), (340, 3376), (5440, 32)):
    run(T, L)
