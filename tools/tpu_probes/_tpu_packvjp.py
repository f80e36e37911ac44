"""Focused probe: pack-gather VJP variants, measured as grad of the
preproc+bin+pack prefix inside one jitted graph each."""
import functools
import time

import jax, jax.numpy as jnp
from ex4dgs_tpu.rendering import preprocess_points
from ex4dgs_tpu.models.temporal import point_data_at_t
from ex4dgs_tpu.synthetic import make_scene, ring_cameras
from ex4dgs_tpu.ops import binning as B
from ex4dgs_tpu.ops import rasterize_pallas as rp
from ex4dgs_tpu.ops.scan_ops import blocked_cumsum_2d
from ex4dgs_tpu.ops.projection import tile_grid

import os

SMALL = bool(os.environ.get("PACKVJP_SMALL"))
W, H = (336, 256) if SMALL else (1352, 1014)
model, cfg = make_scene(
    n_static=5_000 if SMALL else 100_000,
    n_dynamic=500 if SMALL else 10_000, duration=10.0,
    static_capacity=5_120 if SMALL else 100_096,
    dynamic_capacity=512 if SMALL else 16384)
model = model._replace(params={
    **model.params,
    "scaling": jnp.minimum(model.params["scaling"], jnp.log(0.02)),
})
cam = ring_cameras(1, 3.0, W, H, far=cfg.far)[0]
capacity = 128 * 1024 if SMALL else 2 * 1024 * 1024
gx, gy = tile_grid(W, H)


def timeit(name, fn, *args, n=10):
    jf = jax.jit(fn)
    out = jax.block_until_ready(jf(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1e3:.1f}ms", flush=True)


def prefix(params, t, variant):
    m = model._replace(params=params)
    pts = point_data_at_t(m, cfg, t, 0)
    proj, colors = preprocess_points(pts, cam, cfg, near=cfg.near, far=cfg.far)
    binn = B.bin_gaussians(proj, gx, gy, capacity)
    P = proj.xy.shape[0]
    opac = proj.opacity * proj.valid
    ones = jnp.ones((P,), jnp.float32)
    zeros = jnp.zeros((P,), jnp.float32)
    cols = jnp.stack([
        proj.xy[:, 0], proj.xy[:, 1],
        proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
        opac, colors[:, 0], colors[:, 1], colors[:, 2], proj.depth,
        zeros, zeros, zeros, ones, zeros, zeros,
    ], axis=1)

    # tail slots (>= total) get zero cotangents, as the real backward
    # kernel zero-fills them; the scatter VJP would otherwise dump the
    # artificial ones-cotangent into the clipped last Gaussian row.
    valid = (jnp.arange(capacity) < binn.total).astype(jnp.float32)

    if variant == "none":  # pack excluded from the grad path entirely
        data = jnp.take(jax.lax.stop_gradient(cols), binn.order, axis=0).T
        return (data * valid).sum() + cols.sum() * 0.0
    if variant == "segment":
        data = rp._gather_rows_t(cols, binn.order, binn.cum, binn.counts)
        return (data * valid).sum()
    if variant == "scatter":
        @jax.custom_vjp
        def packg(c):
            return jnp.take(c, binn.order, axis=0).T
        def packg_fwd(c):
            return packg(c), None
        def packg_bwd(_, ct):
            return (jnp.zeros((P, 16), jnp.float32).at[binn.order].add(ct.T),)
        packg.defvjp(packg_fwd, packg_bwd)
        return (packg(cols) * valid).sum()
    if variant == "sortscatter":
        @jax.custom_vjp
        def packg(c):
            return jnp.take(c, binn.order, axis=0).T
        def packg_fwd(c):
            return packg(c), None
        def packg_bwd(_, ct):
            g_s, slot_s = jax.lax.sort(
                (binn.order, jnp.arange(capacity, dtype=jnp.int32)),
                num_keys=1, is_stable=True)
            rows = jnp.take(ct.T, slot_s, axis=0)
            return (jnp.zeros((P, 16), jnp.float32).at[g_s].add(
                rows, indices_are_sorted=True, unique_indices=False),)
        packg.defvjp(packg_fwd, packg_bwd)
        return (packg(cols) * valid).sum()
    if variant == "segmm":  # segment reduction with the matmul block-cumsum
        from ex4dgs_tpu.ops.scan_ops import matmul_block_cumsum

        @jax.custom_vjp
        def packg(c):
            return jnp.take(c, binn.order, axis=0).T
        def packg_fwd(c):
            return packg(c), None
        def packg_bwd(_, ct):
            slot = jax.lax.iota(jnp.int32, capacity)
            _g_s, slot_s = jax.lax.sort((binn.order, slot), num_keys=1,
                                        is_stable=True)
            rows = jnp.take(ct.T, slot_s, axis=0)
            pref = matmul_block_cumsum(rows)
            hi = jnp.clip(binn.cum - 1, 0, capacity - 1)
            lo = jnp.clip(binn.cum - binn.counts - 1, 0, capacity - 1)
            hi_v = jnp.where((binn.cum > 0)[:, None], jnp.take(pref, hi, axis=0), 0.0)
            lo_v = jnp.where((binn.cum - binn.counts > 0)[:, None],
                             jnp.take(pref, lo, axis=0), 0.0)
            return (jnp.where((binn.counts > 0)[:, None], hi_v - lo_v, 0.0),)
        packg.defvjp(packg_fwd, packg_bwd)
        return (packg(cols) * valid).sum()
    if variant == "seg_parts":  # segment VJP but time the pieces via dummies
        @jax.custom_vjp
        def packg(c):
            return jnp.take(c, binn.order, axis=0).T
        def packg_fwd(c):
            return packg(c), None
        def packg_bwd(_, ct):
            slot = jax.lax.iota(jnp.int32, capacity)
            _g_s, slot_s = jax.lax.sort((binn.order, slot), num_keys=1,
                                        is_stable=True)
            rows = jnp.take(ct.T, slot_s, axis=0)
            pref = blocked_cumsum_2d(rows)
            hi = jnp.clip(binn.cum - 1, 0, capacity - 1)
            lo = jnp.clip(binn.cum - binn.counts - 1, 0, capacity - 1)
            hi_v = jnp.where((binn.cum > 0)[:, None], jnp.take(pref, hi, axis=0), 0.0)
            lo_v = jnp.where((binn.cum - binn.counts > 0)[:, None],
                             jnp.take(pref, lo, axis=0), 0.0)
            return (jnp.where((binn.counts > 0)[:, None], hi_v - lo_v, 0.0),)
        packg.defvjp(packg_fwd, packg_bwd)
        return (packg(cols) * valid).sum()
    raise ValueError(variant)


import os
import sys

variants = sys.argv[1:] or ["none", "scatter", "sortscatter", "segment"]
if os.environ.get("PACKVJP_CHECK"):
    # numerical check: every variant's grad == the scatter grad
    ref = jax.jit(jax.grad(functools.partial(prefix, variant="scatter")))(
        model.params, jnp.asarray(1.0))
    for v in variants:
        if v == "scatter":
            continue
        g = jax.jit(jax.grad(functools.partial(prefix, variant=v)))(
            model.params, jnp.asarray(1.0))
        for kk in ref:
            d = float(jnp.max(jnp.abs(ref[kk] - g[kk])))
            r = float(jnp.max(jnp.abs(ref[kk]))) + 1e-30
            assert d / r < 1e-4, (v, kk, d, r)
        print(f"check [{v}]: OK", flush=True)
    sys.exit(0)

for v in variants:
    g = jax.grad(functools.partial(prefix, variant=v))
    timeit(f"grad pack [{v}]", lambda p, t, g=g: g(p, t),
           model.params, jnp.asarray(1.0))
