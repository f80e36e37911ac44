"""Tight corner-tile culling (KernelConfig.tight_cull) parity tests.

The cull drops instances whose Gaussian provably stays below the 1/255
compositing alpha floor everywhere in their tile (ops/binning.py). Because
the oracle (ops/compositing.py) skips any sample with alpha < ALPHA_MIN,
culling such instances must not change ANY output or gradient — in the
unsharded binning, in slab (tile-sharded) binning, and on the Pallas path
with subpixel AA active (the bound carries a 1 px margin for it).

Reference tile-rect semantics the cull must respect: forward.cu:246-250.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ex4dgs_tpu.kernel_config import KernelConfig, configure, current
from ex4dgs_tpu.ops import math3d as m3
from ex4dgs_tpu.ops import rasterize_pallas as rp
from ex4dgs_tpu.ops import rasterize_tiled as rt
from ex4dgs_tpu.ops.binning import bin_gaussians
from ex4dgs_tpu.ops.compositing import ALPHA_MIN
from ex4dgs_tpu.ops.projection import compute_cov3d, project_gaussians, tile_grid
from scenes import make_camera, random_gaussians

W, H = 96, 64
CAP = 8192


def _setup(n=300, seed=0):
    cam, meta = make_camera(W, H)
    sc = random_gaussians(n, seed=seed)
    cov3d = compute_cov3d(jnp.exp(sc["log_scales"]), sc["quats"])
    opac = jax.nn.sigmoid(sc["opacity_logit"][:, 0])
    proj = project_gaussians(
        sc["means"], cov3d, opac, cam,
        width=W, height=H, tan_fovx=meta["tan_fovx"], tan_fovy=meta["tan_fovy"],
        kernel_size=0.1, min_depth=0.2, max_depth=100.0,
    )
    sh = jnp.concatenate([sc["sh_dc"], sc["sh_rest"]], axis=1)
    colors = m3.sh_to_rgb(3, sh, sc["means"], cam.campos)
    rng = np.random.default_rng(seed + 7)
    flow = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.1)
    return proj, colors, flow


def _bin(proj, tight: bool, **kw):
    gx, gy = tile_grid(W, H)
    base = current()
    try:
        configure(KernelConfig(**{**base.as_dict(), "tight_cull": tight}))
        return bin_gaussians(proj, gx, gy, CAP, **kw)
    finally:
        configure(base)


def _composited(b):
    return int(np.asarray(b.tile_stop - b.tile_start).sum())


def test_cull_fires_and_is_conservative():
    """The cull must actually remove corner-tile instances on a generic
    scene, and every removed instance's true max alpha over its tile's
    pixel grid (enlarged by the 1 px AA margin) must sit below ALPHA_MIN."""
    proj, _, _ = _setup()
    b_off = _bin(proj, tight=False)
    b_on = _bin(proj, tight=True)
    assert int(b_on.total) == int(b_off.total)  # overflow accounting unchanged
    n_off, n_on = _composited(b_off), _composited(b_on)
    # On this 3x4-tile test grid splats span most of their rect, so the
    # cull rate is small (the 15-30% corner-tile estimate applies to
    # production scenes with many splats per tile); what matters here is
    # that it fires and that everything it removes is provably sub-floor.
    assert n_on < n_off, "tight cull removed nothing on a 300-splat scene"

    gx, gy = tile_grid(W, H)
    start_off = np.asarray(b_off.tile_start)
    stop_off = np.asarray(b_off.tile_stop)
    start_on = np.asarray(b_on.tile_start)
    stop_on = np.asarray(b_on.tile_stop)
    order_off = np.asarray(b_off.order)
    order_on = np.asarray(b_on.order)
    xy = np.asarray(proj.xy)
    conic = np.asarray(proj.conic)
    opac = np.asarray(proj.opacity * proj.valid)
    base = current()
    tx, ty = base.tile_x, base.tile_y
    margin = 1.0
    checked = 0
    for t in range(gx * gy):
        kept = list(order_on[start_on[t]:stop_on[t]])
        full = list(order_off[start_off[t]:stop_off[t]])
        removed = set(full) - set(kept)
        assert set(kept) <= set(full)  # cull only removes
        assert kept == [g for g in full if g in set(kept)]  # order preserved
        tyy, txx = divmod(t, gx)
        # dense pixel grid over the tile, enlarged by the AA margin
        us = np.arange(txx * tx - margin, txx * tx + tx + margin + 0.5, 0.5)
        vs = np.arange(tyy * ty - margin, tyy * ty + ty + margin + 0.5, 0.5)
        uu, vv = np.meshgrid(us, vs)
        for g in removed:
            du = uu - xy[g, 0]
            dv = vv - xy[g, 1]
            q = (conic[g, 0] * du * du + 2 * conic[g, 1] * du * dv
                 + conic[g, 2] * dv * dv)
            amax = opac[g] * np.exp(-0.5 * q.min())
            assert amax < ALPHA_MIN, (t, g, amax)
            checked += 1
    assert checked > 0


@pytest.mark.parametrize("subpixel", [False, True])
def test_cull_images_and_grads_bitwise_oracle(subpixel):
    """cull-on == cull-off through the jnp oracle: images AND gradients.

    The oracle skips alpha < ALPHA_MIN samples exactly (compositing.py), so
    removing provably-sub-floor instances changes nothing mathematically —
    including every gradient (the skip is a where-mask, so skipped samples
    already carry exactly-zero cotangents). Bit-for-bit equality is NOT
    achievable even so: removing an instance shifts every later instance's
    position along the reduction axis, and XLA's tree reductions pair the
    (identical) values differently — a few-ulp effect. Tolerance is set at
    ulp scale, far below any real blend contribution (alpha floor = 1/255)."""
    proj, colors, flow = _setup(seed=3)
    bg = jnp.asarray([0.15, 0.25, 0.35])
    tgt = jnp.asarray(
        np.random.default_rng(5).uniform(size=(H, W, 3)).astype(np.float32))
    off = None
    if subpixel:
        rng = np.random.default_rng(11)
        off = jnp.asarray(
            rng.uniform(-0.5, 0.5, size=(H, W, 2)).astype(np.float32))

    def loss(xy, conic, opac, colors, binning):
        p = proj._replace(xy=xy, conic=conic, opacity=opac)
        out = rt.rasterize_tiled(p, colors, flow, binning, width=W, height=H,
                                 bg=bg, max_depth=100.0, chunk=64,
                                 max_per_tile=1024, subpixel_offset=off)
        return jnp.abs(out.color - tgt).mean(), out.color

    args = (proj.xy, proj.conic, proj.opacity, colors)
    outs = {}
    for tight in (False, True):
        b = _bin(proj, tight=tight)
        (l, img), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True)(*args, b)
        outs[tight] = (l, img, grads)
    l0, img0, g0 = outs[False]
    l1, img1, g1 = outs[True]
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1),
                               rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=2e-6, atol=1e-9)
    for a, b_, name in zip(g1, g0, ("xy", "conic", "opacity", "colors")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=1e-7, err_msg=name)


def test_cull_pallas_interpret_matches_cull_off():
    """The Pallas path (interpret mode) with subpixel AA active: cull-on
    must reproduce cull-off to ulp tolerance (same kernel, shorter lists —
    G_CHUNK window boundaries shift, so reductions pair values differently)."""
    proj, colors, flow = _setup(seed=4)
    bg = jnp.zeros(3)
    rng = np.random.default_rng(13)
    off = jnp.asarray(rng.uniform(-0.5, 0.5, size=(H, W, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))

    def run(binning):
        def loss(opac, colors):
            p = proj._replace(opacity=opac)
            out = rp.rasterize_tiled_pallas(
                p, colors, flow, binning, width=W, height=H, bg=bg,
                max_depth=100.0, interpret=True, subpixel_offset=off)
            return jnp.abs(out.color - tgt).mean(), out.color
        (l, img), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(proj.opacity, colors)
        return l, img, grads

    b_off = _bin(proj, tight=False)
    b_on = _bin(proj, tight=True)
    assert _composited(b_on) < _composited(b_off)
    l0, img0, g0 = run(b_off)
    l1, img1, g1 = run(b_on)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1),
                               rtol=2e-6, atol=1e-6)
    for a, b_, name in zip(g1, g0, ("opacity", "colors")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=1e-6, err_msg=name)


@pytest.mark.parametrize("n_slabs", [2, 4])
def test_cull_slab_mode_matches_unsharded(n_slabs):
    """Slab (tile-row-sharded) binning with the cull on: concatenating the
    slabs' per-tile member lists must equal the unsharded cull-on lists —
    the slab path computes the tile row via the global row_g offset, so the
    bound (and thus the cull decision) is identical."""
    proj, _, _ = _setup(seed=6)
    gx, gy = tile_grid(W, H)
    assert gy % n_slabs == 0
    rows = gy // n_slabs
    b_full = _bin(proj, tight=True)
    start_f = np.asarray(b_full.tile_start)
    stop_f = np.asarray(b_full.tile_stop)
    order_f = np.asarray(b_full.order)
    cap_local = CAP // n_slabs
    for s in range(n_slabs):
        base = current()
        try:
            configure(KernelConfig(**{**base.as_dict(), "tight_cull": True}))
            b_s = bin_gaussians(proj, gx, gy, cap_local,
                                row0=s * rows, rows=rows,
                                total_tiles=gx * gy)
        finally:
            configure(base)
        assert int(b_s.total) <= cap_local, "slab overflowed; enlarge CAP"
        start_s = np.asarray(b_s.tile_start)
        stop_s = np.asarray(b_s.tile_stop)
        order_s = np.asarray(b_s.order)
        for lt in range(rows * gx):
            gt_ = s * rows * gx + lt
            want = list(order_f[start_f[gt_]:stop_f[gt_]])
            got = list(order_s[start_s[lt]:stop_s[lt]])
            assert got == want, (s, lt)
