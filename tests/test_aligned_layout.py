"""Chunk-aligned instance layout (KernelConfig.aligned_layout) parity tests.

align_binning (ops/binning.py) re-pads the sorted instance array so every
tile's range starts on a g_chunk boundary — a pure layout transform: the
kernels then read zero leading masked lanes (the win_align waste) and own
exclusive G_CHUNK write blocks in the backward. Instances keep their order;
inserted dead slots carry the sentinel Gaussian id and are masked by
start/stop exactly like trailing-window lanes.

Reference framing: the CUDA reference has no analogous layout (its per-tile
ranges are consumed by thread blocks at any offset, rasterizer_impl.cu:321-
336); this is a TPU-specific trade (DMA lane alignment) and must be
output-invisible.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ex4dgs_tpu.kernel_config import KernelConfig, configure, current
from ex4dgs_tpu.ops import math3d as m3
from ex4dgs_tpu.ops import rasterize_pallas as rp
from ex4dgs_tpu.ops import rasterize_tiled as rt
from ex4dgs_tpu.ops.binning import align_binning, bin_gaussians
from ex4dgs_tpu.ops.projection import compute_cov3d, project_gaussians, tile_grid
from scenes import make_camera, random_gaussians

W, H = 96, 64
CAP = 8192
CHUNK = 128


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


def test_align_binning_structure():
    """Aligned starts, preserved lengths and per-tile member order, sentinel
    ids on every dead slot, padded total accounting."""
    proj, _, _ = _setup(seed=1)
    gx, gy = tile_grid(W, H)
    n = proj.xy.shape[0]
    b = bin_gaussians(proj, gx, gy, CAP)
    a = align_binning(b, n, CHUNK)
    start, stop = np.asarray(b.tile_start), np.asarray(b.tile_stop)
    astart, astop = np.asarray(a.tile_start), np.asarray(a.tile_stop)
    order, aorder = np.asarray(b.order), np.asarray(a.order)
    ln = stop - start
    assert (astart % CHUNK == 0).all()
    np.testing.assert_array_equal(astop - astart, ln)
    padded_total = int((-(-ln // CHUNK) * CHUNK).sum())
    assert int(a.total) == max(int(b.total), padded_total)
    covered = np.zeros(CAP, bool)
    for t in range(gx * gy):
        np.testing.assert_array_equal(
            aorder[astart[t]:astop[t]], order[start[t]:stop[t]])
        covered[astart[t]:astop[t]] = True
    assert (aorder[~covered] == n).all(), "dead slots must carry the sentinel"
    tile2 = np.asarray(a.tile_id)
    assert (tile2[~covered] == gx * gy).all()


def test_align_binning_overflow_clamps_and_trips_gate():
    """When the padded total exceeds capacity the layout must stay index-legal
    (clamped ranges) and report a total > capacity so the step is rejected."""
    proj, _, _ = _setup(n=600, seed=2)
    gx, gy = tile_grid(W, H)
    cap = 512  # deliberately too small for 600 splats' padded layout
    b = bin_gaussians(proj, gx, gy, cap)
    a = align_binning(b, proj.xy.shape[0], CHUNK)
    assert int(a.total) > cap
    astart, astop = np.asarray(a.tile_start), np.asarray(a.tile_stop)
    assert (astart <= cap).all() and (astop <= cap).all()
    assert np.asarray(a.order).shape == (cap,)


def test_aligned_oracle_bitwise():
    """The jnp oracle reads only [start, stop) of each tile, so the aligned
    layout must reproduce its render bit-for-bit."""
    proj, colors, flow = _setup(seed=3)
    gx, gy = tile_grid(W, H)
    bg = jnp.asarray([0.15, 0.25, 0.35])
    b = bin_gaussians(proj, gx, gy, CAP)
    a = align_binning(b, proj.xy.shape[0], CHUNK)
    out_b = rt.rasterize_tiled(proj, colors, flow, b, width=W, height=H,
                               bg=bg, max_depth=100.0, chunk=64,
                               max_per_tile=1024)
    out_a = rt.rasterize_tiled(proj, colors, flow, a, width=W, height=H,
                               bg=bg, max_depth=100.0, chunk=64,
                               max_per_tile=1024)
    np.testing.assert_array_equal(np.asarray(out_b.color), np.asarray(out_a.color))
    np.testing.assert_array_equal(np.asarray(out_b.depth), np.asarray(out_a.depth))
    np.testing.assert_array_equal(np.asarray(out_b.idx), np.asarray(out_a.idx))


@pytest.mark.parametrize("subpixel", [False, True])
def test_aligned_pallas_interpret_matches_unaligned(subpixel):
    """Pallas path (interpret): aligned == unaligned for images AND grads
    (incl. the pack-VJP cum/counts windows over the padded id-sort). Window
    phases shift, so reductions pair values differently — ulp tolerance."""
    proj, colors, flow = _setup(seed=4)
    gx, gy = tile_grid(W, H)
    bg = jnp.zeros(3)
    rng = np.random.default_rng(13)
    off = None
    if subpixel:
        off = jnp.asarray(
            rng.uniform(-0.5, 0.5, size=(H, W, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))

    def run(binning, aligned):
        def loss(xy, opac, colors):
            p = proj._replace(xy=xy, opacity=opac)
            out = rp.rasterize_tiled_pallas(
                p, colors, flow, binning, width=W, height=H, bg=bg,
                max_depth=100.0, interpret=True, subpixel_offset=off,
                aligned=aligned)
            return jnp.abs(out.color - tgt).mean(), out
        (l, out), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True)(proj.xy, proj.opacity,
                                                   colors)
        return l, out, grads

    b = bin_gaussians(proj, gx, gy, CAP)
    a = align_binning(b, proj.xy.shape[0], CHUNK)
    l0, out0, g0 = run(b, False)
    # aligned=True drives the backward's direct-window-0 path (no win0
    # output, no dense merge)
    l1, out1, g1 = run(a, True)
    # and the aligned BINNING through the unaligned kernel path must agree
    # with itself (the win0 path is still correct on aligned starts)
    l2, out2, g2 = run(a, False)
    np.testing.assert_array_equal(np.asarray(out1.color),
                                  np.asarray(out2.color))
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out0.color), np.asarray(out1.color),
                               rtol=2e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out0.idx), np.asarray(out1.idx))
    for x, y, name in zip(g1, g0, ("xy", "opacity", "colors")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=1e-6, err_msg=name)


def test_aligned_slab_lists_match_unsharded():
    """Aligning each slab's local binning preserves the per-tile member
    lists of the unsharded aligned layout (the transform is local to each
    tile's run, so sharding commutes with it)."""
    proj, _, _ = _setup(seed=6)
    gx, gy = tile_grid(W, H)
    n = proj.xy.shape[0]
    n_slabs = 2
    rows = gy // n_slabs
    b_full = align_binning(bin_gaussians(proj, gx, gy, CAP), n, CHUNK)
    start_f = np.asarray(b_full.tile_start)
    stop_f = np.asarray(b_full.tile_stop)
    order_f = np.asarray(b_full.order)
    cap_local = CAP // n_slabs
    for s in range(n_slabs):
        b_s = bin_gaussians(proj, gx, gy, cap_local, row0=s * rows,
                            rows=rows, total_tiles=gx * gy)
        a_s = align_binning(b_s, n, CHUNK)
        assert int(a_s.total) <= cap_local, "slab overflowed; enlarge CAP"
        start_s = np.asarray(a_s.tile_start)
        stop_s = np.asarray(a_s.tile_stop)
        order_s = np.asarray(a_s.order)
        assert (start_s % CHUNK == 0).all()
        for lt in range(rows * gx):
            gt_ = s * rows * gx + lt
            want = list(order_f[start_f[gt_]:stop_f[gt_]])
            got = list(order_s[start_s[lt]:stop_s[lt]])
            assert got == want, (s, lt)


def test_kernel_config_knob_roundtrip():
    base = current()
    cfg = KernelConfig(**{**base.as_dict(), "aligned_layout": True})
    cfg.validate()
    assert KernelConfig.from_dict(cfg.as_dict()).aligned_layout is True
    try:
        configure(cfg)
        assert current().aligned_layout is True
    finally:
        configure(base)
