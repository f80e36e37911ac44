import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ex4dgs_tpu.ops import math3d as m3
from ex4dgs_tpu.ops.binning import bin_gaussians, Binning
from ex4dgs_tpu.ops.projection import project_gaussians, compute_cov3d, tile_grid
from ex4dgs_tpu.ops.rasterize_dense import rasterize_dense
from ex4dgs_tpu.ops.rasterize_tiled import rasterize_tiled

from scenes import make_camera, random_gaussians

W, H = 64, 48
FAR = 100.0
NEAR = 0.2
KERNEL = 0.1


def project_scene(scene, cam, camdims, mean2d_offset=None):
    cov3d = compute_cov3d(jnp.exp(scene["log_scales"]), scene["quats"])
    opac = jax.nn.sigmoid(scene["opacity_logit"])[:, 0]
    proj = project_gaussians(
        scene["means"],
        cov3d,
        opac,
        cam,
        kernel_size=KERNEL,
        min_depth=NEAR,
        max_depth=FAR,
        mean2d_ndc_offset=mean2d_offset,
        **camdims,
    )
    sh = jnp.concatenate([scene["sh_dc"], scene["sh_rest"]], axis=1)
    colors = m3.sh_to_rgb(3, sh, scene["means"], cam.campos)
    return proj, colors


@pytest.fixture(scope="module")
def setup():
    cam, camdims = make_camera(W, H)
    scene = random_gaussians(300, seed=3)
    proj, colors = project_scene(scene, cam, camdims)
    flow = jnp.zeros((300, 3))
    bg = jnp.array([0.1, 0.2, 0.3], jnp.float32)
    return cam, camdims, scene, proj, colors, flow, bg


def test_projection_sanity(setup):
    _, _, _, proj, _, _, _ = setup
    assert bool(proj.valid.any())
    assert bool((proj.radius[proj.valid] > 0).all())
    assert bool((proj.depth[proj.valid] > NEAR).all())
    tt = np.asarray(proj.tiles_touched)
    rect_area = np.asarray(
        (proj.rect_max[:, 0] - proj.rect_min[:, 0]) * (proj.rect_max[:, 1] - proj.rect_min[:, 1])
    )
    np.testing.assert_array_equal(tt[np.asarray(proj.valid)], rect_area[np.asarray(proj.valid)])


def test_binning_matches_bruteforce(setup):
    _, _, _, proj, _, _, _ = setup
    gx, gy = tile_grid(W, H)
    total = int(np.asarray(proj.tiles_touched).sum())
    b = bin_gaussians(proj, gx, gy, capacity=max(64, total + 7))
    assert int(b.total) == total

    # Brute-force per-tile sets and depth order.
    rect_min = np.asarray(proj.rect_min)
    rect_max = np.asarray(proj.rect_max)
    depth = np.asarray(proj.depth)
    valid = np.asarray(proj.valid)
    order = np.asarray(b.order)
    start = np.asarray(b.tile_start)
    stop = np.asarray(b.tile_stop)
    for t in range(gx * gy):
        ty, tx = divmod(t, gx)
        members = [
            g
            for g in range(len(depth))
            if valid[g]
            and rect_min[g, 0] <= tx < rect_max[g, 0]
            and rect_min[g, 1] <= ty < rect_max[g, 1]
        ]
        members.sort(key=lambda g: (depth[g], g))
        got = list(order[start[t] : stop[t]])
        assert got == members, f"tile {t}: {got} != {members}"


def test_exact_depth_sort_reference_semantics(setup):
    """ADVICE r2: the exact 2-key (tile, float-depth) sort — the reference's
    64-bit key semantics (rasterizer_impl.cu:110-114) — must order depths
    that tie under the packed 31-bit key's ~2^-10 quantization, and must be
    reachable from the public API via KernelConfig(exact_sort=True)."""
    _, _, _, proj, _, _, _ = setup
    gx, gy = tile_grid(W, H)
    # Depths spaced exactly 1 ULP apart (consecutive float32 bit patterns),
    # in REVERSE index order: the packed key truncates the low mantissa bits,
    # so within each truncation bucket its stable index-order tiebreak gives
    # ASCENDING index = DESCENDING true depth — provably different from the
    # exact order.
    P = proj.depth.shape[0]
    base_bits = np.float32(10.0).view(np.int32)
    k_rev = np.arange(P - 1, -1, -1, dtype=np.int32)
    proj = proj._replace(
        depth=jnp.asarray((base_bits + k_rev).view(np.float32)))
    total = int(np.asarray(proj.tiles_touched).sum())
    b = bin_gaussians(proj, gx, gy, capacity=total, exact_depth_sort=True)

    depth = np.asarray(proj.depth)
    valid = np.asarray(proj.valid)
    rect_min = np.asarray(proj.rect_min)
    rect_max = np.asarray(proj.rect_max)
    order = np.asarray(b.order)
    start = np.asarray(b.tile_start)
    stop = np.asarray(b.tile_stop)
    packed_differs = False
    b_packed = bin_gaussians(proj, gx, gy, capacity=total,
                             exact_depth_sort=False)
    order_p = np.asarray(b_packed.order)
    for t in range(gx * gy):
        ty, tx = divmod(t, gx)
        members = [
            g for g in range(P)
            if valid[g]
            and rect_min[g, 0] <= tx < rect_max[g, 0]
            and rect_min[g, 1] <= ty < rect_max[g, 1]
        ]
        members.sort(key=lambda g: (depth[g], g))
        got = list(order[start[t]:stop[t]])
        assert got == members, f"tile {t}: exact sort broke depth order"
        if list(order_p[start[t]:stop[t]]) != members:
            packed_differs = True
    # sanity: the scenario actually exercises the quantization (otherwise
    # this test would pass vacuously)
    assert packed_differs, "depths were not sub-quantum; test is vacuous"


def test_exact_sort_reachable_from_public_api(setup):
    """KernelConfig(exact_sort=True) flows through render's binning."""
    from ex4dgs_tpu.kernel_config import KernelConfig, configure, current
    from ex4dgs_tpu.rendering import composite_projected, RenderCamera

    cam_arrays, camdims, _, proj, colors, flow, bg = setup
    rcam = RenderCamera(cam_arrays.view, cam_arrays.proj, cam_arrays.campos,
                        W, H, camdims["tan_fovx"], camdims["tan_fovy"])
    base = current()
    try:
        configure(KernelConfig(exact_sort=True))
        out_e = composite_projected(proj, colors, flow, rcam, bg=bg, far=FAR,
                                    capacity=4096, backend="jnp")
        configure(KernelConfig(exact_sort=False))
        out_q = composite_projected(proj, colors, flow, rcam, bg=bg, far=FAR,
                                    capacity=4096, backend="jnp")
    finally:
        configure(base)
    # same scene, orderings differ only on sub-quantum ties: images agree
    np.testing.assert_allclose(np.asarray(out_e.render),
                               np.asarray(out_q.render), atol=1e-4)


def test_dense_tiled_agree(setup):
    _, _, _, proj, colors, flow, bg = setup
    gx, gy = tile_grid(W, H)
    total = int(np.asarray(proj.tiles_touched).sum())
    b = bin_gaussians(proj, gx, gy, capacity=total)
    dense = rasterize_dense(
        proj, colors, flow, width=W, height=H, bg=bg, max_depth=FAR
    )
    tiled = rasterize_tiled(
        proj, colors, flow, b, width=W, height=H, bg=bg, max_depth=FAR, chunk=32
    )
    np.testing.assert_allclose(np.asarray(dense.color), np.asarray(tiled.color), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dense.depth), np.asarray(tiled.depth), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dense.acc), np.asarray(tiled.acc), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dense.final_t), np.asarray(tiled.final_t), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(dense.idx), np.asarray(tiled.idx))


def test_render_nonempty(setup):
    _, _, _, proj, colors, flow, bg = setup
    dense = rasterize_dense(proj, colors, flow, width=W, height=H, bg=bg, max_depth=FAR)
    acc = np.asarray(dense.acc)
    assert acc.max() > 0.5  # something rendered
    assert acc.min() >= 0.0
    color = np.asarray(dense.color)
    assert np.isfinite(color).all()
    # empty pixels get background + far depth
    empty = acc == 0
    if empty.any():
        np.testing.assert_allclose(np.asarray(dense.depth)[empty], FAR)


def _loss_through(render_fn, scene, cam, camdims, bg):
    def loss(params):
        sc = dict(scene)
        sc.update(params)
        proj, colors = project_scene(sc, cam, camdims)
        gx, gy = tile_grid(W, H)
        out = render_fn(proj, colors, gx, gy)
        img = out.color
        target = jnp.linspace(0, 1, img.size).reshape(img.shape)
        return jnp.abs(img - target).mean()

    return loss


def test_grads_dense_vs_tiled(setup):
    cam, camdims, scene, proj, colors, flow, bg = setup
    gx, gy = tile_grid(W, H)
    total = int(np.asarray(proj.tiles_touched).sum())

    params = {k: scene[k] for k in ["means", "log_scales", "quats", "opacity_logit", "sh_dc"]}

    def dense_render(proj, colors, gx, gy):
        return rasterize_dense(
            proj, colors, jnp.zeros_like(colors), width=W, height=H, bg=bg, max_depth=FAR
        )

    def tiled_render(proj, colors, gx, gy):
        b = bin_gaussians(proj, gx, gy, capacity=total + 16)
        return rasterize_tiled(
            proj,
            colors,
            jnp.zeros_like(colors),
            b,
            width=W,
            height=H,
            bg=bg,
            max_depth=FAR,
            chunk=64,
        )

    g_dense = jax.grad(_loss_through(dense_render, scene, cam, camdims, bg))(params)
    g_tiled = jax.grad(_loss_through(tiled_render, scene, cam, camdims, bg))(params)
    for k in params:
        gd, gt = np.asarray(g_dense[k]), np.asarray(g_tiled[k])
        assert np.isfinite(gd).all(), k
        scale = max(np.abs(gd).max(), 1e-8)
        np.testing.assert_allclose(gd, gt, atol=5e-4 * scale + 1e-8, err_msg=k)
    # gradients actually flow
    assert np.abs(np.asarray(g_dense["means"])).max() > 0


def test_flow_gradient_channel(setup):
    """The error-backtracking channel: cotangent on the flow output must land
    on per-Gaussian flow vectors as w_i/acc accumulation and nowhere else."""
    cam, camdims, scene, proj, colors, _, bg = setup
    gx, gy = tile_grid(W, H)
    total = int(np.asarray(proj.tiles_touched).sum())
    b = bin_gaussians(proj, gx, gy, capacity=total)

    def flow_out(flowvec, opacity_logit):
        sc = dict(scene)
        sc["opacity_logit"] = opacity_logit
        proj2, colors2 = project_scene(sc, cam, camdims)
        out = rasterize_tiled(
            proj2, colors2, flowvec, b, width=W, height=H, bg=bg, max_depth=FAR, chunk=64
        )
        return out.flow

    flow0 = jnp.zeros((300, 3))
    hook = jnp.ones((H, W, 3))  # fake cotangent, like the reference's hook
    _, vjp = jax.vjp(flow_out, flow0, scene["opacity_logit"])
    d_flow, d_opac = vjp(hook)
    d_flow = np.asarray(d_flow)
    assert d_flow.max() > 0  # visible gaussians accumulate weight
    np.testing.assert_allclose(np.asarray(d_opac), 0.0, atol=1e-8)  # no leak into alpha

    # d_flow[g] = sum_pix w_g(pix)/acc(pix): bounded by pixel count, >=0
    assert (d_flow >= -1e-6).all()


def test_mean2d_offset_grad(setup):
    """Densification-stats channel: gradient w.r.t. the NDC dummy offset."""
    cam, camdims, scene, proj, colors, flow, bg = setup

    def loss(offset):
        proj2, colors2 = project_scene(scene, cam, camdims, mean2d_offset=offset)
        out = rasterize_dense(
            proj2, colors2, flow, width=W, height=H, bg=bg, max_depth=FAR
        )
        return (out.color**2).sum()

    g = jax.grad(loss)(jnp.zeros((300, 3)))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g[:, :2]).max() > 0


def test_tight_rect_lossless(setup):
    """The opacity-aware rect shrink (projection.py) must not change images:
    contributions outside the shrunk rect are below the 1/255 alpha floor the
    compositor drops anyway."""
    import jax.numpy as jnp
    from ex4dgs_tpu.ops.binning import bin_gaussians
    from ex4dgs_tpu.ops.projection import tile_grid

    from ex4dgs_tpu.ops.projection import TILE_X, TILE_Y

    cam, camdims, scene, proj, colors, flow, bg = setup
    # rebuild rects at the reference's full 3-sigma radius
    gx, gy = tile_grid(W, H)
    r = proj.radius.astype(jnp.float32)
    rmin_x = jnp.clip(((proj.xy[:, 0] - r) / TILE_X).astype(jnp.int32), 0, gx)
    rmin_y = jnp.clip(((proj.xy[:, 1] - r) / TILE_Y).astype(jnp.int32), 0, gy)
    # exact exclusive bound (projection.py fixes the reference's
    # integer-ceil idiom, which undercounts for fractional centers)
    rmax_x = jnp.clip(
        jnp.floor((proj.xy[:, 0] + r) / TILE_X).astype(jnp.int32) + 1, 0, gx)
    rmax_y = jnp.clip(
        jnp.floor((proj.xy[:, 1] + r) / TILE_Y).astype(jnp.int32) + 1, 0, gy)
    tt = jnp.where(proj.valid, (rmax_x - rmin_x) * (rmax_y - rmin_y), 0)
    proj_wide = proj._replace(
        rect_min=jnp.stack([rmin_x, rmin_y], -1),
        rect_max=jnp.stack([rmax_x, rmax_y], -1),
        tiles_touched=tt,
    )
    out_tight = rasterize_tiled(
        proj, colors, flow, bin_gaussians(proj, gx, gy, 16384),
        width=W, height=H, bg=bg, max_depth=FAR, chunk=64, max_per_tile=2048,
    )
    out_wide = rasterize_tiled(
        proj_wide, colors, flow, bin_gaussians(proj_wide, gx, gy, 16384),
        width=W, height=H, bg=bg, max_depth=FAR, chunk=64, max_per_tile=2048,
    )
    # Excluded contributions are exact zeros; shifted chunk boundaries can
    # re-associate the transmittance product by ~1 ulp.
    dc = np.abs(np.asarray(out_tight.color) - np.asarray(out_wide.color))
    da = np.abs(np.asarray(out_tight.acc) - np.asarray(out_wide.acc))
    assert (dc < 1e-6).mean() == 1.0
    assert dc.max() < 1e-5
    assert da.max() < 1e-5


def test_tiles_to_image_lane_aligned_exact():
    """The channel-padded (lane-aligned) assembly path is exactly the naive
    reshape/moveaxis, for every channel rank it dispatches on."""
    import numpy as np

    from ex4dgs_tpu.ops.compositing import tiles_to_image

    rng = np.random.default_rng(0)
    gy, gx, ty, tx = 3, 5, 16, 32
    h, w = gy * ty - 7, gx * tx - 13

    def naive(arr, ch):
        img = np.asarray(arr).reshape(gy, gx, ty, tx, *ch)
        img = np.moveaxis(img, 2, 1).reshape(gy * ty, gx * tx, *ch)
        return img[:h, :w]

    for ch, dtype in (((3,), np.float32), ((1,), np.float32),
                      ((2,), np.int32), ((), np.float32)):
        arr = rng.normal(size=(gy * gx, ty * tx, *ch))
        arr = (arr * 100).astype(dtype)
        out = tiles_to_image(jnp.asarray(arr), gy, gx, ty, tx, h, w)
        np.testing.assert_array_equal(np.asarray(out), naive(arr, ch))
