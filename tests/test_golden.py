"""Golden regression: a fixed-seed scene rendered by the portable oracle must
keep producing byte-stable outputs across refactors (the dense/tiled/pallas
cross-checks can't catch a semantic change applied to all paths at once)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from ex4dgs_tpu.ops import math3d as m3
from ex4dgs_tpu.ops.binning import bin_gaussians
from ex4dgs_tpu.ops.projection import compute_cov3d, project_gaussians, tile_grid
from ex4dgs_tpu.ops.rasterize_tiled import rasterize_tiled
from scenes import make_camera, random_gaussians

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "render_v1.npz")
W, H = 96, 64


def _render():
    # Pin the tile shape: the golden bytes encode the 16x16 packed-key depth
    # quantization (DEPTH_BITS depends on the tile count); the production
    # default tile shape is a perf knob and must not invalidate the golden.
    from ex4dgs_tpu.kernel_config import KernelConfig, configure, current

    base = current()
    configure(KernelConfig(tile_x=16, tile_y=16, pair=2))
    try:
        return _render_inner()
    finally:
        configure(base)


def _render_inner():
    cam, meta = make_camera(W, H)
    sc = random_gaussians(250, seed=11)
    cov3d = compute_cov3d(jnp.exp(sc["log_scales"]), sc["quats"])
    opac = jax.nn.sigmoid(sc["opacity_logit"][:, 0])
    proj = project_gaussians(
        sc["means"], cov3d, opac, cam, width=W, height=H,
        tan_fovx=meta["tan_fovx"], tan_fovy=meta["tan_fovy"],
        kernel_size=0.1, min_depth=0.2, max_depth=100.0,
    )
    sh = jnp.concatenate([sc["sh_dc"], sc["sh_rest"]], axis=1)
    colors = m3.sh_to_rgb(3, sh, sc["means"], cam.campos)
    gx, gy = tile_grid(W, H)
    binning = bin_gaussians(proj, gx, gy, 8192)
    out = rasterize_tiled(
        proj, colors, jnp.zeros((250, 3)), binning, width=W, height=H,
        bg=jnp.asarray([0.1, 0.2, 0.3]), max_depth=100.0, chunk=64,
        max_per_tile=1024,
    )
    return out


def test_golden_render():
    out = _render()
    if not os.path.exists(GOLDEN):
        np.savez_compressed(
            GOLDEN, color=np.asarray(out.color), depth=np.asarray(out.depth),
            acc=np.asarray(out.acc), final_t=np.asarray(out.final_t),
        )
        raise AssertionError("golden file created — rerun to validate")
    g = np.load(GOLDEN)
    np.testing.assert_allclose(np.asarray(out.color), g["color"], atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.depth), g["depth"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.acc), g["acc"], atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.final_t), g["final_t"], atol=2e-6)
