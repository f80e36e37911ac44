"""Verify drive: chunk-aligned instance layout through the public API.

Renders a surface scene via render() with aligned_layout off/on (oracle
backend consumes the aligned binning via composite_projected when forced),
checks image parity, saves a PNG, and runs one gradient step through the
pallas interpret path with the aligned layout active.
"""
import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from ex4dgs_tpu.kernel_config import KernelConfig, configure
from ex4dgs_tpu.models import ModelConfig
from ex4dgs_tpu.ops import rasterize_pallas as rp
from ex4dgs_tpu.ops.binning import align_binning, bin_gaussians
from ex4dgs_tpu.ops.projection import tile_grid
from ex4dgs_tpu.rendering import preprocess_points, render
from ex4dgs_tpu.models.temporal import point_data_at_t
from ex4dgs_tpu.synthetic import make_surface_scene, rig_cameras

cfg = ModelConfig(time_interval=2, time_pad=1, start_duration=2, duration=8,
                  near=0.2, far=50.0, resolution=1, sh_degree=3)
target, _ = make_surface_scene(n_static=4000, n_dynamic=400, duration=8.0,
                               seed=7, static_capacity=8192,
                               dynamic_capacity=1024, cfg=cfg)
cams = rig_cameras(5, 3.0, 320, 240, far=cfg.far)
cam = cams[1]
W, H = 320, 240
CAP = 262144

# 1) public render() baseline (jnp oracle on CPU)
out0 = render(cam, target, cfg, t=jnp.asarray(1.0), bg=jnp.zeros(3),
              capacity=CAP, max_per_tile=4096)
img0 = np.clip(np.asarray(out0.render), 0, 1)
print("baseline: total", int(out0.binning_total), "mean", img0.mean())

# 2) same frame composited via the ALIGNED layout through the oracle
pts = point_data_at_t(target, cfg, jnp.asarray(1.0))
proj, colors = preprocess_points(pts, cam, cfg, near=cfg.near, far=cfg.far)
gx, gy = tile_grid(W, H)
b = bin_gaussians(proj, gx, gy, CAP)
a = align_binning(b, proj.xy.shape[0], 128)
from ex4dgs_tpu.ops import rasterize_tiled as rt
flow = jnp.zeros((proj.xy.shape[0], 3), jnp.float32)
out_a = rt.rasterize_tiled(proj, colors, flow, a, width=W, height=H,
                           bg=jnp.zeros(3), max_depth=cfg.far, chunk=128,
                           max_per_tile=4096)
img_a = np.clip(np.asarray(out_a.color), 0, 1)
d = np.abs(img0 - img_a).max()
print("aligned-vs-baseline max image diff:", d, "padded_total", int(a.total))
assert d == 0.0, d
Image.fromarray((img_a * 255).astype(np.uint8)).save("/tmp/r5_aligned.png")

# 3) one gradient step through the pallas interpret path, aligned layout on
def loss(opac, colors):
    p = proj._replace(opacity=opac)
    o = rp.rasterize_tiled_pallas(p, colors, flow, a, width=W, height=H,
                                  bg=jnp.zeros(3), max_depth=cfg.far,
                                  interpret=True, aligned=True)
    return jnp.abs(o.color - jnp.asarray(img0)).mean()

op_pert = proj.opacity * 0.5  # start away from the target
l0, (g_op, g_c) = jax.value_and_grad(loss, argnums=(0, 1))(op_pert, colors)
l1 = loss(op_pert - 10.0 * g_op, colors - 10.0 * g_c)
print("pallas-interpret aligned: loss", float(l0), "->", float(l1))
assert np.isfinite(float(l0)) and float(l1) < float(l0)
print("OK")
