"""Real-device parity check for the aligned instance layout (round 5).

Renders a moderate scene through the REAL Mosaic kernels with
aligned_layout off vs on (both the binning transform and the backward's
direct-window-0 path) and compares images and data-gradients. Interpret
mode already passes (tests/test_aligned_layout.py); this validates the
device DMA/semaphore behavior the interpreter can't.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ex4dgs_tpu.models.temporal import point_data_at_t
from ex4dgs_tpu.ops import rasterize_pallas as rp
from ex4dgs_tpu.ops.binning import align_binning, bin_gaussians
from ex4dgs_tpu.ops.losses import l1_loss
from ex4dgs_tpu.ops.projection import tile_grid
from ex4dgs_tpu.rendering import preprocess_points
from ex4dgs_tpu.models.config import ModelConfig
from ex4dgs_tpu.synthetic import make_scene, ring_cameras

W, H = 512, 384
CAP = 131072
model, cfg = make_scene(n_static=20_000, n_dynamic=2_000, duration=10.0,
                        static_capacity=20_000, dynamic_capacity=4096)
model = model._replace(params={
    **model.params,
    "scaling": jnp.minimum(model.params["scaling"], jnp.log(0.03)),
})
cam = ring_cameras(1, 3.0, W, H, far=cfg.far)[0]
pts = point_data_at_t(model, cfg, jnp.asarray(1.0))
proj, colors = preprocess_points(pts, cam, cfg, near=cfg.near, far=cfg.far)
flow = jnp.zeros((proj.xy.shape[0], 3), jnp.float32)
gx, gy = tile_grid(W, H)
rng = np.random.default_rng(0)
tgt = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
INTERP = jax.devices()[0].platform != "tpu"  # CPU smoke runs interpret mode


@jax.jit
def run_plain(xy, opac, colors):
    b = bin_gaussians(proj, gx, gy, CAP)

    def loss(xy, opac, colors):
        p = proj._replace(xy=xy, opacity=opac)
        out = rp.rasterize_tiled_pallas(p, colors, flow, b, width=W,
                                        height=H, bg=jnp.zeros(3),
                                        max_depth=cfg.far, interpret=INTERP)
        return l1_loss(out.color, tgt), out.color

    (l, img), g = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                     has_aux=True)(xy, opac, colors)
    return l, img, g


@jax.jit
def run_aligned(xy, opac, colors):
    b = align_binning(bin_gaussians(proj, gx, gy, CAP), proj.xy.shape[0],
                      rp.G_CHUNK)

    def loss(xy, opac, colors):
        p = proj._replace(xy=xy, opacity=opac)
        out = rp.rasterize_tiled_pallas(p, colors, flow, b, width=W,
                                        height=H, bg=jnp.zeros(3),
                                        max_depth=cfg.far, aligned=True,
                                        interpret=INTERP)
        return l1_loss(out.color, tgt), out.color

    (l, img), g = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                     has_aux=True)(xy, opac, colors)
    return l, img, g


l0, img0, g0 = jax.block_until_ready(run_plain(proj.xy, proj.opacity, colors))
l1, img1, g1 = jax.block_until_ready(
    run_aligned(proj.xy, proj.opacity, colors))
di = float(jnp.abs(img0 - img1).max())
print(f"loss {float(l0):.6f} vs {float(l1):.6f}  img maxdiff {di:.3e}")
ok = di < 3e-5 and np.isfinite(di)
for a, b, nm in zip(g0, g1, ("xy", "opac", "colors")):
    d = float(jnp.abs(a - b).max())
    scale = float(jnp.abs(a).max())
    print(f"grad {nm}: maxdiff {d:.3e} (scale {scale:.3e})")
    ok = ok and d <= 3e-5 * max(scale, 1.0)
print("ALIGNED PARITY", "OK" if ok else "FAIL")
