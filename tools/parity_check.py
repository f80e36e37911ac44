"""At-scale pallas-vs-oracle parity check on the real TPU chip.

Run (single process!): python tools/parity_check.py

Round-1 finding: at 1352x1014 with ~130 contributions/tile average, images
agree to mean |diff| ~6e-4 with a heavy tail (18% of pixels > 1e-3, max
0.36). The tail is threshold chaos, not bias: the 1/255 alpha floor and the
1e-4 transmittance latch are discontinuous, and the device transcendentals
(exp/log1p in the Mosaic kernels vs XLA's on the oracle path) differ at
~1e-6 relative — a flip at either threshold swings a whole contribution (or
a terminated tail). The same class of divergence exists between the
reference CUDA rasterizer and any reimplementation. Tracked for round 2:
quantify PSNR impact end-to-end and consider an exact-exp variant.
"""
import jax, jax.numpy as jnp, numpy as np
from ex4dgs_tpu.rendering import render
from ex4dgs_tpu.synthetic import make_scene, ring_cameras
from ex4dgs_tpu.ops.losses import l1_loss

W, H = 1352, 1014
model, cfg = make_scene(n_static=50_000, n_dynamic=5_000, duration=10.0,
                        static_capacity=50_176, dynamic_capacity=8192)
model = model._replace(params={**model.params,
    "scaling": jnp.minimum(model.params["scaling"], jnp.log(0.02))})
cam = ring_cameras(1, 3.0, W, H, far=cfg.far)[0]
cap = 2*1024*1024

def img(backend):
    return jax.jit(lambda p: render(cam, model._replace(params=p), cfg,
        t=jnp.asarray(1.0), bg=jnp.asarray([0.2,0.3,0.4]), capacity=cap,
        max_per_tile=4096, backend=backend).render)(model.params)

a = np.asarray(img("pallas")); b = np.asarray(img("jnp"))
d = np.abs(a-b)
print(f"image: max diff {d.max():.2e} mean {d.mean():.2e} frac>1e-3 {(d.max(-1)>1e-3).mean():.5f}", flush=True)

gt = jnp.zeros((H, W, 3))
def loss(backend):
    def f(p):
        r = render(cam, model._replace(params=p), cfg, t=jnp.asarray(1.0),
                   bg=jnp.zeros(3), capacity=cap, max_per_tile=4096,
                   backend=backend)
        return l1_loss(r.render, gt)
    return jax.jit(jax.grad(f))(model.params)
ga = loss("pallas"); gb = loss("jnp")
for k in ("xyz", "opacity", "scaling", "f_dc", "motion_xyz"):
    x, y = np.asarray(ga[k]), np.asarray(gb[k])
    scale = max(np.abs(y).max(), 1e-8)
    print(f"grad {k}: max abs diff {np.abs(x-y).max():.2e} (ref max {np.abs(y).max():.2e})", flush=True)
