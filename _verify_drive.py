"""Verify drive: render a synthetic scene through the public API (both
untile layouts), save PNGs, check a gradient step decreases loss."""
import os
import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from ex4dgs_tpu.rendering import render
from ex4dgs_tpu.synthetic import make_scene, ring_cameras
from ex4dgs_tpu.ops.losses import l1_loss, ssim
from ex4dgs_tpu.ops import compositing

W, H = 416, 320
model, cfg = make_scene(n_static=3_000, n_dynamic=300, duration=10.0,
                        static_capacity=3_072, dynamic_capacity=384)
cam = ring_cameras(1, 3.0, W, H, far=cfg.far)[0]
bg = jnp.zeros(3)

imgs = {}
for mode in ("naive", "aligned"):
    os.environ["EX4DGS_UNTILE"] = mode
    res = render(cam, model, cfg, t=jnp.asarray(1.0), bg=bg,
                 capacity=262_144, max_per_tile=1024)
    img = np.asarray(res.render)
    imgs[mode] = img
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
        f"/tmp/verify_{mode}.png")
    print(f"{mode}: img range [{img.min():.4f}, {img.max():.4f}], "
          f"acc max {float(res.acc.max()):.4f}, "
          f"binning_total {int(res.binning_total)}")

d = np.abs(imgs["naive"] - imgs["aligned"]).max()
print(f"naive-vs-aligned max abs diff: {d:.2e}")
assert d == 0.0, "untile layouts must be exact"

# one gradient step decreases loss
os.environ["EX4DGS_UNTILE"] = "naive"
gt = jnp.asarray(imgs["naive"]) * 0.0 + 0.3


def loss_fn(params):
    m = model._replace(params=params)
    r = render(cam, m, cfg, t=jnp.asarray(1.0), bg=bg, capacity=262_144,
               max_per_tile=1024)
    return 0.8 * l1_loss(r.render, gt) + 0.2 * (1 - ssim(r.render, gt))


l0, g = jax.value_and_grad(loss_fn)(model.params)
p1 = jax.tree.map(lambda p, gr: p - 0.5 * gr, model.params, g)
l1v = loss_fn(p1)
print(f"loss before {float(l0):.5f} after one step {float(l1v):.5f}")
assert float(l1v) < float(l0)
print("VERIFY OK")
