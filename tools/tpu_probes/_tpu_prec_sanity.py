"""Post-precision-fix sanity on real TPU hardware:
1. SSIM must be in [-1, 1] on images with flat (black) regions — the bf16
   MXU default made the variance denominator negative there.
2. The pallas compositor's acc must not drift above 1 (log-space
   transmittance chain precision).
3. pallas-vs-jnp image parity on the same projected inputs.
"""
import json

import jax.numpy as jnp
import numpy as np

from ex4dgs_tpu.models import ModelConfig
from ex4dgs_tpu.ops.losses import ssim
from ex4dgs_tpu.rendering import render
from ex4dgs_tpu.synthetic import make_scene, ring_cameras

W, H = 800, 600
CAPACITY = 1024 * 1024

cfg = ModelConfig(time_interval=2, time_pad=1, start_duration=2, duration=8,
                  near=0.2, far=50.0, resolution=1)
target, _ = make_scene(n_static=50_000, n_dynamic=5_000, duration=8.0, seed=7,
                       static_capacity=65_536, dynamic_capacity=8_192, cfg=cfg,
                       opacity=0.85)
cam = ring_cameras(10, 3.0, W, H, far=cfg.far)[1]

imgs = {}
for backend in ("jnp", "pallas"):
    res = render(cam, target, cfg, t=jnp.asarray(1.0), bg=jnp.zeros(3),
                 capacity=CAPACITY, max_per_tile=4096, backend=backend)
    imgs[backend] = np.asarray(res.render)
    print(json.dumps({
        "backend": backend,
        "acc_max": float(res.acc.max()),
        "img_min": float(res.render.min()),
        "img_max": float(res.render.max()),
    }), flush=True)

a, b = imgs["jnp"], imgs["pallas"]
d = np.abs(a - b)
print(json.dumps({"parity_mean": float(d.mean()), "parity_max": float(d.max()),
                  "parity_p999": float(np.quantile(d, 0.999))}), flush=True)

# SSIM sanity: a render vs a noisy copy — black background regions are flat
ja = jnp.asarray(a)
jb = jnp.clip(ja + 0.01 * jnp.asarray(
    np.random.default_rng(0).normal(size=a.shape).astype(np.float32)), 0, 1)
vals = {
    "ssim_self": float(ssim(ja, ja)),
    "ssim_noisy": float(ssim(ja, jb)),
    "ssim_vs_black": float(ssim(ja, jnp.zeros_like(ja))),
}
print(json.dumps(vals), flush=True)
ok = abs(vals["ssim_self"] - 1) < 1e-4 and all(
    -1.0001 <= v <= 1.0001 for v in vals.values())
print("SSIM_RANGE_OK" if ok else "SSIM_RANGE_BROKEN", flush=True)
