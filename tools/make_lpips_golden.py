"""Generate tests/data/lpips_golden_{alex,vgg}.npz from the torch mirror
(tests/lpips_mirror.py) with the same seeded weights/images the tests use.
Run on CPU: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/make_lpips_golden.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from lpips_mirror import make_random_weights, torch_lpips  # noqa: E402

out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
os.makedirs(out_dir, exist_ok=True)

for net in ("alex", "vgg"):
    rng = np.random.default_rng(5)
    weights = make_random_weights(net, rng)
    img_a = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    img_b = np.clip(img_a + rng.normal(scale=0.1, size=img_a.shape),
                    0, 1).astype(np.float32)
    dist, taps = torch_lpips(img_a, img_b, net, weights)
    stats = {}
    for i, t in enumerate(taps):
        stats[f"tap{i}_mean_abs"] = np.float32(np.abs(t).mean())
        stats[f"tap{i}_shape"] = np.asarray(t.shape)
    np.savez(os.path.join(out_dir, f"lpips_golden_{net}.npz"),
             distance=np.float32(dist), **stats)
    print(net, "distance", dist)
