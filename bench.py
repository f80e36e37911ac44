"""Benchmark: fwd+bwd rasterizer throughput in Mpixels/s on one chip.

Mirrors the reference's training-step hot path (render -> L1+SSIM loss ->
full backward) at the N3V training resolution (1352x1014,
configs/N3V/n3v_base.json:9) with a realistic splat count.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is relative to BASELINE.md's documented ESTIMATE of the
reference CUDA rasterizer's fwd+bwd throughput on an RTX 4090 (~40 Mpix/s,
derived from its ~1h/40k-iteration training wall time at this resolution;
the repo publishes no numbers — see BASELINE.md).
"""
from __future__ import annotations

import json
import time

import os

BASELINE_MPIX_S = 40.0  # documented estimate, see BASELINE.md
W = int(os.environ.get("BENCH_W", 1352))
H = int(os.environ.get("BENCH_H", 1014))
N_STATIC = int(os.environ.get("BENCH_STATIC", 100_000))
N_DYNAMIC = int(os.environ.get("BENCH_DYNAMIC", 10_000))
ITERS = int(os.environ.get("BENCH_ITERS", 10))


def main():
    import jax
    import jax.numpy as jnp

    from ex4dgs_tpu.ops.losses import l1_loss, ssim
    from ex4dgs_tpu.rendering import render
    from ex4dgs_tpu.synthetic import make_scene, ring_cameras

    model, cfg = make_scene(
        n_static=N_STATIC, n_dynamic=N_DYNAMIC, duration=10.0,
        static_capacity=N_STATIC, dynamic_capacity=N_DYNAMIC + 6384,
    )
    # trained-scene splat sizes (make_scene's KNN init overshoots); also keeps
    # every instance inside the binning capacity — the benchmark must not
    # silently drop overflowed instances.
    model = model._replace(params={
        **model.params,
        "scaling": jnp.minimum(model.params["scaling"], jnp.log(0.02)),
    })
    cam = ring_cameras(1, 3.0, W, H, far=cfg.far)[0]
    gt = jnp.zeros((H, W, 3), jnp.float32)

    capacity = int(os.environ.get("BENCH_CAPACITY", 2 * 1024 * 1024))
    max_per_tile = int(os.environ.get("BENCH_MAX_PER_TILE", 1024))

    from ex4dgs_tpu.rendering import render as _render

    probe = _render(cam, model, cfg, t=jnp.asarray(1.0), bg=jnp.zeros(3),
                    capacity=capacity, max_per_tile=max_per_tile)
    total = int(probe.binning_total)
    assert total <= capacity, (
        f"bench scene overflows binning capacity ({total} > {capacity}); "
        "raise BENCH_CAPACITY"
    )
    # Re-bin at the capacity the trainer's growth policy converges to
    # (train/trainer.py:261: round_capacity(total*5/4, 64k)) — a 2x-oversized
    # static capacity taxes every capacity-shaped op roughly linearly.
    from ex4dgs_tpu.models.state import round_capacity

    capacity = min(capacity, round_capacity(total * 5 // 4, 65536))
    print(f"# instances per frame: {total} (capacity {capacity})")

    def loss_fn(params, t):
        m = model._replace(params=params)
        res = render(cam, m, cfg, t=t, bg=jnp.zeros(3), capacity=capacity,
                     max_per_tile=max_per_tile, chunk=256)
        img = res.render
        return 0.8 * l1_loss(img, gt) + 0.2 * (1.0 - ssim(img, gt))

    step = jax.jit(jax.grad(loss_fn))

    # compile + warmup
    g = step(model.params, jnp.asarray(1.0))
    jax.block_until_ready(g)
    for i in range(2):
        g = step(model.params, jnp.asarray(float(i % 5)))
    jax.block_until_ready(g)

    t0 = time.perf_counter()
    for i in range(ITERS):
        g = step(model.params, jnp.asarray(float(i % 5)))
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0

    mpix_s = W * H * ITERS / dt / 1e6
    print(json.dumps({
        "metric": "rasterizer_fwd_bwd_throughput",
        "value": round(mpix_s, 3),
        "unit": "Mpixels/s/chip",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 4),
    }))


if __name__ == "__main__":
    main()
