"""Benchmark: fwd+bwd rasterizer throughput in Mpixels/s on one chip.

Mirrors the reference's training-step hot path (render -> L1+SSIM loss ->
full backward) at the N3V training resolution (1352x1014,
configs/N3V/n3v_base.json:9) with a realistic splat count, and additionally
times the FULL jitted train step (render + loss + backward + RAdam + stat
accumulators, train/step.py — the analog of the reference's whole iteration
body, train.py:108-255) so step overheads can't hide outside the headline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
`vs_baseline` is relative to BASELINE.md's documented ESTIMATE of the
reference CUDA rasterizer's fwd+bwd throughput on an RTX 4090 (~40 Mpix/s,
derived from its ~1h/40k-iteration training wall time at this resolution;
the repo publishes no numbers — see BASELINE.md).

Transient-backend retry: the TPU compile service occasionally reports
`Unable to initialize backend 'axon': UNAVAILABLE` (this burned the round-2
driver bench and two judge re-runs). JAX caches backend-init failures
in-process, so the retry re-execs this script as a subprocess (bounded
attempts, fixed backoff) and only retries on transient-looking errors.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_MPIX_S = 40.0  # documented estimate, see BASELINE.md
W = int(os.environ.get("BENCH_W", 1352))
H = int(os.environ.get("BENCH_H", 1014))
N_STATIC = int(os.environ.get("BENCH_STATIC", 100_000))
N_DYNAMIC = int(os.environ.get("BENCH_DYNAMIC", 10_000))
ITERS = int(os.environ.get("BENCH_ITERS", 20))
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))  # report the best VALID window
# (a transient TPU-service stall inside one ~1s timing window once produced
# a 10x-low outlier while the train-step metric measured seconds later was
# fine; and once the service glitched the OTHER way — block_until_ready
# returned without executing and a 20-iter window "took" 5 ms, i.e. a
# 5229 Mpix/s reading. Windows implausibly faster than the median are
# discarded, and the whole measurement re-runs while the result exceeds a
# physical plausibility ceiling.)
PLAUSIBLE_MAX_MPIX_S = float(os.environ.get("BENCH_PLAUSIBLE_MAX", 300.0))

_TRANSIENT = (
    "Unable to initialize backend",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "failed to connect",
)


def _run_with_retry() -> int:
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "4"))
    delay = float(os.environ.get("BENCH_RETRY_DELAY", "180"))
    rc = 1
    for k in range(attempts):
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "BENCH_INNER": "1"},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        lines: list[str] = []
        assert proc.stdout is not None
        for line in proc.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            lines.append(line)
        rc = proc.wait()
        if rc == 0:
            return 0
        tail = "".join(lines[-200:])
        if k == attempts - 1 or not any(p in tail for p in _TRANSIENT):
            return rc
        print(f"# bench attempt {k + 1}/{attempts} hit a transient backend "
              f"error; retrying in {delay:.0f}s", flush=True)
        time.sleep(delay)
    return rc


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

    probe = render(cam, model, cfg, t=jnp.asarray(1.0), bg=jnp.zeros(3),
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

    # gt is a jit ARGUMENT, not a closure constant: a constant gt lets XLA
    # fold blur(gt)/blur(gt^2) (and with gt=0 the whole covariance term) out
    # of the SSIM — ~6 ms/step of real training work the metric must include
    # (found via tools/tpu_probes/_tpu_stepover.py: the "train_step overhead"
    # was mostly this folding, not step machinery).
    def loss_fn(params, t, gt):
        m = model._replace(params=params)
        res = render(cam, m, cfg, t=t, bg=jnp.zeros(3), capacity=capacity,
                     max_per_tile=max_per_tile, chunk=256)
        img = res.render
        return 0.8 * l1_loss(img, gt) + 0.2 * (1.0 - ssim(img, gt))

    step = jax.jit(jax.grad(loss_fn))

    # compile + warmup
    g = step(model.params, jnp.asarray(1.0), gt)
    jax.block_until_ready(g)
    for i in range(2):
        g = step(model.params, jnp.asarray(float(i % 5)), gt)
    jax.block_until_ready(g)

    def measure(tick, out_of):
        """Best valid window: windows > 5x faster than the median are service
        glitches (block_until_ready returning without executing), not speed;
        re-run the whole set while the result is physically implausible."""
        for _attempt in range(3):
            dts = []
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                for i in range(ITERS):
                    o = tick(i)
                jax.block_until_ready(out_of(o))
                dts.append(time.perf_counter() - t0)
            med = sorted(dts)[len(dts) // 2]
            valid = [d for d in dts if d > med / 5]
            best = min(valid)
            rate = W * H * ITERS / best / 1e6
            if rate <= PLAUSIBLE_MAX_MPIX_S:
                return rate
            print(f"# implausible window ({rate:.0f} Mpix/s) — service "
                  "glitch, re-measuring", flush=True)
            time.sleep(10)
        raise RuntimeError(
            f"bench measurement implausible after retries ({rate:.0f} "
            "Mpix/s); TPU service UNAVAILABLE-class glitch")

    mpix_s = measure(lambda i: step(model.params, jnp.asarray(float(i % 5)), gt),
                     lambda o: o)

    # --- full train step (render+loss+bwd+RAdam+stat accumulators) ---------
    train_mpix_s = None
    if os.environ.get("BENCH_TRAIN_STEP", "1") == "1":
        from ex4dgs_tpu.models.config import OptimizationConfig
        from ex4dgs_tpu.models.optimizer import init_state
        from ex4dgs_tpu.train.step import StepStatics, train_step

        statics = StepStatics(
            cfg=cfg, opt=OptimizationConfig(), spatial_lr_scale=3.0,
            capacity=capacity, chunk=256, max_per_tile=max_per_tile,
        )
        opt_state = init_state(model.params)
        bg = jnp.zeros(3)

        def tick(i):
            return train_step(model, opt_state, cam, gt,
                              jnp.asarray(float(i % 5)), bg,
                              jnp.asarray(100, jnp.int32), statics)

        out = tick(0)
        jax.block_until_ready(out.loss)
        out = tick(1)
        jax.block_until_ready(out.loss)
        train_mpix_s = measure(tick, lambda o: o.loss)

    # --- render-only (the reference's FPS recipe shape, render.py:91-96) ---
    rfn = jax.jit(lambda t: render(
        cam, model, cfg, t=t, bg=jnp.zeros(3), capacity=capacity,
        max_per_tile=max_per_tile, chunk=256).render)
    jax.block_until_ready(rfn(jnp.asarray(1.0)))
    jax.block_until_ready(rfn(jnp.asarray(2.0)))
    render_mpix_s = measure(lambda i: rfn(jnp.asarray(float(i % 5))),
                            lambda o: o)
    # live-viewer shape: RGB only (no dominant-idx bookkeeping, ~5 ms/frame
    # at this scale) — what a real-time client actually pays
    rfn_n = jax.jit(lambda t: render(
        cam, model, cfg, t=t, bg=jnp.zeros(3), capacity=capacity,
        max_per_tile=max_per_tile, chunk=256, track_idx=False).render)
    jax.block_until_ready(rfn_n(jnp.asarray(1.0)))
    jax.block_until_ready(rfn_n(jnp.asarray(2.0)))
    render_noidx_mpix_s = measure(lambda i: rfn_n(jnp.asarray(float(i % 5))),
                                  lambda o: o)

    from ex4dgs_tpu.kernel_config import current as _kc

    print(json.dumps({
        "metric": "rasterizer_fwd_bwd_throughput",
        "value": round(mpix_s, 3),
        "unit": "Mpixels/s/chip",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 4),
        "train_step_mpix_s": (
            round(train_mpix_s, 3) if train_mpix_s is not None else None
        ),
        "render_mpix_s": round(render_mpix_s, 3),
        "render_noidx_mpix_s": round(render_noidx_mpix_s, 3),
        "instances": total,
        "capacity": capacity,
        "resolution": [W, H],
        "kernel_config": _kc().as_dict(),
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER") == "1":
        main()
    else:
        sys.exit(_run_with_retry())
