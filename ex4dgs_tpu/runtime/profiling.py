"""Profiling and step timing.

The reference only has torch.cuda.Event pairs around the step
(train.py:70-71,108,175). Here: a streaming step timer with percentile
summaries and Mpixels/s derivation, plus a jax.profiler trace context for
full XLA/TPU timelines viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace (open in TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-time tracker for jitted steps; call stop() with a device array to
    block on (accurate async timing)."""

    def __init__(self, window: int = 200):
        self.window = window
        self.times: list[float] = []
        self._t0 = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, block_on=None) -> float:
        if block_on is not None:
            import jax

            jax.block_until_ready(block_on)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    def summary(self, pixels: int | None = None) -> dict:
        arr = np.asarray(self.times)
        if arr.size == 0:
            return {}
        out = {
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "steps_per_s": float(1.0 / arr.mean()),
        }
        if pixels:
            out["mpixels_per_s"] = float(pixels / arr.mean() / 1e6)
        return out


def roofline(flops: float, bytes_accessed: float, seconds: float,
             peak_flops: float = 394e12 / 2, peak_bw: float = 819e9) -> dict:
    """Roofline placement for a measured kernel on v5e (f32 MXU ~98 TFLOPs,
    bf16 ~197 TFLOPs per chip; HBM ~819 GB/s)."""
    achieved = flops / seconds
    intensity = flops / max(bytes_accessed, 1)
    bound = min(peak_flops, intensity * peak_bw)
    return {
        "achieved_tflops": achieved / 1e12,
        "intensity_flops_per_byte": intensity,
        "roof_tflops": bound / 1e12,
        "efficiency": achieved / bound,
        "memory_bound": bool(intensity * peak_bw < peak_flops),
    }
