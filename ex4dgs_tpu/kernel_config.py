"""Kernel tuning knobs as validated configuration (VERDICT round-2 #5).

The rasterizer kernels are shaped by five knobs that used to be import-time
environment variables. They are now a `KernelConfig`: env vars remain
*overrides* (read once, at first use), every combination is validated with an
actionable error at configure time instead of failing somewhere inside
Mosaic, and the active config is recorded in checkpoints and in bench.py's
JSON line so every artifact is self-describing.

Knobs (defaults are the measured optima, BASELINE.md round-2 ledger):
  tile_x, tile_y  — tile shape in pixels (reference: 16x16, config.h:16-17)
  pair            — tiles composited per Pallas grid step (pane batching)
  g_chunk         — instances per DMA window
  win_align       — forward read-window alignment granularity
  bufs            — read-DMA pipeline depth

Mechanics: the ops modules bind these as module globals (kernel closures read
them at trace time), so `configure()` rebinds the globals in every loaded
ex4dgs_tpu module — including derived values (N_PIX) and by-value re-imports —
and clears jit caches. Reconfiguring is therefore safe at any host-code
point; traced graphs are never mixed between configs.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

_ENV = {
    "tile": "EX4DGS_TILE", "pair": "EX4DGS_PAIR", "g_chunk": "EX4DGS_GCHUNK",
    "win_align": "EX4DGS_ALIGN", "bufs": "EX4DGS_BUFS",
    "exact_sort": "EX4DGS_EXACT_SORT", "pair_fwd": "EX4DGS_PAIR_FWD",
    "tight_cull": "EX4DGS_TIGHT_CULL",
    "aligned_layout": "EX4DGS_ALIGNED_LAYOUT",
    "kernel_dot": "EX4DGS_KERNEL_DOT", "power": "EX4DGS_POWER",
    "pack_vjp": "EX4DGS_PACK_VJP", "ssim_blur": "EX4DGS_SSIM_BLUR",
    "scan_dot": "EX4DGS_SCAN_DOT", "untile": "EX4DGS_UNTILE",
}

# Allowed values for the string-valued numeric-strategy knobs (VERDICT r4 #6:
# these were loose import-time env vars; now validated, checkpoint-recorded,
# env-as-override like the structural knobs).
_CHOICES = {
    # in-kernel dot_general strategy: per-site operand split (default),
    # forced 3-pass, forced 4-pass, or Mosaic's 6-pass HIGHEST lowering (A/B)
    "kernel_dot": ("split", "split3", "split4", "highest"),
    # power evaluation: direct VPU quadratic form vs pixel-moment MXU matmul
    "power": ("direct", "mxu"),
    # pack-gather VJP: prefix-difference segment reduction vs XLA scatter-add
    "pack_vjp": ("segment", "scatter"),
    # SSIM separable blur: exact-f32 sublane shift-adds vs HIGHEST band-matmul
    "ssim_blur": ("shifts", "matmul"),
    # blocked-cumsum triangular dot: one-sided operand split vs HIGHEST
    "scan_dot": ("split", "highest"),
    # tile->image assembly layout (aligned measured slower — BASELINE.md r4b)
    "untile": ("naive", "aligned"),
}

# Empirical scoped-VMEM budget for the backward kernel's live set, in
# pair * n_pix * g_chunk units: PAIR=2 @16x16/G=256 fits (131072), PAIR=4
# or PAIR=2 @32x16 exceed the 16 MB limit (BASELINE.md negative results).
_VMEM_UNITS = 2 * 256 * 256


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    # Measured optimum (BASELINE.md round-3 tile sweep, TPU v5e): 32x16
    # tiles at pair=1 — -36% sorted instances vs 16x16 AND half the
    # per-tile fixed costs (19.1 vs 15.8 Mpix/s bench fwd+bwd). The
    # reference's 16x16 (config.h:16-17) remains available via
    # EX4DGS_TILE=16x16 (then pair=2 is the measured best).
    tile_x: int = 32
    tile_y: int = 16
    pair: int = 1
    # 128 at 32x16 (measured 19.44 vs 19.02 Mpix/s): finer DMA windows waste
    # less per-tile ceil at the halved tile count. At 16x16 the measured
    # optimum was 256.
    g_chunk: int = 128
    win_align: int = 128
    bufs: int = 2
    # Forward-kernel pane count, decoupled from `pair` (which the backward
    # uses): the backward's live set (dbuf + prefix + win0 accumulators) hits
    # the 16 MB scoped-VMEM wall at half the pane count the forward does, so
    # wide tiles can still pane-batch the forward. 0 = same as `pair`.
    pair_fwd: int = 0
    # Binning depth-sort numerics: False = packed 31-bit (tile | truncated
    # depth bits) single-key sort (~2^-10 relative within-tile depth
    # quantization, ties blend in Gaussian-index order — measurably faster,
    # the production default); True = the reference's exact semantics, a
    # 2-key (tile, float-depth) sort (rasterizer_impl.cu:110-114's 64-bit
    # key). See ops/binning.py.
    exact_sort: bool = False
    # Tight corner-tile culling: drop instances whose Gaussian provably
    # contributes below the 1/255 alpha floor EVERYWHERE in their tile (the
    # bounding rect's corner tiles often miss the +-3 sigma ellipse). Exact
    # up to kernel rounding (1e-3 relative alpha margin covers the split-dot
    # power's fp error): a conservative continuous-box bound on max alpha,
    # with a 1 px margin covering the integer-pixel-grid and subpixel-AA
    # conventions. See ops/binning.py.
    tight_cull: bool = False
    # Chunk-aligned instance layout: re-pad the sorted instance array so
    # every tile's range starts on a g_chunk boundary (ops/binning.py::
    # align_binning). Kills the kernels' leading masked-lane waste (~avg
    # win_align/2 per tile) for two capacity-length scans; capacity must then
    # fit the PADDED total (the overflow gate accounts for it).
    aligned_layout: bool = False
    # Numeric-strategy knobs (string-valued; allowed values in _CHOICES,
    # rationale at the consuming site):
    # split3 default (round 5): +4.7% fwd+bwd / +13% render over per-site
    # split. It relaxes backward color/opacity grads to ~5e-5 abs (~1%
    # relative; tests/test_pallas.py documents both contracts) — validated
    # quality-neutral at scale by a full-schedule 3000-iter A/B: 34.14 dB
    # held-out vs the 33.53 dB split anchor (_r5_chain5.log, BASELINE.md).
    # EX4DGS_KERNEL_DOT=split restores the strict 4-pass contract.
    kernel_dot: str = "split3"     # ops/rasterize_pallas.py::_dot_split
    power: str = "direct"          # ops/rasterize_pallas.py::_power_eval
    pack_vjp: str = "segment"      # ops/rasterize_pallas.py::_gather_rows_t
    ssim_blur: str = "shifts"      # ops/losses.py::_depthwise_blur
    scan_dot: str = "split"        # ops/scan_ops.py::_tri_dot
    untile: str = "naive"          # ops/compositing.py::tiles_to_image

    @property
    def n_pix(self) -> int:
        return self.tile_x * self.tile_y

    @property
    def pair_f(self) -> int:
        """Effective forward pane count (pair_fwd == 0 inherits pair)."""
        return self.pair_fwd or self.pair

    def validate(self) -> "KernelConfig":
        def fail(msg: str):
            raise ValueError(f"invalid KernelConfig {self}: {msg}")

        if self.tile_x % 8 or self.tile_y % 8 or self.tile_x < 8 or self.tile_y < 8:
            fail("tile_x and tile_y must be multiples of 8 (sublane tiling)")
        if self.n_pix % 128 or not 128 <= self.n_pix <= 1024:
            fail("tile area (tile_x*tile_y) must be a multiple of 128 in "
                 "[128, 1024] — the pixel axis feeds 128-lane MXU matmuls")
        if self.pair < 1:
            fail("pair must be >= 1")
        if self.g_chunk % 128 or self.g_chunk < 128:
            fail("g_chunk must be a positive multiple of 128 (lane tiling)")
        if self.win_align not in (128, 256) or self.win_align > self.g_chunk:
            fail("win_align must be 128 or 256 and <= g_chunk (Mosaic "
                 "requires DMA lane offsets provably 128-divisible)")
        if self.bufs < 2:
            fail("bufs must be >= 2 (the DMA pipeline needs one in-flight "
                 "buffer besides the one being blended)")
        if self.pair * self.n_pix * self.g_chunk > _VMEM_UNITS:
            fail(
                "backward-kernel live set exceeds the 16 MB scoped-VMEM "
                f"budget (pair*n_pix*g_chunk = {self.pair * self.n_pix * self.g_chunk} "
                f"> {_VMEM_UNITS}); e.g. 512+ px tiles need pair=1 "
                "(BASELINE.md: PAIR=4 and PAIR=2@32x16 both exceeded it)"
            )
        if self.pair_fwd < 0:
            fail("pair_fwd must be >= 0 (0 = same as pair)")
        for knob, allowed in _CHOICES.items():
            if getattr(self, knob) not in allowed:
                fail(f"{knob} must be one of {allowed}")
        # The forward's live set is roughly half the backward's (no gradient
        # write buffers / prefix accumulators), so it fits ~2x the panes.
        if self.pair_f * self.n_pix * self.g_chunk > 2 * _VMEM_UNITS:
            fail(
                "forward-kernel live set exceeds the scoped-VMEM budget "
                f"(pair_fwd*n_pix*g_chunk = {self.pair_f * self.n_pix * self.g_chunk} "
                f"> {2 * _VMEM_UNITS})"
            )
        return self

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.as_dict(), sort_keys=True)

    @staticmethod
    def from_dict(d: dict) -> "KernelConfig":
        def coerce(k, v):
            if k in ("exact_sort", "tight_cull", "aligned_layout"):
                return bool(v)
            if k in _CHOICES:
                return str(v)
            return int(v)

        return KernelConfig(
            **{k: coerce(k, v) for k, v in d.items()}
        ).validate()

    @staticmethod
    def from_env() -> "KernelConfig":
        tx, ty = (int(v) for v in
                  os.environ.get(_ENV["tile"], "32x16").lower().split("x"))
        base = KernelConfig()
        return KernelConfig(
            tile_x=tx, tile_y=ty,
            pair=int(os.environ.get(_ENV["pair"], "1")),
            g_chunk=int(os.environ.get(_ENV["g_chunk"], "128")),
            win_align=int(os.environ.get(_ENV["win_align"], "128")),
            bufs=int(os.environ.get(_ENV["bufs"], "2")),
            exact_sort=os.environ.get(_ENV["exact_sort"], "0") == "1",
            pair_fwd=int(os.environ.get(_ENV["pair_fwd"], "0")),
            tight_cull=os.environ.get(_ENV["tight_cull"], "0") == "1",
            aligned_layout=os.environ.get(
                _ENV["aligned_layout"], "0") == "1",
            **{k: os.environ.get(_ENV[k], getattr(base, k))
               for k in _CHOICES},
        ).validate()


_active: KernelConfig | None = None

# Module-global names derived from the config, per knob. configure() rebinds
# every one of these that exists in any loaded ex4dgs_tpu module, so by-value
# `from .projection import TILE_X` re-imports can't go stale.
def _exports(cfg: KernelConfig) -> dict:
    return {
        "TILE_X": cfg.tile_x, "TILE_Y": cfg.tile_y, "N_PIX": cfg.n_pix,
        "PAIR": cfg.pair, "PAIR_F": cfg.pair_f, "G_CHUNK": cfg.g_chunk,
        "WIN_ALIGN": cfg.win_align, "BUFS": cfg.bufs,
        "TIGHT_CULL": cfg.tight_cull,
        "ALIGNED_LAYOUT": cfg.aligned_layout,
        "KERNEL_DOT": cfg.kernel_dot, "POWER_IMPL": cfg.power,
        "PACK_VJP": cfg.pack_vjp, "SSIM_BLUR": cfg.ssim_blur,
        "SCAN_DOT": cfg.scan_dot, "UNTILE": cfg.untile,
    }


def current() -> KernelConfig:
    """The active config (resolved from env overrides on first use)."""
    global _active
    if _active is None:
        _active = KernelConfig.from_env()
    return _active


def configure(cfg: KernelConfig) -> KernelConfig:
    """Install `cfg` as the active kernel configuration.

    Validates, rebinds the knob globals in every loaded ex4dgs_tpu module,
    and clears jit caches (previously traced graphs baked the old values)."""
    global _active
    cfg.validate()
    if cfg == current():
        return cfg
    _active = cfg
    exports = _exports(cfg)
    touched = False
    for name, mod in list(sys.modules.items()):
        if not name.startswith("ex4dgs_tpu") or mod is None:
            continue
        for attr, val in exports.items():
            if hasattr(mod, attr):
                setattr(mod, attr, val)
                touched = True
    if touched:
        import jax

        jax.clear_caches()
    return cfg
