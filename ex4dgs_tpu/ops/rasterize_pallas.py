"""Pallas TPU kernels for tile compositing — the hot path.

TPU-native replacement for the reference's per-tile CUDA blend loops
(cuda_rasterizer/forward.cu:274-462, backward.cu:426-682). Key design points:

* After the (tile, depth) sort, each tile's instance list is CONTIGUOUS in
  the sorted arrays — so per tile the kernel issues sequential HBM->VMEM DMAs
  (no gathers, the thing XLA's fallback path is slowest at).
* Per chunk of G=128 instances the blend is two shapes the hardware loves:
  [256px, 128g] elementwise alpha math on the VPU and [256,128]x[128,8]
  feature matmuls on the MXU; per-instance gradient reductions are
  pixel-moment matmuls ([128,256]x[256,6]) on the MXU too.
* Early termination (forward.cu:382-387) is a while_loop condition on the
  max per-pixel transmittance of the tile — whole-tile granularity instead of
  the reference's per-pixel `done` latch; identical images (post-latch
  weights are exactly zero either way).
* The backward (custom_vjp) walks front-to-back using the suffix identity
  S_i = total_colordot - prefix_i — the same recurrence the reference
  evaluates by re-walking back-to-front — and writes per-instance gradients;
  each instance belongs to exactly one tile, so there are no atomics, and
  the instance->Gaussian reduction is a deterministic XLA segment-sum outside.

Numerics mirror ops/compositing.py (the portable oracle): alpha floor 1/255,
0.99 clamp straight-through, T_EPS latch 1e-4, aux features blended with
stop-gradient weights, acc fully stop-gradiented.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import compositing as comp
from .binning import Binning
from .projection import TILE_X, TILE_Y, Projected
from ..kernel_config import current as _kernel_config

# Instances per DMA window; larger = shorter serial chain, smaller = less
# per-tile ceil waste. Configured via kernel_config (EX4DGS_GCHUNK override).
G_CHUNK = _kernel_config().g_chunk
N_PIX = TILE_X * TILE_Y  # 512 at the default 32x16
DATA_ROWS = 16  # packed per-instance rows (one sublane tile)
# rows: 0 xy_x, 1 xy_y, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity,
#       6 r, 7 g, 8 b, 9 depth, 10 fx, 11 fy, 12 fz, 13 one,
#       14 gaussian-id bits (dominant-idx tracking, no second DMA stream),
#       15 pad
N_ACC = 8  # accum channels: r g b depth fx fy fz acc


# In-kernel matmul precision. The global jax_default_matmul_precision is
# HIGHEST (f32 semantics — see ex4dgs_tpu/__init__.py for why bf16 defaults
# broke training), but Mosaic lowers HIGHEST as a 6-pass f32 emulation and
# does not support HIGH (bf16x3) at all; measured on v5e the kernels lost
# ~23 ms/step to the 6-pass dots. These helpers hand-roll operand splitting:
# x = hi + lo with hi = f32(bf16(x)), giving ~2^-16 relative operand error in
# 2 passes (one exact operand) or 3 passes (both split) of DEFAULT-precision
# MXU matmuls. KernelConfig(kernel_dot="highest") (EX4DGS_KERNEL_DOT override)
# restores the 6-pass dots for A/B.
KERNEL_DOT = _kernel_config().kernel_dot
# power evaluation: "direct" = the oracle's quadratic form on the VPU (exact
# f32, no MXU pass); "mxu" = pixel-moment polynomial matmul (split dots).
# KernelConfig(power=...), EX4DGS_POWER override.
POWER_IMPL = _kernel_config().power
_PREC = (jax.lax.Precision.DEFAULT, jax.lax.Precision.DEFAULT)


def _split_f32(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dot_xsplit(a, b, dims):
    """dot_general(a, b) with only `a` split: use when `b` is exactly
    representable in bf16 (e.g. the 0/1 cumsum operator). 2 MXU passes."""
    if KERNEL_DOT == "highest":
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    ah, al = _split_f32(a)
    d = lambda u: jax.lax.dot_general(u, b, dims,
                                      preferred_element_type=jnp.float32,
                                      precision=_PREC)
    return d(ah) + d(al)


def _dot_split(a, b, dims, three=False):
    """dot_general(a, b) with both operands split: hi*hi + hi*lo + lo*hi
    (+ lo*lo), 4 MXU passes vs HIGHEST's 6 for the same f32-level accuracy.

    three=True drops the lo*lo pass (its products are ~2^-16 relative) at the
    call sites where that stays inside the kernel test tolerances — the
    backward pixel-moment reduction and the backward feature dot. The FORWARD
    feature accumulation keeps 4 passes: measured, 3 passes there push
    backward color gradients (via the saved accum feeding the suffix terms)
    to 5.2e-5 vs the 2e-5 test atol; the kernel suite is green with the two
    backward sites at 3 (split3-everywhere benches +8.8% but fails that
    tolerance, so the remaining pass is the price of the gradient contract. EX4DGS_KERNEL_DOT:
    split (default, per-site), split3 (force 3 everywhere), split4 (force 4),
    highest (6-pass lowering for A/B)."""
    if KERNEL_DOT == "highest":
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    ah, al = _split_f32(a)
    bh, bl = _split_f32(b)
    d = lambda u, v: jax.lax.dot_general(u, v, dims,
                                         preferred_element_type=jnp.float32,
                                         precision=_PREC)
    if KERNEL_DOT == "split3" or (three and KERNEL_DOT == "split"):
        return d(ah, bh) + (d(ah, bl) + d(al, bh))
    return (d(ah, bh) + d(al, bl)) + (d(ah, bl) + d(al, bh))


# Pack-gather VJP strategy. "segment": re-sort instances by source Gaussian
# (recovering the expansion order whose contiguous segment boundaries binning
# already knows via cum/counts) and reduce each Gaussian's cotangent as a
# difference of inclusive prefixes, with the prefix computed by per-256-block
# lower-triangular MXU matmuls in the natural layout (scan_ops.
# matmul_block_cumsum — no physical transposes). "scatter": deterministic XLA
# scatter-add of the [capacity, 16] cotangent rows at ~capacity random
# indices. Both are deterministic; see _tpu_packvjp.py for the measurement.
# KernelConfig(pack_vjp=...), EX4DGS_PACK_VJP override.
PACK_VJP = _kernel_config().pack_vjp


@jax.custom_vjp
def _gather_rows_t(cols, order, cum, counts):
    """data[16, capacity] = cols[order].T with row 14 = the instance's
    Gaussian id as raw bits — the pack gather, with a deterministic
    instance->Gaussian segment-reduction VJP (see PACK_VJP).

    The id fill rides the gather output as a pre-transpose column select so
    XLA fuses it into the gather/transpose pipeline (a post-transpose row
    set materialized a second [16, capacity] copy). Row 14's cotangent is
    exactly zero (the backward kernel zero-fills rows 14-15), so the VJP
    needs no special-casing. "clip": aligned-layout dead slots carry an
    out-of-range sentinel id (masked in the kernels; zero cotangents)."""
    g16 = jnp.take(cols, order, axis=0, mode="clip")
    gid_f = jax.lax.bitcast_convert_type(order.astype(jnp.int32), jnp.float32)
    g16 = g16.at[:, 14].set(gid_f)
    return g16.T


def _gather_rows_t_fwd(cols, order, cum, counts):
    return _gather_rows_t(cols, order, cum, counts), (
        order, cum, counts, cols.shape[0])


def _gather_rows_t_bwd(res, ct):
    order, cum, counts, P = res
    capacity = order.shape[0]
    if PACK_VJP == "scatter":
        d_cols = jnp.zeros((P, ct.shape[0]), ct.dtype).at[order].add(ct.T)
        return d_cols, None, None, None
    from .scan_ops import matmul_block_cumsum, matmul_block_cumsum_parts

    slot = jax.lax.iota(jnp.int32, capacity)
    # Stable 1-key sort by Gaussian id recovers the expansion order: tail
    # slots (sentinel, clipped to the last id) carry zero cotangents from the
    # kernel's padding zero-fill, and the [lo, hi) windows below exclude them
    # regardless.
    _g_s, slot_s = jax.lax.sort((order, slot), num_keys=1, is_stable=True)
    rows = jnp.take(ct.T, slot_s, axis=0)  # [capacity, 16], grouped by Gaussian
    hi = jnp.clip(cum - 1, 0, capacity - 1)
    lo = jnp.clip(cum - counts - 1, 0, capacity - 1)
    parts = matmul_block_cumsum_parts(rows)
    if parts is None:
        pref = matmul_block_cumsum(rows)
        hi_v = jnp.where((cum > 0)[:, None], jnp.take(pref, hi, axis=0), 0.0)
        lo_v = jnp.where(
            (cum - counts > 0)[:, None], jnp.take(pref, lo, axis=0), 0.0
        )
        d_cols = jnp.where((counts > 0)[:, None], hi_v - lo_v, 0.0)
        return d_cols, None, None, None
    # Two-level prefix difference: keep the in-block local prefix and the
    # cross-block carry separate — differencing a single global f32 prefix
    # loses digits for Gaussians late in a multi-million-row buffer
    # (mixed-sign cotangents, large accumulated values). Windows inside ONE
    # block cancel the carry exactly; windows spanning exactly two blocks
    # (the common cross case — window length <= the Gaussian's tile count)
    # use the lower block's EXACT total instead of a carry difference. Only
    # windows spanning >2 blocks fall back to differencing accumulated
    # carries (huge splats; their segment sums are large, so the relative
    # error stays small).
    local, carry_ex = parts  # local[n,16], carry_ex[b,16]
    nblocks = carry_ex.shape[0]
    block = capacity // nblocks
    sums = local.reshape(nblocks, block, 16)[:, -1, :]  # exact block totals
    hi_ok = (cum > 0)[:, None]
    lo_ok = (cum - counts > 0)[:, None]
    hi_l = jnp.where(hi_ok, jnp.take(local, hi, axis=0), 0.0)
    lo_l = jnp.where(lo_ok, jnp.take(local, lo, axis=0), 0.0)
    hi_b = hi // block
    lo_b = lo // block
    hi_c = jnp.where(hi_ok, jnp.take(carry_ex, hi_b, axis=0), 0.0)
    lo_c = jnp.where(lo_ok, jnp.take(carry_ex, lo_b, axis=0), 0.0)
    span = jnp.where(hi_ok[:, 0] & lo_ok[:, 0], hi_b - lo_b,
                     jnp.where(hi_ok[:, 0], hi_b + 1, 0))
    lo_sum = jnp.take(sums, lo_b, axis=0)
    carry_d = jnp.where(
        (span == 0)[:, None], 0.0,
        jnp.where((span == 1)[:, None] & lo_ok, lo_sum, hi_c - lo_c))
    d_cols = jnp.where((counts > 0)[:, None], (hi_l - lo_l) + carry_d, 0.0)
    return d_cols, None, None, None


_gather_rows_t.defvjp(_gather_rows_t_fwd, _gather_rows_t_bwd)


def pack_sorted(proj: Projected, colors, flow, binning: Binning):
    """Gather per-instance data in sorted order into a [16, capacity] matrix
    (feature-major so a depth chunk is one contiguous [16, G] block).

    Built as ONE [capacity, 16] row-gather from a pre-stacked [P, 16] matrix
    followed by a transpose — 16 separate column gathers cost ~10x more on
    TPU (each lowers to a scalarish 4-byte-element gather)."""
    g = binning.order
    P = proj.xy.shape[0]
    opac = proj.opacity * proj.valid
    ones = jnp.ones((P,), jnp.float32)
    zeros = jnp.zeros((P,), jnp.float32)
    cols = jnp.stack(
        [
            proj.xy[:, 0], proj.xy[:, 1],
            proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
            opac,
            colors[:, 0], colors[:, 1], colors[:, 2],
            proj.depth,
            flow[:, 0], flow[:, 1], flow[:, 2],
            ones, zeros, zeros,
        ],
        axis=1,
    )  # [P, 16] — P is small (splat count, not instances)
    # Row 14 carries the per-instance Gaussian id as raw bits: the forward
    # kernel's dominant-idx tracking then needs NO second DMA stream (a
    # separate [1, cap] gid buffer doubled the per-window DMA/semaphore count
    # and cost ~6.5 ms/frame at N3V scale — round-5 renderprobe). The fill
    # happens inside _gather_rows_t, pre-transpose, so it fuses.
    if binning.cum is not None:
        data = _gather_rows_t(cols, g, binning.cum, binning.counts)
    else:  # minimal Binning (tests) — autodiff scatter VJP
        data = jnp.take(cols, g, axis=0, mode="clip").T
        data = data.at[14, :].set(
            jax.lax.bitcast_convert_type(g.astype(jnp.int32), jnp.float32))
    return data, g.astype(jnp.int32)


# Tiles composited per grid step (batched pane axis). More panes per step
# amortize loop/DMA fixed costs and hide latency at the cost of VMEM and
# wasted work when pane chunk counts diverge; configured via kernel_config
# (EX4DGS_PAIR override; the pair x tile-area VMEM constraint is validated
# there).
PAIR = _kernel_config().pair
# Forward pane count (may exceed PAIR: the forward's live set is ~half the
# backward's, so wide tiles can still pane-batch the forward — KernelConfig
# pair_fwd, 0 = inherit).
PAIR_F = _kernel_config().pair_f

# FORWARD window-origin alignment granularity. Each tile's read-DMA chain
# starts at the WIN_ALIGN-aligned slot below its range start, wasting avg
# WIN_ALIGN/2 leading masked lanes per tile. Mosaic requires lane-dimension
# DMA offsets provably divisible by the 128-lane tiling, so 128 is the
# finest legal granularity (fully exact starts fail to compile: "Failed to
# prove that a tile index in dimension 1 is divisible by the tiling"). With
# WIN_ALIGN < G_CHUNK a tile's last window can extend up to
# G_CHUNK - WIN_ALIGN slots past `capacity`, so the forward wrapper pads the
# instance arrays by one window. The BACKWARD ignores this knob: its write
# windows must all live on ONE shared G_CHUNK grid (finer per-tile alignment
# lets a tile's trailing window overlap its successor's windows by a
# sub-chunk phase and race the plain writes — see _backward_kernel).
WIN_ALIGN = _kernel_config().win_align

# Read-DMA pipeline depth: chunk j+BUFS-1 is prefetched while chunk j blends,
# i.e. each fetch gets BUFS-1 loop bodies of lead time to cover its latency.
# Grad-write buffers stay double-buffered (their drain is latency-tolerant).
BUFS = _kernel_config().bufs


def _win(off):
    """DMA lane offset with its true alignment hint."""
    return pl.multiple_of(off, WIN_ALIGN)


def _tile_origin(tile_idx, grid_x):
    """Tile origin (ox, oy) scalars for a GLOBAL tile index."""
    ty = tile_idx // grid_x
    tx = tile_idx - ty * grid_x
    return (tx * TILE_X).astype(jnp.float32), (ty * TILE_Y).astype(jnp.float32)


def _local_pixels():
    """LOCAL pixel offsets px, py: [N_PIX, 1].

    All kernel math runs in tile-local coordinates (px < 16): the polynomial
    power evaluation would otherwise cancel catastrophically in fp32 (global
    px^2 reaches ~2e6 at N3V resolution while the exponent itself is O(1))."""
    p = jax.lax.broadcasted_iota(jnp.int32, (N_PIX, 1), 0)
    px = (p % TILE_X).astype(jnp.float32)
    py = (p // TILE_X).astype(jnp.float32)
    return px, py


def _pixel_moments(px, py):
    """[..., N_PIX, 8] pixel-moment matrix: 1, px, py, px^2, px*py, py^2, 0, 0.

    The Gaussian exponent is quadratic in pixel coordinates, so evaluating it
    for all (pixel, instance) pairs is a single [N_PIX, 8] x [8, G] matmul on
    the MXU instead of ~10 VPU passes over [N_PIX, G]."""
    one = jnp.ones_like(px)
    zero = jnp.zeros_like(px)
    return jnp.concatenate(
        [one, px, py, px * px, px * py, py * py, zero, zero], axis=-1
    )


G_SUB = 128  # lane-cumsum block = one MXU tile


def _cumsum_matrix():
    """[G_SUB, G_SUB] inclusive lane-cumsum operator: out = x @ U,
    U[i,j] = (i <= j).

    Turns the transmittance chain (a cumulative product) into MXU matmuls in
    log space — the VPU log-step scan it replaces is ~21 elementwise passes.
    Applied blockwise over G_CHUNK lanes (2x128) with a scalar carry per
    block: half the MXU FLOPs of a single [256, 256] operator."""
    i = jax.lax.broadcasted_iota(jnp.int32, (G_SUB, G_SUB), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (G_SUB, G_SUB), 1)
    return (i <= j).astype(jnp.float32)


def _lane_cumsum(x, cumU):
    """Inclusive cumsum over the trailing G_CHUNK lane axis of
    [PAIR, N, G_CHUNK] via blockwise [PAIR*N, 128] x [128, 128] matmuls +
    per-block carries (the shared operator makes the pair axis free rows of
    ONE flattened MXU matmul)."""
    parts = []
    carry = None
    for b in range(G_CHUNK // G_SUB):
        blk = x[..., b * G_SUB:(b + 1) * G_SUB]
        cs = _dot_xsplit(  # cumU is 0/1: exact in bf16, split blk only
            blk, cumU, (((blk.ndim - 1,), (0,)), ((), ())),
        )
        if carry is not None:
            cs = cs + carry
        carry = cs[..., -1:]
        parts.append(cs)
    return jnp.concatenate(parts, axis=-1)


def _chunk_alpha(chunk, moms, lo, hi, ox, oy, pxp=None, pyp=None):
    """Alpha pieces for a [PAIR, 16, G] chunk pair against each tile's pixels.

    Per pair k, lanes in [lo[k], hi[k)) hold tile k's instances (DMA windows
    are 128-aligned, so a window may straddle the tile's range ends); others
    are masked out — including entire exhausted tiles (hi <= 0), whose stale
    buffer contents mask to zero contributions.

    power is evaluated DIRECTLY on the VPU when pixel coordinates are given
    (POWER_IMPL "direct": -0.5 ca dx^2 - 0.5 cc dy^2 - cb dx dy, the oracle's
    exact formula, compositing.py:72-74 — no MXU, no cancellation) or as the
    legacy pixel-moment MXU matmul against `moms` (EX4DGS_POWER=mxu).
    Returns (alpha, exp_term, mask), each [PAIR, N_PIX, G]."""
    xs = chunk[:, 0:1, :] - ox  # [PAIR, 1, G], tile-local
    ys = chunk[:, 1:2, :] - oy
    ca = chunk[:, 2:3, :]
    cb = chunk[:, 3:4, :]
    cc = chunk[:, 4:5, :]
    op = chunk[:, 5:6, :]
    if POWER_IMPL == "direct" and pxp is not None:
        dx = pxp - xs  # [PAIR, N_PIX, G]
        dy = pyp - ys
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    else:
        zero = jnp.zeros_like(xs)
        # power as a polynomial in (px, py) fed to the MXU:
        coef = jnp.concatenate([
            -0.5 * (ca * xs * xs + cc * ys * ys) - cb * xs * ys,  # 1
            ca * xs + cb * ys,  # px
            cc * ys + cb * xs,  # py
            -0.5 * ca,  # px^2
            -cb,  # px*py
            -0.5 * cc,  # py^2
            zero, zero,
        ], axis=1)  # [PAIR, 8, G]
        power = _dot_split(
            moms, coef, (((2,), (1,)), ((0,), (0,))),
        )  # [PAIR, N_PIX, G]
    expt = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = op * expt
    alpha_c = jnp.minimum(alpha_raw, comp.ALPHA_MAX)
    # Lane-window mask computed at [PAIR, 1, G]: comparing a full-shape iota
    # against [PAIR, 1, 1] scalars would need a sublane+lane broadcast, which
    # Mosaic can't lower; two single-axis broadcasts (lanes here, sublanes at
    # the & below) express the same thing.
    lane = jax.lax.broadcasted_iota(jnp.int32, (chunk.shape[0], 1, G_CHUNK), 2)
    lane_m = (lane >= lo) & (lane < hi)
    m = lane_m & (power <= 0.0) & (alpha_c >= comp.ALPHA_MIN)
    alpha = jnp.where(m, alpha_c, 0.0)
    # alpha_raw is NOT returned: the backward reconstructs op * expt at its
    # single use (straight-through 0.99 clamp), keeping one fewer
    # [PAIR, N_PIX, G] tensor live (scoped-VMEM headroom for PAIR=4).
    return alpha, jnp.where(m, expt, 0.0), m


def _transmittance(alpha, cum_in, cumU):
    """(cum inclusive, cum exclusive) for a chunk pair, via log-space matmuls.

    cum_excl = cum / (1 - alpha); alpha <= 0.99 keeps the division safe, and
    masked lanes (alpha == 0) divide by exactly 1."""
    cl = _lane_cumsum(jnp.log1p(-alpha), cumU)
    cum = cum_in * jnp.exp(cl)
    cum_excl = cum / (1.0 - alpha)
    return cum, cum_excl


def _pair_scalars(vals):
    """Stack PAIR traced scalars into a [PAIR, 1, 1] f32 broadcastable."""
    return jnp.concatenate(
        [jnp.full((1, 1, 1), v, jnp.float32) for v in vals], axis=0
    )


def _pair_scalars_i32(vals):
    """Stack PAIR traced scalars into a [PAIR, 1, 1] i32 broadcastable."""
    return jnp.concatenate(
        [jnp.full((1, 1, 1), v, jnp.int32) for v in vals], axis=0
    )


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _forward_kernel(starts, stops, tids, data_hbm, off_in, accum_out,
                    tfinal_out, bestidx_out, buf, cum_ref, tfin_ref,
                    best_ref, bid_ref, acc_ref, sem, *, grid_x,
                    track_idx, subpixel, pair):
    """Composite a PAIR of adjacent tiles per grid step, batched on a leading
    pair axis: every VPU op covers both tiles' [N_PIX, G] panes (2x the work
    per instruction — hides op latency on the serial transmittance chain) and
    the per-tile fixed costs (state init, scalar reads, output writes, loop
    bookkeeping) are amortized. The shared lane-cumsum operator makes the
    pair axis free MXU rows. A tile that exhausts its chunks or latches early
    keeps streaming masked zero contributions until its partner finishes."""
    p = pl.program_id(0)
    t0 = p * pair
    start_k = [starts[t0 + k] for k in range(pair)]
    stop_k = [stops[t0 + k] for k in range(pair)]
    base_k = [(s // WIN_ALIGN) * WIN_ALIGN for s in start_k]
    n_k = [pl.cdiv(stop_k[k] - base_k[k], G_CHUNK) for k in range(pair)]
    # tids[t] = GLOBAL tile index: under tile sharding (parallel/step_dp.py)
    # each device composites a slab of tiles, so the grid index is slab-local.
    oxy = [_tile_origin(tids[t0 + k], grid_x) for k in range(pair)]
    ox = _pair_scalars([o[0] for o in oxy])  # [pair, 1, 1]
    oy = _pair_scalars([o[1] for o in oxy])
    px, py = _local_pixels()  # [N_PIX, 1]
    pxp = jnp.broadcast_to(px[None], (pair, N_PIX, 1))
    pyp = jnp.broadcast_to(py[None], (pair, N_PIX, 1))
    if subpixel:
        # per-pixel anti-aliasing offsets (forward.cu:311-317)
        pxp = pxp + off_in[:, :, 0:1]
        pyp = pyp + off_in[:, :, 1:2]
    moms = _pixel_moments(pxp, pyp)  # [PAIR, N_PIX, 8]
    cumU = _cumsum_matrix()

    def start_dma(k, j, slot):
        off = _win(base_k[k] + j * G_CHUNK)
        pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(off, G_CHUNK)], buf.at[slot, k], sem.at[slot, k]
        ).start()

    def wait_dma(k, j, slot):
        off = _win(base_k[k] + j * G_CHUNK)
        pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(off, G_CHUNK)], buf.at[slot, k], sem.at[slot, k]
        ).wait()

    if pair == 1:
        # Single pane: every pane the loop reads was DMA-waited (the alive
        # condition keeps j < n_k), so no stale pane exists and the buffer
        # zero-fill — a 16 KB serial write the first DMA would have to order
        # behind — is skipped. Tiles after the first had their leading
        # windows issued by the PREVIOUS grid step's epilogue (cross-tile
        # prefetch: the first window's HBM latency hides under the
        # predecessor's output writes and this step's state init).
        @pl.when(p == 0)
        def _():
            for d in range(BUFS - 1):
                @pl.when(d < n_k[0])
                def _(d=d):
                    start_dma(0, d, d)
    else:
        # A tile that runs out of chunks before its partner reads whatever
        # its buffer pane holds (mask kills the weights, but 0 * NaN from
        # truly uninitialized VMEM would still poison the feature matmul) —
        # start from zeros so stale panes are always finite. The zero-fill
        # must complete before the DMAs land, so issuance follows it and
        # cross-tile prefetch is disabled for pair > 1.
        buf[:] = jnp.zeros(buf.shape, jnp.float32)
        for k in range(pair):
            for d in range(BUFS - 1):
                @pl.when(d < n_k[k])
                def _(k=k, d=d):
                    start_dma(k, d, d)

    acc_ref[:] = jnp.zeros((pair, N_PIX, N_ACC), jnp.float32)
    cum_ref[:] = jnp.ones((pair, N_PIX, 1), jnp.float32)
    tfin_ref[:] = jnp.full((pair, N_PIX, 1), comp.T_SENTINEL, jnp.float32)
    if track_idx:
        # Deferred dominant-idx: keep a full [N_PIX, G_CHUNK] running best
        # weight/id per lane slot (elementwise selects per window) and
        # lane-reduce ONCE per tile in the epilogue. The old per-window
        # arg-max did two cross-lane reductions per window — ~6.4 ms/frame
        # at N3V scale (round-5 renderprobe). bid_ref needs no init: its
        # slots are only read where best == cmax > 0, which implies the slot
        # was written.
        best_ref[:] = jnp.zeros(best_ref.shape, jnp.float32)

    def body(carry):
        j, _ = carry
        slot = jax.lax.rem(j, BUFS)
        # pipelined prefetch: fetch chunk j+BUFS-1 while blending chunk j
        for k in range(pair):
            @pl.when(j + BUFS - 1 < n_k[k])
            def _(k=k):
                start_dma(k, j + BUFS - 1, jax.lax.rem(j + BUFS - 1, BUFS))
            @pl.when(j < n_k[k])
            def _(k=k):
                wait_dma(k, j, slot)

        off = _pair_scalars_i32(
            [base_k[k] + j * G_CHUNK for k in range(pair)]
        )  # [pair, 1, 1]
        lo = _pair_scalars_i32(start_k) - off
        # exhausted tiles (j >= n_k): hi <= 0 masks the whole pane
        hi = jnp.minimum(
            _pair_scalars_i32(stop_k) - off, jnp.int32(G_CHUNK)
        )
        chunk = buf[slot]  # [PAIR, DATA_ROWS, G_CHUNK]
        alpha, _, _ = _chunk_alpha(chunk, moms, lo, hi, ox, oy, pxp, pyp)

        cum_in = cum_ref[:]  # [PAIR, N_PIX, 1]
        cum, cum_excl = _transmittance(alpha, cum_in, cumU)
        applied = (alpha > 0.0) & (cum >= comp.T_EPS)
        w = jnp.where(applied, alpha * cum_excl, 0.0)

        feats = chunk[:, 6:6 + N_ACC, :]  # [PAIR, 8, G]
        acc_ref[:] += _dot_split(
            w, feats, (((2,), (2,)), ((0,), (0,))),
        )

        chunk_min = jnp.min(
            jnp.where(applied, cum, comp.T_SENTINEL), axis=2, keepdims=True
        )
        tfin_ref[:] = jnp.minimum(tfin_ref[:], chunk_min)

        if track_idx:
            # per-instance Gaussian ids ride data row 14 as raw bits;
            # strictly-greater keeps the earliest window's weight on ties
            ids = jnp.broadcast_to(
                jax.lax.bitcast_convert_type(chunk[:, 14:15, :], jnp.int32),
                (pair, N_PIX, G_CHUNK))
            better = w > best_ref[:]
            best_ref[:] = jnp.where(better, w, best_ref[:])
            bid_ref[:] = jnp.where(better, ids, bid_ref[:])

        new_cum = cum[..., -1:]
        cum_ref[:] = new_cum
        # per-tile alive signal: tile k continues while j < n_k and its max
        # transmittance is above the latch
        alive = False
        for k in range(pair):
            alive_k = (j + 1 < n_k[k]) & (jnp.max(new_cum[k]) >= comp.T_EPS)
            alive = alive_k if alive is False else alive | alive_k
        return j + 1, alive

    def cond(carry):
        j, alive = carry
        return alive

    any0 = False
    for k in range(pair):
        a = n_k[k] > 0
        any0 = a if any0 is False else any0 | a
    j_exit, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), any0))

    # early exit leaves prefetches in flight — drain them per tile
    for k in range(pair):
        for d in range(BUFS - 1):
            @pl.when(j_exit + d < n_k[k])
            def _(k=k, d=d):
                wait_dma(k, j_exit + d, jax.lax.rem(j_exit + d, BUFS))

    if pair == 1:
        # Cross-tile prefetch: issue the NEXT tile's leading windows now —
        # the slots are free (all this tile's reads drained above), and the
        # next grid step only waits. Hides the first window's HBM latency
        # under this tile's output writes and the next tile's state init.
        @pl.when(p + 1 < pl.num_programs(0))
        def _():
            s_n = starts[t0 + 1]
            b_n = (s_n // WIN_ALIGN) * WIN_ALIGN
            n_n = pl.cdiv(stops[t0 + 1] - b_n, G_CHUNK)
            for d in range(BUFS - 1):
                @pl.when(d < n_n)
                def _(d=d, b_n=b_n):
                    off = _win(b_n + d * G_CHUNK)
                    pltpu.make_async_copy(
                        data_hbm.at[:, pl.ds(off, G_CHUNK)], buf.at[d, 0],
                        sem.at[d, 0],
                    ).start()

    accum_out[:] = acc_ref[:]
    tfinal_out[:] = jnp.where(
        tfin_ref[:] >= comp.T_SENTINEL, cum_ref[:], tfin_ref[:]
    )
    if track_idx:
        # one lane-reduction per tile: max weight, then min id among ties
        best = best_ref[:]
        cmax = jnp.max(best, axis=2, keepdims=True)
        cid = jnp.min(
            jnp.where((best == cmax) & (cmax > 0), bid_ref[:],
                      jnp.int32(2**30)),
            axis=2, keepdims=True,
        )
        bestidx_out[:] = jnp.where(cmax > 0, cid, jnp.int32(-1))
    else:
        bestidx_out[:] = jnp.full((pair, N_PIX, 1), -1, jnp.int32)


def _pad_pair(arr, num_tiles, fill=0, pair=None):
    """Pad a leading tile axis up to a pane-count multiple (empty-tile
    sentinel). pair defaults to the backward's PAIR."""
    pair = PAIR if pair is None else pair
    t_pad = pl.cdiv(num_tiles, pair) * pair
    if t_pad == num_tiles:
        return arr
    pad = [(0, t_pad - num_tiles)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad, constant_values=fill)


def _forward_pallas(data, starts, stops, tids, subpixel_offsets=None, *,
                    num_tiles, grid_x, interpret=False, track_idx=True):
    pf = PAIR_F
    subpixel = subpixel_offsets is not None
    if not subpixel:  # dummy single block, never read
        subpixel_offsets = jnp.zeros((pf, N_PIX, 2), jnp.float32)
    else:
        subpixel_offsets = _pad_pair(subpixel_offsets, num_tiles, pair=pf)
    # pad to a pane-count multiple with empty tiles (start == stop == 0)
    starts = _pad_pair(starts, num_tiles, pair=pf)
    stops = _pad_pair(stops, num_tiles, pair=pf)
    tids = _pad_pair(tids, num_tiles, pair=pf)
    if WIN_ALIGN < G_CHUNK:
        # a tile's last window can reach past `capacity` by up to
        # G_CHUNK - WIN_ALIGN slots: one window of tail headroom
        data = jnp.pad(data, ((0, 0), (0, G_CHUNK)))
    t_pad = starts.shape[0]
    kernel = functools.partial(_forward_kernel, grid_x=grid_x,
                               track_idx=track_idx, subpixel=subpixel,
                               pair=pf)
    off_map = (lambda p, *_: (p, 0, 0)) if subpixel else (lambda p, *_: (0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // pf,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((pf, N_PIX, 2), off_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((pf, N_PIX, N_ACC), lambda p, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pf, N_PIX, 1), lambda p, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pf, N_PIX, 1), lambda p, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((BUFS, pf, DATA_ROWS, G_CHUNK), jnp.float32),  # buf
            pltpu.VMEM((pf, N_PIX, 1), jnp.float32),  # cum
            pltpu.VMEM((pf, N_PIX, 1), jnp.float32),  # tfin
            # deferred-argmax panes (full lane width) when tracking ids
            pltpu.VMEM((pf, N_PIX, G_CHUNK if track_idx else 1),
                       jnp.float32),  # best w
            pltpu.VMEM((pf, N_PIX, G_CHUNK if track_idx else 1),
                       jnp.int32),  # best id
            pltpu.VMEM((pf, N_PIX, N_ACC), jnp.float32),  # accum
            pltpu.SemaphoreType.DMA((BUFS, pf)),
        ],
    )
    accum, tfinal, bestidx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, N_PIX, N_ACC), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, N_PIX, 1), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, N_PIX, 1), jnp.int32),
        ],
        interpret=interpret,
    )(starts, stops, tids, data, subpixel_offsets)
    return accum[:num_tiles], tfinal[:num_tiles], bestidx[:num_tiles]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _backward_kernel(starts, stops, tids, data_hbm, gacc_in, acdot_in, gend_in,
                     tfin_in, off_in, _zeros_in, dgrad_out, *rest, grid_x,
                     subpixel, aligned=False):
    """Recompute the forward walk for a PAIR of adjacent tiles (batched pair
    axis, see _forward_kernel); emit per-instance gradients.

    dgrad rows: 0 dxy_x, 1 dxy_y, 2 dconic_a, 3 dconic_b, 4 dconic_c,
                5 dopac, 6..13 dfeat (r g b depth fx fy fz one), 14-15 zero.

    For an applied instance i (alpha>0 and cum_i >= eps — which, because cum
    is monotone, is exactly "at or before the per-pixel latch"):
      dL/dalpha_i = cum_excl_i * (c_i . gc)
                    - (S_i + t_final * g_end) / (1 - alpha_i)
    with S_i = sum_{j>i} w_j (c_j . gc) = (A_c . gc) - prefix_i and
    g_end = bg . gc + (direct t_final cotangent); this is the closed form of
    the reference's back-to-front recurrence (backward.cu:552-660).

    Gradient-window discipline: write windows live on the G_CHUNK-aligned
    grid, so two tiles' windows either coincide EXACTLY or are disjoint —
    finer alignment would let a tile's trailing window overlap its successor's
    j>=1 windows by a sub-chunk phase, racing plain writes. The one legal
    collision (a tile's window 0 == its predecessor's last window, possibly
    in the previous program) is resolved OUTSIDE the kernel: every pane's
    window-0 gradients accumulate in VMEM (bw0_ref) and leave through the
    separate `win0_out` output, which _backward_pallas adds back densely
    (per-block prefix differences — an XLA windowed scatter-add would
    serialize its ~num_tiles updates). In-kernel there are NO
    read-modify-writes, seeds or merges — per tile the epilogue only drains
    its last two plain writes and zero-fills never-reached windows.

    aligned=True (KernelConfig.aligned_layout, binning.align_binning): every
    tile's range starts on its own G_CHUNK block, so NO window is ever
    shared — window 0 is written like any other window and the win0 output,
    the bw0 accumulator and the caller-side dense merge all disappear."""
    if aligned:
        buf, cum_ref, pref_ref, dbuf, sem, wsem = rest
        win0_out = bw0_ref = None
    else:
        win0_out, buf, cum_ref, pref_ref, dbuf, bw0_ref, sem, wsem = rest
    p = pl.program_id(0)
    t0 = p * PAIR
    start_k = [starts[t0 + k] for k in range(PAIR)]
    stop_k = [stops[t0 + k] for k in range(PAIR)]
    # gradient WRITE windows must stay on the G_CHUNK grid (see docstring);
    # read windows share the bases for simplicity
    base_k = [(s // G_CHUNK) * G_CHUNK for s in start_k]
    n_k = [pl.cdiv(stop_k[k] - base_k[k], G_CHUNK) for k in range(PAIR)]
    oxy = [_tile_origin(tids[t0 + k], grid_x) for k in range(PAIR)]
    ox = _pair_scalars([o[0] for o in oxy])
    oy = _pair_scalars([o[1] for o in oxy])
    px, py = _local_pixels()
    pxp = jnp.broadcast_to(px[None], (PAIR, N_PIX, 1))
    pyp = jnp.broadcast_to(py[None], (PAIR, N_PIX, 1))
    if subpixel:
        pxp = pxp + off_in[:, :, 0:1]
        pyp = pyp + off_in[:, :, 1:2]

    def start_read(k, j, slot):
        off = pl.multiple_of(base_k[k] + j * G_CHUNK, G_CHUNK)
        pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(off, G_CHUNK)], buf.at[slot, k], sem.at[slot, k]
        ).start()

    if PAIR == 1:
        # no stale pane at a single pane (the loop only reads waited
        # windows); skip the zero-fill the first DMA would order behind.
        # Tiles after the first were issued by the previous grid step's
        # epilogue (cross-tile prefetch).
        @pl.when(p == 0)
        def _():
            for d in range(BUFS - 1):
                @pl.when(d < n_k[0])
                def _(d=d):
                    start_read(0, d, d)
    else:
        buf[:] = jnp.zeros(buf.shape, jnp.float32)  # stale panes must be finite
        for k in range(PAIR):
            for d in range(BUFS - 1):
                @pl.when(d < n_k[k])
                def _(k=k, d=d):
                    start_read(k, d, d)

    cum_ref[:] = jnp.ones((PAIR, N_PIX, 1), jnp.float32)
    pref_ref[:] = jnp.zeros((PAIR, N_PIX, 1), jnp.float32)
    if not aligned:
        bw0_ref[:] = jnp.zeros((PAIR, DATA_ROWS, G_CHUNK), jnp.float32)
    gacc = gacc_in[:]  # [PAIR, N_PIX, N_ACC]
    gc_r = gacc[:, :, 0:1]
    gc_g = gacc[:, :, 1:2]
    gc_b = gacc[:, :, 2:3]
    acdot = acdot_in[:]  # [PAIR, N_PIX, 1]
    tf_term = gend_in[:] * tfin_in[:]  # [PAIR, N_PIX, 1]
    moms = _pixel_moments(pxp, pyp)  # [PAIR, N_PIX, 8]
    cumU = _cumsum_matrix()

    def wait_read(k, j, slot):
        off = pl.multiple_of(base_k[k] + j * G_CHUNK, G_CHUNK)
        pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(off, G_CHUNK)], buf.at[slot, k], sem.at[slot, k]
        ).wait()

    def start_write(k, j, slot):
        off = pl.multiple_of(base_k[k] + j * G_CHUNK, G_CHUNK)
        pltpu.make_async_copy(
            dbuf.at[slot, k], dgrad_out.at[:, pl.ds(off, G_CHUNK)],
            wsem.at[slot, k],
        ).start()

    def wait_write(k, j, slot):
        off = pl.multiple_of(base_k[k] + j * G_CHUNK, G_CHUNK)
        pltpu.make_async_copy(
            dbuf.at[slot, k], dgrad_out.at[:, pl.ds(off, G_CHUNK)],
            wsem.at[slot, k],
        ).wait()

    def body(carry):
        j, _ = carry
        rslot = jax.lax.rem(j, BUFS)
        slot = jax.lax.rem(j, 2)  # grad-write buffer slot
        for k in range(PAIR):
            @pl.when(j + BUFS - 1 < n_k[k])
            def _(k=k):
                start_read(k, j + BUFS - 1, jax.lax.rem(j + BUFS - 1, BUFS))
            @pl.when(j < n_k[k])
            def _(k=k):
                wait_read(k, j, rslot)

        # drain the writes that last used this slot (chunk j-2) per pane;
        # without the aligned layout no pane has an in-flight write for
        # chunk 0 (held in bw0_ref)
        first_w = 0 if aligned else 1
        for k in range(PAIR):
            @pl.when((j >= first_w + 2) & (j - 2 < n_k[k]))
            def _(k=k):
                wait_write(k, j - 2, slot)
        for k in range(PAIR):
            @pl.when((j >= first_w) & (j < n_k[k]))
            def _(k=k):
                dbuf[slot, k] = jnp.zeros((DATA_ROWS, G_CHUNK), jnp.float32)

        off = _pair_scalars_i32([base_k[k] + j * G_CHUNK for k in range(PAIR)])
        lo = _pair_scalars_i32(start_k) - off
        hi = _pair_scalars_i32(stop_k) - off
        chunk = buf[rslot]  # [PAIR, DATA_ROWS, G_CHUNK]
        alpha, expt, _ = _chunk_alpha(chunk, moms, lo, hi, ox, oy, pxp, pyp)

        one_m = 1.0 - alpha
        cum_in = cum_ref[:]
        cum, cum_excl = _transmittance(alpha, cum_in, cumU)
        applied = (alpha > 0.0) & (cum >= comp.T_EPS)
        w = jnp.where(applied, alpha * cum_excl, 0.0)

        cdot = (chunk[:, 6:7, :] * gc_r + chunk[:, 7:8, :] * gc_g
                + chunk[:, 8:9, :] * gc_b)
        wc = w * cdot
        incl = _lane_cumsum(wc, cumU) + pref_ref[:]
        s_i = acdot - incl

        dl_dalpha = jnp.where(
            applied,
            cum_excl * cdot - (s_i + tf_term) / jnp.maximum(one_m, 0.01),
            0.0,
        )

        # features: [PAIR, G, N_ACC] = W^T @ g_accum
        dfeat = _dot_split(
            w, gacc, (((1,), (1,)), ((0,), (0,))), three=True,
        )

        e_term = expt * dl_dalpha  # [PAIR, N_PIX, G]
        dl_dpower = chunk[:, 5:6, :] * e_term  # alpha_raw*dl_dalpha = op*expt*...
        dl_dopac = jnp.sum(e_term, axis=1)[:, None, :]  # [PAIR,1,G]

        # pixel-moment reduction: [PAIR, G, 8] (last 2 cols zero padding)
        pm = _dot_split(
            dl_dpower, moms, (((1,), (1,)), ((0,), (0,))), three=True,
        )
        pmt = jnp.swapaxes(pm, 1, 2)  # [PAIR, 8, G]
        s0 = pmt[:, 0:1, :]
        sx = pmt[:, 1:2, :]
        sy = pmt[:, 2:3, :]
        sxx = pmt[:, 3:4, :]
        sxy = pmt[:, 4:5, :]
        syy = pmt[:, 5:6, :]
        xg = chunk[:, 0:1, :] - ox  # tile-local, consistent with moms
        yg = chunk[:, 1:2, :] - oy
        ca = chunk[:, 2:3, :]
        cb = chunk[:, 3:4, :]
        cc = chunk[:, 4:5, :]
        gchunk = jnp.concatenate([
            # dpower/dxg = -(ca*dx + cb*dy), dx = xg - px:
            -(ca * (xg * s0 - sx) + cb * (yg * s0 - sy)),
            -(cc * (yg * s0 - sy) + cb * (xg * s0 - sx)),
            # dpower/dca = -0.5 dx^2 -> sum dx^2 dlp = xg^2 s0 - 2 xg sx + sxx
            -0.5 * (xg * xg * s0 - 2.0 * xg * sx + sxx),
            -(xg * yg * s0 - yg * sx - xg * sy + sxy),
            -0.5 * (yg * yg * s0 - 2.0 * yg * sy + syy),
            dl_dopac,
            jnp.swapaxes(dfeat, 1, 2),  # [PAIR, 8, G]
            jnp.zeros((PAIR, 2, G_CHUNK), jnp.float32),
        ], axis=1)  # [PAIR, DATA_ROWS, G_CHUNK]

        if aligned:
            for k in range(PAIR):
                @pl.when(j < n_k[k])
                def _(k=k):
                    dbuf[slot, k] += gchunk[k]
                    start_write(k, j, slot)
        else:
            for k in range(PAIR):
                @pl.when(j < n_k[k])
                def _(k=k):
                    @pl.when(j == 0)
                    def _():
                        bw0_ref[k] += gchunk[k]
                    @pl.when(j > 0)
                    def _():
                        dbuf[slot, k] += gchunk[k]
                        start_write(k, j, slot)

        pref_ref[:] = incl[..., -1:]
        new_cum = cum[..., -1:]
        cum_ref[:] = new_cum
        alive = False
        for k in range(PAIR):
            alive_k = (j + 1 < n_k[k]) & (jnp.max(new_cum[k]) >= comp.T_EPS)
            alive = alive_k if alive is False else alive | alive_k
        return j + 1, alive

    def cond(carry):
        j, alive = carry
        return alive

    any0 = False
    for k in range(PAIR):
        a = n_k[k] > 0
        any0 = a if any0 is False else any0 | a
    j_exit, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), any0))

    # drain in-flight prefetches if the latch fired early
    for k in range(PAIR):
        for d in range(BUFS - 1):
            @pl.when(j_exit + d < n_k[k])
            def _(k=k, d=d):
                wait_read(k, j_exit + d, jax.lax.rem(j_exit + d, BUFS))

    if PAIR == 1:
        # Cross-tile prefetch (see _forward_kernel): issue the next tile's
        # leading read windows while this tile drains its writes and
        # zero-fills — the next grid step only waits.
        @pl.when(p + 1 < pl.num_programs(0))
        def _():
            s_n = starts[t0 + 1]
            b_n = (s_n // G_CHUNK) * G_CHUNK
            n_n = pl.cdiv(stops[t0 + 1] - b_n, G_CHUNK)
            for d in range(BUFS - 1):
                @pl.when(d < n_n)
                def _(d=d, b_n=b_n):
                    off = pl.multiple_of(b_n + d * G_CHUNK, G_CHUNK)
                    pltpu.make_async_copy(
                        data_hbm.at[:, pl.ds(off, G_CHUNK)], buf.at[d, 0],
                        sem.at[d, 0],
                    ).start()

    # Drain outstanding grad writes per pane. The in-loop drain already waited
    # every chunk <= j_exit - 3, so only chunks >= j_exit - 2 can still be in
    # flight — re-waiting an already-consumed DMA semaphore deadlocks the
    # device, so the epilogue must skip chunks the loop drained (a pane that
    # exhausted before its partner has none outstanding at all). Pane B's
    # chunk-0 "write" lives in bw0_ref, not a DMA.
    # (aligned layout: window 0 is a real DMA, so the "chunk >= 1" floor in
    # these guards drops by one)
    first_w = 0 if aligned else 1
    for k in range(PAIR):
        last_b = jnp.minimum(j_exit, n_k[k])
        @pl.when((last_b >= first_w + 2) & (last_b - 2 >= j_exit - 2))
        def _(k=k, last_b=last_b):
            wait_write(k, last_b - 2, jax.lax.rem(last_b - 2, 2))
        @pl.when((last_b >= first_w + 1) & (last_b - 1 >= j_exit - 2))
        def _(k=k, last_b=last_b):
            wait_write(k, last_b - 1, jax.lax.rem(last_b - 1, 2))

    # zero-fill never-computed windows (post-latch gradients are exactly
    # zero, but the output slice must be initialized). Fills start at window
    # max(j_exit, 1): window 0 always leaves through win0_out.
    for k in range(PAIR):
        @pl.when(j_exit < n_k[k])
        def _(k=k):
            dbuf[0, k] = jnp.zeros((DATA_ROWS, G_CHUNK), jnp.float32)
            lo_j = jnp.maximum(j_exit, 1)

            def zbody(j, _):
                off = pl.multiple_of(base_k[k] + j * G_CHUNK, G_CHUNK)
                zdma = pltpu.make_async_copy(
                    dbuf.at[0, k], dgrad_out.at[:, pl.ds(off, G_CHUNK)],
                    wsem.at[0, k],
                )
                zdma.start()
                zdma.wait()
                return 0

            jax.lax.fori_loop(lo_j, n_k[k], zbody, 0)

    # window-0 gradients leave through the pipelined win0 output; the caller
    # adds them into dgrad with one windowed scatter-add. Aligned layout:
    # window 0 was a plain write like every other — nothing to emit.
    if not aligned:
        win0_out[:] = bw0_ref[:]


def _backward_pallas(data, starts, stops, tids, gacc, acdot, gend, tfin,
                     subpixel_offsets=None, *, num_tiles, grid_x,
                     interpret=False, aligned=False):
    capacity = data.shape[1]
    subpixel = subpixel_offsets is not None
    if not subpixel:
        subpixel_offsets = jnp.zeros((PAIR, N_PIX, 2), jnp.float32)
    else:
        subpixel_offsets = _pad_pair(subpixel_offsets, num_tiles)
    starts = _pad_pair(starts, num_tiles)
    stops = _pad_pair(stops, num_tiles)
    tids = _pad_pair(tids, num_tiles)
    gacc = _pad_pair(gacc, num_tiles)
    acdot = _pad_pair(acdot, num_tiles)
    gend = _pad_pair(gend, num_tiles)
    tfin = _pad_pair(tfin, num_tiles)
    t_pad = starts.shape[0]
    kernel = functools.partial(_backward_kernel, grid_x=grid_x,
                               subpixel=subpixel, aligned=aligned)
    off_map = (lambda p, *_: (p, 0, 0)) if subpixel else (lambda p, *_: (0, 0, 0))
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    out_shape = [jax.ShapeDtypeStruct((DATA_ROWS, capacity), jnp.float32)]
    scratch = [
        pltpu.VMEM((BUFS, PAIR, DATA_ROWS, G_CHUNK), jnp.float32),  # buf
        pltpu.VMEM((PAIR, N_PIX, 1), jnp.float32),  # cum
        pltpu.VMEM((PAIR, N_PIX, 1), jnp.float32),  # prefix
        pltpu.VMEM((2, PAIR, DATA_ROWS, G_CHUNK), jnp.float32),  # dbuf x2
        pltpu.SemaphoreType.DMA((BUFS, PAIR)),
        pltpu.SemaphoreType.DMA((2, PAIR)),
    ]
    if not aligned:
        # per-tile window-0 grads leave via a second output + dense merge
        out_specs.append(
            pl.BlockSpec((PAIR, DATA_ROWS, G_CHUNK), lambda p, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((t_pad, DATA_ROWS, G_CHUNK), jnp.float32))
        scratch.insert(4, pltpu.VMEM((PAIR, DATA_ROWS, G_CHUNK),
                                     jnp.float32))  # win-0 accum
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // PAIR,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # data
            pl.BlockSpec((PAIR, N_PIX, N_ACC), lambda p, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PAIR, N_PIX, 1), lambda p, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PAIR, N_PIX, 1), lambda p, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PAIR, N_PIX, 1), lambda p, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PAIR, N_PIX, 2), off_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # dgrad zero-init (aliased)
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    zeros = jnp.zeros((DATA_ROWS, capacity), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        # alias indices count ALL operands incl. scalar prefetch: starts=0,
        # stops=1, tids=2, data=3, cotangents 4..7, off=8, zeros=9 -> out 0
        input_output_aliases={9: 0},
        interpret=interpret,
    )(starts, stops, tids, data, gacc, acdot, gend, tfin, subpixel_offsets,
      zeros)
    if aligned:
        # every tile's windows were exclusively owned plain writes — no
        # window-0 merge to do
        return outs[0]
    dgrad, win0 = outs
    # Add each tile's window-0 gradients at its G_CHUNK-aligned base (the
    # kernel cannot RMW these in place: a tile's window 0 may be its
    # predecessor's still-streaming last window). An XLA windowed scatter-add
    # serializes its ~num_tiles updates (~15 ms at N3V scale); instead the
    # per-block sums are built densely: tile starts are sorted, so the tiles
    # mapping to one G_CHUNK block form a contiguous run — an inclusive
    # prefix over tiles (MXU block-cumsum) turns every block's sum into a
    # difference of two gathered rows.
    from .scan_ops import matmul_block_cumsum

    n_blocks = capacity // G_CHUNK
    t_real = num_tiles
    # padded tiles (t >= num_tiles) have start=0 and zero win0 — exclude to
    # keep `seg` sorted
    w = win0[:t_real].reshape(t_real, DATA_ROWS * G_CHUNK)
    t_round = -(-t_real // 256) * 256  # MXU block-cumsum wants a 256-multiple
    if t_round != t_real:
        w = jnp.pad(w, ((0, t_round - t_real), (0, 0)))
    pref = matmul_block_cumsum(w)  # [T, 16*G] inclusive over tiles
    seg = (starts[:t_real] // G_CHUNK).astype(jnp.int32)  # nondecreasing
    blocks = jnp.arange(n_blocks, dtype=jnp.int32)
    lo = jnp.searchsorted(seg, blocks, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(seg, blocks, side="right").astype(jnp.int32)
    hi_v = jnp.where(
        (hi > 0)[:, None], jnp.take(pref, jnp.clip(hi - 1, 0, t_real - 1),
                                    axis=0), 0.0)
    lo_v = jnp.where(
        (lo > 0)[:, None], jnp.take(pref, jnp.clip(lo - 1, 0, t_real - 1),
                                    axis=0), 0.0)
    addend = jnp.where((hi > lo)[:, None], hi_v - lo_v, 0.0)
    addend = addend.reshape(n_blocks, DATA_ROWS, G_CHUNK)
    addend = jnp.moveaxis(addend, 1, 0).reshape(DATA_ROWS, capacity)
    return dgrad + addend


# ---------------------------------------------------------------------------
# custom_vjp wrapper + public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def composite_tiles(data, bg, gid, starts, stops, tids, subpixel_offsets,
                    num_tiles, grid_x, interpret, track_idx=True,
                    aligned=False):
    """Composite `num_tiles` tiles; tids[t] is each tile's GLOBAL grid index
    (= arange for a full frame; a slab offset under tile sharding).
    subpixel_offsets: optional [T, 256, 2] per-pixel AA offsets
    (forward.cu:311-317) — treated as data, not a differentiable parameter.
    `gid` is kept in the signature for callers/documentation, but the kernel
    reads per-instance ids from data row 14 (pack_sorted) — no second DMA
    stream. aligned=True asserts the binning came through align_binning
    (every tile start on the G_CHUNK grid): the backward then writes window
    0 directly instead of the win0-output + dense-merge path."""
    accum, tfinal, bestidx = _forward_pallas(
        data, starts, stops, tids, subpixel_offsets,
        num_tiles=num_tiles, grid_x=grid_x,
        interpret=interpret, track_idx=track_idx,
    )
    color = accum[..., 0:3] + tfinal * bg  # tfinal [T, P, 1] broadcasts
    return color, accum, tfinal, bestidx


def _composite_fwd(data, bg, gid, starts, stops, tids, subpixel_offsets,
                   num_tiles, grid_x, interpret, track_idx=True,
                   aligned=False):
    out = composite_tiles(data, bg, gid, starts, stops, tids,
                          subpixel_offsets, num_tiles, grid_x, interpret,
                          track_idx, aligned)
    _color, accum, tfinal, _bestidx = out
    return out, (data, bg, accum, tfinal, starts, stops, tids,
                 subpixel_offsets)


def _composite_bwd(num_tiles, grid_x, interpret, track_idx, aligned, res,
                   cts):
    data, bg, accum, tfinal, starts, stops, tids, subpixel_offsets = res
    g_color, g_accum, g_tfinal, _ = cts
    # color = accum[...,:3] + tfinal*bg folds into the accum/tfinal cotangents
    gacc = g_accum.at[..., 0:3].add(g_color)
    gend = jnp.einsum("tpc,c->tp", g_color, bg)[..., None] + g_tfinal  # [T,P,1]
    gc = gacc[..., 0:3]
    acdot = jnp.einsum("tpc,tpc->tp", accum[..., 0:3], gc)[..., None]  # [T,P,1]
    dgrad = _backward_pallas(
        data, starts, stops, tids, gacc, acdot, gend, tfinal,
        subpixel_offsets,
        num_tiles=num_tiles, grid_x=grid_x, interpret=interpret,
        aligned=aligned,
    )
    # The kernel writes only this slab's [start, stop) instance ranges; zero
    # everything outside [starts[0], stops[-1]) — below lies another slab's
    # region (tile sharding), above lies the sentinel-padding tail whose rows
    # alias real Gaussians through the clipped sort order.
    lo = starts[0]
    hi = stops[num_tiles - 1]
    lane = jnp.arange(data.shape[1], dtype=jnp.int32)[None, :]
    dgrad = jnp.where((lane >= lo) & (lane < hi), dgrad, 0.0)
    g_bg = jnp.einsum("tpc,tpo->c", g_color, tfinal)
    g_off = (None if subpixel_offsets is None
             else jnp.zeros_like(subpixel_offsets))  # AA offsets: data
    return dgrad, g_bg, None, None, None, None, g_off


composite_tiles.defvjp(_composite_fwd, _composite_bwd)


def rasterize_tiled_pallas(
    proj: Projected,
    colors: jnp.ndarray,
    flow: jnp.ndarray,
    binning: Binning,
    *,
    width: int,
    height: int,
    bg: jnp.ndarray,
    max_depth: float,
    tile: int | None = None,
    interpret: bool = False,
    track_idx: bool = True,
    subpixel_offset: jnp.ndarray | None = None,
    aligned: bool = False,
    **_unused,
) -> comp.RenderOutputs:
    """Drop-in replacement for ops.rasterize_tiled.rasterize_tiled on TPU.

    track_idx=False skips the dominant-contributor bookkeeping (the training
    loop never consumes it — train.py ignores `dominent_idxs`); `idx` comes
    back as -1s. subpixel_offset: optional [H, W, 2] AA offsets."""
    assert tile is None or (tile == TILE_X and tile == TILE_Y)
    grid_x = (width + TILE_X - 1) // TILE_X
    grid_y = (height + TILE_Y - 1) // TILE_Y
    num_tiles = grid_x * grid_y
    capacity = binning.order.shape[0]
    assert capacity % G_CHUNK == 0, f"binning capacity must be a multiple of {G_CHUNK}"

    offsets_t = None
    if subpixel_offset is not None:  # [H, W, 2] -> per-tile [T, N_PIX, 2]
        pad_y = grid_y * TILE_Y - height
        pad_x = grid_x * TILE_X - width
        off = jnp.pad(subpixel_offset, ((0, pad_y), (0, pad_x), (0, 0)))
        offsets_t = (
            off.reshape(grid_y, TILE_Y, grid_x, TILE_X, 2)
            .transpose(0, 2, 1, 3, 4)
            .reshape(num_tiles, N_PIX, 2)
        )

    data, gid = pack_sorted(proj, colors, flow, binning)
    gid2 = gid[None, :]
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    color, accum, tfinal, bestidx = composite_tiles(
        data, bg, gid2, binning.tile_start, binning.tile_stop, tids,
        offsets_t, num_tiles, grid_x, interpret, track_idx, aligned,
    )

    acc = jax.lax.stop_gradient(accum[..., 7])
    has = acc > 0.0
    denom = jnp.where(has, acc, 1.0)
    depth = jnp.where(has, accum[..., 3] / denom, max_depth)
    flow_img = jnp.where(has[..., None], accum[..., 4:7] / denom[..., None], 0.0)

    def timg(arr):  # [T, N_PIX, ...] -> [H, W, ...] (lane-aligned assembly)
        return comp.tiles_to_image(arr, grid_y, grid_x, TILE_Y, TILE_X,
                                   height, width)

    return comp.RenderOutputs(
        color=timg(color),
        depth=timg(depth),
        flow=timg(flow_img),
        acc=timg(acc),
        final_t=timg(tfinal[..., 0]),
        idx=timg(bestidx[..., 0]),
    )
