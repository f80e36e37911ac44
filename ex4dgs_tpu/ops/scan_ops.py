"""Fast 1-D prefix ops for large arrays on TPU.

XLA lowers a 1-D cumsum to a log-depth scan ALONG THE LANE DIMENSION — every
step is a cross-lane rotate of the whole array, which is the slowest data
movement on the VPU. For the multi-million-element instance buffers used by
binning (ops/binning.py) this dominates the whole stage (the 22 ms inside
jnp.repeat measured in round 1 is mostly this cumsum).

`blocked_cumsum` restates the scan in a [rows, cols] layout where consecutive
elements run down the SUBLANE axis: per-column scans are cheap shifted adds,
and only the tiny [cols] carry array needs a lane-direction scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..kernel_config import current as _kernel_config

# The package pins jax_default_matmul_precision=highest (f32 semantics on the
# MXU — see ex4dgs_tpu/__init__.py), which XLA emulates as SIX bf16 passes per
# matmul. The block-cumsum operator below is a 0/1 lower-triangular matrix —
# EXACT in bf16 — so splitting only the data operand (x = hi + lo with
# hi = f32(bf16(x))) reaches ~2^-16 relative operand accuracy in TWO
# DEFAULT-precision passes. KernelConfig(scan_dot="highest")
# (EX4DGS_SCAN_DOT override) restores the 6-pass form.
SCAN_DOT = _kernel_config().scan_dot


def _tri_dot(lower: jnp.ndarray, x3: jnp.ndarray) -> jnp.ndarray:
    """einsum('ij,bjk->bik', lower, x3) where `lower` is 0/1 (bf16-exact)."""
    if SCAN_DOT == "highest" or x3.dtype != jnp.float32:
        return jnp.einsum("ij,bjk->bik", lower, x3,
                          preferred_element_type=x3.dtype,
                          precision=jax.lax.Precision.HIGHEST)
    xh = x3.astype(jnp.bfloat16).astype(jnp.float32)
    xl = x3 - xh
    d = lambda u: jnp.einsum("ij,bjk->bik", lower, u,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)
    return d(xh) + d(xl)


def blocked_cumsum_2d(x: jnp.ndarray, cols: int = 1024) -> jnp.ndarray:
    """Inclusive cumsum along axis 0 of a [n, k] array, one independent scan
    per column, with the scan direction laid on the SUBLANE axis.

    Used by the pack-gather VJP (ops/rasterize_pallas.py) where n is the
    multi-million instance capacity and k = 16 packed feature rows: XLA's
    native axis-0 cumsum of [n, 16] is a log-depth rotate chain over n.
    """
    n, k = x.shape
    if n % cols != 0 or n < cols * 8:
        return jnp.cumsum(x, axis=0)
    rows = n // cols
    # element i -> (i % rows, i // rows): column-major blocks down sublanes
    m = x.reshape(cols, rows, k).transpose(1, 0, 2).reshape(rows, cols * k)
    col_cum = jnp.cumsum(m, axis=0)
    carry = col_cum[-1].reshape(cols, k)
    carry = jnp.concatenate(
        [jnp.zeros((1, k), x.dtype), jnp.cumsum(carry, axis=0)[:-1]], axis=0
    )  # [cols, k] exclusive prefix of block sums (sublane scan, tiny)
    out = col_cum.reshape(rows, cols, k) + carry[None]
    return out.transpose(1, 0, 2).reshape(n, k)


def matmul_block_cumsum_parts(x: jnp.ndarray, block: int = 256):
    """Two-level inclusive cumsum pieces along axis 0 of [n, k]: per-block
    lower-triangular MXU matmul prefixes in the NATURAL layout (element i at
    [i // block, i % block, :] of a free reshape — no physical transposes)
    plus the small cross-block carry.

    Returns (local, carry_ex): `local[i]` = inclusive prefix of x within
    element i's own block (magnitude bounded by one block's content), and
    `carry_ex[b]` = exclusive prefix of block totals, so the full inclusive
    prefix is `local[i] + carry_ex[i // block]`. Callers that difference
    prefixes over short windows (the pack-gather segment VJP) should
    difference the two parts separately — same-block windows then cancel the
    carry EXACTLY instead of subtracting two large accumulated floats.

    Returns None if n is not a block multiple (callers fall back)."""
    n, k = x.shape
    if n % block != 0 or n < block * 2:
        return None
    b = n // block
    x3 = x.reshape(b, block, k)
    i = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    lower = (j <= i).astype(x.dtype)
    cs = _tri_dot(lower, x3)
    sums = cs[:, -1, :]  # [b, k] per-block totals
    carry_ex = jnp.cumsum(sums, axis=0) - sums  # exclusive prefix, tiny scan
    return cs.reshape(n, k), carry_ex


def matmul_block_cumsum(x: jnp.ndarray, block: int = 256) -> jnp.ndarray:
    """Inclusive cumsum along axis 0 of [n, k] via per-block lower-triangular
    MXU matmuls + a small cross-block carry (see matmul_block_cumsum_parts).
    The O(n·block) matmul FLOPs are noise on the MXU."""
    parts = matmul_block_cumsum_parts(x, block)
    if parts is None:
        return jnp.cumsum(x, axis=0)
    local, carry_ex = parts
    n, k = x.shape
    b = n // block
    return (local.reshape(b, block, k) + carry_ex[:, None, :]).reshape(n, k)


def blocked_cumsum(x: jnp.ndarray, cols: int = 1024) -> jnp.ndarray:
    """Inclusive cumsum of a 1-D array, O(N) sublane-direction work.

    Layout: element i lives at [i % rows, i // rows] of a [rows, cols]
    matrix (column-major blocks), so a per-column axis-0 cumsum scans
    consecutive elements; the inter-column carry is a [cols] exclusive
    prefix of column sums.
    """
    n = x.shape[0]
    if n % cols != 0 or n < cols * 8:
        return jnp.cumsum(x)
    rows = n // cols
    m = x.reshape(cols, rows).T  # [rows, cols]; column j = x[j*rows:(j+1)*rows]
    col_cum = jnp.cumsum(m, axis=0)  # sublane-direction scan: cheap
    carry = jnp.concatenate(
        [jnp.zeros((1,), x.dtype), jnp.cumsum(col_cum[-1])[:-1]]
    )  # [cols] exclusive prefix of column sums (tiny lane-direction scan)
    out = col_cum + carry[None, :]
    return out.T.reshape(n)


def blocked_cummax(x: jnp.ndarray, cols: int = 1024) -> jnp.ndarray:
    """Inclusive running maximum of a 1-D array, same blocked layout as
    blocked_cumsum (per-column sublane scans + a tiny lane-direction carry).

    Used by binning to recover each instance slot's run-start position
    without gathering an extra per-Gaussian column."""
    n = x.shape[0]
    if n % cols != 0 or n < cols * 8:
        return jax.lax.cummax(x, axis=0)
    rows = n // cols
    m = x.reshape(cols, rows).T
    col_cum = jax.lax.cummax(m, axis=0)
    carry = jnp.concatenate(
        [jnp.full((1,), _min_value(x.dtype), x.dtype),
         jax.lax.cummax(col_cum[-1], axis=0)[:-1]]
    )
    out = jnp.maximum(col_cum, carry[None, :])
    return out.T.reshape(n)


def _min_value(dtype):
    if jnp.issubdtype(dtype, jnp.integer):
        return jnp.iinfo(dtype).min
    return -jnp.inf
