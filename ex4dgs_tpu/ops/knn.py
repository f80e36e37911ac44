"""Approximate mean 3-nearest-neighbor squared distances, TPU-native.

Replaces the reference's simple-knn CUDA extension (simple_knn.cu:45-221,
spatial.cu:15-26 — Morton sort + 1024-point boxes + box-distance rejection).
Same spirit, vectorized for the VPU: candidates are the +-window neighbors in
three axis-permuted 30-bit Morton orders (the permutations catch cell-boundary
neighbors a single curve misses), deduplicated, then exact distances + top-k.
Static shapes, no atomics, one jit-able graph.

Like the reference, this is approximate — candidate sets are a subset of all
points, so the estimate only ever *over*-states the true mean distance. It is
used once per `create_from_pcd` to initialize log-scales from local density
(c_gaussian_model.py:395-396), where that bias is harmless.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_PERMS = ((0, 1, 2), (1, 2, 0), (2, 0, 1))


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits to every 3rd position (Morton interleave prep)."""
    u = lambda x: jnp.uint32(x)
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def _quantize(points: jnp.ndarray) -> jnp.ndarray:
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 0.0)
    return jnp.clip((points - lo) * scale * 1023.0, 0.0, 1023.0).astype(jnp.uint32)


def morton_codes(points: jnp.ndarray, perm=(0, 1, 2)) -> jnp.ndarray:
    """30-bit Morton codes from [P, 3] points normalized over their bbox."""
    q = _quantize(points)
    return (
        (_expand_bits(q[:, perm[0]]) << 2)
        | (_expand_bits(q[:, perm[1]]) << 1)
        | _expand_bits(q[:, perm[2]])
    ).astype(jnp.uint32)


def mean_knn_dist2(
    points: jnp.ndarray, k: int = 3, window: int = 64, row_chunk: int = 8192
) -> jnp.ndarray:
    """Mean of squared distances to the (approximate) k nearest neighbors.

    Distance evaluation is chunked over point rows (lax.map) so the
    [rows, 6*window, 3] candidate gather never materializes for the whole
    cloud at once — at N3V init sizes the un-chunked intermediate would
    exceed HBM."""
    P = points.shape[0]
    q = _quantize(points)
    offs = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    ).astype(jnp.int32)

    cand = []
    for perm in _PERMS:
        codes = (
            (_expand_bits(q[:, perm[0]]) << 2)
            | (_expand_bits(q[:, perm[1]]) << 1)
            | _expand_bits(q[:, perm[2]])
        )
        order = jnp.argsort(codes).astype(jnp.int32)
        rank = jnp.zeros((P,), jnp.int32).at[order].set(jnp.arange(P, dtype=jnp.int32))
        nbr_rank = rank[:, None] + offs[None, :]
        ok = (nbr_rank >= 0) & (nbr_rank < P)
        nbr = jnp.take(order, jnp.clip(nbr_rank, 0, P - 1))
        cand.append(jnp.where(ok, nbr, P))  # P = sentinel "no candidate"

    cand = jnp.concatenate(cand, axis=1)  # [P, 3*2W]

    pad = (-P) % row_chunk
    cand_p = jnp.pad(cand, ((0, pad), (0, 0)), constant_values=P)
    pts_p = jnp.pad(points, ((0, pad), (0, 0)))

    def _rows(args):
        c, p = args  # [R, C] int32, [R, 3]
        c = jnp.sort(c, axis=1)
        dup = jnp.concatenate([jnp.zeros((c.shape[0], 1), bool), c[:, 1:] == c[:, :-1]], 1)
        valid = (c < P) & ~dup
        nbr_pts = jnp.take(points, jnp.clip(c, 0, P - 1), axis=0)  # [R, C, 3]
        d2 = jnp.sum((nbr_pts - p[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(valid, d2, jnp.inf)
        knn = -jax.lax.top_k(-d2, k)[0]  # k smallest
        finite = jnp.isfinite(knn)
        return jnp.where(finite, knn, 0.0).sum(-1) / jnp.maximum(finite.sum(-1), 1)

    n_chunks = (P + pad) // row_chunk
    out = jax.lax.map(
        _rows,
        (
            cand_p.reshape(n_chunks, row_chunk, -1),
            pts_p.reshape(n_chunks, row_chunk, 3),
        ),
    )
    return out.reshape(-1)[:P]
