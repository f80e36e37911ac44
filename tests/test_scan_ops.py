"""Blocked prefix ops (ops/scan_ops.py) vs jnp references."""
import jax
import jax.numpy as jnp
import numpy as np

from ex4dgs_tpu.ops.scan_ops import (
    blocked_cummax,
    blocked_cumsum,
    blocked_cumsum_2d,
    matmul_block_cumsum,
)


def test_blocked_cumsum_matches():
    rng = np.random.default_rng(0)
    for n in (8192, 1024 * 16 + 0):
        x = rng.integers(0, 7, n).astype(np.int32)
        np.testing.assert_array_equal(
            np.asarray(blocked_cumsum(jnp.asarray(x))), np.cumsum(x)
        )


def test_blocked_cummax_matches():
    rng = np.random.default_rng(1)
    x = rng.integers(-50, 50, 8192).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(blocked_cummax(jnp.asarray(x))),
        np.maximum.accumulate(x),
    )


def test_matmul_block_cumsum_matches():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4096, 16)).astype(np.float32)
    got = np.asarray(matmul_block_cumsum(jnp.asarray(x)))
    want = np.cumsum(x, axis=0)
    np.testing.assert_allclose(got, want, atol=2e-4)
    # non-multiple sizes fall back to the exact path
    y = rng.normal(size=(130, 16)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(matmul_block_cumsum(jnp.asarray(y))),
        np.cumsum(y, axis=0), atol=2e-5,
    )


def test_blocked_cumsum_2d_matches():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(8192, 16)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(blocked_cumsum_2d(jnp.asarray(x))),
        np.cumsum(x, axis=0), atol=2e-3, rtol=1e-5,
    )
