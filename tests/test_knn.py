"""Approximate 3-NN mean distance vs. brute force."""
import numpy as np

from ex4dgs_tpu.ops.knn import mean_knn_dist2


def _brute(points, k=3):
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return np.sort(d2, axis=1)[:, :k].mean(axis=1)


def test_knn_close_to_brute():
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(2000, 3)).astype(np.float32)
    approx = np.asarray(mean_knn_dist2(pts))
    exact = _brute(pts)
    rel = np.abs(approx - exact) / np.maximum(exact, 1e-12)
    # Morton-window search is approximate (like the reference's boxed search):
    # the bulk must be exact, the rest can only OVER-estimate (candidate sets
    # are subsets of all points).
    assert np.median(rel) < 1e-5
    assert (rel < 0.01).mean() > 0.6
    assert (approx >= exact - 1e-6).all()
    assert approx.mean() < 2 * exact.mean()


def test_knn_grid_exact():
    # Regular grid: neighbors are axis-aligned at distance h; mean 3-NN d2 = h^2.
    xs = np.arange(8, dtype=np.float32)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    approx = np.asarray(mean_knn_dist2(g))
    np.testing.assert_allclose(np.median(approx), 1.0, atol=1e-5)
