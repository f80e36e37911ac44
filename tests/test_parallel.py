"""Sharded training step on the virtual 8-device CPU mesh.

Checks the core SPMD contract: a (data=1, gauss=1) sharded step reproduces
the single-device step, and multi-axis meshes produce allclose parameters.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ex4dgs_tpu.models import ModelConfig, OptimizationConfig, create_from_pcd
from ex4dgs_tpu.models.optimizer import init_state
from ex4dgs_tpu.ops.math3d import projection_matrix, world_to_view
from ex4dgs_tpu.parallel.mesh import make_mesh
from ex4dgs_tpu.parallel.step_dp import make_sharded_train_step
from ex4dgs_tpu.rendering import RenderCamera
from ex4dgs_tpu.train.step import StepStatics, train_step

W, H = 48, 32


def _scene(n=100):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.8
    cols = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    cfg = ModelConfig(time_interval=5, start_duration=5, duration=10, near=0.2, far=50.0)
    model = create_from_pcd(pts, cols, cfg, duration=5, static_capacity=128)
    view = world_to_view(np.eye(3), np.array([0, 0, 4.0], np.float32))
    fov = math.radians(60)
    P = projection_matrix(0.2, 50.0, fov, fov)
    cam = RenderCamera.from_fov(view, P @ view, np.linalg.inv(view)[:3, 3], W, H, fov, fov)
    return cfg, model, cam


def _batch_cam(cam, d):
    return jax.tree.map(lambda a: jnp.stack([a] * d), cam)


@pytest.mark.parametrize("data,gauss", [(1, 1), (2, 1), (1, 2), (2, 4)])
def test_sharded_step_matches_single(data, gauss):
    if data * gauss > len(jax.devices()):
        pytest.skip("not enough virtual devices")
    cfg, model, cam = _scene()
    opt = OptimizationConfig()
    statics = StepStatics(cfg=cfg, opt=opt, spatial_lr_scale=1.0, capacity=4096,
                          chunk=64, max_per_tile=256)
    state = init_state(model.params)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    t = jnp.asarray(1.0)
    bg = jnp.zeros(3)
    it = jnp.asarray(600, jnp.int32)

    ref = train_step(model, state, cam, gt, t, bg, it, statics)

    mesh = make_mesh(data * gauss, data=data, gauss=gauss)
    step = make_sharded_train_step(statics, mesh)
    cams = _batch_cam(cam, data)
    gts = jnp.stack([gt] * data)
    ts = jnp.stack([t] * data)
    out = step(model, state, cams, gts, ts, bg, it)

    # Same camera on every data shard -> the pmean equals the single-camera
    # gradient; parameters must match the unsharded step.
    np.testing.assert_allclose(float(out.loss), float(ref.loss), rtol=1e-4, atol=1e-5)
    for k in model.params:
        a = np.asarray(out.model.params[k])
        b = np.asarray(ref.model.params[k])
        if a.size == 0:
            continue
        # shard_map's collective lowering retiles the tiny matmuls, shifting
        # xy by ~1e-6 px; the L1 sign and the 1/255 alpha threshold are
        # discontinuous in that noise, so a small fraction of per-splat
        # gradients legitimately lands on the other side (verified: pure
        # slicing without shard_map is bitwise identical).
        close = np.isclose(a, b, rtol=2e-4, atol=5e-5)
        assert close.mean() > 0.95, (k, close.mean(), np.abs(a - b).max())
        assert np.abs(a - b).max() < 2e-3, k
    # Stats folded data-times for identical cameras
    np.testing.assert_allclose(
        np.asarray(out.model.stats["denom"]),
        np.asarray(ref.model.stats["denom"]) * data,
        atol=1e-5,
    )


def test_different_cameras_per_shard():
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    cfg, model, cam = _scene()
    opt = OptimizationConfig()
    statics = StepStatics(cfg=cfg, opt=opt, spatial_lr_scale=1.0, capacity=4096,
                          chunk=64, max_per_tile=256)
    state = init_state(model.params)
    rng = np.random.default_rng(2)
    gts = jnp.asarray(rng.uniform(size=(4, H, W, 3)).astype(np.float32))
    ts = jnp.asarray([0.0, 1.0, 2.0, 3.0], jnp.float32)

    mesh = make_mesh(4, data=4, gauss=1)
    step = make_sharded_train_step(statics, mesh)
    cams = _batch_cam(cam, 4)
    out = step(model, state, cams, gts, ts, jnp.zeros(3),
               jnp.asarray(600, jnp.int32))
    assert np.isfinite(float(out.loss))
    for k, v in out.model.params.items():
        assert bool(jnp.isfinite(v).all()), k
    # four distinct timestamps folded into the error-min bookkeeping
    seen = np.asarray(out.model.stats["xyz_error_min_timestamp"])
    assert len(np.unique(seen[seen >= 0])) >= 2


@pytest.mark.parametrize("axis_size", [2, 4, 8])
def test_tile_sharded_composite_matches_full(axis_size):
    """composite_projected_sharded must reproduce the unsharded image exactly
    (same per-tile ranges, same chunk walk) while each device blends only its
    slab of the tile grid."""
    if axis_size > len(jax.devices()):
        pytest.skip("not enough virtual devices")
    from jax.sharding import Mesh, PartitionSpec as P
    from ex4dgs_tpu.models.temporal import point_data_at_t
    from ex4dgs_tpu.rendering import (
        composite_projected, composite_projected_sharded, preprocess_points)

    cfg, model, cam = _scene()
    pts = point_data_at_t(model, cfg, jnp.asarray(1.0), 0)
    proj, colors = preprocess_points(pts, cam, cfg, near=cfg.near, far=cfg.far)
    flow = jnp.zeros((pts.means3d.shape[0], 3))
    bg = jnp.asarray([0.2, 0.1, 0.4])

    ref = composite_projected(proj, colors, flow, cam, bg=bg, far=cfg.far,
                              capacity=4096, max_per_tile=256)

    mesh = Mesh(np.array(jax.devices()[:axis_size]), ("gauss",))
    fn = jax.shard_map(
        lambda p, c, f: composite_projected_sharded(
            p, c, f, cam, bg=bg, far=cfg.far, capacity=4096,
            axis_name="gauss", axis_size=axis_size, max_per_tile=256),
        mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
        check_vma=False,
    )
    out = jax.jit(fn)(proj, colors, flow)
    np.testing.assert_allclose(np.asarray(out.render), np.asarray(ref.render),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(ref.acc),
                               atol=1e-6)
    # Sharded binning reports the worst-slab EFFECTIVE total
    # (axis_size * max local total): >= the true total, and the
    # `total <= capacity` gate means "every slab fits its local buffer".
    assert int(out.binning_total) >= int(ref.binning_total)
    assert int(out.binning_total) <= axis_size * int(ref.binning_total)
