"""End-to-end jitted train step: optimization drives loss down on a tiny
synthetic scene, and the gradient side-channels accumulate sane statistics."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from ex4dgs_tpu.models import ModelConfig, OptimizationConfig, create_from_pcd
from ex4dgs_tpu.models.optimizer import init_state
from ex4dgs_tpu.ops.math3d import projection_matrix, world_to_view
from ex4dgs_tpu.rendering import RenderCamera, render
from ex4dgs_tpu.train.step import StepStatics, train_step

W, H = 64, 48


def _scene(n=200, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.8
    cols = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    cfg = ModelConfig(time_interval=5, start_duration=5, duration=10, near=0.2, far=50.0)
    model = create_from_pcd(pts, cols, cfg, duration=5, static_capacity=256)

    view = world_to_view(np.eye(3), np.array([0, 0, 4.0], np.float32))
    fov = math.radians(60)
    P = projection_matrix(0.2, 50.0, fov, fov)
    cam = RenderCamera.from_fov(
        view, (P @ view), np.linalg.inv(view)[:3, 3], W, H, fov, fov
    )
    return cfg, model, cam


def test_train_step_learns():
    cfg, model, cam = _scene()
    # Crank the color/opacity LRs so the fit converges visibly in few steps
    # (the defaults are tuned for 40k-iteration runs).
    opt = OptimizationConfig(static_reg=0.0, feature_lr=0.05, opacity_lr=0.2)
    statics = StepStatics(cfg=cfg, opt=opt, spatial_lr_scale=1.0, capacity=8192,
                          chunk=64, max_per_tile=512)

    # Ground truth: the same model rendered with perturbed colors as target —
    # a fittable objective.
    gt = render(cam, model, cfg, t=jnp.asarray(1.0), bg=jnp.zeros(3),
                capacity=8192, max_per_tile=512).render
    gt = jnp.clip(gt * 0.5 + 0.2, 0, 1)

    state = init_state(model.params)
    losses = []
    for i in range(25):
        out = train_step(model, state, cam, gt, jnp.asarray(1.0), jnp.zeros(3),
                         jnp.asarray(i + 1, jnp.int32), statics)
        model, state = out.model, out.opt_state
        losses.append(float(out.loss))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses

    # Stats accumulated only on visible active splats.
    stats = model.stats
    assert float(stats["denom"].max()) <= 25
    assert float(stats["denom"].sum()) > 0
    assert float(stats["error_denom"].sum()) > 0
    # padded rows untouched
    n_active = int(model.n_static())
    assert float(stats["denom"][n_active:].sum()) == 0
    # min timestamps recorded for visible splats
    seen = np.asarray(stats["xyz_error_min_timestamp"][:n_active])
    assert (seen >= 0).sum() > 0
    # params stay finite
    for k, v in model.params.items():
        assert bool(jnp.isfinite(v).all()), k


def test_train_step_overflow_is_noop():
    """A step whose binning overflows capacity must not apply any update —
    the reference never trains on a truncated instance list (it sizes buffers
    to the true num_rendered, rasterizer_impl.cu:298-299)."""
    cfg, model, cam = _scene()
    opt = OptimizationConfig(static_reg=0.0)
    tiny = StepStatics(cfg=cfg, opt=opt, spatial_lr_scale=1.0, capacity=128,
                       chunk=64, max_per_tile=512)
    gt = jnp.zeros((H, W, 3))
    state = init_state(model.params)
    out = train_step(model, state, cam, gt, jnp.asarray(1.0), jnp.zeros(3),
                     jnp.asarray(1, jnp.int32), tiny)
    assert int(out.binning_total) > tiny.capacity, "scene must overflow"
    for k in model.params:
        assert bool(jnp.array_equal(out.model.params[k], model.params[k])), k
    for a, b in zip(jax.tree.leaves(out.opt_state), jax.tree.leaves(state)):
        assert bool(jnp.array_equal(a, b))
    for k in model.stats:
        assert bool(jnp.array_equal(out.model.stats[k], model.stats[k])), k

    # At sufficient capacity the same inputs DO update.
    big = StepStatics(cfg=cfg, opt=opt, spatial_lr_scale=1.0, capacity=8192,
                      chunk=64, max_per_tile=512)
    out2 = train_step(model, state, cam, gt, jnp.asarray(1.0), jnp.zeros(3),
                      jnp.asarray(1, jnp.int32), big)
    assert int(out2.binning_total) <= big.capacity
    assert not bool(jnp.array_equal(out2.model.params["xyz"], model.params["xyz"]))


def test_train_step_with_dynamic_points():
    cfg, model, cam = _scene()
    # activate a few dynamic splats
    from ex4dgs_tpu.models.state import empty_model, required_keyframes

    kf = model.keyframe_capacity
    dyn_cap = 64
    base = empty_model(cfg, model.static_capacity, dyn_cap, kf, duration=5)
    p = dict(base.params)
    for k in model.params:
        if not k.startswith("motion_"):
            p[k] = model.params[k]
    rng = np.random.default_rng(1)
    nd = 16
    p["motion_xyz"] = p["motion_xyz"].at[:nd].set(
        jnp.asarray(rng.normal(size=(nd, kf, 3)).astype(np.float32) * 0.5)
    )
    p["motion_opacity"] = p["motion_opacity"].at[:nd].set(0.5)
    p["motion_opacity_center"] = p["motion_opacity_center"].at[:nd, 0].set(1.0)
    p["motion_opacity_center"] = p["motion_opacity_center"].at[:nd, 1].set(2.5)
    p["motion_opacity_var"] = p["motion_opacity_var"].at[:nd].set(1.0)
    p["motion_scaling"] = p["motion_scaling"].at[:nd].set(-3.0)
    model = base._replace(
        params=p,
        static_mask=model.static_mask,
        dynamic_mask=base.dynamic_mask.at[:nd].set(True),
        stats=base.stats,
        keyframe_num=jnp.asarray(kf, jnp.int32),
        duration=model.duration,
    )

    opt = OptimizationConfig()
    statics = StepStatics(cfg=cfg, opt=opt, spatial_lr_scale=1.0, capacity=8192,
                          chunk=64, max_per_tile=512)
    gt = jnp.zeros((H, W, 3))
    state = init_state(model.params)
    out = train_step(model, state, cam, gt, jnp.asarray(1.0), jnp.zeros(3),
                     jnp.asarray(1000, jnp.int32), statics)
    assert np.isfinite(float(out.loss))
    for k, v in out.model.params.items():
        assert bool(jnp.isfinite(v).all()), k
    # dynamic stats exist and accumulate
    assert float(out.model.stats["motion_denom"].sum()) >= 0
