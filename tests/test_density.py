"""Host-side density control: clone/split/prune/extract/expand semantics."""
import numpy as np
import jax.numpy as jnp

from ex4dgs_tpu.models import ModelConfig, OptimizationConfig, create_from_pcd
from ex4dgs_tpu.models import density as D
from ex4dgs_tpu.models.optimizer import init_state
from ex4dgs_tpu.models.state import required_keyframes


def _cfg():
    return ModelConfig(time_interval=5, time_pad=3, start_duration=5, duration=20)


def _host(n=50, seed=0):
    rng = np.random.default_rng(seed)
    cfg = _cfg()
    model = create_from_pcd(
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.uniform(size=(n, 3)).astype(np.float32),
        cfg, duration=5.0, static_capacity=64,
    )
    state = init_state(model.params)
    return cfg, D.pull(model, state)


def test_pull_push_roundtrip():
    cfg, hm = _host()
    model, state = D.push(hm, cfg, static_capacity=128)
    assert int(model.n_static()) == 50
    assert model.static_capacity == 128
    hm2 = D.pull(model, state)
    for k in hm.params:
        np.testing.assert_array_equal(hm.params[k], hm2.params[k])
    for k in hm.stats:
        np.testing.assert_array_equal(hm.stats[k], hm2.stats[k])


def test_clone_small_high_grad():
    cfg, hm = _host()
    opt = OptimizationConfig()
    # mark splat 0 with a high positional gradient and a small scale
    hm.stats["xyz_gradient_accum"][0] = 10.0
    hm.stats["denom"][0] = 1.0
    hm.params["scaling"][0] = -10.0  # tiny
    hm.stats["xyz_error_min"][0] = 0.5
    hm.stats["xyz_error_min_timestamp"][0] = 3.0
    n0 = hm.n_static
    D.densify_and_prune(hm, cfg, opt, extent=10.0, rng=np.random.default_rng(0),
                        min_opacity=0.0)
    assert hm.n_static == n0 + 1  # one clone
    # clone carries the error-min bookkeeping (c_gaussian_model.py:981-984)
    assert hm.stats["xyz_error_min"][n0] == 0.5
    assert hm.stats["xyz_error_min_timestamp"][n0] == 3.0
    # accumulators reset for everyone (densification_postfix)
    assert hm.stats["xyz_gradient_accum"].max() == 0.0


def test_split_large_high_grad():
    cfg, hm = _host()
    opt = OptimizationConfig()
    hm.stats["xyz_gradient_accum"][0] = 10.0
    hm.stats["denom"][0] = 1.0
    hm.params["scaling"][0] = 2.0  # large (exp(2) > percent_dense*extent)
    xyz0 = hm.params["xyz"][0].copy()
    n0 = hm.n_static
    D.densify_and_prune(hm, cfg, opt, extent=10.0, rng=np.random.default_rng(0),
                        min_opacity=0.0)
    # split: +2 new, original pruned
    assert hm.n_static == n0 + 1
    # the original position must be gone (children are resampled around it)
    assert not any(np.allclose(xyz0, p) for p in hm.params["xyz"])
    # children scales shrunk by 0.8*N
    new_scales = np.exp(hm.params["scaling"][-2:])
    np.testing.assert_allclose(new_scales, np.exp(2.0) / 1.6, rtol=1e-5)


def test_prune_low_opacity():
    cfg, hm = _host()
    opt = OptimizationConfig()
    hm.params["opacity"][:10] = -20.0  # sigmoid ~ 0 < 0.01
    n0 = hm.n_static
    D.densify_and_prune(hm, cfg, opt, extent=10.0, rng=np.random.default_rng(0))
    assert hm.n_static == n0 - 10


def test_extract_dynamic_from_static():
    cfg, hm = _host()
    # big displacement on 5 splats, all visible, all seen
    hm.params["xyz_disp"][:5] = 3.0
    hm.stats["xyz_error_min_timestamp"][:] = 2.0
    vis = np.ones(hm.n_static, bool)
    n0s = hm.n_static
    n = D.extract_dynamic_from_static(
        hm, cfg, np.zeros(3, np.float32), 2.0, vis, extent=5.0, percentile=0.9,
        max_dur=10.0,
    )
    assert n >= 5
    assert hm.n_static == n0s - n
    assert hm.n_dynamic == n
    kf = hm.params["motion_xyz"].shape[1]
    assert kf >= required_keyframes(10.0, cfg) - 1
    # trajectory spans the displacement line (monotone along disp direction)
    traj = hm.params["motion_xyz"][0]
    d = traj[-1] - traj[0]
    assert np.linalg.norm(d) > 0
    # fresh dynamics: never-seen sentinel
    assert (hm.stats["motion_xyz_error_min_timestamp"] == -1).all()


def test_expand_duration_extrapolates():
    cfg, hm = _host()
    hm.params["xyz_disp"][:5] = 3.0
    hm.stats["xyz_error_min_timestamp"][:] = 2.0
    D.extract_dynamic_from_static(hm, cfg, np.zeros(3, np.float32), 2.0,
                                  np.ones(hm.n_static, bool), extent=5.0,
                                  percentile=0.9, max_dur=5.0)
    kf0 = hm.params["motion_xyz"].shape[1]
    assert D.expand_duration(hm, cfg, 20.0)
    assert hm.duration == 21
    kf1 = hm.params["motion_xyz"].shape[1]
    assert kf1 > kf0
    assert hm.keyframe_num == kf1
    # extrapolation is linear in the last keyframes
    x = hm.params["motion_xyz"][0]
    d_last = x[-1] - x[-2]
    d_prev = x[-2] - x[-3]
    np.testing.assert_allclose(d_last, d_prev, atol=1e-5)
    # moments zeroed by the replace (reference replace_tensor_to_optimizer)
    assert np.abs(hm.mu["motion_xyz"]).max() == 0.0


def test_cubic_diff_lifecycle():
    """interp_type='cubic_diff': the motion_xyz_d tangent array is created,
    tracks keyframe surgery (extract/expand/clone/push), and the temporal
    query with the seeded tangents reproduces the displacement line."""
    rng = np.random.default_rng(3)
    cfg = ModelConfig(time_interval=5, time_pad=3, start_duration=5,
                      duration=20, interp_type="cubic_diff")
    model = create_from_pcd(
        rng.normal(size=(50, 3)).astype(np.float32),
        rng.uniform(size=(50, 3)).astype(np.float32),
        cfg, duration=5.0, static_capacity=64,
    )
    assert "motion_xyz_d" in model.params
    hm = D.pull(model, init_state(model.params))
    hm.params["xyz_disp"][:5] = 3.0
    hm.stats["xyz_error_min_timestamp"][:] = 2.0
    n = D.extract_dynamic_from_static(
        hm, cfg, np.zeros(3, np.float32), 2.0, np.ones(hm.n_static, bool),
        extent=5.0, percentile=0.9, max_dur=10.0,
    )
    assert n >= 5
    assert hm.params["motion_xyz_d"].shape == hm.params["motion_xyz"].shape

    assert D.expand_duration(hm, cfg, 20.0)
    assert hm.params["motion_xyz_d"].shape == hm.params["motion_xyz"].shape

    model2, state2 = D.push(hm, cfg)
    assert model2.params["motion_xyz_d"].shape == model2.params["motion_xyz"].shape

    # The seeded tangents make the Hermite exactly reproduce the linear
    # trajectory: query two timestamps and check collinearity with keyframes.
    from ex4dgs_tpu.models.temporal import dynamic_xyz_at_t

    xa = np.asarray(dynamic_xyz_at_t(model2, cfg, jnp.float32(2.0)))[:n]
    xb = np.asarray(dynamic_xyz_at_t(model2, cfg, jnp.float32(4.5)))[:n]
    kf = np.asarray(model2.params["motion_xyz"][:n])
    # direction between queries matches the keyframe line direction
    d_q = xb - xa
    d_k = kf[:, 3] - kf[:, 2]
    cos = (d_q * d_k).sum(-1) / (
        np.linalg.norm(d_q, axis=-1) * np.linalg.norm(d_k, axis=-1) + 1e-9
    )
    np.testing.assert_allclose(cos, 1.0, atol=1e-3)

    # one jitted train step stays finite and moves the tangents' moments
    from ex4dgs_tpu.train.step import StepStatics, train_step
    from ex4dgs_tpu.rendering import RenderCamera
    from ex4dgs_tpu.ops.math3d import projection_matrix, world_to_view
    import math

    view = world_to_view(np.eye(3), np.array([0, 0, 4.0], np.float32))
    fov = math.radians(60)
    P = projection_matrix(0.2, 50.0, fov, fov)
    cam = RenderCamera.from_fov(view, P @ view, np.linalg.inv(view)[:3, 3],
                                64, 48, fov, fov)
    statics = StepStatics(cfg=cfg, opt=OptimizationConfig(), spatial_lr_scale=1.0,
                          capacity=8192, chunk=64, max_per_tile=512)
    out = train_step(model2, state2, cam, jnp.zeros((48, 64, 3)),
                     jnp.float32(2.0), jnp.zeros(3),
                     jnp.asarray(1, jnp.int32), statics)
    assert np.isfinite(float(out.loss))
    assert bool(jnp.isfinite(out.model.params["motion_xyz_d"]).all())


def test_adjust_temp_opa():
    cfg, hm = _host()
    hm.params["xyz_disp"][:5] = 3.0
    hm.stats["xyz_error_min_timestamp"][:] = 2.0
    D.extract_dynamic_from_static(hm, cfg, np.zeros(3, np.float32), 2.0,
                                  np.ones(hm.n_static, bool), extent=5.0,
                                  percentile=0.9, max_dur=10.0)
    hm.params["motion_opacity_center"][:] = 100.0  # pinned way past the end
    hm.params["motion_opacity_var"][:] = 1.5
    D.adjust_temp_opa(hm, cfg, max_dur=10.0)
    c = hm.params["motion_opacity_center"]
    assert c.max() <= (10.0 + cfg.time_shift) / cfg.time_interval - 0.2 + 1e-6
    assert (hm.params["motion_opacity_var"][:, 1] == 3.0).all()  # max(1.5,1)*2


def test_roundtrip_then_train_step():
    import jax
    from ex4dgs_tpu.train.step import StepStatics, train_step
    from ex4dgs_tpu.synthetic import ring_cameras

    cfg, hm = _host()
    opt = OptimizationConfig()
    hm.params["xyz_disp"][:5] = 3.0
    hm.stats["xyz_error_min_timestamp"][:] = 2.0
    D.extract_dynamic_from_static(hm, cfg, np.zeros(3, np.float32), 2.0,
                                  np.ones(hm.n_static, bool), extent=5.0,
                                  percentile=0.9, max_dur=5.0)
    model, state = D.push(hm, cfg, static_capacity=64, dynamic_capacity=32)
    cam = ring_cameras(1, 3.0, 48, 32, far=cfg.far)[0]
    statics = StepStatics(cfg=cfg, opt=opt, spatial_lr_scale=1.0, capacity=2048,
                          chunk=64, max_per_tile=128)
    out = train_step(model, state, cam, jnp.zeros((32, 48, 3)), jnp.asarray(1.0),
                     jnp.zeros(3), jnp.asarray(100, jnp.int32), statics)
    assert np.isfinite(float(out.loss))


def test_split_collapsed_scale_stays_finite():
    """Split of a collapsed splat (log-scale < f32 exp underflow, ~-88) must
    not produce -inf children: the log-domain form log(exp(s)/(0.8N)) ==
    s - log(0.8N) is exact and underflow-free (c_gaussian_model.py:905)."""
    cfg, hm = _host()
    opt = OptimizationConfig()
    hm.stats["xyz_gradient_accum"][0] = 10.0
    hm.stats["denom"][0] = 1.0
    hm.params["scaling"][0] = 2.0   # large -> split
    hm.params["scaling"][1] = -120.0  # collapsed bystander: exp underflows
    hm.stats["xyz_gradient_accum"][1] = 10.0
    hm.stats["denom"][1] = 1.0
    # make the collapsed one ALSO split-eligible via screen size
    hm.stats["max_radii2D"][1] = 1e9
    D.densify_and_prune(hm, cfg, opt, extent=10.0, rng=np.random.default_rng(0),
                        min_opacity=0.0, max_screen_size=100.0)
    assert np.isfinite(hm.params["scaling"]).all()
