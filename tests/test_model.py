"""Model state, temporal queries, and RAdam parity with torch."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from ex4dgs_tpu.models import ModelConfig, create_from_pcd
from ex4dgs_tpu.models.optimizer import init_state, radam_update
from ex4dgs_tpu.models.state import empty_model, required_keyframes
from ex4dgs_tpu.models.temporal import (
    dynamic_xyz_at_t,
    point_data_at_t,
    static_xyz_at_t,
)
from ex4dgs_tpu.ops.interpolation import cube_interp


def _cfg(**kw):
    base = dict(time_interval=5, time_pad=3, start_duration=5, duration=20)
    base.update(kw)
    return ModelConfig(**base)


def test_create_from_pcd_values():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.uniform(size=(100, 3)).astype(np.float32)
    cfg = _cfg()
    m = create_from_pcd(pts, cols, cfg, duration=5, static_capacity=128)
    assert int(m.n_static()) == 100
    # opacity = sigma^-1(0.1)
    np.testing.assert_allclose(
        np.asarray(m.params["opacity"][:100]), math.log(0.1 / 0.9), atol=1e-5
    )
    # DC SH inverts back to the input colors
    from ex4dgs_tpu.ops.math3d import sh0_to_rgb

    np.testing.assert_allclose(
        np.asarray(sh0_to_rgb(m.params["f_dc"][:100, 0])), cols, atol=1e-5
    )
    # identity rotations, padded rows inactive
    np.testing.assert_allclose(np.asarray(m.params["rotation"][:, 0]), 1.0)
    assert not bool(m.static_mask[100:].any())


def test_time_shift_convention():
    assert _cfg(interp_type="linear").time_shift == 3
    assert _cfg(interp_type="cube").time_shift == 8  # time_pad + interval
    assert _cfg(interp_type="pchip").time_shift == 8


def test_static_drift():
    cfg = _cfg()
    m = empty_model(cfg, static_capacity=8, duration=10)
    p = dict(m.params)
    p["xyz"] = p["xyz"].at[:].set(1.0)
    p["xyz_disp"] = p["xyz_disp"].at[:].set(2.0)
    m = m._replace(params=p)
    out = static_xyz_at_t(m, jnp.asarray(5.0))
    np.testing.assert_allclose(np.asarray(out), 1.0 + 2.0 * 5.0 / 10.0, atol=1e-6)


def test_dynamic_keyframe_interp_matches_manual():
    cfg = _cfg(interp_type="cube")
    kf = required_keyframes(20, cfg) + 2
    m = empty_model(cfg, static_capacity=4, dynamic_capacity=4, keyframe_capacity=kf,
                    duration=20)
    rng = np.random.default_rng(1)
    traj = rng.normal(size=(4, kf, 3)).astype(np.float32)
    p = dict(m.params)
    p["motion_xyz"] = jnp.asarray(traj)
    m = m._replace(params=p, dynamic_mask=m.dynamic_mask.at[:].set(True))

    t = 7.0  # t' = t + 8 = 15 -> k=3, dt=0
    out = np.asarray(dynamic_xyz_at_t(m, cfg, jnp.asarray(t)))
    manual = np.asarray(
        cube_interp(traj[:, 2], traj[:, 3], traj[:, 4], traj[:, 5], 0.0)
    )
    np.testing.assert_allclose(out, manual, atol=1e-5)

    t = 8.5  # t' = 16.5 -> k=3, dt=0.3
    out = np.asarray(dynamic_xyz_at_t(m, cfg, jnp.asarray(t)))
    manual = np.asarray(
        cube_interp(traj[:, 2], traj[:, 3], traj[:, 4], traj[:, 5], 16.5 % 5 / 5)
    )
    np.testing.assert_allclose(out, manual, atol=1e-5)


def test_sh_band_masking():
    cfg = _cfg()
    rng = np.random.default_rng(2)
    m = create_from_pcd(
        rng.normal(size=(10, 3)).astype(np.float32),
        rng.uniform(size=(10, 3)).astype(np.float32),
        cfg,
        static_capacity=16,
    )
    p = dict(m.params)
    p["f_rest"] = jnp.asarray(rng.normal(size=p["f_rest"].shape).astype(np.float32))
    m = m._replace(params=p)
    pd0 = point_data_at_t(m, cfg, 0.0, mode=1)
    assert np.abs(np.asarray(pd0.features[:, 1:])).max() == 0.0  # deg 0: only DC
    m2 = m._replace(active_sh_degree=jnp.asarray(2, jnp.int32))
    pd2 = point_data_at_t(m2, cfg, 0.0, mode=1)
    assert np.abs(np.asarray(pd2.features[:, 1:9])).max() > 0
    assert np.abs(np.asarray(pd2.features[:, 9:])).max() == 0.0


def test_radam_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=(50, 3)).astype(np.float32)
    y0 = rng.normal(size=(20,)).astype(np.float32)
    lrs = {"a": 0.01, "b": 0.003}

    params = {"a": jnp.asarray(x0), "b": jnp.asarray(y0)}
    state = init_state(params)

    ta = torch.tensor(x0, requires_grad=True)
    tb = torch.tensor(y0, requires_grad=True)
    opt = torch.optim.RAdam(
        [{"params": [ta], "lr": 0.01}, {"params": [tb], "lr": 0.003}]
    )

    for i in range(12):
        ga = np.asarray(np.sin(x0 + i), np.float32)
        gb = np.asarray(np.cos(y0 * (i + 1)), np.float32)
        grads = {"a": jnp.asarray(ga), "b": jnp.asarray(gb)}
        params, state = radam_update(params, grads, state, lrs)

        opt.zero_grad()
        ta.grad = torch.tensor(ga)
        tb.grad = torch.tensor(gb)
        opt.step()

    # fp32 accumulation-order differences only
    np.testing.assert_allclose(np.asarray(params["a"]), ta.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(), atol=1e-5)
