import jax.numpy as jnp
import numpy as np

from ex4dgs_tpu.ops import interpolation as itp


def test_linear_endpoints():
    y0, y1 = jnp.float32(2.0), jnp.float32(5.0)
    assert float(itp.linear_interp(y0, y1, 0.0)) == 2.0
    assert float(itp.linear_interp(y0, y1, 1.0)) == 5.0
    assert float(itp.linear_interp(y0, y1, 0.5)) == 3.5


def test_cube_endpoints_and_smoothness():
    ys = jnp.array([0.0, 1.0, 3.0, 2.0])
    v0 = itp.cube_interp(*ys, 0.0)
    v1 = itp.cube_interp(*ys, 1.0)
    np.testing.assert_allclose(float(v0), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(v1), 3.0, atol=1e-6)
    # derivative at t=0 is the central difference (y2 - y0)/2
    eps = 1e-3
    d = (float(itp.cube_interp(*ys, eps)) - float(v0)) / eps
    np.testing.assert_allclose(d, (3.0 - 0.0) / 2, atol=1e-2)


def test_pchip_monotone_flat():
    # non-monotone neighborhood -> zero tangent (no overshoot at knot)
    ys = jnp.array([2.0, 1.0, 3.0, 2.0])  # y_k is a local min
    v0 = itp.pchip_interp(*ys, 0.0)
    np.testing.assert_allclose(float(v0), 1.0, atol=1e-6)
    # monotone data stays within [y_k, y_k1]
    ys2 = (jnp.array([0.0]), jnp.array([1.0]), jnp.array([2.0]), jnp.array([3.0]))
    for t in np.linspace(0, 1, 11):
        v = float(itp.pchip_interp(*ys2, jnp.float32(t))[0])
        assert 1.0 - 1e-5 <= v <= 2.0 + 1e-5


def test_cubic_diff_matches_reference_formula():
    """interp_keyframes('cubic_diff') == the reference quad_diff_interpolate
    (utils/interpolations.py:97-107): Hermite with explicit tangents."""
    rng = np.random.default_rng(7)
    P, K, D = 5, 6, 3
    y = rng.normal(size=(P, K, D)).astype(np.float32)
    yd = rng.normal(size=(P, K, D)).astype(np.float32)

    def ref(y1, y2, m1, m2, t):  # re-typed reference hermite basis
        h00 = 2 * t**3 - 3 * t**2 + 1
        h10 = t**3 - 2 * t**2 + t
        h01 = -2 * t**3 + 3 * t**2
        h11 = t**3 - t**2
        return h00 * y1 + h10 * m1 + h01 * y2 + h11 * m2

    for k in (0, 2, 4):
        for dt in (0.0, 0.25, 0.8, 1.0):
            got = np.asarray(itp.interp_keyframes(
                "cubic_diff", jnp.asarray(y), jnp.asarray(k), jnp.float32(dt),
                y_d=jnp.asarray(yd),
            ))
            want = ref(y[:, k], y[:, k + 1], yd[:, k], yd[:, k + 1], dt)
            np.testing.assert_allclose(got, want, atol=1e-6)
    # endpoint interpolation passes through the keyframes
    got0 = np.asarray(itp.interp_keyframes(
        "cubic_diff", jnp.asarray(y), jnp.asarray(1), jnp.float32(0.0),
        y_d=jnp.asarray(yd)))
    np.testing.assert_allclose(got0, y[:, 1], atol=1e-6)


def test_slerp_endpoints_and_midpoint():
    q0 = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    theta = np.pi / 2
    q1 = jnp.array([[np.cos(theta / 2), 0.0, 0.0, np.sin(theta / 2)]], dtype=jnp.float32)
    r0 = itp.quat_slerp(q0, q1, 0.0)
    r1 = itp.quat_slerp(q0, q1, 1.0)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(q0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(q1), atol=1e-3)
    rm = np.asarray(itp.quat_slerp(q0, q1, 0.5))[0]
    expect = np.array([np.cos(theta / 4), 0, 0, np.sin(theta / 4)])
    np.testing.assert_allclose(rm, expect, atol=1e-3)


def test_slerp_identical_quats_stable():
    q = jnp.array([[0.5, 0.5, 0.5, 0.5]])
    r = itp.quat_slerp(q, q, 0.3)
    assert np.isfinite(np.asarray(r)).all()
    np.testing.assert_allclose(np.asarray(r), np.asarray(q), atol=1e-2)


def test_time_bigaussian_window():
    center = jnp.array([[2.0, 5.0], [2.0, 5.0], [2.0, 5.0]])
    var = jnp.zeros((3, 2))
    # inside the window -> exactly 1
    v_in = itp.time_bigaussian(center[:1], var[:1], 3.0, var_min=0.5)
    np.testing.assert_allclose(np.asarray(v_in), 1.0)
    # outside decays, farther -> smaller
    v6 = float(itp.time_bigaussian(center[:1], var[:1], 6.0, var_min=0.5)[0])
    v8 = float(itp.time_bigaussian(center[:1], var[:1], 8.0, var_min=0.5)[0])
    assert 0 < v8 < v6 < 1.0
    # reference formula check at t=6: m = min(6-2, 6-5) = 1, v=var[:,1]=0
    expect = np.exp(-1.0 / (np.exp(0.0) + 0.5 / 2.36) ** 2)
    np.testing.assert_allclose(v6, expect, rtol=1e-5)


def test_keyframe_coords_and_gather():
    y = jnp.arange(10.0 * 2 * 3).reshape(2, 10, 3)  # [P=2, K=10, D=3]
    k, dt = itp.keyframe_coords(7.0, time_shift=8.0, interval=5.0)
    assert int(k) == 3 and abs(float(dt)) < 1e-6
    out = itp.interp_keyframes("linear", y, k, dt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y[:, 3]), atol=1e-5)
    out_c = itp.interp_keyframes("cube", y, k, dt)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(y[:, 3]), atol=1e-4)


def test_interp_quat_keyframes():
    y = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (2, 5, 1))
    out = itp.interp_quat_keyframes("slerp", y, jnp.int32(1), jnp.float32(0.4))
    np.testing.assert_allclose(np.asarray(out), np.tile([1, 0, 0, 0], (2, 1)), atol=1e-4)
