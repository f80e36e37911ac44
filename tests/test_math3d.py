import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ex4dgs_tpu.ops import math3d as m3


def test_quat_to_rotmat_identity():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    R = m3.quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_quat_to_rotmat_orthonormal():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    R = m3.quat_to_rotmat(q)
    eye = jnp.eye(3)[None].repeat(16, 0)
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), eye, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), np.ones(16), atol=1e-5)


def test_quat_z_rotation():
    theta = 0.7
    q = jnp.array([np.cos(theta / 2), 0.0, 0.0, np.sin(theta / 2)], jnp.float32)
    R = m3.quat_to_rotmat(q)
    expect = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    np.testing.assert_allclose(np.asarray(R), expect, atol=1e-6)


def test_cov3d_matches_RSSR():
    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.uniform(0.1, 2.0, (8, 3)).astype(np.float32))
    q = rng.normal(size=(8, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)  # normalized input: paths agree
    q = jnp.asarray(q)
    packed = m3.cov3d_from_scaling_rotation(s, q)
    R = np.asarray(m3.quat_to_rotmat(q))
    expect = R @ (np.eye(3) * np.asarray(s)[:, None, :] ** 2) @ np.swapaxes(R, 1, 2)
    full = np.asarray(m3.unpack_sym3(packed))
    np.testing.assert_allclose(full, expect, atol=1e-5)


def test_ewa_isotropic_center():
    # An isotropic Gaussian on the optical axis: cov2d = (f*s/z)^2 I + kernel.
    s, z, f = 0.1, 4.0, 100.0
    cov3d = jnp.array([[s * s, 0, 0, s * s, 0, s * s]], jnp.float32)
    mean_cam = jnp.array([[0.0, 0.0, z]], jnp.float32)
    cov2d, coef = m3.ewa_project_cov(
        mean_cam, cov3d, jnp.eye(3), f, f, 1.0, 1.0, kernel_size=0.3
    )
    expect_var = (f * s / z) ** 2
    np.testing.assert_allclose(cov2d[0, 0], expect_var + 0.3, rtol=1e-5)
    np.testing.assert_allclose(cov2d[0, 2], expect_var + 0.3, rtol=1e-5)
    np.testing.assert_allclose(cov2d[0, 1], 0.0, atol=1e-5)
    det0 = expect_var**2
    det1 = (expect_var + 0.3) ** 2
    np.testing.assert_allclose(coef[0], np.sqrt(det0 / (det1 + 1e-6) + 1e-6), rtol=1e-4)


def test_sh_deg0():
    sh = jnp.zeros((4, 16, 3)).at[:, 0, :].set(1.0)
    rgb = m3.sh_to_rgb(0, sh, jnp.ones((4, 3)), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(rgb), m3.SH_C0 + 0.5, rtol=1e-6)


def test_sh_clamp_zero_grad():
    sh = jnp.zeros((1, 16, 3)).at[:, 0, :].set(-10.0)  # clamped to 0

    def f(sh):
        return m3.sh_to_rgb(3, sh, jnp.array([[0.0, 0.0, 1.0]]), jnp.zeros(3)).sum()

    g = jax.grad(f)(sh)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_rgb_sh_roundtrip():
    rgb = jnp.array([0.2, 0.5, 0.9])
    np.testing.assert_allclose(np.asarray(m3.sh0_to_rgb(m3.rgb_to_sh0(rgb))), np.asarray(rgb), rtol=1e-6)


def test_projection_matrix_ndc():
    import math

    fov = math.radians(60)
    P = m3.projection_matrix(0.1, 100.0, fov, fov)
    # A point on the frustum edge at z maps to ndc x = 1.
    z = 10.0
    x = math.tan(fov / 2) * z
    p = P @ np.array([x, 0, z, 1.0])
    np.testing.assert_allclose(p[0] / p[3], 1.0, rtol=1e-5)


def test_world_to_view_camcenter():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    t = rng.normal(size=3)
    V = m3.world_to_view(Q, t)
    C = np.linalg.inv(V)[:3, 3]  # camera center in world space
    np.testing.assert_allclose(V[:3, :3] @ C + V[:3, 3], 0.0, atol=1e-5)


def test_ndc2pix():
    np.testing.assert_allclose(float(m3.ndc2pix(jnp.float32(0.0), 100)), 49.5)
    np.testing.assert_allclose(float(m3.ndc2pix(jnp.float32(-1.0), 100)), -0.5)
