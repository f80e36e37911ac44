"""Synthetic scene generators (ex4dgs_tpu/synthetic.py): the surface target
used by the config-2 quality anchor must be geometrically sane and visibly
dynamic; the camera rigs must look at the scene."""
import jax.numpy as jnp
import numpy as np

from ex4dgs_tpu.models import ModelConfig
from ex4dgs_tpu.rendering import render
from ex4dgs_tpu.synthetic import make_surface_scene, rig_cameras


def _cfg():
    return ModelConfig(time_interval=2, time_pad=1, start_duration=8,
                       duration=8, near=0.2, far=50.0, resolution=1)


def test_make_surface_scene_structure():
    cfg = _cfg()
    m, _ = make_surface_scene(n_static=4000, n_dynamic=300, duration=8.0,
                              seed=3, static_capacity=8192,
                              dynamic_capacity=512, cfg=cfg)
    assert int(m.n_static()) == 4000
    assert int(m.n_dynamic()) == 300
    xyz = np.asarray(m.params["xyz"][:4000])
    # half the statics live on the ground plane
    on_plane = np.isclose(xyz[:, 1], -0.9).sum()
    assert on_plane == 2000
    # splats are surface-scale, not fog-scale
    sc = np.exp(np.asarray(m.params["scaling"][:4000]))
    assert sc.max() <= 0.05 + 1e-6
    # colors are a smooth field within display range
    from ex4dgs_tpu.ops.math3d import sh0_to_rgb
    cols = np.asarray(sh0_to_rgb(m.params["f_dc"][:4000, 0]))
    assert cols.min() >= 0.0 and cols.max() <= 1.0
    # dynamic keyframe trajectories actually move (rigid paths)
    traj = np.asarray(m.params["motion_xyz"][:300])
    span = np.linalg.norm(traj.max(axis=1) - traj.min(axis=1), axis=-1)
    assert span.min() > 0.1


def test_rig_cameras_two_elevations():
    cams = rig_cameras(6, 3.0, 64, 48, elevs=(0.2, 0.5))
    eyes = np.stack([np.asarray(c.campos) for c in cams])
    ys = np.unique(np.round(eyes[:, 1], 5))
    assert len(ys) == 2  # alternating elevations
    # every camera looks at the origin: forward axis ~ -eye direction
    for c in cams:
        view = np.asarray(c.view)
        fwd = view[2, :3]  # camera +z row (COLMAP convention)
        d = -np.asarray(c.campos)
        d /= np.linalg.norm(d)
        assert np.dot(fwd, d) > 0.97


def test_surface_scene_renders_and_moves():
    cfg = _cfg()
    m, _ = make_surface_scene(n_static=2000, n_dynamic=200, duration=8.0,
                              seed=1, static_capacity=2048,
                              dynamic_capacity=256, cfg=cfg)
    cam = rig_cameras(3, 3.0, 96, 64, far=cfg.far)[0]
    i0 = render(cam, m, cfg, t=jnp.asarray(0.0), bg=jnp.zeros(3),
                capacity=32768, max_per_tile=1024, backend="jnp").render
    i4 = render(cam, m, cfg, t=jnp.asarray(4.0), bg=jnp.zeros(3),
                capacity=32768, max_per_tile=1024, backend="jnp").render
    i0, i4 = np.asarray(i0), np.asarray(i4)
    assert i0.mean() > 0.05  # scene visible
    assert np.abs(i0 - i4).max() > 0.1  # dynamics moved
