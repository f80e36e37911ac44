"""Sub-decomposition of the preprocess stage (grad prefixes inside one jitted
graph each): where do the 18.7 ms go for ~116k splats?"""
import functools
import time

import jax, jax.numpy as jnp
from ex4dgs_tpu.models.temporal import point_data_at_t
from ex4dgs_tpu.ops.math3d import cov3d_from_scaling_rotation
from ex4dgs_tpu.rendering import preprocess_points, sh_to_rgb
from ex4dgs_tpu.ops.projection import project_gaussians
from ex4dgs_tpu.synthetic import make_scene, ring_cameras

W, H = 1352, 1014
model, cfg = make_scene(n_static=100_000, n_dynamic=10_000, duration=10.0,
                        static_capacity=100_096, dynamic_capacity=16384)
model = model._replace(params={
    **model.params,
    "scaling": jnp.minimum(model.params["scaling"], jnp.log(0.02)),
})
cam = ring_cameras(1, 3.0, W, H, far=cfg.far)[0]


def timeit(name, fn, *args, n=20):
    jf = jax.jit(fn)
    out = jax.block_until_ready(jf(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1e3:.2f}ms", flush=True)


def pipeline(params, t, stage):
    m = model._replace(params=params)
    pts = point_data_at_t(m, cfg, t, 0)
    if stage == 1:  # temporal queries incl. features concat + band mask
        return (pts.means3d.sum() + pts.rotations.sum() + pts.scales.sum()
                + pts.opacity.sum() + pts.features.sum())
    if stage == 2:  # + SH eval
        colors = sh_to_rgb(3, pts.features, pts.means3d, cam.arrays.campos)
        return colors.sum() + pts.scales.sum() + pts.rotations.sum() + pts.opacity.sum()
    if stage == 3:  # + cov3d
        colors = sh_to_rgb(3, pts.features, pts.means3d, cam.arrays.campos)
        cov3d = cov3d_from_scaling_rotation(pts.scales, pts.rotations, 1.0)
        return colors.sum() + cov3d.sum() + pts.opacity.sum()
    # full (== stage 1 of _tpu_stages6)
    proj, colors = preprocess_points(pts, cam, cfg, near=cfg.near, far=cfg.far)
    return proj.xy.sum() + proj.conic.sum() + colors.sum()


for stage, nm in ((1, "temporal"), (2, "+sh"), (3, "+cov3d"), (4, "+project")):
    g = jax.grad(functools.partial(pipeline, stage=stage))
    timeit(f"grad {nm}", lambda p, t, g=g: g(p, t),
           model.params, jnp.asarray(1.0))
    timeit(f"fwd  {nm}", functools.partial(pipeline, stage=stage),
           model.params, jnp.asarray(1.0))
