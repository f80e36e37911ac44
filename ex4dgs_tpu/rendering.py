"""Public render API — the functional equivalent of the reference's
gaussian_renderer.render() (gaussian_renderer/__init__.py:19-124).

`render(camera, model, cfg, ...)` returns the same logical outputs: color,
depth, optical flow, accumulated alpha, dominant-contributor index, per-splat
radii and visibility. Instead of the reference's hooked dummy tensors
(screenspace_points / flow with retain_grad), callers that need the
densification / error-backtracking gradients pass explicit zero tensors
(`mean2d_offset`, `flow_dirs`) and differentiate with respect to them —
the JAX-native version of the same trick (see train/step.py).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .kernel_config import current as _kernel_config
from .models.config import ModelConfig
from .models.state import GaussianModel
from .models.temporal import PointData, point_data_at_t
from .ops import binning as binning_ops
from .ops import compositing as comp
from .ops import rasterize_tiled
from .ops.math3d import sh_to_rgb
from .ops.projection import TILE_X, TILE_Y
from .ops.projection import CameraArrays, Projected, project_gaussians, tile_grid


@jax.tree_util.register_pytree_node_class
class RenderCamera:
    """Device-side camera: matrices + intrinsics (scene/cameras.py analog).

    Registered as a pytree so it flows through jit: matrices / camera center /
    tan-FoVs are traced leaves (Technicolor has per-camera focals — no
    recompiles per camera), while width/height are static aux data (they set
    array shapes)."""

    def __init__(self, view, proj, campos, width: int, height: int, tan_fovx, tan_fovy):
        self.view = view  # [4,4] world->camera
        self.proj = proj  # [4,4] P @ view
        self.campos = campos  # [3]
        self.width = int(width)
        self.height = int(height)
        self.tan_fovx = tan_fovx
        self.tan_fovy = tan_fovy

    @classmethod
    def from_fov(cls, view, proj, campos, width, height, fovx, fovy):
        return cls(
            view=jnp.asarray(view, jnp.float32),
            proj=jnp.asarray(proj, jnp.float32),
            campos=jnp.asarray(campos, jnp.float32),
            width=int(width),
            height=int(height),
            tan_fovx=jnp.asarray(math.tan(fovx * 0.5), jnp.float32),
            tan_fovy=jnp.asarray(math.tan(fovy * 0.5), jnp.float32),
        )

    def tree_flatten(self):
        return (self.view, self.proj, self.campos, self.tan_fovx, self.tan_fovy), (
            self.width,
            self.height,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        view, proj, campos, tan_fovx, tan_fovy = leaves
        return cls(view, proj, campos, aux[0], aux[1], tan_fovx, tan_fovy)

    @property
    def arrays(self) -> CameraArrays:
        return CameraArrays(view=self.view, proj=self.proj, campos=self.campos)


class RenderResult(NamedTuple):
    render: jnp.ndarray  # [H, W, 3]
    depth: jnp.ndarray  # [H, W]
    opticalflow: jnp.ndarray  # [H, W, 3]
    acc: jnp.ndarray  # [H, W]
    dominent_idxs: jnp.ndarray  # [H, W] int32 (-1 empty)
    radii: jnp.ndarray  # [P] int32
    visibility_filter: jnp.ndarray  # [P] bool (radii > 0)
    static_num: int
    projected: Projected
    binning_total: jnp.ndarray  # [] int32 true instance count (overflow check)


def render_points(
    pts: PointData,
    cam: RenderCamera,
    cfg: ModelConfig,
    *,
    bg: jnp.ndarray,
    near: float | None = None,
    far: float | None = None,
    scaling_modifier: float = 1.0,
    capacity: int | None = None,
    chunk: int = 128,
    max_per_tile: int | None = None,
    mean2d_offset: jnp.ndarray | None = None,
    flow_dirs: jnp.ndarray | None = None,
    override_color: jnp.ndarray | None = None,
    subpixel_offset: jnp.ndarray | None = None,
    backend: str | None = None,
    track_idx: bool = True,
) -> RenderResult:
    """Rasterize pre-assembled per-frame point data."""
    near = cfg.near if near is None else near
    far = cfg.far if far is None else far
    P = pts.means3d.shape[0]
    if capacity is None:
        capacity = default_capacity(P, cam.width, cam.height)
    if flow_dirs is None:
        flow_dirs = jnp.zeros((P, 3), jnp.float32)

    proj, colors = preprocess_points(
        pts, cam, cfg, near=near, far=far, scaling_modifier=scaling_modifier,
        mean2d_offset=mean2d_offset, override_color=override_color,
    )
    return composite_projected(
        proj, colors, flow_dirs, cam, bg=bg, far=far, capacity=capacity,
        chunk=chunk, max_per_tile=max_per_tile, subpixel_offset=subpixel_offset,
        static_num=pts.static_num, backend=backend, track_idx=track_idx,
    )


def preprocess_points(
    pts: PointData,
    cam: RenderCamera,
    cfg: ModelConfig,
    *,
    near: float,
    far: float,
    scaling_modifier: float = 1.0,
    mean2d_offset: jnp.ndarray | None = None,
    override_color: jnp.ndarray | None = None,
) -> tuple[Projected, jnp.ndarray]:
    """Per-Gaussian stage: covariance, EWA projection, SH->RGB. This is the
    stage the parallel layer shards over the `gauss` mesh axis (all rows are
    independent); the compositing stage below needs the gathered whole."""
    from .ops.math3d import cov3d_from_scaling_rotation

    cov3d = cov3d_from_scaling_rotation(pts.scales, pts.rotations, scaling_modifier)
    proj = project_gaussians(
        pts.means3d,
        cov3d,
        pts.opacity,
        cam.arrays,
        width=cam.width,
        height=cam.height,
        tan_fovx=cam.tan_fovx,
        tan_fovy=cam.tan_fovy,
        kernel_size=cfg.kernel_size,
        min_depth=near,
        max_depth=far,
        mean2d_ndc_offset=mean2d_offset,
    )
    # Capacity-padding mask: inactive rows are simply invalid.
    proj = proj._replace(
        valid=proj.valid & pts.mask,
        tiles_touched=jnp.where(pts.mask, proj.tiles_touched, 0),
        radius=jnp.where(pts.mask, proj.radius, 0),
    )
    if override_color is not None:
        colors = override_color
    else:
        colors = sh_to_rgb(3, pts.features, pts.means3d, cam.campos)
    return proj, colors


def _auto_backend(capacity: int) -> str:
    """Backend auto-selection, consistent with the Pallas kernel's own
    precondition (rasterize_pallas.py asserts capacity % G_CHUNK == 0):
    a capacity the kernel can't take falls back to the jnp oracle instead
    of crashing inside the kernel wrapper."""
    if jax.devices()[0].platform != "tpu":
        return "jnp"
    from .ops.rasterize_pallas import G_CHUNK

    return "pallas" if capacity % G_CHUNK == 0 else "jnp"


def composite_projected(
    proj: Projected,
    colors: jnp.ndarray,
    flow_dirs: jnp.ndarray,
    cam: RenderCamera,
    *,
    bg: jnp.ndarray,
    far: float,
    capacity: int,
    chunk: int = 128,
    max_per_tile: int | None = None,
    subpixel_offset: jnp.ndarray | None = None,
    static_num: int = 0,
    backend: str | None = None,
    track_idx: bool = True,
) -> RenderResult:
    """Binning + tile compositing of already-projected Gaussians.

    backend: "pallas" (TPU kernels), "jnp" (portable oracle), or None = auto
    (pallas on TPU when no subpixel offset is requested)."""
    grid_x, grid_y = tile_grid(cam.width, cam.height)
    kcfg = _kernel_config()
    binning = binning_ops.bin_gaussians(
        proj, grid_x, grid_y, capacity,
        exact_depth_sort=kcfg.exact_sort)
    if backend is None:
        backend = _auto_backend(capacity)
    aligned = backend == "pallas" and kcfg.aligned_layout
    if aligned:
        binning = binning_ops.align_binning(
            binning, proj.xy.shape[0], kcfg.g_chunk)
    if backend == "pallas":
        from .ops.rasterize_pallas import rasterize_tiled_pallas

        out = rasterize_tiled_pallas(
            proj, colors, flow_dirs, binning,
            width=cam.width, height=cam.height, bg=bg, max_depth=far,
            track_idx=track_idx, subpixel_offset=subpixel_offset,
            aligned=aligned,
        )
    else:
        out = rasterize_tiled.rasterize_tiled(
            proj,
            colors,
            flow_dirs,
            binning,
            width=cam.width,
            height=cam.height,
            bg=bg,
            max_depth=far,
            chunk=chunk,
            max_per_tile=max_per_tile,
            subpixel_offset=subpixel_offset,
        )
    return RenderResult(
        render=out.color,
        depth=out.depth,
        opticalflow=out.flow,
        acc=out.acc,
        dominent_idxs=out.idx,
        radii=proj.radius,
        visibility_filter=proj.radius > 0,
        static_num=static_num,
        projected=proj,
        binning_total=binning.total,
    )


def composite_projected_sharded(
    proj: Projected,
    colors: jnp.ndarray,
    flow_dirs: jnp.ndarray,
    cam: RenderCamera,
    *,
    bg: jnp.ndarray,
    far: float,
    capacity: int,
    axis_name: str,
    axis_size: int,
    chunk: int = 128,
    max_per_tile: int | None = None,
    static_num: int = 0,
    backend: str | None = None,
    track_idx: bool = False,
) -> RenderResult:
    """Tile-sharded compositing (SURVEY §2.3 SP-analog): inside shard_map,
    each device along `axis_name` owns a contiguous slab of tile ROWS and
    runs the whole binning -> sort -> pack -> composite chain on ONLY its
    slab's instances (per-axis rects give per-slab counts cheaply, so each
    device expands into a capacity/axis_size local buffer — VERDICT r2 #3:
    binning/pack no longer replicate). The per-tile pixel blocks are then
    all-gathered to assemble the frame.

    binning_total is the WORST-SLAB effective total — axis_size * max local
    total — so the caller's `total <= capacity` overflow gate is exactly
    "every slab fits its local buffer", and the trainer's growth policy
    sizes capacity to fit the fullest slab."""
    grid_x, grid_y = tile_grid(cam.width, cam.height)
    num_tiles = grid_x * grid_y
    assert capacity % axis_size == 0, (
        f"sharded capacity {capacity} must divide over axis_size {axis_size}")
    cap_local = capacity // axis_size
    rows_per = -(-grid_y // axis_size)
    local = rows_per * grid_x
    row0 = jax.lax.axis_index(axis_name) * rows_per
    t0 = row0 * grid_x
    binning = binning_ops.bin_gaussians(
        proj, grid_x, grid_y, cap_local,
        exact_depth_sort=_kernel_config().exact_sort,
        row0=row0, rows=rows_per, total_tiles=num_tiles)

    if backend is None:
        backend = _auto_backend(cap_local)

    if backend == "pallas":
        from .ops.rasterize_pallas import composite_tiles, pack_sorted

        aligned = _kernel_config().aligned_layout
        if aligned:
            binning = binning_ops.align_binning(
                binning, proj.xy.shape[0], _kernel_config().g_chunk)
        data, gid = pack_sorted(proj, colors, flow_dirs, binning)
        tids = t0 + jnp.arange(local, dtype=jnp.int32)
        color, accum, tfinal, bestidx = composite_tiles(
            data, bg, gid[None, :], binning.tile_start, binning.tile_stop,
            tids, None, local, grid_x, False, track_idx, aligned,
        )
        acc = jax.lax.stop_gradient(accum[..., 7])
        has = acc > 0.0
        denom = jnp.where(has, acc, 1.0)
        depth = jnp.where(has, accum[..., 3] / denom, far)
        flow_b = jnp.where(has[..., None], accum[..., 4:7] / denom[..., None], 0.0)
        blocks = comp.RenderOutputs(
            color=color, depth=depth, flow=flow_b, acc=acc,
            final_t=tfinal[..., 0], idx=bestidx[..., 0],
        )
    else:
        blocks = rasterize_tiled.composite_slab(
            proj, colors, flow_dirs, binning, grid_x=grid_x, t0=t0,
            num_local=local, starts=binning.tile_start,
            stops=binning.tile_stop, bg=bg,
            max_depth=far, chunk=chunk, max_per_tile=max_per_tile,
        )

    gathered = jax.tree.map(
        lambda a: jax.lax.all_gather(a, axis_name, axis=0, tiled=True), blocks
    )
    total_eff = axis_size * jax.lax.pmax(binning.total, axis_name)

    def timg(arr):
        from .ops import compositing as _comp

        return _comp.tiles_to_image(arr[:num_tiles], grid_y, grid_x,
                                    TILE_Y, TILE_X, cam.height, cam.width)

    return RenderResult(
        render=timg(gathered.color),
        depth=timg(gathered.depth),
        opticalflow=timg(gathered.flow),
        acc=timg(gathered.acc),
        dominent_idxs=timg(gathered.idx),
        radii=proj.radius,
        visibility_filter=proj.radius > 0,
        static_num=static_num,
        projected=proj,
        binning_total=total_eff,
    )


def render(
    cam: RenderCamera,
    model: GaussianModel,
    cfg: ModelConfig,
    *,
    t,
    bg: jnp.ndarray,
    mode: int = 0,
    **kwargs,
) -> RenderResult:
    """Render the model at timestamp t (the reference render() entrypoint)."""
    pts = point_data_at_t(model, cfg, t, mode=mode)
    return render_points(pts, cam, cfg, bg=bg, **kwargs)


def default_capacity(num_points: int, width: int, height: int) -> int:
    """Static instance-buffer bound: generous tiles-per-splat allowance,
    rounded to keep the number of distinct compiled shapes tiny."""
    grid_x, grid_y = tile_grid(width, height)
    cap = max(8 * num_points, 64 * grid_x * grid_y)
    return binning_ops.required_capacity(cap)
