"""Sharded SPMD training step over a (data, gauss) mesh.

The reference trains on exactly one GPU (SURVEY.md §2.3); this module is the
TPU-native scaling design:

  * data axis  — each device differentiates a different camera; parameter
    gradients are `psum`'d over ICI before the (replicated) RAdam step.
  * gauss axis — the per-Gaussian preprocess (temporal interpolation, cov3D,
    EWA projection, SH) runs on a 1/G slice of the splats per device and the
    projected quantities are `all_gather`'d before binning/compositing; the
    backward of that all_gather is automatically the reduce-scatter transpose.

Per-Gaussian statistic increments are all-gathered over `data` and folded
in camera order, so N cameras per step accumulate exactly like N sequential
reference iterations (train.py:199-215).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.optimizer import RAdamState, group_lrs, mask_grads, radam_update, scrub_nan
from ..models.state import GaussianModel
from ..models.temporal import point_data_at_t
from ..ops.losses import l1_loss, psnr, ssim
from ..rendering import (
    RenderCamera,
    composite_projected,
    composite_projected_sharded,
    preprocess_points,
)
from ..train.step import StepStatics, _regularizers, _update_stat_accumulators


class ShardedStepOutputs(NamedTuple):
    model: GaussianModel
    opt_state: RAdamState
    loss: jnp.ndarray  # [] mean over data shards
    psnr: jnp.ndarray
    binning_total: jnp.ndarray  # [] int32 max true instance count over shards
    nan_flag: jnp.ndarray  # [] bool — see train/step.py StepOutputs.nan_flag


def _sliced_loss(params, mean2d_offset, flow_dirs, model, cam: RenderCamera,
                 gt, t, bg, iteration, statics: StepStatics, gauss_size: int,
                 tile_shard: bool = True):
    """Loss for one camera with the preprocess sharded over 'gauss' and (when
    tile_shard) the tile grid sharded over the same axis for compositing.

    mean2d_offset/flow_dirs are LOCAL slices [P/G, 3]; their grads come back
    per-shard (no psum needed — each shard owns its rows)."""
    model = model._replace(params=params)
    cfg = statics.cfg
    pts = point_data_at_t(model, cfg, t, mode=statics.mode)

    p_total = pts.means3d.shape[0]
    shard = p_total // gauss_size
    gi = jax.lax.axis_index("gauss")
    start = gi * shard
    take = lambda a: jax.lax.dynamic_slice_in_dim(a, start, shard, axis=0)
    local = pts._replace(
        means3d=take(pts.means3d),
        rotations=take(pts.rotations),
        scales=take(pts.scales),
        opacity=take(pts.opacity),
        features=take(pts.features),
        mask=take(pts.mask),
    )

    proj_l, colors_l = preprocess_points(
        local, cam, cfg, near=cfg.near, far=cfg.far, mean2d_offset=mean2d_offset
    )
    # Gather the full projected set over ICI (transpose: reduce-scatter).
    gather = lambda a: jax.lax.all_gather(a, "gauss", axis=0, tiled=True)
    proj = jax.tree.map(gather, proj_l)
    colors = gather(colors_l)
    flow_full = gather(flow_dirs)

    if tile_shard and gauss_size > 1:
        res = composite_projected_sharded(
            proj, colors, flow_full, cam,
            bg=bg, far=cfg.far, capacity=statics.capacity,
            axis_name="gauss", axis_size=gauss_size, chunk=statics.chunk,
            max_per_tile=statics.max_per_tile, static_num=pts.static_num,
        )
    else:
        res = composite_projected(
            proj, colors, flow_full, cam,
            bg=bg, far=cfg.far, capacity=statics.capacity, chunk=statics.chunk,
            max_per_tile=statics.max_per_tile, static_num=pts.static_num,
        )

    opt = statics.opt
    img = res.render
    ll1 = l1_loss(img, gt)
    loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1.0 - ssim(img, gt))
    if opt.l1_accum:
        l1_map = jnp.abs(img - gt).mean(axis=-1)
        ssim_map = ssim(img, gt, reduce=False).mean(axis=-1)
        hook = jax.lax.stop_gradient(jnp.stack([res.acc, l1_map, ssim_map], -1))
        loss = loss + (res.opticalflow * hook).sum()
    # Every gauss shard recomputes the (full-array) regularizers, and their
    # grads are psum'd over 'gauss' — pre-scale by 1/G so the total matches a
    # single evaluation. (Render-loss grads are per-slice, so the psum over
    # 'gauss' is exactly the reassembled whole there.) The unscaled value is
    # reported via aux so the displayed loss matches the reference.
    reg = _regularizers(params, model, opt, cfg, iteration)
    loss_display = loss + reg
    loss = loss + reg / gauss_size
    return loss, (res, ll1, loss_display)


def make_sharded_train_step(statics: StepStatics, mesh: Mesh):
    """Build a jitted shard_map train step.

    Inputs per call: model/opt_state replicated; cam leaves and gt/t stacked
    with a leading [data] axis (one camera per data shard)."""
    data_size = mesh.shape["data"]
    gauss_size = mesh.shape["gauss"]

    def per_device(model, opt_state, cam, gt, t, bg, iteration):
        # local slices arrive with leading dim 1 on data-sharded args
        cam = jax.tree.map(lambda a: a[0], cam)
        gt = gt[0]
        t = t[0]

        pts_cap = (
            model.static_capacity
            + (model.dynamic_capacity if statics.mode == 0 else 0)
            if statics.mode != 2
            else model.dynamic_capacity
        )
        shard = pts_cap // gauss_size
        m2d_local = jnp.zeros((shard, 3), jnp.float32)
        flow_local = jnp.zeros((shard, 3), jnp.float32)

        grad_fn = jax.value_and_grad(_sliced_loss, argnums=(0, 1, 2), has_aux=True)
        (loss, (res, ll1, loss_display)), (pgrads, m2d_g, flow_g) = grad_fn(
            model.params, m2d_local, flow_local, model, cam, gt, t, bg,
            iteration, statics, gauss_size,
        )

        # Parameter grads: psum over 'gauss' reassembles the sliced backward;
        # pmean over 'data' averages the per-camera gradients (standard DP —
        # at data=1 this is exactly the reference's single-camera gradient).
        #
        # Overlap with the backward sweep (SURVEY §2.3 / §5.8): the psums are
        # issued per-PARAMETER here, so each collective's data dependency is
        # only that parameter's gradient — XLA's latency-hiding scheduler is
        # free to start a parameter's psum while the remaining backward
        # (notably the serial per-tile rasterizer VJP, which produces the
        # instance-gradient segment reduction feeding xyz/scaling/rotation
        # LAST) is still running; the early-ready gradients (regularizer
        # terms, SH/color chains) can be in flight on ICI meanwhile. Nothing
        # in this graph forces a barrier before the optimizer consumes them.
        # One-chip bound: the whole shard_map program structure costs 6.6%
        # vs the plain step at mesh (1,1) (BASELINE.md round-5,
        # tools/tpu_probes/_tpu_shardoverhead.py); actual compute/collective
        # overlap on a real multi-chip mesh is unmeasurable in this image.
        pgrads = jax.tree.map(
            lambda g: jax.lax.pmean(jax.lax.psum(g, "gauss"), "data"), pgrads
        )
        loss_mean = jax.lax.pmean(loss_display, "data")
        psnr_mean = jax.lax.pmean(psnr(res.render, gt), "data")

        # Overflow gate: with slab-local binning the composite already
        # reports the worst-slab effective total (identical across gauss
        # shards after its internal pmax); take the max over data shards so
        # every device agrees on whether ANY camera overflowed its instance
        # buffer. On overflow the whole update is a no-op (see train/step.py).
        binning_total = jax.lax.pmax(
            jax.lax.pmax(res.binning_total, "data"), "gauss"
        )
        ok = binning_total <= statics.capacity
        old_model, old_opt_state = model, opt_state

        pgrads = scrub_nan(mask_grads(pgrads, model))
        lrs = group_lrs(statics.opt, statics.spatial_lr_scale, iteration)
        new_params, new_opt_state = radam_update(model.params, pgrads, opt_state, lrs)
        model = model._replace(params=new_params)

        # Stat side-channel: reassemble full per-Gaussian arrays (gather over
        # gauss), then fold one camera at a time in data order — identical to
        # sequential reference iterations.
        # m2d/flow grads are per-shard rows -> gather to full; radii/visibility
        # came out of the compositing stage, which already ran on the gathered
        # whole, so they are full-size on every device.
        g_all = lambda a: jax.lax.all_gather(a, "gauss", axis=0, tiled=True)
        m2d_full = g_all(m2d_g)
        flow_full = g_all(flow_g)
        res_g = res
        per_cam = jax.lax.all_gather(
            (res_g.radii, res_g.visibility_filter, m2d_full, flow_full, t), "data"
        )
        radii_all, vis_all, m2d_all, flow_all, t_all = per_cam
        for d in range(data_size):
            res_d = res_g._replace(radii=radii_all[d], visibility_filter=vis_all[d])
            model = _update_stat_accumulators(
                model, res_d, m2d_all[d], flow_all[d], t_all[d], iteration,
                statics.opt,
            )

        sel = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), new, old
        )
        out_model = sel(model, old_model)
        nan_flag = jnp.isnan(out_model.params["xyz"]).any()
        if old_model.dynamic_capacity:
            nan_flag |= jnp.isnan(out_model.params["motion_xyz"]).any()
        return ShardedStepOutputs(
            model=out_model,
            opt_state=sel(new_opt_state, old_opt_state),
            loss=loss_mean,
            psnr=psnr_mean,
            binning_total=binning_total,
            nan_flag=nan_flag,
        )

    replicated = P()
    data_first = P("data")
    mapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(replicated, replicated, data_first, data_first, data_first,
                  replicated, replicated),
        out_specs=replicated,
        check_vma=False,
    )
    return jax.jit(mapped)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_data(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P("data"))
    return jax.device_put(tree, sharding)
