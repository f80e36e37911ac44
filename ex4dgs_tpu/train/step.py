"""One fully-jitted training step: render -> loss -> backward -> RAdam ->
stat accumulators.

Reproduces the reference iteration body (train.py:108-255) with its two
gradient side-channels made explicit instead of hooked:

* densification stats — the reference reads the gradient of a dummy
  `screenspace_points` tensor (train.py:139, gaussian_renderer/__init__.py:28).
  Here `mean2d_offset` (zeros, NDC units) is an explicit argument of the loss
  and we take d(loss)/d(mean2d_offset); same numbers, same 0.5*W scale
  (backward.cu:669-670).
* error backtracking — the reference hooks the flow gradient and *injects*
  [acc, L1err, SSIMerr] as dL/dflow (train.py:148-153), which the rasterizer
  backward turns into per-Gaussian error accumulations. Here we add
  sum(flow_image * stop_grad(hook)) to the loss: the flow path's blend weights
  are stop-gradiented in the compositor, so this contributes gradient ONLY to
  `flow_dirs`, yielding exactly the reference's per-Gaussian
  [visibility-weight, L1, SSIM] accumulations with zero effect on every other
  gradient (and zero effect on the loss value, since flow_dirs == 0).

Everything is traced (timestamp, iteration, duration, SH degree) — a single
compiled graph serves the whole schedule; only capacity growth recompiles.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..kernel_config import KernelConfig
from ..models.config import ModelConfig, OptimizationConfig
from ..models.optimizer import RAdamState, group_lrs, mask_grads, radam_update, scrub_nan
from ..models.state import GaussianModel
from ..ops.losses import l1_loss, psnr, ssim
from ..rendering import RenderCamera, RenderResult, render


@dataclasses.dataclass(frozen=True)
class StepStatics:
    """Hashable static configuration for the jitted step."""

    cfg: ModelConfig
    opt: OptimizationConfig
    spatial_lr_scale: float
    capacity: int  # binning instance-buffer capacity
    chunk: int = 128
    max_per_tile: int | None = None  # per-tile compositing depth bound
    mode: int = 0
    backend: str | None = None  # "pallas" | "jnp" | None = auto
    # Active kernel tuning knobs. Informational for hashing/recompiles: the
    # kernels read the globals kernel_config.configure() installs, so the
    # caller (Trainer) configures before building statics.
    kernel: KernelConfig | None = None


class StepOutputs(NamedTuple):
    # NOTE: the rendered image and radii are deliberately NOT outputs — no
    # caller consumed them, and materializing the untiled HWC image as a
    # graph output costs ~6 ms/step at 1352x1014 (it otherwise fuses into
    # the loss reads; measured in tools/tpu_probes/_tpu_stepover.py:
    # d 88.8 ms -> e 95.1 ms was ENTIRELY output materialization). Render
    # on demand for viewers/debug (render-only path is ~2.3x faster than
    # the step anyway).
    model: GaussianModel
    opt_state: RAdamState
    loss: jnp.ndarray
    ll1: jnp.ndarray
    psnr: jnp.ndarray
    visibility: jnp.ndarray
    binning_total: jnp.ndarray
    # NaN watchdog folded into the step graph: checking on host
    # (isnan(params).any() + a blocking bool download EVERY iteration,
    # trainer.py round-4) cost a full dispatch+sync round trip per step
    # through the remote TPU tunnel. As a step output it rides the same
    # device->host sync the trainer already pays for loss/binning_total.
    nan_flag: jnp.ndarray


def _safe_norm(x, axis=-1):
    """Euclidean norm with torch's subgradient-0 at the origin (jnp's norm has
    a NaN gradient there, which would poison every grad via 0*NaN)."""
    sq = jnp.sum(x * x, axis=axis)
    ok = sq > 0
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, sq, 1.0)), 0.0)


def _regularizers(params, model: GaussianModel, opt: OptimizationConfig,
                  cfg: ModelConfig, iteration):
    """Displacement/motion/rotation regularizers (train.py:156-168), masked to
    active rows and active keyframes (padding must not leak into means)."""
    it = iteration
    loss = 0.0
    smask = model.static_mask
    n_s = jnp.maximum(smask.sum(), 1)
    if opt.static_reg > 0:
        gate = it > opt.progressive_growing_steps + opt.make_dynamic_interval
        disp_term = (
            jnp.log(_safe_norm(params["xyz_disp"]) + 0.001) * smask
        ).sum() / n_s
        loss += jnp.where(gate, opt.static_reg * disp_term, 0.0)

    if model.dynamic_capacity > 0:
        dmask = model.dynamic_mask
        has_dyn = dmask.any()
        n_d = jnp.maximum(dmask.sum(), 1)
        kf = jnp.arange(model.keyframe_capacity, dtype=jnp.int32)
        kf_mask = (kf < model.keyframe_num)[None, :]  # [1, K]
        gate = (
            it > opt.progressive_growing_steps * opt.extract_every + opt.make_dynamic_interval
        ) & has_dyn
        if opt.motion_reg > 0:
            # Distance of every keyframe from the first (train.py:160-161).
            diff = params["motion_xyz"][:, :1] - params["motion_xyz"][:, 1:]
            dnorm = _safe_norm(diff) * kf_mask[:, 1:] * dmask[:, None]
            denom = jnp.maximum((kf_mask[:, 1:] * dmask[:, None]).sum(), 1)
            loss += jnp.where(gate, opt.motion_reg * dnorm.sum() / denom, 0.0)
        if opt.rot_reg > 0:
            r1 = params["motion_rotation"][:, 1:]
            r2 = params["motion_rotation"][:, :-1]
            n1 = jnp.maximum(jnp.linalg.norm(r1, axis=-1), 1e-6)
            n2 = jnp.maximum(jnp.linalg.norm(r2, axis=-1), 1e-6)
            ri = 1.0 - (r1 * r2).sum(-1) / n1 / n2
            m = kf_mask[:, 1:] * dmask[:, None]
            denom = jnp.maximum(m.sum(), 1)
            loss += jnp.where(gate, opt.rot_reg * (ri * m).sum() / denom, 0.0)
    return loss


def _loss_and_aux(params, mean2d_offset, flow_dirs, model, cam, gt, t, bg,
                  iteration, statics: StepStatics):
    model = model._replace(params=params)
    res = render(
        cam,
        model,
        statics.cfg,
        t=t,
        bg=bg,
        mode=statics.mode,
        capacity=statics.capacity,
        chunk=statics.chunk,
        max_per_tile=statics.max_per_tile,
        mean2d_offset=mean2d_offset,
        flow_dirs=flow_dirs,
        backend=statics.backend,
        track_idx=False,  # train.py never consumes dominent_idxs
    )
    img = res.render
    opt = statics.opt
    ll1 = l1_loss(img, gt)
    loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1.0 - ssim(img, gt))

    if opt.l1_accum:
        l1_map = jnp.abs(img - gt).mean(axis=-1)
        ssim_map = ssim(img, gt, reduce=False).mean(axis=-1)
        hook = jax.lax.stop_gradient(
            jnp.stack([res.acc, l1_map, ssim_map], axis=-1)
        )  # [H, W, 3]
        # Value is 0 (flow_dirs == 0 -> flow image == 0); gradient injects the
        # hook as the flow cotangent (train.py:148-153).
        loss = loss + (res.opticalflow * hook).sum()

    loss = loss + _regularizers(params, model, opt, statics.cfg, iteration)
    return loss, (res, ll1)


def _update_stat_accumulators(model: GaussianModel, res: RenderResult,
                              m2d_grad, flow_grad, t, iteration,
                              opt: OptimizationConfig):
    """max/min radii, positional-gradient and L1/SSIM error accumulators
    (train.py:199-215 -> c_gaussian_model.py:1095-1145)."""
    stats = dict(model.stats)
    ps = model.static_capacity
    vis = res.visibility_filter
    radii = res.radii.astype(jnp.float32)
    densify_on = iteration < opt.densify_until_iter

    def upd(prefix, sl, mask_rows):
        v = vis[sl] & mask_rows
        r = radii[sl]
        mx = "max_radii2D" if prefix == "" else "motion_max_radii2D"
        mn = "min_radii2D" if prefix == "" else "motion_min_radii2D"
        ga = "xyz_gradient_accum" if prefix == "" else "motion_xyz_gradient_accum"
        dn = "denom" if prefix == "" else "motion_denom"
        stats[mx] = jnp.where(densify_on & v, jnp.maximum(stats[mx], r), stats[mx])
        g2 = jnp.linalg.norm(m2d_grad[sl, :2], axis=-1)
        stats[ga] = stats[ga] + jnp.where(densify_on & v, g2, 0.0)
        stats[dn] = stats[dn] + jnp.where(densify_on & v, 1.0, 0.0)

        if opt.l1_accum:
            err = flow_grad[sl]  # [n, 3] = [vis-weight, L1, SSIM]
            err_vis = err[:, 0] > 0
            # mark_prune_stats runs every iteration (train.py:199-200)
            stats[mn] = jnp.where(
                err_vis & mask_rows, jnp.minimum(stats[mn], r), stats[mn]
            )
            l1e = err[:, 1] / jnp.maximum(err[:, 0], 1e-4)
            ssime = err[:, 2] / jnp.maximum(err[:, 0], 1e-4)
            ea = "xyz_error_accum" if prefix == "" else "motion_xyz_error_mean"
            em = "xyz_error_min" if prefix == "" else "motion_xyz_error_min"
            et = (
                "xyz_error_min_timestamp"
                if prefix == ""
                else "motion_xyz_error_min_timestamp"
            )
            es = "xyz_ssim_error_accum" if prefix == "" else "motion_xyz_ssim_error_accum"
            ed = "error_denom" if prefix == "" else "motion_error_denom"
            upd_ok = densify_on & v
            better = (stats[em] > l1e) & (err[:, 0] > 0.01) & upd_ok
            stats[ea] = stats[ea] + jnp.where(upd_ok, l1e, 0.0)
            stats[et] = jnp.where(better, t, stats[et])
            stats[em] = jnp.where(better, l1e, stats[em])
            stats[es] = stats[es] + jnp.where(upd_ok, ssime, 0.0)
            stats[ed] = stats[ed] + jnp.where(upd_ok & (err[:, 0] > 0), 1.0, 0.0)

    upd("", slice(0, ps), model.static_mask)
    if model.dynamic_capacity > 0:
        upd("motion_", slice(ps, None), model.dynamic_mask)
    return model._replace(stats=stats)


@functools.partial(jax.jit, static_argnames=("statics",))
def train_step(
    model: GaussianModel,
    opt_state: RAdamState,
    cam: RenderCamera,
    gt: jnp.ndarray,  # [H, W, 3]
    t: jnp.ndarray,  # [] timestamp
    bg: jnp.ndarray,  # [3]
    iteration: jnp.ndarray,  # [] int32
    statics: StepStatics,
) -> StepOutputs:
    ps, pd = model.static_capacity, model.dynamic_capacity
    n_total = ps + (pd if statics.mode == 0 else 0) if statics.mode != 2 else pd
    mean2d_offset = jnp.zeros((n_total, 3), jnp.float32)
    flow_dirs = jnp.zeros((n_total, 3), jnp.float32)

    grad_fn = jax.value_and_grad(_loss_and_aux, argnums=(0, 1, 2), has_aux=True)
    (loss, (res, ll1)), (pgrads, m2d_grad, flow_grad) = grad_fn(
        model.params, mean2d_offset, flow_dirs, model, cam, gt, t, bg, iteration,
        statics,
    )

    pgrads = scrub_nan(mask_grads(pgrads, model))
    lrs = group_lrs(statics.opt, statics.spatial_lr_scale, iteration)
    new_params, new_opt_state = radam_update(model.params, pgrads, opt_state, lrs)
    new_model = model._replace(params=new_params)

    new_model = _update_stat_accumulators(
        new_model, res, m2d_grad, flow_grad, t, iteration, statics.opt
    )

    # Binning overflow => the image/gradient were computed from a truncated
    # instance list (ops/binning.py drops slots beyond capacity). The reference
    # never trains on truncated lists (it sizes buffers to the true
    # num_rendered, rasterizer_impl.cu:298-299), so make the whole update a
    # no-op; the trainer detects `binning_total > capacity`, grows capacity,
    # and re-runs the same camera.
    ok = res.binning_total <= statics.capacity
    sel = lambda new, old: jax.tree.map(
        lambda a, b: jnp.where(ok, a, b), new, old
    )
    out_model = sel(new_model, model)
    out_opt_state = sel(new_opt_state, opt_state)

    nan_flag = jnp.isnan(out_model.params["xyz"]).any()
    if model.dynamic_capacity:
        nan_flag |= jnp.isnan(out_model.params["motion_xyz"]).any()

    return StepOutputs(
        model=out_model,
        opt_state=out_opt_state,
        loss=loss,
        ll1=ll1,
        psnr=psnr(res.render, gt),
        visibility=res.visibility_filter,
        binning_total=res.binning_total,
        nan_flag=nan_flag,
    )
