"""RAdam optimizer with per-parameter-group learning rates + LR schedules.

Matches torch.optim.RAdam (as used at c_gaussian_model.py:449: betas
(0.9, 0.999), eps 1e-8, no weight decay) step-for-step so the full training
recipe reproduces the reference trajectory. State is a plain pytree
{name: {mu, nu}} + a scalar step, which makes the reference's optimizer-state
surgery on densify/prune (c_gaussian_model.py:672-787) a trivial masked
gather on the state arrays (models/density.py).

Per-group LRs mirror training_setup (c_gaussian_model.py:430-447); xyz and
motion_xyz follow the log-lerp exponential schedule of
utils/general_utils.py:56-89.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import OptimizationConfig
from .state import GaussianModel

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-8


class RAdamState(NamedTuple):
    mu: dict  # name -> first-moment array (same shape as param)
    nu: dict  # name -> second-moment array
    step: jnp.ndarray  # [] int32 — number of optimizer steps taken


def init_state(params: dict) -> RAdamState:
    zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
    return RAdamState(mu=zeros, nu={k: jnp.zeros_like(v) for k, v in params.items()},
                      step=jnp.zeros((), jnp.int32))


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Log-linear LR decay (general_utils.py:56-89), traced-step friendly."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros(())
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return jnp.where(step < 0, 0.0, delay_rate * log_lerp)


def group_lrs(opt: OptimizationConfig, spatial_lr_scale: float, iteration) -> dict:
    """LR per param-group name at `iteration` (traced scalar ok).

    Matches training_setup + update_learning_rate
    (c_gaussian_model.py:430-471)."""
    return {
        "xyz": expon_lr(
            iteration,
            opt.position_lr_init * spatial_lr_scale,
            opt.position_lr_final * spatial_lr_scale,
            lr_delay_mult=opt.position_lr_delay_mult,
            max_steps=opt.position_lr_max_steps,
        ),
        "f_dc": opt.feature_lr,
        "f_rest": opt.feature_lr / 20.0,
        "opacity": opt.opacity_lr,
        "scaling": opt.scaling_lr,
        "rotation": opt.rotation_lr,
        "xyz_disp": opt.disp_lr,
        "motion_xyz": expon_lr(
            iteration,
            opt.dynamic_position_lr_init * spatial_lr_scale,
            opt.dynamic_position_lr_final * spatial_lr_scale,
            lr_delay_mult=opt.dynamic_position_lr_delay_mult,
            max_steps=opt.dynamic_position_lr_max_steps,
        ),
        # cubic_diff tangent keyframes follow the motion_xyz schedule (the
        # reference defines no group for them — its cubic_diff is untrainable)
        "motion_xyz_d": expon_lr(
            iteration,
            opt.dynamic_position_lr_init * spatial_lr_scale,
            opt.dynamic_position_lr_final * spatial_lr_scale,
            lr_delay_mult=opt.dynamic_position_lr_delay_mult,
            max_steps=opt.dynamic_position_lr_max_steps,
        ),
        "motion_f_dc": opt.feature_motion_lr,
        "motion_f_rest": opt.feature_motion_lr / 20.0,
        "motion_scaling": opt.scaling_lr,
        "motion_opacity": opt.opacity_motion_lr,
        "motion_opacity_center": opt.opacity_motion_center_lr,
        "motion_opacity_var": opt.opacity_motion_var_lr,
        "motion_rotation": opt.rotation_motion_lr,
    }


def radam_update(params: dict, grads: dict, state: RAdamState, lrs: dict):
    """One RAdam step. Returns (new_params, new_state).

    The rectification branch depends only on the scalar step count, so the
    jnp.where select compiles to a cheap predicated blend."""
    t = (state.step + 1).astype(jnp.float32)
    beta2_t = BETA2**t
    bias1 = 1.0 - BETA1**t
    bias2 = 1.0 - beta2_t
    rho_inf = 2.0 / (1.0 - BETA2) - 1.0
    rho_t = rho_inf - 2.0 * t * beta2_t / bias2
    rect = jnp.sqrt(
        jnp.maximum(
            ((rho_t - 4.0) * (rho_t - 2.0) * rho_inf)
            / ((rho_inf - 4.0) * (rho_inf - 2.0) * jnp.maximum(rho_t, 1e-6)),
            0.0,
        )
    )
    rectified = rho_t > 5.0

    new_params, new_mu, new_nu = {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        mu = BETA1 * state.mu[k] + (1.0 - BETA1) * g
        nu = BETA2 * state.nu[k] + (1.0 - BETA2) * (g * g)
        m_hat = mu / bias1
        adaptive = jnp.sqrt(bias2) / (jnp.sqrt(nu) + EPS)
        step_rect = m_hat * rect * adaptive
        update = jnp.where(rectified, step_rect, m_hat)
        new_params[k] = p - lrs[k] * update
        new_mu[k] = mu
        new_nu[k] = nu
    return new_params, RAdamState(mu=new_mu, nu=new_nu, step=state.step + 1)


def mask_grads(grads: dict, model: GaussianModel) -> dict:
    """Zero gradients of inactive capacity rows so padded splats never drift
    and their optimizer state stays zero (the reference has no padded rows;
    this keeps the padded arrays an exact superset of its dense ones)."""
    out = {}
    sm = model.static_mask
    dm = model.dynamic_mask
    for k, g in grads.items():
        m = dm if k.startswith("motion_") else sm
        mb = m.reshape((-1,) + (1,) * (g.ndim - 1))
        out[k] = jnp.where(mb, g, 0.0)  # where, not *: kills NaN/inf on padding
    return out


def scrub_nan(grads: dict) -> dict:
    """nan_to_num on the temporal-opacity variance grad (train.py:246-248)."""
    out = dict(grads)
    out["motion_opacity_var"] = jnp.nan_to_num(grads["motion_opacity_var"])
    return out
