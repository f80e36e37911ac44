"""Configuration dataclasses.

Mirrors the reference's reflection-built argparse groups
(arguments/__init__.py:47-139) with the same defaults, as frozen dataclasses:
hashable, so they can be static arguments to jitted functions. JSON configs
overlay onto these exactly as train.py:398-410 does (unknown keys skipped).
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Scene/model parameters (arguments/__init__.py:47-81)."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    eval: bool = True
    model: str = "cubic"
    loader: str = "neural3dvideo"
    interp_type: str = "cube"
    rot_interp_type: str = "slerp"
    lazy_loader: bool = True
    llffhold: int = 8
    time_interval: int = 5
    time_pad: int = 3
    var_pad: int = 3
    time_pad_type: int = 0  # 0: none, 1: reflect, 2: repeat
    kernel_size: float = 0.1
    start_duration: int = 5
    duration: int = -1
    sample_every: int = 1
    progressive_step: float = 1
    start_timestamp: int = 0
    end_timestamp: int = -1
    near: float = 0.2
    far: float = 300.0

    @property
    def time_shift(self) -> int:
        """time_pad, +interval for the 4-point interpolators needing a lead-in
        keyframe (c_gaussian_model.py:76,119,144)."""
        if self.interp_type in ("cube", "pchip"):
            return self.time_pad + self.time_interval
        return self.time_pad


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Pipeline toggles (arguments/__init__.py:83-88)."""

    convert_shs_python: bool = False
    compute_cov3d_python: bool = False
    debug: bool = False


@dataclasses.dataclass(frozen=True)
class OptimizationConfig:
    """Training schedule and LRs (arguments/__init__.py:90-139)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    dynamic_position_lr_init: float = 0.00016
    dynamic_position_lr_final: float = 0.000016
    dynamic_position_lr_delay_mult: float = 0.01
    dynamic_position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.00001
    disp_lr: float = 0.0001
    feature_motion_lr: float = 0.0025
    rotation_motion_lr: float = 0.001
    opacity_motion_lr: float = 0.05
    opacity_motion_center_lr: float = 0.001
    opacity_motion_var_lr: float = 0.0005
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    l1_accum: bool = True
    densification_interval: int = 200
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    extract_from_iter: int = 500
    densify_until_iter: int = 15_000
    progressive_growing_steps: int = 300
    error_base_prune_steps: int = 20000
    ssim_prune_every: int = 5
    l1_prune_every: int = 5
    make_dynamic_interval: int = 200
    extracton_interval: int = 3000
    extract_every: int = 1
    extract_percentile: float = 0.98
    prune_invisible_interval: int = 6000
    densify_grad_threshold: float = 0.0002
    densify_dgrad_threshold: float = 0.0001
    s_max_ssim: float = 0.6
    s_l1_thres: float = 0.08
    d_max_ssim: float = 0.6
    d_l1_thres: float = 0.08
    static_reg: float = 0.0001
    motion_reg: float = 0.0001
    rot_reg: float = 0.00
    coord_reg: float = 0.00
    random_background: bool = True


def overlay_json(cfg: Any, json_path_or_dict) -> Any:
    """Overlay JSON keys onto a frozen dataclass, skipping unknown keys
    (the reference silently ignores them too, train.py:398-410)."""
    if isinstance(json_path_or_dict, (str,)):
        with open(json_path_or_dict) as f:
            data = json.load(f)
    else:
        data = dict(json_path_or_dict)
    fields = {f.name for f in dataclasses.fields(cfg)}
    updates = {k: v for k, v in data.items() if k in fields}
    return dataclasses.replace(cfg, **updates)


def load_configs(json_path: str) -> tuple[ModelConfig, OptimizationConfig, PipelineConfig]:
    """Build (model, optimization, pipeline) configs from one JSON file, each
    taking the keys it knows."""
    with open(json_path) as f:
        data = json.load(f)
    return (
        overlay_json(ModelConfig(), data),
        overlay_json(OptimizationConfig(), data),
        overlay_json(PipelineConfig(), data),
    )
