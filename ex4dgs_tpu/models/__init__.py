"""Gaussian model state, temporal queries, optimizer, and density control."""

from .config import ModelConfig, OptimizationConfig, PipelineConfig  # noqa: F401
from .state import GaussianModel, create_from_pcd, empty_model  # noqa: F401
