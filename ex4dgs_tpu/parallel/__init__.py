"""SPMD parallelism: device mesh construction and sharded train/render steps."""

from .mesh import make_mesh  # noqa: F401
