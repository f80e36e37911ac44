"""Model IO: PLY import/export and training checkpoints."""

from .ply import read_basic_ply, write_basic_ply  # noqa: F401
