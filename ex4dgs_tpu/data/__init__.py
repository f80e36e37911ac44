"""Scene/data layer: COLMAP parsing, dataset readers, cameras, orchestration."""

from .cameras import Camera  # noqa: F401
from .scene import Scene  # noqa: F401
