"""Host runtime: profiling, step timing, multi-host initialization."""

from .profiling import StepTimer, trace  # noqa: F401
