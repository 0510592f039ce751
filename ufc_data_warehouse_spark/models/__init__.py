"""Model registry population — importing registers every model."""

from . import analytics, core, staging, title_reigns  # noqa: F401

from ..registry import REGISTRY

__all__ = ["REGISTRY", "analytics", "core", "staging", "title_reigns"]
