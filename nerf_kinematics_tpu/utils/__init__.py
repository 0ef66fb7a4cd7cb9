"""Utilities: structured logging, timing."""

from .logging import get_logger, success, progress

__all__ = ["get_logger", "success", "progress"]
