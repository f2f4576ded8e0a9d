"""Minimal continuous-batching serving loop (scheduler + paged KV allocator)."""

from .engine import Engine, Request  # noqa: F401
from .pd import PDOrchestrator  # noqa: F401
