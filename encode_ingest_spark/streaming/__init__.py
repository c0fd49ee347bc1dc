"""Structured-Streaming CDC tail → exactly-once lake MERGE."""

from .pipeline import (
    EVENT_SCHEMA,
    UNIVERSE_EVENT_SCHEMA,
    CdcStreamPipeline,
    UniverseStreamPipeline,
)
from .stateful import compact_changelog

__all__ = [
    "CdcStreamPipeline",
    "UniverseStreamPipeline",
    "EVENT_SCHEMA",
    "UNIVERSE_EVENT_SCHEMA",
    "compact_changelog",
]
