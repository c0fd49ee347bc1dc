"""Structured-Streaming CDC tail → exactly-once lake MERGE."""

from .pipeline import EVENT_SCHEMA, CdcStreamPipeline
from .stateful import compact_changelog

__all__ = ["CdcStreamPipeline", "EVENT_SCHEMA", "compact_changelog"]
