"""Structured-Streaming CDC tail → exactly-once lake MERGE."""

from .pipeline import CdcStreamPipeline, EVENT_SCHEMA

__all__ = ["CdcStreamPipeline", "EVENT_SCHEMA"]
