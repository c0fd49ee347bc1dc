"""Change-data-capture pipeline: generator, dedup, batch/stream apply."""

from .dedup import dedupe_latest, dedupe_latest_window
from .generator import repo_file_events, repo_files

__all__ = [
    "dedupe_latest",
    "dedupe_latest_window",
    "repo_files",
    "repo_file_events",
]
