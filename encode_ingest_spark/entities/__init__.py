"""Per-entity mapping transforms (reference §2.10 parity)."""

from .documents import (
    RAW_DONOR_SCHEMA,
    transform_donor,
    transform_donor_pandas,
)
from .repo_entities import (
    dataset_row,
    referential_integrity_report,
    split_all,
    split_commit_activities,
    split_files,
    split_repos,
)

__all__ = [
    "transform_donor",
    "transform_donor_pandas",
    "RAW_DONOR_SCHEMA",
    "split_files",
    "split_repos",
    "split_commit_activities",
    "dataset_row",
    "split_all",
    "referential_integrity_report",
]
