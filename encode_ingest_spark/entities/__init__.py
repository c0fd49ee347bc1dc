"""Per-entity mapping transforms (reference §2.10 parity)."""

from .biosample import (
    LIFE_STAGE_ORGANISMS,
    RAW_BIOSAMPLE_SCHEMA,
    RAW_BIOSAMPLE_TYPE_SCHEMA,
    RAW_GENETIC_MOD_SCHEMA,
    RAW_LIBRARY_SCHEMA,
    grouped_genetic_mods,
    grouped_libraries,
    transform_biosample,
)
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
    "transform_biosample",
    "grouped_libraries",
    "grouped_genetic_mods",
    "RAW_BIOSAMPLE_SCHEMA",
    "RAW_BIOSAMPLE_TYPE_SCHEMA",
    "RAW_LIBRARY_SCHEMA",
    "RAW_GENETIC_MOD_SCHEMA",
    "LIFE_STAGE_ORGANISMS",
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
