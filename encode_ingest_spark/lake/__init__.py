"""Snapshot-versioned parquet lake-table format with CDC MERGE."""

from .datasource import (
    CHANGE_COL,
    LAKE_CHANGES_FORMAT,
    LAKE_FORMAT,
    LakeChangesDataSource,
    LakeDataSource,
    register_lake_sources,
)
from .cluster import parse_cluster_spec, rewrite_clustered
from .dml import DmlResult, MergeApplyResult, delete_where, merge_apply, update_where
from .evolution import SchemaEvolutionError, align_to_schema, merge_schemas
from .follow import ChangeFeedFollower, FollowResult
from .merge import (
    EVENT_SEQ_COL,
    OP_COL,
    ConstraintViolationError,
    MergeResult,
    merge_into,
    merge_local_delta,
    merge_small_batch,
    table_constraints,
)
from .table import (
    BUCKET_COL,
    DELETED_COL,
    SEQ_COL,
    CommitConflictError,
    DataFile,
    LakeTable,
    Manifest,
    bucket_expr,
)
from .txn import TableGroup

__all__ = [
    "LakeTable",
    "TableGroup",
    "ChangeFeedFollower",
    "FollowResult",
    "Manifest",
    "DataFile",
    "CommitConflictError",
    "SchemaEvolutionError",
    "MergeResult",
    "delete_where",
    "update_where",
    "merge_apply",
    "DmlResult",
    "MergeApplyResult",
    "merge_into",
    "merge_local_delta",
    "merge_small_batch",
    "ConstraintViolationError",
    "table_constraints",
    "rewrite_clustered",
    "parse_cluster_spec",
    "merge_schemas",
    "align_to_schema",
    "bucket_expr",
    "BUCKET_COL",
    "DELETED_COL",
    "SEQ_COL",
    "OP_COL",
    "EVENT_SEQ_COL",
    "register_lake_sources",
    "LakeDataSource",
    "LakeChangesDataSource",
    "LAKE_FORMAT",
    "LAKE_CHANGES_FORMAT",
    "CHANGE_COL",
]
