"""S6 — JDBC scan with pushed-down predicates + row-mapper projection.

The reference's file-backfill utility reads CloudSQL Postgres with a
pushed-down SQL query and maps each row to a ``FileIngestRequest``
(FileBackfillGenerator.scala:16-74; query at 46-49, row mapper at
62-76). Spark-first, both halves are declarative:

* the scan is ``spark.read.format("jdbc")`` — Spark's JDBC DataSource
  pushes filters and prunes columns INTO the database (`.explain` shows
  ``PushedFilters`` on the JDBCRelation scan, pinned in
  tests/test_jdbc_source.py against an embedded Derby database — the
  sandbox stand-in for Postgres; the URL/driver are the only deployment
  differences);
* the row mapper is a native-column projection (F17 path surgery) —
  no per-row callback.

Partitioned reads: pass ``partition_column/num_partitions/lower/upper``
so a large table scans in parallel range slices — the knob that matters
at real scale (one JDBC cursor cannot feed a cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import slugify


def jdbc_scan(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Declarative JDBC scan. Exactly one of ``table``/``query``.
    Filters/projections applied by the caller push down into the DB."""
    if (table is None) == (query is None):
        raise ValueError("pass exactly one of table= or query=")
    reader = spark.read.format("jdbc").option("url", url)
    if driver:
        reader = reader.option("driver", driver)
    if table:
        reader = reader.option("dbtable", table)
    else:
        reader = reader.option("query", query)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions or 8))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def file_backfill_requests(
    files: DataFrame,
    format_col: str = "file_format",
    type_col: str = "data_type",
    md5_col: str = "md5sum",
    path_col: str = "file_gs_path",
) -> DataFrame:
    """The reference's backfill row mapper
    (FileBackfillGenerator.scala:62-76) as a projection:
    target = /{slug(data_type)}/{format}/{md5}/{basename(cloud_path)}.
    (``substring_index(path, '/', -1)`` == lastIndexOf-drop.)"""
    return files.select(
        F.col(path_col).alias("source_path"),
        F.concat(
            F.lit("/"),
            slugify(F.col(type_col)),
            F.lit("/"),
            F.col(format_col),
            F.lit("/"),
            F.col(md5_col),
            F.lit("/"),
            F.substring_index(F.col(path_col), "/", -1),
        ).alias("target_path"),
    )
