"""Graph-shaped entity split over repo-file records (FIXTURES.md §5).

The reference fans raw entity streams out into 16 linked tables with
shared conventions — regex-minted ``<entity>_id`` primary keys, ``label``,
repeated ``xref``, repeated FK-link arrays
(schema/src/main/jade-tables/*.table.json; split pattern
TransformationPipelineBuilder.scala:120-134,403-425,633-647). This module
re-expresses that over the CDC engine's repo-file base table:

    repo_files ──┬── file            (≈ file.table.json)
                 ├── repo            (≈ biosample: container entity)
                 ├── commit_activity (≈ experimentactivity: composite id,
                 │                      used/generated FK arrays)
                 └── dataset         (singleton row,
                                       DatasetTransformations.scala:10-39)

All splits are projections/aggregations of ONE cached scan — the
reference's "collection of tiny processing trees sharing raw inputs"
(ARCHITECTURE.md:36-41) — and every FK array is checked by the anti-join
integrity operator (hack/check_for_missing_files.sh:16-27 analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import composite_id, to_encode_url
from ..operators import anti_join_missing_fks

FILE_URL_PREFIX = "https://example.org/repo-files"


def file_id_expr() -> F.Column:
    """PK minting: stable id from the (repo, path, commit) natural key —
    the engine-side analogue of accession minting
    (CommonTransformations.scala:27-44)."""
    return F.concat_ws("@", F.concat_ws(":", F.col("repo"), F.col("path")), F.col("commit"))


def split_files(repo_files: DataFrame, extra: dict[str, F.Column] | None = None) -> DataFrame:
    """File entity: one row per repo-file record. ``extra`` appends
    caller columns (e.g. the CDC envelope for incremental refresh)."""
    fid = file_id_expr()
    extras = [c.alias(n) for n, c in (extra or {}).items()]
    return repo_files.select(
        fid.alias("file_id"),
        F.substring_index(F.col("path"), "/", -1).alias("label"),
        F.col("lang").alias("file_format"),
        F.array(
            to_encode_url(
                F.concat(F.lit("/"), fid), prefix=FILE_URL_PREFIX
            )
        ).alias("xref"),
        F.length("content").cast("long").alias("size_bytes"),
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        F.col("repo").alias("repo_id"),
        composite_id(F.col("repo"), F.col("commit")).alias("commit_activity_id"),
        F.lit("ENCODE-REPO").alias("part_of_dataset_id"),
        *extras,
    )


def split_repos(repo_files: DataFrame) -> DataFrame:
    """Repo (container) entity — per-repo rollup with set-style arrays
    (the A5 in-record set-dedup shape, BiosampleTransformations.scala:
    22-28)."""
    return repo_files.groupBy(F.col("repo").alias("repo_id")).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sort_array(F.collect_set("lang")).alias("languages"),
        F.countDistinct("commit").alias("n_commits"),
        F.lit("ENCODE-REPO").alias("part_of_dataset_id"),
    )


def split_commit_activities(repo_files: DataFrame) -> DataFrame:
    """Activity entity: composite id `{repo}_{commit}`
    (AlignmentActivityTransformations.scala:18-20 pattern), generated
    file FK array collected per activity (A1 groupByKey-collect)."""
    fid = file_id_expr()
    return (
        repo_files.withColumn("_fid", fid)
        .groupBy(
            composite_id(F.col("repo"), F.col("commit")).alias("activity_id"),
            F.col("repo").alias("repo_id"),
            F.col("commit").alias("commit_sha"),
        )
        .agg(
            F.sort_array(F.collect_set("_fid")).alias("generated_file_id"),
            F.sort_array(F.collect_set("lang")).alias("used_language"),
            F.count(F.lit(1)).alias("n_files"),
        )
        .withColumn("activity_type", F.lit("Commit"))
    )


def dataset_row(spark: SparkSession) -> DataFrame:
    """Singleton dataset row — the static-constants table pattern
    (DatasetTransformations.scala:10-39)."""
    return spark.createDataFrame(
        [
            (
                "ENCODE-REPO",
                "Repo-file CDC mirror",
                ["https://example.org/repo-files/"],
                "source-code repository snapshot lake",
                "Terra Interoperability Model",
                ["Code"],
            )
        ],
        "dataset_id string, label string, xref array<string>, "
        "title string, conforms_to string, data_modality array<string>",
    )


def split_all(repo_files: DataFrame, spark: SparkSession | None = None) -> dict[str, DataFrame]:
    """Run the full fan-out off one cached scan."""
    spark = spark or repo_files.sparkSession
    base = repo_files.persist()
    out = {
        "file": split_files(base),
        "repo": split_repos(base),
        "commit_activity": split_commit_activities(base),
        "dataset": dataset_row(spark),
    }
    return out


def referential_integrity_report(tables: dict[str, DataFrame]) -> dict[str, int]:
    """Orphan counts per FK edge — translation of the reference's
    post-ingest QC (hack/check_for_missing_files.sh:16-47). All zeros on
    a consistent split."""
    file_t = tables["file"]
    repo_t = tables["repo"]
    act_t = tables["commit_activity"]
    ds_t = tables["dataset"]
    report = {}
    report["commit_activity.generated_file_id -> file"] = anti_join_missing_fks(
        act_t, "generated_file_id", file_t, "file_id"
    ).count()
    report["file.repo_id -> repo"] = (
        file_t.select(F.col("repo_id").alias("fk"))
        .distinct()
        .join(repo_t, F.col("fk") == repo_t["repo_id"], "left_anti")
        .count()
    )
    report["file.commit_activity_id -> commit_activity"] = (
        file_t.select(F.col("commit_activity_id").alias("fk"))
        .distinct()
        .join(act_t, F.col("fk") == act_t["activity_id"], "left_anti")
        .count()
    )
    report["file.part_of_dataset_id -> dataset"] = (
        file_t.select(F.col("part_of_dataset_id").alias("fk"))
        .distinct()
        .join(ds_t, F.col("fk") == ds_t["dataset_id"], "left_anti")
        .count()
    )
    return report
