"""Entity transforms: donor mapper fidelity (reference spec fixtures),
graph-shaped repo-file split + referential integrity."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from encode_ingest_spark.cdc import repo_files
from encode_ingest_spark.entities import (
    RAW_DONOR_SCHEMA,
    referential_integrity_report,
    split_all,
    transform_donor,
    transform_donor_pandas,
)

# The canonical donor fixture (DonorTransformationsSpec.scala:10-23 /
# FIXTURES.md §4) plus the spec's edge-case variants.
DONORS = [
    (
        "/human-donors/ENCDO845WKR/", "ENCDO845WKR", ["GEO:SAMN123"],
        "2020-12-24T18:00:00.111222+00:00", "/organisms/human/",
        "/awards/xyz_award/", "/labs/example-lab/",
        ["/human-donors/ENCDO000AAA/"], ["/human-donors/ENCDO000BBB/"],
        "/human-donors/ENCDO000CCC/", "/users/123-abc/", "30-33",
        "year", "adult", "female", ["European"],
    ),
    (
        "/human-donors/ENCDO999OLD/", "ENCDO999OLD", None,
        "2020-01-01T00:00:00+00:00", "/organisms/human/",
        "/awards/a/", "/labs/l/", None, None, None, "/users/u/",
        "90 or above", "year", None, None, None,
    ),
]


@pytest.fixture()
def raw_donors(spark):
    return spark.createDataFrame(DONORS, RAW_DONOR_SCHEMA)


def test_transform_donor_fidelity(spark, raw_donors):
    organisms = spark.createDataFrame(
        [("/organisms/human/", "Homo sapiens")], "`@id` string, scientific_name string"
    )
    out = {r.donor_id: r for r in transform_donor(raw_donors, organisms).collect()}

    d = out["ENCDO845WKR"]
    assert d.label == "ENCDO845WKR"
    assert d.xref == [
        "https://www.encodeproject.org/human-donors/ENCDO845WKR/",
        "GEO:SAMN123",
    ]
    assert (d.age_lower_bound, d.age_upper_bound) == (30.0, 33.0)
    assert d.organism_type == "Homo sapiens"
    assert d.part_of_dataset_id == "ENCODE"
    assert d.award == "https://www.encodeproject.org/awards/xyz_award/"
    assert sorted(d.sibling_donor_id) == ["ENCDO000BBB", "ENCDO000CCC"]  # twin ∪ siblings
    assert d.parent_donor_id == ["ENCDO000AAA"]

    o = out["ENCDO999OLD"]
    assert (o.age_lower_bound, o.age_upper_bound) == (90.0, None)
    assert o.sibling_donor_id == []
    assert o.reported_ethnicity == []


def test_donor_pandas_path_matches_native(spark, raw_donors):
    """The Arrow-vectorized mapper and the native-column mapper must
    agree on the shared fields."""
    native = {
        r.donor_id: r
        for r in transform_donor(raw_donors)
        .select("donor_id", "label", "xref", "age_lower_bound", "age_upper_bound",
                F.sort_array("sibling_donor_id").alias("sib"))
        .collect()
    }
    vec = {
        r.donor_id: r
        for r in transform_donor_pandas(raw_donors)
        .select("donor_id", "label", "xref", "age_lower_bound", "age_upper_bound",
                F.sort_array("sibling_donor_id").alias("sib"))
        .collect()
    }
    assert native.keys() == vec.keys()
    for k in native:
        assert native[k] == vec[k], k


def test_repo_entity_split_and_integrity(spark):
    base = repo_files(spark, n_rows=2000, seed=42)
    tables = split_all(base, spark)

    n_files = tables["file"].count()
    assert n_files == 2000
    assert tables["dataset"].count() == 1

    # ids: composite activity ids and minted file ids are well-formed
    f = tables["file"].first()
    assert "@" in f.file_id and f.commit_activity_id.count("_") >= 1
    assert f.content_sha256 is not None and len(f.content_sha256) == 64

    # repo rollup covers every file's repo
    assert tables["repo"].count() == tables["file"].select("repo_id").distinct().count()

    # referential integrity: zero orphans on every FK edge
    report = referential_integrity_report(tables)
    assert report == {k: 0 for k in report}, report


def test_split_detects_broken_fk(spark):
    """Sanity that the integrity check actually detects breakage."""
    base = repo_files(spark, n_rows=200, seed=42)
    tables = split_all(base, spark)
    tables["file"] = tables["file"].withColumn(
        "part_of_dataset_id", F.lit("WRONG-DATASET")
    )
    report = referential_integrity_report(tables)
    assert report["file.part_of_dataset_id -> dataset"] == 1
