"""Unit tests for the scalar function library, mirroring the reference's
DonorTransformationsSpec fixture style (exact expected values, edge cases).
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from encode_ingest_spark.functions import (
    age_lower_bound,
    age_upper_bound,
    audit_labels,
    audit_level_color,
    basename,
    composite_id,
    cons_array,
    file_data_modality,
    file_type,
    modality_expr,
    modality_join,
    paired_end,
    paired_run,
    s3_to_gs,
    scrub_unknown_all,
    single_or_null,
    slugify,
    to_encode_url,
    transform_id,
)


def one(spark, expr, **cols):
    """Evaluate an expression against a single literal row."""
    df = spark.createDataFrame([Row(**cols)])
    return df.select(expr.alias("out")).collect()[0].out


# --- F1: ID minting (CommonTransformations.scala:27-44) ---
@pytest.mark.parametrize(
    "raw,want",
    [
        ("/human-donors/ENCDO845WKR/", "ENCDO845WKR"),
        ("/files/ENCFF123ABC/", "ENCFF123ABC"),
        ("no-slashes", "no-slashes"),  # non-matching passes through
    ],
)
def test_transform_id(spark, raw, want):
    assert one(spark, transform_id("x"), x=raw) == want


# --- F2 ---
def test_composite_id(spark):
    assert one(spark, composite_id("a", "b"), a="ENCFF1", b="ENCSR2") == "ENCFF1_ENCSR2"


# --- F3 (CommonTransformations.scala:46-56) ---
def test_to_encode_url(spark):
    assert (
        one(spark, to_encode_url("x"), x="/human-donors/ENCDO845WKR/")
        == "https://www.encodeproject.org/human-donors/ENCDO845WKR/"
    )


# --- F4: age bounds (CommonTransformations.scala:58-72; spec cases
#     DonorTransformationsSpec.scala:32-34,56-59) ---
@pytest.mark.parametrize(
    "raw,lo,hi",
    [
        ("90 or above", 90.0, None),
        ("30-33", 30.0, 33.0),
        ("7", 7.0, 7.0),
        (None, None, None),
    ],
)
def test_age_bounds(spark, raw, lo, hi):
    df = spark.createDataFrame([(raw,)], "age string")
    got = df.select(
        age_lower_bound("age").alias("lo"), age_upper_bound("age").alias("hi")
    ).collect()[0]
    assert got.lo == lo and got.hi == hi


# --- F5/A4: audit summarization (CommonTransformations.scala:74-102) ---
def test_audit_summarization(spark):
    df = spark.createDataFrame(
        [
            (
                "with",
                {
                    "ERROR": [Row(category="dup", level=60), Row(category="missing", level=60)],
                    "WARN": [Row(category="b-cat", level=40)],
                },
            ),
            ("without", None),
        ],
        "name string, audit map<string, array<struct<category:string, level:long>>>",
    )
    got = {
        r.name: r
        for r in df.select(
            "name",
            audit_level_color("audit").alias("color"),
            audit_labels("audit").alias("labels"),
        ).collect()
    }
    assert got["with"].color == "red"
    assert got["with"].labels == ["b-cat", "dup", "missing"]  # distinct + sorted
    assert got["without"].color is None
    assert got["without"].labels == []


@pytest.mark.parametrize(
    "level,color", [(40, "yellow"), (50, "orange"), (60, "red"), (10, "white")]
)
def test_audit_colors(spark, level, color):
    df = spark.createDataFrame(
        [({"X": [Row(category="c", level=level)]},)],
        "audit map<string, array<struct<category:string, level:long>>>",
    )
    assert df.select(audit_level_color("audit").alias("c")).collect()[0].c == color


# --- F6: modality dictionary (AssayActivityTransformations.scala:56-164) ---
@pytest.mark.parametrize(
    "term,want",
    [
        ("RNA-seq", "Transcriptomic_NonTargeted"),
        ("Hi-C", "Epigenomic_3D Contact Maps"),
        ("TF ChIP-seq", "Epigenomic_DNABinding_TranscriptomeFactorLocation"),
        ("WGS", "Genomic_Genotyping_Whole Genomic"),
        ("made-up assay", "!made-up assay"),  # fallback: bang-prefixed
        ("FACS CRISPR screen", "!FACS CRISPR screen"),  # explicit bang case
    ],
)
def test_modality_expr(spark, term, want):
    assert one(spark, modality_expr("t"), t=term) == want


def test_modality_join_matches_expr(spark):
    terms = ["RNA-seq", "eCLIP", "nope", "WGBS", "4C"]
    df = spark.createDataFrame([(t,) for t in terms], "t string")
    via_expr = {r.t: r.m for r in df.select("t", modality_expr("t").alias("m")).collect()}
    via_join = {r.t: r.dm for r in modality_join(df, "t", "dm").collect()}
    assert via_expr == via_join


# --- F7 (FileTransformations.scala:12-25) ---
@pytest.mark.parametrize(
    "cat,want", [("raw data", "Sequence"), ("alignment", "Alignment"), ("signal", "Other")]
)
def test_file_type(spark, cat, want):
    assert one(spark, file_type("c"), c=cat) == want


# --- F8 (FileTransformations.scala:27-44) ---
def test_file_data_modality(spark):
    df = spark.createDataFrame(
        [("reference genome", ["RNA-seq"]), ("signal", ["RNA-seq", "nope"])],
        "cat string, terms array<string>",
    )
    got = {r.cat: r.m for r in df.select("cat", file_data_modality("cat", "terms").alias("m")).collect()}
    assert got["reference genome"] == ["Genomic_Assembly"]
    assert got["signal"] == ["Transcriptomic_NonTargeted", "!nope"]


# --- F9 (FileTransformations.scala:101-109) ---
@pytest.mark.parametrize("raw,want", [("1", 1), ("2", 2), ("1,2", None), ("x", None)])
def test_paired_end(spark, raw, want):
    assert one(spark, paired_end("p"), p=raw) == want


# --- F10 ---
def test_paired_run(spark):
    assert one(spark, paired_run("r"), r="paired-ended") is True
    assert one(spark, paired_run("r"), r="single-ended") is False


# --- F16 (DonorTransformations.scala:27-29) ---
def test_cons_array(spark):
    df = spark.createDataFrame([(["a", "b"],), (None,)], "dbxrefs array<string>")
    got = df.select(cons_array(F.lit("url"), "dbxrefs").alias("x")).collect()
    assert got[0].x == ["url", "a", "b"]
    assert got[1].x == ["url"]  # null tail coalesced to empty


# --- F17 (FileBackfillGenerator.scala:66-72) ---
def test_path_surgery(spark):
    assert one(spark, slugify("x"), x="My File  Name") == "my-file-name"
    assert one(spark, basename("x"), x="a/b/c.txt") == "c.txt"
    assert one(spark, s3_to_gs("x"), x="s3://bucket/k") == "gs://bucket/k"


# --- F18 (BiosampleTransformations.scala:115-128) ---
def test_single_or_null(spark):
    df = spark.createDataFrame([(["only"],), (["a", "b"],)], "v array<string>")
    got = [r.x for r in df.select(single_or_null("v").alias("x")).collect()]
    assert got == ["only", None]


# --- P1: sentinel scrub (CommonTransformations.scala:11-25) ---
def test_scrub_unknown_all(spark):
    df = spark.createDataFrame(
        [("unknown", "keep", 5)], "a string, b string, n long"
    )
    row = scrub_unknown_all(df).collect()[0]
    assert row.a is None and row.b == "keep" and row.n == 5


# --- F11 (LibraryTransformations.scala:13-16,21,35-36) ---
def test_strand_specificity_decode(spark):
    from encode_ingest_spark.functions import library_layout, paired_end_type

    df = spark.createDataFrame(
        [("forward",), ("strand-specific",), (None,)], "s string"
    )
    got = df.select(
        library_layout("s").alias("layout"), paired_end_type("s").alias("pet")
    ).collect()
    # defined → layout true; the legacy placeholder is filtered from
    # paired_end_type but still counts as "strand specific" for layout
    assert (got[0].layout, got[0].pet) == (True, "forward")
    assert (got[1].layout, got[1].pet) == (True, None)
    assert (got[2].layout, got[2].pet) == (False, None)


# --- F15 (BiosampleTransformations.scala:53-60,83-93) ---
def test_classification_route(spark):
    from encode_ingest_spark.functions import classification_route

    df = spark.createDataFrame(
        [("tissue", "T", "O"), ("cell line", "T", "O"), ("other", "T", "O"),
         (None, "T", "O")],
        "cls string, a string, b string",
    )
    route = classification_route(
        "cls",
        [(("tissue", "organoid"), F.col("a")),
         (("cell line",), F.col("b"))],
        default=F.lit("dflt"),
    )
    got = [r.x for r in df.select(route.alias("x")).collect()]
    assert got == ["T", "O", "dflt", "dflt"]
