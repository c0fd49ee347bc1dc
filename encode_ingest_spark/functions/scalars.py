"""Scalar transform library — SURVEY.md §2.8 F1-F19 parity, Spark-native.

Every function here returns a ``pyspark.sql.Column`` built from built-in
functions only (JVM-side, whole-stage-codegen'd) — no Python UDFs. Each
cites the reference behavior it reproduces (file:line into
/root/reference). These are the per-field scalar semantics of the
reference's 13 entity mappers, lifted out as a reusable library.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ENCODE_URL_PREFIX = "https://www.encodeproject.org"

# ---------------------------------------------------------------------------
# F1 — ID minting.
# Reference: CommonTransformations.scala:27-44 — regex "/[^/]+/([^/]+)/"
# captures the accession out of an "@id" like "/files/ENCFF123ABC/";
# values not matching the pattern pass through unchanged.
# ---------------------------------------------------------------------------
_ID_RE = r"^/[^/]+/([^/]+)/$"


def transform_id(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    extracted = F.regexp_extract(c, _ID_RE, 1)
    return F.when(extracted != "", extracted).otherwise(c)


# ---------------------------------------------------------------------------
# F2 — composite ID minting.
# Reference: AlignmentActivityTransformations.scala:18-20,
# AnalysisActivityTransformations.scala:19-21 — "${a}_${b}".
# ---------------------------------------------------------------------------
def composite_id(*cols: Column | str) -> Column:
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.concat_ws("_", *cs)


# ---------------------------------------------------------------------------
# F3 — URL prefixing.
# Reference: CommonTransformations.scala:46-56 — prepend the ENCODE host to
# a path; array overload maps over every element.
# ---------------------------------------------------------------------------
def to_encode_url(col: Column | str, prefix: str = ENCODE_URL_PREFIX) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(prefix), c)


def to_encode_url_array(col: Column | str, prefix: str = ENCODE_URL_PREFIX) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.concat(F.lit(prefix), x))


# ---------------------------------------------------------------------------
# F4 — age-bound parsing.
# Reference: CommonTransformations.scala:58-72 and
# DonorTransformationsSpec.scala:32-34,56-59 —
#   "90 or above" -> (90, null); "a-b" -> (a, b); "n" -> (n, n);
#   null -> (null, null).
# ---------------------------------------------------------------------------
def age_lower_bound(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.isNull(), F.lit(None).cast("double"))
        .when(c == "90 or above", F.lit(90.0))
        .when(c.contains("-"), F.split(c, "-").getItem(0).cast("double"))
        .otherwise(c.cast("double"))
    )


def age_upper_bound(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.isNull() | (c == "90 or above"), F.lit(None).cast("double"))
        .when(c.contains("-"), F.split(c, "-").getItem(1).cast("double"))
        .otherwise(c.cast("double"))
    )


# ---------------------------------------------------------------------------
# F5 — audit level → color.
# Reference: CommonTransformations.scala:94-99 — 40→yellow, 50→orange,
# 60→red, else white.
# ---------------------------------------------------------------------------
def audit_color(level: Column | str) -> Column:
    c = F.col(level) if isinstance(level, str) else level
    return (
        F.when(c == 40, F.lit("yellow"))
        .when(c == 50, F.lit("orange"))
        .when(c == 60, F.lit("red"))
        .otherwise(F.lit("white"))
    )


# ---------------------------------------------------------------------------
# F7 — file-type classification.
# Reference: FileTransformations.scala:12-25, FileType.scala:6-14 —
# output_category "raw data"→Sequence, "alignment"→Alignment, else Other.
# ---------------------------------------------------------------------------
def file_type(output_category: Column | str) -> Column:
    c = F.col(output_category) if isinstance(output_category, str) else output_category
    return (
        F.when(c == "raw data", F.lit("Sequence"))
        .when(c == "alignment", F.lit("Alignment"))
        .otherwise(F.lit("Other"))
    )


# ---------------------------------------------------------------------------
# F9 — paired-end decode.
# Reference: FileTransformations.scala:101-109 — "1"→1, "2"→2,
# "1,2"→null (warn), anything else→null (warn).
# ---------------------------------------------------------------------------
def paired_end(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c == "1", F.lit(1).cast("long"))
        .when(c == "2", F.lit(2).cast("long"))
        .otherwise(F.lit(None).cast("long"))
    )


# ---------------------------------------------------------------------------
# F10 — paired-run flag.
# Reference: FileTransformations.scala:46-47,145 — run_type equality.
# ---------------------------------------------------------------------------
def paired_run(run_type: Column | str) -> Column:
    c = F.col(run_type) if isinstance(run_type, str) else run_type
    return c == F.lit("paired-ended")


# ---------------------------------------------------------------------------
# F11 — strand-specificity decode.
# Reference: LibraryTransformations.scala:13-16,21,35-36 —
#   libraryLayout = strand_specificity.isDefined;
#   pairedEndType = strand_specificity filtered of the legacy placeholder
#   "strand-specific" (records submitted before forward/reverse existed).
# ---------------------------------------------------------------------------
STRAND_PLACEHOLDER = "strand-specific"


def library_layout(strand_specificity: Column | str) -> Column:
    c = (
        F.col(strand_specificity)
        if isinstance(strand_specificity, str)
        else strand_specificity
    )
    return c.isNotNull()


def paired_end_type(strand_specificity: Column | str) -> Column:
    c = (
        F.col(strand_specificity)
        if isinstance(strand_specificity, str)
        else strand_specificity
    )
    return F.when(c == STRAND_PLACEHOLDER, F.lit(None)).otherwise(c)


# ---------------------------------------------------------------------------
# F15 — classification-conditional column routing.
# Reference: BiosampleTransformations.scala:53-60 (anatomical site),
# 83-93 (apriori cell type / cell line): the source column feeding an
# output field depends on the record's classification value.
# ---------------------------------------------------------------------------
def classification_route(
    classification: Column | str,
    routes: list[tuple[tuple[str, ...], Column]],
    default: Column | None = None,
) -> Column:
    """Route: first (values, column) entry whose values contain the
    classification wins; no match → ``default`` (null)."""
    c = F.col(classification) if isinstance(classification, str) else classification
    expr = None
    for values, col in routes:
        cond = c.isin(*values)
        expr = F.when(cond, col) if expr is None else expr.when(cond, col)
    return expr.otherwise(default) if default is not None else expr


# ---------------------------------------------------------------------------
# F13 — date → midnight-UTC timestamp.
# Reference: BiosampleTransformations.scala:75-77 —
# LocalDate.atStartOfDay().atOffset(UTC).
# ---------------------------------------------------------------------------
def date_to_midnight_ts(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(F.to_date(c))


# ---------------------------------------------------------------------------
# F16 — cons/prepend to list: url :: dbxrefs.
# Reference: DonorTransformations.scala:27-29, FileTransformations.scala:114-116.
# ---------------------------------------------------------------------------
def cons_array(head: Column, tail: Column | str) -> Column:
    t = F.col(tail) if isinstance(tail, str) else tail
    return F.concat(F.array(head), F.coalesce(t, F.array()))


# ---------------------------------------------------------------------------
# F17 — path/string surgery.
# Reference: FileBackfillGenerator.scala:66-72 (slug + basename),
# hack/create_file_submission_from_manifest_use_accession.sh:17-32
# (scheme swap).
# ---------------------------------------------------------------------------
def slugify(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(c, r"\s+", "-"))


def basename(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, "/", -1)


def s3_to_gs(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"^s3://", "gs://")


# ---------------------------------------------------------------------------
# F18 — warn-and-null on multi-value.
# Reference: BiosampleTransformations.scala:115-128,
# AnalysisActivityTransformations.scala:57-84 — a list with >1 distinct
# value yields null (the reference logs a warning; in Spark the count of
# affected rows is an aggregate the caller can compute), a single value
# passes through.
# ---------------------------------------------------------------------------
def single_or_null(arr: Column | str) -> Column:
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.when(F.size(c) == 1, F.element_at(c, 1)).otherwise(F.lit(None))


# ---------------------------------------------------------------------------
# P1 — sentinel scrub ("unknown" → null).
# Reference: CommonTransformations.scala:11-25, applied at every read
# (TransformationPipelineBuilder.scala:30-31).
# ---------------------------------------------------------------------------
def scrub_unknown(col: Column | str, sentinel: str = "unknown") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == sentinel, F.lit(None)).otherwise(c)


def scrub_unknown_all(df, columns: list[str] | None = None, sentinel: str = "unknown"):
    """Apply scrub_unknown to every string column (or the given subset)."""
    targets = columns or [c for c, t in df.dtypes if t == "string"]
    return df.select(
        *[
            scrub_unknown(c, sentinel).alias(c) if c in targets else F.col(c)
            for c in df.columns
        ]
    )
