"""Raw-document entity transforms — the reference's per-entity mappers
(SURVEY.md §2.10) re-expressed over DataFrames of semi-structured rows.

The reference maps one ``upack.Msg`` at a time
(e.g. DonorTransformations.scala:13-54). Here the raw document is a row
with struct/array columns; everything regular is native Column
expressions (codegen'd), and ``transform_donor_pandas`` demonstrates the
Arrow-vectorized ``applyInPandas``/``mapInPandas`` escape hatch for the
genuinely irregular residue — with a test pinning both paths equal.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import (
    age_lower_bound,
    age_upper_bound,
    cons_array,
    to_encode_url,
    transform_id,
)
from ..functions.memo import session_memo

# Raw donor schema, mirroring the unit-fixture shape the reference tests
# with (DonorTransformationsSpec.scala:10-23; FIXTURES.md §4).
RAW_DONOR_SCHEMA = (
    "`@id` string, accession string, dbxrefs array<string>, "
    "date_created string, organism string, award string, lab string, "
    "parents array<string>, siblings array<string>, twin string, "
    "submitted_by string, age string, age_units string, life_stage string, "
    "sex string, ethnicity array<string>"
)


def _donor_cols() -> list:
    """The donor projection, built once per session (see functions.memo)."""
    donor_id = transform_id(F.col("@id"))
    return [
        donor_id.alias("donor_id"),
        donor_id.alias("label"),
        cons_array(to_encode_url(F.col("@id")), F.col("dbxrefs")).alias("xref"),
        F.to_timestamp("date_created").alias("date_created"),
        age_lower_bound("age").alias("age_lower_bound"),
        age_upper_bound("age").alias("age_upper_bound"),
        F.col("age_units").alias("age_age_unit"),
        F.col("life_stage").alias("age_life_stage"),
        F.coalesce(F.col("ethnicity"), F.array().cast("array<string>")).alias(
            "reported_ethnicity"
        ),
        F.col("organism").alias("_organism_fk"),
        F.col("sex").alias("phenotypic_sex"),
        F.lit("ENCODE").alias("part_of_dataset_id"),
        to_encode_url(F.col("award")).alias("award"),
        to_encode_url(F.col("lab")).alias("lab"),
        F.array_distinct(
            F.concat(
                F.when(F.col("twin").isNotNull(), F.array(transform_id(F.col("twin"))))
                .otherwise(F.array().cast("array<string>")),
                F.transform(
                    F.coalesce(F.col("siblings"), F.array().cast("array<string>")),
                    lambda s: transform_id(s),
                ),
            )
        ).alias("sibling_donor_id"),
        F.transform(
            F.coalesce(F.col("parents"), F.array().cast("array<string>")),
            lambda p: transform_id(p),
        ).alias("parent_donor_id"),
        to_encode_url(F.col("submitted_by")).alias("submitted_by"),
    ]


def transform_donor(
    raw: DataFrame,
    organisms: DataFrame | None = None,
    extra: dict[str, F.Column] | None = None,
) -> DataFrame:
    """Donor mapper — field-for-field parity with
    DonorTransformations.scala:13-54:

    * donor_id/label minted from @id (transformId)
    * xref = encode-url(@id) :: dbxrefs
    * age bounds per CommonTransformations.computeAgeLowerAndUpperbounds
    * sibling_donor_id = distinct(twin :: siblings), minted
    * organism_type = organism.scientific_name via left join (J6 —
      organisms are tiny → broadcast), falling back to the raw FK string
    * part_of_dataset_id = 'ENCODE' constant

    ``extra`` appends caller columns computed over the RAW rows (e.g.
    the CDC envelope when the mapper runs as an incremental-refresh
    ProjectionSpec over a raw-donor changelog).
    """
    extras = [c.alias(n) for n, c in (extra or {}).items()]
    out = raw.select(*extras, *session_memo("donor_cols", _donor_cols))
    if organisms is not None:
        org = F.broadcast(
            organisms.select(
                F.col("@id").alias("_org_id"),
                F.col("scientific_name").alias("_org_name"),
            )
        )
        out = (
            out.join(org, out["_organism_fk"] == org["_org_id"], "left")
            .withColumn(
                "organism_type", F.coalesce(F.col("_org_name"), F.col("_organism_fk"))
            )
            .drop("_org_id", "_org_name")
        )
    else:
        out = out.withColumn("organism_type", F.col("_organism_fk"))
    return out.drop("_organism_fk")


DONOR_PANDAS_SCHEMA = (
    "donor_id string, label string, xref array<string>, "
    "age_lower_bound double, age_upper_bound double, "
    "sibling_donor_id array<string>"
)


def transform_donor_pandas(raw: DataFrame) -> DataFrame:
    """The same core donor fields via mapInPandas — the vectorized-UDF
    formulation for document shapes native expressions can't reach
    (dynamic field names, deep optional nesting). Kernel is closure-
    self-contained (no module refs) so it pickles by value."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        import pandas as _pd

        id_re = re.compile(r"^/[^/]+/([^/]+)/$")

        def mint(v):
            if v is None:
                return None
            m = id_re.match(v)
            return m.group(1) if m else v

        def bounds(age):
            if age is None:
                return (None, None)
            if age == "90 or above":
                return (90.0, None)
            if "-" in age:
                lo, hi = age.split("-", 1)
                return (float(lo), float(hi))
            return (float(age), float(age))

        for pdf in batches:
            ids = pdf["@id"].map(mint)
            b = pdf["age"].map(bounds)
            sib = [
                sorted(
                    set(
                        ([mint(t)] if t is not None else [])
                        + [mint(s) for s in (ss if ss is not None else [])]
                    )
                )
                for t, ss in zip(pdf["twin"], pdf["siblings"])
            ]
            yield _pd.DataFrame(
                {
                    "donor_id": ids,
                    "label": ids,
                    "xref": [
                        ["https://www.encodeproject.org" + i] + list(d or [])
                        for i, d in zip(pdf["@id"], pdf["dbxrefs"])
                    ],
                    "age_lower_bound": [x[0] for x in b],
                    "age_upper_bound": [x[1] for x in b],
                    "sibling_donor_id": sib,
                }
            )

    return raw.mapInPandas(kernel, DONOR_PANDAS_SCHEMA)
