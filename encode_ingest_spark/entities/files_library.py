"""File and Library entity mappers — field-for-field parity with
FileTransformations.scala:91-152 and LibraryTransformations.scala:19-52.

Spark-first shape: every per-field rule is a native Column expression
(F1 id minting, F3 url prefixing, F6/F8 modality dictionary, F9 paired-
end decode, F10 paired-run flag, F11 strand-specificity, F16 xref cons,
A4 audit summarization); the file→library linkage (the reference's
side-input scan, TransformationPipelineBuilder.scala:131,382-401 with
the intersect predicate at FileTransformations.scala:66-85) is the J14
broadcast array-overlap join followed by a per-file collect — the
library table is small by contract, so the only shuffle is the per-file
regroup. The reference emits the matched library ids in side-input
iteration order (nondeterministic across runs); we canonicalize with
sort_array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.memo import session_memo
from ..functions import (
    audit_labels,
    audit_level_color,
    cons_array,
    file_data_modality,
    file_type,
    library_layout,
    paired_end,
    paired_end_type,
    paired_run,
    to_encode_url,
    transform_id,
)

# Raw shapes (the fields each mapper reads; FIXTURES.md §4).
RAW_FILE_SCHEMA = (
    "`@id` string, dbxrefs array<string>, date_created string, "
    "output_category string, assay_term_name array<string>, "
    "award string, file_format string, file_format_type string, lab string, "
    "platform string, quality_metrics array<string>, submitted_by string, "
    "read_count bigint, read_length bigint, genome_annotation string, "
    "origin_batches array<string>, donors array<string>, "
    "derived_from array<string>, assembly array<string>, run_type string, "
    "paired_end string, paired_with string, file_size bigint, "
    "md5checksum string, step_run string, "
    "audit map<string, array<struct<category: string, level: bigint>>>"
)

RAW_FULL_LIBRARY_SCHEMA = (
    "`@id` string, dbxrefs array<string>, date_created string, "
    "award string, lab string, queried_RNP_size_range string, "
    "rna_integrity_number double, size_range string, "
    "strand_specificity string, treatments array<string>, "
    "submitted_by string, spikeins_used array<string>, biosample string, "
    "mixed_biosamples array<string>, nucleic_acid_term_id string, "
    "nucleic_acid_term_name string, product_id string, lot_id string"
)


def _empty() -> Column:
    return F.array().cast("array<string>")


def _mint_all(col: Column) -> Column:
    return F.transform(F.coalesce(col, _empty()), lambda x: transform_id(x))


def library_biosamples(libraries: DataFrame) -> Column:
    """``getBiosamplesFromLibrary`` (FileTransformations.scala:50-57):
    the scalar ``biosample`` FK if present, else ``mixed_biosamples``
    (the reference notes it does not support both being set)."""
    return F.when(
        libraries["biosample"].isNotNull(), F.array(libraries["biosample"])
    ).otherwise(F.coalesce(libraries["mixed_biosamples"], _empty()))


def _library_cols() -> list:
    """The library projection, built once per session (functions.memo)."""
    lid = transform_id(F.col("@id"))
    return [
        lid.alias("library_id"),
        lid.alias("label"),
        cons_array(to_encode_url(F.col("@id")), F.col("dbxrefs")).alias("xref"),
        F.to_timestamp("date_created").alias("date_created"),
        to_encode_url(F.col("award")).alias("award"),
        to_encode_url(F.col("lab")).alias("lab"),
        F.col("queried_RNP_size_range").alias("queried_rnp_size_range"),
        F.col("rna_integrity_number").alias("rna_integrity_number"),
        F.col("size_range").alias("size_range"),
        # F11: defined → layout true; the legacy "strand-specific"
        # placeholder is filtered from paired_end_type only
        library_layout("strand_specificity").alias("library_layout"),
        paired_end_type("strand_specificity").alias("paired_end_type"),
        F.transform(
            F.coalesce(F.col("treatments"), _empty()), lambda t: to_encode_url(t)
        ).alias("sample_treatment"),
        to_encode_url(F.col("submitted_by")).alias("submitted_by"),
        _mint_all(F.col("spikeins_used")).alias("used_by"),
        transform_id(F.col("biosample")).alias("uses_sample_biosample_id"),
        F.col("nucleic_acid_term_id").alias("prep_material"),
        F.col("nucleic_acid_term_name").alias("prep_material_name"),
    ]


def transform_library(raw: DataFrame) -> DataFrame:
    """Library mapper — LibraryTransformations.scala:19-52."""
    return raw.select(*session_memo("library_cols", _library_cols))


def file_library_links(files: DataFrame, libraries: DataFrame) -> DataFrame:
    """``computeLibrariesForBiosamples`` (FileTransformations.scala:66-85)
    as a relational plan: J14 broadcast overlap join on
    origin_batches ∩ library-biosamples, then one per-file collect.
    Returns (``@id``, library_id: array<string>, sorted). Files with NULL
    origin_batches get an empty array (the reference's None →
    List.empty); files with origin_batches matching nothing keep an
    empty array too (left join + filtered collect)."""
    f = files.select(F.col("@id").alias("_fid"), "origin_batches")
    lib = F.broadcast(
        libraries.select(
            transform_id(F.col("@id")).alias("_lid"),
            library_biosamples(libraries).alias("_lbio"),
        )
    )
    j = f.join(
        lib, F.arrays_overlap(F.col("origin_batches"), F.col("_lbio")), "left"
    )
    return j.groupBy("_fid").agg(
        F.sort_array(
            F.filter(F.collect_list("_lid"), lambda x: x.isNotNull())
        ).alias("_library_ids")
    )


def _file_cols() -> list:
    """The file projection, built once per session (functions.memo)."""
    fid = transform_id(F.col("@id"))
    return [
        F.col("@id"),
        fid.alias("file_id"),
        fid.alias("label"),
        cons_array(to_encode_url(F.col("@id")), F.col("dbxrefs")).alias("xref"),
        F.to_timestamp("date_created").alias("date_created"),
        # F8: category containing "reference" → Genomic_Assembly, else
        # the F6 dictionary over assay_term_name (unknown → "!" + term)
        file_data_modality("output_category", "assay_term_name").alias(
            "data_modality"
        ),
        audit_labels("audit").alias("audit_labels"),
        audit_level_color("audit").alias("max_audit_flag"),
        to_encode_url(F.col("award")).alias("award"),
        F.col("file_format").alias("file_format"),
        F.col("file_format_type").alias("file_format_type"),
        file_type(F.col("output_category")).alias("file_type"),
        to_encode_url(F.col("lab")).alias("lab"),
        to_encode_url(F.col("platform")).alias("platform"),
        F.coalesce(F.col("quality_metrics"), _empty()).alias("quality_metrics"),
        to_encode_url(F.col("submitted_by")).alias("submitted_by"),
        F.col("read_count").alias("read_count"),
        F.col("read_length").alias("read_length"),
        F.col("genome_annotation").alias("genome_annotation"),
        _mint_all(F.col("origin_batches")).alias("uses_sample_biosample_id"),
        _mint_all(F.col("donors")).alias("donor_id"),
        _mint_all(F.col("derived_from")).alias("derived_from_file_id"),
        F.coalesce(F.col("assembly"), _empty()).alias("reference_assembly"),
        F.lit(None).cast("string").alias("file_ref"),  # fileref handle: always None
        paired_run(F.col("run_type")).alias("library_layout"),
        paired_end(F.col("paired_end")).alias("paired_end_identifier"),
        transform_id(F.col("paired_with")).alias("paired_with_file_id"),
        F.col("file_size").alias("file_size"),
        F.col("md5checksum").alias("file_md5sum"),
    ]


def transform_file(raw: DataFrame, libraries: DataFrame | None = None) -> DataFrame:
    """File mapper — FileTransformations.scala:91-152. ``libraries`` is
    the raw library table (small; broadcast for the J14 linkage);
    omitted → empty library ids (the reference's empty side input)."""
    out = raw.select(*session_memo("file_cols", _file_cols))
    if libraries is not None:
        links = file_library_links(raw, libraries)
        out = (
            out.join(links, out["@id"] == links["_fid"], "left")
            .withColumn("library_id", F.coalesce(F.col("_library_ids"), _empty()))
            .drop("_fid", "_library_ids")
        )
    else:
        out = out.withColumn("library_id", _empty())
    return out.drop("@id")
