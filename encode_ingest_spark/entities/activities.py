"""The remaining per-entity mappers — with biosample.py, documents.py
(donor) and files_library.py this completes 13/13 parity with the
reference's ``*Transformations.scala`` set:

* Antibody            — AntibodyTransformations.scala:11-41
* SampleTreatment     — SampleTreatmentActivityTransformations.scala:13-37
* LibraryPreparation  — LibraryPreparationActivityTransformations.scala:14-33
* AlignmentActivity   — AlignmentActivityTransformations.scala:16-40
* SequencingActivity  — SequencingActivityTransformations.scala:17-48
* ReferenceFileSet    — ReferenceFileSetTransformations.scala:11-63
* ExperimentActivity  — ExperimentActivityTransformations.scala:12-60
* AssayActivity       — AssayActivityTransformations.scala:12-40
* AnalysisActivity    — AnalysisActivityTransformations.scala:14-52
* StepActivity        — StepActivityTransformations.scala:11-51

Spark-first conventions shared with the other entity modules: every
"Iterable[Msg]" argument becomes an aggregate-then-join DataFrame (J2);
``headOption``/``toSet.toList`` over unordered iterables are
canonicalized deterministically (min / sort_array) — the reference's
output order for those is side-input iteration order, which is not
stable run-to-run even in Beam.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.memo import session_memo
from ..functions import (
    audit_labels,
    audit_level_color,
    cons_array,
    date_to_midnight_ts,
    modality_expr,
    modality_expr_array,
    to_encode_url,
    transform_id,
)
from .files_library import file_library_links


def _empty() -> Column:
    return F.array().cast("array<string>")


def _mint_all(col: Column) -> Column:
    return F.transform(F.coalesce(col, _empty()), lambda x: transform_id(x))


def _antibody_cols() -> list:
    """Static projection, built once per session (functions.memo)."""
    aid = transform_id(F.col("@id"))
    return [
        aid.alias("antibody_id"),
        aid.alias("label"),
        cons_array(to_encode_url(F.col("@id")), F.col("dbxrefs")).alias("xref"),
        F.to_timestamp("date_created").alias("date_created"),
        to_encode_url(F.col("source")).alias("source"),
        F.col("clonality").alias("clonality"),
        to_encode_url(F.col("host_organism")).alias("host_organism"),
        to_encode_url(F.col("award")).alias("award"),
        F.col("isotype").alias("isotype"),
        to_encode_url(F.col("lab")).alias("lab"),
        F.col("lot_id").alias("lot"),
        F.col("product_id").alias("part_number"),
        F.coalesce(F.col("purifications"), _empty()).alias("purification_methods"),
        F.col("@id").alias("_aid"),
        ]


def _modality_from_term(term: Column) -> Column:
    """getDataModalityFromTerm: Option[term] → 0/1-element modality list
    (AssayActivityTransformations.scala:42-44)."""
    return F.when(term.isNotNull(), F.array(modality_expr(term))).otherwise(_empty())


# ---------------------------------------------------------------------------
# Antibody (J4: targets grouped by antibody)
# ---------------------------------------------------------------------------
RAW_ANTIBODY_SCHEMA = (
    "`@id` string, dbxrefs array<string>, date_created string, source string, "
    "clonality string, host_organism string, award string, isotype string, "
    "lab string, lot_id string, product_id string, purifications array<string>"
)

#: joined targets: one row per (antibody @id, target) pair
RAW_TARGET_SCHEMA = "antibody string, organism string, label string"


def _treatment_cols() -> list:
    """Static projection, built once per session (functions.memo)."""
    tid = transform_id(F.col("@id"))
    return [
        tid.alias("sampletreatmentactivity_id"),
        tid.alias("label"),
        cons_array(to_encode_url(F.col("@id")), F.col("dbxrefs")).alias("xref"),
        F.to_timestamp("date_created").alias("date_created"),
        F.lit("SampleTreatment").alias("activity_type"),
        _empty().alias("data_modality"),
        F.col("treatment_type").alias("sample_treatment_method"),
        F.col("treatment_term_id").alias("treatment_term_id"),
        F.col("treatment_term_name").alias("treatment_term_name"),
        F.col("amount").alias("amount"),
        F.col("amount_units").alias("amount_units"),
        F.col("duration").alias("duration"),
        F.col("duration_units").alias("duration_units"),
        F.col("purpose").alias("sample_treatment_type"),
        ]


def transform_antibody(raw: DataFrame, targets: DataFrame | None = None) -> DataFrame:
    """AntibodyTransformations.scala:11-41. ``target`` = the label of a
    HUMAN-organism joined target (reference: .filter(organism ==
    '/organisms/human/').headOption — headOption over an unordered
    iterable; canonicalized to min(label))."""
    out = raw.select(*session_memo("antibody_cols", _antibody_cols))
    if targets is not None:
        human = (
            targets.filter(F.col("organism") == "/organisms/human/")
            .groupBy(F.col("antibody").alias("_t_ab"))
            .agg(F.min("label").alias("target"))
        )
        out = out.join(human, out["_aid"] == F.col("_t_ab"), "left").drop("_t_ab")
    else:
        out = out.withColumn("target", F.lit(None).cast("string"))
    return out.drop("_aid")


# ---------------------------------------------------------------------------
# SampleTreatmentActivity (row-wise)
# ---------------------------------------------------------------------------
RAW_TREATMENT_SCHEMA = (
    "`@id` string, dbxrefs array<string>, date_created string, "
    "treatment_type string, treatment_term_id string, treatment_term_name "
    "string, amount double, amount_units string, duration double, "
    "duration_units string, purpose string"
)


def _libprep_cols() -> list:
    """Static projection, built once per session (functions.memo)."""
    lid = transform_id(F.col("@id"))
    return [
        F.col("@id").alias("_lid_raw"),
        lid.alias("librarypreparationactivity_id"),
        lid.alias("label"),
        F.to_timestamp("date_created").alias("date_created"),
        to_encode_url(F.col("lab")).alias("lab"),
        F.array(lid).alias("generated_library_id"),
        F.array(transform_id(F.col("biosample"))).alias("uses_sample_biosample_id"),
        F.lit("LibraryPreparation").alias("activity_type"),
        ]


def transform_sample_treatment(raw: DataFrame) -> DataFrame:
    """SampleTreatmentActivityTransformations.scala:13-37."""
    return raw.select(*session_memo("treatment_cols", _treatment_cols))


# ---------------------------------------------------------------------------
# LibraryPreparationActivity (⟕ experiment for modality)
# ---------------------------------------------------------------------------
def _alignment_cols() -> list:
    """Static projection, built once per session (functions.memo)."""
    fid = transform_id(F.col("@id"))
    dataset = transform_id(F.col("dataset"))
    aid = F.concat(fid, F.lit("_"), dataset)
    return [
        aid.alias("alignmentactivity_id"),
        aid.alias("label"),
        F.array(to_encode_url(F.col("@id"))).alias("xref"),
        F.to_timestamp("date_created").alias("date_created"),
        F.lit("Alignment").alias("activity_type"),
        modality_expr_array(F.coalesce(F.col("assay_term_name"), _empty())).alias(
            "data_modality"
        ),
        F.array(fid).alias("generated_file_id"),
        F.when(F.col("assembly").isNotNull(), F.array(F.col("assembly")))
        .otherwise(_empty())
        .alias("reference_assembly"),
        _mint_all(F.col("derived_from")).alias("used_file_id"),
        to_encode_url(F.col("lab")).alias("lab"),
        ]


def transform_library_preparation(
    libraries: DataFrame, experiments_by_library: DataFrame | None = None
) -> DataFrame:
    """LibraryPreparationActivityTransformations.scala:14-33.
    ``experiments_by_library``: (library @id, assay_term_name) — the J9
    library⟕experiment linkage, pre-resolved."""
    out = libraries.select(*session_memo("libprep_cols", _libprep_cols))
    if experiments_by_library is not None:
        exp = experiments_by_library.select(
            F.col("library").alias("_e_lib"),
            _modality_from_term(F.col("assay_term_name")).alias("data_modality"),
        )
        out = (
            out.join(exp, out["_lid_raw"] == F.col("_e_lib"), "left")
            .withColumn("data_modality", F.coalesce(F.col("data_modality"), _empty()))
            .drop("_e_lib")
        )
    else:
        out = out.withColumn("data_modality", _empty())
    return out.drop("_lid_raw")


# ---------------------------------------------------------------------------
# Alignment / Sequencing activities (row-wise over alignment/raw files)
# ---------------------------------------------------------------------------
def _sequencing_cols() -> list:
    """Static projection, built once per session (functions.memo)."""
    fid = transform_id(F.col("@id"))
    dataset = F.coalesce(transform_id(F.col("dataset")), F.lit(""))
    sid = F.concat(fid, F.lit("_"), dataset)
    return [
        "@id",
        sid.alias("sequencingactivity_id"),
        sid.alias("label"),
        F.array(to_encode_url(F.col("@id"))).alias("xref"),
        F.to_timestamp("date_created").alias("date_created"),
        F.lit("Sequencing").alias("activity_type"),
        modality_expr_array(F.coalesce(F.col("assay_term_name"), _empty())).alias(
            "data_modality"
        ),
        F.array(fid).alias("generated_file_id"),
        F.array(dataset).alias("associated_with"),
        _mint_all(F.col("origin_batches")).alias("used_biosample_id"),
        to_encode_url(F.col("lab")).alias("lab"),
        to_encode_url(F.col("platform")).alias("platform"),
        _empty().alias("assay_type"),
        ]


def transform_alignment_activity(raw_files: DataFrame) -> DataFrame:
    """AlignmentActivityTransformations.scala:16-40 — id is the F2
    composite ``{fileId}_{dataset}`` (dataset REQUIRED here, unlike
    sequencing's empty-string fallback)."""
    return raw_files.select(*session_memo("alignment_cols", _alignment_cols))


def _refset_cols() -> list:
    """Static projection, built once per session (functions.memo)."""
    rid = transform_id(F.col("@id"))
    return [
        rid.alias("referencefileset_id"),
        rid.alias("label"),
        cons_array(to_encode_url(F.col("@id")), F.col("dbxrefs")).alias("xref"),
        F.coalesce(F.col("assembly"), _empty()).alias("reference_assembly"),
        F.col("description").alias("description"),
        F.coalesce(F.col("document"), _empty()).alias("document"),
        F.col("doi").alias("doid"),
        F.coalesce(F.col("elements_selection_method"), _empty()).alias(
            "elements_selection_method"
        ),
        F.coalesce(F.col("examined_loci"), _empty()).alias("examined_loci"),
        _empty().alias("examined_region"),
        to_encode_url(F.col("lab")).alias("lab"),
        F.col("reference_type").alias("reference_type"),
        F.coalesce(F.col("references"), _empty()).alias("references"),
        F.coalesce(F.col("software_used"), _empty()).alias("software_used"),
        _mint_all(F.col("donor")).alias("donor_id"),
        _mint_all(F.col("files")).alias("generated_file_id"),
        _mint_all(F.col("derived_from_")).alias("derived_from_file_id"),
        _mint_all(F.col("original_files")).alias("original_file_id"),
        _mint_all(F.col("related_files")).alias("related_file_id"),
        _mint_all(F.col("related_pipelines")).alias("related_pipeline_id"),
        F.col("organism").alias("_org_fk"),
        ]


def transform_sequencing_activity(
    raw_files: DataFrame, libraries: DataFrame | None = None
) -> DataFrame:
    """SequencingActivityTransformations.scala:17-48 — F2 composite id
    with empty-string dataset fallback; library linkage shares the J14
    overlap join with the File mapper."""
    out = raw_files.select(*session_memo("sequencing_cols", _sequencing_cols))
    if libraries is not None:
        links = file_library_links(raw_files, libraries)
        out = (
            out.join(links, out["@id"] == links["_fid"], "left")
            .withColumn("library_id", F.coalesce(F.col("_library_ids"), _empty()))
            .drop("_fid", "_library_ids")
        )
    else:
        out = out.withColumn("library_id", _empty())
    return out.drop("@id")


# ---------------------------------------------------------------------------
# ReferenceFileSet (⟕ organism broadcast, J5)
# ---------------------------------------------------------------------------
RAW_REFERENCE_SET_SCHEMA = (
    "`@id` string, dbxrefs array<string>, assembly array<string>, "
    "description string, document array<string>, doi string, organism string, "
    "elements_selection_method array<string>, examined_loci array<string>, "
    "lab string, reference_type string, references array<string>, "
    "software_used array<string>, donor array<string>, files array<string>, "
    "derived_from_ array<string>, original_files array<string>, "
    "related_files array<string>, related_pipelines array<string>"
)


def transform_reference_file_set(
    raw: DataFrame, organisms: DataFrame | None = None
) -> DataFrame:
    """ReferenceFileSetTransformations.scala:11-63 (examined_region is a
    hard-coded empty list in the reference, line 32)."""
    out = raw.select(*session_memo("refset_cols", _refset_cols))
    if organisms is not None:
        org = F.broadcast(
            organisms.select(
                F.col("@id").alias("_org_id"),
                F.col("scientific_name").alias("organism"),
            )
        )
        out = out.join(org, out["_org_fk"] == org["_org_id"], "left").drop("_org_id")
    else:
        out = out.withColumn("organism", F.lit(None).cast("string"))
    return out.drop("_org_fk")


# ---------------------------------------------------------------------------
# Experiment / Assay activities (experiment ⟕ grouped replicates/libraries/
# files — J12/J13 chains)
# ---------------------------------------------------------------------------
RAW_EXPERIMENT_SCHEMA = (
    "`@id` string, dbxrefs array<string>, date_created string, "
    "date_submitted string, description string, assay_term_name string, "
    "assay_term_id string, assay_slims array<string>, award string, "
    "lab string, submitted_by string, status string, "
    "contributing_files array<string>, files array<string>, "
    "audit map<string, array<struct<category: string, level: bigint>>>"
)

#: replicates keyed by experiment: (experiment, antibody)
RAW_REPLICATE_SCHEMA = "`@id` string, experiment string, library string, antibody string"


def _grouped_replicates(replicates: DataFrame) -> DataFrame:
    """Antibody ids per experiment (flatMap tryRead('antibody') → mint;
    unordered toList canonicalized sorted)."""
    return replicates.groupBy(F.col("experiment").alias("_exp")).agg(
        F.sort_array(
            F.collect_list(transform_id(F.col("antibody")))
        ).alias("_antibody_ids")
    )


def _experiment_cols() -> list:
    """Static projection, built once per session (functions.memo)."""
    eid = transform_id(F.col("@id"))
    return [
        "@id",
        eid.alias("experimentactivity_id"),
        eid.alias("label"),
        cons_array(to_encode_url(F.col("@id")), F.col("dbxrefs")).alias("xref"),
        F.to_timestamp("date_created").alias("date_created"),
        date_to_midnight_ts("date_submitted").alias("date_submitted"),
        F.col("description").alias("description"),
        F.lit("Experiment").alias("activity_type"),
        _modality_from_term(F.col("assay_term_name")).alias("data_modality"),
        to_encode_url(F.col("award")).alias("award"),
        audit_labels("audit").alias("audit_labels"),
        audit_level_color("audit").alias("max_audit_flag"),
        to_encode_url(F.col("lab")).alias("lab"),
        to_encode_url(F.col("submitted_by")).alias("submitted_by"),
        F.col("status").alias("status"),
        _mint_all(F.col("contributing_files")).alias("used_file_id"),
        _mint_all(F.col("files")).alias("generated_file_id"),
        ]


def _grouped_exp_libraries(libraries_by_experiment: DataFrame) -> DataFrame:
    """Per experiment: minted library ids (sorted) and minted biosample
    FKs. Input: (experiment, `@id`, biosample) rows — the J8/J9-resolved
    library-per-experiment linkage."""
    return libraries_by_experiment.groupBy(F.col("experiment").alias("_exp")).agg(
        F.sort_array(F.collect_list(transform_id(F.col("@id")))).alias("_library_ids"),
        F.sort_array(
            F.array_distinct(F.collect_list(transform_id(F.col("biosample"))))
        ).alias("_biosample_ids"),
    )


def _assay_cols() -> list:
    """Static projection, built once per session (functions.memo)."""
    eid = transform_id(F.col("@id"))
    return [
        "@id",
        eid.alias("assayactivity_id"),
        eid.alias("label"),
        cons_array(to_encode_url(F.col("@id")), F.col("dbxrefs")).alias("xref"),
        F.to_timestamp("date_created").alias("date_created"),
        F.get(F.col("assay_slims"), 0).alias("assay_category"),
        F.col("assay_term_id").alias("assay_type"),
        _modality_from_term(F.col("assay_term_name")).alias("data_modality"),
        F.lit("Assay").alias("activity_type"),
        ]


def transform_experiment_activity(
    raw: DataFrame,
    replicates: DataFrame | None = None,
    libraries_by_experiment: DataFrame | None = None,
) -> DataFrame:
    """ExperimentActivityTransformations.scala:12-60 (usesSample ids are
    .sorted.distinct and library ids .sorted in the reference itself)."""
    out = raw.select(*session_memo("experiment_cols", _experiment_cols))
    return _attach_groups(out, replicates, libraries_by_experiment, assay=False)


def transform_assay_activity(
    raw: DataFrame,
    files_by_experiment: DataFrame | None = None,
    replicates: DataFrame | None = None,
    libraries_by_experiment: DataFrame | None = None,
) -> DataFrame:
    """AssayActivityTransformations.scala:12-40. ``files_by_experiment``:
    (experiment, `@id`) rows of the files linked per experiment (J12)."""
    out = raw.select(*session_memo("assay_cols", _assay_cols))
    if files_by_experiment is not None:
        gf = files_by_experiment.groupBy(F.col("experiment").alias("_fexp")).agg(
            F.sort_array(
                F.array_distinct(F.collect_list(transform_id(F.col("@id"))))
            ).alias("generated_file_id")
        )
        out = (
            out.join(gf, out["@id"] == F.col("_fexp"), "left")
            .withColumn(
                "generated_file_id", F.coalesce(F.col("generated_file_id"), _empty())
            )
            .drop("_fexp")
        )
    else:
        out = out.withColumn("generated_file_id", _empty())
    return _attach_groups(out, replicates, libraries_by_experiment, assay=True)


def _attach_groups(out, replicates, libraries_by_experiment, assay: bool):
    if replicates is not None:
        out = (
            out.join(_grouped_replicates(replicates), out["@id"] == F.col("_exp"), "left")
            .withColumn("antibody_id", F.coalesce(F.col("_antibody_ids"), _empty()))
            .drop("_exp", "_antibody_ids")
        )
    else:
        out = out.withColumn("antibody_id", _empty())
    bios_col = "used_biosample_id" if assay else "uses_sample_biosample_id"
    if libraries_by_experiment is not None:
        out = (
            out.join(
                _grouped_exp_libraries(libraries_by_experiment),
                out["@id"] == F.col("_exp"),
                "left",
            )
            .withColumn("library_id", F.coalesce(F.col("_library_ids"), _empty()))
            .withColumn(bios_col, F.coalesce(F.col("_biosample_ids"), _empty()))
            .drop("_exp", "_library_ids", "_biosample_ids")
        )
    else:
        out = out.withColumn("library_id", _empty()).withColumn(bios_col, _empty())
    return out.drop("@id")


# ---------------------------------------------------------------------------
# Analysis / Step activities (pipeline-run shapes, J10/J11)
# ---------------------------------------------------------------------------
def pipeline_run_id(pipeline_id: Column, experiment_id: Column) -> Column:
    """AnalysisActivityTransformations.scala:102-104 —
    ``{mint(pipeline)}_{mint(experiment)}``."""
    return F.concat(
        transform_id(pipeline_id), F.lit("_"), transform_id(experiment_id)
    )


def transform_analysis_activity(
    pipelines: DataFrame, generated_files: DataFrame
) -> DataFrame:
    """AnalysisActivityTransformations.scala:14-52. Inputs: pipelines
    (`@id`, assay_term_names, title) and generated files
    (pipeline, experiment, `@id`, derived_from) — the grouped
    (pipelineId, experimentId) → files linkage (J11). used = the files'
    minted derived_from ids minus the run's own generated ids
    (U4 array_except), canonicalized sorted."""
    gf = generated_files.groupBy(
        F.col("pipeline").alias("_pid"), F.col("experiment").alias("_eid")
    ).agg(
        F.sort_array(
            F.array_distinct(F.collect_list(transform_id(F.col("@id"))))
        ).alias("generated_file_id"),
        F.sort_array(
            F.array_distinct(F.flatten(F.collect_list(_mint_all(F.col("derived_from")))))
        ).alias("_all_derived"),
    )
    p = pipelines.select(
        F.col("@id").alias("_p_raw"),
        modality_expr_array(F.coalesce(F.col("assay_term_names"), _empty())).alias(
            "data_modality"
        ),
        F.col("title").alias("analysis_type"),
    )
    j = gf.join(p, F.col("_pid") == F.col("_p_raw"))
    run_id = pipeline_run_id(F.col("_pid"), F.col("_eid"))
    return j.select(
        run_id.alias("analysisactivity_id"),
        run_id.alias("label"),
        F.array(to_encode_url(F.col("_p_raw"))).alias("xref"),
        F.lit("Analysis").alias("activity_type"),
        "data_modality",
        "analysis_type",
        transform_id(F.col("_eid")).alias("assayactivity_id"),
        F.array_except(F.col("_all_derived"), F.col("generated_file_id")).alias(
            "used_file_id"
        ),
        "generated_file_id",
    )


def transform_step_activity(
    step_runs: DataFrame, generated_files: DataFrame
) -> DataFrame:
    """StepActivityTransformations.scala:11-51. ``step_runs``: one row per
    step run with the J10-resolved version name and the step's pipeline
    id list; ``generated_files``: (step_run, `@id`, dataset,
    derived_from). The pipeline-run FK applies the reference's
    warn-and-null rules: exactly ONE distinct pipeline id on the step AND
    exactly ONE distinct dataset across the files, else null
    (AnalysisActivityTransformations.scala:57-84)."""
    gf = generated_files.groupBy(F.col("step_run").alias("_srun")).agg(
        F.sort_array(F.collect_list(transform_id(F.col("@id")))).alias(
            "generated_file_id"
        ),
        F.sort_array(
            F.array_distinct(F.flatten(F.collect_list(_mint_all(F.col("derived_from")))))
        ).alias("used_file_id"),
        F.array_distinct(F.collect_list(F.col("dataset"))).alias("_datasets"),
    )
    sid = transform_id(F.col("@id"))
    sr = step_runs.select(
        F.col("@id").alias("_sr_raw"),
        sid.alias("stepactivity_id"),
        sid.alias("label"),
        F.col("version_name").alias("version"),
        F.array_distinct(F.coalesce(F.col("pipelines"), _empty())).alias("_pids"),
    )
    j = sr.join(gf, F.col("_sr_raw") == F.col("_srun"), "left")
    one_pipeline = F.when(F.size("_pids") == 1, F.element_at("_pids", 1))
    one_experiment = F.when(F.size("_datasets") == 1, F.element_at("_datasets", 1))
    return j.select(
        "stepactivity_id",
        "label",
        "version",
        F.when(
            one_pipeline.isNotNull() & one_experiment.isNotNull(),
            pipeline_run_id(one_pipeline, one_experiment),
        ).alias("analysisactivity_id"),
        F.coalesce(F.col("used_file_id"), _empty()).alias("used_file_id"),
        F.coalesce(F.col("generated_file_id"), _empty()).alias("generated_file_id"),
        F.lit("Step").alias("activity_type"),
        _empty().alias("data_modality"),
    )
