"""transform_all — the reference's ENTIRE transformation pipeline as one
call: raw entity DataFrames in, the 16 output tables out
(TransformationPipelineBuilder.scala:40-174 wiring, mapper-for-mapper).

The reference wires ~16 "processing trees" over 19 raw entity streams
(ARCHITECTURE.md:36-41). Here each tree is a DataFrame query sharing the
raw inputs; Catalyst fuses the map chains and the caller materializes
whichever outputs it needs (laziness replaces Beam's shared-stage
fusion). Linkage frames (targets-by-antibody, libraries/replicates by
experiment, experiment-by-library, step-run info) are derived exactly as
the reference derives them — citations at each builder.

Input keys (all optional except where a tree needs them; missing inputs
simply skip that tree's output):

    organisms, donors, references, antibodies, targets, libraries,
    biosamples, biosample_types, genetic_modifications, treatments,
    experiments, fc_experiments, files, replicates, analysis_step_runs,
    analysis_step_versions, analysis_steps, pipelines
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .activities import (
    transform_alignment_activity,
    transform_analysis_activity,
    transform_antibody,
    transform_assay_activity,
    transform_experiment_activity,
    transform_library_preparation,
    transform_reference_file_set,
    transform_sample_treatment,
    transform_sequencing_activity,
    transform_step_activity,
)
from .biosample import transform_biosample
from .documents import transform_donor
from .files_library import transform_file, transform_library
from .repo_entities import dataset_row


def _targets_by_antibody(antibodies: DataFrame, targets: DataFrame) -> DataFrame:
    """Antibody.targets array → (antibody, organism, label) pairs
    (TransformationPipelineBuilder.scala:278-296: flatMap the target-id
    array, inner-join the target objects)."""
    pairs = antibodies.select(
        F.col("@id").alias("antibody"), F.explode("targets").alias("_tid")
    )
    t = targets.select(
        F.col("@id").alias("_t_id"),
        F.col("organism").alias("organism"),
        F.col("label").alias("label"),
    )
    return pairs.join(t, pairs["_tid"] == t["_t_id"]).select(
        "antibody", "organism", "label"
    )


def _libraries_by_experiment(
    replicates: DataFrame, libraries: DataFrame
) -> DataFrame:
    """(experiment, library `@id`, biosample) rows — replicates keyed by
    library ⟕ libraries, re-keyed by the replicate's experiment
    (TransformationPipelineBuilder.scala:465-486)."""
    r = replicates.select(
        F.col("experiment").alias("experiment"), F.col("library").alias("_lib_fk")
    )
    lib = libraries.select(
        F.col("@id").alias("_lib_id"), F.col("biosample").alias("biosample")
    )
    return (
        r.join(lib, r["_lib_fk"] == lib["_lib_id"])
        .select("experiment", F.col("_lib_id").alias("@id"), "biosample")
    )


def _experiment_by_library(
    experiments: DataFrame, replicates: DataFrame
) -> DataFrame:
    """(library `@id`, assay_term_name) — experiments exploded by their
    replicate list, joined to replicates for the library FK, distinctBy
    library with a deterministic min_by winner
    (TransformationPipelineBuilder.scala:425-461, J8's distinctBy)."""
    exp_by_rep = experiments.select(
        F.col("@id").alias("_exp_id"),
        F.col("assay_term_name").alias("assay_term_name"),
        F.explode("replicates").alias("_rep_id"),
    )
    rep = replicates.select(
        F.col("@id").alias("_r_id"), F.col("library").alias("library")
    )
    j = exp_by_rep.join(rep, F.col("_rep_id") == F.col("_r_id"))
    return j.groupBy("library").agg(
        F.min_by("assay_term_name", F.col("_exp_id")).alias("assay_term_name")
    )


def _step_run_frames(
    files: DataFrame,
    step_runs: DataFrame,
    step_versions: DataFrame,
    steps: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """The J10 chain (TransformationPipelineBuilder.scala:488-522):
    stepRun ⋈ stepVersion ⋈ step, plus the files-for-step-run stream.
    Returns (step_runs_resolved, generated_files) in the shapes
    transform_step_activity / transform_analysis_activity consume."""
    sr = step_runs.select(
        F.col("@id").alias("@id"),
        F.col("analysis_step_version").alias("_ver_fk"),
    )
    ver = step_versions.select(
        F.col("@id").alias("_ver_id"),
        F.col("name").alias("version_name"),
        F.col("analysis_step").alias("_step_fk"),
    )
    st = steps.select(
        F.col("@id").alias("_step_id"), F.col("pipelines").alias("pipelines")
    )
    resolved = (
        sr.join(ver, sr["_ver_fk"] == ver["_ver_id"])
        .join(st, F.col("_step_fk") == st["_step_id"])
        .select("@id", "version_name", "pipelines")
    )
    gen = files.filter(F.col("step_run").isNotNull()).select(
        F.col("step_run").alias("step_run"),
        "@id",
        F.col("dataset").alias("dataset"),
        F.col("derived_from").alias("derived_from"),
    )
    return resolved, gen


def _analysis_frames(
    step_runs_resolved: DataFrame, generated_files: DataFrame
) -> DataFrame:
    """Per-file (pipeline, experiment, `@id`, derived_from) rows for the
    analysis-activity rollup: a file contributes iff its step run
    resolves to exactly ONE pipeline and its run's files to exactly ONE
    dataset (AnalysisActivityTransformations.scala:57-84 warn-and-null)."""
    per_run = generated_files.groupBy("step_run").agg(
        F.array_distinct(F.collect_list("dataset")).alias("_datasets")
    )
    sr = step_runs_resolved.select(
        F.col("@id").alias("_srun"),
        F.array_distinct(F.coalesce(F.col("pipelines"), F.array().cast("array<string>"))).alias("_pids"),
    )
    runs = sr.join(per_run, F.col("_srun") == F.col("step_run")).select(
        "_srun",
        F.when(F.size("_pids") == 1, F.element_at("_pids", 1)).alias("pipeline"),
        F.when(F.size("_datasets") == 1, F.element_at("_datasets", 1)).alias(
            "experiment"
        ),
    ).filter(F.col("pipeline").isNotNull() & F.col("experiment").isNotNull())
    return generated_files.join(
        runs, generated_files["step_run"] == runs["_srun"]
    ).select("pipeline", "experiment", "@id", "derived_from")


def transform_all(
    spark: SparkSession, inputs: dict[str, DataFrame]
) -> dict[str, DataFrame]:
    """Run every applicable tree; returns {output_table: DataFrame}."""
    get = inputs.get
    out: dict[str, DataFrame] = {"dataset": dataset_row(spark)}

    organisms = get("organisms")
    if get("references") is not None:
        out["referencefileset"] = transform_reference_file_set(
            inputs["references"], organisms
        )
    if get("donors") is not None:
        out["donor"] = transform_donor(inputs["donors"], organisms)
    if get("antibodies") is not None:
        tba = (
            _targets_by_antibody(inputs["antibodies"], inputs["targets"])
            if get("targets") is not None
            else None
        )
        out["antibody"] = transform_antibody(inputs["antibodies"], tba)
    libraries = get("libraries")
    if libraries is not None:
        out["library"] = transform_library(libraries)
    if get("biosamples") is not None:
        out["biosample"] = transform_biosample(
            inputs["biosamples"],
            get("biosample_types"),
            libraries,
            get("genetic_modifications"),
        )
    if get("treatments") is not None:
        out["sampletreatmentactivity"] = transform_sample_treatment(
            inputs["treatments"]
        )

    files = get("files")
    if files is not None:
        out["file"] = transform_file(files, libraries)
        # the reference splits the file stream by output category
        # (ExtractionPipelineBuilder's per-category globs; P3). The File
        # table reads assembly as a list while the alignment-activity
        # mapper reads it as a scalar (the reference reads the same raw
        # key with both types) — adapt by taking the first element.
        out["alignmentactivity"] = transform_alignment_activity(
            files.filter(F.col("output_category") == "alignment").withColumn(
                "assembly", F.get(F.col("assembly"), 0)
            )
        )
        out["sequencingactivity"] = transform_sequencing_activity(
            files.filter(F.col("output_category") == "raw data"), libraries
        )

    experiments = get("experiments")
    if experiments is not None and get("fc_experiments") is not None:
        experiments = experiments.unionByName(
            inputs["fc_experiments"], allowMissingColumns=True
        )
    replicates = get("replicates")
    if libraries is not None and experiments is not None and replicates is not None:
        out["librarypreparationactivity"] = transform_library_preparation(
            libraries, _experiment_by_library(experiments, replicates)
        )
    if experiments is not None:
        libs_by_exp = (
            _libraries_by_experiment(replicates, libraries)
            if replicates is not None and libraries is not None
            else None
        )
        out["experimentactivity"] = transform_experiment_activity(
            experiments, replicates, libs_by_exp
        )
        files_by_exp = (
            files.select(F.col("dataset").alias("experiment"), "@id")
            if files is not None
            else None
        )
        out["assayactivity"] = transform_assay_activity(
            experiments, files_by_exp, replicates, libs_by_exp
        )

    if (
        files is not None
        and get("analysis_step_runs") is not None
        and get("analysis_step_versions") is not None
        and get("analysis_steps") is not None
    ):
        resolved, gen = _step_run_frames(
            files,
            inputs["analysis_step_runs"],
            inputs["analysis_step_versions"],
            inputs["analysis_steps"],
        )
        out["stepactivity"] = transform_step_activity(resolved, gen)
        if get("pipelines") is not None:
            out["analysisactivity"] = transform_analysis_activity(
                inputs["pipelines"], _analysis_frames(resolved, gen)
            )
    return out
