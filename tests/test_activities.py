"""Activity/antibody/reference-set mapper fidelity — the remaining
reference mappers (see entities/activities.py header for file:line
citations). Fixtures exercise the tricky rules: human-target headOption,
composite ids with/without dataset fallback, used = derived − generated,
warn-and-null pipeline/experiment resolution, assay_slims pick-first."""

from encode_ingest_spark.entities import (
    RAW_ANTIBODY_SCHEMA,
    RAW_EXPERIMENT_SCHEMA,
    RAW_REFERENCE_SET_SCHEMA,
    RAW_REPLICATE_SCHEMA,
    RAW_TARGET_SCHEMA,
    RAW_TREATMENT_SCHEMA,
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

URL = "https://www.encodeproject.org"


def test_antibody_human_target_pick(spark):
    ab = spark.createDataFrame(
        [
            {
                "@id": "/antibodies/ENCAB001/",
                "dbxrefs": ["AR:X"],
                "date_created": "2020-01-01T00:00:00+00:00",
                "source": "/sources/s/",
                "clonality": "polyclonal",
                "host_organism": "/organisms/rabbit/",
                "award": "/awards/a/",
                "isotype": "IgG",
                "lab": "/labs/l/",
                "lot_id": "L1",
                "product_id": "P1",
                "purifications": ["affinity"],
            },
            {
                "@id": "/antibodies/ENCAB002/",
                "date_created": "2020-01-01T00:00:00+00:00",
                "source": "/sources/s/",
                "host_organism": "/organisms/mouse/",
                "award": "/awards/a/",
                "lab": "/labs/l/",
                "product_id": "P2",
            },
        ],
        RAW_ANTIBODY_SCHEMA,
    )
    targets = spark.createDataFrame(
        [
            ("/antibodies/ENCAB001/", "/organisms/human/", "CTCF"),
            ("/antibodies/ENCAB001/", "/organisms/mouse/", "Ctcf-mouse"),
            ("/antibodies/ENCAB002/", "/organisms/mouse/", "Mouse-only"),
        ],
        RAW_TARGET_SCHEMA,
    )
    out = {r.antibody_id: r for r in transform_antibody(ab, targets).collect()}
    a = out["ENCAB001"]
    assert a.target == "CTCF"  # only human-organism targets qualify
    assert a.xref == [URL + "/antibodies/ENCAB001/", "AR:X"]
    assert a.part_number == "P1" and a.lot == "L1"
    assert a.purification_methods == ["affinity"]
    assert out["ENCAB002"].target is None  # no human target


def test_sample_treatment_fields(spark):
    raw = spark.createDataFrame(
        [
            {
                "@id": "/treatments/T1/",
                "date_created": "2020-01-01T00:00:00+00:00",
                "treatment_type": "chemical",
                "treatment_term_id": "CHEBI:1",
                "treatment_term_name": "ethanol",
                "amount": 10.0,
                "amount_units": "mM",
                "duration": 2.0,
                "duration_units": "hour",
                "purpose": "perturbation",
            }
        ],
        RAW_TREATMENT_SCHEMA,
    )
    t = transform_sample_treatment(raw).first()
    assert t.sampletreatmentactivity_id == "T1"
    assert t.activity_type == "SampleTreatment"
    assert t.data_modality == []
    assert (t.sample_treatment_method, t.sample_treatment_type) == (
        "chemical", "perturbation",
    )
    assert (t.amount, t.amount_units, t.duration) == (10.0, "mM", 2.0)


def test_library_preparation_modality_via_experiment(spark):
    libs = spark.createDataFrame(
        [
            ("/libraries/ENCLB1/", "2020-01-01T00:00:00+00:00", "/labs/l/",
             "/biosamples/ENCBS1/"),
            ("/libraries/ENCLB2/", "2020-01-01T00:00:00+00:00", "/labs/l/",
             "/biosamples/ENCBS2/"),
        ],
        "`@id` string, date_created string, lab string, biosample string",
    )
    exp = spark.createDataFrame(
        [("/libraries/ENCLB1/", "RNA-seq")], "library string, assay_term_name string"
    )
    out = {
        r.librarypreparationactivity_id: r
        for r in transform_library_preparation(libs, exp).collect()
    }
    a = out["ENCLB1"]
    assert a.generated_library_id == ["ENCLB1"]
    assert a.uses_sample_biosample_id == ["ENCBS1"]
    assert a.data_modality == ["Transcriptomic_NonTargeted"]
    assert out["ENCLB2"].data_modality == []  # no joined experiment


def test_alignment_and_sequencing_composite_ids(spark):
    # alignment/sequencing files carry a SCALAR assembly (the File table's
    # is an array) — purpose-built raw shape
    schema = (
        "`@id` string, dataset string, date_created string, "
        "assay_term_name array<string>, assembly string, "
        "derived_from array<string>, origin_batches array<string>, "
        "lab string, platform string"
    )
    rows = [
        {
            "@id": "/files/ENCFF1/",
            "dataset": "/experiments/ENCSR1/",
            "date_created": "2020-01-01T00:00:00+00:00",
            "assay_term_name": ["RNA-seq"],
            "assembly": "GRCh38",
            "derived_from": ["/files/ENCFF0/"],
            "origin_batches": None,
            "lab": "/labs/l/",
            "platform": "/platforms/p/",
        }
    ]
    files = spark.createDataFrame(rows, schema)
    a = transform_alignment_activity(files).first()
    assert a.alignmentactivity_id == "ENCFF1_ENCSR1"  # F2 composite
    assert a.generated_file_id == ["ENCFF1"]
    assert a.used_file_id == ["ENCFF0"]
    assert a.reference_assembly == ["GRCh38"]  # Option.toList
    assert a.data_modality == ["Transcriptomic_NonTargeted"]

    s = transform_sequencing_activity(files).first()
    assert s.sequencingactivity_id == "ENCFF1_ENCSR1"
    assert s.associated_with == ["ENCSR1"]
    assert s.library_id == []
    # dataset fallback: absent dataset → empty-string suffix
    files2 = spark.createDataFrame([{**rows[0], "dataset": None}], schema)
    s2 = transform_sequencing_activity(files2).first()
    assert s2.sequencingactivity_id == "ENCFF1_"


def test_reference_file_set(spark):
    raw = spark.createDataFrame(
        [
            {
                "@id": "/reference-file-sets/ENCSR9/",
                "assembly": ["GRCh38"],
                "organism": "/organisms/human/",
                "files": ["/files/ENCFF7/"],
                "lab": "/labs/l/",
                "reference_type": "genome",
            }
        ],
        RAW_REFERENCE_SET_SCHEMA,
    )
    orgs = spark.createDataFrame(
        [("/organisms/human/", "Homo sapiens")],
        "`@id` string, scientific_name string",
    )
    r = transform_reference_file_set(raw, orgs).first()
    assert r.referencefileset_id == "ENCSR9"
    assert r.organism == "Homo sapiens"
    assert r.generated_file_id == ["ENCFF7"]
    assert r.examined_region == []  # hard-coded empty in the reference


def _experiment_row(**over):
    row = {
        "@id": "/experiments/ENCSR1/",
        "dbxrefs": None,
        "date_created": "2020-01-01T00:00:00+00:00",
        "date_submitted": "2019-12-01",
        "description": "d",
        "assay_term_name": "RNA-seq",
        "assay_term_id": "OBI:1",
        "assay_slims": ["Transcription", "Other"],
        "award": "/awards/a/",
        "lab": "/labs/l/",
        "submitted_by": "/users/u/",
        "status": "released",
        "contributing_files": ["/files/ENCFF5/"],
        "files": ["/files/ENCFF6/"],
        "audit": None,
    }
    row.update(over)
    return row


def test_experiment_and_assay_activities(spark):
    exp = spark.createDataFrame([_experiment_row()], RAW_EXPERIMENT_SCHEMA)
    reps = spark.createDataFrame(
        [
            ("/replicates/R1/", "/experiments/ENCSR1/", "/libraries/ENCLB1/",
             "/antibodies/ENCAB1/"),
            ("/replicates/R2/", "/experiments/ENCSR1/", "/libraries/ENCLB2/", None),
        ],
        RAW_REPLICATE_SCHEMA,
    )
    libs = spark.createDataFrame(
        [
            ("/experiments/ENCSR1/", "/libraries/ENCLB1/", "/biosamples/ENCBS1/"),
            ("/experiments/ENCSR1/", "/libraries/ENCLB2/", "/biosamples/ENCBS1/"),
        ],
        "experiment string, `@id` string, biosample string",
    )
    e = transform_experiment_activity(exp, reps, libs).first()
    assert e.experimentactivity_id == "ENCSR1"
    assert str(e.date_submitted) == "2019-12-01 00:00:00"  # F13 midnight
    assert e.data_modality == ["Transcriptomic_NonTargeted"]
    assert e.antibody_id == ["ENCAB1"]  # null antibody dropped
    assert e.library_id == ["ENCLB1", "ENCLB2"]
    assert e.uses_sample_biosample_id == ["ENCBS1"]  # sorted.distinct
    assert e.used_file_id == ["ENCFF5"] and e.generated_file_id == ["ENCFF6"]

    files = spark.createDataFrame(
        [("/experiments/ENCSR1/", "/files/ENCFF6/"),
         ("/experiments/ENCSR1/", "/files/ENCFF6/")],
        "experiment string, `@id` string",
    )
    a = transform_assay_activity(exp, files, reps, libs).first()
    assert a.assayactivity_id == "ENCSR1"
    assert a.assay_category == "Transcription"  # assay_slims head (O2)
    assert a.assay_type == "OBI:1"
    assert a.generated_file_id == ["ENCFF6"]  # set-deduped
    assert a.used_biosample_id == ["ENCBS1"]


def test_analysis_activity_used_minus_generated(spark):
    pipelines = spark.createDataFrame(
        [("/pipelines/ENCPL1/", ["RNA-seq"], "RNA pipeline")],
        "`@id` string, assay_term_names array<string>, title string",
    )
    gen = spark.createDataFrame(
        [
            ("/pipelines/ENCPL1/", "/experiments/ENCSR1/", "/files/ENCFF1/",
             ["/files/ENCFF0/", "/files/ENCFF2/"]),
            ("/pipelines/ENCPL1/", "/experiments/ENCSR1/", "/files/ENCFF2/",
             ["/files/ENCFF0/"]),
        ],
        "pipeline string, experiment string, `@id` string, derived_from array<string>",
    )
    r = transform_analysis_activity(pipelines, gen).first()
    assert r.analysisactivity_id == "ENCPL1_ENCSR1"
    assert r.assayactivity_id == "ENCSR1"
    assert r.generated_file_id == ["ENCFF1", "ENCFF2"]
    # derived = {ENCFF0, ENCFF2}; minus generated → {ENCFF0} (U4)
    assert r.used_file_id == ["ENCFF0"]
    assert r.data_modality == ["Transcriptomic_NonTargeted"]
    assert r.analysis_type == "RNA pipeline"


def test_step_activity_warn_and_null_fk(spark):
    step_runs = spark.createDataFrame(
        [
            ("/analysis-step-runs/SR1/", "v1", ["/pipelines/ENCPL1/"]),
            ("/analysis-step-runs/SR2/", "v1",
             ["/pipelines/ENCPL1/", "/pipelines/ENCPL2/"]),
        ],
        "`@id` string, version_name string, pipelines array<string>",
    )
    gen = spark.createDataFrame(
        [
            ("/analysis-step-runs/SR1/", "/files/ENCFF1/",
             "/experiments/ENCSR1/", ["/files/ENCFF0/"]),
            ("/analysis-step-runs/SR2/", "/files/ENCFF2/",
             "/experiments/ENCSR1/", None),
        ],
        "step_run string, `@id` string, dataset string, derived_from array<string>",
    )
    out = {r.stepactivity_id: r for r in transform_step_activity(step_runs, gen).collect()}
    ok = out["SR1"]
    assert ok.analysisactivity_id == "ENCPL1_ENCSR1"
    assert ok.generated_file_id == ["ENCFF1"]
    assert ok.used_file_id == ["ENCFF0"]
    # >1 distinct pipeline on the step → null FK (warn-and-null)
    assert out["SR2"].analysisactivity_id is None
