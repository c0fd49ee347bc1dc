"""Biosample mapper fidelity — field semantics mirrored from
BiosampleTransformations.scala:15-197 (classification routing, dynamic
life-stage, part-number warn-and-null, genetic-mod set merges, audit
summary, nested coordinate reads)."""

import pytest

from encode_ingest_spark.entities import (
    RAW_BIOSAMPLE_SCHEMA,
    RAW_BIOSAMPLE_TYPE_SCHEMA,
    RAW_GENETIC_MOD_SCHEMA,
    RAW_LIBRARY_SCHEMA,
    transform_biosample,
)

URL = "https://www.encodeproject.org"


def _bio(**over):
    base = dict.fromkeys(
        [
            "dbxrefs", "age", "age_units", "organism", "human_life_stage",
            "mouse_life_stage", "source", "date_obtained", "part_of",
            "preservation_method", "url", "donor", "disease_term_id",
            "cell_isolation_method", "applied_modifications", "health_status",
            "treatments", "audit",
        ]
    )
    base.update(
        {
            "@id": "/biosamples/ENCBS000AAA/",
            "date_created": "2020-12-24T18:00:00+00:00",
            "award": "/awards/a/",
            "lab": "/labs/l/",
            "perturbed": False,
            "submitted_by": "/users/u/",
            "biosample_ontology": "/biosample-types/tissue_UBERON_0002107/",
        }
    )
    base.update(over)
    return base


TYPES = [
    {
        "@id": "/biosample-types/tissue_UBERON_0002107/",
        "classification": "tissue",
        "term_id": "UBERON:0002107",
        "organ_slims": ["liver"],
        "cell_slims": ["hepatocyte"],
    },
    {
        "@id": "/biosample-types/cell_line_EFO_0002067/",
        "classification": "cell line",
        "term_id": "EFO:0002067",
        "organ_slims": ["blood"],
        "cell_slims": ["leukocyte"],
    },
    {
        "@id": "/biosample-types/primary_cell_CL_0000623/",
        "classification": "primary cell",
        "term_id": "CL:0000623",
        "organ_slims": ["blood", "bodily fluid"],
        "cell_slims": None,
    },
]


@pytest.fixture()
def types_df(spark):
    return spark.createDataFrame(TYPES, RAW_BIOSAMPLE_TYPE_SCHEMA)


def _run(spark, rows, types=None, libraries=None, genetic_mods=None):
    raw = spark.createDataFrame(rows, RAW_BIOSAMPLE_SCHEMA)
    out = transform_biosample(raw, types, libraries, genetic_mods)
    return {r.biosample_id: r for r in out.collect()}


def test_core_fields_and_id_minting(spark, types_df):
    rows = [
        _bio(
            dbxrefs=["GEO:X1"],
            age="30-33",
            age_units="year",
            organism="/organisms/human/",
            human_life_stage="adult",
            mouse_life_stage="embryonic",
            source="/sources/sigma/",
            date_obtained="2019-05-01",
            part_of="/biosamples/ENCBS000PAR/",
            donor="/human-donors/ENCDO845WKR/",
            disease_term_id=["DOID:9352", "DOID:2"],
        )
    ]
    out = _run(spark, rows, types_df)
    b = out["ENCBS000AAA"]
    assert b.label == "ENCBS000AAA"
    assert b.xref == [URL + "/biosamples/ENCBS000AAA/", "GEO:X1"]
    assert (
        b.donor_age_at_collection_lower_bound,
        b.donor_age_at_collection_upper_bound,
    ) == (30.0, 33.0)
    assert b.donor_age_at_collection_unit == "year"
    # F14: organism=human → human_life_stage wins
    assert b.donor_age_at_collection_life_stage == "adult"
    assert b.source == URL + "/sources/sigma/"
    assert str(b.date_collected) == "2019-05-01 00:00:00"
    assert b.part_of_dataset_id == ["ENCODE"]
    assert b.derived_from_biosample_id == "ENCBS000PAR"
    assert b.donor_id == ["ENCDO845WKR"]
    assert b.disease == "DOID:9352"  # .map(_.head)
    assert b.award == URL + "/awards/a/"
    assert b.was_perturbed is False
    # no libraries / mods supplied → empty-iterable semantics
    assert b.part_number is None and b.lot is None
    assert b.library_prep_id == [] and b.genetic_mod_merged == []


def test_classification_routing_f15(spark, types_df):
    rows = [
        _bio(),  # tissue
        _bio(
            **{
                "@id": "/biosamples/ENCBS000BBB/",
                "biosample_ontology": "/biosample-types/cell_line_EFO_0002067/",
            }
        ),
        _bio(
            **{
                "@id": "/biosamples/ENCBS000CCC/",
                "biosample_ontology": "/biosample-types/primary_cell_CL_0000623/",
            }
        ),
        _bio(
            **{
                "@id": "/biosamples/ENCBS000DDD/",
                "biosample_ontology": "/biosample-types/missing/",
            }
        ),
    ]
    out = _run(spark, rows, types_df)
    tissue, cline, pcell, notype = (
        out["ENCBS000AAA"], out["ENCBS000BBB"], out["ENCBS000CCC"], out["ENCBS000DDD"],
    )
    # tissue → anatomical from term_id, apriori from cell_slims
    assert tissue.anatomical_site == "UBERON:0002107"
    assert tissue.apriori_cell_type == ["hepatocyte"]
    assert tissue.cell_line is None
    assert tissue.biosample_type == "tissue"
    # cell line → anatomical from organ_slims, apriori from cell_slims,
    # cell_line from term_id
    assert cline.anatomical_site == "blood"
    assert cline.apriori_cell_type == ["leukocyte"]
    assert cline.cell_line == "EFO:0002067"
    # primary cell → anatomical from organ_slims, apriori [term_id],
    # null cell_slims tolerated
    assert pcell.anatomical_site == "blood"
    assert pcell.apriori_cell_type == ["CL:0000623"]
    assert pcell.cell_line is None
    # unmatched type → everything empty/null
    assert notype.anatomical_site is None
    assert notype.apriori_cell_type == []
    assert notype.biosample_type is None


def test_dynamic_life_stage_unknown_organism(spark):
    rows = [
        _bio(
            organism="/organisms/mouse/",
            human_life_stage="adult",
            mouse_life_stage="embryonic",
        ),
        _bio(
            **{"@id": "/biosamples/ENCBS000EEE/"},
            organism="/organisms/fly/",
            human_life_stage="adult",
        ),
        _bio(**{"@id": "/biosamples/ENCBS000FFF/"}, human_life_stage="adult"),
    ]
    out = _run(spark, rows)
    assert out["ENCBS000AAA"].donor_age_at_collection_life_stage == "embryonic"
    assert out["ENCBS000EEE"].donor_age_at_collection_life_stage is None
    assert out["ENCBS000FFF"].donor_age_at_collection_life_stage is None


def test_library_part_number_warn_and_null_f18(spark):
    libs = spark.createDataFrame(
        [
            ("/libraries/ENCLB1/", "/biosamples/ENCBS000AAA/", "P1", "L1"),
            ("/libraries/ENCLB2/", "/biosamples/ENCBS000AAA/", "P2", "L1"),
            ("/libraries/ENCLB3/", "/biosamples/ENCBS000GGG/", "P9", None),
        ],
        RAW_LIBRARY_SCHEMA,
    )
    rows = [_bio(), _bio(**{"@id": "/biosamples/ENCBS000GGG/"})]
    out = _run(spark, rows, libraries=libs)
    multi = out["ENCBS000AAA"]
    # >1 distinct product_id → None (warn-and-null); single lot → value
    assert multi.part_number is None
    assert multi.lot == "L1"
    assert multi.library_prep_id == ["ENCLB1", "ENCLB2"]
    single = out["ENCBS000GGG"]
    assert single.part_number == "P9"
    assert single.lot is None
    assert single.library_prep_id == ["ENCLB3"]


def test_genetic_mod_merges_and_nested_coordinates(spark):
    gm_rows = [
        {
            "@id": "/genetic-modifications/M1/",
            "biosamples_modified": ["/biosamples/ENCBS000AAA/"],
            "accession": "ENCGM001",
            "purpose": "tagging",
            "category": "insertion",
            "method": "CRISPR",
            "nucleic_acid_delivery_method": ["transfection"],
            "modified_site_by_coordinates": {
                "assembly": "GRCh38", "chromosome": "chr1", "start": 100, "end": 200,
            },
            "guide_rna_sequences": ["ACGT", "TTTT"],
            "treatments": ["/treatments/T1/"],
            "documents": ["/documents/D1/"],
            "moi": "high",
        },
        {
            "@id": "/genetic-modifications/M2/",
            "biosamples_modified": [
                "/biosamples/ENCBS000AAA/", "/biosamples/ENCBS000HHH/",
            ],
            "accession": "ENCGM002",
            "purpose": "tagging",  # duplicate within set → deduped
            "category": "tagging",  # same VALUE as purpose → survives concat
            "method": "RNAi",
            "nucleic_acid_delivery_method": ["transduction", "transfection"],
            "modified_site_by_coordinates": {
                "assembly": "GRCh38", "chromosome": "chr2", "start": 5, "end": 6,
            },
            "guide_rna_sequences": ["ACGT"],
        },
    ]
    gms = spark.createDataFrame(gm_rows, RAW_GENETIC_MOD_SCHEMA)
    rows = [_bio(), _bio(**{"@id": "/biosamples/ENCBS000HHH/"})]
    out = _run(spark, rows, genetic_mods=gms)
    b = out["ENCBS000AAA"]
    assert b.genetic_mod_merged == ["ENCGM001", "ENCGM002"]
    # purpose-set ::: category-set — concatenated, NOT cross-deduped
    assert b.genetic_mod_type == ["tagging", "insertion", "tagging"]
    assert b.genetic_mod_method == ["CRISPR", "RNAi"]
    assert b.nucleic_acid_delivery_method == ["transduction", "transfection"]
    assert b.modified_site_by_coordinates_assembly == ["GRCh38"]  # set-merged
    assert b.modified_site_by_coordinates_chromosome == ["chr1", "chr2"]
    assert b.modified_site_by_coordinates_start == [5, 100]
    assert b.modified_site_by_coordinates_end == [6, 200]
    assert b.guide_rna_sequence == ["ACGT", "TTTT"]
    assert b.document == [URL + "/documents/D1/"]
    assert b.treatment == ["T1"]
    assert b.moi == ["high"]
    # second biosample sees only M2 (exploded biosamples_modified)
    h = out["ENCBS000HHH"]
    assert h.genetic_mod_merged == ["ENCGM002"]
    assert h.genetic_mod_method == ["RNAi"]
    # hard-coded-empty reference fields stay empty
    assert b.introduced_tags_name == [] and b.left_rvd_sequence == []


def test_audit_summary_a4(spark):
    rows = [
        _bio(
            audit={
                "WARNING": [{"category": "missing donor", "level": 40}],
                "ERROR": [{"category": "extremely low read depth", "level": 60}],
            }
        ),
        _bio(**{"@id": "/biosamples/ENCBS000III/"}),
    ]
    out = _run(spark, rows)
    assert out["ENCBS000AAA"].max_audit_flag == "red"
    assert out["ENCBS000AAA"].audit_labels == [
        "extremely low read depth", "missing donor",
    ]
    assert out["ENCBS000III"].max_audit_flag is None
    assert out["ENCBS000III"].audit_labels == []


def test_output_width_matches_reference(spark, types_df):
    raw = spark.createDataFrame([_bio()], RAW_BIOSAMPLE_SCHEMA)
    out = transform_biosample(raw, types_df)
    # the reference Biosample row carries ~65 fields; keep the full surface
    assert len(out.columns) >= 60
