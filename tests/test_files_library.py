"""File + Library mapper fidelity — semantics mirrored from
FileTransformations.scala:91-152 (modality override, paired-end decode,
library linkage via biosample intersection) and
LibraryTransformations.scala:19-52 (strand-specificity placeholder)."""

from encode_ingest_spark.entities import (
    RAW_FILE_SCHEMA,
    RAW_FULL_LIBRARY_SCHEMA,
    transform_file,
    transform_library,
)

URL = "https://www.encodeproject.org"


def _file(**over):
    base = dict.fromkeys(
        [
            "dbxrefs", "assay_term_name", "file_format", "file_format_type",
            "platform", "quality_metrics", "read_count", "read_length",
            "genome_annotation", "origin_batches", "donors", "derived_from",
            "assembly", "run_type", "paired_end", "paired_with", "file_size",
            "md5checksum", "step_run", "audit",
        ]
    )
    base.update(
        {
            "@id": "/files/ENCFF000AAA/",
            "date_created": "2021-06-01T00:00:00+00:00",
            "output_category": "raw data",
            "award": "/awards/a/",
            "lab": "/labs/l/",
            "submitted_by": "/users/u/",
        }
    )
    base.update(over)
    return base


def _lib(**over):
    base = dict.fromkeys(
        [
            "dbxrefs", "queried_RNP_size_range", "rna_integrity_number",
            "size_range", "strand_specificity", "treatments", "spikeins_used",
            "biosample", "mixed_biosamples", "nucleic_acid_term_id",
            "nucleic_acid_term_name", "product_id", "lot_id",
        ]
    )
    base.update(
        {
            "@id": "/libraries/ENCLB000AAA/",
            "date_created": "2021-01-01T00:00:00+00:00",
            "award": "/awards/a/",
            "lab": "/labs/l/",
            "submitted_by": "/users/u/",
        }
    )
    base.update(over)
    return base


def test_library_mapper_fields(spark):
    rows = [
        _lib(
            strand_specificity="forward",
            spikeins_used=["/references/ENCSR001/", "/references/ENCSR002/"],
            biosample="/biosamples/ENCBS1/",
            treatments=["/treatments/T1/"],
            rna_integrity_number=8.5,
            nucleic_acid_term_id="SO:0000356",
            nucleic_acid_term_name="RNA",
        ),
        _lib(
            **{"@id": "/libraries/ENCLB000BBB/"},
            strand_specificity="strand-specific",
        ),
        _lib(**{"@id": "/libraries/ENCLB000CCC/"}),
    ]
    raw = spark.createDataFrame(rows, RAW_FULL_LIBRARY_SCHEMA)
    out = {r.library_id: r for r in transform_library(raw).collect()}
    a = out["ENCLB000AAA"]
    assert a.label == "ENCLB000AAA"
    assert a.xref == [URL + "/libraries/ENCLB000AAA/"]
    assert (a.library_layout, a.paired_end_type) == (True, "forward")
    assert a.used_by == ["ENCSR001", "ENCSR002"]
    assert a.uses_sample_biosample_id == "ENCBS1"
    assert a.sample_treatment == [URL + "/treatments/T1/"]
    assert a.rna_integrity_number == 8.5
    assert (a.prep_material, a.prep_material_name) == ("SO:0000356", "RNA")
    # the legacy placeholder: layout true, paired_end_type filtered
    b = out["ENCLB000BBB"]
    assert (b.library_layout, b.paired_end_type) == (True, None)
    c = out["ENCLB000CCC"]
    assert (c.library_layout, c.paired_end_type) == (False, None)


def test_file_modality_and_scalars(spark):
    rows = [
        _file(assay_term_name=["RNA-seq", "made-up assay"]),
        _file(
            **{"@id": "/files/ENCFF000BBB/"},
            output_category="reference",
            assay_term_name=["RNA-seq"],
        ),
        _file(
            **{"@id": "/files/ENCFF000CCC/"},
            output_category="alignment",
            run_type="paired-ended",
            paired_end="1,2",
            paired_with="/files/ENCFF000AAA/",
        ),
        _file(**{"@id": "/files/ENCFF000DDD/"}, paired_end="2"),
    ]
    raw = spark.createDataFrame(rows, RAW_FILE_SCHEMA)
    out = {r.file_id: r for r in transform_file(raw).collect()}
    a = out["ENCFF000AAA"]
    assert a.data_modality == ["Transcriptomic_NonTargeted", "!made-up assay"]
    assert a.file_type == "Sequence"
    assert a.file_ref is None
    assert a.library_id == []  # no library side input
    b = out["ENCFF000BBB"]
    assert b.data_modality == ["Genomic_Assembly"]  # reference override
    c = out["ENCFF000CCC"]
    assert c.file_type == "Alignment"
    assert c.library_layout is True
    assert c.paired_end_identifier is None  # "1,2" → warn-and-null
    assert c.paired_with_file_id == "ENCFF000AAA"
    d = out["ENCFF000DDD"]
    assert d.paired_end_identifier == 2


def test_file_library_linkage_j14(spark):
    files = spark.createDataFrame(
        [
            _file(origin_batches=["/biosamples/B1/", "/biosamples/B2/"]),
            _file(**{"@id": "/files/ENCFF000BBB/"},
                  origin_batches=["/biosamples/B3/"]),
            _file(**{"@id": "/files/ENCFF000CCC/"}),  # null origin_batches
            _file(**{"@id": "/files/ENCFF000DDD/"},
                  origin_batches=["/biosamples/NOPE/"]),
        ],
        RAW_FILE_SCHEMA,
    )
    libs = spark.createDataFrame(
        [
            _lib(biosample="/biosamples/B1/"),
            _lib(**{"@id": "/libraries/ENCLB000BBB/"},
                 mixed_biosamples=["/biosamples/B2/", "/biosamples/B9/"]),
            _lib(**{"@id": "/libraries/ENCLB000CCC/"},
                 biosample="/biosamples/B3/"),
        ],
        RAW_FULL_LIBRARY_SCHEMA,
    )
    out = {r.file_id: r for r in transform_file(files, libs).collect()}
    # scalar-biosample and mixed_biosamples matches both collected, sorted
    assert out["ENCFF000AAA"].library_id == ["ENCLB000AAA", "ENCLB000BBB"]
    assert out["ENCFF000BBB"].library_id == ["ENCLB000CCC"]
    assert out["ENCFF000CCC"].library_id == []  # absent origin_batches
    assert out["ENCFF000DDD"].library_id == []  # no intersection
