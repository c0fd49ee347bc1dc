"""F6 — assay-term → data-modality dictionary (SURVEY.md §2.8 F6).

Reference semantics: AssayActivityTransformations.scala:56-164 — an
~100-entry exact-match lookup from assay term name to a data-modality
label; any unmatched term maps to ``"!" + term`` ("prepend it with ! so it
is easy to search in the DB", AssayActivityTransformations.scala:160-161).
A handful of known terms (FACS CRISPR screen etc.) are explicitly mapped to
their own bang-prefixed form — behaviorally identical to the fallback, so
they need no dictionary entry here.

Two Spark-native implementations with identical semantics:

* ``modality_expr`` — an inline ``map`` literal + ``element_at`` +
  ``coalesce`` fallback. Zero shuffle, zero join; the 100-entry literal is
  folded into the plan and evaluated inside whole-stage codegen. **Default:
  at 100 TB a dictionary this small must never be a join.**
* ``modality_join`` — a broadcast-hash-join against a 100-row dict
  DataFrame. Useful when the dictionary itself is data (e.g. updated
  without code changes); the broadcast mirrors the reference's side-input
  pattern (TransformationPipelineBuilder.scala:131,386-394).

F8 (FileTransformations.scala:27-44) builds on this: a file whose
output_category contains "reference" is ["Genomic_Assembly"], else the
dictionary is mapped over its assay_term_name array.
"""

from __future__ import annotations

import weakref
from itertools import chain

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ASSAY_TERM_TO_MODALITY: dict[str, str] = {
    "3' RACE": "Transcriptomic",
    "4C": "Epigenomic_3D Contact Maps",
    "5' RACE": "Transcriptomic",
    "5' RLM RACE": "Transcriptomic",
    "5C": "Epigenomic_3D Contact Maps",
    "ATAC-seq": "Epigenomic_DNAChromatinAccessibility",
    "Bru-seq": "Transcriptomic_NonTargeted",
    "BruChase-seq": "Transcriptomic_NonTargeted",
    "BruUV-seq": "Transcriptomic_NonTargeted",
    "CAGE": "Transcriptomic_NonTargeted",
    "capture Hi-C": "Epigenomic_3D Contact Maps",
    "ChIA-PET": "Epigenomic_3D Contact Maps",
    "ChIP-seq": "Epigenomic_DNABinding",
    "Circulome-seq": "Genomic",
    "Clone-seq": "Proteomic",
    "comparative genomic hybridization by array": "Genomic_Genotyping",
    "Control ChIP-seq": "Epigenomic_DNABinding",
    "Control eCLIP": "Epigenomic_RNABinding",
    "CRISPR RNA-seq": "Transcriptomic_NonTargeted",
    "CRISPR genome editing followed by RNA-seq": "Transcriptomic_NonTargeted",
    "CRISPRi RNA-seq": "Transcriptomic_NonTargeted",
    "CRISPRi followed by RNA-seq": "Transcriptomic_NonTargeted",
    "CUT&RUN": "Epigenomic_DNABinding",
    "CUT&Tag": "Epigenomic_DNABinding",
    "direct RNA-seq": "Transcriptomic_NonTargeted",
    "DNAme array": "Epigenomic_DNAMethylation",
    "DNA methylation profiling by array assay": "Epigenomic_DNAMethylation",
    "DNA-PET": "Genomic_Genotyping",
    "DNase-seq": "Epigenomic_DNAChromatinAccessibility",
    "eCLIP": "Epigenomic_RNABinding",
    "FAIRE-seq": "Epigenomic_DNAChromatinAccessibility",
    "GM DNase-seq": "Epigenomic_DNAChromatinAccessibility",
    "genetic modification followed by DNase-seq": "Epigenomic_DNAChromatinAccessibility",
    "genotype phasing by HiC": "Genomic_Assembly",
    "GRO-cap": "Transcriptomic_NonTargeted",
    "GRO-seq": "Transcriptomic_NonTargeted",
    "genotyping array": "Genomic_Genotyping",
    "genotyping HTS": "Genomic_Genotyping_Whole Genomic",
    "Hi-C": "Epigenomic_3D Contact Maps",
    "HiC": "Epigenomic_3D Contact Maps",
    "Histone ChIP-seq": "Epigenomic_DNABinding",
    "iCLIP": "Epigenomic_RNABinding",
    "icLASER": "Epigenomic_RNAStructure",
    "icSHAPE": "Epigenomic_RNAStructure",
    "LC/MS label-free quantitative proteomics": "Proteomic",
    "LC-MS/MS isobaric label quantitative proteomics": "Proteomic",
    "long read RNA-seq": "Transcriptomic_NonTargeted",
    "long read single-cell RNA-seq": "Transcriptomic_NonTargeted",
    "MeDIP-seq": "Epigenomic_DNAMethylation",
    "microRNA counts": "Transcriptomic_NonTargeted",
    "microRNA-seq": "Transcriptomic_NonTargeted",
    "Mint-ChIP-seq": "Epigenomic_DNABinding",
    "MNase-seq": "Epigenomic_DNAChromatinAccessibility",
    "MPRA": "Massively parallel reporter assay",
    "MRE-seq": "Epigenomic_DNAMethylation",
    "PAS-seq": "Transcriptomic_NonTargeted",
    "PLAC-seq": "Epigenomic_DNAChromatinAccessibility",
    "pooled clone sequencing": "Library Preparation",
    "polyA minus RNA-seq": "Transcriptomic_NonTargeted",
    "polyA plus RNA-seq": "Transcriptomic_NonTargeted",
    "PRO-cap": "Transcriptomic",
    "PRO-seq": "Transcriptomic",
    "MS-MS": "Proteomic",
    "protein sequencing by tandem mass spectrometry assay": "Proteomic",
    "RAMPAGE": "Transcriptomic_NonTargeted",
    "Repli-chip": "Genomic",
    "Repli-seq": "Genomic",
    "Ribo-seq": "Proteomic",
    "RIP-chip": "Epigenomic_RNABinding",
    "RIP-seq": "Epigenomic_RNABinding",
    "RNA Bind-n-Seq": "Epigenomic_RNABinding",
    "RNA microarray": "Transcriptomic_Targeted",
    "RNA-PET": "Transcriptomic_NonTargeted",
    "RNA-seq": "Transcriptomic_NonTargeted",
    "RRBS": "Epigenomic_DNAMethylation",
    "shRNA RNA-seq": "Transcriptomic_NonTargeted",
    "shRNA knockdown followed by RNA-seq": "Transcriptomic_NonTargeted",
    "scRNA-seq": "Transcriptomic_NonTargeted",
    "single-cell RNA sequencing assay": "Transcriptomic_NonTargeted",
    "single-cell ATAC-seq": "Epigenomic_DNAChromatinAccessibility",
    "snATAC-seq": "Epigenomic_DNAChromatinAccessibility",
    "single-nucleus ATAC-seq": "Epigenomic_DNAChromatinAccessibility",
    "siRNA RNA-seq": "Transcriptomic_NonTargeted",
    "siRNA knockdown followed by RNA-seq": "Transcriptomic_NonTargeted",
    "small RNA-seq": "Transcriptomic_NonTargeted",
    "SPRITE": "Epigenomic_3D Contact Maps",
    "SPRITE-IP": "Epigenomic_3D Contact Maps",
    "STARR-seq": "Massively parallel reporter assay",
    "Switchgear": "Epigenomic_RNABinding",
    "TAB-seq": "Epigenomic_DNAMethylation",
    "TF ChIP-seq": "Epigenomic_DNABinding_TranscriptomeFactorLocation",
    "total RNA-seq": "Transcriptomic_NonTargeted",
    "transcription profiling by array assay": "Transcriptomic_NonTargeted",
    "WGS": "Genomic_Genotyping_Whole Genomic",
    "whole genome sequencing assay": "Genomic_Genotyping_Whole Genomic",
    "WGBS": "Epigenomic_DNAMethylation",
    "whole-genome shotgun bisulfite sequencing": "Epigenomic_DNAMethylation",
}


_MAP_LITERAL_CACHE: "weakref.WeakKeyDictionary[SparkSession, Column]" = (
    weakref.WeakKeyDictionary()
)


def _map_literal() -> Column:
    # ~97 entries × 2 F.lit py4j round trips is ~0.1 s of pure driver
    # time PER CALL (profiled: 0.7 s/epoch across 7 mapper calls).
    # Columns bind by name, not DataFrame, so one built literal serves
    # every plan in a session; the WeakKeyDictionary drops it with the
    # session (bench ladders start several sessions per process).
    spark = SparkSession.getActiveSession()
    if spark is not None:
        col = _MAP_LITERAL_CACHE.get(spark)
        if col is not None:
            return col
    col = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(ASSAY_TERM_TO_MODALITY.items())]
    )
    if spark is not None:
        _MAP_LITERAL_CACHE[spark] = col
    return col


def modality_expr(term: Column | str) -> Column:
    """Dictionary lookup with '!'+term fallback — plan-folded map literal."""
    c = F.col(term) if isinstance(term, str) else term
    return F.coalesce(
        F.element_at(_map_literal(), c),
        F.concat(F.lit("!"), c),
    )


def modality_expr_array(terms: Column | str) -> Column:
    """F8 helper: map the dictionary over an array of terms."""
    c = F.col(terms) if isinstance(terms, str) else terms
    m = _map_literal()
    return F.transform(c, lambda x: F.coalesce(F.element_at(m, x), F.concat(F.lit("!"), x)))


def file_data_modality(output_category: Column | str, assay_terms: Column | str) -> Column:
    """F8 — FileTransformations.scala:27-44: category containing
    'reference' → ['Genomic_Assembly'], else dictionary-map the terms."""
    cat = F.col(output_category) if isinstance(output_category, str) else output_category
    return F.when(
        cat.contains("reference"), F.array(F.lit("Genomic_Assembly"))
    ).otherwise(modality_expr_array(assay_terms))


def modality_dict_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(ASSAY_TERM_TO_MODALITY.items()), "assay_term string, data_modality string"
    )


def modality_join(df: DataFrame, term_col: str, out_col: str = "data_modality") -> DataFrame:
    """Broadcast-join variant: explicit F.broadcast — never a shuffle join."""
    spark = df.sparkSession
    dict_df = F.broadcast(
        modality_dict_df(spark)
        .withColumnRenamed("assay_term", "_mod_term")
        .withColumnRenamed("data_modality", "_mod_value")
    )
    joined = df.join(dict_df, df[term_col] == dict_df["_mod_term"], "left")
    return joined.withColumn(
        out_col,
        F.coalesce(F.col("_mod_value"), F.concat(F.lit("!"), F.col(term_col))),
    ).drop("_mod_term", "_mod_value")
