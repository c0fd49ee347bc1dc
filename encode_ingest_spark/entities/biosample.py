"""Biosample entity mapper — the reference's widest, hardest transform.

Field-for-field parity with BiosampleTransformations.scala:15-197:
~65 output fields over four inputs — the raw biosample document, its
(optional) biosample-type record, the libraries keyed by biosample
(TransformationPipelineBuilder.scala:226-231), and the genetic
modifications exploded out of each mod's ``biosamples_modified`` array
(TransformationPipelineBuilder.scala:233-242).

Spark-first shape:

* the two "Iterable[Msg]" side inputs become **aggregate-then-join**
  DataFrames (J2): libraries/mods are grouped to one row per biosample
  *before* the join, so the join shuffle carries one row per key;
* every per-field rule is a native Column expression (codegen'd) from
  the scalar library — F1 id minting, F3 url prefixing, F4 age bounds,
  F13 date→midnight, F14 dynamic life-stage field, F15 classification
  routing, F16 xref cons, F18 warn-and-null, A4 audit summarization,
  A5 in-record set-dedup;
* the reference's ``toSet.toList`` merges are unordered; we emit
  ``sort_array(array_distinct(...))`` — a deterministic canonicalization
  of the same set (required for replay-stable output and oracles).

Reference quirks preserved: ``geneticModType`` concatenates the
"purpose" set and the "category" set *without* re-deduping across them
(BiosampleTransformations.scala:132-133 ``:::``); the reference reads
the raw keys ``"purpose "`` (trailing space) and ``"rnai_seqeunces"``
(typo) — our fixed-schema columns are spelled ``purpose`` /
``rnai_sequences`` and the mapping is noted here; ``introducedTags*``
and ``*RvdSequence`` are hard-coded empty lists in the reference
(lines 151-157, 169-177 commented out) and stay empty here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.memo import session_memo
from ..functions import (
    age_lower_bound,
    age_upper_bound,
    audit_labels,
    audit_level_color,
    classification_route,
    cons_array,
    date_to_midnight_ts,
    single_or_null,
    to_encode_url,
    to_encode_url_array,
    transform_id,
)

# Raw biosample document shape (the fields the mapper reads; FIXTURES.md §4).
RAW_BIOSAMPLE_SCHEMA = (
    "`@id` string, dbxrefs array<string>, date_created string, "
    "age string, age_units string, organism string, "
    "human_life_stage string, mouse_life_stage string, "
    "source string, date_obtained string, part_of string, "
    "preservation_method string, url string, donor string, "
    "disease_term_id array<string>, award string, lab string, "
    "cell_isolation_method string, applied_modifications array<string>, "
    "health_status string, treatments array<string>, perturbed boolean, "
    "submitted_by string, biosample_ontology string, "
    "audit map<string, array<struct<category: string, level: bigint>>>"
)

RAW_BIOSAMPLE_TYPE_SCHEMA = (
    "`@id` string, classification string, term_id string, "
    "organ_slims array<string>, cell_slims array<string>"
)

RAW_LIBRARY_SCHEMA = "`@id` string, biosample string, product_id string, lot_id string"

RAW_GENETIC_MOD_SCHEMA = (
    "`@id` string, biosamples_modified array<string>, accession string, "
    "pertubation string, purpose string, category string, method string, "
    "nucleic_acid_delivery_method array<string>, "
    "modified_site_by_target_id string, modified_site_by_gene_id string, "
    "modified_site_nonspecific string, "
    "modified_site_by_coordinates struct<assembly: string, chromosome: string, "
    "start: bigint, end: bigint>, "
    "introduced_elements string, guide_type string, introduced_sequence string, "
    "introduced_gene string, introduced_elements_donor string, "
    "introduced_elements_organism string, guide_rna_sequences array<string>, "
    "rnai_sequences array<string>, documents array<string>, "
    "treatments array<string>, zygosity string, moi string, "
    "crispr_system array<string>, cas_species string, description string"
)

#: organisms whose ``{organism}_life_stage`` dynamic field exists in raw
#: biosamples (BiosampleTransformations.scala:46-48: the field *name* is
#: computed from the organism id — relationally, a coalesced when-cascade
#: over the known organisms, F14).
LIFE_STAGE_ORGANISMS = ("human", "mouse")

def _empty() -> Column:
    """Empty array<string> literal (built lazily — Column construction
    needs an active session)."""
    return F.array().cast("array<string>")


def _set_agg(col: Column) -> Column:
    """``.flatten.toSet.toList`` of optional scalars, canonicalized
    (collect_set drops nulls = Scala's Option.flatten)."""
    return F.sort_array(F.collect_set(col))


def _set_agg_list(col: Column) -> Column:
    """``flatMap(tryRead[List]).flatten.toSet.toList`` of optional lists."""
    return F.sort_array(F.array_distinct(F.flatten(F.collect_list(col))))


def grouped_libraries(libraries: DataFrame) -> DataFrame:
    """One row per biosample: part-number/lot-id sets + minted library ids
    (BiosampleTransformations.scala:33-40; keying at
    TransformationPipelineBuilder.scala:226-231)."""
    return libraries.groupBy(F.col("biosample").alias("_bio_id")).agg(
        _set_agg(F.col("product_id")).alias("_part_numbers"),
        _set_agg(F.col("lot_id")).alias("_lot_ids"),
        F.sort_array(F.collect_list(transform_id(F.col("@id")))).alias(
            "_library_prep_ids"
        ),
    )


def grouped_genetic_mods(genetic_mods: DataFrame) -> DataFrame:
    """Explode ``biosamples_modified`` (one mod can modify many samples,
    TransformationPipelineBuilder.scala:233-242), then one row per
    biosample with every merged-set attribute the mapper consumes
    (BiosampleTransformations.scala:22-28,131-196)."""
    gm = genetic_mods.select(
        F.explode("biosamples_modified").alias("_bio_id"), "*"
    )
    coords = F.col("modified_site_by_coordinates")
    return gm.groupBy("_bio_id").agg(
        _set_agg(F.col("accession")).alias("_gm_merged"),
        _set_agg(F.col("pertubation")).alias("_gm_perturbation"),
        # geneticModType = purpose-set ::: category-set (list concat, NOT
        # re-deduped across the two sets — reference :132-133)
        _set_agg(F.col("purpose")).alias("_gm_purpose"),
        _set_agg(F.col("category")).alias("_gm_category"),
        _set_agg(F.col("method")).alias("_gm_method"),
        _set_agg_list(F.col("nucleic_acid_delivery_method")).alias("_gm_nadm"),
        _set_agg(F.col("modified_site_by_target_id")).alias("_gm_site_target"),
        _set_agg(F.col("modified_site_by_gene_id")).alias("_gm_site_gene"),
        _set_agg(F.col("modified_site_nonspecific")).alias("_gm_site_nonspec"),
        _set_agg(coords["assembly"]).alias("_gm_coord_assembly"),
        _set_agg(coords["chromosome"]).alias("_gm_coord_chromosome"),
        _set_agg(coords["start"]).alias("_gm_coord_start"),
        _set_agg(coords["end"]).alias("_gm_coord_end"),
        _set_agg(F.col("introduced_elements")).alias("_gm_introduced_elements"),
        _set_agg(F.col("guide_type")).alias("_gm_guide_type"),
        _set_agg(F.col("introduced_sequence")).alias("_gm_introduced_sequence"),
        _set_agg(F.col("introduced_gene")).alias("_gm_introduced_gene"),
        _set_agg(F.col("introduced_elements_donor")).alias("_gm_ie_donor"),
        _set_agg(F.col("introduced_elements_organism")).alias("_gm_ie_organism"),
        _set_agg_list(F.col("guide_rna_sequences")).alias("_gm_guide_rna"),
        _set_agg_list(F.col("rnai_sequences")).alias("_gm_rnai"),
        _set_agg_list(F.col("documents")).alias("_gm_documents"),
        _set_agg_list(F.col("treatments")).alias("_gm_treatments"),
        _set_agg(F.col("zygosity")).alias("_gm_zygosity"),
        _set_agg(F.col("moi")).alias("_gm_moi"),
        _set_agg_list(F.col("crispr_system")).alias("_gm_crispr"),
        _set_agg(F.col("cas_species")).alias("_gm_cas_species"),
        _set_agg(F.col("description")).alias("_gm_description"),
    )


def life_stage_expr(
    organism_type: Column, organisms: tuple[str, ...] = LIFE_STAGE_ORGANISMS
) -> Column:
    """F14 — the dynamic ``{organism}_life_stage`` read
    (BiosampleTransformations.scala:46-48,72). Unknown organism → null
    (the dynamic field would be absent)."""
    expr = None
    for org in organisms:
        cond = organism_type == org
        col = F.col(f"{org}_life_stage")
        expr = F.when(cond, col) if expr is None else expr.when(cond, col)
    return expr


def transform_biosample(
    raw: DataFrame,
    types: DataFrame | None = None,
    libraries: DataFrame | None = None,
    genetic_mods: DataFrame | None = None,
    organisms: tuple[str, ...] = LIFE_STAGE_ORGANISMS,
) -> DataFrame:
    """The full Biosample mapper. ``types`` is broadcast (tiny ontology
    dim, J1); ``libraries``/``genetic_mods`` are pre-grouped (J2). Omitted
    inputs behave as "no matching records" — empty iterables in the
    reference."""
    bio = raw
    # ---- J1: biosample ⟕ type (broadcast) ----
    if types is not None:
        t = F.broadcast(
            types.select(
                F.col("@id").alias("_type_id"),
                F.col("classification").alias("_classification"),
                F.col("term_id").alias("_term_id"),
                F.col("organ_slims").alias("_organ_slims"),
                F.col("cell_slims").alias("_cell_slims"),
            )
        )
        bio = bio.join(t, bio["biosample_ontology"] == t["_type_id"], "left").drop(
            "_type_id"
        )
    else:
        bio = (
            bio.withColumn("_classification", F.lit(None).cast("string"))
            .withColumn("_term_id", F.lit(None).cast("string"))
            .withColumn("_organ_slims", F.lit(None).cast("array<string>"))
            .withColumn("_cell_slims", F.lit(None).cast("array<string>"))
        )
    # ---- J2: ⟕ grouped libraries / genetic mods ----
    if libraries is not None:
        bio = bio.join(
            grouped_libraries(libraries), bio["@id"] == F.col("_bio_id"), "left"
        ).drop("_bio_id")
    if genetic_mods is not None:
        bio = bio.join(
            grouped_genetic_mods(genetic_mods), bio["@id"] == F.col("_bio_id"), "left"
        ).drop("_bio_id")

    key = ("biosample_cols", libraries is not None,
           genetic_mods is not None, organisms)
    return bio.select(*session_memo(
        key,
        lambda: _biosample_cols(
            libraries is not None, genetic_mods is not None, organisms
        ),
    ))


def _biosample_cols(has_libraries: bool, has_gm: bool,
                    organisms: tuple[str, ...]) -> list:
    """The biosample projection for a given input-presence shape,
    built once per session per shape (see functions.memo)."""
    def gm(name: str, typ: str = "array<string>") -> Column:
        if not has_gm:
            return F.array().cast(typ)
        return F.coalesce(F.col(name), F.array().cast(typ))

    bid = transform_id(F.col("@id"))
    classification = F.col("_classification")
    # organism_type: minted organism id, "" when absent (reference :47)
    organism_type = F.coalesce(transform_id(F.col("organism")), F.lit(""))
    term_as_list = F.when(
        F.col("_term_id").isNotNull(), F.array(F.col("_term_id"))
    ).otherwise(_empty())
    # F15 routing (reference :53-60, :83-93)
    anatomical_site_list = classification_route(
        classification,
        [
            (("tissue", "organoid"), term_as_list),
            (
                ("cell line", "primary cell", "in vitro differentiated cells"),
                F.coalesce(F.col("_organ_slims"), _empty()),
            ),
        ],
        default=_empty(),
    )
    apriori_cell_type = classification_route(
        classification,
        [
            (
                ("tissue", "organoid", "cell line"),
                F.coalesce(F.col("_cell_slims"), _empty()),
            ),
            (("primary cell", "in vitro differentiated cells"), term_as_list),
        ],
        default=_empty(),
    )
    cell_line = classification_route(
        classification, [(("cell line",), F.col("_term_id"))]
    )

    parts = F.coalesce(F.col("_part_numbers"), _empty()) if has_libraries else _empty()
    lots = F.coalesce(F.col("_lot_ids"), _empty()) if has_libraries else _empty()
    lib_ids = F.coalesce(F.col("_library_prep_ids"), _empty()) if has_libraries else _empty()

    return [
        bid.alias("biosample_id"),
        bid.alias("label"),
        cons_array(to_encode_url(F.col("@id")), F.col("dbxrefs")).alias("xref"),
        F.to_timestamp("date_created").alias("date_created"),
        age_lower_bound("age").alias("donor_age_at_collection_lower_bound"),
        age_upper_bound("age").alias("donor_age_at_collection_upper_bound"),
        F.col("age_units").alias("donor_age_at_collection_unit"),
        life_stage_expr(organism_type, organisms).alias(
            "donor_age_at_collection_life_stage"
        ),
        F.lit(None).cast("string").alias("donor_age_at_collection_age_category"),
        to_encode_url(F.col("source")).alias("source"),
        date_to_midnight_ts("date_obtained").alias("date_collected"),
        F.array(F.lit("ENCODE")).alias("part_of_dataset_id"),
        transform_id(F.col("part_of")).alias("derived_from_biosample_id"),
        F.get(anatomical_site_list, 0).alias("anatomical_site"),
        classification.alias("biosample_type"),
        apriori_cell_type.alias("apriori_cell_type"),
        cell_line.alias("cell_line"),
        F.col("preservation_method").alias("preservation_state"),
        F.col("url").alias("see_also"),
        F.when(
            F.col("donor").isNotNull(), F.array(transform_id(F.col("donor")))
        )
        .otherwise(_empty())
        .alias("donor_id"),
        audit_labels("audit").alias("audit_labels"),
        audit_level_color("audit").alias("max_audit_flag"),
        _empty().alias("diagnosis_id"),
        F.get(F.col("disease_term_id"), 0).alias("disease"),
        to_encode_url(F.col("award")).alias("award"),
        F.col("cell_isolation_method").alias("cell_isolation_method"),
        to_encode_url_array(
            F.coalesce(F.col("applied_modifications"), _empty())
        ).alias("genetic_mod"),
        F.col("health_status").alias("health_status"),
        to_encode_url(F.col("lab")).alias("lab"),
        to_encode_url_array(F.coalesce(F.col("treatments"), _empty())).alias(
            "sample_treatment"
        ),
        F.col("perturbed").alias("was_perturbed"),
        to_encode_url(F.col("submitted_by")).alias("submitted_by"),
        single_or_null(parts).alias("part_number"),
        single_or_null(lots).alias("lot"),
        lib_ids.alias("library_prep_id"),
        gm("_gm_merged").alias("genetic_mod_merged"),
        gm("_gm_perturbation").alias("perturbation"),
        F.concat(gm("_gm_purpose"), gm("_gm_category")).alias("genetic_mod_type"),
        gm("_gm_method").alias("genetic_mod_method"),
        gm("_gm_nadm").alias("nucleic_acid_delivery_method"),
        to_encode_url_array(gm("_gm_site_target")).alias("modified_site_by_target"),
        to_encode_url_array(gm("_gm_site_gene")).alias("modified_site_by_gene"),
        gm("_gm_site_nonspec").alias("modified_site_nonspecific"),
        gm("_gm_coord_assembly").alias("modified_site_by_coordinates_assembly"),
        gm("_gm_coord_chromosome").alias("modified_site_by_coordinates_chromosome"),
        gm("_gm_coord_start", "array<bigint>").alias(
            "modified_site_by_coordinates_start"
        ),
        gm("_gm_coord_end", "array<bigint>").alias("modified_site_by_coordinates_end"),
        gm("_gm_introduced_elements").alias("introduced_elements"),
        gm("_gm_guide_type").alias("guide_type"),
        gm("_gm_introduced_sequence").alias("introduced_sequence"),
        gm("_gm_introduced_gene").alias("introduced_gene"),
        _empty().alias("introduced_tags_name"),
        _empty().alias("introduced_tags_location"),
        _empty().alias("introduced_tags_promoter_used"),
        gm("_gm_ie_donor").alias("introduced_elements_donor"),
        gm("_gm_ie_organism").alias("introduced_elements_organism"),
        gm("_gm_guide_rna").alias("guide_rna_sequence"),
        gm("_gm_rnai").alias("rnai_sequence"),
        _empty().alias("left_rvd_sequence"),
        _empty().alias("right_rvd_sequence"),
        to_encode_url_array(gm("_gm_documents")).alias("document"),
        F.transform(gm("_gm_treatments"), lambda t: transform_id(t)).alias(
            "treatment"
        ),
        gm("_gm_zygosity").alias("zygosity"),
        gm("_gm_moi").alias("moi"),
        gm("_gm_crispr").alias("crispr_system"),
        gm("_gm_cas_species").alias("cas_species"),
        gm("_gm_description").alias("description"),
    ]
