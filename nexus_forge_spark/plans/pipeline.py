"""End-to-end KG construction plan: documents -> mentions -> resolve ->
triples, the Spark re-expression of the reference's
map -> resolve -> validate -> register loop (SURVEY.md §3).

Two resolve passes, mirroring the reference's strategy ladder:
exact pass first (cheapest predicate), then the fuzzy pass only over
mentions the exact pass missed (left-anti join) — the set-oriented version
of "try EXACT_MATCH, fall back to BEST_MATCH" rules seen in fixture
mappings (e.g. Example.hjson ternary with resolve fallback).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexus_forge_spark import dims
from nexus_forge_spark.operators import mentions as M
from nexus_forge_spark.operators import resolve as R
from nexus_forge_spark.operators import triples as T


def construct_kg(
    documents: DataFrame,
    alias_table: DataFrame | None = None,
    fuzzy: bool = True,
    limit: int = 10,
) -> DataFrame:
    """Interleaved documents -> deduplicated annotation + media triples."""
    spark = documents.sparkSession
    if alias_table is None:
        alias_table = R.build_alias_table(
            dims.ontology_terms_idx(spark), dims.ONTOLOGY_MATCH_PROPS
        )

    # NOTE on two measured non-wins (BENCH.md "Round-2 pipeline probes"):
    # (a) mention_prefilter in-line: lossless and correct, but this
    #     synthetic corpus draws its text FROM the dictionary vocabulary,
    #     so the trigram filter only drops 33% and measures wall-neutral —
    #     it stays an opt-in operator for realistic corpora where garbage
    #     n-grams dominate (selectivity 1-10%);
    # (b) checkpointing the mention stream to avoid the double explode
    #     (vocab branch + join-back branch): materializing 42M rows costs
    #     MORE than re-running the map-side explode (25.4s -> 32.0s at
    #     local[8]) — recompute beats spill for cheap map-side lineage.
    # Narrow occurrence stream: the annotation output dedups on
    # (doc_id, entity_id), so token/span positions are dead columns — the
    # string-only extractor halves the bytes materialized per exploded row
    # (no position structs, concat_ws n-grams instead of slice+array_join,
    # per-span array_distinct before the explode).  Both passes over the
    # corpus (vocab branch + join-back branch) get cheaper.
    occ = M.extract_mention_occurrences(documents)
    if fuzzy:
        # ONE corpus scan, ZERO corpus-side aggregation: the ladder argmin
        # is pre-reduced into the broadcast index (fuzzy-best per substring
        # key, exact-best per verbatim alias), so the corpus side is two
        # broadcast hash joins + a projection (resolve_ladder_inline).
        # Replaces the round-1 shape (distinct-vocab branch + NLJ ladder +
        # join-back, 2x corpus scans) and the mid-round-2 packed-min
        # per-(doc,mention) aggregate (~20s reduce time at 1M docs).  The
        # dim here is broadcast-sized; at a 10^6-term dictionary switch to
        # resolve_ladder_blocked (trigram blocking).
        resolved = R.resolve_ladder_inline(occ, alias_table, keys=["doc_id", "mention"])
    else:
        resolved = R.resolve_distinct(
            occ, alias_table, R.EXACT_MATCH, keys=["doc_id", "mention"]
        )

    # graph set semantics, enforced BEFORE string materialization: the two
    # stages emit disjoint predicates, and within a stage (subj,pred,obj) is
    # 1:1 with the narrow key — so dedup shuffles (doc_id, id) longs/shorts
    # instead of 2x as many fully-built triple strings, and the final
    # dropDuplicates pass disappears.
    ann = resolved.select("doc_id", "entity_id").dropDuplicates(["doc_id", "entity_id"])
    return T.resolved_to_triples(ann).unionByName(
        T.media_to_triples(documents, dedup=True)
    )


def write_triples(triples: DataFrame, path: str, partitions: int | None = None) -> None:
    """Materialize to parquet partitioned by predicate; on a cluster this is
    an Iceberg `writeTo(...).append()` — predicate partitioning gives
    partition pruning for per-predicate consumers."""
    out = triples
    if partitions:
        out = out.repartitionByRange(partitions, "doc_id")
    out.write.mode("overwrite").partitionBy("stage").parquet(path)
