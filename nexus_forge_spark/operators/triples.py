"""Triple materialization: pipeline outputs -> deduplicated (subj, pred, obj).

Reference analogue: ``as_graph`` explodes a Resource tree into rdflib triples
(kgforge/core/conversions/rdf.py:275-312); rdflib.Graph is a *set*, so output
parity requires dedup on (subj, pred, obj).  Blank nodes are replaced by
deterministic skolem IRIs (hash of doc_id + path) so triple sets compare
stably across runs — rdflib bnode ids are not stable (SURVEY.md §4.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "rdf:type"
PRED_HAS_BODY = "nsg:hasBody"
PRED_DISTRIBUTION = "schema:distribution"
XSD_STRING = "xsd:string"


def doc_subject(doc_id_col) -> F.Column:
    """Deterministic skolem subject IRI for a document."""
    return F.concat(F.lit("doc:"), doc_id_col)


def resolved_to_triples(resolved: DataFrame, pred: str = PRED_HAS_BODY) -> DataFrame:
    """resolved(doc_id, ..., entity_id) -> annotation triples."""
    return resolved.select(
        doc_subject(F.col("doc_id")).alias("subj"),
        F.lit(pred).alias("pred"),
        F.col("entity_id").alias("obj"),
        F.lit(False).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.col("doc_id").alias("doc_id"),
        F.lit("resolve").alias("stage"),
    )


def media_to_triples(documents: DataFrame, dedup: bool = False) -> DataFrame:
    """kind='media' spans -> distribution triples (the LazyAction/forge.attach
    analogue: media refs are data, 'executed' as a column expr —
    core/forge.py:798-809, commons/actions.py:62-113).

    dedup=True applies graph set semantics on the narrow (doc_id, ref) key
    before the triple strings are built — cheaper shuffle rows."""
    refs = (
        documents.select("doc_id", F.explode("spans").alias("span"))
        .where(F.col("span.kind") == "media")
        .select("doc_id", F.col("span.media_ref").alias("ref"))
    )
    if dedup:
        refs = refs.dropDuplicates(["doc_id", "ref"])
    return refs.select(
        doc_subject(F.col("doc_id")).alias("subj"),
        F.lit(PRED_DISTRIBUTION).alias("pred"),
        F.col("ref").alias("obj"),
        F.lit(False).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.col("doc_id").alias("doc_id"),
        F.lit("media").alias("stage"),
    )


def dedup_triples(triples: DataFrame) -> DataFrame:
    """Graph set semantics: one row per (subj, pred, obj).  This is the one
    required shuffle of the materialize stage; AQE coalesces the output."""
    return triples.dropDuplicates(["subj", "pred", "obj"])


def triple_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Snapshot delta between two KG triple sets: which (subj, pred, obj)
    facts were added / removed between snapshot *old* and snapshot *new*.

    The KG-maintenance primitive a periodic re-crawl pipeline needs: diff
    yesterday's materialized graph against today's so downstream consumers
    ingest a delta instead of the full graph.  Set semantics on both sides
    (rdflib.Graph is a set — kgforge/core/conversions/rdf.py:275-312 —
    so duplicates within a snapshot are not changes).

    Scale posture: ONE shuffle.  Both snapshots are tagged map-side and
    unioned, then a single hash aggregation on (subj, pred, obj) with
    map-side partial combine decides presence on each side; rows present
    on both sides collapse and are filtered out BEFORE any further stage.
    This beats the two anti-join formulation (old EXCEPT new UNION new
    EXCEPT old), which shuffles both inputs twice.

    Output: (subj, pred, obj, change) with change in {'added', 'removed'}.
    """
    o = old.select(
        "subj", "pred", "obj",
        F.lit(1).alias("_in_old"), F.lit(0).alias("_in_new"),
    )
    n = new.select(
        "subj", "pred", "obj",
        F.lit(0).alias("_in_old"), F.lit(1).alias("_in_new"),
    )
    presence = (
        o.unionByName(n)
        .groupBy("subj", "pred", "obj")
        .agg(
            F.max("_in_old").alias("_in_old"),
            F.max("_in_new").alias("_in_new"),
        )
    )
    return presence.where(F.col("_in_old") != F.col("_in_new")).select(
        "subj",
        "pred",
        "obj",
        F.when(F.col("_in_new") == 1, F.lit("added"))
        .otherwise(F.lit("removed"))
        .alias("change"),
    )
