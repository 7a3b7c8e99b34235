"""Canonicalization: connected components over sameAs edges.

The reference resolves each mention independently to one canonical ontology
id; co-reference is "same resolved id" (SURVEY.md R17).  Entities that share
an alias value (e.g. MergeJoin altLabel 'sort merge join' == SortMergeJoin
label) are the sameAs edge set; canonical id = min(id) of the connected
component.

Algorithm: alternating large-star/small-star style min-label propagation on
DataFrames (no GraphFrames dependency).  Each iteration is one shuffle-join
keyed on entity id; components converge in O(log n) iterations for real
graphs.  Per-iteration ``localCheckpoint`` truncates the lineage so the plan
does not grow unboundedly at 10^9-edge scale (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sameas_edges(alias_table: DataFrame) -> DataFrame:
    """Entities sharing an alias string -> symmetric (a, b) edge set."""
    l = alias_table.select(F.col("alias"), F.col("entity_id").alias("a")).alias("l")
    r = alias_table.select(F.col("alias"), F.col("entity_id").alias("b")).alias("r")
    return (
        l.join(r, F.col("l.alias") == F.col("r.alias"))
        .where(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )


def connected_components(
    edges: DataFrame, nodes: DataFrame | None = None, max_iter: int = 20
) -> DataFrame:
    """edges(a, b) [+ optional nodes(entity_id)] -> (entity_id, canonical_id).

    Min-label propagation: comp(v) starts at v; each round takes the min of
    the neighbourhood's current labels; stops when no label changes.
    """
    spark = edges.sparkSession
    sym = edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.distinct().localCheckpoint(eager=True)

    if nodes is None:
        nodes = sym.select(F.col("a").alias("entity_id")).distinct()
    labels = nodes.select("entity_id", F.col("entity_id").alias("canonical_id"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # candidate label for each node = min(own, min over neighbours' labels)
        nbr = (
            sym.join(labels, sym["b"] == labels["entity_id"])
            .select(F.col("a").alias("entity_id"), "canonical_id")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("entity_id")
            .agg(F.min("canonical_id").alias("canonical_id"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "entity_id")
            .where(F.col("n.canonical_id") != F.col("o.canonical_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonicalize_triples(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj/obj to canonical ids via two left joins (broadcast: the
    mapping is entity-count-sized, tiny next to the triple set)."""
    m_obj = F.broadcast(
        mapping.select(F.col("entity_id").alias("_o"), F.col("canonical_id").alias("_oc"))
    )
    m_subj = F.broadcast(
        mapping.select(F.col("entity_id").alias("_s"), F.col("canonical_id").alias("_sc"))
    )
    return (
        triples.join(m_obj, triples["obj"] == F.col("_o"), "left")
        .join(m_subj, triples["subj"] == F.col("_s"), "left")
        .withColumn("obj", F.coalesce(F.col("_oc"), F.col("obj")))
        .withColumn("subj", F.coalesce(F.col("_sc"), F.col("subj")))
        .drop("_o", "_oc", "_s", "_sc")
    )
