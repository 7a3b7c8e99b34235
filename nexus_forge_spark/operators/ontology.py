"""Ontology-structure operators: subClassOf transitive closure, instance
rollup up the class hierarchy, and rdf:first/rdf:rest list flattening.

The reference ships class hierarchies in its resolver fixtures (demo
resolver targets carry a ``subClassOf`` field, tests/data/demo-resolver/
*.json; our embedded dims mirror it, nexus_forge_spark/dims.py
ONTOLOGY_ROWS) and its RDF service materializes rdflib graphs where
containers arrive as rdf:first/rdf:rest cons chains
(kgforge/specializations/stores/nexus/service.py json-ld handling).  It
never *computes* over the hierarchy at scale — these operators add the
batch semantics a KG-construction pipeline needs: RDFS entailment-style
ancestor closure (rdfs11 subClassOf transitivity) and ordered list
reassembly.

Scale design: both closures are ITERATIVE-DOUBLING joins — depth-d
hierarchies and length-L lists converge in ceil(log2) rounds, not d/L
rounds; each round is one shuffle keyed on the hop node, with
``localCheckpoint`` truncating lineage.  Ontology class universes are
10^2..10^6 rows (always broadcastable against a 10^12-instance fact
side), and rdf lists in practice are short (bounded per-document spans);
the O(L^2) pair closure a doubling walk materializes is bounded by
sum_of_squares over per-list lengths, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ClosureError(RuntimeError):
    """Transitive closure did not converge within max_rounds."""


def transitive_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_rounds: int = 20,
) -> DataFrame:
    """(child, parent) edges -> all (node, ancestor) pairs, node <> ancestor.

    Iterative doubling: reach_{k+1} = reach_k UNION (reach_k JOIN reach_k),
    so a depth-d DAG converges in ceil(log2 d) joins (2^20-deep hierarchies
    at the default).  Convergence is detected by a stable pair count; a
    cyclic input still converges (the closure of a finite graph is finite)
    and surfaces as mutual (a, b)/(b, a) ancestor pairs the caller can
    detect.  Raises ClosureError past max_rounds.
    """
    reach = (
        edges.select(F.col(child_col).alias("node"), F.col(parent_col).alias("anc"))
        .where(F.col("node") != F.col("anc"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = reach.count()
    for _ in range(max_rounds):
        hop = reach.select(F.col("node").alias("_j"), F.col("anc"))
        step = (
            reach.select("node", F.col("anc").alias("_j"))
            .join(hop, "_j")
            .select("node", "anc")
        )
        nxt = (
            reach.unionByName(step)
            .where(F.col("node") != F.col("anc"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n2 = nxt.count()
        if n2 == n:
            return nxt
        reach, n = nxt, n2
    raise ClosureError(f"transitive_closure: not converged in {max_rounds} rounds")


def class_rollup(
    instances: DataFrame,
    subclass: DataFrame,
    instance_col: str = "instance",
    class_col: str = "cls",
    child_col: str = "child",
    parent_col: str = "parent",
) -> DataFrame:
    """Instance counts rolled up the class hierarchy (rdfs9/rdfs11).

    instances(instance, cls) + subclass(child, parent) ->
    (cls, direct_cnt, subtree_cnt) for EVERY class in the universe
    (edge endpoints union typed classes), zero-padded.  subtree_cnt
    counts instances typed at the class or any descendant — the RDFS
    entailment "x rdf:type C, C subClassOf* D => x rdf:type D" as one
    aggregate instead of materializing entailed type triples.

    Shape: direct counts are ONE hash aggregate over the fact side; the
    closure join then touches only the (small) per-class count table,
    never re-shuffling instances — at 10^12 facts the hierarchy algebra
    costs O(classes), not O(rows).
    """
    direct = instances.groupBy(F.col(class_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("direct_cnt")
    )
    closure = transitive_closure(subclass, child_col, parent_col)
    rolled = direct.join(
        closure, direct.cls == closure.node, "inner"
    ).select(F.col("anc").alias("cls"), F.col("direct_cnt"))
    subtree = (
        direct.select("cls", "direct_cnt")
        .unionByName(rolled)
        .groupBy("cls")
        .agg(F.sum("direct_cnt").alias("subtree_cnt"))
    )
    universe = (
        subclass.select(F.col(child_col).alias("cls"))
        .unionByName(subclass.select(F.col(parent_col).alias("cls")))
        .unionByName(instances.select(F.col(class_col).alias("cls")))
        .distinct()
    )
    return (
        universe.join(direct, "cls", "left")
        .join(subtree, "cls", "left")
        .select(
            "cls",
            F.coalesce("direct_cnt", F.lit(0)).cast("long").alias("direct_cnt"),
            F.coalesce("subtree_cnt", F.lit(0)).cast("long").alias("subtree_cnt"),
        )
    )


def sql_class_rollup(edges_sql: str, inst_sql: str) -> str:
    """DuckDB oracle: recursive-CTE ancestor closure + the same two
    aggregates.  edges_sql -> (child, parent); inst_sql -> (instance, cls)."""
    return f"""WITH RECURSIVE edges AS MATERIALIZED ({edges_sql}),
inst AS MATERIALIZED ({inst_sql}),
reach(node, anc) AS (
  SELECT child, parent FROM edges WHERE child <> parent
  UNION
  SELECT r.node, e.parent FROM reach r JOIN edges e ON r.anc = e.child
  WHERE r.node <> e.parent
),
direct AS (SELECT cls, count(*) AS direct_cnt FROM inst GROUP BY cls),
universe AS (
  -- DISTINCT over UNION ALL, not bare UNION: inside a WITH RECURSIVE
  -- block DuckDB does NOT dedup a non-recursive CTE's UNION arms.
  SELECT DISTINCT cls FROM (
    SELECT child AS cls FROM edges UNION ALL SELECT parent FROM edges
    UNION ALL SELECT cls FROM inst
  )
),
subtree AS (
  SELECT cls, sum(direct_cnt) AS subtree_cnt FROM (
    SELECT cls, direct_cnt FROM direct
    UNION ALL
    SELECT r.anc AS cls, d.direct_cnt FROM direct d JOIN reach r ON d.cls = r.node
  ) GROUP BY cls
)
SELECT u.cls,
       CAST(coalesce(d.direct_cnt, 0) AS BIGINT) AS direct_cnt,
       CAST(coalesce(s.subtree_cnt, 0) AS BIGINT) AS subtree_cnt
FROM universe u
LEFT JOIN direct d ON u.cls = d.cls
LEFT JOIN subtree s ON u.cls = s.cls"""


def flatten_rdf_lists(
    triples: DataFrame,
    first_pred: str = "rdf:first",
    rest_pred: str = "rdf:rest",
    nil: str = "rdf:nil",
    max_rounds: int = 20,
) -> DataFrame:
    """rdf:first/rdf:rest cons chains -> (head, pos, item), pos 0-based.

    Heads are cons cells no rest-edge points to.  Positions come from a
    min-plus pointer-doubling closure over the rest successor function:
    dist_{k+1} = min(dist_k, dist_k + dist_k), so a length-L list needs
    ceil(log2 L) shuffle-join rounds, not L (the successor function is
    functional, so every (src, dst) distance is unique and min() is just
    dedup).  Cells with a dangling rest target (neither a cell nor nil)
    terminate their chain at that cell — malformed tails surface as a
    shorter list, not an error.
    """
    first = triples.where(F.col("pred") == first_pred).select(
        F.col("subj").alias("cell"), F.col("obj").alias("item")
    )
    rest = triples.where(
        (F.col("pred") == rest_pred) & (F.col("obj") != nil)
    ).select(F.col("subj").alias("src"), F.col("obj").alias("dst"))

    cells = first.select(F.col("cell").alias("src")).distinct()
    ident = cells.select("src", F.col("src").alias("dst"), F.lit(0).alias("d"))
    reach = (
        ident.unionByName(rest.select("src", "dst", F.lit(1).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = reach.count()
    for _ in range(max_rounds):
        hop = reach.select(F.col("src").alias("_j"), F.col("dst"), F.col("d").alias("d2"))
        step = (
            reach.select("src", F.col("dst").alias("_j"), "d")
            .join(hop, "_j")
            .select("src", "dst", (F.col("d") + F.col("d2")).alias("d"))
        )
        nxt = reach.unionByName(step).distinct().localCheckpoint(eager=True)
        n2 = nxt.count()
        if n2 == n:
            break
        reach, n = nxt, n2
    else:
        raise ClosureError(f"flatten_rdf_lists: not converged in {max_rounds} rounds")

    heads = cells.join(
        rest.select(F.col("dst").alias("src")).distinct(), "src", "left_anti"
    ).select(F.col("src").alias("head"))
    return (
        reach.join(heads, reach.src == F.col("head"))
        .join(first, reach.dst == first.cell)
        .select(
            F.col("head"),
            F.col("d").cast("long").alias("pos"),
            F.col("item"),
        )
    )


def sql_flatten_rdf_lists(
    triples_sql: str,
    first_pred: str = "rdf:first",
    rest_pred: str = "rdf:rest",
    nil: str = "rdf:nil",
) -> str:
    """DuckDB oracle: a recursive walk from each head down its rest chain.
    triples_sql -> (subj, pred, obj)."""
    return f"""WITH RECURSIVE trip AS MATERIALIZED ({triples_sql}),
first_e AS (SELECT subj AS cell, obj AS item FROM trip WHERE pred = '{first_pred}'),
rest_e AS (SELECT subj AS src, obj AS dst FROM trip
           WHERE pred = '{rest_pred}' AND obj <> '{nil}'),
heads AS (
  SELECT DISTINCT cell AS head FROM first_e
  WHERE cell NOT IN (SELECT dst FROM rest_e)
),
walk(head, cell, pos) AS (
  SELECT head, head, CAST(0 AS BIGINT) FROM heads
  UNION ALL
  SELECT w.head, r.dst, w.pos + 1 FROM walk w JOIN rest_e r ON w.cell = r.src
)
SELECT w.head, w.pos, f.item
FROM walk w JOIN first_e f ON w.cell = f.cell"""
