"""Sorted-neighborhood blocking (Hernandez & Stolfo merge/purge).

The classic entity-resolution candidate generator the trigram / LSH /
SimHash / PassJoin families don't cover: sort the corpus by a blocking
key and pair every record with its ``window`` successors in sort order.
Public-literature method (Hernandez, Stolfo: "The merge/purge problem
for large databases", SIGMOD '95); extends nexus-forge's resolver
family (kgforge/core/archetypes/resolver.py) with an order-based
candidate strategy its DemoResolver lacks.

Scale posture: the naive formulation is a global window (``lead`` over
an ORDER BY with no partition key = Exchange SinglePartition — the one
plan shape this repo bans).  Instead:

* exact global row numbers come from the exchange-free parallel ranking
  (operators/ranking.py: range partition + per-partition offsets joined
  back by broadcast);
* a pair ``(a, b)`` with ``1 <= rn_b - rn_a <= window`` has
  ``block(b) in {block(a), block(a) + 1}`` for ``block = (rn - 1) div
  window`` — so the left side explodes into exactly TWO block keys and
  candidates come out of one equi-join on the block id, never a
  cross product and never a single-reducer sort.

The ordering must be made unique (the ``order_by`` gets ``id_col``
appended as a tiebreak) so row numbers — and therefore the emitted pair
set — are deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexus_forge_spark.operators.ranking import global_row_numbers


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str = "id",
    key_col: str = "key",
    window: int = 5,
) -> DataFrame:
    """Candidate pairs within ``window`` positions of each other in the
    (key, id) sort order.  Returns (id_a, id_b, rn_a, rn_b) with a
    preceding b in sort order (rn_a < rn_b <= rn_a + window)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    ranked = global_row_numbers(
        df.select(F.col(id_col).alias("id"), F.col(key_col).alias("key")),
        order_by=["key", "id"],
        out_col="rn",
    ).select("id", "rn", F.floor((F.col("rn") - 1) / window).alias("blk"))

    left = ranked.withColumn(
        "probe_blk", F.explode(F.array(F.col("blk"), F.col("blk") + 1))
    )
    right = ranked
    return (
        left.alias("a")
        .join(right.alias("b"), F.col("a.probe_blk") == F.col("b.blk"))
        .where(
            (F.col("b.rn") > F.col("a.rn"))
            & (F.col("b.rn") <= F.col("a.rn") + window)
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.rn").alias("rn_a"),
            F.col("b.rn").alias("rn_b"),
        )
    )


def meta_blocking_wnp(
    assignments: DataFrame,
    entity_col: str = "entity",
    block_col: str = "block",
    max_block: int = 256,
) -> DataFrame:
    """Meta-blocking with Weighted Node Pruning (Papadakis et al., TKDE
    2014): turn a redundancy-positive block collection (one row per
    (entity, block) assignment) into a PRUNED comparison set.

    Stages, all set-oriented: (1) block purging — blocks larger than
    ``max_block`` are dropped entirely (they carry near-zero signal and
    quadratic cost; the standard first defense); (2) the comparison
    graph — edge weight = Common Blocks Scheme (CBS), the number of
    surviving blocks an unordered pair co-occupies; (3) WNP — each
    entity's pruning threshold is the MEAN weight of its incident
    edges, and an edge survives iff its weight reaches the average of
    its two endpoints' thresholds.  The float-free rendering of
    ``w >= (avg_a + avg_b) / 2`` is the exact integer cross-product
    ``2 * w * cnt_a * cnt_b >= sum_a * cnt_b + sum_b * cnt_a``.

    Scale: pair generation NEVER self-joins on the block key — entities
    are collected per block (bounded by ``max_block`` after purging)
    and i<j pairs expand map-side from the sorted array; edge weights
    and per-entity stats are partial-combined hash aggregates; the
    final rule is one join of the edge table with two slices of the
    (entity-sized) stat table.  Output: (a, b, weight) for surviving
    comparisons, a < b.
    """
    g = (
        assignments.select(
            F.col(block_col).alias("blk"), F.col(entity_col).alias("item")
        )
        .where(F.col(entity_col).isNotNull())
        .distinct()
    )
    sized = g.groupBy("blk").agg(
        F.sort_array(F.collect_set("item")).alias("items")
    ).where(F.size("items").between(2, max_block))
    pair_gen = F.flatten(
        F.expr(
            "transform(items, (x, i) -> "
            "transform(slice(items, i + 2, size(items)), "
            "y -> struct(x AS a, y AS b)))"
        )
    )
    edges = (
        sized.select(F.explode(pair_gen).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    stats = (
        edges.select(F.col("a").alias("node"), "w")
        .unionByName(edges.select(F.col("b").alias("node"), "w"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("w").alias("s"))
    )
    sa = stats.select(
        F.col("node").alias("a"), F.col("cnt").alias("cnt_a"), F.col("s").alias("s_a")
    )
    sb = stats.select(
        F.col("node").alias("b"), F.col("cnt").alias("cnt_b"), F.col("s").alias("s_b")
    )
    return (
        edges.join(sa, "a")
        .join(sb, "b")
        .where(
            2 * F.col("w") * F.col("cnt_a") * F.col("cnt_b")
            >= F.col("s_a") * F.col("cnt_b") + F.col("s_b") * F.col("cnt_a")
        )
        .select("a", "b", F.col("w").alias("weight"))
    )


def sql_meta_blocking_wnp(
    assignments_sql: str,
    max_block: int = 256,
) -> str:
    """DuckDB oracle: same purge -> CBS weights -> WNP integer rule.
    assignments_sql -> (entity, block)."""
    return f"""WITH g AS MATERIALIZED (
  SELECT DISTINCT block AS blk, entity AS item FROM ({assignments_sql})
  WHERE entity IS NOT NULL
),
bsize AS (
  SELECT blk FROM g GROUP BY blk
  HAVING count(*) BETWEEN 2 AND {max_block}
),
edges AS (
  SELECT x.item AS a, y.item AS b, CAST(count(*) AS BIGINT) AS w
  FROM g x JOIN g y ON x.blk = y.blk AND x.item < y.item
  JOIN bsize s ON x.blk = s.blk
  GROUP BY x.item, y.item
),
stats AS (
  SELECT node, count(*) AS cnt, sum(w) AS s FROM (
    SELECT a AS node, w FROM edges
    UNION ALL
    SELECT b, w FROM edges
  ) GROUP BY node
)
SELECT e.a, e.b, e.w AS weight
FROM edges e
JOIN stats sa ON e.a = sa.node
JOIN stats sb ON e.b = sb.node
WHERE 2 * e.w * sa.cnt * sb.cnt >= sa.s * sb.cnt + sb.s * sa.cnt"""
