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
