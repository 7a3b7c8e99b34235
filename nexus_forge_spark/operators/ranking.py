"""Global total-order ranking without the single-reducer trap.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY is the classic
100-TB scale killer: Spark plans it as Exchange SinglePartition — every
row funnels through ONE task.  This module assigns exact global row
numbers with the two-pass range-partition scheme instead (the same idea
as RDD zipWithIndex, expressed in DataFrame ops):

  1. `repartitionByRange` on the order keys (sampled range boundaries,
     parallel), then `sortWithinPartitions` — the data is now globally
     sorted across partitions, each partition sorted locally;
  2. tag rows with `spark_partition_id` and `monotonically_increasing_id`
     (both map-side; mid is ordered within a partition by construction);
  3. one TINY aggregation (one row per partition: min(mid), count) feeds
     driver-side cumulative offsets, broadcast back;
  4. global rn = (mid - partition_min_mid) + cumulative_offset + 1.

Everything heavy is map-side; the only shuffles are the range exchange
(unavoidable — it IS the sort) and a per-partition-stats aggregate whose
output is one row per partition.  The result is invariant to the sampled
range boundaries and to AQE coalescing, because rn depends only on the
total order, not on where partitions split.

The tagged frame is localCheckpoint'ed between the stats pass and the
output pass: `monotonically_increasing_id` is nondeterministic across
recomputations, so the two passes MUST observe the same materialized ids
(at cluster scale, swap for `persist(DISK_ONLY)` or a reliable
checkpoint — same contract).

Order keys must form a total order (include a unique tiebreaker column)
for the numbering to be deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    percents: list[int],
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT distributed percentiles: the value at rank ceil(p*n/100) under
    the global order — no sketch error, no single-reducer sort.

    Built on `global_row_numbers` (range partition + offsets), so the
    heavy path is fully parallel; the percentile ranks are then picked by
    a broadcast join against a |percents|-row target table.  Rank
    arithmetic is INTEGER-exact — ``(p*n + 99) // 100`` — never a float
    ``ceil`` of ``p/100 * n``, which mis-rounds exactly at representable
    boundaries (the PPJoin bounds lesson).  Ties in `value_col` are fine:
    row numbers among equal values are arbitrary but the value AT any
    rank is unique, so the result is deterministic.

    Returns (p int, value) sorted by p.
    """
    spark = df.sparkSession
    ranked, n = _ranked_with_total(df.select(value_col), [value_col], num_partitions, "rn")
    if n == 0:
        return spark.createDataFrame(
            [], f"p int, value {df.schema[value_col].dataType.simpleString()}"
        )
    targets = [(int(p), max(1, (int(p) * n + 99) // 100)) for p in percents]
    tdf = spark.createDataFrame(targets, "p int, target long")
    return (
        ranked.join(F.broadcast(tdf), ranked["rn"] == tdf["target"])
        .select("p", F.col(value_col).alias("value"))
        .orderBy("p")
    )


def global_row_numbers(
    df: DataFrame,
    order_by: list[Column | str],
    num_partitions: int | None = None,
    out_col: str = "rn",
) -> DataFrame:
    """Exact 1-based global row numbers under `order_by`, fully parallel."""
    return _ranked_with_total(df, order_by, num_partitions, out_col)[0]


def _ranked_with_total(
    df: DataFrame,
    order_by: list[Column | str],
    num_partitions: int | None,
    out_col: str,
) -> tuple[DataFrame, int]:
    """global_row_numbers body, also returning the total row count — the
    per-partition stats pass already sums to it, so callers that need n
    (exact_percentiles) avoid a second full scan."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if num_partitions is not None:
        part = df.repartitionByRange(num_partitions, *cols)
    else:
        part = df.repartitionByRange(*cols)
    tagged = (
        part.sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    stats = (
        tagged.groupBy("_pid")
        .agg(F.min("_mid").alias("_base"), F.count(F.lit(1)).alias("_n"))
        .orderBy("_pid")
        .collect()
    )
    rows, offset = [], 0
    for r in stats:
        rows.append((int(r["_pid"]), int(r["_base"]), offset))
        offset += int(r["_n"])
    offsets = tagged.sparkSession.createDataFrame(
        rows, "_pid int, _base long, _off long"
    )
    ranked = (
        tagged.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            (F.col("_mid") - F.col("_base") + F.col("_off") + F.lit(1)).cast(
                "long"
            ),
        )
        .drop("_pid", "_mid", "_base", "_off")
    )
    return ranked, offset
