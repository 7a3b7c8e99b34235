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

from pyspark.sql import Column, DataFrame, Window
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


def pareto_audit_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    num_partitions: int | None = None,
    flag_col: str = "on_frontier",
) -> DataFrame:
    """2-D Pareto-frontier (skyline) audit: flag every row as dominated or
    frontier under (minimize ASC, maximize DESC) preference.

    A row p is ON the frontier iff no q has ``q.min <= p.min AND
    q.max >= p.max`` with at least one inequality strict.  The classic
    formulation is a quadratic NOT EXISTS self-join; the 2-D case reduces
    to prefix maxima over the minimize axis:

      dominated(p)  <=>  bestmax(min' <  p.min) >= p.max
                      OR bestmax(min' <= p.min) >  p.max

    Plan (no SinglePartition window, no self-join):
      1. groupBy(minimize).max(maximize) — ONE key shuffle, map-side
         combine; the working set shrinks to |distinct minimize|.
      2. repartitionByRange + sortWithinPartitions on minimize, then a
         PARTITION-LOCAL running max (window partitioned by pid — fully
         parallel); per-partition max -> driver -> exclusive prefix max
         broadcast back (the `global_row_numbers` two-pass scheme, with
         max as the scan monoid instead of count).
      3. one key join of the per-minimize bounds back to the input rows.

    Rows with NULL in either axis are excluded (no dominance order).
    Ties: equal (minimize, maximize) duplicates do not dominate each
    other — both carry the frontier flag.
    """
    base = df.filter(F.col(minimize).isNotNull() & F.col(maximize).isNotNull())
    per = base.groupBy(minimize).agg(F.max(maximize).alias("_gmax"))
    if num_partitions is not None:
        part = per.repartitionByRange(num_partitions, minimize)
    else:
        part = per.repartitionByRange(minimize)
    tagged = (
        part.sortWithinPartitions(minimize)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    stats = (
        tagged.groupBy("_pid").agg(F.max("_gmax").alias("_pmax")).orderBy("_pid").collect()
    )
    rows, running = [], None
    for r in stats:  # exclusive prefix max over partition-level maxima
        rows.append((int(r["_pid"]), running))
        pm = r["_pmax"]
        running = pm if running is None or pm > running else running
    spark = df.sparkSession
    max_type = tagged.schema["_gmax"].dataType.simpleString()
    prefixes = spark.createDataFrame(rows, f"_pid int, _prefix {max_type}")
    w = Window.partitionBy("_pid").orderBy(minimize)
    bounds = (
        tagged.join(F.broadcast(prefixes), "_pid")
        .withColumn(
            "_lt_local", F.max("_gmax").over(w.rowsBetween(Window.unboundedPreceding, -1))
        )
        .select(
            minimize,
            F.greatest(F.col("_lt_local"), F.col("_prefix")).alias("_best_lt"),
            F.greatest(F.col("_gmax"), F.col("_prefix")).alias("_best_le"),
        )
    )
    dominated = (
        F.col("_best_lt").isNotNull() & (F.col("_best_lt") >= F.col(maximize))
    ) | (F.col("_best_le") > F.col(maximize))
    return (
        base.join(bounds, minimize)
        .withColumn(flag_col, ~dominated)
        .drop("_best_lt", "_best_le")
    )
