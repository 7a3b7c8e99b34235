"""Multi-dimensional data layout: Morton (z-order) interleaving.

Why this exists at 100 TB: parquet/Iceberg readers prune row groups by
min/max column statistics, but a table sorted on ONE key has unbounded
extents on every OTHER key — a filter on the second dimension scans
everything.  Interleaving the bits of two keys into one z-code and
range-partitioning/sorting on it bounds BOTH dimensions per file/row
group (each z-code prefix is a quadtree cell), so two-dimensional
filters prune on both axes.  This is the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER, re-expressed as plain Column algebra.

Engine-exactness: normalization is the same integer formula as
profile.numeric_histogram ((v - lo) * 2^bits div span, truncating), and
the interleave is an unrolled shift/mask/or chain — one whole-stage
codegen projection on Spark, the identical arithmetic on any SQL engine.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_to_bits(col: Column, lo: int, span: int, bits: int = 16) -> Column:
    """Map an integer column with known [lo, lo+span) range onto
    [0, 2^bits) with truncating-integer arithmetic (engine-exact; see
    numeric_histogram for why floats mis-bin).  The quotient is computed
    as (num - num % span) / span: the numerator is then an exact
    multiple of span below 2^53, and correctly-rounded IEEE division of
    an exact multiple returns the exact integer — no div operator exists
    on the Column API, and this form never mis-rounds."""
    num = (col - F.lit(lo)) * F.lit(1 << bits)
    q = ((num - num % F.lit(span)) / F.lit(span)).cast("long")
    return F.least(F.lit((1 << bits) - 1), q)


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into one z-code (x in the odd positions, y in the even), so
    lexicographic order on the result is z-order over (x, y).  Unrolled
    to 2*bits shift/mask/or terms — a single codegen projection, no UDF.
    The SQL translation is the same expression (``morton_sql``).
    """
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(
                F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
        terms.append(
            F.shiftleft(F.shiftrightunsigned(y, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), terms).cast("long")


def morton_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical interleave as ANSI-ish SQL (DuckDB dialect bit ops)
    for differential oracles."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def normalize_sql(col: str, lo: str, span: str, bits: int = 16) -> str:
    """lo/span are SQL expressions (e.g. scalar-CTE column references)."""
    return f"least({(1 << bits) - 1}, (({col} - {lo}) * {1 << bits}) // ({span}))"


def layout_skip_audit(
    df,
    x_col: str,
    y_col: str,
    predicates: list[tuple[int, int, int, int, int]],
    bits: int = 16,
    cell_bits: int = 8,
):
    """Measure what min/max file skipping actually buys for two physical
    layouts of the same table — the audit behind OPTIMIZE ZORDER
    decisions, since data skipping is the dominant scan lever at 100 TB:

    * ``zorder``: files = quadtree cells (top ``cell_bits`` bits of the
      Morton code) — every file bounds BOTH dimensions;
    * ``xsort``: files = equal-width ranges of the normalized x key
      alone — the y extent per file is the full domain.

    ``predicates`` are inclusive boxes ``(pred_id, x_lo, x_hi, y_lo,
    y_hi)`` in raw key units; a file is skipped iff its (min, max)
    extent proves the box empty — exactly the parquet/Iceberg row-group
    pruning rule.  Output one row per (layout, pred_id): file counts,
    scanned-file count, scanned-row count, and scan ppm — all integer.

    Scale posture: extents are one map-side-combined aggregate per
    layout over ≤2^cell_bits cells; the predicate table (a handful of
    rows) cross-joins the ≤2^cell_bits-row extent table — nothing
    touches the corpus after the two cell aggregates.
    """
    from pyspark.sql import DataFrame  # noqa: F401 (signature clarity)

    mm = df.agg(
        F.min(x_col).alias("xlo"),
        (F.max(x_col) - F.min(x_col) + 1).alias("xspan"),
        F.min(y_col).alias("ylo"),
        (F.max(y_col) - F.min(y_col) + 1).alias("yspan"),
    ).collect()[0]
    x = normalize_to_bits(F.col(x_col), mm["xlo"], mm["xspan"], bits)
    y = normalize_to_bits(F.col(y_col), mm["ylo"], mm["yspan"], bits)
    z = morton_code(x, y, bits)
    coded = df.select(
        F.col(x_col).alias("xv"),
        F.col(y_col).alias("yv"),
        F.shiftright(z, 2 * bits - cell_bits).alias("zcell"),
        F.shiftright(x, bits - cell_bits).alias("xcell"),
    )
    spark = df.sparkSession
    preds = spark.createDataFrame(
        [tuple(p) for p in predicates],
        "pred_id long, x_lo long, x_hi long, y_lo long, y_hi long",
    )
    out = []
    for layout, cell in (("zorder", "zcell"), ("xsort", "xcell")):
        extents = coded.groupBy(F.col(cell).alias("cell")).agg(
            F.min("xv").alias("fx_min"),
            F.max("xv").alias("fx_max"),
            F.min("yv").alias("fy_min"),
            F.max("yv").alias("fy_max"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        scanned = (
            ~(
                (F.col("fx_max") < F.col("x_lo"))
                | (F.col("fx_min") > F.col("x_hi"))
                | (F.col("fy_max") < F.col("y_lo"))
                | (F.col("fy_min") > F.col("y_hi"))
            )
        ).cast("long")
        out.append(
            extents.crossJoin(F.broadcast(preds))
            .groupBy("pred_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_files"),
                F.sum(scanned).cast("long").alias("n_scanned"),
                F.sum(scanned * F.col("n_rows")).cast("long").alias("rows_scanned"),
                F.expr(
                    "CAST(sum(CASE WHEN fx_max < x_lo OR fx_min > x_hi OR "
                    "fy_max < y_lo OR fy_min > y_hi THEN 0 ELSE 1 END) "
                    "* 1000000 div count(1) AS BIGINT)"
                ).alias("scan_ppm"),
            )
            .select(F.lit(layout).alias("layout"), "*")
        )
    return out[0].unionByName(out[1])


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    key_col: str = "part_key",
    file_col: str = "file_id",
    size_col: str = "bytes",
) -> DataFrame:
    """Iceberg binPack-style small-file compaction planner: within each
    table partition, files (in deterministic (size desc, file_id) order)
    are assigned to output groups by running-size division — the groups
    partition the partition's cumulative byte line into target-sized
    spans, so the GROUP COUNT is exactly ceil(partition_bytes / target)
    (the rewrite-task count binPack budgets for) and each group's total
    varies around the target by at most one file size.  Files already
    at/above the target always land alone (their span covers a full
    bin) and are flagged so the rewrite skips them.  This is the
    maintenance pass the store's compact() seam maps to at production
    scale (rewrite_data_files) — the planner itself is pure window
    algebra: one key-partitioned cumulative sum, no driver-side
    listing, so planning 10^7 manifests is one shuffle on the
    partition key.

    Output: (key, file, bytes, grp, grp_bytes, grp_files,
    already_compact).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(size_col).desc(), F.col(file_col)
    )
    t = int(target_bytes)
    staged = files.select(
        key_col,
        file_col,
        F.col(size_col).cast("long").alias("bytes"),
        (
            F.sum(F.col(size_col).cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col(size_col).cast("long")
        ).alias("cum_before"),
    ).withColumn("grp", F.expr(f"CAST(cum_before div {t} AS BIGINT)"))
    gw = Window.partitionBy(key_col, "grp")
    return staged.select(
        key_col,
        file_col,
        "bytes",
        "grp",
        F.sum("bytes").over(gw).cast("long").alias("grp_bytes"),
        F.count(F.lit(1)).over(gw).cast("long").alias("grp_files"),
        (F.col("bytes") >= t).alias("already_compact"),
    )
