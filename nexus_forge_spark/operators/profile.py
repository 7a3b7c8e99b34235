"""Table profiling: per-column data-quality stats and exact equi-width
histograms — the "what is in this table" pass every ingestion pipeline
runs before trusting 100 TB of input.

The reference frames this need as Resource introspection
(kgforge/core/resource.py attribute walks + DemoStore searches); at
engine scale the equivalent is a declarative one-pass profile whose
output is small enough to drive partitioning / skew / validation
decisions (e.g. picking resolver blocking keys or salt factors).

Engine-exactness discipline (same as graph.py / sketches.py): counts are
BIGINT, histogram bin assignment is pure integer arithmetic over
pre-scaled values, min/max are native-type aggregates cast to string at
the very end — no float division anywhere, so a DuckDB oracle running
the same algebra matches hash-for-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-pass per-column profile in long format: (column, n_rows,
    n_null, n_distinct, min_value, max_value) with min/max rendered as
    strings so heterogeneous column types share one output schema.

    Scale posture: ONE aggregation over the table computes every
    column's stats simultaneously (Catalyst plans the multiple exact
    count_distincts via a single Expand — one scan, fan-out = #columns,
    partial-combined map-side), then the single result row unpivots to
    long format with ``stack`` — driver never loops per column, no
    per-column scans.  For 100 TB quick-looks swap count_distinct for
    approx_count_distinct (HLL, no Expand); the exact form is kept here
    because the differential oracle pins it.
    """
    cols = columns or df.columns
    aggs: list = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"__dist_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_null, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column", "n_rows", "n_null", "n_distinct", "min_value", "max_value")


def numeric_histogram(
    df: DataFrame, value_col: str, bins: int = 10, scale: int = 100
) -> DataFrame:
    """Exact equi-width histogram over a numeric column with INTEGER bin
    math: values are scaled to BIGINT units (``scale`` = 100 for cents),
    the data min/max fix the range, and

        bin = least(bins - 1, (v - lo) * bins div (hi - lo + 1))

    — truncating integer division, so bin assignment is bit-identical on
    any engine (a float ``(v-lo)/width`` mis-bins at representable
    boundaries; same hazard class as the PPJoin ceil bug in ADVICE r1).
    Empty bins are emitted with count 0 so the output always has ``bins``
    rows.  Output: (bin, lo_scaled, hi_scaled, n) where lo/hi are the
    bin's closed-open bounds in scaled units.

    Scale posture: pass 1 is a 2-value global agg (min/max), pass 2 one
    map-side-combined groupBy on the bin id — the shuffle carries at most
    ``bins`` rows per partition.  NULLs are excluded (profile_table
    reports them).
    """
    # floor, not cast: Spark's double->long cast truncates toward zero
    # while DuckDB's rounds — floor(x * scale) is the same IEEE double op
    # on both engines, so the scaled value is bit-identical cross-engine
    v = F.floor(F.col(value_col) * scale).cast("long")
    scaled = df.where(F.col(value_col).isNotNull()).select(v.alias("v"))
    lo_hi = scaled.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    lo, hi = lo_hi["lo"], lo_hi["hi"]
    if lo is None:
        spark = df.sparkSession
        return spark.range(bins).select(
            F.col("id").cast("int").alias("bin"),
            F.lit(None).cast("long").alias("lo_scaled"),
            F.lit(None).cast("long").alias("hi_scaled"),
            F.lit(0).cast("long").alias("n"),
        )
    span = hi - lo + 1
    counts = (
        scaled.select(
            F.least(
                F.lit(bins - 1),
                F.expr(f"(v - {lo}) * {bins} div {span}"),
            )
            .cast("int")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    spark = df.sparkSession
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    return (
        grid.join(counts, "bin", "left")
        .select(
            "bin",
            (F.lit(lo) + F.expr(f"bin * {span} div {bins}")).alias("lo_scaled"),
            (F.lit(lo) + F.expr(f"(bin + 1) * {span} div {bins}")).alias(
                "hi_scaled"
            ),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
        .orderBy("bin")
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    buckets: int,
    scale: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact equi-depth (equal-frequency) histogram — the quantile-sliced
    companion to numeric_histogram's equi-width bins, and the statistic
    behind feature bucketization and range-partition boundary choice.
    ``ntile() OVER (ORDER BY v)`` computes the same thing through an
    Exchange SinglePartition (every row through ONE task); this builds it
    on the exchange-free parallel ranking instead.

    Bucket assignment is pure integer arithmetic on the global rank:
    ``bucket = (rn - 1) * buckets div n`` — sizes differ by at most one,
    with the remainder spread rank-proportionally (SQL ntile front-loads
    it instead; same family, different remainder rule — the oracle runs
    this exact algebra).  Rows tied on the value can straddle a bucket
    boundary (their relative ranks are arbitrary), but every emitted
    column is still deterministic: bucket sizes are fixed by the rank
    algebra, and a straddling tie makes the neighbouring buckets' min/max
    equal the tied value itself.

    Scale posture: one range exchange (it IS the sort) + a one-row-per-
    partition stats pass from global_row_numbers, then ONE partial-
    combined aggregate on the bucket id.  Output: (bucket, n, lo_scaled,
    hi_scaled) — ``buckets`` rows.
    """
    from nexus_forge_spark.operators.ranking import _ranked_with_total

    units = F.floor(F.col(value_col) * scale).cast("long")
    scaled = df.where(F.col(value_col).isNotNull()).select(units.alias("v"))
    ranked, n = _ranked_with_total(scaled, ["v"], num_partitions, "rn")
    if n == 0:
        spark = df.sparkSession
        return spark.createDataFrame([], "bucket int, n long, lo_scaled long, hi_scaled long")
    return (
        ranked.select(
            F.expr(f"CAST((rn - 1) * {buckets} div {n} AS INT)").alias("bucket"),
            "v",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("v").alias("lo_scaled"),
            F.max("v").alias("hi_scaled"),
        )
        .orderBy("bucket")
    )


def sql_equidepth_histogram(
    source_sql: str, value_col: str, buckets: int, scale: int = 100
) -> str:
    """DuckDB oracle: the identical rank algebra over a window row_number
    (fine at oracle scale; the Spark side exists precisely to avoid it)."""
    return f"""WITH src AS ({source_sql}),
scaled AS (
  SELECT CAST(floor({value_col} * {scale}) AS BIGINT) AS v
  FROM src WHERE {value_col} IS NOT NULL
),
ranked AS (
  SELECT v, row_number() OVER (ORDER BY v) AS rn,
         count(*) OVER () AS n
  FROM scaled
)
SELECT CAST((rn - 1) * {buckets} // n AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       min(v) AS lo_scaled, max(v) AS hi_scaled
FROM ranked
GROUP BY 1 ORDER BY 1"""


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    scale: int = 100,
    k: int = 3,
) -> DataFrame:
    """Per-group robust outlier flags via median/MAD — the distributional
    gate an ingestion pipeline runs on numeric feeds (balances, token
    counts, latencies) before trusting them, where mean/stddev would be
    dragged by the very outliers being hunted.

    Integer-exactness discipline: values scale to BIGINT units
    (``floor(v * scale)``), and the two order statistics are carried as
    ``med2 = 2*median(units)`` and ``mad4 = 2*median(|2*units - med2|)``
    — both exact integers even when an even-count median interpolates
    (the interpolated midpoint times 2 is the sum of the two middle
    values; doubles below 2^53 represent it exactly, so Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` agree bit-for-bit).
    The flag is the cross-multiplied integer comparison

        |v - med| > k * MAD   <=>   2*|2*units - med2| > k * mad4

    with no float division anywhere (same hazard class as the PPJoin
    ceil bug in ADVICE r1).

    Scale posture: two map-side-combined aggregations on the group key
    (median is a SortAggregate over the group — mapper-local sort), each
    joined back as a broadcast (one row per group); the fact table itself
    never shuffles.  Output: input columns + (value_units, med2, mad4,
    is_outlier).
    """
    units = F.floor(F.col(value_col) * scale).cast("long")
    base = df.withColumn("__u", units).where(F.col("__u").isNotNull())
    med = base.groupBy(*group_cols).agg(
        (F.expr("percentile(__u, 0.5D)") * 2).cast("long").alias("med2")
    )
    with_med = base.join(F.broadcast(med), list(group_cols))
    dev2 = F.abs(F.lit(2) * F.col("__u") - F.col("med2"))
    with_dev = with_med.withColumn("__dev2", dev2)
    mad = with_dev.groupBy(*group_cols).agg(
        (F.expr("percentile(__dev2, 0.5D)") * 2).cast("long").alias("mad4")
    )
    out = with_dev.join(F.broadcast(mad), list(group_cols))
    return out.select(
        *df.columns,
        F.col("__u").alias("value_units"),
        "med2",
        "mad4",
        (F.lit(2) * F.col("__dev2") > F.lit(k) * F.col("mad4")).alias(
            "is_outlier"
        ),
    )


def sql_robust_outliers(
    source_sql: str,
    value_col: str,
    group_cols: list[str],
    out_cols: list[str],
    scale: int = 100,
    k: int = 3,
) -> str:
    """DuckDB oracle rendering of the identical median/MAD algebra."""
    keys = ", ".join(group_cols)
    on = " AND ".join(
        f"b.{c} IS NOT DISTINCT FROM m.{c}" for c in group_cols
    )
    on2 = " AND ".join(
        f"d.{c} IS NOT DISTINCT FROM a.{c}" for c in group_cols
    )
    outs = ", ".join(f"d.{c}" for c in out_cols)
    return f"""WITH src AS ({source_sql}),
base AS (
  SELECT *, CAST(floor({value_col} * {scale}) AS BIGINT) AS __u
  FROM src WHERE floor({value_col} * {scale}) IS NOT NULL
),
med AS (
  SELECT {keys}, CAST(2 * quantile_cont(__u, 0.5) AS BIGINT) AS med2
  FROM base GROUP BY {keys}
),
dev AS (
  SELECT b.*, m.med2, abs(2 * b.__u - m.med2) AS __dev2
  FROM base b JOIN med m ON {on}
),
mad AS (
  SELECT {keys}, CAST(2 * quantile_cont(__dev2, 0.5) AS BIGINT) AS mad4
  FROM dev GROUP BY {keys}
)
SELECT {outs}, d.__u AS value_units, d.med2, a.mad4,
       2 * d.__dev2 > {k} * a.mad4 AS is_outlier
FROM dev d JOIN mad a ON {on2}"""


def key_skew_profile(
    df: DataFrame, key_col: str, top_k: int = 20
) -> DataFrame:
    """Heavy-hitter skew diagnosis for a join/aggregation key: the top-k
    hottest keys with absolute counts, per-key share, and cumulative
    share in integer ppm — the measurement that justifies (or rules out)
    salting / broadcast factoring before a 100 TB shuffle.  This engine's
    own resolver exists BECAUSE of this profile's shape: hot ontology
    mentions (Zipfian corpus terms) would funnel a shuffle's hottest
    partition, which is why resolve.py factors the vocabulary before any
    join — run this on the join key to see the skew the plan avoids.

    Deterministic: ranked by (count DESC, key ASC); shares are
    truncating-integer ppm of the total row count.  Output: (rank, key,
    n, share_ppm, cum_share_ppm, n_rows_total, n_keys_total).

    Scale posture: one map-side-combined groupBy on the key, then top-k
    via orderBy+limit (TakeOrderedAndProject — k rows per partition
    reach the driver-side reduce, never a global sort of the key space);
    totals come from the same counts frame re-aggregated (two 1-row
    aggs).  The only window runs over the k selected rows.
    """
    counts = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    totals = counts.agg(
        F.sum("n").cast("long").alias("n_rows_total"),
        F.count(F.lit(1)).cast("long").alias("n_keys_total"),
    )
    top = counts.orderBy(F.col("n").desc(), F.col("key")).limit(top_k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("key")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = top.select(
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("key")))
        .alias("rank"),
        "key",
        "n",
        F.sum("n").over(w).alias("cum_n"),
    )
    return ranked.crossJoin(F.broadcast(totals)).select(
        "rank",
        "key",
        "n",
        F.expr("n * 1000000 div n_rows_total").cast("long").alias("share_ppm"),
        F.expr("cum_n * 1000000 div n_rows_total")
        .cast("long")
        .alias("cum_share_ppm"),
        "n_rows_total",
        "n_keys_total",
    )


def token_divergence(
    df: DataFrame,
    side_col: str,
    left: str,
    right: str,
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Corpus drift: which tokens' frequencies moved most between two
    corpus slices (two crawl snapshots, two sources, train vs incoming).
    The drift metric is the per-token total-variation contribution in
    integer ppm: ``p_left_ppm - p_right_ppm`` where ``p_side_ppm =
    count_side * 1e6 div total_side`` — all BIGINT, no float division,
    so the DuckDB oracle matches bit-for-bit, and summing
    ``abs(drift_ppm)/2`` over ALL tokens approximates total variation
    distance between the unigram distributions.

    The reference has no corpus-level analytics (it introspects one
    Resource at a time); at training-pipeline scale this is the standard
    "did the crawl distribution shift" gate run before mixing a new
    snapshot into the corpus.

    Deterministic: top-k by (abs(drift_ppm) DESC, token ASC).

    Output: (token, c_left, c_right, p_left_ppm, p_right_ppm, drift_ppm).

    Scale posture: ONE map-side-combined groupBy on the token (the two
    conditional sums ride the same aggregate); side totals are a 1-row
    re-aggregate of the (tiny relative to corpus) token-count frame,
    attached by broadcast; top-k is orderBy+limit =
    TakeOrderedAndProject, never a global sort of the vocabulary.
    """
    side = F.col(side_col)
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    exploded = (
        df.where(side.isin(left, right))
        .select(side.alias("__side"), F.explode(toks).alias("token"))
    )
    counts = exploded.groupBy("token").agg(
        F.sum((F.col("__side") == left).cast("long")).alias("c_left"),
        F.sum((F.col("__side") == right).cast("long")).alias("c_right"),
    )
    # counts feeds BOTH the totals branch and the scored output; without
    # pinning it, Catalyst re-derives each consumer from the scan and the
    # corpus is tokenized+aggregated TWICE (verified in test_plan_health)
    counts = counts.localCheckpoint(eager=False)
    totals = counts.agg(
        F.greatest(F.sum("c_left"), F.lit(1)).cast("long").alias("n_left"),
        F.greatest(F.sum("c_right"), F.lit(1)).cast("long").alias("n_right"),
    )
    scored = counts.crossJoin(F.broadcast(totals)).select(
        "token",
        "c_left",
        "c_right",
        F.expr("c_left * 1000000 div n_left").cast("long").alias("p_left_ppm"),
        F.expr("c_right * 1000000 div n_right").cast("long").alias("p_right_ppm"),
    ).withColumn("drift_ppm", (F.col("p_left_ppm") - F.col("p_right_ppm")).cast("long"))
    return scored.orderBy(
        F.abs(F.col("drift_ppm")).desc(), F.col("token")
    ).limit(top_k)


def fd_profile(
    df: DataFrame, candidates: list[tuple[list[str], str]], table: str = ""
) -> DataFrame:
    """Approximate functional-dependency profiling: for each candidate
    FD ``lhs -> rhs``, measure how far the table is from satisfying it.

    The g3 error (Kivinen/Mannila) is the minimum fraction of rows to
    delete so the FD holds exactly: for each lhs group keep the plurality
    rhs value, everything else is a violation —

        violations = n_rows - SUM over lhs groups of max_rhs count(lhs, rhs)

    Schema-discovery pipelines run this to find keys / denormalization
    errors before choosing merge keys or blocking attributes.

    Plan per candidate: two chained hash aggregates (groupBy(lhs+rhs)
    .count then groupBy(lhs).agg(sum, max)) + a 1-row final agg — all
    map-side-combinable, no window, no join; candidates UNION at the end
    (each is one row).  g3 is reported as integer ppm (violations *
    1_000_000 div n_rows) so both engines agree bit-for-bit.
    """
    outs = []
    for lhs, rhs in candidates:
        name = (f"{table}: " if table else "") + ",".join(lhs) + " -> " + rhs
        pair = df.groupBy(*lhs, rhs).agg(F.count(F.lit(1)).alias("_c"))
        grp = pair.groupBy(*lhs).agg(
            F.sum("_c").alias("_n"), F.max("_c").alias("_keep")
        )
        one = grp.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).cast("long").alias("lhs_groups"),
            F.sum("_n").cast("long").alias("n_rows"),
            (F.sum("_n") - F.sum("_keep")).cast("long").alias("violations"),
        )
        outs.append(
            one.withColumn(
                "g3_ppm", F.expr("(violations * 1000000L) div n_rows")
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def domain_quantile_calibration(
    df: DataFrame,
    score_col: str,
    domain_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain quantile calibration of a score — the domain-fair
    thresholding trick (RefinedWeb-style): a single global cutoff on a
    raw score over-prunes whole domains whose score distribution sits
    low, so re-express every row's score as its percentile WITHIN its
    own domain and threshold on that instead.

    ``pct_ppm = (rank - 1) * 1e6 div max(n_dom - 1, 1)`` with ties
    sharing a rank (``rank()``), so equal scores calibrate equally and
    the output spans [0, 1e6] exactly — all integer.

    Scale posture: one domain-keyed Exchange shared by the rank window
    and the full-frame count (stacked Window operators, the scd2/cusum
    pattern); the rank sort spills, so docs-per-domain >> cores is the
    operating regime.
    """
    rank_w = Window.partitionBy(domain_col).orderBy(score_col)
    n_w = (
        Window.partitionBy(domain_col)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return df.select(
        F.col(id_col),
        F.col(domain_col),
        F.col(score_col),
        (
            (F.rank().over(rank_w) - F.lit(1)).cast("long") * F.lit(1_000_000)
        ).alias("__num"),
        F.greatest(F.count(F.lit(1)).over(n_w) - F.lit(1), F.lit(1))
        .cast("long")
        .alias("__den"),
    ).select(
        id_col,
        domain_col,
        score_col,
        F.expr("CAST(__num div __den AS BIGINT)").alias("pct_ppm"),
    )


# log10(1 + 1/d) in ppm for d = 1..9; sums to exactly 1e6
BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]


def benford_audit(
    df: DataFrame, value_col: str, scale: int = 100
) -> DataFrame:
    """Benford's-law first-significant-digit audit — the classic
    fabricated-or-truncated-data screen for financial/measurement
    columns: organic multi-magnitude data follows
    P(d) = log10(1 + 1/d); capped, generated, or defaulted values
    don't.

    Values scale to BIGINT units first (floor, the engine-identical
    convention), the first significant digit is the leading character
    of the absolute units, and the report carries observed ppm next to
    the Benford ppm plus the absolute deviation — all integer.

    Scale posture: one map-side digit projection + one 9-row hash agg.
    """
    units = F.abs(F.floor(F.col(value_col) * scale).cast("long"))
    digit = F.substring(units.cast("string"), 1, 1).cast("int")
    counts = (
        df.where(F.col(value_col).isNotNull())
        .select(digit.alias("digit"))
        .where(F.col("digit") > 0)
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("total"))
    spark = df.sparkSession
    expect = spark.createDataFrame(
        [(d + 1, ppm) for d, ppm in enumerate(BENFORD_PPM)],
        "digit int, benford_ppm long",
    )
    return (
        expect.join(counts, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.expr("CAST(coalesce(n, 0) * 1000000 div total AS BIGINT)").alias(
                "observed_ppm"
            ),
            "benford_ppm",
            F.abs(
                F.expr("CAST(coalesce(n, 0) * 1000000 div total AS BIGINT)")
                - F.col("benford_ppm")
            ).cast("long").alias("abs_dev_ppm"),
        )
    )


def group_gini(
    df: DataFrame, value_col: str, group_col: str, scale: int = 100
) -> DataFrame:
    """Per-group Gini concentration of a nonnegative value — the
    inequality/skew measure that tells a partitioning planner how
    hot-keyed a dimension is (Gini 0 = uniform load, ->1 = one key
    carries everything).

    Exact integer algebra on the within-group value ranks
    (ties broken by the value's own rank order are irrelevant because
    equal values contribute symmetrically):

        gini_ppm = (2 * sum(rn * v) - (n + 1) * sum(v)) * 1e6
                   div (n * sum(v))

    Scale posture: ONE group exchange — the rank window and the
    full-frame aggregates stack on a single sort (the scd2/cusum
    pattern), then a one-row-per-group final agg.
    """
    units = F.floor(F.col(value_col) * scale).cast("long")
    staged = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"), units.alias("__v"))
        .select(
            "grp",
            "__v",
            F.row_number().over(
                Window.partitionBy("grp").orderBy("__v")
            ).cast("long").alias("__rn"),
        )
    )
    return (
        staged.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__v").cast("long").alias("sum_v"),
            F.sum(F.col("__rn") * F.col("__v")).cast("long").alias("sum_rv"),
        )
        .where(F.col("sum_v") > 0)
        .select(
            "grp",
            "n",
            "sum_v",
            F.expr(
                "CAST((2 * sum_rv - (n + 1) * sum_v) * 1000000 "
                "div (n * sum_v) AS BIGINT)"
            ).alias("gini_ppm"),
        )
    )


def group_weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_col: str,
    scale: int = 100,
) -> DataFrame:
    """Exact per-group weighted median: the smallest value whose running
    weight reaches half the group's total (``2 * cumw >= totw``, integer
    cross-multiplied — no float halving).  The robust center for skewed
    per-key metrics (spend per segment, latency per route) where the
    weighted mean follows the whales.

    Scale posture: ONE group exchange — the running weight sum and the
    full-frame total stack on a single partitionBy(group)/orderBy(value)
    sort (the scd2/cusum pattern); qualifying rows form a suffix of the
    value order, so the median is a plain min() per group afterwards.
    """
    units = F.floor(F.col(value_col) * scale).cast("long")
    run_w = Window.partitionBy("grp").orderBy("v", "w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    all_w = Window.partitionBy("grp").orderBy("v", "w").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = (
        df.where(F.col(value_col).isNotNull() & (F.col(weight_col) > 0))
        .select(
            F.col(group_col).alias("grp"),
            units.alias("v"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .select(
            "grp",
            "v",
            "w",
            F.sum("w").over(run_w).alias("cumw"),
            F.sum("w").over(all_w).alias("totw"),
        )
    )
    return (
        staged.where(F.col("cumw") * 2 >= F.col("totw"))
        .groupBy("grp")
        .agg(
            F.min("v").alias("wmedian_scaled"),
            F.max("totw").cast("long").alias("total_weight"),
        )
    )


# cumulative Poisson(1) CDF in ppm for k = 0..8 (tail mass beyond 9 is
# < 1e-6 and maps to weight 9)
POISSON1_CDF_PPM = [367879, 735759, 919699, 981012, 996340, 999406, 999917,
                    999990, 999999]


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    n_resamples: int = 64,
    salt: str = "boot",
) -> DataFrame:
    """Error bars for a corpus mean in ONE pass: the Poisson bootstrap
    (each resample re-weights every row by an independent Poisson(1)
    draw — the streaming-friendly bootstrap, since resampling n-of-n
    without coordination is impossible distributed).  Draws are
    hash-seeded through the integer CDF ladder, so every resample is
    deterministic and engine-identical.

    Output: one row — the point mean plus the bootstrap p02/p50/p98
    means, all in integer micro-units (mean_micro = sum*1e6 div n per
    resample; order statistics at fixed positions of the sorted
    B-resample array — document the convention, don't interpolate).

    Scale posture: NO explode — all ``2B`` weighted aggregates compute
    in one map-side-combined pass with the weight columns projected
    first (the SimHash common-subexpression lesson: repeat the hash
    inside each aggregate and codegen recomputes it 2B times).
    """
    from nexus_forge_spark.operators.sketches import hash60

    B = int(n_resamples)

    def w(b: int):
        u = F.pmod(
            hash60(
                F.concat(F.col(id_col).cast("string"), F.lit(f"#{b}")), salt
            ),
            F.lit(1_000_000),
        )
        expr = F.lit(9)
        for k in range(len(POISSON1_CDF_PPM) - 1, -1, -1):
            expr = F.when(u < POISSON1_CDF_PPM[k], F.lit(k)).otherwise(expr)
        return expr.cast("long")

    staged = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("long").alias("__x"),
        *[w(b).alias(f"__w{b}") for b in range(B)],
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__x").cast("long").alias("__sx"),
    ]
    for b in range(B):
        aggs.append(F.sum(F.col(f"__w{b}") * F.col("__x")).alias(f"__swx{b}"))
        aggs.append(F.sum(f"__w{b}").alias(f"__sw{b}"))
    one = staged.agg(*aggs)
    means = F.array_sort(
        F.array(
            *[
                F.expr(f"CAST(__swx{b} * 1000000 div __sw{b} AS BIGINT)")
                for b in range(B)
            ]
        )
    )
    lo_i, med_i, hi_i = max(1, B // 50), B // 2, B - max(1, B // 50) + 1
    return one.select(
        F.lit(B).cast("long").alias("n_resamples"),
        F.col("__n").alias("n_rows"),
        F.expr("CAST(__sx * 1000000 div __n AS BIGINT)").alias("mean_micro"),
        F.element_at(means, lo_i).alias("lo_micro"),
        F.element_at(means, med_i).alias("med_micro"),
        F.element_at(means, hi_i).alias("hi_micro"),
    )


def mutual_information(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Exact mutual information between two categorical columns, in
    deterministic integer micro-nats — the feature-association measure
    (Cover & Thomas) that decides whether a column pair is worth a
    composite blocking key / stratification axis, and the core of
    MI-based feature selection over training metadata.

        MI = (1/N) * sum_xy c_xy * ln(c_xy * N / (c_x * c_y))

    plus both marginal entropies and the normalized MI
    ``2*MI/(H_a+H_b)`` in ppm (Strehl & Ghosh's NMI, the symmetric
    [0,1] calibration).

    Engine exactness: every logarithm is the fixed-point intlog
    ``ln_micro(a, b)`` over integer-ratio arguments (no libm), each
    cell's contribution ``c_xy * ln_micro(...)`` is BIGINT, and the
    single division by N happens once at the end in integer
    arithmetic.  ``c_xy * N`` bounds the intermediate at N^2 — BIGINT-
    safe below ~3e9 rows per profiled shard; profile per-partition and
    average above that.

    Scale posture: one (a,b) cell aggregate (map-side combined; cells
    << rows for categorical columns), two tiny marginal re-aggregates
    OF THE CELL TABLE (no second scan), one broadcast of the 1-row
    total.  Output: one row (n, cells, mi_micro, h_a_micro, h_b_micro,
    nmi_ppm).
    """
    from nexus_forge_spark.functions.intlog import ln_micro_col

    cells = (
        df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(
            F.col(col_a).cast("string").alias("a"),
            F.col(col_b).cast("string").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("cxy"))
        .localCheckpoint(eager=False)
    )
    ma = cells.groupBy("a").agg(F.sum("cxy").alias("cx"))
    mb = cells.groupBy("b").agg(F.sum("cxy").alias("cy"))
    tot = cells.agg(
        F.sum("cxy").alias("n"), F.count(F.lit(1)).alias("cells")
    )
    joined = (
        cells.join(ma, "a")
        .join(mb, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "cells",
            "cxy",
            "cx",
            "cy",
            (F.col("cxy") * ln_micro_col("(cxy * n)", "(cx * cy)")).alias("mi_term"),
        )
    )
    agg = joined.groupBy("n", "cells").agg(
        F.sum("mi_term").alias("mi_sum"),
    )
    marg_h = (
        ma.select(F.col("cx").alias("c"))
        .crossJoin(F.broadcast(tot.select("n")))
        .select(F.lit("a").alias("side"), (F.col("c") * ln_micro_col("n", "c")).alias("h_term"))
        .unionByName(
            mb.select(F.col("cy").alias("c"))
            .crossJoin(F.broadcast(tot.select("n")))
            .select(F.lit("b").alias("side"), (F.col("c") * ln_micro_col("n", "c")).alias("h_term"))
        )
        .groupBy("side")
        .agg(F.sum("h_term").alias("h_sum"))
        .groupBy()
        .pivot("side", ["a", "b"])
        .agg(F.first("h_sum"))
    )
    return (
        agg.crossJoin(F.broadcast(marg_h))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("cells").cast("long").alias("cells"),
            F.expr("mi_sum div n").cast("long").alias("mi_micro"),
            F.expr("a div n").cast("long").alias("h_a_micro"),
            F.expr("b div n").cast("long").alias("h_b_micro"),
            F.expr(
                "CASE WHEN (a div n) + (b div n) = 0 THEN 0 "
                "ELSE (2 * (mi_sum div n) * 1000000) div ((a div n) + (b div n)) END"
            ).cast("long").alias("nmi_ppm"),
        )
    )


def sql_mutual_information(source_sql: str, col_a: str, col_b: str) -> str:
    """DuckDB oracle for :func:`mutual_information`."""
    from nexus_forge_spark.functions.intlog import ln_micro_sql

    mi_t = ln_micro_sql("(cxy * n)", "(cx * cy)", "duck")
    h_a = ln_micro_sql("n", "cx", "duck")
    h_b = ln_micro_sql("n", "cy", "duck")
    return f"""WITH src AS (
  SELECT CAST({col_a} AS VARCHAR) AS a, CAST({col_b} AS VARCHAR) AS b
  FROM ({source_sql})
  WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL
),
cells AS MATERIALIZED (
  SELECT a, b, CAST(count(*) AS BIGINT) AS cxy FROM src GROUP BY a, b
),
ma AS (SELECT a, CAST(sum(cxy) AS BIGINT) AS cx FROM cells GROUP BY a),
mb AS (SELECT b, CAST(sum(cxy) AS BIGINT) AS cy FROM cells GROUP BY b),
tot AS (SELECT CAST(sum(cxy) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS cells FROM cells),
mi AS (
  SELECT CAST(sum(cxy * CAST({mi_t} AS BIGINT)) AS BIGINT) AS mi_sum
  FROM cells JOIN ma USING (a) JOIN mb USING (b), tot
),
ha AS (SELECT CAST(sum(cx * CAST({h_a} AS BIGINT)) AS BIGINT) AS a_sum FROM ma, tot),
hb AS (SELECT CAST(sum(cy * CAST({h_b} AS BIGINT)) AS BIGINT) AS b_sum FROM mb, tot)
SELECT t.n, t.cells,
  CAST(mi.mi_sum // t.n AS BIGINT) AS mi_micro,
  CAST(ha.a_sum // t.n AS BIGINT) AS h_a_micro,
  CAST(hb.b_sum // t.n AS BIGINT) AS h_b_micro,
  CAST(CASE WHEN (ha.a_sum // t.n) + (hb.b_sum // t.n) = 0 THEN 0
       ELSE (2 * (mi.mi_sum // t.n) * 1000000)
            // ((ha.a_sum // t.n) + (hb.b_sum // t.n)) END AS BIGINT) AS nmi_ppm
FROM tot t, mi, ha, hb"""


def psi_report(
    df_a: DataFrame,
    df_b: DataFrame,
    cents_col: str,
    lo_cents: int,
    hi_cents: int,
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two releases of a numeric
    column — the standard model-risk drift gate (PSI < 0.1 stable,
    > 0.25 drifted), here engine-exact: inputs are pre-scaled integer
    cents (the repo's histogram discipline — no float bin edges), bin
    assignment is pure integer arithmetic with edge clamping, bucket
    shares are integer ppm (clamped at 1 ppm so empty cells price
    like the standard epsilon instead of dividing by zero), and each
    bin's term (pa - pb) * ln(pa/pb) uses the fixed-point intlog —
    micro-PSI with zero libm.

    Two map-side-combined bin aggregates (one scan each side), then
    ppm algebra on the ``bins``-row join.  Output: one row per bin —
    (bin, cnt_a, cnt_b, pa_ppm, pb_ppm, term_micro); PSI_micro =
    sum(term_micro).
    """
    from nexus_forge_spark.functions.intlog import ln_micro_sql

    width = hi_cents - lo_cents
    if width <= 0 or bins <= 0:
        raise ValueError("psi_report: need hi_cents > lo_cents and bins > 0")

    def bucket(df: DataFrame, out: str) -> DataFrame:
        b = F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0),
                F.expr(
                    f"CAST(({cents_col} - {lo_cents}) * {bins} DIV {width} AS INT)"
                ),
            ),
        )
        return df.groupBy(b.alias("bin")).agg(F.count(F.lit(1)).alias(out))

    grid = (
        df_a.sparkSession.range(bins)
        .select(F.col("id").cast("int").alias("bin"))
    )
    joined = (
        grid.join(bucket(df_a, "cnt_a"), "bin", "left")
        .join(bucket(df_b, "cnt_b"), "bin", "left")
        .select(
            "bin",
            F.coalesce("cnt_a", F.lit(0)).cast("long").alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).cast("long").alias("cnt_b"),
        )
    )
    tot = joined.agg(
        F.sum("cnt_a").alias("ta"), F.sum("cnt_b").alias("tb")
    )
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "cnt_a",
            "cnt_b",
            # greatest(total, 1): an EMPTY side degenerates to the 1-ppm
            # epsilon floor in every bin instead of dividing by zero —
            # Spark's div-by-zero NULL and DuckDB's error would otherwise
            # DISAGREE on the degenerate case (round-3 ADVICE)
            F.expr(
                "greatest(cnt_a * 1000000 div greatest(ta, 1), 1)"
            ).alias("pa_ppm"),
            F.expr(
                "greatest(cnt_b * 1000000 div greatest(tb, 1), 1)"
            ).alias("pb_ppm"),
        )
        .select(
            "bin",
            "cnt_a",
            "cnt_b",
            F.col("pa_ppm").cast("long").alias("pa_ppm"),
            F.col("pb_ppm").cast("long").alias("pb_ppm"),
            F.expr(
                "CAST((pa_ppm - pb_ppm) * ("
                + ln_micro_sql("pa_ppm", "pb_ppm", "spark")
                + ") div 1000000 AS BIGINT)"
            ).alias("term_micro"),
        )
    )


def sql_psi_report(
    source_a_sql: str,
    source_b_sql: str,
    cents_expr: str,
    lo_cents: int,
    hi_cents: int,
    bins: int = 10,
) -> str:
    """DuckDB oracle for :func:`psi_report` (``cents_expr`` must already
    be integer cents, mirroring the Spark input contract)."""
    from nexus_forge_spark.functions.intlog import ln_micro_sql as _lms

    width = hi_cents - lo_cents
    bin_e = (
        f"least({bins - 1}, greatest(0, "
        f"CAST(({cents_expr} - {lo_cents}) * {bins} // {width} AS INT)))"
    )
    term = _lms("pa_ppm", "pb_ppm", "duck")
    return f"""WITH ba AS (
  SELECT {bin_e} AS bin, CAST(count(*) AS BIGINT) AS cnt_a
  FROM ({source_a_sql}) GROUP BY 1
),
bb AS (
  SELECT {bin_e} AS bin, CAST(count(*) AS BIGINT) AS cnt_b
  FROM ({source_b_sql}) GROUP BY 1
),
grid AS (SELECT unnest(generate_series(0, {bins - 1})) AS bin),
joined AS (
  SELECT g.bin, coalesce(ba.cnt_a, 0) AS cnt_a, coalesce(bb.cnt_b, 0) AS cnt_b
  FROM grid g LEFT JOIN ba ON ba.bin = g.bin LEFT JOIN bb ON bb.bin = g.bin
),
tot AS (SELECT sum(cnt_a) AS ta, sum(cnt_b) AS tb FROM joined),
ppm AS (
  SELECT bin, cnt_a, cnt_b,
         greatest(cnt_a * 1000000 // greatest(ta, 1), 1) AS pa_ppm,
         greatest(cnt_b * 1000000 // greatest(tb, 1), 1) AS pb_ppm
  FROM joined, tot
)
SELECT CAST(bin AS INT) AS bin, cnt_a, cnt_b,
       CAST(pa_ppm AS BIGINT) AS pa_ppm, CAST(pb_ppm AS BIGINT) AS pb_ppm,
       CAST((pa_ppm - pb_ppm) * ({term}) // 1000000 AS BIGINT) AS term_micro
FROM ppm"""


def embedding_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension embedding population drift between two releases
    (round-4; the vector-space sibling of :func:`psi_report`): re-embed
    a corpus with a new model or a new checkpoint and this is the gate
    that says which DIMENSIONS moved — the standard pre-flight before
    trusting an ANN index built on the old vectors.

    Engine-exact by quantization: every component is first cast to integer
    micro-units (round(v * 1e6)), so sums and means are BIGINT-exact —
    no float accumulation order to diverge on.  Per dimension: n, mean
    (micro), mean absolute deviation around the integer mean (micro; MAD
    needs no sqrt and no > 2^63 intermediate, unlike variance), the
    inter-release mean shift, and shift/MAD in ppm — the scale-free
    drift score.

    Shape: posexplode -> ONE partial-combinable aggregate per side; the
    MAD pass re-joins the (dims-sized, broadcast) means; final join is
    dims x dims-sized.  At 10^12 vectors each pass is one scan.
    """

    def side(df: DataFrame, tag: str) -> DataFrame:
        comp = df.select(
            F.posexplode(F.col(vec_col)).alias("dim", "v")
        ).select(
            "dim", F.round(F.col("v") * 1000000).cast("long").alias("vm")
        )
        means = comp.groupBy("dim").agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.sum("vm").alias("s"),
        ).select(
            "dim",
            f"n_{tag}",
            F.expr(f"CAST(s div n_{tag} AS BIGINT)").alias(f"mean_{tag}_micro"),
        )
        mad = (
            comp.join(F.broadcast(means), "dim")
            .groupBy("dim")
            .agg(
                F.expr(
                    f"CAST(sum(abs(vm - mean_{tag}_micro)) div count(1) AS BIGINT)"
                ).alias(f"mad_{tag}_micro")
            )
        )
        return means.join(mad, "dim")

    a = side(df_a, "a")
    b = side(df_b, "b")
    return (
        a.join(b, "dim")
        .select(
            F.col("dim").cast("int").alias("dim"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "mean_a_micro",
            "mean_b_micro",
            (F.col("mean_b_micro") - F.col("mean_a_micro")).alias("shift_micro"),
            "mad_a_micro",
            F.expr(
                "CAST(abs(mean_b_micro - mean_a_micro) * 1000000"
                " div (mad_a_micro + 1) AS BIGINT)"
            ).alias("drift_ppm"),
        )
    )


def sql_embedding_drift(source_a_sql: str, source_b_sql: str) -> str:
    """DuckDB oracle for :func:`embedding_drift` (sources -> one
    ``embedding`` list column each)."""

    def side(src: str, tag: str) -> str:
        return f"""comp_{tag} AS MATERIALIZED (
  SELECT CAST(i - 1 AS INT) AS dim,
         CAST(round(e[i] * 1000000) AS BIGINT) AS vm
  FROM (SELECT embedding AS e FROM ({src})),
       LATERAL (SELECT unnest(generate_series(1, len(e))) AS i)
),
means_{tag} AS MATERIALIZED (
  SELECT dim, CAST(count(*) AS BIGINT) AS n_{tag},
         CAST(sum(vm) // count(*) AS BIGINT) AS mean_{tag}_micro
  FROM comp_{tag} GROUP BY dim
),
mad_{tag} AS MATERIALIZED (
  SELECT c.dim,
         CAST(sum(abs(c.vm - m.mean_{tag}_micro)) // count(*) AS BIGINT)
           AS mad_{tag}_micro
  FROM comp_{tag} c JOIN means_{tag} m ON c.dim = m.dim
  GROUP BY c.dim
)"""

    return f"""WITH {side(source_a_sql, 'a')},
{side(source_b_sql, 'b')}
SELECT ma.dim, ma.n_a, mb.n_b, ma.mean_a_micro, mb.mean_b_micro,
  mb.mean_b_micro - ma.mean_a_micro AS shift_micro,
  da.mad_a_micro,
  CAST(abs(mb.mean_b_micro - ma.mean_a_micro) * 1000000
       // (da.mad_a_micro + 1) AS BIGINT) AS drift_ppm
FROM means_a ma
JOIN means_b mb ON ma.dim = mb.dim
JOIN mad_a da ON ma.dim = da.dim"""


def winsorized_group_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
    scale: int = 100,
) -> DataFrame:
    """Winsorized + trimmed robust means per group (round-4; the
    outlier-insensitive companion to robust_outliers): values scale to
    BIGINT units, the EXACT per-group percentile cuts come from a ranked
    pass (value at rank ceil(n*p/100), the repo's exact-percentile
    discipline — no double interpolation), then

      winsorized mean: every value CLAMPED to [p_lo, p_hi], integer mean;
      trimmed mean:    only values INSIDE [p_lo, p_hi], integer mean.

    Trimming is BY VALUE, not by rank — rank-trimming is
    tie-order-dependent, value-trimming is a pure function of the
    multiset, so both engines agree exactly.

    Shape: one window rank per group (parallel across groups, no global
    exchange) + two aggregates.  Output: (group, n, p_lo_scaled,
    p_hi_scaled, winsorized_mean_scaled, trimmed_mean_scaled, n_trimmed).
    """
    v = F.floor(F.col(value_col) * scale).cast("long")
    # ties under orderBy("v") get arbitrary relative ranks, but the VALUE
    # at any rank is a pure function of the multiset — every output
    # column below is value-derived, so the result is deterministic
    w = Window.partitionBy("g").orderBy("v")
    base = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("g"), v.alias("v"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("g")))
    )
    cuts = base.groupBy("g").agg(
        F.max("n").cast("long").alias("n"),
        F.min(
            F.when(
                F.col("rn")
                == F.greatest(
                    F.lit(1), F.expr(f"CAST(ceil(n * {lo_pct} / 100) AS BIGINT)")
                ),
                F.col("v"),
            )
        ).alias("p_lo_scaled"),
        F.min(
            F.when(
                F.col("rn")
                == F.greatest(
                    F.lit(1), F.expr(f"CAST(ceil(n * {hi_pct} / 100) AS BIGINT)")
                ),
                F.col("v"),
            )
        ).alias("p_hi_scaled"),
    )
    joined = base.select("g", "v").join(F.broadcast(cuts), "g")
    inside = (F.col("v") >= F.col("p_lo_scaled")) & (
        F.col("v") <= F.col("p_hi_scaled")
    )
    return (
        joined.groupBy("g")
        .agg(
            F.max("n").alias("n"),
            F.max("p_lo_scaled").alias("p_lo_scaled"),
            F.max("p_hi_scaled").alias("p_hi_scaled"),
            F.expr(
                "CAST(sum(greatest(p_lo_scaled, least(p_hi_scaled, v)))"
                " div count(1) AS BIGINT)"
            ).alias("winsorized_mean_scaled"),
            F.expr(
                "CAST(sum(CASE WHEN v BETWEEN p_lo_scaled AND p_hi_scaled"
                " THEN v END) div"
                " sum(CASE WHEN v BETWEEN p_lo_scaled AND p_hi_scaled"
                " THEN 1 END) AS BIGINT)"
            ).alias("trimmed_mean_scaled"),
            F.sum(inside.cast("long")).cast("long").alias("n_trimmed"),
        )
        .select(
            F.col("g").alias(group_col),
            "n",
            "p_lo_scaled",
            "p_hi_scaled",
            "winsorized_mean_scaled",
            "trimmed_mean_scaled",
            "n_trimmed",
        )
    )


def sql_winsorized_group_stats(
    source_sql: str,
    group_col: str,
    value_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
    scale: int = 100,
) -> str:
    """DuckDB oracle for :func:`winsorized_group_stats`."""
    return f"""WITH base AS MATERIALIZED (
  SELECT {group_col} AS g,
         CAST(floor({value_col} * {scale}) AS BIGINT) AS v
  FROM ({source_sql})
  WHERE {value_col} IS NOT NULL
),
ranked AS MATERIALIZED (
  SELECT g, v,
         row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM base
),
cuts AS MATERIALIZED (
  SELECT g, CAST(max(n) AS BIGINT) AS n,
    min(CASE WHEN rn = greatest(1, CAST(ceil(n * {lo_pct} / 100) AS BIGINT))
             THEN v END) AS p_lo_scaled,
    min(CASE WHEN rn = greatest(1, CAST(ceil(n * {hi_pct} / 100) AS BIGINT))
             THEN v END) AS p_hi_scaled
  FROM ranked GROUP BY g
)
SELECT b.g AS {group_col}, c.n, c.p_lo_scaled, c.p_hi_scaled,
  CAST(sum(greatest(c.p_lo_scaled, least(c.p_hi_scaled, b.v)))
       // count(*) AS BIGINT) AS winsorized_mean_scaled,
  CAST(sum(CASE WHEN b.v BETWEEN c.p_lo_scaled AND c.p_hi_scaled
           THEN b.v END) //
       sum(CASE WHEN b.v BETWEEN c.p_lo_scaled AND c.p_hi_scaled
           THEN 1 END) AS BIGINT) AS trimmed_mean_scaled,
  CAST(sum(CASE WHEN b.v BETWEEN c.p_lo_scaled AND c.p_hi_scaled
           THEN 1 ELSE 0 END) AS BIGINT) AS n_trimmed
FROM base b JOIN cuts c ON b.g = c.g
GROUP BY b.g, c.n, c.p_lo_scaled, c.p_hi_scaled"""
