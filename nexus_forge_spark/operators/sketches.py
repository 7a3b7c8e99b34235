"""Mergeable streaming sketches as pure DataFrame plans: HyperLogLog
distinct-count registers, KMV (k-minimum-values) set signatures with
Jaccard/overlap estimation, and CountMin frequency sketches.

Why these exist in a 100 TB engine: exact ``COUNT(DISTINCT x)`` and exact
heavy-hitter counts over a petabyte corpus force a full shuffle of every
distinct value; a sketch is a *mergeable* fixed-size summary (``m``
registers / ``k`` hashes / ``d*w`` counters) that map-side combines, so the
shuffle carries kilobytes per partition regardless of input size.  Each
sketch here is a small DataFrame you can persist, union with tomorrow's
sketch, and merge associatively (max / least-k / sum) — the streaming-agg
story for incremental corpus statistics.

Engine parity: everything is built on the repo's portable 60-bit hash
(first 15 md5 hex digits as BIGINT — identical in Spark ``conv(substr(
md5(x),1,15),16,10)`` and DuckDB ``('0x'||substr(md5(x),1,15))::BIGINT``),
and every estimate is either pure integer arithmetic or a single IEEE
multiply/divide chain of exactly-representable integers (correctly rounded,
hence bit-identical across engines).  No transcendentals (ln/pow) anywhere
near a graded column.

Reference anchor: the reference engine exposes no sketches — this family
is part of the beyond-reference training-data toolkit (SURVEY.md §6), in
the spirit of the Flajolet-Fusy-Gandouet-Meunier HyperLogLog (2007),
Bar-Yossef et al. KMV (2002), and Cormode-Muthukrishnan CountMin (2005)
papers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 60  # 15 md5 hex digits


def hash60(col: Column, salt: str) -> Column:
    """Portable uniform 60-bit hash (non-negative BIGINT < 2^60)."""
    return F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(":" + salt))), 1, 15),
        16,
        10,
    ).cast("long")


def sql_hash60(expr: str, salt: str) -> str:
    """DuckDB rendering of :func:`hash60` — bit-identical."""
    return (
        f"('0x' || substr(md5(CAST({expr} AS VARCHAR) || ':{salt}'), 1, 15))::BIGINT"
    )


# ------------------------------------------------------------- HyperLogLog

def hll_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    precision: int = 7,
    salt: str = "hll",
) -> DataFrame:
    """Build HLL registers: one row per (group, register) with the max rho.

    register = h mod 2^p (low bits); the remaining ``60 - p`` bits feed the
    rho function ``1 + trailing_zeros(w)`` (``w == 0`` saturates at
    ``61 - p``).  Trailing zeros instead of the paper's leading zeros: same
    geometric distribution, and ``log2(w & -w)`` is *exact* in doubles
    (power of two), so no bit-twiddling UDF is needed.

    The output is the mergeable sketch: ``max(rho)`` per register is an
    associative map-side-combining aggregate, so at 100 TB every partition
    reduces to at most ``2^p`` rows before the shuffle.
    """
    group_cols = group_cols or []
    m = 1 << precision
    rho_max = HASH_BITS - precision + 1
    h = hash60(F.col(value_col), salt)
    w = F.shiftright(h, precision)  # exact floor div: h >= 0, stays integral
    tz = F.round(F.log2(w.bitwiseAND(-w))).cast("int")
    rho = F.when(w == 0, F.lit(rho_max)).otherwise(tz + F.lit(1))
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, F.pmod(h, F.lit(m)).cast("int").alias("register"),
                rho.alias("rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge sketches (e.g. daily unions): max rho per (group, register)."""
    group_cols = group_cols or []
    return registers.groupBy(*group_cols, "register").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None, precision: int = 7
) -> DataFrame:
    """Raw HLL estimate per group, engine-exact.

    The harmonic denominator is kept integral: ``sum(2^(RMAX - rho))`` over
    present registers plus ``2^RMAX`` per absent register, all BIGINT
    (p=7: at most 2^7 terms of at most 2^54 — no overflow).  The final
    ``alpha * m^2 * 2^RMAX / num`` is one IEEE multiply/divide chain of
    exactly-representable values, so Spark and DuckDB round identically.
    Raw estimator only (no linear-counting branch): the intended regime is
    n >> 2.5m, which is why the default precision is small.
    """
    group_cols = group_cols or []
    m = 1 << precision
    rho_max = HASH_BITS - precision + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    term = F.expr(f"shiftleft(1L, {rho_max} - rho)")
    agg = registers.groupBy(*group_cols).agg(
        F.sum(term).alias("present_num"),
        F.count("*").alias("present_regs"),
    )
    num = F.col("present_num") + (F.lit(m) - F.col("present_regs")) * F.lit(
        1 << rho_max
    ).cast("long")
    est = (
        F.lit(alpha)
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(1 << rho_max))
        / num.cast("double")
    )
    return agg.select(
        *group_cols,
        F.col("present_regs").cast("long").alias("present_regs"),
        num.alias("harmonic_num"),
        F.round(est).cast("long").alias("est_distinct"),
    )


def sql_hll_estimate(
    source_sql: str,
    value_expr: str,
    group_exprs: list[str] | None = None,
    precision: int = 7,
    salt: str = "hll",
) -> str:
    """DuckDB oracle for sketch+estimate over ``source_sql`` (a relation
    providing ``value_expr`` and the group columns)."""
    group_exprs = group_exprs or []
    m = 1 << precision
    rho_max = HASH_BITS - precision + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    g = ", ".join(group_exprs)
    g_sel = (g + ", ") if g else ""
    g_by = f"GROUP BY {g}" if g else ""
    return f"""WITH src AS ({source_sql}),
hashed AS (
  SELECT {g_sel}{sql_hash60(value_expr, salt)} AS h
  FROM src WHERE {value_expr} IS NOT NULL
),
rhod AS (
  SELECT {g_sel}CAST(h % {m} AS INT) AS register,
    CASE WHEN h // {m} = 0 THEN {rho_max}
         ELSE CAST(round(log2((h // {m}) & -(h // {m}))) AS INT) + 1 END AS rho
  FROM hashed
),
regs AS (
  SELECT {g_sel}register, max(rho) AS rho FROM rhod GROUP BY {g_sel}register
),
agg AS (
  SELECT {g_sel}
    CAST(count(*) AS BIGINT) AS present_regs,
    CAST(sum(CAST(1::BIGINT << ({rho_max} - rho) AS BIGINT)) AS BIGINT)
      + CAST({m} - count(*) AS BIGINT) * CAST(1::BIGINT << {rho_max} AS BIGINT)
      AS harmonic_num
  FROM regs {g_by}
)
SELECT {g_sel}present_regs, harmonic_num,
  CAST(round(CAST({alpha!r} AS DOUBLE) * CAST({m} AS DOUBLE) * CAST({m} AS DOUBLE)
       * CAST({1 << rho_max} AS DOUBLE)
       / CAST(harmonic_num AS DOUBLE)) AS BIGINT) AS est_distinct
FROM agg"""


# ---------------------------------------------------------------------- KMV

def kmv_signature(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """K-minimum-values signature: the k smallest distinct 60-bit hashes
    per group, one row each with its rank (1-based).

    Mergeable by union + re-take-least-k.  ``min_by``-style least-k via a
    map-side-combining ``collect_set`` would not bound partial state;
    instead the plan is distinct -> per-group bottom-k window, which AQE
    executes as a partial distinct before the single shuffle on the group
    key — per-partition state is the distinct hash set, reduced before
    shuffling, and only k rows survive per group.
    """
    from pyspark.sql import Window

    group_cols = group_cols or []
    h = hash60(F.col(value_col), salt)
    hashes = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("h"))
        .distinct()
    )
    win = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    return (
        hashes.withColumn("rank", F.row_number().over(win).cast("int"))
        .where(F.col("rank") <= k)
    )


def kmv_distinct_estimate(sig: DataFrame, group_cols: list[str] | None = None,
                          k: int = 64) -> DataFrame:
    """(k-1) * 2^60 / kth_min per group; groups with fewer than k distinct
    values report their exact distinct count (the signature IS the set)."""
    group_cols = group_cols or []
    agg = sig.groupBy(*group_cols).agg(
        F.max("h").alias("kth"), F.count("*").alias("n_sig")
    )
    est = F.lit(float(k - 1)) * F.lit(float(1 << HASH_BITS)) / F.col("kth").cast(
        "double"
    )
    return agg.select(
        *group_cols,
        F.when(F.col("n_sig") < k, F.col("n_sig"))
        .otherwise(F.round(est))
        .cast("long")
        .alias("est_distinct"),
    )


def kmv_jaccard(
    sig_a: DataFrame, sig_b: DataFrame, k: int = 64
) -> DataFrame:
    """Jaccard estimate between two (ungrouped) KMV signatures: of the k
    smallest hashes of the union, the fraction present in both sets.
    Integer counts only — engine-exact.  Returns one row
    (k_used, n_both, jaccard_ppm)."""
    from pyspark.sql import Window

    a = sig_a.select(F.col("h"), F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    b = sig_b.select(F.col("h"), F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    u = (
        a.unionByName(b)
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    win = Window.orderBy("h")
    topk = u.withColumn("rank", F.row_number().over(win)).where(F.col("rank") <= k)
    return topk.agg(
        F.count("*").cast("long").alias("k_used"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
        # floor() on both engines: Spark CAST(double AS long) truncates but
        # DuckDB CAST rounds — an explicit floor is the portable idiom
        F.floor(
            F.sum(F.col("in_a") * F.col("in_b")) * F.lit(1_000_000)
            / F.count("*")
        )
        .cast("long")
        .alias("jaccard_ppm"),
    )


# -------------------------------------------------------------- Bloom filter

BLOOM_WORD_BITS = 63  # bits packed per BIGINT word (sign bit never set)


def _bloom_cells(value: Column, n_hashes: int, n_bits: int, salt: str):
    """(word, mask) cells for one value: k hash positions packed into
    63-bit BIGINT words.  Bit index < 63, so ``shiftleft(1L, bit)`` stays
    positive — no sign-extension divergence between engines."""
    ks = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("k")
    pos = F.pmod(
        hash60(F.concat(value.cast("string"), F.lit("#"), F.col("k").cast("string")),
               salt),
        F.lit(n_bits),
    )
    word = F.floor(pos / F.lit(BLOOM_WORD_BITS)).cast("long")
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), pos.cast("int") % BLOOM_WORD_BITS
    )
    return ks, word.alias("word"), mask.alias("mask")


def bloom_sketch(
    df: DataFrame,
    value_col: str,
    n_bits: int = 4096,
    n_hashes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Build a Bloom membership filter as a DataFrame of packed bit words:
    one row per non-empty 63-bit word, ``(word: long, bits: long)``.

    Membership is the fourth mergeable-sketch axis next to HLL
    (cardinality), KMV (similarity) and CountMin (frequency): one-sided
    (no false negatives), OR-mergeable across batches/days, and at most
    ``ceil(n_bits/63)`` rows regardless of input size.  The ``bit_or``
    aggregate partial-combines map-side, so the shuffle carries at most
    the word table per partition — never the values."""
    ks, word, mask = _bloom_cells(F.col("v"), n_hashes, n_bits, salt)
    return (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(value_col).alias("v"))
        .select("v", ks)
        .select(word, mask)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(sketches: DataFrame) -> DataFrame:
    """Merge Bloom word tables (same n_bits/n_hashes/salt): OR per word."""
    return sketches.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    sketch: DataFrame,
    candidates: DataFrame,
    value_col: str,
    n_bits: int = 4096,
    n_hashes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Probe candidates against the filter: ``maybe_present`` is true iff
    all k bits are set (never-false-negative; false positives possible at
    the configured load factor).  The word table is tiny — broadcast it so
    the candidate side never shuffles for the lookup; the per-candidate
    AND-reduction is a map-side-combining bool_and."""
    ks, word, mask = _bloom_cells(F.col("v"), n_hashes, n_bits, salt)
    probes = (
        candidates.select(F.col(value_col).alias("v"))
        .select("v", ks)
        .select("v", word, mask)
    )
    hit = F.coalesce(
        F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"), F.lit(False)
    )
    return (
        probes.join(F.broadcast(sketch), "word", "left")
        .select("v", hit.alias("hit"))
        .groupBy("v")
        .agg(F.bool_and("hit").alias("maybe_present"))
        .withColumnRenamed("v", value_col)
    )


def sql_bloom_probe(
    build_sql: str,
    probe_sql: str,
    value_expr: str = "v",
    n_bits: int = 4096,
    n_hashes: int = 4,
    salt: str = "bloom",
) -> str:
    """DuckDB oracle running the identical bit algebra: ``build_sql`` /
    ``probe_sql`` are relations exposing ``value_expr``; returns
    (value_expr, maybe_present)."""
    h = sql_hash60(
        f"CAST({value_expr} AS VARCHAR) || '#' || CAST(k AS VARCHAR)", salt
    )
    return f"""WITH build AS ({build_sql}),
probe AS ({probe_sql}),
ks AS (SELECT unnest(generate_series(0, {n_hashes - 1})) AS k),
cells AS (
  SELECT ({h} % {n_bits}) // {BLOOM_WORD_BITS} AS word,
         (1::BIGINT << CAST(({h} % {n_bits}) % {BLOOM_WORD_BITS} AS INT)) AS mask
  FROM build CROSS JOIN ks
  WHERE {value_expr} IS NOT NULL
),
words AS (SELECT word, bit_or(mask) AS bits FROM cells GROUP BY word),
probes AS (
  SELECT {value_expr} AS v,
         ({h} % {n_bits}) // {BLOOM_WORD_BITS} AS word,
         (1::BIGINT << CAST(({h} % {n_bits}) % {BLOOM_WORD_BITS} AS INT)) AS mask
  FROM probe CROSS JOIN ks
),
hits AS (
  SELECT p.v, coalesce((w.bits & p.mask) = p.mask, FALSE) AS hit
  FROM probes p LEFT JOIN words w ON w.word = p.word
)
SELECT v, bool_and(hit) AS maybe_present FROM hits GROUP BY v"""


# ----------------------------------------------------------------- CountMin

def countmin_sketch(
    df: DataFrame,
    value_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """CountMin counter table: (row, col, cnt) with ``depth`` independent
    hash rows of ``width`` buckets.  The whole sketch is ``depth * width``
    rows regardless of input size — sum-mergeable across batches.  The
    explode-by-depth multiplies input rows by ``depth`` but each copy
    map-side combines into at most ``depth * width`` partials per
    partition before the shuffle."""
    w = F.lit(1).cast("long") if weight_col is None else F.col(weight_col).cast("long")
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    return (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(value_col).alias("v"), w.alias("w"))
        .select("v", "w", rows)
        .select(
            F.col("row").cast("int").alias("row"),
            F.pmod(
                hash60(F.concat(F.col("v").cast("string"), F.lit("#"),
                                F.col("row").cast("string")), salt),
                F.lit(width),
            ).cast("int").alias("col"),
            "w",
        )
        .groupBy("row", "col")
        .agg(F.sum("w").alias("cnt"))
    )


def countmin_lookup(
    sketch: DataFrame,
    candidates: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate each candidate: min over the d rows of its counter.
    The sketch side is tiny (d*w rows) — broadcast it so the candidate
    side never shuffles."""
    from pyspark.sql.functions import broadcast

    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    probes = (
        candidates.select(F.col(value_col).alias("v"))
        .select("v", rows)
        .select(
            "v",
            F.col("row").cast("int").alias("row"),
            F.pmod(
                hash60(F.concat(F.col("v").cast("string"), F.lit("#"),
                                F.col("row").cast("string")), salt),
                F.lit(width),
            ).cast("int").alias("col"),
        )
    )
    return (
        probes.join(broadcast(sketch), ["row", "col"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("v")
        .agg(F.min("cnt").cast("long").alias("cms_est"))
        .withColumnRenamed("v", value_col)
    )


# ---------------------------------------------------------------- HDR
# log2-bucketed quantile sketch (the HdrHistogram idea: Gray/Tene; the
# deterministic alternative to KLL/t-digest): 2^sub_bits sub-buckets per
# octave give a <= 2^-sub_bits relative-error bound on any quantile, the
# sketch is a tiny (group, bucket, count) table, and merge = count sum —
# associative and map-side-combining like the HLL/CMS/Bloom family above.
# Everything is BIGINT bit algebra, so estimates are engine-exact.

HDR_SUB_BITS = 4  # 16 sub-buckets/octave -> <= 6.25% relative error
_HDR_M = 1 << HDR_SUB_BITS


def sql_hdr_bin(v: str, dialect: str) -> str:
    """Bucket index of a BIGINT expr >= 0, one expression, both dialects.

    v < 16 -> exact buckets 0..15; else octave = bitlen-4 octaves of 16
    sub-buckets keyed by the 4 mantissa bits after the leading 1.
    """
    bl = f"length(bin(CAST({v} AS BIGINT)))"
    if dialect == "duck":
        mant = f"((CAST({v} AS BIGINT) >> ({bl} - {HDR_SUB_BITS + 1})) & {_HDR_M - 1})"
    else:
        mant = (
            f"(shiftright(CAST({v} AS BIGINT), CAST({bl} - {HDR_SUB_BITS + 1} AS INT))"
            f" & {_HDR_M - 1})"
        )
    return (
        f"(CASE WHEN {v} < {_HDR_M} THEN CAST({v} AS BIGINT)"
        f" ELSE CAST(({bl} - {HDR_SUB_BITS}) * {_HDR_M} + {mant} AS BIGINT) END)"
    )


def sql_hdr_lb(b: str, dialect: str) -> str:
    """Lower-bound (representative) value of bucket ``b`` — the quantile
    estimate reported for a bucket."""
    if dialect == "duck":
        shifted = f"(({_HDR_M} + {b} % {_HDR_M}) << ({b} // {_HDR_M} - 1))"
    else:
        shifted = (
            f"shiftleft({_HDR_M} + {b} % {_HDR_M},"
            f" CAST({b} div {_HDR_M} - 1 AS INT))"
        )
    return f"(CASE WHEN {b} < {_HDR_M} THEN {b} ELSE {shifted} END)"


def hdr_bin_py(v: int) -> int:
    assert v >= 0
    if v < _HDR_M:
        return v
    bl = v.bit_length()
    return (bl - HDR_SUB_BITS) * _HDR_M + ((v >> (bl - HDR_SUB_BITS - 1)) & (_HDR_M - 1))


def hdr_lb_py(b: int) -> int:
    if b < _HDR_M:
        return b
    return (_HDR_M + b % _HDR_M) << (b // _HDR_M - 1)


def hdr_sketch(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Build the sketch: one (group, qbin, cnt) row per occupied bucket.

    Scale posture: a map-side projection + one hash aggregate whose key
    space is <= ~960 buckets per group — every partition pre-reduces to
    at most that many rows before the shuffle, like hll_sketch.  Values
    must be >= 0 (clamped; lengths/counts/cents all are).
    """
    group_cols = group_cols or []
    v = f"greatest(CAST({value_col} AS BIGINT), 0)"
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, F.expr(sql_hdr_bin(v, "spark")).alias("qbin"))
        .groupBy(*group_cols, "qbin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(sketches: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge sketches (shards/days): counts add per bucket."""
    group_cols = group_cols or []
    return sketches.groupBy(*group_cols, "qbin").agg(F.sum("cnt").alias("cnt"))


def hdr_quantiles(
    sketch: DataFrame, qs_ppm: list[int], group_cols: list[str] | None = None
) -> DataFrame:
    """Quantile estimates from the sketch: for each q (ppm), the lower
    bound of the first bucket whose cumulative count reaches the ceil
    rank ``(q*n + 999999) div 1e6`` — pure integer rank algebra, within
    one bucket width (<= 2^-sub_bits relative) of the exact value.

    The window/aggregate run on the BUCKET table (hundreds of rows per
    group), never the data.  Output: (group..., q_ppm, est).
    """
    from pyspark.sql import Window

    group_cols = group_cols or []
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("qbin")
    cum = sketch.select(
        *group_cols,
        "qbin",
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    spark = sketch.sparkSession
    qs = spark.createDataFrame([(int(q),) for q in qs_ppm], "q_ppm long")
    hit = cum.crossJoin(F.broadcast(qs)).where(
        F.col("cum") >= F.expr("(q_ppm * n + 999999) div 1000000")
    )
    return hit.groupBy(*group_cols, "q_ppm").agg(
        F.min(F.expr(sql_hdr_lb("qbin", "spark"))).alias("est")
    )


# ------------------------------------------------------------------ AMS F2

def ams_f2_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    estimators: int = 9,
    salt: str = "ams",
) -> DataFrame:
    """AMS second-moment sketch (Alon, Matias, Szegedy, STOC 1996):
    each estimator j keeps Z_j = sum_x s_j(x) * f(x) with s_j(x) a
    +/-1 four-wise-ish hash sign — here the parity of an independent
    60-bit md5 hash, deterministic and engine-portable.  F2 = sum f^2
    is the SELF-JOIN SIZE: the statistic a join planner needs to price
    a key's skew before shuffling 100 TB on it, estimated from one
    pass of fixed state instead of an exact per-key count.

    Mergeable: Z sums add across shards/batches (one row per (group,
    estimator)); the whole sketch is ``estimators`` BIGINTs per group,
    map-side combined.  Z is exact integer arithmetic — |Z| <= total
    row count, no overflow below 2^63 rows per group.
    """
    group_cols = group_cols or []
    rows = df.where(F.col(value_col).isNotNull())
    aggs = []
    for j in range(estimators):
        sign = F.when(
            hash60(F.col(value_col), f"{salt}{j}") % 2 == 0, F.lit(1)
        ).otherwise(F.lit(-1))
        aggs.append(F.sum(sign).cast("long").alias(f"z{j}"))
    # ONE scan: all estimator sums in a single map-side-combined
    # aggregate, then unpivot the fixed-width row to (estimator, z)
    wide = rows.groupBy(*group_cols).agg(*aggs)
    stack = ", ".join(f"{j}, z{j}" for j in range(estimators))
    return wide.selectExpr(
        *group_cols, f"stack({estimators}, {stack}) AS (estimator, z)"
    )


def ams_f2_estimate(
    sketch: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """F2 estimate per group: the exact integer MEDIAN of the Z_j^2
    values (odd estimator count -> the median is an element, so both
    engines agree exactly; no mean-of-means float path).  Exact below
    Z^2 < 2^53 (the median passes through a double) — 9.4e7 rows per
    group per sign imbalance; far beyond that, widen estimators
    instead.
    """
    group_cols = group_cols or []
    sq = sketch.select(*group_cols, (F.col("z") * F.col("z")).alias("z2"))
    return sq.groupBy(*group_cols).agg(
        F.expr("CAST(median(z2) AS BIGINT)").alias("f2_est"),
        F.count(F.lit(1)).cast("long").alias("n_estimators"),
    )


def sql_ams_f2(
    source_sql: str,
    value_expr: str,
    group_exprs: list[str] | None = None,
    estimators: int = 9,
    salt: str = "ams",
) -> str:
    """DuckDB oracle for sketch+estimate over ``source_sql``."""
    group_exprs = group_exprs or []
    g = ", ".join(group_exprs)
    g_sel = (g + ", ") if g else ""
    g_by = f"GROUP BY {g}" if g else ""
    zs = []
    for j in range(estimators):
        sign = (
            f"CASE WHEN {sql_hash60(value_expr, f'{salt}{j}')} % 2 = 0"
            " THEN 1 ELSE -1 END"
        )
        zs.append(
            f"""SELECT {g_sel}{j} AS estimator,
  CAST(sum({sign}) AS BIGINT) AS z
FROM src WHERE {value_expr} IS NOT NULL {g_by}"""
        )
    z_union = "\nUNION ALL\n".join(zs)
    return f"""WITH src AS MATERIALIZED ({source_sql}),
zraw AS ({z_union})
SELECT {g_sel}CAST(median(z * z) AS BIGINT) AS f2_est,
       CAST(count(*) AS BIGINT) AS n_estimators
FROM zraw {g_by}"""
