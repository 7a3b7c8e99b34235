"""Fellegi-Sunter record-linkage scoring: turn blocked candidate pairs
plus per-field agreement indicators into calibrated match decisions.

The reference's resolver ranks candidates by a single lexical score
(Resolver.resolve BEST/ALL — kgforge/core/archetypes/resolver.py plus
the sklearn entity-linker's kNN distance); production entity resolution
at warehouse scale composes *several* evidence fields (name agreement,
attribute agreement, context agreement) under the classic Fellegi-Sunter
log-likelihood-ratio model: each field contributes ``log(m/u)`` when it
agrees and ``log((1-m)/(1-u))`` when it disagrees, the pair's total
score thresholds into match / possible (clerical review) / nonmatch.

Engine-exactness discipline: weights are caller-supplied INTEGER
milli-units (pre-computed log-ratios x1000, the standard fixed-point
rendering) and the score is a pure integer sum — no float anywhere, so
a DuckDB oracle running the same algebra matches hash-for-hash.

Scale posture: scoring is entirely map-side over the candidate-pair
table (one projection, no shuffle, no UDF) — the expensive part of ER
is candidate generation, which this module deliberately does NOT redo:
feed it pairs from any existing blocker (LSH bands, PPJoin prefixes,
sorted-neighborhood windows, trigram blocks).  At 10^12 rows the score
+ classify stage adds zero exchanges to whatever the blocker produced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fs_classify(
    pairs: DataFrame,
    weights_milli: dict[str, tuple[int, int]],
    upper_milli: int,
    lower_milli: int,
) -> DataFrame:
    """Score and classify candidate pairs under the Fellegi-Sunter model.

    ``weights_milli`` maps each boolean agreement column already present
    on ``pairs`` to ``(agree_milli, disagree_milli)`` — the field's
    log(m/u) and log((1-m)/(1-u)) in integer milli-units (agree weight
    positive, disagree weight negative in any sane calibration).  NULL
    agreement (field missing on either record) contributes 0, the
    standard treatment.

    Adds ``score_milli`` (BIGINT sum) and ``decision``:
    'match' when score >= upper_milli, 'nonmatch' when score <=
    lower_milli, else 'possible' (the clerical-review band).
    """
    if upper_milli < lower_milli:
        raise ValueError("upper_milli must be >= lower_milli")
    score: Column = F.lit(0).cast("long")
    for col, (agree, disagree) in weights_milli.items():
        score = score + F.when(F.col(col).isNull(), F.lit(0)).when(
            F.col(col), F.lit(agree)
        ).otherwise(F.lit(disagree)).cast("long")
    return pairs.withColumn("score_milli", score).withColumn(
        "decision",
        F.when(F.col("score_milli") >= upper_milli, F.lit("match"))
        .when(F.col("score_milli") <= lower_milli, F.lit("nonmatch"))
        .otherwise(F.lit("possible")),
    )


def sql_fs_classify(
    pairs_sql: str,
    weights_milli: dict[str, tuple[int, int]],
    upper_milli: int,
    lower_milli: int,
    out_cols: list[str],
) -> str:
    """DuckDB oracle rendering of the identical integer FS algebra."""
    terms = [
        f"(CASE WHEN {c} IS NULL THEN 0 WHEN {c} THEN {a} ELSE {d} END)"
        for c, (a, d) in weights_milli.items()
    ]
    score = " + ".join(terms) if terms else "0"
    outs = ", ".join(out_cols)
    return f"""WITH pairs AS ({pairs_sql}),
scored AS (
  SELECT *, CAST({score} AS BIGINT) AS score_milli FROM pairs
)
SELECT {outs}, score_milli,
       CASE WHEN score_milli >= {upper_milli} THEN 'match'
            WHEN score_milli <= {lower_milli} THEN 'nonmatch'
            ELSE 'possible' END AS decision
FROM scored"""


def blocking_metrics(
    candidate_pairs: DataFrame,
    truth_pairs: DataFrame,
    n_records: int,
) -> DataFrame:
    """Blocking-quality evaluation (the Christen ER-survey metrics):
    ``reduction_ratio_ppm`` — how much of the n*(n-1)/2 comparison space
    the blocker pruned — and ``pair_completeness_ppm`` — how many true
    matches survived as candidates (the blocker's recall; what the
    prefix/LSH/SNM losslessness arguments claim, here measured).

    Both candidate and truth pairs are normalized to unordered (a < b)
    form first, so orientation conventions can't skew the counts.  All
    ratios are truncating integer ppm — engine-exact.

    Scale posture: one distinct per side + one broadcast semi-join
    (truth sets are labeled data — small by definition) + two 1-row
    aggregates; the candidate table never self-joins.  Output is a
    single row: (n_candidates, n_truth, n_truth_covered,
    reduction_ratio_ppm, pair_completeness_ppm).
    """
    total_pairs = n_records * (n_records - 1) // 2

    def _norm(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )

    cand = _norm(candidate_pairs)
    truth = _norm(truth_pairs)
    covered = cand.join(F.broadcast(truth), ["a", "b"], "left_semi")
    counts = (
        cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
        .crossJoin(truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth")))
        .crossJoin(
            covered.agg(
                F.count(F.lit(1)).cast("long").alias("n_truth_covered")
            )
        )
    )
    return counts.select(
        "n_candidates",
        "n_truth",
        "n_truth_covered",
        F.expr(
            f"(({total_pairs} - n_candidates) * 1000000) div {total_pairs}"
        )
        .cast("long")
        .alias("reduction_ratio_ppm"),
        F.expr("CASE WHEN n_truth > 0 THEN (n_truth_covered * 1000000) div n_truth ELSE 0 END")
        .cast("long")
        .alias("pair_completeness_ppm"),
    )
