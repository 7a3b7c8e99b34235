"""KG-embedding training-data generation: deterministic negative sampling.

Every KG-embedding trainer (TransE/DistMult/ComplEx family) consumes the
materialized triple set this engine produces (the reference's ``as_graph``
output, kgforge/core/conversions/rdf.py:275-312) plus K *corrupted* triples
per positive — same (subj, pred) with the object swapped for a uniformly
drawn entity.  At 10^12-triple scale the sampler must be a dataflow, not a
driver loop, and it must be reproducible so a resumed / re-run job emits the
same epoch; this implementation derives every draw from a content hash.

Sampling discipline is "filtered, drop-not-resample": draws that collide
with the true object or with ANY positive triple are dropped rather than
redrawn (the standard large-scale practice — resampling loops are
data-dependent and break the one-pass dataflow; with a vocabulary of
millions, the expected loss is negligible and the emitted slot ids make the
gaps visible to the trainer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexus_forge_spark.operators.ranking import global_row_numbers
from nexus_forge_spark.operators.sketches import hash60

_SEP = "\x1f"


def negative_samples(
    triples: DataFrame,
    k: int = 3,
    entities: DataFrame | None = None,
    salt: str = "kge",
    filtered: bool = True,
) -> DataFrame:
    """K deterministic object-corrupted negatives per positive triple.

    triples: (subj, pred, obj) positives.  entities: single-column entity
    vocabulary (defaults to the distinct objects of ``triples``).  Each
    (triple, slot j < k) draws entity index ``hash60(s,p,o,j) % n`` from the
    vocabulary ordered by entity id — fully reproducible across runs,
    partitionings, and cluster sizes.

    Scale posture: the vocabulary is indexed once by the parallel ranking
    operator (no single-partition exchange) and the slot expansion is a
    map-side explode of a k-literal array.  The index join is
    broadcast-eligible (entity vocabularies are dictionary-sized next to
    the triple corpus); the filtered anti-join against the positive set is
    the one required shuffle, on the same (subj, pred, obj) key layout the
    dedup stage already produced.  Nothing touches the driver but the
    vocabulary count (one job over the dictionary).

    Returns (subj, pred, obj_neg, slot).
    """
    ents = (
        entities
        if entities is not None
        else triples.select(F.col("obj").alias("entity_id")).distinct()
    )
    ent_col = ents.columns[0]
    idx = global_row_numbers(
        ents.select(F.col(ent_col).cast("string").alias("entity_id")).distinct(),
        order_by=["entity_id"],
        out_col="rn",
    )
    n = idx.count()
    if n == 0:
        raise ValueError("negative_samples: empty entity vocabulary")

    slots = F.array(*[F.lit(j) for j in range(k)])
    cand = (
        triples.select("subj", "pred", "obj")
        .withColumn("slot", F.explode(slots))
        .withColumn(
            "rn",
            hash60(
                F.concat_ws(
                    _SEP,
                    F.col("subj"),
                    F.col("pred"),
                    F.col("obj"),
                    F.col("slot").cast("string"),
                ),
                salt,
            )
            % F.lit(n)
            + F.lit(1),
        )
        .join(F.broadcast(idx), "rn")
        .where(F.col("entity_id") != F.col("obj"))
        .select(
            "subj",
            "pred",
            F.col("entity_id").alias("obj_neg"),
            F.col("slot").cast("int").alias("slot"),
        )
    )
    if filtered:
        pos = triples.select(
            F.col("subj").alias("_ps"),
            F.col("pred").alias("_pp"),
            F.col("obj").cast("string").alias("_po"),
        )
        cand = cand.join(
            pos,
            (F.col("subj") == F.col("_ps"))
            & (F.col("pred") == F.col("_pp"))
            & (F.col("obj_neg") == F.col("_po")),
            "left_anti",
        )
    return cand


def ranking_eval(
    scored: DataFrame,
    test: DataFrame,
    train: DataFrame | None = None,
    ks: tuple[int, ...] = (1, 3, 10),
) -> DataFrame:
    """Filtered ranking evaluation (the MRR / Hits@k protocol of Bordes et
    al. 2013, public method): for each held-out fact, rank its true
    candidate among the scored candidates of the same query, EXCLUDING
    known training positives (the 'filtered' setting — penalizing a model
    for ranking a different TRUE fact above the test fact measures
    nothing).

    scored(q, cand, score BIGINT) — the candidate universe per query is
    whatever the caller scored (at 10^12 scale that is a blocked or
    sampled candidate set, never all entities; the operator prices
    exactly what it is given).  test(q, true_cand); train(q, cand)
    positives to exclude.  A test fact whose true candidate was never
    scored gets score 0 (rank below every positively scored candidate).

    rank = 1 + |{c : c scored for q, c != true, c not in train(q),
                  score_c > score_t or (score_c == score_t and
                  c < true)}|   -- deterministic pessimistic tie-break

    -> ONE row (n_test, mrr_ppm, hits{k}_ppm ...).  All integer: the
    reciprocal rank is 1e9 DIV rank summed, then normalized to ppm.
    Shape: one (q)-keyed join test->scored + one anti-join against train
    + one count aggregate per test fact + one global fold — no windows,
    no per-query sort: Hits@k needs only HOW MANY candidates beat the
    true one, never the sorted list.
    """
    t = test.select(F.col("q"), F.col("true_cand")).distinct()
    s = scored.select("q", "cand", F.col("score").cast("long").alias("score"))
    true_score = (
        t.join(
            s.select("q", F.col("cand").alias("true_cand"), "score"),
            ["q", "true_cand"],
            "left",
        )
        .select("q", "true_cand", F.coalesce("score", F.lit(0)).alias("tscore"))
    )
    cands = true_score.join(s, "q").where(F.col("cand") != F.col("true_cand"))
    if train is not None:
        cands = cands.join(
            train.select("q", "cand").distinct(), ["q", "cand"], "left_anti"
        )
    beats = (
        cands.where(
            (F.col("score") > F.col("tscore"))
            | ((F.col("score") == F.col("tscore")) & (F.col("cand") < F.col("true_cand")))
        )
        .groupBy("q", "true_cand")
        .agg(F.count(F.lit(1)).alias("n_beat"))
    )
    ranks = true_score.join(beats, ["q", "true_cand"], "left").select(
        (F.coalesce("n_beat", F.lit(0)) + 1).alias("rank")
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.expr("sum(1000000000 DIV rank) DIV (count(*) * 1000)")
        .cast("long")
        .alias("mrr_ppm"),
    ]
    for k in ks:
        aggs.append(
            F.expr(f"sum(CASE WHEN rank <= {k} THEN 1 ELSE 0 END) * 1000000 "
                   f"DIV count(*)")
            .cast("long")
            .alias(f"hits{k}_ppm")
        )
    return ranks.agg(*aggs)


def sql_ranking_eval(
    scored_sql: str,
    test_sql: str,
    train_sql: str | None = None,
    ks: tuple[int, ...] = (1, 3, 10),
) -> str:
    """DuckDB oracle for ranking_eval."""
    filt = (
        f"""AND NOT EXISTS (
      SELECT 1 FROM (SELECT DISTINCT q, cand FROM ({train_sql})) tr
      WHERE tr.q = c.q AND tr.cand = c.cand
    )"""
        if train_sql is not None
        else ""
    )
    hits = ",\n       ".join(
        f"CAST(sum(CASE WHEN rank <= {k} THEN 1 ELSE 0 END) * 1000000 "
        f"// count(*) AS BIGINT) AS hits{k}_ppm"
        for k in ks
    )
    return f"""WITH s AS MATERIALIZED (
  SELECT q, cand, CAST(score AS BIGINT) AS score FROM ({scored_sql})
),
t AS MATERIALIZED (SELECT DISTINCT q, true_cand FROM ({test_sql})),
ts AS (
  SELECT t.q, t.true_cand, coalesce(s.score, 0) AS tscore
  FROM t LEFT JOIN s ON s.q = t.q AND s.cand = t.true_cand
),
beats AS (
  SELECT ts.q, ts.true_cand, count(*) AS n_beat
  FROM ts JOIN s c ON c.q = ts.q AND c.cand <> ts.true_cand
  WHERE (c.score > ts.tscore
         OR (c.score = ts.tscore AND c.cand < ts.true_cand))
  {filt}
  GROUP BY ts.q, ts.true_cand
),
ranks AS (
  SELECT coalesce(b.n_beat, 0) + 1 AS rank
  FROM ts LEFT JOIN beats b ON b.q = ts.q AND b.true_cand = ts.true_cand
)
SELECT CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(1000000000 // rank) // (count(*) * 1000) AS BIGINT) AS mrr_ppm,
       {hits}
FROM ranks"""
