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
