"""Deterministic synthetic generator for the interleaved-span documents table.

BASELINE.json ``input_hint`` mandates the pipeline input shape

    documents(doc_id: string,
              spans: array<struct<kind, text, media_ref, offset>>)

The driver testdata ships a *flat* documents table, so we derive the
interleaved shape two ways, both pure column expressions (no UDF, no driver
loop — `spark.range`-based, so generating 10^9 rows is just more partitions):

* ``flat_to_interleaved`` — chunk the flat ``text`` into 4-token text spans
  and deterministically interleave ``media`` spans (1 in 5 chunks), mirroring
  how a nexus-forge Resource interleaves literal properties with
  ``forge.attach`` file distributions (kgforge/core/forge.py:798-809).
* ``synthesize_documents`` — build documents of any count from the embedded
  vocabulary with seeded xxhash64 indexing, including skewed hot labels
  (a few terms in >=5% of docs) to exercise salted joins.

Determinism: every random choice is ``xxhash64(stable key, seed)`` — same
input ⇒ same output on any cluster size or partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = [
    "join", "hash", "row", "batch", "scan", "customer", "column", "filter",
    "small", "slow", "merge", "order", "vector", "line", "data", "table",
    "agg", "value", "key", "stream", "window", "spark", "group", "part",
    "big", "sort", "query", "fast", "the", "dup",
]

HOT_LABELS = ["hash join", "table scan"]  # skew: appear in >=5% of docs

CHUNK = 4  # tokens per text span
MEDIA_EVERY = 5  # 1 media span per N chunks (~20% media, per FIXTURES.md)


def _interleave_spans(doc_id: Column, tokens: Column) -> Column:
    """tokens: array<string> -> spans array<struct<kind,text,media_ref,offset>>.

    Pure SQL exprs: chunk into CHUNK-token text spans, append a media span
    after deterministically-chosen chunks, flatten, re-number offsets.
    """
    nchunks = F.greatest(F.lit(1), F.ceil(F.size(tokens) / F.lit(CHUNK)).cast("int"))
    chunks = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.array_join(F.slice(tokens, i * CHUNK + 1, CHUNK), " "),
    )
    pairs = F.transform(
        chunks,
        lambda c, i: F.when(
            # engine-portable placement hash (Spark conv(hex,16,10) ==
            # DuckDB ('0x'||hex)::BIGINT) so media positions are
            # oracle-checkable; one md5 per CHUNK tokens
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat_ws("|", doc_id, i.cast("string"))), 1, 15),
                    16,
                    10,
                ).cast("long"),
                F.lit(MEDIA_EVERY),
            )
            == 0,
            F.array(
                F.struct(
                    F.lit("text").alias("kind"),
                    c.alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                ),
                F.struct(
                    F.lit("media").alias("kind"),
                    F.lit(None).cast("string").alias("text"),
                    F.concat(F.lit("media://"), doc_id, F.lit("/"), i.cast("string")).alias(
                        "media_ref"
                    ),
                    F.lit(0).alias("offset"),
                ),
            ),
        ).otherwise(
            F.array(
                F.struct(
                    F.lit("text").alias("kind"),
                    c.alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                )
            )
        ),
    )
    flat = F.flatten(pairs)
    return F.transform(
        flat,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )


def flat_to_interleaved(flat_docs: DataFrame) -> DataFrame:
    """Driver-testdata documents(doc_id bigint, text, ...) -> interleaved shape.

    Two-step select: Spark's implicit lateral-column-alias resolution would
    otherwise rebind references to ``doc_id`` inside the spans expression to
    the just-aliased *string* doc_id.
    """
    prepared = flat_docs.select(
        F.format_string("doc-%09d", F.col("doc_id")).alias("doc_id_str"),
        F.split(F.col("text"), " ").alias("tokens"),
    )
    return prepared.select(
        F.col("doc_id_str").alias("doc_id"),
        _interleave_spans(F.col("doc_id_str"), F.col("tokens")).alias("spans"),
    )


def synthesize_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    min_tokens: int = 8,
    max_tokens: int = 64,
    num_partitions: int | None = None,
) -> DataFrame:
    """Fully synthetic interleaved documents at arbitrary scale.

    spark.range is embarrassingly parallel; every column derives from
    xxhash64(id, position, seed) so the table is identical at any
    parallelism — this is the 10^9-row bench input.
    """
    base = spark.range(0, n_docs, numPartitions=num_partitions)
    doc_id = F.format_string("doc-%09d", F.col("id"))
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    ntok = (
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(max_tokens - min_tokens + 1))
        + min_tokens
    ).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), ntok - 1),
        lambda j: F.element_at(
            vocab, (F.pmod(F.xxhash64(F.col("id"), j, F.lit(seed)), F.lit(len(VOCAB))) + 1).cast("int")
        ),
    )
    # skew: 1 in 10 docs gets a hot label prepended (>=5% per hot label)
    hot = F.array(*[F.lit(h) for h in HOT_LABELS])
    hot_pick = F.element_at(
        hot, (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(len(HOT_LABELS))) + 1).cast("int")
    )
    tokens = F.when(
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 2)), F.lit(10)) == 0,
        F.concat(F.split(hot_pick, " "), tokens),
    ).otherwise(tokens)
    prepared = base.select(doc_id.alias("doc_id_str"), tokens.alias("tokens"))
    return prepared.select(
        F.col("doc_id_str").alias("doc_id"),
        _interleave_spans(F.col("doc_id_str"), F.col("tokens")).alias("spans"),
    )
