"""Smoke: flat testdata -> interleaved documents -> mentions -> resolve -> triples."""

from __future__ import annotations

from pyspark.sql import functions as F

from nexus_forge_spark import dims
from nexus_forge_spark.operators import mentions as M
from nexus_forge_spark.operators import resolve as R
from nexus_forge_spark.plans import pipeline
from nexus_forge_spark.sources import flat_to_interleaved, load_table, synthesize_documents


def test_interleaved_shape(spark, sf_dir):
    docs = flat_to_interleaved(load_table(spark, "documents", sf_dir))
    row = docs.first()
    assert row.doc_id.startswith("doc-")
    offsets = [s.offset for s in row.spans]
    assert offsets == list(range(len(offsets)))  # span-sequence invariant
    kinds = {s.kind for s in row.spans}
    assert kinds <= {"text", "media"}
    for s in row.spans:
        if s.kind == "text":
            assert s.text is not None and s.media_ref is None
        else:
            assert s.media_ref is not None and s.text is None


def test_synthesize_documents_deterministic(spark):
    a = synthesize_documents(spark, 50, seed=7).collect()
    b = synthesize_documents(spark, 50, seed=7, num_partitions=13).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    # skew: hot labels present
    txt = " ".join(s.text for r in a for s in r.spans if s.kind == "text")
    assert "hash join" in txt or "table scan" in txt


def test_mentions_and_exact_resolve(spark, sf_dir):
    docs = flat_to_interleaved(load_table(spark, "documents", sf_dir))
    mentions = M.extract_mentions(docs)
    assert mentions.where(F.col("n") == 2).count() > 0
    alias = R.build_alias_table(dims.ontology_terms_idx(spark), dims.ONTOLOGY_MATCH_PROPS)
    res = R.resolve(mentions, alias, R.EXACT_MATCH)
    hits = res.limit(5).collect()
    assert hits and all(h.rank == 1 for h in hits)
    # every resolved unigram 'spark' maps to the Spark term
    spark_hits = res.where(F.col("mention") == "spark").select("entity_id").distinct().collect()
    assert [h.entity_id for h in spark_hits] == [dims.NS + "Spark"]


def test_deprecated_excluded(spark):
    alias = R.build_alias_table(dims.ontology_terms_idx(spark), dims.ONTOLOGY_MATCH_PROPS)
    assert alias.where(F.col("entity_id") == dims.NS + "IndexScan").count() == 0


def test_end_to_end_triples(spark, sf_dir):
    docs = flat_to_interleaved(load_table(spark, "documents", sf_dir))
    triples = pipeline.construct_kg(docs)
    n = triples.count()
    assert n > 0
    # set semantics
    assert triples.groupBy("subj", "pred", "obj").count().where("count > 1").count() == 0
    stages = {r.stage for r in triples.select("stage").distinct().collect()}
    assert "resolve" in stages and "media" in stages
