"""ES query-DSL compiler: clause semantics over a tiny in-memory index.

Reference behavior: filter-context bool queries as the reference's own
builders emit them (es_query_builder.py) — including ES's null semantics
(must_not of a missing field matches; exists filters nulls)."""

from __future__ import annotations

import pytest

from nexus_forge_spark.forge import SparkForge, SparkForgeConfig
from nexus_forge_spark.functions.esdsl import EsQueryError, es_search

ROWS = [
    ("r1", "alpha beta", "music", 10, "note-1"),
    ("r2", "Alpha Gamma", "video", 25, None),
    ("r3", "beta delta", "music", 40, "note-3"),
    ("r4", "epsilon", None, 55, "misc"),
]
SCHEMA = "id string, title string, category string, size long, note string"


@pytest.fixture(scope="module")
def index(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_term_terms_range(index):
    assert ids(es_search(index, {"query": {"term": {"category": "music"}}})) == ["r1", "r3"]
    assert ids(es_search(index, {"query": {"terms": {"id": ["r2", "r4"]}}})) == ["r2", "r4"]
    assert ids(es_search(index, {"query": {"range": {"size": {"gte": 25, "lt": 55}}}})) == ["r2", "r3"]


def test_match_is_tokenized_and_case_insensitive(index):
    # both tokens must appear, any case
    assert ids(es_search(index, {"query": {"match": {"title": "ALPHA beta"}}})) == ["r1"]
    assert ids(es_search(index, {"query": {"match": {"title": "alpha"}}})) == ["r1", "r2"]


def test_match_phrase_substring(index):
    assert ids(es_search(index, {"query": {"match_phrase": {"title": "a b"}}})) == ["r1"]
    assert ids(es_search(index, {"query": {"match_phrase": {"title": "TA DEL"}}})) == ["r3"]


def test_exists_prefix_wildcard_ids(index):
    assert ids(es_search(index, {"query": {"exists": {"field": "note"}}})) == ["r1", "r3", "r4"]
    assert ids(es_search(index, {"query": {"prefix": {"id": "r"}}})) == ["r1", "r2", "r3", "r4"]
    assert ids(es_search(index, {"query": {"wildcard": {"note": "note-?"}}})) == ["r1", "r3"]
    assert ids(es_search(index, {"query": {"ids": {"values": ["r1", "r9"]}}})) == ["r1"]


def test_keyword_suffix_maps_to_column(index):
    assert ids(es_search(index, {"query": {"term": {"category.keyword": "video"}}})) == ["r2"]


def test_bool_with_null_semantics(index):
    # must_not of a field equality: rows where the field is NULL do match
    q = {"query": {"bool": {"must_not": [{"term": {"category": "music"}}]}}}
    assert ids(es_search(index, q)) == ["r2", "r4"]
    # should with minimum_should_match=2
    q = {"query": {"bool": {"should": [
        {"term": {"category": "music"}},
        {"range": {"size": {"gte": 30}}},
        {"exists": {"field": "note"}},
    ], "minimum_should_match": 2}}}
    assert ids(es_search(index, q)) == ["r1", "r3", "r4"]
    # should alongside filter is optional unless msm is explicit
    q = {"query": {"bool": {
        "filter": [{"range": {"size": {"gte": 20}}}],
        "should": [{"term": {"category": "music"}}],
    }}}
    assert ids(es_search(index, q)) == ["r2", "r3", "r4"]


def test_sort_from_size_source(index):
    q = {
        "query": {"match_all": {}},
        "sort": [{"size": {"order": "desc"}}],
        "from": 1,
        "size": 2,
        "_source": ["id", "size"],
    }
    out = es_search(index, q)
    assert out.columns == ["id", "size"]
    assert [r["id"] for r in out.collect()] == ["r3", "r2"]


def test_pagination_without_sort_rejected(index):
    with pytest.raises(EsQueryError, match="sort"):
        es_search(index, {"query": {"match_all": {}}, "from": 1, "size": 2})


def test_source_excludes(index):
    out = es_search(index, {"query": {"match_all": {}}, "_source": {"excludes": ["note", "title"]}})
    assert out.columns == ["id", "category", "size"]


def test_forge_elastic_verb(spark, index):
    forge = SparkForge(spark, SparkForgeConfig())
    out = forge.elastic(
        '{"query": {"term": {"category": "video"}}}', index=index
    )
    assert ids(out) == ["r2"]
    # limit/offset kwargs override the body (need a sort for determinism)
    out = forge.elastic(
        {"query": {"match_all": {}}, "sort": ["id"]}, index=index, limit=2, offset=1
    )
    assert [r["id"] for r in out.collect()] == ["r2", "r3"]


def test_unsupported_clause_raises(index):
    with pytest.raises(EsQueryError, match="unsupported"):
        es_search(index, {"query": {"fuzzy": {"title": "alpa"}}})


def test_script_score_cosine_matches_numpy(spark):
    import math

    from nexus_forge_spark.functions.esdsl import es_search

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.6, 0.8, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [9.9, 0.0, 0.0]),  # filtered out by the range clause
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    body = {
        "query": {
            "script_score": {
                "query": {"range": {"vec_id": {"lt": 3}}},
                "script": {
                    "source": "cosineSimilarity(params.qv, 'embedding') + 1.0",
                    "params": {"qv": [1.0, 0.0, 0.0]},
                },
            }
        }
    }
    out = es_search(emb, body).collect()
    got = {r.vec_id: r["_score"] for r in out}
    assert set(got) == {0, 1, 2}
    assert math.isclose(got[0], 2.0, rel_tol=1e-9)
    assert math.isclose(got[1], 1.6, rel_tol=1e-6)
    assert math.isclose(got[2], 1.0, rel_tol=1e-9)
    # ES default order: score descending
    assert [r.vec_id for r in out] == [0, 1, 2]


def test_script_score_rejects_unknown_script(spark):
    import pytest

    from nexus_forge_spark.functions.esdsl import EsQueryError, es_search

    emb = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(EsQueryError, match="script_score supports only"):
        es_search(
            emb,
            {"query": {"script_score": {
                "query": {"match_all": {}},
                "script": {"source": "doc['x'].value * 2"},
            }}},
        )
