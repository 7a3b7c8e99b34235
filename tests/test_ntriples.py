"""N-Triples serialization goldens (operators/triples.py to_ntriples).

Reference behavior: forge.as_graph(...) produces an rdflib.Graph
(kgforge/core/conversions/rdf.py:275-312) whose ntserializer emits
`<s> <p> <o> .` lines with ECHAR-escaped literals; this engine's serializer
must agree on escaping, curie/@vocab expansion, typed-literal rendering,
and blank-node passthrough.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nexus_forge_spark.operators.triples import to_ntriples

PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "doc": "https://example.org/doc/",
}
VOCAB = "http://schema.org/"

SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("obj_is_literal", T.BooleanType()),
        T.StructField("obj_datatype", T.StringType()),
    ]
)


def lines(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return [r.line for r in to_ntriples(df, PREFIXES, VOCAB).collect()]


def test_iri_triple_curie_and_vocab(spark):
    out = lines(spark, [("doc:42", "rdf:type", "Document", False, None)])
    assert out == [
        "<https://example.org/doc/42> "
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<http://schema.org/Document> ."
    ]


def test_absolute_iri_and_unknown_curie_pass_through(spark):
    out = lines(
        spark,
        [("http://c/1", "nsg:hasBody", "http://e/2", False, None)],
    )
    # unknown prefix nsg: -> wrapped verbatim (no registered namespace)
    assert out == ["<http://c/1> <nsg:hasBody> <http://e/2> ."]


def test_blank_node_labels_verbatim(spark):
    out = lines(spark, [("_:b0deadbeef", "part", "_:b1cafe", False, None)])
    assert out == ["_:b0deadbeef <http://schema.org/part> _:b1cafe ."]


def test_plain_literal_and_xsd_string_identical(spark):
    plain = lines(spark, [("doc:1", "name", "Alice", True, None)])
    typed = lines(spark, [("doc:1", "name", "Alice", True, "xsd:string")])
    assert plain == typed == [
        '<https://example.org/doc/1> <http://schema.org/name> "Alice" .'
    ]


def test_typed_literal_datatype_expanded(spark):
    out = lines(spark, [("doc:1", "balance", "711.56", True, "xsd:decimal")])
    assert out == [
        "<https://example.org/doc/1> <http://schema.org/balance> "
        '"711.56"^^<http://www.w3.org/2001/XMLSchema#decimal> .'
    ]


@pytest.mark.parametrize(
    "raw,escaped",
    [
        ('say "hi"', 'say \\"hi\\"'),
        ("a\\b", "a\\\\b"),
        ("line1\nline2", "line1\\nline2"),
        ("col\tumn", "col\\tumn"),
        ("cr\rlf", "cr\\rlf"),
        # backslash-first ordering: the backslash in an existing \n sequence
        # is escaped, THEN the raw newline — never double-escaped
        ("mix\\n\n", "mix\\\\n\\n"),
    ],
)
def test_literal_escaping(spark, raw, escaped):
    out = lines(spark, [("doc:1", "name", raw, True, None)])
    assert out == [
        f'<https://example.org/doc/1> <http://schema.org/name> "{escaped}" .'
    ]


def test_unicode_rides_through_raw(spark):
    out = lines(spark, [("doc:1", "name", "naïve 知識", True, None)])
    assert out == [
        '<https://example.org/doc/1> <http://schema.org/name> "naïve 知識" .'
    ]


def test_serializer_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [("doc:1", "name", "x", True, None)], SCHEMA
    )
    plan = to_ntriples(df, PREFIXES, VOCAB)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_asof_triples_last_writer_wins(spark):
    from nexus_forge_spark.operators.triples import asof_triples

    rows = [
        ("u1", "p", "v1", 100, 1),
        ("u1", "p", "v2", 200, 2),   # latest at cutoff 250
        ("u1", "p", "v3", 300, 3),   # after cutoff
        ("u1", "p", "v4", 200, 9),   # same ts as v2, higher seq -> wins
        ("u2", "q", "w1", 50, 4),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts_micros long, seq long"
    )
    got = {(r.subj, r.pred): r.obj for r in asof_triples(df, 250).collect()}
    assert got == {("u1", "p"): "v4", ("u2", "q"): "w1"}


def test_asof_triples_matches_duckdb(spark):
    import duckdb

    from nexus_forge_spark.operators.triples import asof_triples, sql_asof_triples

    rows = [
        (f"u{i % 5}", f"p{i % 3}", f"v{i}", (i * 37) % 1000, i) for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts_micros long, seq long"
    )
    got = sorted((r.subj, r.pred, r.obj) for r in asof_triples(df, 500).collect())
    vals = ", ".join(f"('{s}', '{p}', '{o}', {t}, {q})" for s, p, o, t, q in rows)
    sql = sql_asof_triples(
        f"SELECT * FROM (VALUES {vals}) AS t(subj, pred, obj, ts_micros, seq)", 500
    )
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_fold_asof_state_order_insensitive(spark):
    from nexus_forge_spark.operators.triples import asof_triples, fold_asof_state

    rows = [
        (f"u{i % 4}", f"p{i % 2}", f"v{i}", (i * 31) % 500, i) for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts_micros long, seq long"
    )
    full = sorted(
        (r.subj, r.pred, r.obj) for r in asof_triples(df, 10**9).collect()
    )
    # fold in two different batch orders
    b = [df.where(F.col("seq") % 3 == i) for i in range(3)]
    for order in ([0, 1, 2], [2, 0, 1]):
        state = None
        for i in order:
            state = fold_asof_state(state, b[i])
        got = sorted((r.subj, r.pred, r.obj) for r in state.collect())
        assert got == full


def test_schema_drift_classes(spark):
    from nexus_forge_spark.operators.triples import predicate_profile, schema_drift

    mk = lambda rows: spark.createDataFrame(rows, "subj string, pred string, obj string")
    old = mk(
        [("s1", "p_keep", "a"), ("s2", "p_keep", "b"), ("s1", "p_gone", "x"),
         ("s1", "p_flip", "v1")]
    )
    new = mk(
        [("s1", "p_keep", "a"), ("s2", "p_keep", "b"), ("s1", "p_new", "y"),
         ("s1", "p_flip", "v1"), ("s1", "p_flip", "v2")]  # goes multi-valued
    )
    out = {r.pred: r for r in schema_drift(
        predicate_profile(old), predicate_profile(new)
    ).collect()}
    assert out["p_keep"].change == "kept" and not out["p_keep"].functional_changed
    assert out["p_gone"].change == "removed"
    assert out["p_new"].change == "added"
    f = out["p_flip"]
    assert f.change == "kept" and f.was_functional and not f.is_functional
    assert f.functional_changed


def test_from_ntriples_roundtrip_hostile_literals(spark):
    """Escaped quotes, backslashes, newlines, tabs, typed literals,
    bnodes — every ECHAR case must survive serialize -> parse."""
    from nexus_forge_spark.operators.triples import from_ntriples, to_ntriples

    rows = [
        ("http://e/s1", "http://e/p", 'say "hi" \\ twice', True, None),
        ("http://e/s2", "http://e/p", "line1\nline2\ttabbed\r", True, None),
        ("http://e/s3", "http://e/p", "42", True, "http://www.w3.org/2001/XMLSchema#integer"),
        ("_:b0", "http://e/p", "http://e/o", False, None),
        ("http://e/s4", "http://e/p", "_:b1", False, None),
        ("http://e/s5", "http://e/p", "plain", True, "xsd:string"),  # folds to NULL dt
    ]
    t = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_literal boolean, obj_datatype string",
    )
    back = {
        (r.subj, r.pred, r.obj, r.obj_is_literal, r.obj_datatype)
        for r in from_ntriples(to_ntriples(t)).collect()
    }
    want = {
        (s, p, o, il, None if dt == "xsd:string" else dt)
        for s, p, o, il, dt in rows
    }
    assert back == want


def test_from_ntriples_drops_malformed(spark):
    from nexus_forge_spark.operators.triples import from_ntriples

    lines = spark.createDataFrame(
        [("<http://e/s> <http://e/p> <http://e/o> .",),
         ("this is not a triple",), ("",)],
        "line string",
    )
    out = from_ntriples(lines).collect()
    assert len(out) == 1 and out[0].subj == "http://e/s"


def test_void_description_counts(spark):
    from nexus_forge_spark.operators.triples import void_description

    t = spark.createDataFrame(
        [("a", "p", "x"), ("a", "q", "y"), ("b", "p", "x"),
         ("a", "rdf:type", "C1"), ("b", "rdf:type", "C2")],
        "subj string, pred string, obj string",
    )
    rows = {(r.subj, r.pred, r.obj) for r in void_description(t, "ds").collect()}
    assert ("ds", "void:triples", "5") in rows
    assert ("ds", "void:distinctSubjects", "2") in rows
    assert ("ds", "void:classes", "2") in rows
    assert ("ds/prop/p", "void:triples", "2") in rows
    assert ("ds/class/C1", "void:entities", "1") in rows


def test_shacl_induction_constraints(spark):
    from nexus_forge_spark.operators.triples import shacl_induction

    rows = [("i1", "rdf:type", "C"), ("i2", "rdf:type", "C"),
            ("i1", "name", "n1"), ("i2", "name", "n2"),       # total, functional
            ("i1", "tag", "t1"), ("i1", "tag", "t2"),          # partial, multi
            ("i1", "code", "c1"), ("i2", "code", "c2"), ("i2", "code", "c3")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {(r.subj, r.pred, r.obj) for r in shacl_induction(t).collect()}
    assert ("shape:C", "sh:targetClass", "C") in got
    assert ("prop:C|name", "sh:minCount", "1") in got
    assert ("prop:C|name", "sh:maxCount", "1") in got
    # tag: only i1 has it -> no minCount; i1 has 2 -> no maxCount
    assert ("prop:C|tag", "sh:minCount", "1") not in got
    assert ("prop:C|tag", "sh:maxCount", "1") not in got
    # code: total but i2 repeats -> minCount only
    assert ("prop:C|code", "sh:minCount", "1") in got
    assert ("prop:C|code", "sh:maxCount", "1") not in got
