

def test_search_snippets(spark):
    from nexus_forge_spark.operators.search import search_snippets

    rows = [
        (1, "alpha beta GAMMA delta epsilon zeta eta theta"),
        (2, "nothing matching here at all"),
        (3, "x gamma then beta later"),  # gamma earlier than beta
        (4, "beta at gamma same-doc: beta first by position"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.term, r.pos, r.snippet)
        for r in search_snippets(df, ["beta", "gamma"], radius=8).collect()
    }
    assert 2 not in out
    # doc 1: beta at pos 7 (case-insensitive match of GAMMA at 12 loses)
    assert out[1][0] == "beta" and out[1][1] == 7
    # radius window clamps at the text start
    assert out[1][2] == "alpha beta GAMMA del"[: 16 + 4]
    # doc 3: gamma (pos 3) beats beta (pos 16)
    assert out[3][0] == "gamma" and out[3][1] == 3
    assert out[4][0] == "beta" and out[4][1] == 1
