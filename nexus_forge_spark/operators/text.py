"""Text analysis operators: language ID, quality scoring, token counting,
fingerprinting.  All native Column expressions (whole-stage codegen);
designed for a 100 TB corpus where every per-doc pass must be map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles (n-gram/stopword heuristic language ID)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "fr": ["le", "la", "les", "de", "et", "un", "est"],
    "es": ["el", "la", "los", "de", "y", "un", "es"],
    "de": ["der", "die", "das", "und", "ein", "ist", "zu"],
}

TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # BPE-ish word/number/punct pieces


def tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text)).cast("int")


def regex_token_count(text: Column) -> Column:
    """BPE-ish piece count: words / numbers / punctuation runs."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)).cast("int")


def language_scores(text: Column) -> Column:
    """struct of per-language stopword-hit counts."""
    toks = tokens(text)
    return F.struct(
        *[
            F.size(F.filter(toks, _isin(words))).alias(lang)
            for lang, words in LANG_PROFILES.items()
        ]
    )


def _isin(words: list[str]):
    # closure factory: a two-param lambda would be treated by F.filter as the
    # (element, index) form
    return lambda w: w.isin(*words)


def language_id(text: Column, default: str = "und") -> Column:
    """argmax language by stopword profile; 'und' when no profile hits.
    Deterministic tiebreak: profile order."""
    toks = tokens(text)
    scores = [
        (lang, F.size(F.filter(toks, _isin(words))))
        for lang, words in LANG_PROFILES.items()
    ]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit(default)
    for lang, s in reversed(scores):
        out = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(out)
    return out


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + a composite [0,1] score:
    length, distinct ratio, stopword ratio, mean token length, alpha ratio."""
    t = F.col(text_col)
    toks = tokens(t)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop = F.size(F.filter(toks, lambda w: w.isin(*LANG_PROFILES["en"])))
    total_len = F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")) / F.greatest(
        F.length(t), F.lit(1)
    )
    distinct_ratio = (n_distinct / n).cast("double")
    stop_ratio = (stop / n).cast("double")
    mean_len = (total_len / n).cast("double")
    # composite: favor diverse, readable, alpha-heavy docs
    score = (
        F.least(distinct_ratio * 2, F.lit(1.0)) * 0.4
        + F.least(mean_len / F.lit(8.0), F.lit(1.0)) * 0.3
        + alpha.cast("double") * 0.3
    )
    return df.select(
        "*",
        n.cast("int").alias("n_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_len.alias("mean_token_len"),
        F.round(score, 6).alias("quality_score"),
    )


def rolling_fingerprint(text: Column, window: int = 4) -> Column:
    """Winnowing-style document fingerprint: md5 of every `window`-token
    shingle, keep the minimum — robust to local edits, engine-portable.

    Column form = interpreted higher-order transform (md5 outside codegen).
    Prefer rolling_fingerprint_agg for whole-corpus runs — measured ~10x
    faster at sf0.1 (same explode+codegen-agg finding as MinHash)."""
    toks = tokens(text)
    grams = F.when(
        F.size(toks) >= window,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - window),
            lambda i: F.md5(F.array_join(F.slice(toks, i + 1, window), " ")),
        ),
    ).otherwise(F.array(F.md5(F.array_join(toks, " "))))
    return F.array_min(grams)


def rolling_fingerprint_agg(
    df, text_col: str = "text", id_col: str = "doc_id", window: int = 4
):
    """(id, fp) via explode + whole-stage-codegen md5 + map-side partial
    min aggregation — the shuffle carries one per-partition minimum per
    doc, not the grams.  Same values as rolling_fingerprint."""
    toks = df.select(id_col, tokens(F.col(text_col)).alias("toks"))
    long_fp = (
        toks.where(F.size("toks") >= window)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.size("toks") - window)).alias("i"),
            "toks",
        )
        .select(
            id_col,
            F.md5(F.array_join(F.slice(F.col("toks"), F.col("i") + 1, window), " ")).alias("g"),
        )
        .groupBy(id_col)
        .agg(F.min("g").alias("fp"))
    )
    short_fp = toks.where(F.size("toks") < window).select(
        id_col, F.md5(F.array_join("toks", " ")).alias("fp")
    )
    return long_fp.unionByName(short_fp)


def unigram_logprob_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style corpus-LM scoring (Wenzek et al. 2020 use a KenLM 5-gram;
    the unigram variant keeps the same shape fully set-oriented): score each
    document by the mean negative log-probability of its tokens under the
    corpus unigram distribution — low = boilerplate-ish/common, high =
    rare-token-heavy.

    All integer micro-nats: per-token -ln p(t) is rounded to a BIGINT
    once (libm's 1-ulp ln differences vanish at micro precision), so the
    per-doc sums and means are engine-exact.

    Scale posture: one token-keyed groupBy for the counts (partial agg
    map-side, vocab << corpus), one token-keyed join back (the counts
    table is vocab-sized — broadcastable for natural-language vocabs),
    one per-doc aggregate.  Output: (id, n_tokens, sum_nll_micro,
    mean_nll_micro).
    """
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t"))
    counts = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("n_total"))
    scored = (
        toks.join(F.broadcast(counts), "t")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.round(F.log(F.col("n_total") / F.col("c")) * 1_000_000)
            .cast("long")
            .alias("nll_micro"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("nll_micro").alias("sum_nll_micro"),
        F.expr("CAST(sum(nll_micro) div count(1) AS BIGINT)").alias(
            "mean_nll_micro"
        ),
    )


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam_ppm: int = 900_000,
) -> DataFrame:
    """Interpolated bigram corpus-LM scoring — the CCNet-style upgrade of
    :func:`unigram_logprob_scores` (Wenzek et al. 2020 filter on a real LM;
    a Jelinek-Mercer-interpolated bigram keeps the shape set-oriented):
    per bigram position, ``p = lam * c(prev,w)/c(prev.) + (1-lam) * c(w)/N``
    and the doc score is the mean ``-ln p`` in integer micro-nats.

    Engine exactness: ``lam`` and ``1-lam`` are BOTH derived from the same
    integer ppm by division (never ``1 - lam`` in doubles — 1-0.9 is NOT
    the nearest double to 0.1), the probability is one deterministic IEEE
    multiply/divide/add chain over exact integer counts, and the single
    ``ln`` is rounded to micro-nats once, so per-doc sums/means are
    engine-exact.

    Scale posture: the bigram table shuffles once on (prev, w) with
    map-side combine (bigram vocab << corpus); context totals derive from
    the bigram table (no second corpus pass); unigram counts reuse the
    vocab-sized aggregate.  All three count tables are vocab-sized —
    broadcast back — so the corpus itself shuffles zero times after the
    count aggregates.  Output: (id, n_bigrams, sum_nll_micro,
    mean_nll_micro) over docs with >= 2 tokens.
    """
    lam = lam_ppm / 1_000_000.0
    oml = (1_000_000 - lam_ppm) / 1_000_000.0
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("t")).where(
        F.size("t") >= 2
    )
    pairs = base.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
                " (a, b) -> struct(a AS prev, b AS w))"
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.prev").alias("prev"), F.col("bg.w").alias("w"))
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("w"))
    cu = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    total = cu.agg(F.sum("cu").alias("n_total"))
    cb = pairs.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("cb"))
    cp = cb.groupBy("prev").agg(F.sum("cb").alias("cp"))
    p = F.lit(lam) * (F.col("cb") / F.col("cp").cast("double")) + F.lit(oml) * (
        F.col("cu") / F.col("n_total").cast("double")
    )
    scored = (
        pairs.join(cb, ["prev", "w"])
        .join(F.broadcast(cp), "prev")
        .join(F.broadcast(cu), "w")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.round(-F.log(p) * 1_000_000).cast("long").alias("nll_micro"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("nll_micro").alias("sum_nll_micro"),
        F.expr("CAST(sum(nll_micro) div count(1) AS BIGINT)").alias(
            "mean_nll_micro"
        ),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Lucene variant:
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)), tf normalized by doc length /
    corpus mean length).  Per-term contributions are rounded to BIGINT
    micro-units before summing, so ranking is engine-exact.

    Scale posture: tf for the query terms only (map-side filter before the
    (doc, term) aggregate), df + corpus stats are two tiny broadcast
    aggregates; no shuffle touches non-matching tokens.  Output:
    (id, score_micro) for docs matching >= 1 term.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t"))
    lens = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).cast("double").alias("dl")
    )
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    hits = toks.where(F.col("t").isin(query_terms))
    tf = hits.groupBy(id_col, "t").agg(F.count(F.lit(1)).cast("double").alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfnorm = F.col("tf") / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "t")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.round(idf * tfnorm * 1_000_000).cast("long").alias("c_micro"),
        )
    )
    return contrib.groupBy(id_col).agg(F.sum("c_micro").alias("score_micro"))
