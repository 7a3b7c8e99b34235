"""Distributed byte-pair-encoding: vocabulary training + corpus encoding.

The classic map-reduce BPE formulation (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public paper):

* **Train** operates on the *word-frequency table*, never the corpus: one
  corpus-wide shuffle reduces 100 TB of text to ~10^7 (word, count) rows,
  and every merge iteration is a pair-count aggregation over that small
  table plus a single-row argmax collect.  This is how production BPE
  trainers scale — the corpus is touched exactly once.
* **Encode** uses the same distinct-word factoring as the resolver ladder
  (resolve.py): tokenize each *distinct* word once with the learned merge
  chain (k chained native `regexp_replace` calls, whole-stage codegen, no
  Python), then join token counts back to word occurrences.  The join is
  broadcast by default (vocabularies fit in an executor) with an escape
  hatch for pathological vocabularies.

Merge-application semantics are pinned to the reference algorithm's
one-pass left-to-right scan (merge, then continue scanning *after* the
merged token).  The Spark expression uses a lookaround regex over a
space-separated symbol string — ``(?<= )X Y(?= )`` — whose
resume-after-match behaviour reproduces the scan exactly, including runs
of repeated symbols ('a a a a a' -> 'aa aa a', not 'aa a aa').  A
randomized differential test against a pure-Python scanner pins this
(tests/test_bpe.py).

Words are symbolized as characters with the standard ``</w>`` end-of-word
marker on the final character, so learned subwords distinguish prefixes
from suffixes.  Symbols never contain spaces (words come from whitespace
tokenization), which makes the spaced-string representation lossless.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def _regex_quote(s: str) -> str:
    """Literal-quote a symbol for a Java regex (\\Q...\\E, embedded \\E safe)."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _replacement_quote(s: str) -> str:
    """Escape a replacement string for Java Matcher.replaceAll ($, \\)."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace-lowercase tokenization — THE one
    corpus-wide shuffle of BPE training."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
                "word"
            )
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def spaced_symbols(word: Column) -> Column:
    """word -> ' c1 c2 ... ck</w> ' (space-separated symbols, sentinel
    spaces at both ends, end-of-word marker fused to the last char)."""
    s = F.concat(F.lit(" "), F.regexp_replace(word, "(.)", "$1 "))
    return F.concat(F.regexp_replace(s, " $", ""), F.lit(END_OF_WORD + " "))


def merge_expr(s: Column, left: str, right: str) -> Column:
    """Apply ONE merge rule to a spaced symbol string.

    Lookarounds keep the boundary spaces unconsumed, so back-to-back
    occurrences sharing a boundary all merge in one pass — Java's
    resume-after-match scan is then exactly the reference BPE word scan.
    """
    pat = "(?<= )" + _regex_quote(left) + " " + _regex_quote(right) + "(?= )"
    return F.regexp_replace(s, F.lit(pat), F.lit(_replacement_quote(left + right)))


def _top_pair(symbolized: DataFrame):
    """Single most frequent adjacent symbol pair (freq desc, then lexical
    (l, r) asc for cross-engine determinism); None when no pairs remain."""
    toks = F.split(F.trim(F.col("s")), " ")
    rows = (
        symbolized.select(
            F.explode(
                F.arrays_zip(
                    F.slice(toks, 1, F.size(toks) - 1).alias("l"),
                    F.slice(toks, 2, F.size(toks) - 1).alias("r"),
                )
            ).alias("p"),
            "cnt",
        )
        .select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "cnt")
        .groupBy("l", "r")
        .agg(F.sum("cnt").alias("freq"))
        .orderBy(F.desc("freq"), "l", "r")
        .limit(1)
        .collect()
    )
    return rows[0] if rows else None


def bpe_train(
    words: DataFrame,
    num_merges: int,
    min_freq: int = 1,
    checkpoint_path: str | None = None,
) -> list[tuple[str, str, int]]:
    """Learn up to `num_merges` merge rules from a (word, cnt) table.

    Each iteration is one aggregation job over the word table (pair
    explode -> sum -> argmax of a single row) followed by one native-regex
    rewrite pass; the table is localCheckpoint'ed per iteration so job i
    never replays merges 1..i-1.  Iterative argmax-collect loops are the
    standard shape for this algorithm (cf. the connected-components loop
    in canonicalize.py) — the collect is one row per iteration.

    With `checkpoint_path`, the learned merge list is journaled to disk
    after every iteration (atomic rename), and a restarted run resumes
    from the journal: already-learned merges replay as pure regex rewrite
    passes (no pair-count jobs), so a killed k-merge run redoes at most
    one iteration's aggregation — the same per-stage lineage contract as
    plans/checkpoint.py.
    """
    import json
    import os

    merges: list[tuple[str, str, int]] = []
    exhausted = False
    done_file = (
        os.path.join(checkpoint_path, "merges.json") if checkpoint_path else None
    )
    if done_file and os.path.exists(done_file):
        with open(done_file) as f:
            state = json.load(f)
        merges = [tuple(m) for m in state["merges"]][:num_merges]
        # greedy prefix property: k merges are exactly the first k of any
        # longer run, so a journal with >= num_merges rules answers
        # directly; "exhausted" means the pair supply ran dry, so no
        # larger target can learn more either
        if state.get("exhausted") or len(merges) >= num_merges:
            return merges

    def _journal() -> None:
        if not done_file:
            return
        os.makedirs(checkpoint_path, exist_ok=True)
        tmp = done_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"merges": merges, "exhausted": exhausted}, f)
        os.replace(tmp, done_file)

    cur = words.select(
        apply_merges(spaced_symbols(F.col("word")), merges).alias("s"), "cnt"
    ).localCheckpoint(eager=True)
    while len(merges) < num_merges:
        top = _top_pair(cur)
        if top is None or top["freq"] < min_freq:
            exhausted = True
            break
        left, right, freq = top["l"], top["r"], int(top["freq"])
        merges.append((left, right, freq))
        _journal()
        cur = cur.select(
            merge_expr(F.col("s"), left, right).alias("s"), "cnt"
        ).localCheckpoint(eager=True)
    _journal()
    return merges


def apply_merges(s: Column, merges: list[tuple[str, str, int]]) -> Column:
    """Chain all learned merges over a spaced symbol string — k native
    regexp_replace calls in one projection (single codegen stage)."""
    for left, right, *_ in merges:
        s = merge_expr(s, left, right)
    return s


def bpe_tokens(word: Column, merges: list[tuple[str, str, int]]) -> Column:
    """word -> array<string> of BPE tokens under the learned merges."""
    return F.split(F.trim(apply_merges(spaced_symbols(word), merges)), " ")


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document BPE token counts via distinct-word factoring: the merge
    chain runs once per *distinct* word, never per occurrence, then a
    (broadcast by default) join fans counts back out to occurrences."""
    words = docs.select(
        id_col,
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word"),
    ).where(F.col("word") != "")
    vocab = (
        words.select("word")
        .distinct()
        .select("word", F.size(bpe_tokens(F.col("word"), merges)).alias("n_toks"))
    )
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    return (
        words.join(vocab, "word")
        .groupBy(id_col)
        .agg(F.sum("n_toks").cast("long").alias("n_bpe_tokens"))
    )


def bpe_fertility(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    group_col: str = "lang",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Tokenizer fertility audit: BPE tokens per word, per corpus slice
    (language, domain, source) — the multilingual-fairness metric.  A
    merge table trained on a skewed mix under-serves minority slices,
    which then pay more tokens per word (higher training/inference cost
    per unit text and a shorter effective context); this measures it.

    Same distinct-word factoring as bpe_token_counts: the merge chain
    runs once per DISTINCT word; the per-slice rollup is one hash
    aggregate.  fertility_milli = tokens * 1000 div words (BIGINT).
    """
    words = docs.select(
        group_col,
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "word"
        ),
    ).where(F.col("word") != "")
    vocab = (
        words.select("word")
        .distinct()
        .select("word", F.size(bpe_tokens(F.col("word"), merges)).alias("n_toks"))
    )
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    return (
        words.join(vocab, "word")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_toks").cast("long").alias("n_bpe_tokens"),
        )
        .withColumn(
            "fertility_milli",
            F.expr("n_bpe_tokens * 1000 div n_words").cast("long"),
        )
    )
