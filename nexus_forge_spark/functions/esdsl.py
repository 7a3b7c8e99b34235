"""Elasticsearch query-DSL compiler: bool-query JSON -> Column predicate.

Reference: ``forge.elastic`` (kgforge/core/forge.py:696,
read_only_store.py:140-183) ships a user-written ES DSL JSON to the store's
Elasticsearch endpoint; the reference's own builders emit bool queries of
term/terms/range/match/exists/wildcard clauses (es_query_builder.py:38-259).
Here the SAME JSON compiles to a Spark Column predicate over the index
DataFrame — Catalyst pushes the term/range clauses into the parquet scan,
``_source`` includes/excludes become column pruning, ``sort``/``from``/
``size`` become orderBy/offset/limit.

Supported clauses: bool (must / filter / should / must_not,
minimum_should_match), term, terms, range (gt/gte/lt/lte), match (all
lowercased tokens contained), match_phrase (substring, case-insensitive),
match_all, exists, prefix, wildcard (* and ?), ids.  BM25-style text
relevance is not re-implemented (filter-context semantics — the
reference's own ES usage is filter-shaped; ranked text retrieval is
operators/text.py bm25_scores), but ``script_score`` WITH the reference
dense-linker script (cosineSimilarity(params.v, 'field') + c,
es_query_builder.py:430-434) compiles to a ``_score`` Column and the ES
default score-descending order — closing SURVEY S4's last ES gap.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class EsQueryError(ValueError):
    pass


def _field(name: str) -> Column:
    # ES field paths use '.' for nesting, same as Spark struct access;
    # the ".keyword" suffix (exact-match sub-field) maps to the column itself
    if name.endswith(".keyword"):
        name = name[: -len(".keyword")]
    return F.col(".".join(f"`{p}`" for p in name.split(".")))


def _like_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")


def _one_entry(clause: dict, kind: str) -> tuple[str, object]:
    if len(clause) != 1:
        raise EsQueryError(f"{kind} clause must have exactly one field")
    return next(iter(clause.items()))


def compile_clause(clause: dict) -> Column:
    """One ES query clause -> boolean Column."""
    if not isinstance(clause, dict) or len(clause) != 1:
        raise EsQueryError(f"expected a single-key clause, got: {clause!r}")
    kind, body = next(iter(clause.items()))

    if kind == "match_all":
        return F.lit(True)
    if kind == "bool":
        return _compile_bool(body)
    if kind == "term":
        f, v = _one_entry(body, "term")
        if isinstance(v, dict):
            v = v.get("value")
        return _field(f) == F.lit(v)
    if kind == "terms":
        f, vs = _one_entry(body, "terms")
        if not isinstance(vs, list):
            raise EsQueryError("terms expects a list of values")
        return _field(f).isin(vs)
    if kind == "range":
        f, bounds = _one_entry(body, "range")
        col = _field(f)
        out = F.lit(True)
        for op, v in bounds.items():
            if op == "gt":
                out = out & (col > F.lit(v))
            elif op == "gte":
                out = out & (col >= F.lit(v))
            elif op == "lt":
                out = out & (col < F.lit(v))
            elif op == "lte":
                out = out & (col <= F.lit(v))
            elif op in ("boost", "format"):
                continue
            else:
                raise EsQueryError(f"unsupported range operator {op!r}")
        return out
    if kind == "match":
        f, text = _one_entry(body, "match")
        if isinstance(text, dict):
            text = text.get("query")
        toks = [t for t in str(text).lower().split() if t]
        out = F.lit(True)
        low = F.lower(_field(f))
        for t in toks:
            out = out & low.contains(t)
        return out
    if kind == "match_phrase":
        f, text = _one_entry(body, "match_phrase")
        if isinstance(text, dict):
            text = text.get("query")
        return F.lower(_field(f)).contains(str(text).lower())
    if kind == "exists":
        f = body.get("field")
        if not f:
            raise EsQueryError("exists requires 'field'")
        return _field(f).isNotNull()
    if kind == "prefix":
        f, v = _one_entry(body, "prefix")
        if isinstance(v, dict):
            v = v.get("value")
        return _field(f).startswith(str(v))
    if kind == "wildcard":
        f, v = _one_entry(body, "wildcard")
        if isinstance(v, dict):
            v = v.get("value")
        pat = re.sub(r"[*?]", lambda m: "%" if m.group() == "*" else "_",
                     _like_escape(str(v)))
        return _field(f).like(pat)
    if kind == "ids":
        vs = body.get("values")
        if not isinstance(vs, list):
            raise EsQueryError("ids requires 'values'")
        return _field("id").isin(vs)
    raise EsQueryError(f"unsupported ES clause {kind!r}")


def _as_list(v) -> list:
    return v if isinstance(v, list) else [v]


def _compile_bool(body: dict) -> Column:
    out = F.lit(True)
    for c in _as_list(body.get("must", [])):
        out = out & compile_clause(c)
    for c in _as_list(body.get("filter", [])):
        out = out & compile_clause(c)
    for c in _as_list(body.get("must_not", [])):
        # ES must_not is true when the clause does NOT match — rows where
        # the inner predicate is NULL (missing field) count as non-matching
        inner = compile_clause(c)
        out = out & ~F.coalesce(inner, F.lit(False))
    should = _as_list(body.get("should", []))
    if should:
        msm = int(body.get("minimum_should_match", 1))
        hits = sum(
            (F.when(F.coalesce(compile_clause(c), F.lit(False)), 1).otherwise(0)
             for c in should),
            F.lit(0),
        )
        # in filter context should is optional when must/filter present,
        # UNLESS minimum_should_match is explicit
        if "must" in body or "filter" in body:
            if "minimum_should_match" in body:
                out = out & (hits >= msm)
        else:
            out = out & (hits >= msm)
    return out


_COSINE_RE = re.compile(
    r"cosineSimilarity\(params\.(\w+),\s*'([\w.]+)'\)(?:\s*\+\s*([0-9.]+))?"
)


def _script_score_column(body: dict) -> tuple[Column, Column]:
    """(filter predicate, _score column) for a script_score query.

    Supports the reference's own relevance script
    (kgforge/specializations/stores/nexus/es_query_builder.py:430-434):
    ``cosineSimilarity(params.<name>, '<field>') + <const>`` — the dense
    ES linker.  The query vector is a literal (it arrives in params), so
    the score compiles to pure Column arithmetic: one zip_with dot
    product + the doc-side norm, no UDF, map-side only.  Anything else
    raises EsQueryError naming the limitation.
    """
    inner = body.get("query", {"match_all": {}})
    script = body.get("script", {})
    m = _COSINE_RE.fullmatch(str(script.get("source", "")).strip())
    if not m:
        raise EsQueryError(
            "script_score supports only "
            "cosineSimilarity(params.<v>, '<field>') [+ const] "
            f"(the reference ES linker's script); got: {script.get('source')!r}"
        )
    pname, field, add = m.groups()
    qvec = (script.get("params") or {}).get(pname)
    if not isinstance(qvec, (list, tuple)) or not qvec:
        raise EsQueryError(f"script_score params.{pname} must be a number list")
    qlits = F.array(*[F.lit(float(x)) for x in qvec])
    qnorm = sum(float(x) * float(x) for x in qvec) ** 0.5
    v = _field(field)
    dv = F.transform(v, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(dv, qlits, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(dv, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    score = dot / (norm * F.lit(qnorm)) + F.lit(float(add) if add else 0.0)
    return compile_clause(inner), score


def es_search(df: DataFrame, query: dict) -> DataFrame:
    """Full ES search-body semantics over a DataFrame 'index':
    query -> filter, sort -> orderBy, from/size -> offset/limit,
    _source -> column projection; script_score (cosine relevance, the
    reference's dense-linker form) -> a ``_score`` column with the ES
    default score-descending order."""
    q = query.get("query", {"match_all": {}})
    scored = False
    if isinstance(q, dict) and set(q) == {"script_score"}:
        pred, score = _script_score_column(q["script_score"])
        out = df.where(pred).withColumn("_score", score)
        scored = True
    else:
        out = df.where(compile_clause(q))

    sort = query.get("sort")
    if scored and not sort:
        sort = [{"_score": {"order": "desc"}}]
    if sort:
        cols = []
        for s in _as_list(sort):
            if isinstance(s, str):
                cols.append(_field(s).asc())
            else:
                f, spec = _one_entry(s, "sort")
                order = spec.get("order", "asc") if isinstance(spec, dict) else spec
                cols.append(_field(f).desc() if order == "desc" else _field(f).asc())
        out = out.orderBy(*cols)

    offset = int(query.get("from", 0) or 0)
    size = query.get("size")
    if offset or size is not None:
        if not sort:
            raise EsQueryError(
                "from/size pagination requires an explicit sort "
                "(deterministic distributed pagination)"
            )
        out = out.offset(offset)
        if size is not None:
            out = out.limit(int(size))

    src = query.get("_source")
    if src:
        if isinstance(src, list):
            out = out.select(*[_field(c).alias(c) for c in src])
        elif isinstance(src, dict):
            inc = src.get("includes")
            exc = set(src.get("excludes", []))
            if inc:
                out = out.select(*[_field(c).alias(c) for c in inc])
            elif exc:
                out = out.select(*[c for c in out.columns if c not in exc])
    return out
