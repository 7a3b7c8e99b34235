"""Search Filter DSL: typed path comparisons compiled to Column predicates.

Reference: ``forge.paths(type)`` returns an attribute-path builder whose
comparisons produce ``Filter(path, operator, value)`` records
(kgforge/core/wrappings/paths.py:21-121); ``forge.search(*filters)`` compiles
them into SPARQL/ES queries (sparql_query_builder.py:94-186,
es_query_builder.py:38-181).  Here the whole chain collapses to
``df.filter(...)`` — Catalyst pushes the predicates into the parquet scan
(the store-side execution the reference delegated to SPARQL/ES endpoints).

Operator map (paths.py:21-105): __eq__/__ne__/__lt__/__le__/__gt__/__ge__;
dict sugar {"a.b": v} -> equality filters (forge.py:658-672).
Typed-literal coercion (dates/numbers/bools — sparql_query_builder.py:94-123)
falls out of Spark's cast rules on the comparison.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Filter:
    path: tuple[str, ...]
    operator: str  # __eq__ __ne__ __lt__ __le__ __gt__ __ge__
    value: object

    def to_column(self) -> Column:
        col = F.col(".".join(f"`{p}`" for p in self.path))
        v = self.value
        ops = {
            "__eq__": lambda c: c == v,
            "__ne__": lambda c: c != v,
            "__lt__": lambda c: c < v,
            "__le__": lambda c: c <= v,
            "__gt__": lambda c: c > v,
            "__ge__": lambda c: c >= v,
        }
        if self.operator not in ops:
            raise ValueError(f"unsupported operator {self.operator}")
        return ops[self.operator](col)


class PathWrapper:
    """Attribute-path builder: ``paths().geo.latitude > 40`` -> Filter."""

    def __init__(self, path: tuple[str, ...] = ()):  # noqa: D107
        object.__setattr__(self, "_path", path)

    def __getattr__(self, name: str) -> "PathWrapper":
        if name.startswith("_"):
            raise AttributeError(name)
        return PathWrapper((*self._path, name))

    def _filter(self, op: str, other) -> Filter:
        return Filter(self._path, op, other)

    def __eq__(self, other):  # type: ignore[override]
        return self._filter("__eq__", other)

    def __ne__(self, other):  # type: ignore[override]
        return self._filter("__ne__", other)

    def __lt__(self, other):
        return self._filter("__lt__", other)

    def __le__(self, other):
        return self._filter("__le__", other)

    def __gt__(self, other):
        return self._filter("__gt__", other)

    def __ge__(self, other):
        return self._filter("__ge__", other)

    __hash__ = None  # type: ignore[assignment]


def paths() -> PathWrapper:
    return PathWrapper()


def dict_to_filters(d: dict, prefix: tuple[str, ...] = ()) -> list[Filter]:
    """Dict sugar -> equality Filters, nested dicts -> dotted paths
    (wrappings/paths.py:108-121 create_filters_from_dict)."""
    out: list[Filter] = []
    for k, v in d.items():
        if isinstance(v, dict):
            out.extend(dict_to_filters(v, (*prefix, k)))
        else:
            out.append(Filter((*prefix, k), "__eq__", v))
    return out


def apply_filters(df: DataFrame, *filters, limit: int | None = None, offset: int = 0,
                  distinct: bool = False) -> DataFrame:
    """forge.search semantics: filters (Filter objects or one dict), default
    limit 100 / offset 0 (read_only_store.py:33-34), optional DISTINCT
    (sparql_query_builder.py:415)."""
    flt: list[Filter] = []
    for f in filters:
        if isinstance(f, dict):
            flt.extend(dict_to_filters(f))
        elif isinstance(f, Filter):
            flt.append(f)
        else:
            raise TypeError(f"not a Filter: {f!r}")
    out = df
    for f in flt:
        out = out.where(f.to_column())
    if distinct:
        out = out.distinct()
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def search_snippets(
    df: DataFrame,
    terms: list[str],
    radius: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hit-highlighting snippets for search results: for each document
    containing any query term (case-insensitive), the context window of
    ``radius`` chars around the EARLIEST match (ties break on the term
    string) — the result-page presentation step after bm25/phrase
    retrieval.  One map-side explode over the (small) term list + one
    doc-keyed argmin; substring math is integer and engine-identical.

    Output: (id, term, pos, snippet) with 1-based pos into the text.
    """
    hits = (
        df.select(
            F.col(id_col),
            F.col(text_col).alias("__t"),
            F.explode(F.array(*[F.lit(t.lower()) for t in terms])).alias(
                "term"
            ),
        )
        .select(
            id_col,
            "__t",
            "term",
            F.expr("locate(term, lower(__t))").alias("pos"),
        )
        .where(F.col("pos") > 0)
    )
    best = hits.groupBy(id_col).agg(
        F.min(F.struct("pos", "term", "__t")).alias("__b")
    )
    return best.select(
        id_col,
        F.col("__b.term").alias("term"),
        F.col("__b.pos").cast("long").alias("pos"),
        F.expr(
            f"substring(__b.__t, greatest(__b.pos - {int(radius)}, 1), "
            f"{2 * int(radius)} + length(__b.term))"
        ).alias("snippet"),
    )
