"""Reshaping: keep only listed property paths; JSONPath-ish value collection.

Reference: ``forge.reshape(data, keep, versioned)`` retains only the listed
dotted paths of each resource (kgforge/core/forge.py:605-622,
core/reshaping.py:35-78); ``collect_values`` walks ``a.b.c`` through nested
objects AND arrays collecting leaf values, with an optional single equality
constraint (core/reshaping.py:82-134).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def reshape(df: DataFrame, keep: list[str], versioned: bool = False,
            rev_col: str = "_rev") -> DataFrame:
    """Keep only the listed dotted paths, preserving nesting.

    versioned=True rewrites kept ``id`` leaves to the versioned form
    ``id?_version=<rev>`` (versioned_id_template, tests/conftest.py:462) —
    requires a ``_rev`` column.
    """
    tree: dict = {}
    for path in keep:
        node = tree
        parts = path.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(parts[-1], None)

    def build(node: dict, prefix: str) -> list[Column]:
        cols = []
        for k, sub in node.items():
            full = f"{prefix}{k}"
            if sub is None:
                col = F.col(".".join(f"`{p}`" for p in full.split(".")))
                if versioned and k == "id":
                    col = F.concat(col, F.lit("?_version="), F.col(rev_col).cast("string"))
                cols.append(col.alias(k))
            else:
                cols.append(F.struct(*build(sub, f"{full}.")).alias(k))
        return cols

    return df.select(*build(tree, ""))


def collect_values(
    df: DataFrame,
    follow: str,
    constraint: tuple[str, object] | None = None,
    keep: list[str] | None = None,
) -> DataFrame:
    """All values reachable along the dotted ``follow`` path (descending into
    arrays), one output row per input row: (*keep, values: array<leaf>).

    constraint=(path, value) keeps only rows where that (scalar) path equals
    the value — the single-equality constraint of collect_values_jp
    (reshaping.py:82-134).  keep retains key columns alongside the collected
    values (at scale you always carry the key through).
    """
    out = df
    if constraint is not None:
        cpath, cval = constraint
        out = out.where(F.col(cpath) == cval)

    col: Column = None
    dtype: T.DataType = out.schema
    depth = 0  # array nesting depth of `col`
    for seg in follow.split("."):
        if isinstance(dtype, T.ArrayType):
            dtype = dtype.elementType
        if not isinstance(dtype, T.StructType) or seg not in dtype.fieldNames():
            raise AttributeError(f"path segment {seg!r} not found")
        fdt = dtype[seg].dataType
        if col is None:
            col = F.col(f"`{seg}`")
        elif depth == 0:
            col = col.getField(seg)
        else:
            # map over the current array level(s); flatten to keep depth <= 1
            col = F.transform(col, lambda x: x.getField(seg))
        if depth > 0 and isinstance(fdt, T.ArrayType):
            col = F.flatten(col)
        if isinstance(fdt, T.ArrayType):
            depth = 1
            dtype = fdt
        else:
            dtype = fdt
    if depth == 0:
        col = F.array(col)
    return out.select(*(keep or []), F.array_compact(col).alias("values"))
