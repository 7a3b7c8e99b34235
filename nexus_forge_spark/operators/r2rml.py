"""R2RML-style declarative relational-to-RDF mapping compiler.

The reference maps JSON records to resources with DictionaryMapper rules
(kgforge/specializations/mappers/dictionaries.py:31-62, rules evaluated
per record).  The relational twin of that contract is W3C R2RML (public
spec): a TriplesMap names a logical table, a subject template, and
predicate-object maps (column / template / constant / parent-join).
This compiler turns a dict of TriplesMaps into ONE DataFrame plan —
no per-row evaluation anywhere, every map is a column expression and
every rr:parentTriplesMap reference is an equi-join.

TriplesMap shape (dict, one per map name)::

    {"table": "customer",
     "subject": "cust:{c_custkey}",
     "types": ["ex:Customer"],                      # rdf:type constants
     "pom": [
        {"pred": "ex:name", "column": "c_name"},
        {"pred": "ex:seg", "template": "seg:{c_mktsegment}"},
        {"pred": "ex:kind", "constant": "ex:Thing"},
        {"pred": "ex:nation", "parent": "nations",
         "join": [["c_nationkey", "n_nationkey"]]},
     ]}

Scale shape: each predicate-object map compiles to a column-pruned
select over the logical table (Catalyst prunes the scan to exactly the
referenced columns — ReadSchema shows only them), the per-map selects
union into one plan, and parent joins are plain equi-joins AQE sizes at
runtime (dimension parents broadcast themselves).  Template columns are
cast to string; restrict templates to integer/string columns — float
formatting is engine-specific and would break the engine-exact contract
(the oracle generator enforces nothing; the caller owns that choice, as
with every oracle in this repo).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RDF_TYPE = "rdf:type"
_TPL = re.compile(r"\{([^{}]+)\}")


class MappingError(ValueError):
    """Malformed TriplesMap."""


def _template_col(template: str):
    parts: list = []
    pos = 0
    for m in _TPL.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        parts.append(F.col(m.group(1)).cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        raise MappingError(f"empty template: {template!r}")
    return F.concat(*parts)


def _template_cols(template: str) -> list[str]:
    return _TPL.findall(template)


def compile_triples_maps(
    spark: SparkSession,
    maps: dict[str, dict],
    load_fn,
) -> DataFrame:
    """maps: {name: TriplesMap}; load_fn(table_name) -> DataFrame.
    Returns the union plan producing (subj, pred, obj)."""
    outs: list[DataFrame] = []
    for name, tm in maps.items():
        df = load_fn(tm["table"])
        subj = _template_col(tm["subject"]).alias("subj")
        for cls in tm.get("types", []):
            outs.append(
                df.select(subj, F.lit(RDF_TYPE).alias("pred"), F.lit(cls).alias("obj"))
            )
        for pom in tm.get("pom", []):
            pred = F.lit(pom["pred"]).alias("pred")
            if "column" in pom:
                obj = F.col(pom["column"]).cast("string")
            elif "template" in pom:
                obj = _template_col(pom["template"])
            elif "constant" in pom:
                obj = F.lit(pom["constant"])
            elif "parent" in pom:
                parent = maps.get(pom["parent"])
                if parent is None:
                    raise MappingError(
                        f"{name}: parent map {pom['parent']!r} not defined"
                    )
                pdf = load_fn(parent["table"])
                pcols = set(_template_cols(parent["subject"]))
                pcols.update(p for _, p in pom["join"])
                pdf = pdf.select(*sorted(pcols))
                cond = None
                for child_col, parent_col in pom["join"]:
                    c = df[child_col] == pdf[parent_col]
                    cond = c if cond is None else (cond & c)
                joined = df.join(pdf, cond)
                outs.append(
                    joined.select(
                        subj,
                        pred,
                        _template_col(parent["subject"]).alias("obj"),
                    )
                )
                continue
            else:
                raise MappingError(
                    f"{name}: predicate-object map needs column/template/"
                    f"constant/parent, got {sorted(pom)}"
                )
            outs.append(df.select(subj, pred, obj.alias("obj")))
    if not outs:
        raise MappingError("no TriplesMaps produced any output")
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def _sql_template(template: str, prefix: str = "") -> str:
    parts: list[str] = []
    pos = 0
    for m in _TPL.finditer(template):
        if m.start() > pos:
            parts.append("'" + template[pos : m.start()].replace("'", "''") + "'")
        parts.append(f"CAST({prefix}{m.group(1)} AS VARCHAR)")
        pos = m.end()
    if pos < len(template):
        parts.append("'" + template[pos:].replace("'", "''") + "'")
    return " || ".join(parts)


def sql_compile_triples_maps(maps: dict[str, dict]) -> str:
    """DuckDB oracle: the same TriplesMaps rendered as a UNION ALL of
    selects (logical table names are used verbatim as relation names)."""
    selects: list[str] = []
    for name, tm in maps.items():
        table = tm["table"]
        subj = _sql_template(tm["subject"], "c.")
        for cls in tm.get("types", []):
            selects.append(
                f"SELECT {subj} AS subj, '{RDF_TYPE}' AS pred, '{cls}' AS obj "
                f"FROM {table} c"
            )
        for pom in tm.get("pom", []):
            pred = f"'{pom['pred']}'"
            if "column" in pom:
                obj = f"CAST(c.{pom['column']} AS VARCHAR)"
                selects.append(
                    f"SELECT {subj} AS subj, {pred} AS pred, {obj} AS obj "
                    f"FROM {table} c"
                )
            elif "template" in pom:
                obj = _sql_template(pom["template"], "c.")
                selects.append(
                    f"SELECT {subj} AS subj, {pred} AS pred, {obj} AS obj "
                    f"FROM {table} c"
                )
            elif "constant" in pom:
                selects.append(
                    f"SELECT {subj} AS subj, {pred} AS pred, '{pom['constant']}' "
                    f"AS obj FROM {table} c"
                )
            elif "parent" in pom:
                parent = maps[pom["parent"]]
                pobj = _sql_template(parent["subject"], "p.")
                on = " AND ".join(
                    f"c.{cc} = p.{pc}" for cc, pc in pom["join"]
                )
                selects.append(
                    f"SELECT {subj} AS subj, {pred} AS pred, {pobj} AS obj "
                    f"FROM {table} c JOIN {parent['table']} p ON {on}"
                )
            else:
                raise MappingError(f"{name}: bad pom {sorted(pom)}")
    return "\nUNION ALL\n".join(selects)
