"""Conversions: Resource-struct <-> triples / flat DataFrame / JSON-LD keys.

Reference: kgforge/core/conversions/ — ``as_graph`` explodes a Resource into
rdflib triples via expanded JSON-LD (rdf.py:275-312), ``as_dataframe``
flattens to dot-named columns (dataframe.py:25-48), ``from_dataframe``
deflattens (dataframe.py:51-108), JSON-LD context maps terms to IRIs
(commons/context.py:22-71).

Spark-first re-expression:
* struct_to_triples — ONE generated array column per row holding all the
  row's triples, then a single explode.  Nested structs become skolem
  subjects (md5 of parent subject + path: deterministic, unlike rdflib
  bnode ids — SURVEY.md §4.6); arrays emit one triple per element.
* triples_to_resources — groupBy(subj) + collect_list reassembly (the
  CONSTRUCT-result path, sparql_query_builder.py:204-238).
* expand/compact — broadcast-free driver-side context application (contexts
  are small dicts; column names are plan metadata, not data).
* flatten/deflatten — dotted column select / struct regrouping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

XSD = {
    T.StringType: "xsd:string",
    T.BooleanType: "xsd:boolean",
    T.IntegerType: "xsd:integer",
    T.LongType: "xsd:integer",
    T.ShortType: "xsd:integer",
    T.DoubleType: "xsd:double",
    T.FloatType: "xsd:float",
    T.DateType: "xsd:date",
    T.TimestampType: "xsd:dateTime",
}

TRIPLE_STRUCT = "struct<subj:string,pred:string,obj:string,obj_is_literal:boolean,obj_datatype:string>"


def _xsd_of(dtype: T.DataType) -> str | None:
    return XSD.get(type(dtype))


def expand_term(term: str, context: dict | None) -> str:
    """JSON-LD-ish term expansion: context term -> IRI; 'prefix:local' ->
    IRI via prefix entry; else unchanged (commons/context.py:22-71)."""
    if not context:
        return term
    v = context.get(term)
    if isinstance(v, dict):
        v = v.get("@id")
    if isinstance(v, str):
        return v
    if ":" in term:
        prefix, local = term.split(":", 1)
        base = context.get(prefix)
        if isinstance(base, str):
            return base + local
    return term


def _triple(subj: Column, pred: str, obj: Column, literal: bool, datatype: str | None) -> Column:
    return F.struct(
        subj.alias("subj"),
        F.lit(pred).alias("pred"),
        obj.cast("string").alias("obj"),
        F.lit(literal).alias("obj_is_literal"),
        F.lit(datatype).cast("string").alias("obj_datatype"),
    )


def _node_triples(
    subj: Column,
    node: Column,
    schema: T.StructType,
    context: dict | None,
    path: str,
    id_field: str,
    type_field: str,
) -> list[Column]:
    """All triples of one (possibly nested) struct node, as array columns to
    be concatenated.  Each returned Column is array<TRIPLE_STRUCT>."""
    parts: list[Column] = []
    empty = F.array().cast(f"array<{TRIPLE_STRUCT}>")

    def arr(one: Column, guard: Column) -> Column:
        return F.when(guard, F.array(one)).otherwise(empty)

    for field in schema.fields:
        name = field.name
        if name.startswith("_"):
            continue  # store metadata rides outside the graph (json.py:45-50)
        col = node.getField(name) if node is not None else F.col(f"`{name}`")
        if name == id_field:
            continue  # subject, not a property
        pred = expand_term(name, context)
        dtype = field.dataType
        if name == type_field:
            # rdf:type; object IRIs expand through the context (values of
            # @type:'@id' terms expand in as_jsonld — rdf.py:199-272)
            def expand_obj(e: Column) -> Column:
                if not context:
                    return e
                pairs = [
                    (k, v if isinstance(v, str) else v.get("@id"))
                    for k, v in context.items()
                    if isinstance(v, str) or (isinstance(v, dict) and v.get("@id"))
                ]
                if not pairs:
                    return e
                m = F.create_map(*[F.lit(x) for kv in pairs for x in kv])
                return F.coalesce(m[e], e)

            if isinstance(dtype, T.ArrayType):
                parts.append(
                    F.when(
                        col.isNotNull(),
                        F.transform(
                            col, lambda e: _triple(subj, "rdf:type", expand_obj(e), False, None)
                        ),
                    ).otherwise(empty)
                )
            else:
                parts.append(
                    arr(_triple(subj, "rdf:type", expand_obj(col), False, None), col.isNotNull())
                )
            continue
        if isinstance(dtype, T.StructType):
            child_subj = F.concat(F.lit("_:"), F.md5(F.concat(subj, F.lit(f"/{path}{name}"))))
            child_id = (
                col.getField(id_field)
                if id_field in dtype.fieldNames()
                else F.lit(None).cast("string")
            )
            eff_subj = F.coalesce(child_id, child_subj)
            parts.append(arr(_triple(subj, pred, eff_subj, False, None), col.isNotNull()))
            child_parts = _node_triples(
                eff_subj, col, dtype, context, f"{path}{name}.", id_field, type_field
            )
            for cp in child_parts:
                parts.append(F.when(col.isNotNull(), cp).otherwise(empty))
        elif isinstance(dtype, T.ArrayType):
            elem = dtype.elementType
            if isinstance(elem, T.StructType):
                def elem_triples(e: Column, i: Column) -> Column:
                    e_subj_skolem = F.concat(
                        F.lit("_:"),
                        F.md5(F.concat(subj, F.lit(f"/{path}{name}/"), i.cast("string"))),
                    )
                    e_id = (
                        e.getField(id_field)
                        if id_field in elem.fieldNames()
                        else F.lit(None).cast("string")
                    )
                    e_subj = F.coalesce(e_id, e_subj_skolem)
                    inner = _node_triples(
                        e_subj, e, elem, context, f"{path}{name}[]", id_field, type_field
                    )
                    combined = F.concat(
                        F.array(_triple(subj, pred, e_subj, False, None)), *inner
                    ) if inner else F.array(_triple(subj, pred, e_subj, False, None))
                    return combined

                parts.append(
                    F.when(
                        col.isNotNull(), F.flatten(F.transform(col, elem_triples))
                    ).otherwise(empty)
                )
            else:
                dt = _xsd_of(elem)
                parts.append(
                    F.when(
                        col.isNotNull(),
                        F.transform(col, lambda e: _triple(subj, pred, e, True, dt)),
                    ).otherwise(empty)
                )
        else:
            dt = _xsd_of(dtype)
            parts.append(arr(_triple(subj, pred, col, True, dt), col.isNotNull()))
    return parts


def struct_to_triples(
    df: DataFrame,
    id_col: str = "id",
    type_col: str = "type",
    context: dict | None = None,
    dedup: bool = True,
) -> DataFrame:
    """Generic Resource-tree -> (subj, pred, obj, obj_is_literal, obj_datatype).

    The whole row's triples are built as one array column and exploded once —
    map-side until the final dedup shuffle (graph set semantics, required for
    parity with rdflib.Graph — SURVEY.md §2.6)."""
    subj = F.col(id_col).cast("string")
    parts = _node_triples(subj, None, df.schema, context, "", id_col, type_col)
    all_triples = F.concat(*parts) if parts else F.array()
    out = df.select(F.explode(all_triples).alias("t")).select(
        F.col("t.subj").alias("subj"),
        F.col("t.pred").alias("pred"),
        F.col("t.obj").alias("obj"),
        F.col("t.obj_is_literal").alias("obj_is_literal"),
        F.col("t.obj_datatype").alias("obj_datatype"),
    )
    return out.dropDuplicates(["subj", "pred", "obj"]) if dedup else out


def triples_to_resources(triples: DataFrame) -> DataFrame:
    """Group-by-subject reassembly (CONSTRUCT-result -> resources,
    sparql_query_builder.py:204-238): one row per subject with its rdf:type
    values and a pred->values map."""
    props = (
        triples.groupBy("subj", "pred")
        .agg(F.sort_array(F.collect_list("obj")).alias("objs"))
        .groupBy("subj")
        .agg(F.map_from_entries(F.sort_array(F.collect_list(F.struct("pred", "objs")))).alias("properties"))
    )
    return props.select(
        "subj",
        F.coalesce(F.col("properties")["rdf:type"], F.array().cast("array<string>")).alias("types"),
        "properties",
    )


# ------------------------------------------------------------- flat <-> tree

def flatten(df: DataFrame, sep: str = ".") -> DataFrame:
    """as_dataframe: nested structs -> dot-named scalar columns, depth-first
    field order (conversions/dataframe.py:25-48)."""
    cols: list[Column] = []

    def walk(prefix: str, col: Column, dtype: T.DataType) -> None:
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                walk(f"{prefix}{sep}{f.name}", col.getField(f.name), f.dataType)
        else:
            cols.append(col.alias(prefix))

    for f in df.schema.fields:
        walk(f.name, F.col(f"`{f.name}`"), f.dataType)
    return df.select(*cols)


def deflatten(df: DataFrame, sep: str = ".") -> DataFrame:
    """from_dataframe: dotted columns -> nested structs
    (conversions/dataframe.py:51-108).  Mixed nesting (a scalar column named
    'x' next to 'x.y') is an error, as in the reference."""
    tree: dict = {}
    for name in df.columns:
        parts = name.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"mixed nesting at {name!r}")
        if parts[-1] in node and isinstance(node[parts[-1]], dict):
            raise ValueError(f"mixed nesting at {name!r}")
        node[parts[-1]] = name

    def build(node, prefix: str = "") -> list[Column]:
        out = []
        for k, v in node.items():
            if isinstance(v, dict):
                out.append(F.struct(*build(v)).alias(k))
            else:
                out.append(F.col(f"`{v}`").alias(k))
        return out

    return df.select(*build(tree))


def apply_ld_keys(df: DataFrame, direction: str = "add") -> DataFrame:
    """Compacted JSON-LD key rewriting: id/type <-> @id/@type at the top
    level (rdf.py:61-89 _add_ld_keys / :489-527 _remove_ld_keys)."""
    mapping = {"id": "@id", "type": "@type"} if direction == "add" else {"@id": "id", "@type": "type"}
    return df.select(
        *[F.col(f"`{c}`").alias(mapping.get(c, c)) for c in df.columns]
    )
