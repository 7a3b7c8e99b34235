"""SHACL-subset validation compiled to Column predicates.

Reference path: forge.validate -> RdfModel._validate -> pySHACL over a
per-resource rdflib graph (kgforge/specializations/models/rdf_model.py:
115-198, rdf/service.py:222-266), parallelised with multiprocessing.Pool(10)
(rdf_model.py:67,178-189).  Here the shapes are compiled ONCE on the driver
into per-type predicate columns and evaluated for all rows in one pass —
executor parallelism replaces the pool, no per-row Python.

Semantics preserved:
* per-row status, never throws: output columns (validated: bool,
  violations: array<string>) mirror _last_action/_validated stamping
  (core/commons/execution.py:148-191).
* zero-focus-node rule: if the row's type does not match the shape's
  targetClass the row is INVALID (conforms forced False when a shape has no
  focus nodes, rdf_model.py:133-161).
* inference='rdfs': type matches targetClass through the ontology's
  rdfs:subClassOf transitive closure (Patient ⊑ Person passes Person
  validation only with rdfs — tests/specializations/models/
  test_rdf_model.py:130-158).

Constraint collectors supported (rdf/collectors.py:81-426 registry):
minCount, maxCount, datatype, in, hasValue, class (with nested shape
recursion), nodeKind(IRI), minInclusive/maxInclusive, lessThan, or, xone,
and.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"


def _local(curie_or_iri: str) -> str:
    """'schema:familyName' / 'https://schema.org/Person' -> local name."""
    if curie_or_iri is None:
        return None
    s = str(curie_or_iri)
    for sep in ("#", "/", ":"):
        if sep in s:
            s = s.rsplit(sep, 1)[-1]
    return s


@dataclass
class PropertyShape:
    path: str
    min_count: int | None = None
    max_count: int | None = None
    datatype: str | None = None
    has_value: object | None = None
    in_values: list | None = None
    class_: str | None = None
    node_kind: str | None = None
    min_inclusive: float | None = None
    max_inclusive: float | None = None
    less_than: str | None = None
    or_: list["PropertyShape"] | None = None
    xone: list["PropertyShape"] | None = None
    and_: list["PropertyShape"] | None = None
    node: str | None = None  # sh:node shape reference (local name)
    node_shape: "NodeShape | None" = None  # resolved after load


@dataclass
class NodeShape:
    shape_id: str
    target_class: str | None
    properties: list[PropertyShape] = field(default_factory=list)
    node_kind: str | None = None
    # node-level sh:or / sh:xone over path-bearing property alternatives
    # (EmployeeShape's `or: [contractor, department]`, shapes-4.json:115-135):
    # validation = at least/exactly one group satisfied; template = all paths.
    alt_groups: list[tuple[str, list[PropertyShape]]] = field(default_factory=list)


def _parse_property(p: dict) -> PropertyShape:
    ps = PropertyShape(path=_local(p.get("path")))
    if "minCount" in p:
        ps.min_count = int(p["minCount"])
    if "maxCount" in p:
        ps.max_count = int(p["maxCount"])
    if "datatype" in p:
        ps.datatype = _local(p["datatype"])
    if "hasValue" in p:
        hv = p["hasValue"]
        ps.has_value = _local(hv) if isinstance(hv, str) and ":" in hv else hv
    if "in" in p:
        ps.in_values = list(p["in"])
    if "class" in p:
        ps.class_ = _local(p["class"])
    if "nodeKind" in p:
        ps.node_kind = _local(p["nodeKind"])
    if "minInclusive" in p:
        ps.min_inclusive = float(p["minInclusive"])
    if "maxInclusive" in p:
        ps.max_inclusive = float(p["maxInclusive"])
    if "lessThan" in p:
        ps.less_than = _local(p["lessThan"])
    if "node" in p:
        ps.node = _local(p["node"])
    for key, attr in (("or", "or_"), ("xone", "xone"), ("and", "and_")):
        if key in p:
            setattr(ps, attr, [_parse_property(alt) for alt in p[key]])
    return ps


def load_shapes(paths: list[str]) -> dict[str, NodeShape]:
    """Parse JSON-LD shape files (tests/data/shacl-model/commons/shapes-*.json
    format) into class -> NodeShape.  Driver-side, once — the analogue of the
    shapes-map SPARQL build (sparql_query_builder.py:423-481,
    rdf/directory_service.py:64-87).

    Two passes: parse every NodeShape (incl. non-targeting helper shapes like
    this:GeoShape), then resolve sh:node references and flatten node-level
    sh:and inheritance (EmployeeShape = PersonShape ⊕ own properties —
    the sh:node inheritance flattening of rdf/service.py:408-621)."""
    by_class: dict[str, NodeShape] = {}
    by_id: dict[str, NodeShape] = {}
    raw_and: dict[str, list] = {}  # shape local id -> unparsed and-list
    for path in paths:
        with open(path, encoding="utf-8") as f:
            doc = json.load(f)
        for sh in doc.get("shapes", []):
            types = sh.get("@type", [])
            types = [types] if isinstance(types, str) else types
            if not any(_local(t) == "NodeShape" for t in types):
                continue
            target = sh.get("targetClass")
            if target is None and any(_local(t) == "Class" for t in types):
                target = sh.get("@id")  # implicit class target (rdfs:Class)
            ns = NodeShape(
                shape_id=sh.get("@id", ""),
                target_class=_local(target) if target else None,
                node_kind=_local(sh.get("nodeKind")) if sh.get("nodeKind") else None,
            )
            props = sh.get("property", [])
            props = [props] if isinstance(props, dict) else props
            ns.properties = [_parse_property(p) for p in props if isinstance(p, dict)]
            local_id = _local(ns.shape_id)
            by_id[local_id] = ns
            if "and" in sh:
                raw_and[local_id] = sh["and"]
            if ns.target_class:
                by_class[ns.target_class] = ns

    # pass 2a: flatten node-level sh:and lists
    for local_id, entries in raw_and.items():
        ns = by_id[local_id]
        for entry in entries:
            if not isinstance(entry, dict):
                continue
            if "node" in entry and "path" not in entry:
                parent = by_id.get(_local(entry["node"]))
                if parent is not None:
                    ns.properties.extend(parent.properties)
                    ns.alt_groups.extend(parent.alt_groups)
            elif "path" in entry:
                ns.properties.append(_parse_property(entry))
            else:
                for kind in ("or", "xone"):
                    alts = entry.get(kind)
                    if alts and all("path" in a for a in alts):
                        ns.alt_groups.append(
                            (kind, [_parse_property(a) for a in alts])
                        )

    # pass 2b: resolve property-level sh:node references (deep)
    def resolve_props(props: list[PropertyShape]) -> None:
        for ps in props:
            if ps.node is not None:
                ps.node_shape = by_id.get(ps.node)
            for combo in (ps.or_, ps.xone, ps.and_):
                if combo:
                    resolve_props(combo)

    for ns in by_id.values():
        resolve_props(ns.properties)
        for _, group in ns.alt_groups:
            resolve_props(group)
    return by_class


def load_subclass_closure(ontology_path: str) -> dict[str, set[str]]:
    """Expanded JSON-LD ontology -> transitive rdfs:subClassOf closure
    (local names).  The RDFS inference option precomputed on the driver
    (SURVEY.md V8)."""
    with open(ontology_path, encoding="utf-8") as f:
        doc = json.load(f)
    graph = doc.get("@graph", doc) if isinstance(doc, dict) else doc
    parents: dict[str, set[str]] = {}
    for node in graph:
        nid = node.get("@id", "")
        if nid.startswith("_:"):
            continue
        supers = node.get(RDFS_SUBCLASS, [])
        if supers:
            parents.setdefault(_local(nid), set()).update(
                _local(s["@id"]) for s in supers if "@id" in s and not s["@id"].startswith("_:")
            )
    # transitive closure (ontologies are small; driver-side)
    closure: dict[str, set[str]] = {}

    def expand(c: str, seen: frozenset) -> set[str]:
        if c in closure:
            return closure[c]
        out = set()
        for p in parents.get(c, ()):  # direct
            if p in seen:
                continue
            out.add(p)
            out |= expand(p, seen | {c})
        closure[c] = out
        return out

    for c in list(parents):
        expand(c, frozenset())
    return closure


# --------------------------------------------------------------- compilation

_XSD_SPARK = {
    "string": T.StringType,
    "boolean": T.BooleanType,
    "integer": (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
    "float": (T.FloatType, T.DoubleType),
    "double": (T.DoubleType, T.FloatType),
    "decimal": (T.DecimalType, T.DoubleType, T.FloatType),
}


class ShapeCompiler:
    def __init__(
        self,
        shapes: dict[str, NodeShape],
        subclass_of: dict[str, set[str]] | None = None,
    ):
        self.shapes = shapes
        self.subclass_of = subclass_of or {}

    def type_matches(self, type_col: Column, target: str, inference: str | None) -> Column:
        """Does the row's type make it a focus node of the target shape?"""
        eq = type_col == target
        if inference == "rdfs":
            subs = [c for c, ancs in self.subclass_of.items() if target in ancs]
            if subs:
                eq = eq | type_col.isin(subs)
        return eq

    def _dtype_ok(self, dtype: T.DataType, xsd: str) -> bool:
        expected = _XSD_SPARK.get(xsd)
        if expected is None:
            return True  # date/dateTime/time handled value-wise on strings
        if not isinstance(expected, tuple):
            expected = (expected,)
        return isinstance(dtype, expected) or isinstance(dtype, T.StringType)

    def _value_pred(
        self, col: Column, dtype: T.DataType, ps: PropertyShape, inference: str | None
    ) -> list[tuple[Column, str]]:
        """Predicates that must hold when the value is present.
        Returns [(ok_condition, violation_label)]."""
        preds: list[tuple[Column, str]] = []
        p = ps.path
        if ps.datatype is not None:
            if not self._dtype_ok(dtype, ps.datatype):
                preds.append((F.lit(False), f"{p}: datatype {ps.datatype}"))
            elif isinstance(dtype, T.StringType):
                # value-wise castability for string columns
                if ps.datatype in ("integer", "float", "double", "decimal"):
                    preds.append(
                        (col.cast("double").isNotNull(), f"{p}: datatype {ps.datatype}")
                    )
                elif ps.datatype == "boolean":
                    preds.append(
                        (F.lower(col).isin("true", "false"), f"{p}: datatype boolean")
                    )
                elif ps.datatype in ("dateTime", "date", "time"):
                    preds.append(
                        (
                            F.coalesce(
                                F.try_to_timestamp(col).isNotNull(),
                                F.lit(False),
                            )
                            | col.rlike(r"^\d{2}:\d{2}(:\d{2}(\.\d+)?)?$"),
                            f"{p}: datatype {ps.datatype}",
                        )
                    )
        if ps.has_value is not None:
            preds.append((col == F.lit(ps.has_value), f"{p}: hasValue {ps.has_value}"))
        if ps.in_values is not None:
            preds.append((col.isin(ps.in_values), f"{p}: in {ps.in_values}"))
        if ps.min_inclusive is not None:
            preds.append(
                (col.cast("double") >= ps.min_inclusive, f"{p}: minInclusive")
            )
        if ps.max_inclusive is not None:
            preds.append(
                (col.cast("double") <= ps.max_inclusive, f"{p}: maxInclusive")
            )
        if ps.class_ is not None:
            preds.extend(self._class_pred(col, dtype, ps, inference))
        if ps.node_shape is not None:
            # sh:node — value must conform to the referenced shape's
            # property constraints (rdf/collectors.py:218-250)
            if not isinstance(dtype, T.StructType):
                preds.append((F.lit(False), f"{p}: node {ps.node} (not a node)"))
            else:
                for nps in ps.node_shape.properties:
                    preds.extend(self._property_preds(col, dtype, nps, inference))
        if ps.node_kind == "IRI":
            preds.append((col.isNotNull(), f"{p}: nodeKind IRI"))
        for combo, name in ((ps.or_, "or"), (ps.xone, "xone"), (ps.and_, "and")):
            if combo:
                oks = [
                    self._all_ok(self._value_pred(col, dtype, alt, inference))
                    for alt in combo
                ]
                agg = oks[0]
                if name == "or":
                    for o in oks[1:]:
                        agg = agg | o
                elif name == "and":
                    for o in oks[1:]:
                        agg = agg & o
                else:  # xone: exactly one
                    total = None
                    for o in oks:
                        term = F.when(o, 1).otherwise(0)
                        total = term if total is None else total + term
                    agg = total == 1
                preds.append((agg, f"{p}: {name}"))
        return preds

    def _class_pred(
        self, col: Column, dtype: T.DataType, ps: PropertyShape, inference: str | None
    ) -> list[tuple[Column, str]]:
        """sh:class — value node's type must be the class; if the class has
        an implicit-target shape, recurse into it (nested struct validation,
        mirroring pySHACL validating typed nodes in the data graph)."""
        preds: list[tuple[Column, str]] = []
        if not isinstance(dtype, T.StructType):
            return [(F.lit(False), f"{ps.path}: class {ps.class_} (not a node)")]
        if "type" in dtype.fieldNames():
            tf = dtype["type"].dataType
            tcol = col.getField("type")
            if isinstance(tf, T.ArrayType):
                ok = F.array_contains(tcol, ps.class_)
            else:
                ok = self.type_matches(tcol, ps.class_, inference)
            preds.append((ok, f"{ps.path}: class {ps.class_}"))
        else:
            preds.append((F.lit(False), f"{ps.path}: class {ps.class_} (untyped)"))
        nested = self.shapes.get(ps.class_)
        if nested is not None:
            for nps in nested.properties:
                preds.extend(self._property_preds(col, dtype, nps, inference))
        return preds

    @staticmethod
    def _all_ok(preds: list[tuple[Column, str]]) -> Column:
        out = F.lit(True)
        for ok, _ in preds:
            out = out & ok
        return out

    def _property_preds(
        self,
        parent: Column | None,
        schema: T.StructType,
        ps: PropertyShape,
        inference: str | None,
    ) -> list[tuple[Column, str]]:
        """Constraints for one property of a (possibly nested) node."""
        p = ps.path
        if p not in schema.fieldNames():
            # absent column == absent property for every row
            if ps.min_count and ps.min_count > 0:
                return [(F.lit(False), f"{p}: minCount {ps.min_count}")]
            return []
        col = parent.getField(p) if parent is not None else F.col(f"`{p}`")
        dtype = schema[p].dataType
        preds: list[tuple[Column, str]] = []
        if isinstance(dtype, T.ArrayType):
            n = F.when(col.isNull(), 0).otherwise(F.size(col))
            if ps.min_count:
                preds.append((n >= ps.min_count, f"{p}: minCount {ps.min_count}"))
            if ps.max_count is not None:
                preds.append((n <= ps.max_count, f"{p}: maxCount {ps.max_count}"))
            elem = dtype.elementType
            value_preds = self._value_pred(F.lit(None), elem, ps, inference)
            # evaluate element-wise via forall
            for _, label in value_preds:
                pass  # labels recomputed below per-element

            def elem_ok(e: Column) -> Column:
                return self._all_ok(self._value_pred(e, elem, ps, inference))

            if value_preds:
                preds.append(
                    (
                        col.isNull() | F.forall(col, elem_ok),
                        f"{p}: element constraints",
                    )
                )
        else:
            if ps.min_count:
                preds.append((col.isNotNull(), f"{p}: minCount {ps.min_count}"))
            # scalar column always satisfies maxCount >= 1
            value_preds = self._value_pred(col, dtype, ps, inference)
            for ok, label in value_preds:
                preds.append((col.isNull() | ok, label))
        if ps.less_than and ps.less_than in schema.fieldNames():
            other = (
                parent.getField(ps.less_than) if parent is not None else F.col(ps.less_than)
            )
            preds.append(
                (col.isNull() | other.isNull() | (col < other), f"{p}: lessThan {ps.less_than}")
            )
        return preds

    def validate(
        self,
        df: DataFrame,
        type_: str,
        inference: str | None = None,
        type_col: str = "type",
    ) -> DataFrame:
        """df + target type -> df with (validated, violations) columns."""
        shape = self.shapes.get(type_)
        if shape is None:
            raise ValueError(f"no shape registered for type {type_!r}")
        preds: list[tuple[Column, str]] = []
        if type_col in df.columns:
            tdt = df.schema[type_col].dataType
            if isinstance(tdt, T.ArrayType):
                focus = F.array_contains(F.col(type_col), shape.target_class)
            else:
                focus = self.type_matches(F.col(type_col), shape.target_class, inference)
        else:
            focus = F.lit(False)
        preds.append((focus, f"no focus node for {shape.target_class}"))
        if shape.node_kind == "IRI":
            preds.append((F.col("id").isNotNull() & (F.col("id") != ""), "nodeKind IRI"))
        for ps in shape.properties:
            if ps.path == type_col and ps.has_value is not None:
                # rdf:type hasValue -> covered by focus check semantics
                preds.append((focus, f"{type_col}: hasValue {ps.has_value}"))
                continue
            preds.extend(self._property_preds(None, df.schema, ps, inference))
        for kind, group in shape.alt_groups:
            # node-level sh:or / sh:xone over path-bearing alternatives:
            # or = at least one group satisfied, xone = exactly one
            oks = [
                self._all_ok(self._property_preds(None, df.schema, alt, inference))
                for alt in group
            ]
            if kind == "or":
                agg = oks[0]
                for o in oks[1:]:
                    agg = agg | o
            else:
                total = None
                for o in oks:
                    term = F.when(o, 1).otherwise(0)
                    total = term if total is None else total + term
                agg = total == 1
            paths = "|".join(a.path for a in group)
            preds.append((agg, f"{kind}({paths})"))
        viols = F.array_compact(
            F.array(*[F.when(~F.coalesce(ok, F.lit(False)), F.lit(label)) for ok, label in preds])
        )
        return df.withColumn("violations", viols).withColumn(
            "validated", F.size(F.col("violations")) == 0
        )

    # ------------------------------------------------------------- templates

    def template(self, type_: str, only_required: bool = False) -> dict:
        """Shape -> default-valued dict template — forge.template / V9
        (rdf_model.py:97-104,257-346).  Golden-tested against the reference's
        PERSON/EMPLOYEE/ACTIVITY/BUILDING templates
        (tests/specializations/models/data.py:28-123)."""
        shape = self.shapes.get(type_)
        if shape is None:
            raise ValueError(f"no shape registered for type {type_!r}")
        return self._node_template(shape, type_, only_required, seen=frozenset())

    def _node_template(
        self, shape: NodeShape, type_: str | None, only_required: bool, seen: frozenset
    ) -> dict:
        out: dict = {}
        if shape.node_kind in ("IRI", "BlankNodeOrIRI"):
            out["id"] = ""
        if type_:
            out["type"] = type_
        seen = seen | {_local(shape.shape_id)}
        props = list(shape.properties)
        for _, group in shape.alt_groups:
            props.extend(group)  # or-of-paths: every alternative templated
        for ps in props:
            if ps.path is None or ps.path == "type":
                continue  # rdf:type hasValue is covered by the type key
            if only_required and not (ps.min_count and ps.min_count >= 1):
                continue
            out[ps.path] = self._value_template(ps, seen)
        return out

    # default literals per XSD datatype (rdf_model.py:38-63 DEFAULT_VALUE)
    _DT_DEFAULT = {
        "string": "", "normalizedString": "", "anyURI": "",
        "float": 0.0, "double": 0.0,
        "decimal": 0, "int": 0, "integer": 0, "long": 0, "short": 0,
        "positiveInteger": 0, "negativeInteger": 0, "nonPositiveInteger": 0,
        "nonNegativeInteger": 0, "unsignedLong": 0, "unsignedInt": 0,
        "unsignedShort": 0, "byte": 0, "unsignedByte": 0, "base64Binary": 0,
        "boolean": False,
        "time": "00:00:00",
        "date": "9999-12-31",
        "dateTime": "9999-12-31T00:00:00",
    }
    # DEFAULT_TYPE_ORDER (rdf_model.py:65): str < float < int < bool < date
    _TYPE_ORDER = {str: 0, float: 1, int: 2, bool: 3}

    def _value_template(self, ps: PropertyShape, seen: frozenset):
        if ps.node_shape is not None:
            if _local(ps.node_shape.shape_id) in seen:
                return {"id": "", "type": ps.node}
            return self._node_template(
                ps.node_shape, ps.node_shape.target_class, False, seen
            )
        if ps.class_ is not None:
            nested = self.shapes.get(ps.class_)
            if nested is not None and _local(nested.shape_id) not in seen:
                return self._node_template(nested, ps.class_, False, seen)
            return {"id": "", "type": ps.class_}
        combo = ps.or_ or ps.xone or ps.and_
        if combo:
            classes = sorted(_local(a.class_) for a in combo if a.class_ is not None)
            if classes:
                # shape-node alternatives collapse to {id, type:[...]}
                # (OrCollector len>1 collapse, collectors.py:323-374)
                return {"id": "", "type": classes if len(classes) > 1 else classes[0]}
            if any(a.node_kind == "IRI" for a in combo):
                # properties (the id node) win over datatype attrs
                # (parse_attributes prefers node.properties, rdf_model.py:264-270)
                return {"id": ""}
            vals = [self._value_template(a, seen) for a in combo]
            # sort by DEFAULT_TYPE_ORDER position, ties by value
            if all(isinstance(v, type(vals[0])) for v in vals):
                return sorted(vals)
            by_pos = {self._TYPE_ORDER.get(type(v), 9): v for v in vals}
            return [by_pos[k] for k in sorted(by_pos)]
        if ps.has_value is not None:
            return ps.has_value
        if ps.in_values is not None:
            return sorted(ps.in_values)
        if ps.node_kind == "IRI":
            return {"id": ""}
        if ps.datatype is not None:
            return self._DT_DEFAULT.get(ps.datatype, "")
        return ""
