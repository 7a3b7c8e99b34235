"""Canonical schemas for the KG-construction pipeline.

The input table shape is mandated by BASELINE.json ``input_hint``:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

mirroring how a nexus-forge ``Resource`` interleaves literal properties and
file ``distribution`` attachments (reference: kgforge/core/forge.py:798-809,
kgforge/core/archetypes/read_only_store.py:98-154).

Per-row invariant vs the reference: span-sequence equality on
(kind, text, media_ref, order).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN)),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

MENTIONS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("mention", T.StringType(), False),
        T.StructField("kind", T.StringType()),
    ]
)

RESOLVED = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("span_idx", T.IntegerType()),
        T.StructField("mention", T.StringType()),
        T.StructField("entity_id", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("strategy", T.StringType()),
    ]
)

# Triple output: set semantics on (subj, pred, obj); lineage columns ride
# along (reference keeps _store_metadata per resource, resource.py:34).
TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("obj_is_literal", T.BooleanType()),
        T.StructField("obj_datatype", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("stage", T.StringType()),
    ]
)

ONTOLOGY_TERMS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("type", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("notation", T.StringType()),
        T.StructField("prefLabel", T.StringType()),
        T.StructField("altLabel", T.StringType()),
        T.StructField("definition", T.StringType()),
        T.StructField("subClassOf", T.StringType()),
        T.StructField("deprecated", T.BooleanType()),
    ]
)

AGENTS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("type", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("acronym", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("givenName", T.StringType()),
        T.StructField("familyName", T.StringType()),
        T.StructField("alternateName", T.StringType()),
        T.StructField("deprecated", T.BooleanType()),
    ]
)

CHECKPOINT_MANIFEST = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("committed_at", T.TimestampType()),
    ]
)
