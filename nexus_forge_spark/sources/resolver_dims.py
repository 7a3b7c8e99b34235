"""Resolver dictionary loader: JSON files of flat records -> dimension DF.

Reference: DemoResolver._service_from_directory loads each target's bucket
JSON into a list of dicts (demo_resolver.py:113-119); records are
heterogeneous (e.g. structure_layer.json rows carry only label+id).  The
loader normalizes to a fixed schema with dict_idx = file order (the
stable-sort tiebreak) and null for absent fields.

Files are small ontology dictionaries — parsed on the driver, shipped via
createDataFrame, always the broadcast side of resolver joins.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BASE_FIELDS = ["id", "type", "label"]


def load_resolver_dim(
    spark: SparkSession,
    path: str,
    match_props: list[str] | None = None,
) -> DataFrame:
    """JSON array file -> dim(dict_idx, id, type, label, <match_props...>, deprecated)."""
    with open(path, encoding="utf-8") as f:
        records = json.load(f)
    props = list(dict.fromkeys(BASE_FIELDS + (match_props or [])))
    rows = [
        tuple([i] + [r.get(p) for p in props] + [bool(r.get("deprecated", False))])
        for i, r in enumerate(records)
    ]
    schema = T.StructType(
        [T.StructField("dict_idx", T.IntegerType(), False)]
        + [T.StructField(p, T.StringType()) for p in props]
        + [T.StructField("deprecated", T.BooleanType())]
    )
    return spark.createDataFrame(rows, schema)
