"""Dataset PROV helpers: append nested W3C-PROV structures to resource rows.

Reference: the Dataset specialization's add_contribution / add_generation /
add_derivation / add_invalidation / add_parts / add_distribution / add_files
append nested provenance Resources to one dataset object
(kgforge/specializations/resources/datasets.py:27-205).  The `_set` helper
(:190-205) gives the accumulation semantics: absent attribute -> set it;
existing list -> append; existing scalar -> promote to a two-element list.

Spark re-expression: every helper is a DataFrame -> DataFrame transformation
that appends ONE nested struct (or array of structs for parts) per dataset
ROW — the whole corpus gets its provenance in one plan.  References to other
resources come either as a constant id (versioned=False only, like the
reference's str branch, :105-108) or as a resource DataFrame joined on a
key; resource reference structs follow forge.reshape's keep-lists
(id/type/name + versioned id?_version=rev, reshaping semantics of
core/reshaping.py:35-78).

Scale: the resource side of every join is dimension-shaped (agents,
activities, parent entities) — broadcast by default; the dataset side never
shuffles.  add_parts aggregates parts per dataset key before joining, so
the join is 1:1 and the array build is one shuffle on the parts key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# prov attr -> (node type, reference property, reference type, keep list)
# (datasets.py:66-124; _store_metadata rides as the _rev column here)
PROV_SPECS = {
    "contribution": ("Contribution", "agent", "Agent", ["id", "type"]),
    "generation": ("Generation", "activity", "Activity", ["id", "type"]),
    "derivation": ("Derivation", "entity", "Entity", ["id", "type", "name"]),
    "invalidation": ("Invalidation", "activity", "Activity", ["id", "type"]),
}


def set_column(df: DataFrame, attr: str, new_col: Column) -> DataFrame:
    """_set accumulation semantics (datasets.py:190-205) on a column:
    absent -> set; array -> append; scalar/struct -> [old, new].  Struct
    types must unify across appends (Spark arrays are homogeneous — the
    reference's heterogeneous lists have no distributed analogue)."""
    if attr not in df.columns:
        return df.withColumn(attr, new_col)
    dtype = df.schema[attr].dataType
    if isinstance(dtype, T.ArrayType):
        return df.withColumn(attr, F.concat(F.col(attr), F.array(new_col)))
    return df.withColumn(attr, F.array(F.col(attr), new_col))


def _versioned_id(id_col: Column, rev_col: Column) -> Column:
    """id -> id?_version=<rev> (versioned_id_template)."""
    return F.concat(id_col, F.lit("?_version="), rev_col.cast("string"))


def _reference_from_df(
    resource: DataFrame,
    key: str,
    keep: list[str],
    versioned: bool,
) -> DataFrame:
    """(key, ref struct) rows for the resource side of the prov join."""
    if versioned and "_rev" not in resource.columns:
        raise ValueError(
            "Missing resource revision value to build a versioned reference. "
            "Provide a _rev column (by registering the resource for example) "
            "or set 'versioned' to False."  # datasets.py:113-118 wording
        )
    # reshape keeps only the resource's OWN present paths (reshaping.py:
    # 35-78); the default reference type applies to the str branch only
    present = [k for k in keep if k in resource.columns]
    fields = []
    for k in present:
        col = F.col(f"`{k}`")
        if k == "id" and versioned:
            col = _versioned_id(col, F.col("_rev"))
        fields.append(col.alias(k))
    return resource.select(F.col(key).alias("__ref_key"), F.struct(*fields).alias("__ref"))


def add_prov(
    datasets: DataFrame,
    prov_attr: str,
    resource: DataFrame | str,
    on: tuple[str, str] | None = None,
    versioned: bool = True,
    **kwargs,
) -> DataFrame:
    """Generic _add_prov_property (datasets.py:102-124): appends
    struct(type=<ProvType>, **kwargs, <ref_prop>=<reference>) to every
    dataset row.  `resource` is a constant id string (versioned must be
    False) or a resource DataFrame joined via on=(dataset_key, resource_key)
    — dimension-shaped, so broadcast."""
    if prov_attr not in PROV_SPECS:
        raise ValueError(f"unknown prov attribute {prov_attr!r}")
    prov_type, ref_prop, ref_type, keep = PROV_SPECS[prov_attr]
    extra = [F.lit(v).alias(k) for k, v in kwargs.items()]

    if isinstance(resource, str):
        if versioned:
            raise ValueError(
                "resource:str when versioned is True. Set 'versioned' to "
                "False when referencing a str"  # datasets.py:105-108
            )
        ref = F.struct(F.lit(ref_type).alias("type"), F.lit(resource).alias("id"))
        node = F.struct(F.lit(prov_type).alias("type"), *extra, ref.alias(ref_prop))
        return set_column(datasets, prov_attr, node)

    if on is None:
        raise ValueError("on=(dataset_key, resource_key) required for a DataFrame resource")
    dkey, rkey = on
    refs = _reference_from_df(resource, rkey, keep, versioned)
    joined = datasets.join(
        F.broadcast(refs), datasets[dkey] == refs["__ref_key"], "left"
    ).drop("__ref_key")
    node = F.struct(
        F.lit(prov_type).alias("type"), *extra, F.col("__ref").alias(ref_prop)
    )
    return set_column(joined, prov_attr, node).drop("__ref")


def add_contribution(datasets, resource, on=None, versioned=True, **kw):
    """datasets.py:66-75."""
    return add_prov(datasets, "contribution", resource, on, versioned, **kw)


def add_generation(datasets, resource, on=None, versioned=True, **kw):
    """datasets.py:77-83."""
    return add_prov(datasets, "generation", resource, on, versioned, **kw)


def add_derivation(datasets, resource, on=None, versioned=True, **kw):
    """datasets.py:85-91."""
    return add_prov(datasets, "derivation", resource, on, versioned, **kw)


def add_invalidation(datasets, resource, on=None, versioned=True, **kw):
    """datasets.py:93-100."""
    return add_prov(datasets, "invalidation", resource, on, versioned, **kw)


def add_parts(
    datasets: DataFrame,
    parts: DataFrame,
    on: tuple[str, str],
    versioned: bool = True,
) -> DataFrame:
    """add_parts (datasets.py:42-47): hasPart <- reshaped part references,
    keep = id/type/name/distribution.contentUrl.  Parts aggregate to one
    array per dataset key FIRST (one shuffle on the parts side), then a 1:1
    join attaches them — the dataset side never fans out."""
    dkey, rkey = on
    keep = ["id", "type", "name"]
    fields = []
    for k in keep:
        if k in parts.columns:
            col = F.col(f"`{k}`")
            if k == "id" and versioned:
                if "_rev" not in parts.columns:
                    raise ValueError(
                        "Missing resource revision value; set versioned=False"
                    )
                col = _versioned_id(col, F.col("_rev"))
            fields.append(col.alias(k))
    if "distribution" in parts.columns:
        dt = parts.schema["distribution"].dataType
        if isinstance(dt, T.StructType) and "contentUrl" in dt.fieldNames():
            fields.append(
                F.struct(
                    F.col("distribution.contentUrl").alias("contentUrl")
                ).alias("distribution")
            )
    grouped = (
        parts.select(F.col(rkey).alias("__pk"), F.struct(*fields).alias("__part"))
        .groupBy("__pk")
        .agg(F.collect_list("__part").alias("__parts"))
    )
    joined = datasets.join(
        grouped, datasets[dkey] == grouped["__pk"], "left"
    ).drop("__pk")
    out = joined
    if "hasPart" in datasets.columns:
        out = out.withColumn(
            "hasPart", F.concat(F.col("hasPart"), F.col("__parts"))
        )
    else:
        out = out.withColumn("hasPart", F.col("__parts"))
    return out.drop("__parts")


def attach_struct(path: Column | str, content_type: str | None = None) -> Column:
    """forge.attach's distribution record as a Column (LazyAction analogue:
    media refs are data — core/forge.py:798-809)."""
    p = F.lit(path) if isinstance(path, str) else path
    return F.struct(
        F.lit("DataDownload").alias("type"),
        p.alias("contentUrl"),
        F.lit(content_type).cast("string").alias("encodingFormat"),
    )


def add_distribution(
    datasets: DataFrame, path: Column | str, content_type: str | None = None
) -> DataFrame:
    """add_distribution (datasets.py:49-54): distribution <- attach record.
    `path` may be a per-row Column (each dataset its own file)."""
    return set_column(datasets, "distribution", attach_struct(path, content_type))


def add_files(
    datasets: DataFrame, path: Column | str, content_type: str | None = None
) -> DataFrame:
    """add_files (datasets.py:126-132): hasPart <- {distribution: attach}."""
    node = F.struct(attach_struct(path, content_type).alias("distribution"))
    return set_column(datasets, "hasPart", node)


def download_refs(
    datasets: DataFrame, follow: str = "distribution.contentUrl", keep: list[str] | None = None
) -> DataFrame:
    """Dataset.download's URL-collection step (datasets.py:134-177):
    collect every contentUrl reachable along `follow` — one row per
    dataset, values: array<string>.  The byte fetch itself is the
    multimodal stub's concern (S13)."""
    from nexus_forge_spark.operators.reshape import collect_values

    return collect_values(datasets, follow, keep=keep)
