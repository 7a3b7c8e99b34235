"""KnowledgeGraphForge-style facade: the reference's user API surface bound
to the Spark-native operators, so a nexus-forge user can switch with the
same verbs (kgforge/core/forge.py):

    forge = SparkForge(spark, config)
    forge.map(df, mapping)          # forge.py:581-601
    forge.resolve(df_or_text, ...)  # forge.py:394-487
    forge.validate(df, type_)       # forge.py:320-343
    forge.search(*filters)          # forge.py:658-672
    forge.format(what, *args)       # forge.py:491-540
    forge.reshape(df, keep)         # forge.py:605-622
    forge.as_triples(df)            # conversions as_graph analogue
    forge.register/update/...       # store verbs

The key semantic shift: every verb is set-oriented — it takes/returns
DataFrames and compiles to one Spark plan, instead of looping resources.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from nexus_forge_spark.operators import resolve as R
from nexus_forge_spark.operators.mapping import ForgeContext, load_mapping, map_dataframe
from nexus_forge_spark.operators.reshape import collect_values, reshape
from nexus_forge_spark.operators.search import apply_filters, paths
from nexus_forge_spark.operators.convert import struct_to_triples, triples_to_resources, flatten, deflatten
from nexus_forge_spark.operators.validate import ShapeCompiler, load_shapes, load_subclass_closure


@dataclass
class SparkForgeConfig:
    formatters: dict[str, str] = field(default_factory=dict)
    # (scope, target|None) -> (dim_idx DataFrame, match_props)
    resolver_dims: dict = field(default_factory=dict)
    shape_files: list[str] = field(default_factory=list)
    ontology_file: str | None = None
    store_dir: str | None = None
    # JSON-LD-ish context: prefix/term -> IRI (forge.prefixes, as_jsonld)
    context: dict = field(default_factory=dict)
    # root dir laid out <source>/DictionaryMapping/<entity>.hjson
    # (the reference's demo-model mappings layout)
    mappings_dir: str | None = None


class SparkForge:
    def __init__(self, spark: SparkSession, config: SparkForgeConfig | None = None):
        self.spark = spark
        self.config = config or SparkForgeConfig()
        self._ctx = ForgeContext(
            formatters=self.config.formatters,
            resolver_dims=self.config.resolver_dims,
        )
        self._shapes: ShapeCompiler | None = None
        self._store = None

    # ------------------------------------------------------------- mapping

    def map(self, data, mapping, na=None) -> DataFrame:
        """Mapper dispatch (M2, core/archetypes/mapper.py:44-62): accepts a
        DataFrame, a record dict, a list of record dicts, or a path to
        JSON(L) record files — everything becomes ONE DataFrame and one
        compiled plan (no per-record loop, mapper.py:64-69)."""
        rules = load_mapping(mapping) if isinstance(mapping, str) else mapping
        df = self._as_records_df(data)
        return map_dataframe(df, rules, self._ctx, na=na)

    def _as_records_df(self, data) -> DataFrame:
        import json as _json
        import os

        if isinstance(data, DataFrame):
            return data
        if isinstance(data, dict):
            data = [data]
        if isinstance(data, (list, tuple)):
            rdd = self.spark.sparkContext.parallelize([_json.dumps(r) for r in data])
            return self.spark.read.json(rdd)
        if isinstance(data, str) and os.path.exists(data):
            return self.spark.read.option("multiLine", "true").json(data)
        raise TypeError(f"cannot map data of type {type(data)}")

    def format(self, what: str, *args) -> str:
        return self.config.formatters[what].format(*args)

    def reshape(self, data: DataFrame, keep: list[str], versioned: bool = False) -> DataFrame:
        return reshape(data, keep, versioned)

    def collect_values(self, data: DataFrame, follow: str, constraint=None) -> DataFrame:
        return collect_values(data, follow, constraint)

    # ------------------------------------------------------------- resolving

    def resolve(
        self,
        mentions: DataFrame,
        scope: str | None = None,
        target: str | None = None,
        type: str | None = None,
        strategy: str = R.BEST_MATCH,
        limit: int = 10,
        threshold: float | None = None,
        keys: list[str] | None = None,
    ) -> DataFrame:
        dim_idx, match_props = self._ctx.dim_for(scope, target)
        alias = R.build_alias_table(dim_idx, match_props, type_filter=type)
        return R.resolve(
            mentions, alias, strategy, limit=limit, threshold=threshold,
            keys=keys or ["mention"],
        )

    # ------------------------------------------------------------- validation

    def _shape_compiler(self) -> ShapeCompiler:
        if self._shapes is None:
            shapes = load_shapes(self.config.shape_files)
            closure = (
                load_subclass_closure(self.config.ontology_file)
                if self.config.ontology_file
                else {}
            )
            self._shapes = ShapeCompiler(shapes, closure)
        return self._shapes

    def validate(self, data: DataFrame, type_: str, inference: str | None = None) -> DataFrame:
        return self._shape_compiler().validate(data, type_, inference)

    # ------------------------------------------------------------- conversion

    def as_triples(self, data: DataFrame, context: dict | None = None) -> DataFrame:
        return struct_to_triples(data, context=context)

    def from_triples(self, triples: DataFrame) -> DataFrame:
        return triples_to_resources(triples)

    # reference verb names (forge.as_graph/from_graph, core/forge.py:865-959)
    # — the rdflib.Graph <-> triples-DataFrame equivalence
    as_graph = as_triples
    from_graph = from_triples

    def as_dataframe(self, data: DataFrame) -> DataFrame:
        return flatten(data)

    def from_dataframe(self, data: DataFrame) -> DataFrame:
        return deflatten(data)

    # ------------------------------------------------------------- store

    @property
    def store(self):
        if self._store is None:
            if not self.config.store_dir:
                raise ValueError("config.store_dir not set")
            from nexus_forge_spark.store import ParquetStore

            self._store = ParquetStore(self.spark, self.config.store_dir)
        return self._store

    def register(self, df: DataFrame) -> dict:
        return self.store.register(df)

    def update(self, df: DataFrame) -> dict:
        return self.store.update(df)

    def deprecate(self, ids: list) -> dict:
        return self.store.deprecate(ids)

    def tag(self, name: str, version: int | None = None) -> None:
        return self.store.tag(name, version)

    def retrieve(self, ids=None, version: int | None = None, tag: str | None = None) -> DataFrame:
        return self.store.retrieve(ids, version, tag)

    def search(self, *filters, **kw) -> DataFrame:
        return self.store.search(*filters, **kw)

    def freeze(self, df: DataFrame, id_cols: list[str] | None = None) -> DataFrame:
        return self.store.freeze(df, id_cols)

    # ------------------------------------------------- introspection verbs

    def types(self) -> list[str]:
        """Registered shape type names (forge.types, core/forge.py:287)."""
        return sorted(self._shape_compiler().shapes)

    def template(self, type_: str, only_required: bool = False) -> dict:
        """Shape template (forge.template, core/forge.py:305)."""
        return self._shape_compiler().template(type_, only_required)

    def prefixes(self) -> dict[str, str]:
        """Configured context prefixes (forge.prefixes, core/forge.py:268)."""
        return dict(self.config.context)

    def get_model_context(self) -> dict:
        """The model's JSON-LD context (core/forge.py:977-980)."""
        return self.prefixes()

    def get_store_context(self) -> dict | None:
        """The store's metadata context (core/forge.py:973-975); this store
        keeps one shared context, so both getters expose the same dict."""
        return self.prefixes() or None

    def resolvers(self) -> dict:
        """Configured (scope, target) resolver dims (forge.resolvers,
        core/forge.py:347)."""
        return {k: props for k, (_df, props) in self.config.resolver_dims.items()}

    def sources(self) -> list[str]:
        """Mapping sources under mappings_dir (forge.sources, :545)."""
        import os

        if not self.config.mappings_dir:
            return []
        return sorted(
            d
            for d in os.listdir(self.config.mappings_dir)
            if os.path.isdir(os.path.join(self.config.mappings_dir, d))
        )

    def mappings(self, source: str) -> list[str]:
        """Entities mapped for a source (forge.mappings, :554) — the
        reference's <source>/DictionaryMapping/<entity>.hjson layout."""
        import glob as _glob
        import os

        base = os.path.join(self.config.mappings_dir or "", source, "DictionaryMapping")
        return sorted(
            os.path.splitext(os.path.basename(f))[0]
            for f in _glob.glob(os.path.join(base, "*.hjson"))
        )

    def mapping(self, entity: str, source: str) -> dict:
        """Load one mapping's rule tree (forge.mapping, :568)."""
        import os

        return load_mapping(
            os.path.join(
                self.config.mappings_dir or "",
                source,
                "DictionaryMapping",
                f"{entity}.hjson",
            )
        )

    # ------------------------------------------------- query + media verbs

    def sparql(
        self,
        query: str,
        triples: DataFrame | None = None,
        limit: int | None = None,
        offset: int | None = None,
        rewrite: bool = True,
    ) -> DataFrame:
        """Raw query verb (forge.sparql, core/forge.py:675) over a
        ``triples(subj, pred, obj, ...)`` view.

        Real SPARQL SELECT text is supported (S5): the query is
        context-rewritten exactly like the reference store
        (rewrite_sparql + limit/offset injection,
        read_only_store.py:212-245), compiled to Spark SQL
        (functions/sparql.py) and executed distributed — pattern constants
        become pushed-down pred/obj filters, shared variables become hash
        joins.  A string without a ``{`` group pattern runs unchanged as
        native Spark SQL (this engine's own query text)."""
        from nexus_forge_spark.functions import sparql as SP

        if triples is not None:
            triples.createOrReplaceTempView("triples")
        if "{" not in query:
            return self.spark.sql(query)
        if rewrite and self.config.context:
            ctx, prefixes, vocab = SP.flatten_context(self.config.context)
            query = SP.rewrite_sparql(query, ctx, prefixes, vocab)
        if limit or offset:
            query = SP.apply_limit_and_offset(
                query, limit, offset, default_limit=None, default_offset=None
            )
        return self.spark.sql(SP.sparql_to_sql(query, table="triples"))

    def elastic(
        self,
        query: str | dict,
        index: DataFrame | None = None,
        limit: int | None = None,
        offset: int | None = None,
    ) -> DataFrame:
        """forge.elastic (core/forge.py:696, read_only_store.py:140-183):
        run an ES search-body JSON against an 'index' DataFrame.  The bool/
        term/terms/range/match/exists/prefix/wildcard/ids clauses compile to
        Column predicates (functions/esdsl.py) that Catalyst pushes into the
        scan; _source becomes column pruning, sort/from/size become
        orderBy/offset/limit — the store-side execution the reference
        delegated to an Elasticsearch endpoint, minus relevance scoring
        (filter-context semantics; ranked search is the similarity ops)."""
        import json as _json

        from nexus_forge_spark.functions.esdsl import es_search

        if index is None:
            raise ValueError("forge.elastic needs the index DataFrame")
        body = _json.loads(query) if isinstance(query, str) else dict(query)
        if limit is not None:
            body["size"] = limit
        if offset is not None:
            body["from"] = offset
        return es_search(index, body)

    def attach(self, path: str, content_type: str | None = None) -> dict:
        """forge.attach (core/forge.py:799): media refs are DATA — returns
        the distribution record the LazyAction would produce at register
        time; inside mapping rules the compiler emits the same struct."""
        return {"type": "DataDownload", "contentUrl": path, "encodingFormat": content_type}

    def download(self, documents: DataFrame) -> DataFrame:
        """forge.download (core/forge.py:716): resolve media spans to
        (doc_id, media_ref, media_type, content) rows — the binary fetch is
        a stubbed deterministic payload in this sandbox (multimodal.py)."""
        from nexus_forge_spark.operators.multimodal import media_from_documents

        return media_from_documents(documents)

    # ------------------------------------------------- json / json-ld verbs

    def as_json(self, data: DataFrame) -> DataFrame:
        """Rows -> one canonical JSON string each (forge.as_json, :814)."""
        from pyspark.sql import functions as F

        return data.select(F.to_json(F.struct(*data.columns)).alias("json"))

    def from_json(
        self, json_df: DataFrame, column: str = "json", sample: int = 100
    ) -> DataFrame:
        """JSON strings -> typed rows (forge.from_json, :914).

        Schema is inferred without any RDD / per-row Python: a bounded
        driver-side sample of strings is recursively merged into one exemplar
        object, `schema_of_json` (JVM) turns it into a struct schema, and
        `from_json` parses the full column as a Column expression, so the
        hot path stays inside whole-stage codegen.
        """
        import json as _json

        from pyspark.sql import functions as F

        def _merge(a, b):
            if isinstance(a, dict) and isinstance(b, dict):
                out = dict(a)
                for k, v in b.items():
                    out[k] = _merge(out[k], v) if k in out else v
                return out
            if isinstance(a, list) and isinstance(b, list):
                merged = None
                for item in a + b:
                    merged = item if merged is None else _merge(merged, item)
                return [] if merged is None else [merged]
            if a is None:
                return b
            if b is None:
                return a
            # widen int exemplars to float so mixed numeric columns parse
            if isinstance(a, bool) or isinstance(b, bool):
                return a
            if isinstance(a, (int, float)) and isinstance(b, (int, float)):
                return a if isinstance(a, float) else b
            return a

        exemplar = None
        for row in json_df.select(column).limit(sample).collect():
            if row[0] is None:
                continue
            try:
                parsed = _json.loads(row[0])
            except ValueError:
                continue
            exemplar = parsed if exemplar is None else _merge(exemplar, parsed)
        if not isinstance(exemplar, dict) or not exemplar:
            return json_df.select(F.lit(None).cast("string").alias("value")).limit(0)
        schema = F.schema_of_json(F.lit(_json.dumps(exemplar)))
        return json_df.select(
            F.from_json(F.col(column), schema).alias("r")
        ).select("r.*")

    def as_jsonld(self, data: DataFrame, form: str = "compacted") -> DataFrame:
        """forge.as_jsonld (:838, rdf.py:199-272).  form='compacted':
        recursive id/type -> @id/@type through nested structs/arrays.
        form='expanded': full pyld-style expansion to one JSON document per
        row (IRI keys, [{"@value"/"@id": ...}] values) using the configured
        context — a single nested Column expression, no per-row Python."""
        from nexus_forge_spark.operators.convert import (
            apply_ld_keys,
            as_jsonld_expanded,
        )

        if form == "expanded":
            return as_jsonld_expanded(data, self.config.context)
        return apply_ld_keys(data, "add", self.config.context)

    def from_jsonld(self, data: DataFrame) -> DataFrame:
        """Inverse @key rewriting at every nesting level, with @id values
        resolved to full IRIs and @id-typed term values shrunk to curies
        (forge.from_jsonld, :927 / _remove_ld_keys rdf.py:489-527)."""
        from nexus_forge_spark.operators.convert import apply_ld_keys

        return apply_ld_keys(data, "remove", self.config.context)

    # ------------------------------------------- Dataset PROV helpers (D1-D3)
    # the reference exposes these on its Dataset specialization
    # (specializations/resources/datasets.py:27-205); here they are
    # set-oriented DataFrame transforms (operators/datasets.py)

    def add_contribution(self, datasets: DataFrame, resource, on=None, versioned=True, **kw):
        from nexus_forge_spark.operators import datasets as D

        return D.add_contribution(datasets, resource, on, versioned, **kw)

    def add_generation(self, datasets: DataFrame, resource, on=None, versioned=True, **kw):
        from nexus_forge_spark.operators import datasets as D

        return D.add_generation(datasets, resource, on, versioned, **kw)

    def add_derivation(self, datasets: DataFrame, resource, on=None, versioned=True, **kw):
        from nexus_forge_spark.operators import datasets as D

        return D.add_derivation(datasets, resource, on, versioned, **kw)

    def add_invalidation(self, datasets: DataFrame, resource, on=None, versioned=True, **kw):
        from nexus_forge_spark.operators import datasets as D

        return D.add_invalidation(datasets, resource, on, versioned, **kw)

    def add_parts(self, datasets: DataFrame, parts: DataFrame, on, versioned=True):
        from nexus_forge_spark.operators import datasets as D

        return D.add_parts(datasets, parts, on, versioned)

    def add_distribution(self, datasets: DataFrame, path, content_type=None):
        from nexus_forge_spark.operators import datasets as D

        return D.add_distribution(datasets, path, content_type)

    def add_files(self, datasets: DataFrame, path, content_type=None):
        from nexus_forge_spark.operators import datasets as D

        return D.add_files(datasets, path, content_type)

    paths = staticmethod(paths)
    apply_filters = staticmethod(apply_filters)
