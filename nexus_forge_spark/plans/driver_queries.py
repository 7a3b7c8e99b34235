"""Driver-contract queries: each Spark query paired with an equivalent DuckDB
oracle SQL over the same parquet tables (see __spark_entry__.py).

Parity rules (hard-won):
* alias every computed column identically on both sides;
* integer-typed literals/casts aligned (row_number -> INT);
* money aggregates via DECIMAL casts *before* arithmetic so both engines sum
  exactly (no float-order divergence);
* the resolver dictionary is rendered into the SQL as a VALUES relation from
  the very rows the Spark side broadcasts (dims.sql_values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nexus_forge_spark import dims
from nexus_forge_spark.operators import canonicalize as CC
from nexus_forge_spark.operators import mentions as M
from nexus_forge_spark.operators import resolve as R
from nexus_forge_spark.sources import load_table

FLAT_KEYS = ["doc_id", "span_idx", "tok_idx", "n", "mention"]


# ---------------------------------------------------------------- SQL helpers

def _alias_cte(name: str = "alias_t") -> str:
    """alias_t(entity_id, dict_idx, score_len, prop_order, alias) from the
    embedded ontology dim — same unpivot as resolve.build_alias_table."""
    props = dims.ONTOLOGY_MATCH_PROPS
    coalesce = "coalesce(" + ", ".join(props) + ")"
    branches = [
        f"SELECT id AS entity_id, dict_idx, CAST(length({coalesce}) AS INT) AS score_len, "
        f"{i} AS prop_order, {p} AS alias FROM dim WHERE {p} IS NOT NULL AND NOT deprecated"
        for i, p in enumerate(props)
    ]
    return f"{name} AS (\n" + "\nUNION ALL\n".join(branches) + "\n)"


def _mentions_cte() -> str:
    return """t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
toks AS (
  SELECT doc_id, CAST(unnest(generate_series(1, len(toks))) AS INT) - 1 AS tok_idx,
         unnest(toks) AS w
  FROM t0
),
mentions AS (
  SELECT doc_id, 0 AS span_idx, tok_idx, 1 AS n, w AS mention FROM toks
  UNION ALL
  SELECT a.doc_id, 0 AS span_idx, a.tok_idx, 2 AS n, a.w || ' ' || b.w AS mention
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.tok_idx = a.tok_idx + 1
)"""


def _rank_sql(match_cond: str, score_expr: str, strategy: str, rank_filter: str) -> str:
    return f"""WITH dim AS (SELECT * FROM {dims.ontology_sql_values('d')}),
{_alias_cte()},
{_mentions_cte()},
cand AS (
  SELECT m.doc_id, m.span_idx, m.tok_idx, m.n, m.mention,
         al.entity_id, al.dict_idx, {score_expr} AS score
  FROM mentions m JOIN alias_t al ON {match_cond}
),
per_entity AS (
  SELECT doc_id, span_idx, tok_idx, n, mention, entity_id,
         min(score) AS score, min(dict_idx) AS dict_idx
  FROM cand GROUP BY doc_id, span_idx, tok_idx, n, mention, entity_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY doc_id, span_idx, tok_idx, n, mention
      ORDER BY score, dict_idx) AS INT) AS rank
  FROM per_entity
)
SELECT doc_id, span_idx, tok_idx, n, mention, entity_id, score, rank,
       '{strategy}' AS strategy
FROM ranked WHERE {rank_filter}"""


# ---------------------------------------------------------------- KG queries

def _flat_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.mentions_from_flat(load_table(spark, "documents", sf_dir))


def _alias(spark: SparkSession) -> DataFrame:
    return R.build_alias_table(dims.ontology_terms_idx(spark), dims.ONTOLOGY_MATCH_PROPS)


def q_kg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.resolve(_flat_mentions(spark, sf_dir), _alias(spark), R.EXACT_MATCH, keys=FLAT_KEYS)


def sql_kg_exact() -> str:
    return _rank_sql(
        "m.mention = al.alias", "CAST(0.0 AS DOUBLE)", R.EXACT_MATCH, "rank = 1"
    )


def q_kg_fuzzy_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.resolve(_flat_mentions(spark, sf_dir), _alias(spark), R.BEST_MATCH, keys=FLAT_KEYS)


def sql_kg_fuzzy_best() -> str:
    return _rank_sql(
        "contains(lower(al.alias), lower(m.mention))",
        "CAST(al.score_len - length(m.mention) AS DOUBLE)",
        R.BEST_MATCH,
        "rank = 1",
    )


def q_kg_fuzzy_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.resolve(
        _flat_mentions(spark, sf_dir), _alias(spark), R.ALL_MATCHES, limit=10, keys=FLAT_KEYS
    )


def sql_kg_fuzzy_all() -> str:
    return _rank_sql(
        "contains(lower(al.alias), lower(m.mention))",
        "CAST(al.score_len - length(m.mention) AS DOUBLE)",
        R.ALL_MATCHES,
        "rank <= 10",
    )


def q_kg_exact_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive resolve over the distinct UPPER'd mention vocabulary
    (demo_resolver.py:62-67 lower()s both sides)."""
    m = (
        _flat_mentions(spark, sf_dir)
        .select(F.upper(F.col("mention")).alias("mention"))
        .distinct()
    )
    return R.resolve(m, _alias(spark), R.EXACT_CASE_INSENSITIVE_MATCH, keys=["mention"])


def sql_kg_exact_ci() -> str:
    return f"""WITH dim AS (SELECT * FROM {dims.ontology_sql_values('d')}),
{_alias_cte()},
{_mentions_cte()},
um AS (SELECT DISTINCT upper(mention) AS mention FROM mentions),
cand AS (
  SELECT um.mention, al.entity_id, al.dict_idx, CAST(0.0 AS DOUBLE) AS score
  FROM um JOIN alias_t al ON lower(um.mention) = lower(al.alias)
),
per_entity AS (
  SELECT mention, entity_id, min(score) AS score, min(dict_idx) AS dict_idx
  FROM cand GROUP BY mention, entity_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY mention ORDER BY score, dict_idx) AS INT) AS rank
  FROM per_entity
)
SELECT mention, entity_id, score, rank, 'EXACT_CASE_INSENSITIVE_MATCH' AS strategy
FROM ranked WHERE rank = 1"""


def q_kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: exact resolve -> annotation triples + per-doc type triple,
    graph set semantics (dedup)."""
    resolved = q_kg_exact(spark, sf_dir)
    ann = resolved.select(
        F.concat(F.lit("doc:"), F.col("doc_id")).alias("subj"),
        F.lit("nsg:hasBody").alias("pred"),
        F.col("entity_id").alias("obj"),
    )
    docs = load_table(spark, "documents", sf_dir).select(
        F.concat(F.lit("doc:"), F.col("doc_id")).alias("subj"),
        F.lit("rdf:type").alias("pred"),
        F.lit("schema:Document").alias("obj"),
    )
    return ann.unionByName(docs).distinct()


def sql_kg_triples() -> str:
    inner = sql_kg_exact()
    return f"""WITH resolved AS ({inner})
SELECT DISTINCT 'doc:' || doc_id AS subj, 'nsg:hasBody' AS pred, entity_id AS obj FROM resolved
UNION
SELECT DISTINCT 'doc:' || doc_id AS subj, 'rdf:type' AS pred, 'schema:Document' AS obj FROM documents"""


def q_kg_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    alias = _alias(spark)
    edges = CC.sameas_edges(alias)
    nodes = alias.select("entity_id").distinct()
    return CC.connected_components(edges, nodes).orderBy("entity_id")


def sql_kg_canonical() -> str:
    return f"""WITH RECURSIVE dim AS (SELECT * FROM {dims.ontology_sql_values('d')}),
{_alias_cte()},
edges AS (
  SELECT DISTINCT a.entity_id AS a, b.entity_id AS b
  FROM alias_t a JOIN alias_t b ON a.alias = b.alias AND a.entity_id <> b.entity_id
),
reach(src, dst) AS (
  SELECT entity_id, entity_id FROM (SELECT DISTINCT entity_id FROM alias_t)
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT src AS entity_id, min(dst) AS canonical_id FROM reach GROUP BY src ORDER BY entity_id"""


# -------------------------------------------------------- relational queries

def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice — the reference's
    top-k-candidates-per-mention shape (SURVEY.md §2.6) on relational data."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def sql_window_topk() -> str:
    return """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
  FROM orders
) WHERE rn <= 3"""


def q_groupagg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape with DECIMAL-exact arithmetic for oracle parity."""
    li = load_table(spark, "lineitem", sf_dir)
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("decimal(30,2)").alias("sum_qty"),
            F.sum(price).cast("decimal(30,2)").alias("sum_base_price"),
            F.sum(price * (F.lit(1).cast("decimal(12,2)") - disc))
            .cast("decimal(30,4)")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def sql_groupagg_lineitem() -> str:
    return """SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(30,2)) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(30,2)) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
           (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(30,4)) AS sum_disc_price,
  count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the sorted distinct token set, with
    duplicate-group size (exact dedup on bag-of-words signature)."""
    docs = load_table(spark, "documents", sf_dir)
    fp = F.md5(F.array_join(F.sort_array(F.array_distinct(F.split(F.col("text"), " "))), " "))
    d = docs.select("doc_id", fp.alias("fp"))
    w = Window.partitionBy("fp")
    return d.withColumn("dup_count", F.count(F.lit(1)).over(w)).select(
        "doc_id", "fp", "dup_count"
    )


def sql_doc_fingerprint() -> str:
    return """WITH d AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
  FROM documents
)
SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS dup_count FROM d"""


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-quality scoring: token count, distinct ratio, stopword ratio,
    mean token length — per doc, all native exprs."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    stop = F.size(F.filter(toks, lambda w: w.isin("the", "a")))
    total_len = F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
    return docs.select(
        "doc_id",
        "lang",
        n.cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct"),
        (F.size(F.array_distinct(toks)) / n).cast("double").alias("distinct_ratio"),
        (stop / n).cast("double").alias("stopword_ratio"),
        (total_len / n).cast("double").alias("mean_token_len"),
    )


def sql_doc_token_stats() -> str:
    return """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, lang,
  CAST(len(toks) AS INT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio,
  CAST(len(list_filter(toks, w -> w IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stopword_ratio,
  CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE) / len(toks) AS mean_token_len
FROM d"""


def q_map_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DictionaryMapping rule application (forge.map) over the customer table:
    literal fallback, forge.format id minting, f-string, str method."""
    from nexus_forge_spark.functions import hjson
    from nexus_forge_spark.operators.mapping import ForgeContext, map_dataframe

    rules = hjson.loads(
        """
{
    type: Customer
    id: forge.format("identifier", "customers", x.c_custkey)
    name: x.c_name
    segment: x.c_mktsegment.lower()
    summary: f"{x.c_name} [{x.c_mktsegment}]"
}
"""
    )
    ctx = ForgeContext(formatters={"identifier": "https://kg.example.ch/{}/{}"})
    return map_dataframe(load_table(spark, "customer", sf_dir), rules, ctx)


def sql_map_customers() -> str:
    return """SELECT
  'Customer' AS type,
  'https://kg.example.ch/customers/' || CAST(c_custkey AS VARCHAR) AS id,
  c_name AS name,
  lower(c_mktsegment) AS segment,
  c_name || ' [' || c_mktsegment || ']' AS summary
FROM customer"""


QUERIES = {
    "kg_exact_resolve": (q_kg_exact, sql_kg_exact),
    "kg_exact_ci_resolve": (q_kg_exact_ci, sql_kg_exact_ci),
    "kg_fuzzy_best_resolve": (q_kg_fuzzy_best, sql_kg_fuzzy_best),
    "kg_fuzzy_all_resolve": (q_kg_fuzzy_all, sql_kg_fuzzy_all),
    "kg_triples": (q_kg_triples, sql_kg_triples),
    "kg_canonical": (q_kg_canonical, sql_kg_canonical),
    "window_topk_orders": (q_window_topk, sql_window_topk),
    "groupagg_lineitem": (q_groupagg_lineitem, sql_groupagg_lineitem),
    "map_customers": (q_map_customers, sql_map_customers),
    "doc_fingerprint": (q_doc_fingerprint, sql_doc_fingerprint),
    "doc_token_stats": (q_doc_token_stats, sql_doc_token_stats),
}
