"""Horn-rule mining over the materialized triple set (AMIE family).

The reference constructs triples (forge.map -> as_graph,
kgforge/core/conversions/rdf.py:275-312) but never mines the schema-level
regularities a KG-construction pipeline uses to propose new predicates,
detect redundant extractors, and sanity-check link-prediction targets.
This operator mines closed chain rules of length 2 —

    head(x, z)  <=  p1(x, y) AND p2(y, z)

— with AMIE's two confidence denominators (Galarraga et al., WWW'13;
public algorithm, re-derived here as pure integer-ppm dataflow):
standard confidence divides rule support by the body extension size, PCA
confidence divides by the body pairs whose subject asserts the head
predicate AT ALL (the partial-completeness assumption that makes
open-world KGs mineable).

Scale shape: ONE self-join on the connector entity produces the distinct
body extension; every aggregate afterwards is keyed on a predicate pair
(a vocabulary-sized key space, thousands not billions), so all reduction
is map-side combinable.  The self-join's hazard at 10^12 triples is hub
connectors (an entity with 10^6 in-edges x 10^6 out-edges materializes
10^12 body pairs on its own); ``hub_cap`` bounds the per-connector
in-degree x out-degree product and drops offenders BEFORE the join —
the standard AMIE-at-scale mitigation, priced openly: dropped hubs lower
recall of rules routed through celebrity entities, never correctness of
the confidences over the kept extension (the oracle applies the identical
cap).  No windows, no driver collection; distinct-before-aggregate keeps
duplicate assertions from double-counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def mine_chain_rules(
    triples: DataFrame,
    min_support: int = 2,
    hub_cap: int | None = None,
) -> DataFrame:
    """triples(subj, pred, obj) -> one row per mined rule
    (p1, p2, head_pred, support, body_size, pca_body, conf_ppm,
    pca_conf_ppm).

    Semantics (all counts over DISTINCT bindings):
    * body extension  = distinct (p1, p2, x, z) with p1(x,y), p2(y,z),
      x <> z, and no self-loop atoms (x <> y, y <> z) — degenerate
      bindings would let a single fact support its own rule;
    * support         = body pairs where head(x, z) is a fact;
    * body_size       = |body extension| per (p1, p2);
    * pca_body        = body pairs whose x has ANY head_pred fact;
    * conf_ppm        = support * 1e6 DIV body_size (floor);
    * pca_conf_ppm    = support * 1e6 DIV pca_body (floor).
    Rules below ``min_support`` are dropped.  With ``hub_cap`` set,
    connector entities y whose (in-degree x out-degree) product exceeds
    the cap are excluded from body generation.
    """
    t = triples.select("subj", "pred", "obj").where(
        F.col("subj") != F.col("obj")
    ).distinct()
    left = t.select(
        F.col("pred").alias("p1"), F.col("subj").alias("x"), F.col("obj").alias("y")
    )
    right = t.select(
        F.col("subj").alias("y"), F.col("pred").alias("p2"), F.col("obj").alias("z")
    )
    if hub_cap is not None:
        deg = (
            t.select(F.col("obj").alias("y"), F.lit(1).alias("i"), F.lit(0).alias("o"))
            .unionByName(
                t.select(
                    F.col("subj").alias("y"), F.lit(0).alias("i"), F.lit(1).alias("o")
                )
            )
            .groupBy("y")
            .agg(F.sum("i").alias("deg_in"), F.sum("o").alias("deg_out"))
            .where(F.col("deg_in") * F.col("deg_out") <= F.lit(hub_cap))
            .select("y")
        )
        left = left.join(deg, "y")
    body = (
        left.join(right, "y")
        .where(F.col("x") != F.col("z"))
        .select("p1", "p2", "x", "z")
        .distinct()
    )
    body_size = body.groupBy("p1", "p2").agg(F.count(F.lit(1)).alias("body_size"))
    heads = t.select(
        F.col("subj").alias("x"), F.col("pred").alias("head_pred"), F.col("obj").alias("z")
    )
    support = (
        body.join(heads, ["x", "z"])
        .groupBy("p1", "p2", "head_pred")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= F.lit(min_support))
    )
    head_subj = t.select(
        F.col("subj").alias("x"), F.col("pred").alias("head_pred")
    ).distinct()
    pca = (
        body.join(head_subj, "x")
        .groupBy("p1", "p2", "head_pred")
        .agg(F.count(F.lit(1)).alias("pca_body"))
    )
    return (
        support.join(body_size, ["p1", "p2"])
        .join(pca, ["p1", "p2", "head_pred"])
        .select(
            "p1",
            "p2",
            "head_pred",
            F.col("support").cast("long").alias("support"),
            F.col("body_size").cast("long").alias("body_size"),
            F.col("pca_body").cast("long").alias("pca_body"),
            F.expr(f"support * {PPM} DIV body_size").cast("long").alias("conf_ppm"),
            F.expr(f"support * {PPM} DIV pca_body").cast("long").alias("pca_conf_ppm"),
        )
    )


def sql_mine_chain_rules(
    triples_sql: str, min_support: int = 2, hub_cap: int | None = None
) -> str:
    """DuckDB oracle: identical semantics over triples_sql -> (subj, pred,
    obj)."""
    hub_cte = ""
    hub_join = ""
    if hub_cap is not None:
        hub_cte = f""",
deg AS (
  SELECT y FROM (
    SELECT y, sum(i) AS deg_in, sum(o) AS deg_out FROM (
      SELECT obj AS y, 1 AS i, 0 AS o FROM t
      UNION ALL
      SELECT subj AS y, 0 AS i, 1 AS o FROM t
    ) GROUP BY y
  ) WHERE deg_in * deg_out <= {hub_cap}
)"""
        hub_join = "JOIN deg d ON t1.obj = d.y\n  "
    return f"""WITH t AS MATERIALIZED (
  SELECT DISTINCT subj, pred, obj FROM ({triples_sql}) WHERE subj <> obj
){hub_cte},
body AS MATERIALIZED (
  SELECT DISTINCT t1.pred AS p1, t2.pred AS p2, t1.subj AS x, t2.obj AS z
  FROM t t1 JOIN t t2 ON t1.obj = t2.subj
  {hub_join}WHERE t1.subj <> t2.obj
),
body_size AS (
  SELECT p1, p2, count(*) AS body_size FROM body GROUP BY p1, p2
),
support AS (
  SELECT b.p1, b.p2, h.pred AS head_pred, count(*) AS support
  FROM body b JOIN t h ON h.subj = b.x AND h.obj = b.z
  GROUP BY b.p1, b.p2, h.pred
  HAVING count(*) >= {min_support}
),
pca AS (
  SELECT b.p1, b.p2, hs.head_pred, count(*) AS pca_body
  FROM body b JOIN (SELECT DISTINCT subj AS x, pred AS head_pred FROM t) hs
    ON hs.x = b.x
  GROUP BY b.p1, b.p2, hs.head_pred
)
SELECT s.p1, s.p2, s.head_pred,
       CAST(s.support AS BIGINT) AS support,
       CAST(bs.body_size AS BIGINT) AS body_size,
       CAST(p.pca_body AS BIGINT) AS pca_body,
       CAST(s.support * {PPM} // bs.body_size AS BIGINT) AS conf_ppm,
       CAST(s.support * {PPM} // p.pca_body AS BIGINT) AS pca_conf_ppm
FROM support s
JOIN body_size bs ON s.p1 = bs.p1 AND s.p2 = bs.p2
JOIN pca p ON s.p1 = p.p1 AND s.p2 = p.p2 AND s.head_pred = p.head_pred"""
