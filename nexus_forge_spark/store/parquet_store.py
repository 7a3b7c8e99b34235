"""Versioned table store: the reference's Store CRUD re-expressed as
snapshot-versioned parquet (Iceberg semantics modelled locally).

Reference surface (kgforge/core/archetypes/store.py:38-311, DemoStore
in-memory semantics at specializations/stores/demo_store.py:141-326):

| reference              | here                                              |
|---|---|
| register (one/many)    | append; per-row conflict report (RegistrationError if id exists — demo_store.py:224-236) |
| update / _update_many  | MERGE by id, _rev bump (demo_store.py:244-262)    |
| deprecate              | soft flag + rev bump (demo_store.py:272-287)      |
| tag                    | name -> snapshot version (demo_store.py:289-297)  |
| retrieve(id, version)  | point lookup, versioned via snapshot time-travel (forge.py:626-645) |
| search(*filters)       | Filter DSL -> df.filter (operators/search.py)     |
| freeze                 | id -> versioned id rewrite (store.py:283-311)     |

Every mutating call produces a NEW snapshot directory (v1, v2, ...); tags
map names to snapshots; retrieve(version=N) reads snapshot N — this mirrors
Iceberg snapshot/tag time-travel with plain parquet.  On a real cluster the
same API binds to `writeTo(...).append()` / MERGE INTO / snapshot refs and
snapshots are metadata-only, not copies.

Bookkeeping columns (the reference's _store_metadata, resource.py:34):
``_rev`` (int, bumped per update), ``_deprecated`` (bool).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexus_forge_spark.operators.search import apply_filters

META_COLS = ["_rev", "_deprecated"]


class StoreError(Exception):
    pass


class ParquetStore:
    def __init__(self, spark: SparkSession, base_dir: str, id_col: str = "id"):
        self.spark = spark
        self.base_dir = base_dir
        self.id_col = id_col
        os.makedirs(base_dir, exist_ok=True)

    # ------------------------------------------------------------ snapshots

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.base_dir, "meta.json")

    def _meta(self) -> dict:
        if os.path.exists(self._meta_path):
            with open(self._meta_path, encoding="utf-8") as f:
                return json.load(f)
        return {"current": 0, "tags": {}}

    def _save_meta(self, meta: dict) -> None:
        with open(self._meta_path, "w", encoding="utf-8") as f:
            json.dump(meta, f)

    def current_version(self) -> int:
        return self._meta()["current"]

    def _snapshot_dir(self, version: int) -> str:
        return os.path.join(self.base_dir, f"v{version}")

    def _read(self, version: int | None = None) -> DataFrame:
        meta = self._meta()
        v = meta["current"] if version is None else version
        if v == 0:
            raise StoreError("store is empty")
        if v > meta["current"] or v < 1:
            raise StoreError(f"unknown version {v}")
        return self.spark.read.parquet(self._snapshot_dir(v))

    def _write_snapshot(self, df: DataFrame) -> int:
        meta = self._meta()
        v = meta["current"] + 1
        df.write.mode("overwrite").parquet(self._snapshot_dir(v))
        meta["current"] = v
        self._save_meta(meta)
        return v

    # ------------------------------------------------------------ CRUD

    def register(self, df: DataFrame) -> dict:
        """Append new records (_rev=1).  Rows whose id already exists are
        rejected per-row (RegistrationError semantics) and reported in the
        Actions-style counter (commons/actions.py:46-59)."""
        incoming = df.withColumn("_rev", F.lit(1)).withColumn(
            "_deprecated", F.lit(False)
        )
        meta = self._meta()
        if meta["current"] == 0:
            n = incoming.count()
            self._write_snapshot(incoming)
            return {"action": "register", "succeeded": n, "failed": 0}
        existing = self._read()
        ids = existing.select(self.id_col).distinct()
        ok = incoming.join(ids, self.id_col, "left_anti")
        n_ok = ok.count()
        n_fail = df.count() - n_ok
        if n_ok:
            self._write_snapshot(existing.unionByName(ok, allowMissingColumns=True))
        return {"action": "register", "succeeded": n_ok, "failed": n_fail}

    def update(self, df: DataFrame) -> dict:
        """MERGE by id: matched rows get the new payload with _rev+1;
        updating a non-existent id is a per-row failure (demo_store.py:249)."""
        existing = self._read()
        data_cols = [c for c in existing.columns if c not in META_COLS]
        inc = df.select(*[c for c in data_cols if c in df.columns]).alias("n")
        ex = existing.alias("e")
        matched = ex.join(inc, self.id_col, "inner")
        n_match = matched.count()
        n_fail = inc.count() - n_match
        updated = matched.select(
            *[F.col(f"n.{c}") if c in inc.columns else F.col(f"e.{c}") for c in data_cols if c != self.id_col],
            F.col(f"e.{self.id_col}"),
            (F.col("e._rev") + 1).alias("_rev"),
            F.col("e._deprecated"),
        ).select(*existing.columns)
        untouched = ex.join(inc.select(self.id_col), self.id_col, "left_anti").select(
            *existing.columns
        )
        self._write_snapshot(untouched.unionByName(updated))
        return {"action": "update", "succeeded": n_match, "failed": n_fail}

    def deprecate(self, ids: list) -> dict:
        """Soft-delete: _deprecated=true + rev bump (store.py:226-248)."""
        existing = self._read()
        hit = F.col(self.id_col).isin(ids)
        n = existing.where(hit & ~F.col("_deprecated")).count()
        out = existing.withColumn(
            "_rev", F.when(hit, F.col("_rev") + 1).otherwise(F.col("_rev"))
        ).withColumn(
            "_deprecated", F.when(hit, F.lit(True)).otherwise(F.col("_deprecated"))
        )
        self._write_snapshot(out)
        return {"action": "deprecate", "succeeded": n, "failed": len(ids) - n}

    # ------------------------------------------------------------ versioning

    def tag(self, name: str, version: int | None = None) -> None:
        meta = self._meta()
        v = meta["current"] if version is None else version
        if v < 1 or v > meta["current"]:
            raise StoreError(f"cannot tag unknown version {v}")
        meta["tags"][name] = v
        self._save_meta(meta)

    def retrieve(
        self,
        ids: list | object | None = None,
        version: int | None = None,
        tag: str | None = None,
    ) -> DataFrame:
        """Point lookup by id(s), optionally at a snapshot/tag (bulk retrieve
        is a join, not N requests — SURVEY.md S19)."""
        if tag is not None:
            meta = self._meta()
            if tag not in meta["tags"]:
                raise StoreError(f"unknown tag {tag!r}")
            version = meta["tags"][tag]
        df = self._read(version)
        if ids is None:
            return df
        if not isinstance(ids, (list, tuple)):
            ids = [ids]
        return df.where(F.col(self.id_col).isin(list(ids)))

    def search(self, *filters, limit: int | None = 100, offset: int = 0,
               distinct: bool = False, deprecated: bool = False) -> DataFrame:
        """Filter DSL search over the current snapshot; deprecated rows are
        excluded unless requested (bluebrain_nexus search defaults)."""
        df = self._read()
        if not deprecated:
            df = df.where(~F.col("_deprecated"))
        return apply_filters(df, *filters, limit=limit, offset=offset, distinct=distinct)

    def freeze(self, df: DataFrame, id_cols: list[str] | None = None) -> DataFrame:
        """Rewrite ids to versioned form id?_version=<rev> using the store's
        current revisions (store.py:283-311; versioned_id_template
        '{x.id}?_version={x._store_metadata.version}', tests/conftest.py:462)."""
        revs = self._read().select(
            F.col(self.id_col).alias("__fid"), F.col("_rev").alias("__frev")
        )
        out = df
        for c in id_cols or [self.id_col]:
            out = (
                out.join(F.broadcast(revs), out[c] == F.col("__fid"), "left")
                .withColumn(
                    c,
                    F.when(
                        F.col("__frev").isNotNull(),
                        F.concat(F.col(c), F.lit("?_version="), F.col("__frev")),
                    ).otherwise(F.col(c)),
                )
                .drop("__fid", "__frev")
            )
        return out
