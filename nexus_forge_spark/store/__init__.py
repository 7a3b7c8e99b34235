from nexus_forge_spark.store.parquet_store import ParquetStore  # noqa: F401
