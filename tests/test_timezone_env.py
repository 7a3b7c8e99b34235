"""Environment-proofing: contract queries must be session-timezone
independent.

The round-2 driver red cell `cube_revenue` was calendar math over a
TIMESTAMP column evaluated on a non-UTC driver session: every midnight
timestamp shifts a day, first-of-month rows change month, and revenue
redistributes across the same row count.  sources.load_table now pins
``spark.sql.session.timeZone=UTC`` on whatever session runs the query —
these tests prove (a) the hazard is real without the pin and (b) the
calendar-sensitive contract queries are bit-identical across session
timezones with it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

# the contract queries whose math touches a calendar function over a
# TIMESTAMP/DATE column (the class VERDICT.md r2 called out)
CALENDAR_QUERIES = [
    "cube_revenue",
    "cohort_retention",
    "funnel_events",
    "sessionize_events",
    "rolling_revenue",
]


def _rows_hash(df):
    import hashlib

    cols = sorted(df.columns)
    lines = sorted(
        "|".join(repr(r[c]) for c in cols) for r in df.collect()
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def test_month_over_timestamp_is_tz_dependent_without_pin(spark):
    # Guard: proves the hazard load_table's pin defends against is REAL.
    # If Spark ever makes month() tz-free this test will flag the pin as
    # obsolete rather than silently keeping dead code.
    df = spark.createDataFrame(
        [("2024-03-01 00:00:00",)], "ts_str string"
    ).select(F.to_timestamp("ts_str").alias("ts"))
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        m_utc = df.select(F.month("ts")).collect()[0][0]
        # parquet round-trip so the stored instant is fixed, then read it
        # back under a shifted session — month() moves
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            df.write.mode("overwrite").parquet(d + "/t")
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            m_ny = spark.read.parquet(d + "/t").select(F.month("ts")).collect()[0][0]
        assert (m_utc, m_ny) == (3, 2)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.mark.parametrize("name", CALENDAR_QUERIES)
def test_calendar_query_identical_across_session_timezones(spark, name):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()[name]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        h_ny = _rows_hash(fn(spark, SF_DIR))
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
        h_ktm = _rows_hash(fn(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert h_ny == h_ktm


def test_load_table_pins_utc(spark):
    from nexus_forge_spark.sources import load_table

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        load_table(spark, "documents", SF_DIR)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
