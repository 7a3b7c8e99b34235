"""Multi-dimensional data layout: Morton (z-order) interleaving.

Why this exists at 100 TB: parquet/Iceberg readers prune row groups by
min/max column statistics, but a table sorted on ONE key has unbounded
extents on every OTHER key — a filter on the second dimension scans
everything.  Interleaving the bits of two keys into one z-code and
range-partitioning/sorting on it bounds BOTH dimensions per file/row
group (each z-code prefix is a quadtree cell), so two-dimensional
filters prune on both axes.  This is the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER, re-expressed as plain Column algebra.

Engine-exactness: normalization is the same integer formula as
profile.numeric_histogram ((v - lo) * 2^bits div span, truncating), and
the interleave is an unrolled shift/mask/or chain — one whole-stage
codegen projection on Spark, the identical arithmetic on any SQL engine.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_to_bits(col: Column, lo: int, span: int, bits: int = 16) -> Column:
    """Map an integer column with known [lo, lo+span) range onto
    [0, 2^bits) with truncating-integer arithmetic (engine-exact; see
    numeric_histogram for why floats mis-bin).  The quotient is computed
    as (num - num % span) / span: the numerator is then an exact
    multiple of span below 2^53, and correctly-rounded IEEE division of
    an exact multiple returns the exact integer — no div operator exists
    on the Column API, and this form never mis-rounds."""
    num = (col - F.lit(lo)) * F.lit(1 << bits)
    q = ((num - num % F.lit(span)) / F.lit(span)).cast("long")
    return F.least(F.lit((1 << bits) - 1), q)


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into one z-code (x in the odd positions, y in the even), so
    lexicographic order on the result is z-order over (x, y).  Unrolled
    to 2*bits shift/mask/or terms — a single codegen projection, no UDF.
    The SQL translation is the same expression (``morton_sql``).
    """
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(
                F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
        terms.append(
            F.shiftleft(F.shiftrightunsigned(y, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), terms).cast("long")


def morton_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical interleave as ANSI-ish SQL (DuckDB dialect bit ops)
    for differential oracles."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def normalize_sql(col: str, lo: str, span: str, bits: int = 16) -> str:
    """lo/span are SQL expressions (e.g. scalar-CTE column references)."""
    return f"least({(1 << bits) - 1}, (({col} - {lo}) * {1 << bits}) // ({span}))"
