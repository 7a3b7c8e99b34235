"""Morton z-order layout: interleave correctness and the two-dimension
extent-bounding property the layout exists for (zorder_layout query)."""

from pyspark.sql import functions as F

from nexus_forge_spark.functions.layout import morton_code, normalize_to_bits


def _morton_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


def test_morton_code_matches_reference_bits(spark):
    import random

    rng = random.Random(3)
    pts = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(200)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = df.select(
        "x", "y", morton_code(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in got:
        assert r.z == _morton_py(r.x, r.y)


def test_normalize_to_bits_exact_bounds(spark):
    df = spark.createDataFrame([(i,) for i in range(100, 200)], "v long")
    out = [
        r.b
        for r in df.select(
            normalize_to_bits(F.col("v"), 100, 100, bits=4).alias("b")
        ).collect()
    ]
    assert min(out) == 0 and max(out) == 15
    assert out == sorted(out)  # monotone
    # truncating: each of the 16 cells gets at least 6 of the 100 values
    from collections import Counter

    assert all(c >= 6 for c in Counter(out).values())


def test_zorder_buckets_bound_both_dimensions(spark):
    # uniform 64x64 grid; 16-bit normalize + top-8-bit buckets = 256
    # quadtree cells -> each cell must span at most 1/16 of EACH axis
    # (the property one-key sorting cannot give the second key)
    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x long, y long")
    xn = normalize_to_bits(F.col("x"), 0, 64)
    yn = normalize_to_bits(F.col("y"), 0, 64)
    z = morton_code(xn, yn)
    cells = (
        df.select("x", "y", F.shiftrightunsigned(z, 24).alias("b"))
        .groupBy("b")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    assert len(cells) == 256
    assert all(c.xs <= 3 and c.ys <= 3 for c in cells)
