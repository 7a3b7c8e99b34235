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


def test_layout_skip_audit_brute_force(spark):
    from nexus_forge_spark.functions.layout import layout_skip_audit

    # 32x32 grid of points, one per (x, y)
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    preds = [
        (1, 0, 31, 0, 7),    # y-only slab: zorder should prune, xsort can't
        (2, 0, 7, 0, 31),    # x-only slab: both layouts prune
        (3, 4, 11, 4, 11),   # small box
        (4, 0, 31, 0, 31),   # full domain: nobody skips anything
    ]
    bits, cell_bits = 10, 4  # 16 files per layout
    out = {
        (r.layout, r.pred_id): r
        for r in layout_skip_audit(df, "x", "y", preds, bits, cell_bits).collect()
    }

    # brute-force recompute of both layouts' extents and the skip rule
    def norm(v):
        return v * (1 << bits) // 32

    def morton(xn, yn):
        z = 0
        for b in range(bits):
            z |= ((xn >> b) & 1) << (2 * b + 1) | ((yn >> b) & 1) << (2 * b)
        return z

    cells = {"zorder": {}, "xsort": {}}
    for x, y in rows:
        xn, yn = norm(x), norm(y)
        for layout, c in (
            ("zorder", morton(xn, yn) >> (2 * bits - cell_bits)),
            ("xsort", xn >> (bits - cell_bits)),
        ):
            e = cells[layout].setdefault(c, [10**9, -1, 10**9, -1, 0])
            e[0], e[1] = min(e[0], x), max(e[1], x)
            e[2], e[3] = min(e[2], y), max(e[3], y)
            e[4] += 1
    for layout in ("zorder", "xsort"):
        for pid, xlo, xhi, ylo, yhi in preds:
            scanned = [
                e
                for e in cells[layout].values()
                if not (e[1] < xlo or e[0] > xhi or e[3] < ylo or e[2] > yhi)
            ]
            r = out[(layout, pid)]
            assert r.n_files == len(cells[layout])
            assert r.n_scanned == len(scanned), (layout, pid)
            assert r.rows_scanned == sum(e[4] for e in scanned)
            assert r.scan_ppm == len(scanned) * 1_000_000 // len(cells[layout])
    # the headline: a y-only filter prunes under zorder, not under xsort
    assert out[("zorder", 1)].n_scanned < out[("zorder", 1)].n_files
    assert out[("xsort", 1)].n_scanned == out[("xsort", 1)].n_files
    # and the full-domain predicate scans everything everywhere
    assert out[("zorder", 4)].scan_ppm == 1_000_000


def test_compaction_plan_properties(spark):
    from nexus_forge_spark.functions.layout import compaction_plan

    t = 100
    rows = [
        ("p1", 1, 150),  # already compact -> alone
        ("p1", 2, 60), ("p1", 3, 55), ("p1", 4, 40), ("p1", 5, 10),
        ("p2", 6, 30), ("p2", 7, 20),
    ]
    files = spark.createDataFrame(rows, "part_key string, file_id long, bytes long")
    out = compaction_plan(files, t).collect()
    by_file = {(r.part_key, r.file_id): r for r in out}
    assert len(out) == len(rows)
    # a file at/above target sits alone and is flagged
    big = by_file[("p1", 1)]
    assert big.already_compact and big.grp_files == 1 and big.grp_bytes == 150
    # groups partition the cumulative byte line: group count per
    # partition == ceil(total_bytes / target) — the rewrite-task budget
    groups = {}
    totals = {}
    for r in out:
        groups.setdefault((r.part_key, r.grp), []).append(r)
        totals[r.part_key] = totals.get(r.part_key, 0) + r.bytes
    for pk, tot in totals.items():
        n_groups = len({g for p, g in groups if p == pk})
        assert n_groups == -(-tot // t), pk
    for members in groups.values():
        assert members[0].grp_bytes == sum(m.bytes for m in members)
        assert members[0].grp_files == len(members)
    # deterministic: second run identical
    again = compaction_plan(files, t).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
