"""Registry integrity after the family split (round-3 VERDICT ask #8):
same query names, both import paths serve the SAME function objects, no
rename (the driver keys on names)."""

from __future__ import annotations


def test_registry_names_and_both_import_paths():
    from nexus_forge_spark.plans import driver_queries as dq
    from nexus_forge_spark.plans import (
        queries_dedup,
        queries_er,
        queries_events,
        queries_graph,
        queries_kg,
        queries_misc,
        queries_text,
    )

    mods = [
        queries_kg, queries_er, queries_dedup, queries_events,
        queries_graph, queries_text, queries_misc,
    ]
    assert len(dq.QUERIES) >= 282
    # every registry entry resolves to the same object via its family
    # module (the aggregator injects the union namespace everywhere)
    for name, (qf, sqlf) in dq.QUERIES.items():
        owner = [m for m in mods if qf.__name__ in vars(m)]
        assert owner, f"{name}: q fn not found in any family module"
        assert getattr(dq, qf.__name__) is qf
        if sqlf is not None:
            assert getattr(dq, sqlf.__name__) is sqlf
    # cross-family call-time references resolve: every family module's
    # globals contain the full q_/sql_ union
    union = {
        k for m in mods for k in vars(m) if k.startswith(("q_", "sql_"))
    }
    for m in mods:
        assert union <= set(vars(m))


def test_shared_helpers_reexported_from_aggregator():
    # tests and tools import helpers through the original module path
    from nexus_forge_spark.plans.driver_queries import (  # noqa: F401
        _bl_case,
        _docs_with_mutants,
        _lnq,
        _lnq30_unrolled_ctes,
        _q30_div_portable,
        load_table,
    )


def test_every_oracle_renders():
    from nexus_forge_spark.plans import driver_queries as dq

    n = 0
    for name, (_qf, sqlf) in dq.QUERIES.items():
        if sqlf is None:
            continue
        s = sqlf()
        assert isinstance(s, str) and len(s) > 40, name
        n += 1
    assert n >= 276
