"""Bench/driver contract consistency: every name bench.py and the
replica tools reference must exist in the registry, every registry
entry must surface through the driver contract, and the oracle map
stays a subset of queries() (the driver asserts the same)."""

from __future__ import annotations


def test_headline_subset_of_registry():
    import litebase_spark.operators  # noqa: F401
    from bench import HEADLINE
    from litebase_spark.catalog import REGISTRY

    missing = [n for n in HEADLINE if n not in REGISTRY]
    assert not missing, missing
    assert len(set(HEADLINE)) == len(HEADLINE), "duplicate headline names"


def test_replica_tool_names_exist():
    import litebase_spark.operators  # noqa: F401
    from litebase_spark.catalog import REGISTRY
    from tools.bench_sf1 import _EXCLUDE
    from tools.scale_stress import QUERIES

    assert all(n in REGISTRY for n in QUERIES)
    assert all(n in REGISTRY for n in _EXCLUDE)


def test_driver_contract_shape():
    import __spark_entry__ as entry_mod
    import litebase_spark.operators  # noqa: F401
    from litebase_spark.catalog import REGISTRY

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(qs) == set(REGISTRY)
    assert set(oracles) <= set(qs)
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())
