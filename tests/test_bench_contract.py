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


def test_driver_line_fits_at_200_queries():
    """Round-7 regression: at 78 headline queries the stdout line outgrew
    the driver's 2000-byte tail after key-shedding ran dry -> parsed:null.
    The formatter must now fall back to a summary form that always fits."""
    import json

    from bench import format_driver_line

    result = {
        "metric": "headline_query_set_total",
        "value": 123.456,
        "unit": "sec",
        "queries": {f"synthetic_query_name_{i:03d}": round(i * 0.173, 2)
                    for i in range(200)},
        "sf": 0.1,
        "cold_total": 321.0,
        "floor": 0.25,
        "load15": 0.87,
        "net_of_floor": 90.0,
        "duckdb_baseline": {f"synthetic_query_name_{i:03d}": 0.1
                            for i in range(200)},
    }
    line = format_driver_line(result)
    assert len(line) <= 1950, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_query_set_total"
    assert parsed["value"] == 123.456
    assert parsed["n_queries"] == 200
    assert len(parsed["worst"]) == 5
    assert parsed["detail"] == "BENCH_FULL.json"
    # the machine-condition keys survive every shed (round-8 verdict:
    # the artifact must certify its own conditions)
    assert parsed["floor"] == 0.25
    assert parsed["load15"] == 0.87
    # worst really are the slowest
    assert all(v >= 0.173 * 194 - 1 for v in parsed["worst"].values())


def test_loadavg_reader_and_busy_gate():
    from bench import BUSY_LOAD15, read_loadavg

    l1, l5, l15 = read_loadavg()
    assert all(isinstance(v, float) and v >= 0.0 for v in (l1, l5, l15))
    assert BUSY_LOAD15 > 0


def test_driver_line_keeps_full_map_when_small():
    import json

    from bench import format_driver_line

    result = {
        "metric": "headline_query_set_total",
        "value": 1.0,
        "unit": "sec",
        "queries": {"q1": 0.5, "q2": 0.5},
        "sf": 0.01,
        "floor": 0.1,
    }
    parsed = json.loads(format_driver_line(result))
    assert parsed["queries"] == {"q1": 0.5, "q2": 0.5}
    assert "worst" not in parsed


def test_shuffle_partition_default_tracks_core_env():
    """r13: the driver re-runs the bench at a lower $SPARK_GRAFT_CPUS to
    measure scaling; the shuffle-partition default must track that env
    (a constant tuned to one machine's cores is the local-mode-constant
    anti-pattern), with the explicit env override winning."""
    from litebase_spark.session import _default_shuffle_partitions

    assert _default_shuffle_partitions("32", None) == 32
    assert _default_shuffle_partitions("8", None) == 8
    assert _default_shuffle_partitions("8", "48") == 48
    import os

    assert _default_shuffle_partitions("*", None) == (os.cpu_count() or 8)
