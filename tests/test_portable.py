"""Portable-hash determinism contract (functions/portable.py): the
affine folding trick must equal plain modular arithmetic, and the three
implementations (Spark SQL expr, DuckDB SQL, Python/numpy) must agree
bit-for-bit — this is what makes the sketch/iterative operators
oracle-checkable at all."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from litebase_spark.functions.portable import (
    P61,
    affine_constants,
    affine_duck,
    affine_py,
    affine_spark,
    h60_duck,
    h60_py,
    h60_spark,
)


def _fold_py(x: int, a: int, b: int) -> int:
    t = a * (x >> 31)
    r1 = (t >> 30) + ((t & ((1 << 30) - 1)) << 31)
    return ((r1 + a * (x & ((1 << 31) - 1))) % P61 + b) % P61


@settings(max_examples=2000, deadline=None)
@given(
    x=st.integers(0, (1 << 61) - 1),
    a=st.integers(0, (1 << 31) - 1),
    b=st.integers(0, P61 - 1),
)
def test_affine_fold_equals_modular_reference(x, a, b):
    assert _fold_py(x, a, b) == affine_py(x, a, b)
    # every intermediate must stay under 2^63 (DuckDB raises on overflow)
    t = a * (x >> 31)
    r1 = (t >> 30) + ((t & ((1 << 30) - 1)) << 31)
    assert t < 2**63 and r1 < 2**63
    assert r1 + a * (x & ((1 << 31) - 1)) < 2**63


def test_affine_fold_numpy_uint64_matches():
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 1 << 60, size=5000, dtype=np.uint64)
    for a, b in affine_constants(8):
        av, bv = np.uint64(a), np.uint64(b)
        t = av * (xs >> np.uint64(31))
        r1 = (t >> np.uint64(30)) + (
            (t & np.uint64((1 << 30) - 1)) << np.uint64(31)
        )
        h = (
            (r1 + av * (xs & np.uint64((1 << 31) - 1))) % np.uint64(P61)
            + bv
        ) % np.uint64(P61)
        expect = [affine_py(int(x), a, b) for x in xs[:200]]
        assert h[:200].astype(object).tolist() == expect


def test_h60_and_affine_agree_across_engines(spark):
    samples = ["", "a", "abc def", "Zz9", "the quick brown fox", "0" * 50]
    a, b = affine_constants(3)[2]
    con = duckdb.connect()
    for s in samples:
        lit = "'" + s + "'"
        d_h, d_aff = con.execute(
            f"SELECT {h60_duck(lit)}, {affine_duck(h60_duck(lit), a, b)}"
        ).fetchone()
        row = spark.sql(
            f"SELECT {h60_spark(lit)} AS h,"
            f" {affine_spark(h60_spark(lit), a, b)} AS f"
        ).collect()[0]
        assert d_h == row["h"] == h60_py(s)
        assert d_aff == row["f"] == affine_py(h60_py(s), a, b)


def test_check_oracle_canon_is_type_strict():
    """The local gate must distinguish int from float (the driver's
    value hash does — round-1 func_math lesson) while treating Decimal
    as float and NaN as equal to itself."""
    import decimal
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "check_oracle", "tools/check_oracle.py"
    )
    mod = importlib.util.module_from_spec(spec)
    _sys.modules["check_oracle"] = mod
    spec.loader.exec_module(mod)
    canon = mod.canon_value
    assert canon(1) != canon(1.0)
    assert canon(True) == canon(1)
    assert canon(decimal.Decimal("1.5")) == canon(1.5)
    assert canon(float("nan")) == canon(float("nan"))
    assert canon([1, 2.0]) == (canon(1), canon(2.0))


def test_h60_fast_tri_engine_parity(spark):
    """The fast integer hash (no md5) is bit-identical across Spark,
    DuckDB and the Python twin on boundary + representative inputs."""
    import duckdb

    from litebase_spark.functions.portable import (
        P61,
        h60_fast_py,
        h60_fast_steps,
    )

    xs = [0, 1, 2, 7, 1000, 2**30 - 1, 2**30, 2**31 - 1, 2**31,
          2**43 + 12345, P61 - 1, 599999999999, 147236]
    con = duckdb.connect()
    for x in xs:
        expect = h60_fast_py(x)
        # duck: chained CTEs over a 1-row relation
        steps = h60_fast_steps("x", "duck")
        prev = f"(SELECT CAST({x} AS BIGINT) AS x)"
        sql = prev
        cols = "x"
        for alias, expr in steps:
            sql = f"(SELECT {cols}, {expr} AS {alias} FROM {sql} t)"
            cols += f", {alias}"
        d = con.execute(f"SELECT h FROM {sql} t2").fetchone()[0]
        # spark: same chain via selectExpr
        df = spark.sql(f"SELECT CAST({x} AS BIGINT) AS x")
        for alias, expr in h60_fast_steps("x", "spark"):
            df = df.selectExpr("*", f"{expr} AS {alias}")
        s = df.collect()[0]["h"]
        assert d == s == expect, (x, d, s, expect)
        assert 0 <= expect < (1 << 60)


def test_h60_fast_hll_accuracy_on_sequential_keys():
    """Sequential integer keys are the adversarial input for an affine
    hash family (an affine image of an arithmetic progression stays an
    arithmetic progression — a single round measured +53% NDV bias);
    the xor-mixed 3-round construction must keep the HLL-256 estimate
    within ~3x its nominal 6.5% rsd."""
    import math

    from litebase_spark.functions.portable import h60_fast_py

    for n in (1000, 20000, 150000):
        regs = {}
        for x in range(1, n + 1):
            h = h60_fast_py(x)
            idx, low = h >> 52, h & ((1 << 52) - 1)
            rho = 53 if low == 0 else 53 - low.bit_length()
            regs[idx] = max(regs.get(idx, 0), rho)
        m = 256
        sp = sum(1 << (53 - r) for r in regs.values())
        nr = len(regs)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / (
            (sp + (m - nr) * (1 << 53)) / float(1 << 53)
        )
        if est <= 2.5 * m and (m - nr) > 0:
            est = m * math.log(m / float(m - nr))
        assert abs(est - n) / n < 0.20, (n, est)
