"""Engine-portable deterministic hashing: identical 64-bit results from
Spark SQL expressions, DuckDB SQL, and Python.

Why: the round-1 rows-only queries (minhash/simhash/HLL) were unverifiable
because they hashed with JVM xxhash64 / DataSketches, which the DuckDB
oracle cannot reproduce.  Everything here is built from md5 — available
and bit-identical in both engines — so sketch-based operators become
oracle-EXACT, not just "close":

  * ``H60``: the first 15 hex chars of md5(x) parsed as a 60-bit int.
      Spark:  CAST(CONV(SUBSTR(MD5(x),1,15),16,10) AS BIGINT)
      DuckDB: CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)
  * affine family over the Mersenne prime p = 2^61-1:
      h_i(x) = (a_i * H60(x) + b_i) mod p
    computed in DECIMAL(30,0) on Spark and HUGEINT on DuckDB — exact
    integer arithmetic, no 64-bit overflow ambiguity (Spark wraps, DuckDB
    raises; neither is portable, so we stay under the modulus).
  * a deterministic HyperLogLog (m=256 registers, 52-bit rank domain)
    whose register state AND estimate are exact integers / single-op
    doubles — order-independent, hence bit-identical across engines.

The reference's own telemetry uses approximate percentiles but its SQL
surface has no sketches at all (SURVEY §2.B aggregation gap); these are
beyond-parity scale operators made differentially testable.
"""

from __future__ import annotations

import hashlib
import math

P61 = (1 << 61) - 1  # Mersenne prime modulus for the affine hash family
MASK52 = (1 << 52) - 1  # HLL rank domain: low 52 bits of H60
HLL_M = 256  # HLL registers (8 index bits: 60 = 8 + 52)

# alpha_m * m^2 * 2^53 — the HLL raw-estimate numerator, precomputed so
# the estimate is ONE double division of exact integers in both engines.
_ALPHA_256 = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_NUMERATOR = repr(_ALPHA_256 * (HLL_M**2) * float(1 << 53))

# Linear-counting branch (raw estimate <= 2.5m with V empty registers:
# est = m * ln(m/V)). JVM Math.log and libm log disagree by 1 ulp on
# 18 of the 256 possible inputs, so instead of evaluating ln in-engine
# we embed the full 256-entry result table as double literals — pure
# constants parse to identical doubles everywhere.
_HLL_LC = [repr(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M + 1)]


def hll_estimate_spark(s_present: str, n_reg: str) -> str:
    """Spark SQL expr: HLL estimate from the scaled integer register sum
    `s_present` (sum of 2^(53-M_j) over present registers) and the
    present-register count `n_reg`."""
    s_scaled = f"({s_present} + ({HLL_M} - {n_reg}) * {1 << 53})"
    raw = f"({HLL_NUMERATOR} / {s_scaled})"
    v = f"({HLL_M} - {n_reg})"
    table = "array(%s)" % ", ".join(_HLL_LC)
    return (
        f"CASE WHEN {raw} <= {2.5 * HLL_M} AND {v} > 0"
        f" THEN element_at({table}, CAST({v} AS INT)) ELSE {raw} END"
    )


def hll_estimate_duck(s_present: str, n_reg: str) -> str:
    """DuckDB twin of hll_estimate_spark (bit-identical output)."""
    s_scaled = f"({s_present} + ({HLL_M} - {n_reg}) * (1::BIGINT << 53))"
    # DuckDB parses bare decimal literals as DECIMAL and would re-round;
    # route every double constant through a VARCHAR->DOUBLE cast, which
    # is correctly rounded (same as Spark's literal parse).
    raw = f"('{HLL_NUMERATOR}'::DOUBLE / {s_scaled})"
    v = f"({HLL_M} - {n_reg})"
    table = "([%s]::DOUBLE[])" % ", ".join(f"'{x}'" for x in _HLL_LC)
    return (
        f"CASE WHEN {raw} <= {2.5 * HLL_M} AND {v} > 0"
        f" THEN {table}[CAST({v} AS INT)] ELSE {raw} END"
    )


def _const(tag: str, i: int, mod: int) -> int:
    return int(hashlib.md5(f"{tag}{i}".encode()).hexdigest()[:15], 16) % mod


def affine_constants(n: int) -> list[tuple[int, int]]:
    """n fixed (a_i, b_i) pairs; a_i odd and < 2^31 so a*x fits in 91 bits
    (DECIMAL(30,0) / HUGEINT safe)."""
    return [
        (_const("a", i, 1 << 31) | 1, _const("b", i, P61)) for i in range(n)
    ]


# --- Spark SQL expression fragments (strings for F.expr) ----------------


def h60_spark(x: str) -> str:
    return f"CAST(CONV(SUBSTR(MD5({x}), 1, 15), 16, 10) AS BIGINT)"


def _affine_mulmod(x: str, a: int, b: int) -> str:
    """(a*x + b) mod p as pure int64 ops (identical syntax/semantics in
    Spark SQL and DuckDB: positive operands, % is plain remainder).

    a < 2^31 and x < 2^61 would overflow 64-bit multiplication — Spark
    silently wraps, DuckDB raises, neither is portable — so split x and
    fold with 2^61 === 1 (mod p):
        t  = a * (x >> 31)                      < 2^61
        r1 = (t >> 30) + ((t & (2^30-1)) << 31)   === t * 2^31 (mod p)
        h  = ((r1 + a * (x & (2^31-1))) % p + b) % p
    Every intermediate stays under 2^63 (max ~6.9e18 before the first
    mod). ~10 primitive long ops per hash — stays inside whole-stage
    codegen, ~10x faster than the exact-DECIMAL form it replaced.
    """
    t = f"({a} * ({x} >> 31))"
    r1 = f"(({t} >> 30) + (({t} & {(1 << 30) - 1}) << 31))"
    return f"((({r1} + {a} * ({x} & {(1 << 31) - 1})) % {P61} + {b}) % {P61})"


def affine_spark(x: str, a: int, b: int) -> str:
    """(a*x + b) mod p; x must be a BIGINT expr in [0, 2^61)."""
    return _affine_mulmod(x, a, b)


# --- DuckDB SQL fragments ----------------------------------------------


def h60_duck(x: str) -> str:
    return f"CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


def affine_duck(x: str, a: int, b: int) -> str:
    return _affine_mulmod(x, a, b)


# --- Fast portable 60-bit hash (integer inputs, no md5) -----------------
#
# h60_*(CAST(x AS VARCHAR)) pays an md5 per row — fine for string keys,
# ~10x too slow when hashing a 6M-row BIGINT column just to estimate
# NDV. This family is pure int64 arithmetic (the _affine_mulmod ops plus
# xor), identical bit-for-bit in Spark and DuckDB, and stays inside
# whole-stage codegen. A single affine round is useless for HLL on
# SEQUENTIAL keys (an affine image of an arithmetic progression is an
# arithmetic progression — measured +53% NDV bias on l_orderkey); the
# two xors between rounds break affinity and bring the error back to
# HLL-256's nominal ~6.5% rsd (measured -6.6%..+3.3% on the TPC-H key
# columns).
#
# Emitted as CHAINED PROJECTION STEPS, not one nested expression: each
# _affine_mulmod references its input ~4x, so three nested rounds would
# blow the expression tree up ~64x; a step list keeps both the Spark
# plan and the oracle CTE linear.

H60F_CONSTS = [
    (_const("h60f_a", i, 1 << 31) | 1, _const("h60f_b", i, P61))
    for i in range(3)
]


def h60_fast_steps(x: str, dialect: str) -> list[tuple[str, str]]:
    """Steps [(alias, expr), ...] computing the fast portable 60-bit
    hash of the NON-NEGATIVE BIGINT expr `x`; each expr may reference
    earlier aliases, the last alias is 'h' in [0, 2^60). dialect is
    'spark' or 'duck' (xor syntax differs: `^` vs xor())."""
    if dialect == "spark":
        def xor(a, b):
            return f"({a} ^ {b})"
    elif dialect == "duck":
        def xor(a, b):
            return f"xor({a}, {b})"
    else:  # pragma: no cover
        raise ValueError(dialect)
    (a1, b1), (a2, b2), (a3, b3) = H60F_CONSTS
    return [
        ("__h1", _affine_mulmod(f"(({x}) % {P61})", a1, b1)),
        ("__h2", _affine_mulmod("__h1", a2, b2)),
        ("__g", xor("__h1", "__h2")),
        ("__h3", _affine_mulmod("__g", a3, b3)),
        ("h", f"({xor('__h3', '(__g >> 29)')} % {1 << 60})"),
    ]


def h60_fast_py(x: int) -> int:
    """Python twin of h60_fast_steps (tests / kernels)."""
    (a1, b1), (a2, b2), (a3, b3) = H60F_CONSTS

    def aff(v, a, b):
        t = a * (v >> 31)
        r1 = (t >> 30) + ((t & ((1 << 30) - 1)) << 31)
        return ((r1 + a * (v & ((1 << 31) - 1))) % P61 + b) % P61

    h1 = aff(x % P61, a1, b1)
    h2 = aff(h1, a2, b2)
    g = h1 ^ h2
    h3 = aff(g, a3, b3)
    return (h3 ^ (g >> 29)) % (1 << 60)


# --- Deterministic random hyperplanes (LSH / sketch operators) ----------
#
# Component (p, i) of plane p is (H60("p,i") % 1000003) / 500001.5 - 1.0
# — computed HERE in Python and embedded as double literals in both
# engines, so no in-engine hashing at all: the Spark plan carries a
# constant array (map-only, constant-folded) and the DuckDB oracle the
# identical constants (as VARCHAR->DOUBLE casts; DuckDB would parse bare
# decimal literals as DECIMAL and re-round).


def plane_components(n_planes: int, dim: int) -> list[list[float]]:
    return [
        [
            (int(hashlib.md5(f"{p},{i}".encode()).hexdigest()[:15], 16)
             % 1000003) / 500001.5 - 1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def plane_duck(plane: list[float]) -> str:
    """One plane as a DuckDB DOUBLE[] literal (string-cast, see above)."""
    return "([%s]::DOUBLE[])" % ", ".join(f"'{x!r}'" for x in plane)


# --- Python (numpy-free scalar; for tests / UDF kernels) ----------------


def h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def affine_py(x: int, a: int, b: int) -> int:
    return (a * x + b) % P61
