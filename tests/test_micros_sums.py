"""Property tests for the hi/lo integer-micros exact-sum algebra
(rstreams_spark/queries/tpch.py::_msum_parts/_mround/_mtot_d ↔
queries/_util.py::sql_msum/sql_mtot — CLAUDE.md invariant 2's fast
form). Three layers:

1. pure-Python model: the double-repr hi/lo split recovers the exact
   decimal micros for ANY ≤6dp-exact value in the documented |x|≲1e9
   domain (signed, including values that are integers, half-cents,
   and subunit fractions);
2. the rounding algebra H·10^nd + (L + d/2) div d equals decimal
   round-half-toward-+inf of the exact total, for signed totals;
3. engine cross-check: DuckDB evaluating sql_msum/sql_mtot over the
   same doubles reproduces the model bit-for-bit (the Spark side is
   covered end-to-end by the oracle gate on 17 catalog queries).
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rstreams_spark.queries._util import sql_msum, sql_mtot

# ≤6dp-exact values as doubles: scaled integers over the full signed
# domain the guard admits (|x| < 1e9 units — invariant 19's domain
# bound rejects the 1e9 boundary itself on both engines)
micros_int = st.integers(min_value=-(10**15) + 1, max_value=10**15 - 1)


def _hilo(x: float) -> tuple[int, int]:
    """The exact pure-Python mirror of tpch._hi/_lo and sql_mhi/mlo."""
    hi = math.floor(x)
    lo = math.floor((x - math.floor(x)) * 1000000.0 + 0.5)
    return int(hi), int(lo)


@given(st.lists(micros_int, min_size=1, max_size=60))
@settings(max_examples=300, deadline=None)
def test_hilo_recovers_exact_micros(mics):
    for m in mics:
        x = float(Decimal(m) / Decimal(1000000))  # nearest double
        hi, lo = _hilo(x)
        assert 0 <= lo < 1000000
        assert hi * 1000000 + lo == m, (m, x, hi, lo)


@given(st.lists(micros_int, min_size=1, max_size=60), st.sampled_from([2, 4]))
@settings(max_examples=300, deadline=None)
def test_rounding_algebra_is_half_up_toward_inf(mics, nd):
    tot = sum(mics)
    d = 10 ** (6 - nd)
    H = sum(_hilo(float(Decimal(m) / Decimal(1000000)))[0] for m in mics)
    L = sum(_hilo(float(Decimal(m) / Decimal(1000000)))[1] for m in mics)
    assert H * 1000000 + L == tot
    scaled = H * 10**nd + (L + d // 2) // d  # L ≥ 0: // == div
    # reference: round-half-toward-+inf of the exact rational total
    expect = math.floor(Decimal(tot) / d + Decimal("0.5"))
    assert scaled == expect, (tot, nd, scaled, expect)


@given(st.lists(micros_int, min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_duckdb_msum_matches_python_model(mics):
    xs = [float(Decimal(m) / Decimal(1000000)) for m in mics]
    vals = ", ".join(f"({x!r}::double)" for x in xs)
    got_sum, got_tot = duckdb.sql(
        f"select {sql_msum('x')} as s, {sql_mtot('x')} as t"
        f" from (values {vals}) v(x)"
    ).fetchone()
    H = sum(_hilo(x)[0] for x in xs)
    L = sum(_hilo(x)[1] for x in xs)
    assert got_sum == float(H * 100 + (L + 5000) // 10000) / 100.0
    assert got_tot == float(H) + float(L) / 1000000.0


# deliberate adversarial fixtures: the exact failure modes the micros
# form exists for (signed half-cent totals — decimal HALF_UP and
# double noise disagree there; q5's sf1 case was +…750.045)
HALF_CENT_CASES = [
    ([Decimal("0.025")], 2, Decimal("0.03")),            # half up
    ([Decimal("-0.025")], 2, Decimal("-0.02")),          # toward +inf
    ([Decimal("1.005"), Decimal("2.010")], 2, Decimal("3.02")),
    ([Decimal("71626750.045")], 2, Decimal("71626750.05")),  # q5 sf1
    ([Decimal("-5.00005"), Decimal("0.0")], 4, Decimal("-5.0000")),
    ([Decimal("0.00005")], 4, Decimal("0.0001")),
]


@pytest.mark.parametrize("vals,nd,expect", HALF_CENT_CASES)
def test_half_boundary_convention(vals, nd, expect):
    d = 10 ** (6 - nd)
    xs = [float(v) for v in vals]
    H = sum(_hilo(x)[0] for x in xs)
    L = sum(_hilo(x)[1] for x in xs)
    scaled = H * 10**nd + (L + d // 2) // d
    assert Decimal(scaled) / 10**nd == expect
    # and DuckDB's sql_msum agrees on the same doubles
    if nd == 2:
        vals_sql = ", ".join(f"({x!r}::double)" for x in xs)
        (got,) = duckdb.sql(
            f"select {sql_msum('x', nd)} from (values {vals_sql}) v(x)"
        ).fetchone()
        assert Decimal(repr(got)) == expect


def test_long_sum_overflow_fails_loudly(spark):
    """The design note's safety claim, now two layers deep: a value
    past the hi/lo domain trips invariant 19's per-row guard BEFORE
    any sum can wrap (the ANSI long-sum overflow remains the backstop
    for row-COUNT-driven overflow at >9.2e12 in-domain rows, which no
    unit test can drive) — either way it RAISES, never wraps silently
    into a confidently-wrong aggregate at 100 TB."""
    from rstreams_spark.queries.tpch import _msum_parts

    df = spark.createDataFrame(
        [(8.0e18,), (8.0e18,)], "x double"
    ).agg(*_msum_parts("x", "v"))
    with pytest.raises(Exception, match="exact micros-sum domain"):
        df.collect()
