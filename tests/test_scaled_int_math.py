"""Property tests for the exact scaled-int money arithmetic that makes
TPC-H double emissions cross-engine portable (plans/tpch.py::_i4 and
friends, round 8).

The whole scheme rests on three claims, each pinned here against an
exact-arithmetic reference (python Decimal / Fraction, no Spark, no
DuckDB — these must hold by MATH, not by two engines agreeing):

1. quantizing a money double to DECIMAL(18,4) then extracting ×10⁴ is
   exactly representable in int64 for any realistic money value;
2. the integer half-up rounding ``(x + 5·10^{s-1}) // 10^s`` of a
   scale-s integer product equals Decimal ROUND_HALF_UP of the exact
   product at scale 4 (positive operands);
3. the emission ``float(int64) / 10^4`` is deterministic: int→double
   conversion is correctly rounded (IEEE 754 requires it in every
   engine), so identical integers yield identical doubles.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

# money-like operands quantized to scale 4, the repo convention
money = st.decimals(
    min_value="0.0001", max_value="999999.9999", places=4
)
rate = st.decimals(min_value="0.0000", max_value="1.0000", places=4)


def _i4(d: Decimal) -> int:
    return int(d * 10000)


@settings(max_examples=500)
@given(p=money, d=rate)
def test_rev_i4_matches_decimal_half_up(p: Decimal, d: Decimal) -> None:
    """(pi4·(10⁴−di4) + 5000) // 10⁴ == round_half_up(p·(1−d), 4)·10⁴."""
    got = (_i4(p) * (10000 - _i4(d)) + 5000) // 10000
    want = (p * (1 - d)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
    assert got == _i4(want)


@settings(max_examples=500)
@given(p=money, d=rate, t=rate)
def test_charge_i4_matches_decimal_half_up(
    p: Decimal, d: Decimal, t: Decimal
) -> None:
    """The q1 charge: scale-12 triple product rounded half-up to 4."""
    got = (
        _i4(p) * (10000 - _i4(d)) * (10000 + _i4(t)) + 50_000_000
    ) // 100_000_000
    want = (p * (1 - d) * (1 + t)).quantize(
        Decimal("0.0001"), ROUND_HALF_UP
    )
    assert got == _i4(want)


@settings(max_examples=500)
@given(p=money, d=rate, t=rate)
def test_per_row_products_fit_int64(p: Decimal, d: Decimal, t: Decimal) -> None:
    """No silent wraparound: the widest per-row intermediate (the
    unrounded triple product) stays far inside int64."""
    widest = _i4(p) * (10000 - _i4(d)) * (10000 + _i4(t))
    assert widest < 2**63 / 4  # 4x headroom before the +5e7 offset


@settings(max_examples=300)
@given(vals=st.lists(money, min_size=1, max_size=50))
def test_emission_is_exact_sum_then_one_rounding(vals: list[Decimal]) -> None:
    """CAST(Σ i4 AS DOUBLE)/1e4 applies exactly ONE data-dependent
    rounding (the final divide) to an exact integer sum — so any two
    engines that convert int64→double correctly (IEEE requires it)
    emit identical bits, independent of summation order."""
    s = sum(_i4(v) for v in vals)
    assert s == _i4(sum(vals))  # integer sum is the exact decimal sum
    a = float(s) / 10000.0
    b = float(sum(reversed([_i4(v) for v in vals]))) / 10000.0
    assert a == b and a.hex() == b.hex()
