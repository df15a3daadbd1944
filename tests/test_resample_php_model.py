"""B15 resampling vs a LITERAL transliteration of the reference's PHP
loop (VERDICT r11 task 5: resample.py's edge cases were hand-enumerated;
the PHP ceil-stepping and tie rules are exactly the off-by-one territory
a randomized sweep catches — SURVEY §7.6 names it the #1 hard part).

The model below ports MainController.php:593-680 line-by-line to pure
Python — same count-dependent branches (:598-624), same zero-span
adjustment (:620-624), same clamp rules (:632-641), same bracket scan
with the resumable ``prevBeforeIdx`` (:645-661), same float ``t_step``
recurrence ``t = ceil(t + t_step)`` (:674) — and the sweep drives
``resample_time_series`` against it over randomized series, windows and
point counts, including every degenerate branch.

Two deliberate model notes:
- PHP ``round()`` is half-away-from-zero over the double's SHORTEST
  decimal representation (PHP pre-rounds the representation; Java's
  ``BigDecimal.valueOf`` used by Spark's ``round`` does the same via
  ``Double.toString``) — modeled with ``Decimal(repr(x))`` + HALF_UP.
- PHP's ``$startTime = $startTime ?: ...`` treats a literal 0 bound as
  ABSENT (falsy). The dashboard can never reach a 0 bound (it replaces
  0 with the first sample's timestamp before calling,
  MainController.php:493), so the sweep draws bounds >= 1 and the
  Python entry point keeps 0 as an honest explicit bound.
"""

from __future__ import annotations

import math
import random
from decimal import ROUND_HALF_UP, Decimal

import pytest

from twitch_chat_analyser_spark.functions.resample import (
    resample_time_series,
)


def _php_round(x: float) -> int:
    # half-away-from-zero over the shortest decimal repr (see module
    # docstring); ROUND_HALF_UP in decimal IS away-from-zero for
    # negatives because the quantize sees the signed value
    return int(
        Decimal(repr(float(x))).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )


def php_resample(series, num_points=1000, start_time=None, end_time=None):
    """MainController.php:593-680, transliterated. ``series`` is a
    sorted list of (timestamp, value) tuples; returns the same."""
    if num_points < 2:
        num_points = 2
    n = len(series)
    if n == 0:
        if start_time is None or end_time is None:
            raise ValueError("length 0 and no start/end")  # :602-603
        return [(start_time, 0), (end_time, 0)]  # :605-608
    if num_points >= n:  # :612-613 never up-sample
        return list(series)
    first = series[0]
    last = series[-1]
    start_time = start_time or first[0]  # :618 (?: — falsy 0 is absent)
    end_time = end_time or last[0]  # :619
    if end_time - start_time == 0:  # :621-624
        end_time = start_time + 1000 * 60
        num_points = 2
    t = start_time
    t_step = (end_time - start_time) / (num_points - 1)  # float, :628
    result = []
    prev_before_idx = 0
    while t <= end_time:  # :631
        if t <= first[0]:  # :633-637 clamp before the series
            result.append((t, first[1]))
        elif t >= last[0]:  # :638-641 clamp past the series
            result.append((t, last[1]))
        else:
            before = after = None
            for i in range(prev_before_idx, n - 1):  # :648-661
                pt = series[i]
                if pt[0] > t:
                    break
                pt_next = series[i + 1]
                if pt_next[0] >= t:
                    before, after = pt, pt_next
                    prev_before_idx = i
                    break
            k = (t - before[0]) / (after[0] - before[0])  # :663
            result.append(
                (t, _php_round(before[1] + k * (after[1] - before[1])))
            )  # :664-667
        if t == end_time:  # :670-671
            break
        t = math.ceil(t + t_step)  # :674 — FLOAT recurrence, not range()
        if t > end_time:  # :675-676 clamp the last step
            t = end_time
    return result


def _run_spark(spark, series, num_points, start, end):
    df = spark.createDataFrame(
        [(int(t), int(v)) for t, v in series] or [],
        "timestamp long, v long",
    )
    out = resample_time_series(
        df, "v", num_points=num_points, start=start, end=end
    )
    return [(r["timestamp"], r["v"]) for r in out.collect()]


def _gen_case(rng: random.Random):
    shape = rng.choice(
        ["empty", "tiny", "dense", "sparse", "epoch_ms", "clustered"]
    )
    if shape == "empty":
        series = []
    else:
        n = {
            "tiny": rng.randint(1, 3),
            "dense": rng.randint(20, 60),
            "sparse": rng.randint(4, 10),
            "epoch_ms": rng.randint(10, 40),
            "clustered": rng.randint(10, 30),
        }[shape]
        base = 1_704_672_000_000 if shape == "epoch_ms" else rng.randint(1, 500)
        ts = set()
        while len(ts) < n:
            if shape == "clustered":
                # tight clusters stress the tie rule and bracket resume
                # (value space must exceed max n=30 or this never fills)
                ts.add(base + rng.randint(0, 11) * 1000 + rng.randint(0, 7))
            else:
                ts.add(base + rng.randint(0, 900_000))
        series = sorted(
            (t, rng.randint(-50, 1000)) for t in ts
        )  # negatives stress round-away-from-zero
    num_points = rng.choice(
        [2, 3, 5, 10, 100, max(2, len(series) - 1), len(series) + 1]
    )
    bounds = rng.choice(["none", "wide", "inside", "zero_span", "inverted"])
    if bounds == "none":
        start = end = None
        if not series:
            return None  # the error contract, covered separately
    elif bounds == "wide":
        lo = series[0][0] if series else 10
        hi = series[-1][0] if series else 20
        start = max(1, lo - rng.randint(0, 10_000))
        end = hi + rng.randint(0, 10_000)
    elif bounds == "inside":
        lo = series[0][0] if series else 10
        hi = series[-1][0] if series else 20
        span = max(hi - lo, 2)
        start = max(1, lo + rng.randint(0, span // 2))
        end = max(start, hi - rng.randint(0, span // 3))
    elif bounds == "zero_span":
        start = end = series[len(series) // 2][0] if series else 77
    else:  # inverted: PHP's while-loop never runs -> empty result
        hi = series[-1][0] if series else 20
        start = hi + 1000
        end = start - rng.randint(1, 5000)
    return series, num_points, start, end


def test_resample_matches_php_model_randomized(spark):
    rng = random.Random(0xB15)
    cases, made = [], 0
    while made < 44:
        c = _gen_case(rng)
        if c is not None:
            cases.append(c)
            made += 1
    # pin coverage of every branch family across the sweep
    assert any(not s for s, *_ in cases), "empty-series branch not drawn"
    assert any(s and np >= len(s) for s, np, *_ in cases)
    assert any(st is not None and st == en for _, _, st, en in cases)
    assert any(
        st is not None and en is not None and en < st
        for _, _, st, en in cases
    )
    for i, (series, num_points, start, end) in enumerate(cases):
        want = php_resample(
            series, num_points=num_points, start_time=start, end_time=end
        )
        got = _run_spark(spark, series, num_points, start, end)
        want_cast = [(int(t), int(v)) for t, v in want]
        if start is not None and end is not None and end < start:
            # inverted window (unreachable from the dashboard — it
            # always passes start <= end): PHP emits the two default
            # points in argument order, the plan in timestamp order;
            # same rows, presentation order only
            got, want_cast = sorted(got), sorted(want_cast)
        assert got == want_cast, (
            f"case {i}: series={series} num_points={num_points} "
            f"start={start} end={end}\nphp  ={want_cast}\nspark={got}"
        )


def test_resample_empty_unbounded_is_the_php_exception(spark):
    df = spark.createDataFrame([], "timestamp long, v long")
    with pytest.raises(ValueError):
        resample_time_series(df, "v", num_points=10)


def test_grid_identity_ceil_float_recurrence(spark):
    """The plan-side grid uses ``range(start, end, ceil(step)) + [end]``
    on the identity ``ceil(t + step) == t + ceil(step)`` for integer t.
    The identity can only break when frac(step) < ulp(t+step)/2 — at
    epoch-ms magnitudes (~2^41) that needs num_points > ~4000, and every
    dashboard call caps at 1000 (MainController.php resolution params).
    Pin the identity over the reachable domain by brute-forcing the PHP
    float recurrence against the plan grid."""
    from twitch_chat_analyser_spark.functions.resample import resample_grid

    rng = random.Random(7)
    for _ in range(300):
        start = rng.choice([1, 500, 1_704_672_000_000]) + rng.randint(0, 999)
        span = rng.randint(1, 3_000_000)
        end = start + span
        np_ = rng.choice([2, 3, 7, 99, 100, 500, 1000])
        step = (end - start) / (np_ - 1)
        t, php_grid = start, []
        while t <= end:
            php_grid.append(t)
            if t == end:
                break
            t = math.ceil(t + step)
            if t > end:
                t = end
        assert resample_grid(start, end, np_) == php_grid, (
            start, end, np_,
        )
