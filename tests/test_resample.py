"""B15 resample-interpolate property/edge tests against the PHP
algorithm's behavior (MainController.php:588-680, SURVEY §7.6 item 1)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import types as T

from twitch_chat_analyser_spark.functions.resample import (
    interpolate_on_grid,
    resample_grid,
    resample_time_series,
)

SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType()),
        T.StructField("v", T.LongType()),
    ]
)


def php_resample(series, num_points, start=None, end=None):
    """Literal transcription of MainController.php:593-680 as the oracle."""
    if num_points < 2:
        num_points = 2
    n = len(series)
    if n == 0:
        return [(start, 0), (end, 0)]
    if num_points >= n:
        return list(series)
    start = start if start is not None else series[0][0]
    end = end if end is not None else series[-1][0]
    if end - start == 0:
        end = start + 60_000
        num_points = 2
    t = start
    step = (end - start) / (num_points - 1)
    out = []
    prev_before = 0
    while t <= end:
        if t <= series[0][0]:
            out.append((t, series[0][1]))
        elif t >= series[-1][0]:
            out.append((t, series[-1][1]))
        else:
            before = after = None
            for i in range(prev_before, n - 1):
                pt = series[i]
                if pt[0] > t:
                    break
                nxt = series[i + 1]
                if nxt[0] >= t:
                    before, after = pt, nxt
                    prev_before = i
                    break
            k = (t - before[0]) / (after[0] - before[0])
            # PHP round = half away from zero
            x = before[1] + k * (after[1] - before[1])
            out.append((t, math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)))
        if t == end:
            break
        t = math.ceil(t + step)
        if t > end:
            t = end
    return out


def run_spark(spark, series, num_points, start, end):
    df = spark.createDataFrame(series, SCHEMA)
    out = resample_time_series(df, "v", num_points, start, end)
    return [(r["timestamp"], r["v"]) for r in out.orderBy("timestamp").collect()]


CASES = [
    # (series, num_points, start, end)
    # dense series downsampled
    ([(i * 1000, i * i) for i in range(50)], 10, 0, 49_000),
    # grid extends beyond series on both sides -> clamping
    ([(10_000 + i * 500, 100 + i) for i in range(30)], 8, 0, 40_000),
    # grid points exactly on samples
    ([(i * 900_000, i * 7) for i in range(40)], 14, 0, 39 * 900_000),
    # irregular gaps
    ([(0, 0), (100, 1000), (10_000, 0), (11_000, 5), (500_000, 42)], 4, 0, 500_000),
]


@pytest.mark.parametrize("series,np_,s,e", CASES)
def test_matches_php_algorithm(spark, series, np_, s, e):
    assert run_spark(spark, series, np_, s, e) == php_resample(series, np_, s, e)


def test_never_upsamples(spark):
    series = [(i * 1000, i) for i in range(5)]
    assert run_spark(spark, series, 100, 0, 4000) == series


def test_empty_series_default(spark):
    df = spark.createDataFrame([], SCHEMA)
    out = resample_time_series(df, "v", 10, 111, 999)
    assert [(r["timestamp"], r["v"]) for r in out.collect()] == [(111, 0), (999, 0)]


def test_zero_span_window(spark):
    series = [(i, i) for i in range(0, 5000, 100)]
    out = run_spark(spark, series, 10, 2000, 2000)
    # end := start + 60000, numPoints := 2 (MainController.php:620-624)
    assert out == php_resample(series, 10, 2000, 2000)
    assert [t for t, _ in out] == [2000, 62_000]


def test_grid_degenerate_spans_follow_php_loop():
    """Review r10: the PHP ``while (t <= endTime)`` loop yields [] for
    a negative span and a single point for a zero span — ``range``
    would descend / raise on stride <= 0 instead."""
    assert resample_grid(100, 50, 10) == []
    assert resample_grid(100, 100, 10) == [100]


def test_grid_matches_php_stepping():
    # ceil(t + step) == t + ceil(step) for integral t
    for start, end, np_ in [(0, 1_000_000, 100), (7, 999, 13), (0, 10, 7)]:
        grid = resample_grid(start, end, np_)
        t, step = start, (end - start) / (np_ - 1)
        php = []
        while t <= end:
            php.append(t)
            if t == end:
                break
            t = math.ceil(t + step)
            if t > end:
                t = end
        assert grid == php


# --- property-based sweep against the PHP transcription ---------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def series_and_window(draw):
    ts = draw(
        st.lists(
            st.integers(min_value=0, max_value=5_000_000),
            min_size=2,
            max_size=40,
            unique=True,
        )
    )
    ts.sort()
    series = [(t, draw(st.integers(min_value=-1000, max_value=100_000))) for t in ts]
    num_points = draw(st.integers(min_value=2, max_value=len(series) + 5))
    # window may start before/inside the series and end inside/after it
    start = draw(st.integers(min_value=-100_000, max_value=ts[-1]))
    end = draw(st.integers(min_value=max(start + 1, ts[0]), max_value=5_200_000))
    return series, num_points, start, end


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(case=series_and_window())
def test_property_matches_php_algorithm(spark, case):
    series, num_points, start, end = case
    assert run_spark(spark, series, num_points, start, end) == php_resample(
        series, num_points, start, end
    )


def test_multi_series_equals_per_series(spark):
    from twitch_chat_analyser_spark.functions.resample import (
        interpolate_on_grid,
        interpolate_on_grid_multi,
        resample_grid,
    )

    series = {
        "a": [(0, 10), (1000, 20), (5000, 100), (9000, 0)],
        "b": [(500, 7), (2500, 77)],
        "c": [(4000, 1)],  # single point: clamped everywhere
    }
    grid = resample_grid(0, 9000, 7)
    rows = [
        (ch, ts, v) for ch, pts in series.items() for ts, v in pts
    ]
    df = spark.createDataFrame(rows, "channel string, timestamp long, messages long")

    multi = {
        (r["channel"], r["timestamp"]): r["messages"]
        for r in interpolate_on_grid_multi(df, ["channel"], grid, "messages").collect()
    }
    for ch, pts in series.items():
        single = spark.createDataFrame(pts, "timestamp long, messages long")
        expected = {
            (ch, r["timestamp"]): r["messages"]
            for r in interpolate_on_grid(single, grid, "messages").collect()
        }
        assert {k: v for k, v in multi.items() if k[0] == ch} == expected, ch
