"""Interval join operator vs brute-force oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from zcollection_spark.functions.interval import interval_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(11)
    points = pd.DataFrame({
        "t": rng.uniform(0, 1000, 80),
        "g": rng.integers(0, 3, 80).astype("int64"),
        "pid": np.arange(80, dtype="int64")})
    lo = rng.uniform(0, 950, 30)
    intervals = pd.DataFrame({
        "lo": lo, "hi": lo + rng.uniform(1, 120, 30),
        "g": rng.integers(0, 3, 30).astype("int64"),
        "iid": np.arange(30, dtype="int64")})
    return points, intervals


def _brute(points, intervals, by=True):
    out = []
    for _, p in points.iterrows():
        for _, iv in intervals.iterrows():
            if by and p["g"] != iv["g"]:
                continue
            if iv["lo"] <= p["t"] <= iv["hi"]:
                out.append((p["pid"], iv["iid"]))
    return sorted(out)


@pytest.mark.parametrize("bucket", [10.0, 50.0, 1000.0])
def test_interval_join_matches_bruteforce(spark, frames, bucket):
    points, intervals = frames
    got = interval_join(spark.createDataFrame(points),
                        spark.createDataFrame(intervals),
                        on="t", start="lo", end="hi", by="g",
                        bucket=bucket)
    pairs = sorted((r["pid"], r["iid"]) for r in got.collect())
    assert pairs == _brute(points, intervals)


def test_interval_join_no_by(spark, frames):
    points, intervals = frames
    got = interval_join(spark.createDataFrame(points),
                        spark.createDataFrame(intervals.drop(columns="g")),
                        on="t", start="lo", end="hi", bucket=25.0)
    pairs = sorted((r["pid"], r["iid"]) for r in got.collect())
    assert pairs == _brute(points, intervals, by=False)


def test_interval_join_left_keeps_unmatched(spark):
    points = pd.DataFrame({"t": [5.0, 500.0], "pid": [1, 2]})
    intervals = pd.DataFrame({"lo": [0.0], "hi": [10.0], "iid": [7]})
    got = interval_join(spark.createDataFrame(points),
                        spark.createDataFrame(intervals),
                        on="t", start="lo", end="hi", bucket=20.0,
                        how="left").orderBy("pid").collect()
    assert got[0]["iid"] == 7
    assert got[1]["iid"] is None


def test_interval_join_timestamps(spark):
    points = pd.DataFrame({
        "t": pd.to_datetime(["2024-01-01 01:30", "2024-01-01 09:00"]),
        "pid": [1, 2]})
    intervals = pd.DataFrame({
        "lo": pd.to_datetime(["2024-01-01 01:00"]),
        "hi": pd.to_datetime(["2024-01-01 02:00"]), "iid": [3]})
    got = interval_join(spark.createDataFrame(points),
                        spark.createDataFrame(intervals),
                        on="t", start="lo", end="hi",
                        bucket=1800.0).collect()
    assert [(r["pid"], r["iid"]) for r in got] == [(1, 3)]


def test_interval_join_rejects_overlap_and_reserved(spark):
    points = pd.DataFrame({"t": [1.0], "x": [1]})
    bad = pd.DataFrame({"lo": [0.0], "hi": [2.0], "x": [9]})
    with pytest.raises(ValueError, match="overlap"):
        interval_join(spark.createDataFrame(points),
                      spark.createDataFrame(bad),
                      on="t", start="lo", end="hi")
    with pytest.raises(ValueError, match="unsupported how"):
        interval_join(spark.createDataFrame(points),
                      spark.createDataFrame(bad.drop(columns="x")),
                      on="t", start="lo", end="hi", how="full")


def test_interval_join_auto_bucket(spark, frames):
    points, intervals = frames
    got = interval_join(spark.createDataFrame(points),
                        spark.createDataFrame(intervals),
                        on="t", start="lo", end="hi", by="g",
                        bucket=None)
    pairs = sorted((r["pid"], r["iid"]) for r in got.collect())
    assert pairs == _brute(points, intervals)
