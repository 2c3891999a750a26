"""As-of join operator vs the pandas.merge_asof oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from zcollection_spark.functions.asof import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "t": np.sort(rng.integers(0, 1000, 60)).astype("int64"),
        "g": rng.integers(0, 3, 60).astype("int64"),
        "x": np.arange(60, dtype="int64")})
    right = pd.DataFrame({
        "t": np.sort(rng.integers(0, 1000, 25)).astype("int64"),
        "g": rng.integers(0, 3, 25).astype("int64"),
        "y": rng.normal(size=25)})
    # drop duplicate (g, t) pairs: ties make the match ambiguous
    left = left.drop_duplicates(["g", "t"]).reset_index(drop=True)
    right = right.drop_duplicates(["g", "t"]).reset_index(drop=True)
    return left, right


def _expected(left, right, direction, tolerance=None, by=True):
    kwargs = {"direction": direction}
    if tolerance is not None:
        kwargs["tolerance"] = tolerance
    if by:
        kwargs["by"] = "g"
    return (pd.merge_asof(left.sort_values("t"), right.sort_values("t"),
                          on="t", **kwargs)
            .sort_values("x").reset_index(drop=True))


def _got(spark, left, right, direction, tolerance=None, by=True):
    l_df = spark.createDataFrame(left)
    r_df = spark.createDataFrame(right if by
                                 else right.drop(columns=["g"]))
    out = asof_join(l_df, r_df, on="t", by="g" if by else (),
                    tolerance=tolerance, direction=direction)
    return (out.toPandas().sort_values("x").reset_index(drop=True)
            [["t", "g", "x", "y"]])


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_directions_match_pandas(spark, frames, direction):
    left, right = frames
    want = _expected(left, right, direction)[["t", "g", "x", "y"]]
    got = _got(spark, left, right, direction)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_tolerance(spark, frames, direction):
    left, right = frames
    want = _expected(left, right, direction, tolerance=50)[
        ["t", "g", "x", "y"]]
    got = _got(spark, left, right, direction, tolerance=50)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_no_by_global(spark, frames):
    left, right = frames
    l2 = left.drop_duplicates(["t"]).reset_index(drop=True)
    r2 = right.drop_duplicates(["t"]).reset_index(drop=True)
    want = (pd.merge_asof(l2.sort_values("t"),
                          r2.drop(columns=["g"]).sort_values("t"),
                          on="t", direction="backward")
            .sort_values("x").reset_index(drop=True))
    got = _got(spark, l2, r2, "backward", by=False)
    pd.testing.assert_frame_equal(
        got[["t", "x", "y"]], want[["t", "x", "y"]], check_dtype=False)


def test_asof_exact_match_included(spark):
    left = pd.DataFrame({"t": [10, 20], "k": [1, 2]})
    right = pd.DataFrame({"t": [10, 15], "v": [1.0, 2.0]})
    out = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right), on="t") \
        .orderBy("t").toPandas()
    assert out["v"].tolist() == [1.0, 2.0]


def test_asof_timestamp_interval_tolerance(spark):
    left = pd.DataFrame({
        "t": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 06:00"]),
        "k": [1, 2]})
    right = pd.DataFrame({
        "t": pd.to_datetime(["2024-01-01 00:30"]), "v": [9.0]})
    out = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right), on="t",
                    direction="forward",
                    tolerance=F.expr("INTERVAL 1 HOUR")) \
        .orderBy("k").toPandas()
    assert out["v"].tolist()[0] == 9.0
    assert pd.isna(out["v"].tolist()[1])


def test_asof_reserved_column_rejected(spark):
    left = pd.DataFrame({"t": [1], "__asof_side": [1]})
    right = pd.DataFrame({"t": [1], "v": [1.0]})
    with pytest.raises(ValueError, match="reserved"):
        asof_join(spark.createDataFrame(left),
                  spark.createDataFrame(right), on="t")


def test_asof_name_collision_suffixed(spark):
    left = pd.DataFrame({"t": [5], "value": [1.0]})
    right = pd.DataFrame({"t": [3], "value": [2.0]})
    out = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right), on="t")
    assert "value_right" in out.columns
    row = out.collect()[0]
    assert row["value"] == 1.0 and row["value_right"] == 2.0
