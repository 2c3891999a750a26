"""Shared fixtures mirroring the reference test strategy
(``/root/reference/zcollection/tests/conftest.py:66-113``, FIXTURES.md F1/F2).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import zcollection_spark as zc  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    session = zc.get_spark("zcollection-tests", shuffle_partitions=8)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


@pytest.fixture()
def seq_schema() -> zc.DatasetSchema:
    """F1 canonical schema: unbounded ``num`` axis + fixed ``x(3)``."""
    return (zc.SchemaBuilder()
            .add_dimension("num")
            .add_dimension("x", size=3)
            .add_variable("num", "int64", ("num",))
            .add_variable("value", "float32", ("num", "x"))
            .add_variable("static", "float32", ("x",))
            .build())


@pytest.fixture()
def seq_pdf() -> pd.DataFrame:
    """7 rows, keys [0,0,1,1,2,2,2], value = arange(21).reshape(7,3)."""
    value = np.arange(21, dtype=np.float32).reshape(7, 3)
    return pd.DataFrame({
        "num": np.array([0, 0, 1, 1, 2, 2, 2], dtype=np.int64),
        "value": [row.tolist() for row in value],
        "static": [[10.0, 20.0, 30.0]] * 7,
    })


@pytest.fixture()
def seq_collection(spark, tmp_path, seq_schema, seq_pdf) -> zc.Collection:
    coll = zc.create_collection(
        spark, str(tmp_path / "seq"), schema=seq_schema, axis="num",
        partitioning=zc.Sequence(("num",)))
    bound = seq_schema.with_partition_axis("num")
    coll.insert(spark.createDataFrame(seq_pdf,
                                      schema=bound.to_struct_type()))
    return coll


@pytest.fixture()
def date_pdf() -> pd.DataFrame:
    """F2 fixture: 5 rows across Jan/Feb/Mar 2024."""
    times = pd.to_datetime(["2024-01-05", "2024-01-20", "2024-02-03",
                            "2024-02-15", "2024-03-01"])
    return pd.DataFrame({"time": times,
                         "v": np.arange(5, dtype=np.float32)})


@pytest.fixture()
def date_schema() -> zc.DatasetSchema:
    return (zc.SchemaBuilder()
            .add_dimension("time")
            .add_variable("time", "datetime64[us]", ("time",))
            .add_variable("v", "float32", ("time",))
            .build())


@pytest.fixture()
def date_collection(spark, tmp_path, date_schema, date_pdf) -> zc.Collection:
    coll = zc.create_collection(
        spark, str(tmp_path / "dates"), schema=date_schema, axis="time",
        partitioning=zc.Date(("time",), resolution="M"))
    bound = date_schema.with_partition_axis("time")
    coll.insert(spark.createDataFrame(date_pdf,
                                      schema=bound.to_struct_type()))
    return coll
