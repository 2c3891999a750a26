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


# -- live S3 endpoint (moto server) — shared by the s3 suites ----------------

@pytest.fixture(scope="session")
def s3_endpoint():
    """One live moto server for the whole session (real HTTP S3 API)."""
    import logging
    import os
    pytest.importorskip("boto3")
    pytest.importorskip("moto")
    from moto.server import ThreadedMotoServer

    logging.getLogger("werkzeug").setLevel(logging.CRITICAL)
    server = ThreadedMotoServer(ip_address="127.0.0.1", port=0,
                                verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    endpoint = f"http://{host}:{port}"
    old_env = {k: os.environ.get(k) for k in
               ("AWS_ENDPOINT_URL", "AWS_ACCESS_KEY_ID",
                "AWS_SECRET_ACCESS_KEY", "AWS_REGION")}
    os.environ["AWS_ENDPOINT_URL"] = endpoint
    os.environ["AWS_ACCESS_KEY_ID"] = "test"
    os.environ["AWS_SECRET_ACCESS_KEY"] = "test"
    os.environ["AWS_REGION"] = "us-east-1"
    yield endpoint
    for key, val in old_env.items():
        if val is None:
            os.environ.pop(key, None)
        else:
            os.environ[key] = val
    server.stop()


@pytest.fixture()
def s3_root(s3_endpoint):
    """A fresh bucket per test; returns its s3:// root."""
    import uuid
    import boto3
    bucket = f"zc-{uuid.uuid4().hex[:12]}"
    client = boto3.client("s3", endpoint_url=s3_endpoint,
                          region_name="us-east-1")
    client.create_bucket(Bucket=bucket)
    return f"s3://{bucket}/store"
