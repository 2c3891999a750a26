"""Introspection + xarray-bridge surface (xbridge.py)."""

import pytest

from zcollection_spark import xbridge


def test_dataset_nbytes_tracks_projection(spark, seq_collection):
    full = seq_collection.nbytes()
    assert full > 0
    projected = xbridge.dataset_nbytes(
        seq_collection.query(variables=["num"]))
    assert 0 < projected < full  # column pruning shrinks the estimate
    assert seq_collection.nbytes(filters="num == 99") == 0  # no match


def test_is_lazy_reflects_persist(spark):
    df = spark.range(10)
    assert xbridge.is_lazy(df)
    df = df.persist()
    try:
        assert not xbridge.is_lazy(df)
    finally:
        df.unpersist()
    assert xbridge.is_lazy(df)


def test_tree_repr_is_xarray_style(seq_collection):
    text = repr(seq_collection)
    assert "<zcollection_spark.Collection>" in text
    assert "Dimensions: (num: unbounded, x: 3)" in text
    assert "Partitions: 3" in text
    assert "value" in text and "(num, x)" in text
    assert "[immutable]" in text  # static(x) does not span the axis


def test_to_xarray_gated_or_bridged(seq_collection):
    """Without xarray installed the bridge raises a clear ImportError;
    with it, the round-trip produces a real xarray.Dataset."""
    xr = pytest.importorskip(
        "xarray",
        reason="optional extra not installed in this env: "
               "pip install 'zcollection-spark[xarray]' auto-unskips")
    ds = seq_collection.to_xarray()
    assert dict(ds.sizes)["num"] == 7
    assert ds["value"].dims == ("num", "x")


def test_to_xarray_import_error_message(seq_collection, monkeypatch):
    import builtins
    real_import = builtins.__import__

    def no_xarray(name, *a, **k):
        if name == "xarray":
            raise ImportError("No module named 'xarray'")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_xarray)
    with pytest.raises(ImportError, match="optional xarray"):
        seq_collection.to_xarray()


def test_from_xarray_roundtrip_if_available(spark):
    xr = pytest.importorskip(
        "xarray",
        reason="optional extra not installed in this env: "
               "pip install 'zcollection-spark[xarray]' auto-unskips")
    import numpy as np
    ds = xr.Dataset({
        "num": (("num",), np.arange(4, dtype=np.int64)),
        "value": (("num", "x"),
                  np.arange(12, dtype=np.float32).reshape(4, 3))})
    df, schema = xbridge.from_xarray(spark, ds, axis="num")
    assert schema.axis == "num"
    assert df.count() == 4
    assert df.schema["value"].dataType.simpleString() == "array<float>"
