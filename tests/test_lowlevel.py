"""Unit tests for schema, partitionings and the expression compiler —
mirrors ``/root/reference/zcollection/tests/test_lowlevel.py``."""

import pytest

import zcollection_spark as zc
from zcollection_spark.partitioning import from_json as part_from_json
from zcollection_spark.schema import upgrade, FORMAT_VERSION


# -- schema ----------------------------------------------------------------

def test_schema_axis_binding(seq_schema):
    bound = seq_schema.with_partition_axis("num")
    flags = {v.name: v.immutable for v in bound.variables}
    assert flags == {"num": False, "value": False, "static": True}


def test_schema_rejects_unknown_axis(seq_schema):
    with pytest.raises(zc.SchemaError):
        seq_schema.with_partition_axis("nope")


def test_schema_rejects_second_unbounded():
    builder = (zc.SchemaBuilder().add_dimension("a").add_dimension("b")
               .add_variable("a", "int64", ("a",)))
    with pytest.raises(zc.SchemaError, match="unbounded"):
        builder.build("a")


def test_schema_rejects_bounded_axis():
    builder = (zc.SchemaBuilder().add_dimension("a", size=5)
               .add_variable("a", "int64", ("a",)))
    with pytest.raises(zc.SchemaError):
        builder.build("a")


def test_schema_json_roundtrip(seq_schema):
    bound = seq_schema.with_partition_axis("num")
    again = zc.DatasetSchema.from_json(bound.to_json())
    assert again.to_json() == bound.to_json()


def test_schema_select_short_names(seq_schema):
    builder = (zc.SchemaBuilder().add_dimension("t").add_dimension("r", size=4)
               .add_variable("t", "int64", ("t",))
               .add_variable("data_01/ku/power", "float32", ("t", "r")))
    schema = builder.build("t")
    sel = schema.select(["power"])  # short-name at any depth (quirk Q8)
    assert [v.name for v in sel.variables] == ["data_01/ku/power"]


def test_format_version_rejects_future():
    with pytest.raises(zc.FormatVersionError):
        upgrade({"format_version": FORMAT_VERSION + 1})


def test_duplicate_variable_rejected():
    builder = zc.SchemaBuilder().add_dimension("t")
    builder.add_variable("a", "int64", ("t",))
    with pytest.raises(zc.SchemaError):
        builder.add_variable("a", "int64", ("t",))


# -- partitionings ---------------------------------------------------------

def test_date_keys_and_paths():
    part = zc.Date(("ts",), resolution="D")
    assert part.keys == ("year", "month", "day")
    rel = part.encode({"year": 2024, "month": 3, "day": 5})
    assert rel == "year=2024/month=3/day=5"
    assert part.decode(rel) == {"year": 2024, "month": 3, "day": 5}


def test_date_resolutions():
    assert zc.Date(("t",), resolution="Y").keys == ("year",)
    assert zc.Date(("t",), resolution="s").keys == (
        "year", "month", "day", "hour", "minute", "second")
    with pytest.raises(zc.PartitioningError):
        zc.Date(("t",), resolution="X")


def test_sequence_decode_rejects_noninteger():
    part = zc.Sequence(("num",))
    with pytest.raises(zc.PartitioningError):
        part.decode("num=abc")
    with pytest.raises(zc.PartitioningError):
        part.decode("wrong=1")
    with pytest.raises(zc.PartitioningError):
        part.decode("num=1/extra=2")


def test_grouped_sequence_bucket_key():
    part = zc.GroupedSequence(("cycle", "pass_no"), size=50, start=1)
    assert part.keys == ("cycle", "pass_no_bucket")
    with pytest.raises(zc.PartitioningError):
        zc.GroupedSequence(("a",), size=1)


def test_partitioning_json_roundtrip():
    for part in (zc.Date(("ts",), resolution="M"),
                 zc.Sequence(("a", "b")),
                 zc.GroupedSequence(("a", "b"), size=10, start=2)):
        assert part_from_json(part.to_json()) == part


# -- expression compiler ---------------------------------------------------

def test_filter_tautology():
    pred = zc.compile_filter(None)
    assert pred.evaluate({"anything": 1})


def test_filter_operators():
    pred = zc.compile_filter("year == 2024 and month in (1, 2) or day > 28")
    assert pred.evaluate({"year": 2024, "month": 2, "day": 1})
    assert pred.evaluate({"year": 2000, "month": 5, "day": 30})
    assert not pred.evaluate({"year": 2000, "month": 5, "day": 1})


def test_filter_chained_comparison():
    pred = zc.compile_filter("1 <= month <= 3")
    assert pred.evaluate({"month": 2})
    assert not pred.evaluate({"month": 4})


def test_filter_not_in():
    pred = zc.compile_filter("month not in (1, 2)")
    assert pred.evaluate({"month": 3})
    assert not pred.evaluate({"month": 1})


def test_filter_rejects_arithmetic_and_calls():
    for bad in ("month + 1 == 2", "f(x) == 1", "month == [1][0]",
                "import os", "month == 1.5"):
        with pytest.raises(zc.ExpressionError):
            zc.compile_filter(bad)


def test_filter_unknown_key_is_lazy():
    pred = zc.compile_filter("bogus == 1")  # compiles fine (quirk Q7)
    with pytest.raises(zc.ExpressionError, match="bogus"):
        pred.evaluate({"year": 2024})


def test_filter_negative_literal():
    pred = zc.compile_filter("num == -5")
    assert pred.evaluate({"num": -5})


def test_filter_string_values():
    pred = zc.compile_filter("name == 'a' or name in ('b', 'c')")
    assert pred.evaluate({"name": "a"})
    assert pred.evaluate({"name": "c"})
    assert not pred.evaluate({"name": "d"})
