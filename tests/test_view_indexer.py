"""Views and secondary index — mirrors
``/root/reference/zcollection/tests/test_catalog_views_indexer.py``."""

import numpy as np
import pandas as pd
import pytest

import zcollection_spark as zc
from zcollection_spark.indexing import Indexer, ranges_for
from zcollection_spark.schema import VariableSchema
from zcollection_spark.view import View


def _derived_var():
    return VariableSchema(name="derived", dtype="float32",
                          dimensions=("num",))


def test_view_create_collision_rejected(spark, tmp_path, seq_collection):
    with pytest.raises(zc.ViewError, match="collides"):
        View.create(spark, str(tmp_path / "v"), base=seq_collection,
                    variables=[VariableSchema(name="value", dtype="float32",
                                              dimensions=("num",))])


def test_view_unknown_dimension_rejected(spark, tmp_path, seq_collection):
    with pytest.raises(zc.ViewError, match="dimension"):
        View.create(spark, str(tmp_path / "v"), base=seq_collection,
                    variables=[VariableSchema(name="d", dtype="float32",
                                              dimensions=("nope",))])


def test_view_update_query_roundtrip(spark, tmp_path, seq_collection):
    view = View.create(spark, str(tmp_path / "v"), base=seq_collection,
                       variables=[_derived_var()])

    def compute(pdf):
        return pd.DataFrame({
            "derived": [float(np.mean(row)) for row in pdf["value"]]})

    view.update(compute)
    res = view.query().toPandas()
    assert "derived" in res.columns
    want = np.arange(21, dtype=np.float32).reshape(7, 3).mean(axis=1)
    np.testing.assert_allclose(sorted(res["derived"]), sorted(want))
    # base is untouched
    assert "derived" not in seq_collection.query().columns
    # struct-view parity (r16): a flat-named view queries nested too
    nested = view.query(nested=True)
    assert set(nested.columns) == set(res.columns)  # no groups -> no-op
    assert nested.count() == len(res)


def test_view_query_missing_overlay_partitions(spark, tmp_path,
                                               seq_collection):
    view = View.create(spark, str(tmp_path / "v"), base=seq_collection,
                       variables=[_derived_var()])

    def compute(pdf):
        return pd.DataFrame({"derived": [1.0] * len(pdf)})

    view.update(compute, filters="num == 1")  # overlay only num=1
    res = view.query().toPandas()
    assert len(res) == 7
    assert res["derived"].notna().sum() == 2  # only num=1 rows have overlay


def test_view_reopen(spark, tmp_path, seq_collection):
    View.create(spark, str(tmp_path / "v"), base=seq_collection,
                variables=[_derived_var()])
    view = View.open(spark, str(tmp_path / "v"))
    assert [v.name for v in view.variables] == ["derived"]
    assert view.base.path == seq_collection.path


def test_view_update_unknown_variable_raises(spark, tmp_path,
                                             seq_collection):
    view = View.create(spark, str(tmp_path / "v"), base=seq_collection,
                       variables=[_derived_var()])

    def bad(pdf):
        return pd.DataFrame({"mystery": [1.0] * len(pdf)})

    with pytest.raises(Exception, match="unknown overlay"):
        view.update(bad)


# -- indexer (F4 halforbit fixture, examples/ex_indexing.py:40-120) --------

@pytest.fixture()
def halforbit(spark, tmp_path):
    total = 5 * 20 * 10
    pdf = pd.DataFrame({
        "time": np.arange(total, dtype=np.int64),
        "cycle_number": np.repeat(np.arange(5, dtype=np.int64), 200),
        "pass_number": np.tile(np.repeat(np.arange(20, dtype=np.int64), 10),
                               5),
    })
    schema = (zc.SchemaBuilder().add_dimension("time")
              .add_variable("time", "int64", ("time",))
              .add_variable("cycle_number", "int64", ("time",))
              .add_variable("pass_number", "int64", ("time",)).build())
    coll = zc.create_collection(
        spark, str(tmp_path / "orbit"), schema=schema, axis="time",
        partitioning=zc.Sequence(("cycle_number",)))
    coll.insert(spark.createDataFrame(pdf))
    return coll


def test_indexer_build_lookup_query(spark, tmp_path, halforbit):
    indexer = Indexer(spark, str(tmp_path / "index"))

    def builder(pdf):
        return ranges_for(pdf, ["pass_number"])

    indexer.build(halforbit, builder=builder, schema="pass_number long")
    # scalar equality
    ranges = indexer.lookup(halforbit, pass_number=3)
    assert len(ranges) == 5  # one run per cycle
    for rel, spans in ranges.items():
        assert spans == [(30, 40)]
    # IN lookup
    ranges2 = indexer.lookup(halforbit, pass_number=[1, 2])
    assert all(len(spans) == 2 for spans in ranges2.values())
    # pushdown read
    res = indexer.query(halforbit, pass_number=3)
    pdf = res.toPandas()
    assert len(pdf) == 50
    assert set(pdf["pass_number"]) == {3}


def test_indexer_unknown_column(spark, tmp_path, halforbit):
    indexer = Indexer(spark, str(tmp_path / "index"))
    indexer.build(halforbit, builder=lambda p: ranges_for(p, ["pass_number"]),
                  schema="pass_number long")
    with pytest.raises(zc.IndexerError):
        indexer.lookup(halforbit, nope=1)


def test_indexer_anded_predicates(spark, tmp_path, halforbit):
    indexer = Indexer(spark, str(tmp_path / "index"))
    indexer.build(halforbit, builder=lambda p: ranges_for(p, ["pass_number"]),
                  schema="pass_number long")
    res = indexer.query(halforbit, pass_number=3, cycle_number=2)
    pdf = res.toPandas()
    assert len(pdf) == 10
    assert set(pdf["cycle_number"]) == {2}


def test_indexer_over_zarr_collection(spark, tmp_path):
    """The secondary index builds/looks up/queries against the ZARR
    layout (synthesized positional _row_idx), and its lookup ranges
    drive chunk-level partial reads via read_row_ranges."""
    import numpy as np
    import pandas as pd
    import zcollection_spark as zc
    from zcollection_spark.indexing import Indexer, ranges_for
    from zcollection_spark.zarr3.collection import create_zarr_collection

    pdf = pd.DataFrame({
        "num": np.repeat([0, 1], 8).astype("int64"),
        "t": np.arange(16, dtype="int64"),
        "tag": np.array([1, 1, 2, 2, 2, 3, 3, 3,
                         1, 1, 1, 2, 3, 3, 4, 4], dtype="int64")})
    schema = (zc.SchemaBuilder().add_dimension("t")
              .add_variable("num", "int64", ("t",))
              .add_variable("t", "int64", ("t",))
              .add_variable("tag", "int64", ("t",)).build("t"))
    coll = create_zarr_collection(spark, str(tmp_path / "zi"),
                                  schema=schema, axis="t",
                                  partitioning=zc.Sequence(("num",)))
    coll.insert(spark.createDataFrame(pdf, schema=schema.to_struct_type()))

    idx = Indexer(spark, str(tmp_path / "zindex"))
    idx.build(coll, builder=lambda p: ranges_for(p, ["tag"]),
              schema="tag long")
    ranges = idx.lookup(coll, tag=2)
    assert ranges == {"num=0": [(2, 5)], "num=1": [(3, 4)]}
    got = idx.query(coll, tag=2)
    assert sorted(r["t"] for r in got.collect()) == [2, 3, 4, 11]
    # the same ranges drive byte-level partial reads
    part = coll.read_row_ranges(ranges).orderBy("t").toPandas()
    assert part["t"].tolist() == [2, 3, 4, 11]
    assert part["tag"].tolist() == [2, 2, 2, 2]


def test_view_over_zarr_base(spark, tmp_path):
    """Overlay views work on a zarr base: update computes overlay
    variables per base partition, query merges base+overlay."""
    import numpy as np
    import pandas as pd
    import zcollection_spark as zc
    from zcollection_spark.view import View
    from zcollection_spark.zarr3.collection import create_zarr_collection

    pdf = pd.DataFrame({
        "num": np.repeat([0, 1], 4).astype("int64"),
        "t": np.arange(8, dtype="int64"),
        "v": np.arange(8, dtype="float64")})
    schema = (zc.SchemaBuilder().add_dimension("t")
              .add_variable("num", "int64", ("t",))
              .add_variable("t", "int64", ("t",))
              .add_variable("v", "float64", ("t",)).build("t"))
    base = create_zarr_collection(spark, str(tmp_path / "zb"),
                                  schema=schema, axis="t",
                                  partitioning=zc.Sequence(("num",)))
    base.insert(spark.createDataFrame(pdf, schema=schema.to_struct_type()))

    view = View.create(spark, str(tmp_path / "zv"), base=base,
                       variables=[{"name": "v2", "dtype": "float64"}])
    view.update(lambda p: {"v2": (p["v"] * 10).to_numpy()})
    got = view.query().orderBy("t").toPandas()
    assert got["v2"].tolist() == [v * 10 for v in range(8)]
    # reopen resolves the zarr base from the view config
    reopened = View.open(spark, view.path)
    assert reopened.query().count() == 8


def test_view_ordered_query_sort_survives_immutable_attach(
        spark, tmp_path, seq_collection):
    """ordered=True must place the sort AFTER the projection and the
    _attach_immutable crossJoin — Catalyst's EliminateSorts silently drops
    sorts buried under joins/projections (regression for the early
    orderBy)."""
    view = View.create(spark, str(tmp_path / "v"), base=seq_collection,
                       variables=[_derived_var()])

    def compute(pdf):
        return pd.DataFrame({"derived": [1.0] * len(pdf)})

    view.update(compute)
    df = view.query(ordered=True)
    assert "static" in df.columns  # immutables really attached
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lstrip().startswith("Sort"), plan.splitlines()[0]
    nums = [r["num"] for r in df.collect()]
    assert nums == sorted(nums)
