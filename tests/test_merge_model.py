"""Property test: merge strategies vs a numpy reference model.

The tolerance upsert is the subtlest semantic in the engine (SURVEY §7
"hard parts" #3): the reference keeps an existing row iff its axis value
has no nearest-inserted-value within tolerance (``searchsorted``,
``merge.py:262-272``).  We pin the Spark implementation against a literal
numpy reimplementation of that algorithm over randomized inputs.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import zcollection_spark as zc


def numpy_upsert_model(existing: np.ndarray, inserted: np.ndarray,
                       tolerance: float | None) -> np.ndarray:
    """The reference's keep-set, re-implemented per merge.py:189-279."""
    if tolerance is None:
        keep = ~np.isin(existing, inserted)
    else:
        ins = np.sort(np.unique(inserted))
        pos = np.searchsorted(ins, existing)
        dist = np.full(existing.shape, np.inf)
        left_ok = pos > 0
        dist[left_ok] = np.minimum(
            dist[left_ok], np.abs(existing[left_ok] - ins[pos[left_ok] - 1]))
        right_ok = pos < len(ins)
        dist[right_ok] = np.minimum(
            dist[right_ok], np.abs(existing[right_ok] - ins[pos[right_ok]]))
        keep = dist > tolerance
    return np.sort(np.concatenate([existing[keep], inserted]))


@pytest.mark.parametrize("tolerance", [None, 0.0, 1.5, 10.0])
@given(
    existing=st.lists(st.integers(0, 60), min_size=1, max_size=25,
                      unique=True),
    inserted=st.lists(st.integers(0, 60), min_size=1, max_size=10,
                      unique=True),
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_upsert_matches_numpy_model(spark, tmp_path_factory, tolerance,
                                    existing, inserted):
    existing_arr = np.array(sorted(existing), dtype=np.float64)
    inserted_arr = np.array(sorted(inserted), dtype=np.float64)
    want = numpy_upsert_model(existing_arr, inserted_arr, tolerance)

    # single-partition collection on an integer axis (values 0..60 → one
    # Sequence partition via constant key), merge through the engine
    tmp = tmp_path_factory.mktemp("upsert_model")
    schema = (zc.SchemaBuilder().add_dimension("t")
              .add_variable("t", "float64", ("t",))
              .add_variable("part", "int64", ("t",)).build())
    coll = zc.create_collection(
        spark, str(tmp / "c"), schema=schema, axis="t",
        partitioning=zc.Sequence(("part",)))

    def frame(vals):
        return spark.createDataFrame(pd.DataFrame({
            "t": vals, "part": np.zeros(len(vals), dtype=np.int64)}))

    coll.insert(frame(existing_arr))
    merge = "upsert" if tolerance is None else zc.upsert_within(tolerance)
    coll.insert(frame(inserted_arr), merge=merge)
    got = np.sort(coll.query().toPandas()["t"].to_numpy())
    np.testing.assert_array_equal(got, want)


def test_fragmented_key_insert_is_safe(spark, tmp_path):
    """Quirk Q3: the reference races per-contiguous-run writes when input
    is unsorted (silent data loss); the shuffle-by-key write fixes it —
    shuffled input with repeated keys keeps every row."""
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "t": np.arange(300, dtype=np.int64),
        "key": rng.integers(0, 3, size=300).astype(np.int64)})
    pdf = pdf.sample(frac=1.0, random_state=1).reset_index(drop=True)
    schema = (zc.SchemaBuilder().add_dimension("t")
              .add_variable("t", "int64", ("t",))
              .add_variable("key", "int64", ("t",)).build())
    coll = zc.create_collection(
        spark, str(tmp_path / "frag"), schema=schema, axis="t",
        partitioning=zc.Sequence(("key",)))
    coll.insert(spark.createDataFrame(pdf))
    assert coll.query().count() == 300  # nothing lost
    per_key = {r["key"]: r["count"] for r in
               coll.query().groupBy("key").count().collect()}
    want = pdf.groupby("key").size().to_dict()
    assert per_key == want
