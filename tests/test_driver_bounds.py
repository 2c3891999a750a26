"""Hard caps on the documented driver-side collects (r12 verdict).

Three call sites deliberately materialize a bounded set on the driver:
``brute_force_topk``'s query set, ``embedding_dup_pairs``'s
``method="broadcast"`` comparison set, and ``insert``'s partition-key
enumeration.  Each bound is a cardinality with a config knob; past it
the call must fail FAST and LOUD (``DriverBoundExceededError`` naming
the knob and the scale path) instead of OOMing the driver — and the
check itself must stay bounded (``limit(cap + 1)``), never a full
count of an unbounded input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import zcollection_spark as zc
from zcollection_spark import config
from zcollection_spark.errors import DriverBoundExceededError
from zcollection_spark.functions.similarity import (
    brute_force_topk, embedding_dup_pairs)


def _vecs(spark, n, dim=4, seed=0):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(rng.normal(size=(n, dim)).astype("float32"))})
    return spark.createDataFrame(pdf)


def test_brute_force_topk_query_cap(spark):
    corpus = _vecs(spark, 40)
    queries = _vecs(spark, 8, seed=1)
    with config.override(**{"similarity.broadcast_query_cap": 5}):
        with pytest.raises(DriverBoundExceededError,
                           match="broadcast_query_cap.*lsh_bucket_topk"):
            brute_force_topk(corpus, queries, id_col="vec_id",
                             vec_col="embedding", query_id_col="vec_id")
    # at the bound, unaffected
    with config.override(**{"similarity.broadcast_query_cap": 8}):
        out = brute_force_topk(corpus, queries, id_col="vec_id",
                               vec_col="embedding", query_id_col="vec_id",
                               k=3)
        assert out.count() == 8 * 3


def test_dup_pairs_broadcast_rows_cap(spark):
    df = _vecs(spark, 30)
    with config.override(**{"similarity.broadcast_rows_cap": 10}):
        with pytest.raises(DriverBoundExceededError,
                           match="broadcast_rows_cap.*method='lsh'"):
            embedding_dup_pairs(df, id_col="vec_id", vec_col="embedding",
                                threshold=0.9, method="broadcast")
        # the distributed paths ignore the broadcast cap entirely
        assert embedding_dup_pairs(
            df, id_col="vec_id", vec_col="embedding",
            threshold=0.999, method="block").count() >= 0
    with config.override(**{"similarity.broadcast_rows_cap": 30}):
        embedding_dup_pairs(df, id_col="vec_id", vec_col="embedding",
                            threshold=0.999, method="broadcast").count()


def _mk_coll(spark, path):
    schema = (zc.SchemaBuilder()
              .add_dimension("i")
              .add_variable("i", "int64", ("i",))
              .add_variable("value", "float64", ("i",))
              .add_variable("num", "int64", ("i",))
              .build())
    return zc.create_collection(
        spark, path, schema=schema, axis="i",
        partitioning=zc.Sequence(("num",)))


def test_insert_partition_key_cap(spark, tmp_path):
    coll = _mk_coll(spark, str(tmp_path / "cap"))
    n = 12
    pdf = pd.DataFrame({
        "i": np.arange(n, dtype=np.int64),
        "value": np.ones(n),
        "num": np.arange(n, dtype=np.int64)})   # 12 distinct keys
    df = spark.createDataFrame(pdf, schema=coll.schema.to_struct_type())
    with config.override(**{"insert.partition_key_cap": 5}):
        with pytest.raises(DriverBoundExceededError,
                           match="partition_key_cap.*coarsen"):
            coll.insert(df)
    # nothing was published by the refused insert
    assert coll.partitions() == []
    coll.insert(df)                              # default cap: fine
    assert len(coll.partitions()) == n


def test_zarr_insert_partition_key_cap(spark, tmp_path):
    from zcollection_spark.zarr3.collection import create_zarr_collection
    schema = (zc.SchemaBuilder()
              .add_dimension("i")
              .add_variable("i", "int64", ("i",))
              .add_variable("num", "int64", ("i",))
              .build())
    coll = create_zarr_collection(
        spark, str(tmp_path / "zcap"), schema=schema, axis="i",
        partitioning=zc.Sequence(("num",)))
    pdf = pd.DataFrame({"i": np.arange(8, dtype=np.int64),
                        "num": np.arange(8, dtype=np.int64)})
    df = spark.createDataFrame(pdf, schema=coll.schema.to_struct_type())
    with config.override(**{"insert.partition_key_cap": 3}):
        with pytest.raises(DriverBoundExceededError):
            coll.insert(df)
    assert coll.partitions() == []


def test_bm25_broadcast_terms_cap(spark):
    """bm25_scores enforces the probe-set contract: an exploded
    (query, term) frame past the cap raises loudly BEFORE any
    broadcast hint applies; at the bound the scores are unaffected."""
    from zcollection_spark.functions import bm25_scores
    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha delta")],
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "alpha beta"), (1, "delta gamma epsilon")],
        "query_id long, query_text string")   # 5 (query, term) rows
    with config.override(**{"retrieval.broadcast_terms_cap": 4}):
        with pytest.raises(DriverBoundExceededError,
                           match="broadcast_terms_cap"):
            bm25_scores(corpus, queries, id_col="doc_id",
                        text_col="text").collect()
    with config.override(**{"retrieval.broadcast_terms_cap": 5}):
        out = bm25_scores(corpus, queries, id_col="doc_id",
                          text_col="text")
        assert out.count() == 4   # (q0,d0) (q0,d1) (q1,d0) (q1,d1)


def test_importance_resample_gumbel_topk_cap(spark):
    """importance_resample's single-task rank bound is loud: k past
    sampling.gumbel_topk_cap raises BEFORE any job runs; at the bound
    the draw is unaffected."""
    from zcollection_spark.functions import importance_resample
    corpus = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma"), (2, "gamma delta")],
        "doc_id long, text string")
    target = spark.createDataFrame([(0, "alpha beta")],
                                   "t long, text string")
    with config.override(**{"sampling.gumbel_topk_cap": 1}):
        with pytest.raises(DriverBoundExceededError,
                           match="gumbel_topk_cap"):
            importance_resample(corpus, target, id_col="doc_id", k=2)
    with config.override(**{"sampling.gumbel_topk_cap": 2}):
        assert importance_resample(corpus, target, id_col="doc_id",
                                   k=2).count() == 2
