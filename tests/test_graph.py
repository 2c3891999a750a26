"""Connected components vs a driver-side union-find oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from zcollection_spark.functions.graph import (connected_components,
                                               dedup_clusters)


def union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed", [3, 17])
def test_components_match_union_find(spark, seed):
    rng = np.random.default_rng(seed)
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, 60, size=(80, 2)) if a != b]
    want = union_find(edges)
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["x", "y"]))
    got = {r["node"]: r["component"]
           for r in connected_components(df, "x", "y").collect()}
    assert got == want


def test_components_chain_and_clique(spark):
    # a 6-node path (diameter stress) + a separate triangle
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
             (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["x", "y"]))
    got = {r["node"]: r["component"]
           for r in connected_components(df, "x", "y").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
                   10: 10, 11: 10, 12: 10}


def test_dedup_clusters_canonical_is_min(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame([(7, 3), (3, 9), (20, 21)], columns=["id_a", "id_b"]))
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup_clusters(pairs, "id_a", "id_b").collect()}
    assert got == {3: 3, 7: 3, 9: 3, 20: 20, 21: 20}
