"""tools/make_scale.py regression tests: the sf1 evidence in SCALING.md
rests on this generator — pin its invariants at a tiny factor so the
tool cannot rot silently."""

import subprocess
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    out = tmp_path_factory.mktemp("sfx")
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_scale.py"),
         "--src", SRC, "--factor", "3", "--out", str(out)],
        check=True, capture_output=True)
    return out


def test_row_counts_scale_exactly(scaled):
    for t in ("customer", "orders", "lineitem", "events",
              "documents", "embeddings"):
        src = duckdb.sql(
            f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        got = duckdb.sql(
            f"SELECT count(*) FROM '{scaled}/{t}.parquet'").fetchone()[0]
        assert got == 3 * src, t
    for t in ("region", "nation"):  # dimensions stay fixed
        src = duckdb.sql(
            f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        got = duckdb.sql(
            f"SELECT count(*) FROM '{scaled}/{t}.parquet'").fetchone()[0]
        assert got == src, t


def test_referential_integrity_holds(scaled):
    for fk, pk, a, b in (("o_custkey", "c_custkey", "orders", "customer"),
                         ("l_orderkey", "o_orderkey", "lineitem", "orders"),
                         ("l_partkey", "p_partkey", "lineitem", "part"),
                         ("l_suppkey", "s_suppkey", "lineitem", "supplier")):
        n = duckdb.sql(
            f"SELECT count(*) FROM '{scaled}/{a}.parquet' x "
            f"LEFT JOIN '{scaled}/{b}.parquet' y ON x.{fk} = y.{pk} "
            f"WHERE y.{pk} IS NULL").fetchone()[0]
        assert n == 0, f"orphans in {a}.{fk}"


def test_primary_keys_stay_unique(scaled):
    for t, k in (("orders", "o_orderkey"), ("documents", "doc_id"),
                 ("embeddings", "vec_id"), ("events", "event_id")):
        n, u = duckdb.sql(
            f"SELECT count(*), count(DISTINCT {k}) "
            f"FROM '{scaled}/{t}.parquet'").fetchone()
        assert n == u, t


def test_dup_structure_grows_linearly_not_quadratically(scaled):
    """Exact-dup surplus must be exactly factor x the source: the
    word-shuffle keeps within-copy dup groups intact while preventing
    cross-copy exact dups (which would make dedup workloads O(k^2)
    by data-construction artifact)."""
    q = "SELECT count(*) - count(DISTINCT md5(text)) FROM '{}/documents.parquet'"
    src = duckdb.sql(q.format(SRC)).fetchone()[0]
    got = duckdb.sql(q.format(scaled)).fetchone()[0]
    assert got == 3 * src


def test_embedding_norms_preserved(scaled):
    """np.roll preserves norms exactly — cluster geometry per copy is
    intact, so ANN/dedup behavior scales rather than degenerating."""
    import numpy as np
    import pyarrow.parquet as pq
    src = np.stack(pq.read_table(f"{SRC}/embeddings.parquet")
                   .to_pandas().embedding.to_numpy())
    out = np.stack(pq.read_table(f"{scaled}/embeddings.parquet")
                   .to_pandas().embedding.to_numpy())
    n = len(src)
    for copy in range(3):
        np.testing.assert_allclose(
            np.linalg.norm(out[copy * n:(copy + 1) * n], axis=1),
            np.linalg.norm(src, axis=1), rtol=1e-6)


def test_deterministic(scaled, tmp_path):
    """Same inputs -> byte-identical outputs (fixed seeds, no clock)."""
    out2 = tmp_path / "again"
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_scale.py"),
         "--src", SRC, "--factor", "3", "--out", str(out2)],
        check=True, capture_output=True)
    for t in ("documents", "embeddings", "lineitem"):
        a = (Path(scaled) / f"{t}.parquet").read_bytes()
        b = (out2 / f"{t}.parquet").read_bytes()
        assert a == b, t


def test_word_multiset_drifts_per_copy(scaled):
    """simhash is order-blind: replicas that keep the source word
    MULTISET are genuine near-dups to it, so cross-copy pair counts
    would grow O(k^2) by construction (the r7 verdict's dirty sf3
    point).  The token substitution must make every eligible replica's
    multiset differ from its source — while test_dup_structure above
    already pins that within-copy dup groups still survive exactly."""
    from collections import Counter
    src = duckdb.sql(
        f"SELECT text FROM '{SRC}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    out = duckdb.sql(
        f"SELECT text FROM '{scaled}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    n = len(src)
    eligible = drifted = 0
    for i in range(n):
        words = src[i][0].split()
        if len(words) < 2:
            continue
        eligible += 1
        drifted += Counter(out[n + i][0].split()) != Counter(words)
    assert eligible > 0 and drifted == eligible
