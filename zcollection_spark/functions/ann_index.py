"""Materialized IVF index: the cell id as a physical partition key.

:func:`similarity.ivf_topk` assigns cells on the fly (one matmul fused
into the corpus scan) — right for ad-hoc queries, but every search
still scans the whole corpus.  At scale you materialize the assignment
ONCE: :func:`write_ivf_index` writes the embeddings partitioned by
``cell=N/`` with the trained centroids in a ``_ivf_index.json``
sidecar, and :func:`query_ivf_index` reads ONLY the probed cells'
files — Catalyst partition pruning turns the ``n_probe/n_cells``
selectivity into an I/O fraction, which is the IVF promise expressed
as storage layout (the classic inverted-file structure as a
Hive-partitioned table).

Given the same centroids, ``query_ivf_index`` returns exactly what
``ivf_topk`` returns — the layout changes I/O, not results (pinned by
tests/test_ann_index.py).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..fs import fs_for
from .similarity import (_dot, _lloyd_kmeans, _norm, centroid_arrays,
                         make_cell_assigner, train_centroid_sample)

INDEX_SIDECAR = "_ivf_index.json"

#: Default ceiling for the driver-collected query side of index
#: lookups.  Top-k serving query sets are thousands of rows at most; a
#: million-row "query set" collected to the driver is almost always a
#: misuse (that workload belongs in the inline ivf/ivfpq_topk join
#: path) — and OOMing the driver is the worst way to find out.
MAX_QUERY_ROWS = 100_000


def _bounded_query_rows(queries: DataFrame, query_id_col: str,
                        query_vec_col: str, max_query_rows: int) -> list:
    """Collect the query side, enforcing the documented bounded-side
    contract: one job (``take(limit+1)``), a clear error instead of a
    driver OOM when the bound is exceeded."""
    rows = (queries.select(query_id_col, query_vec_col)
            .take(max_query_rows + 1))
    if len(rows) > max_query_rows:
        raise ValueError(
            f"query side exceeds max_query_rows={max_query_rows}: "
            f"index lookups collect queries to the driver by design "
            f"(bounded side); for corpus-scale query sets use the "
            f"inline ivf_topk/ivfpq_topk join path, or raise "
            f"max_query_rows= explicitly if the driver can hold it")
    return rows


def write_ivf_index(corpus: DataFrame, path: str, *, id_col: str,
                    vec_col: str, n_cells: int = 16, seed: int = 42,
                    train_cap: int = 100_000, max_iter: int = 10,
                    centroids: "list[list[float]] | None" = None
                    ) -> "list[list[float]]":
    """Train (or reuse) centroids, assign every vector its cell, and
    write the corpus partitioned by ``cell`` with a centroid sidecar.
    One scan, one shuffle-free write per input partition; returns the
    centroids (reuse them to index new batches consistently)."""
    if centroids is None:
        sample = train_centroid_sample(corpus, id_col, vec_col,
                                       train_cap, n_cells)
        centroids = _lloyd_kmeans(sample, n_cells, seed=seed,
                                  iters=max_iter)
    cent = [list(map(float, c)) for c in centroids]
    cent_np, cent_sq = centroid_arrays(cent)
    assign = make_cell_assigner(cent_np, cent_sq)
    (corpus.select(F.col(id_col), F.col(vec_col),
                   assign(vec_col).alias("cell"))
     .write.mode("overwrite").partitionBy("cell").parquet(path))
    fs = fs_for(path, corpus.sparkSession)
    fs.write_text(f"{path.rstrip('/')}/{INDEX_SIDECAR}", json.dumps({
        "format_version": 1, "id_col": id_col, "vec_col": vec_col,
        "id_type": corpus.schema[id_col].dataType.simpleString(),
        "n_cells": len(cent), "centroids": cent}))
    return cent


def query_ivf_index(spark: SparkSession, path: str, queries: DataFrame,
                    *, query_id_col: str,
                    query_vec_col: str | None = None,
                    k: int = 10, n_probe: int = 2,
                    max_query_rows: int = MAX_QUERY_ROWS) -> DataFrame:
    """ANN top-k against a materialized IVF index.

    Per query the ``n_probe`` nearest cells are computed driver-side
    from the sidecar centroids (queries are the bounded side), the scan
    is filtered with ``cell IN (...)`` so Catalyst prunes unprobed
    partition directories from I/O entirely, and exact cosine ranks
    only within each query's own probed cells — identical semantics to
    ``ivf_topk`` with the same centroids.
    """
    fs = fs_for(path, spark)
    meta = json.loads(fs.read_text(f"{path.rstrip('/')}/{INDEX_SIDECAR}"))
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    cent_np, cent_sq = centroid_arrays(meta["centroids"])
    n_probe_eff = min(n_probe, len(cent_np))
    query_vec_col = query_vec_col or vec_col

    qrows = _bounded_query_rows(queries, query_id_col, query_vec_col,
                                max_query_rows)
    probe_rows = []
    for r in qrows:
        v = np.asarray(r[1], dtype=np.float64)
        d2 = -2.0 * (cent_np @ v) + cent_sq
        for cell in np.argsort(d2, kind="stable")[:n_probe_eff]:
            probe_rows.append((r[0], int(cell), [float(x) for x in v]))
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    if not probe_rows:
        id_type = meta.get("id_type", "long")  # sidecar-recorded type
        return spark.createDataFrame(
            [], f"query_id {qid_type}, {id_col} {id_type}, "
                f"cosine double, rank int")
    probes = spark.createDataFrame(
        probe_rows, f"__qid {qid_type}, cell int, __qvec array<double>")
    probes = probes.withColumn("__qnorm", _norm(F.col("__qvec")))

    wanted_cells = sorted({c for _, c, _ in probe_rows})
    corpus = (spark.read.parquet(path)
              .where(F.col("cell").isin(wanted_cells))
              .select(F.col(id_col),
                      F.transform(vec_col, lambda v: v.cast("double"))
                      .alias("__cvec"),
                      F.col("cell"))
              .withColumn("__cnorm", _norm(F.col("__cvec"))))
    joined = corpus.join(F.broadcast(probes), on="cell")
    sim = (_dot(F.col("__cvec"), F.col("__qvec"))
           / (F.col("__cnorm") * F.col("__qnorm")))
    scored = joined.select(F.col("__qid").alias("query_id"),
                           F.col(id_col), sim.alias("cosine"))
    win = (Window.partitionBy("query_id")
           .orderBy(F.col("cosine").desc(), F.col(id_col).asc()))
    return (scored.withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# materialized IVF-PQ index: cell partitions of 8-byte code rows
# ---------------------------------------------------------------------------

PQ_SIDECAR = "_ivfpq_index.json"


def write_ivfpq_index(corpus: DataFrame, path: str, *, id_col: str,
                      vec_col: str, n_cells: int = 16, m: int = 8,
                      n_codes: int = 64, seed: int = 42,
                      train_cap: int = 100_000,
                      max_iter: int = 10,
                      meta: dict | None = None) -> dict:
    """Materialize the IVF-PQ index: ``cell=N/`` partitions of
    ``(id, codes)`` rows — the raw vectors are NOT stored.

    This is the memory-scale layout end to end: at dim=64 a code row
    is ~16 bytes of smallint payload vs 256 bytes of float32 (~16x
    smaller before parquet bit-packing shrinks the small code values
    further), and a probe reads only its cells' code files (Catalyst
    partition pruning).  Centroids + codebooks ride a JSON sidecar;
    pass a previous index's returned ``meta`` to REUSE its training —
    codes from different trainings are mutually incompatible, so
    consistent multi-batch indexing must share one — otherwise
    training is the same deterministic recipe as
    :func:`similarity.ivfpq_topk` (shared ``train_ivfpq``)."""
    from .similarity import make_pq_encoder, train_ivfpq

    if meta is not None:
        cent = [list(map(float, c)) for c in meta["centroids"]]
        books = np.asarray(meta["codebooks"], dtype=np.float64)
        m, n_codes = books.shape[0], books.shape[1]
    else:
        sample = train_centroid_sample(corpus, id_col, vec_col,
                                       train_cap, n_cells)
        cent, books = train_ivfpq(sample, n_cells=n_cells, m=m,
                                  n_codes=n_codes, seed=seed,
                                  iters=max_iter)
    cent_np, cent_sq = centroid_arrays(cent)
    encode = make_pq_encoder(cent_np, cent_sq, books)
    (corpus.select(F.col(id_col), encode(vec_col).alias("__pq"))
     .select(id_col, F.col("__pq.codes").alias("codes"),
             F.col("__pq.cell").alias("cell"))
     .write.mode("overwrite").partitionBy("cell").parquet(path))
    meta = {"format_version": 1, "id_col": id_col, "vec_col": vec_col,
            "id_type": corpus.schema[id_col].dataType.simpleString(),
            "n_cells": len(cent), "m": int(m), "n_codes": int(n_codes),
            "centroids": cent,
            "codebooks": [[[float(x) for x in row] for row in book]
                          for book in books]}
    fs = fs_for(path, corpus.sparkSession)
    fs.write_text(f"{path.rstrip('/')}/{PQ_SIDECAR}", json.dumps(meta))
    return meta


def query_ivfpq_index(spark: SparkSession, path: str,
                      queries: DataFrame, *, query_id_col: str,
                      query_vec_col: str | None = None, k: int = 10,
                      n_probe: int = 4,
                      refine_with: DataFrame | None = None,
                      refine_factor: int = 4,
                      max_query_rows: int = MAX_QUERY_ROWS) -> DataFrame:
    """ANN top-k against a materialized IVF-PQ index.

    Probe cells resolve driver-side from the sidecar (queries are the
    bounded side); the scan reads ONLY probed ``cell=N/`` partitions
    and ONLY code rows — no raw vectors touched.  ADC scores via the
    shared scorer; pass ``refine_with=corpus`` to re-rank the top
    ``refine_factor*k`` survivors with exact cosine (one id-join back
    to the raw vectors, candidates shrink first).  With the same
    training inputs, results match :func:`similarity.ivfpq_topk`
    (pinned by tests/test_ann_index.py)."""
    from .similarity import (driver_probe_rows, exact_rerank,
                             make_adc_scorer)

    fs = fs_for(path, spark)
    meta = json.loads(fs.read_text(f"{path.rstrip('/')}/{PQ_SIDECAR}"))
    id_col = meta["id_col"]
    cent_np, cent_sq = centroid_arrays(meta["centroids"])
    books = np.asarray(meta["codebooks"], dtype=np.float64)
    n_probe_eff = min(n_probe, len(cent_np))
    query_vec_col = query_vec_col or meta["vec_col"]

    qrows = _bounded_query_rows(queries, query_id_col, query_vec_col,
                                max_query_rows)
    probe_rows = driver_probe_rows(qrows, cent_np, cent_sq,
                                   n_probe_eff, normalize=True)
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    if not probe_rows:
        return spark.createDataFrame(
            [], f"query_id {qid_type}, {id_col} "
                f"{meta.get('id_type', 'long')}, cosine double, "
                f"rank int")
    probes = spark.createDataFrame(
        probe_rows, f"__qid {qid_type}, cell int, __qvec array<double>")

    wanted = sorted({c for _, c, _ in probe_rows})
    index = (spark.read.parquet(path)
             .where(F.col("cell").isin(wanted))
             .select(id_col, "codes", "cell"))
    joined = index.join(F.broadcast(probes), on="cell")
    adc = make_adc_scorer(cent_np, books)
    scored = joined.select(
        F.col("__qid").alias("query_id"), F.col(id_col),
        adc("__qvec", "cell", "codes").alias("cosine"))
    win = (Window.partitionBy("query_id")
           .orderBy(F.col("cosine").desc(), F.col(id_col).asc()))
    if refine_with is None:
        return (scored.withColumn("rank", F.row_number().over(win))
                .where(F.col("rank") <= k))
    cand = (scored.withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k * max(refine_factor, 1))
            .drop("rank", "cosine"))
    return exact_rerank(cand, refine_with, queries, id_col=id_col,
                        vec_col=meta["vec_col"],
                        query_id_col=query_id_col,
                        query_vec_col=query_vec_col, k=k)
