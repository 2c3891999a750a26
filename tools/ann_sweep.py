"""Recall-vs-cost sweep for the ANN paths (VERDICT r4 ask #3).

Runs lsh_bucket_topk over an (n_planes, n_tables) grid and ivf_topk
over an (n_cells, n_probe) grid at $SPARK_GRAFT_SF_DIR, measuring
mean recall@10 against the exact brute-force baseline and wall seconds
per configuration.  Writes ANN_SWEEP.json at the repo root (bench.py
embeds it into its counters) and prints the curve.

Usage:  python tools/ann_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import zcollection_spark as zc  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from zcollection_spark.data import load_table  # noqa: E402
from zcollection_spark.functions import (  # noqa: E402
    brute_force_topk, ivf_topk, lsh_bucket_topk)

K = 10


def _topk_sets(df) -> dict:
    sets: dict = {}
    for r in df.collect():
        sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    return sets


def _recall(exact: dict, approx: dict) -> float:
    rec = [len(exact[q] & approx.get(q, set())) / len(exact[q])
           for q in exact]
    return round(sum(rec) / len(rec), 3)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = zc.get_spark("ann-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings").persist()
    emb.count()
    queries = emb.where(F.col("vec_id") < 5)

    exact = _topk_sets(
        brute_force_topk(emb, queries, id_col="vec_id",
                         vec_col="embedding", query_id_col="vec_id", k=K))

    out: dict = {"sf_dir": sf_dir, "k": K, "lsh": [], "ivf": []}

    for n_planes in (4, 6, 8):
        for n_tables in (8, 16, 32):
            t0 = time.monotonic()
            approx = _topk_sets(lsh_bucket_topk(
                emb, queries, id_col="vec_id", vec_col="embedding",
                query_id_col="vec_id", k=K,
                n_planes=n_planes, n_tables=n_tables))
            sec = round(time.monotonic() - t0, 3)
            row = {"n_planes": n_planes, "n_tables": n_tables,
                   "recall": _recall(exact, approx), "sec": sec}
            out["lsh"].append(row)
            print("lsh ", json.dumps(row), flush=True)

    for n_cells in (16, 64):
        for n_probe in (2, 4, 8):
            t0 = time.monotonic()
            approx = _topk_sets(ivf_topk(
                emb, queries, id_col="vec_id", vec_col="embedding",
                query_id_col="vec_id", k=K,
                n_cells=n_cells, n_probe=n_probe))
            sec = round(time.monotonic() - t0, 3)
            row = {"n_cells": n_cells, "n_probe": n_probe,
                   "recall": _recall(exact, approx), "sec": sec}
            out["ivf"].append(row)
            print("ivf ", json.dumps(row), flush=True)

    # the footer-auto-tuned GRADED operating points (r9: suggest_*_config
    # replaced the fixed low-recall defaults) — measured alongside the
    # grid so the graded recall claim is evidence, not interpolation
    from zcollection_spark.entry_queries import (_knn_ivf_config,
                                                 _knn_lsh_config)
    a_planes, a_tables = _knn_lsh_config(sf_dir)
    t0 = time.monotonic()
    approx = _topk_sets(lsh_bucket_topk(
        emb, queries, id_col="vec_id", vec_col="embedding",
        query_id_col="vec_id", k=K,
        n_planes=a_planes, n_tables=a_tables))
    row = {"n_planes": a_planes, "n_tables": a_tables,
           "recall": _recall(exact, approx),
           "sec": round(time.monotonic() - t0, 3), "graded_auto": True}
    out["lsh"].append(row)
    print("lsh* ", json.dumps(row), flush=True)
    a_cells, a_probe = _knn_ivf_config(sf_dir)
    t0 = time.monotonic()
    approx = _topk_sets(ivf_topk(
        emb, queries, id_col="vec_id", vec_col="embedding",
        query_id_col="vec_id", k=K, n_cells=a_cells, n_probe=a_probe))
    row = {"n_cells": a_cells, "n_probe": a_probe,
           "recall": _recall(exact, approx),
           "sec": round(time.monotonic() - t0, 3), "graded_auto": True}
    out["ivf"].append(row)
    print("ivf* ", json.dumps(row), flush=True)

    # IVF-PQ: the round-5 sweep varied n_probe only (at m=8, refine=4)
    # and recall plateaued at 0.72 — the numpy replay in round 6 showed
    # the binding constraints are m (subspace width) and refine_factor
    # (exact-rerank pool), NOT the coarse quantizer.  Sweep those two
    # axes so the chosen config is measured evidence.
    from zcollection_spark.functions.similarity import ivfpq_topk
    out["ivfpq"] = []
    for m, n_codes in ((8, 128), (16, 64)):
        for n_probe, refine in ((8, 4), (8, 8), (12, 8), (12, 16)):
            t0 = time.monotonic()
            approx = _topk_sets(ivfpq_topk(
                emb, queries, id_col="vec_id", vec_col="embedding",
                query_id_col="vec_id", k=K, n_cells=16,
                n_probe=n_probe, m=m, n_codes=n_codes,
                refine_factor=refine))
            sec = round(time.monotonic() - t0, 3)
            row = {"n_cells": 16, "m": m, "n_codes": n_codes,
                   "n_probe": n_probe, "refine_factor": refine,
                   "recall": _recall(exact, approx), "sec": sec}
            out["ivfpq"].append(row)
            print("ivfpq ", json.dumps(row), flush=True)

    target = Path(__file__).resolve().parent.parent / "ANN_SWEEP.json"
    target.write_text(json.dumps(out, indent=1))
    print(f"wrote {target}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
