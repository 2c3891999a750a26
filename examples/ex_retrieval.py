"""Hybrid retrieval end-to-end: BM25 + dense cosine, fused with RRF,
plus the corpus-statistical quality signals.

The retrieval shape of a curation / RAG stack over a 100 TB corpus:

1. ``bm25_topk`` — sparse lexical top-k (Robertson BM25): probe terms
   broadcast, the corpus never re-partitions, two-stage salted top-k;
2. ``brute_force_topk`` — dense exact-cosine top-k over the embedding
   table (swap in ``ivf_topk``/``lsh_bucket_topk`` at scale);
3. ``rrf_fuse`` — reciprocal-rank fusion of both lists: consumes only
   ranks, so no score calibration, and items both retrievers agree on
   surface first (``n_lists = 2``);
4. ``bigram_lm_score`` / ``duplicated_span_stats`` — corpus-trained
   quality + redundancy signals for the retrieved set (what a hard-
   negative miner or dedup-aware eval builder filters on).

Run: ``python examples/ex_retrieval.py``
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import zcollection_spark as zc
from zcollection_spark.data import load_table
from zcollection_spark.functions import (bigram_lm_score,
                                         brute_force_topk,
                                         duplicated_span_stats,
                                         bm25_topk, rrf_fuse)


def main() -> None:
    spark = zc.get_spark("ex-retrieval")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")

    # 1. sparse: the first three documents' own text as probe queries
    probes = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("query_text"))
    sparse = bm25_topk(docs, probes, id_col="doc_id",
                       text_col="text", k=10)
    # each probe's own document ranks near the top (not always rank 1:
    # the synthetic corpus shares a ~30-word vocabulary, so BM25's
    # length normalization can put a shorter term-dense doc first)
    self_hits = sparse.where((F.col("query_id") == F.col("doc_id"))
                             & (F.col("rank") <= 3)).count()
    print(f"bm25: {sparse.count()} results, "
          f"{self_hits}/3 probes rank their own doc in the top 3")
    assert self_hits == 3

    # 2. dense: exact cosine over the embedding table
    dense = brute_force_topk(emb, emb.where(F.col("vec_id") < 3),
                             id_col="vec_id", vec_col="embedding",
                             query_id_col="vec_id", k=10)

    # 3. hybrid: RRF — ranks only, no score calibration
    fused = rrf_fuse(
        [sparse.select("query_id", "doc_id", "rank"),
         dense.select("query_id", F.col("vec_id").alias("doc_id"),
                      "rank")],
        id_col="doc_id")
    both = fused.where(F.col("n_lists") == 2).count()
    top = fused.where(F.col("rank") == 1)
    print(f"hybrid: {fused.count()} fused candidates, "
          f"{both} ranked by both retrievers")
    assert top.count() == 3

    # 4. quality + redundancy signals on the retrieved set
    hits = fused.select("doc_id").distinct()
    lm = bigram_lm_score(docs.join(hits, on="doc_id"))
    spans = duplicated_span_stats(docs.join(hits, on="doc_id"), n=8)
    profile = (lm.join(spans, on="doc_id")
               .agg(F.round(F.avg("mean_cond_p"), 3).alias("avg_lm"),
                    F.round(F.avg("dup_ratio"), 3).alias("avg_dup"))
               .first())
    print(f"retrieved-set profile: mean P(w2|w1) {profile['avg_lm']}, "
          f"duplicated-span share {profile['avg_dup']}")
    assert 0 < profile["avg_lm"] <= 1
    spark.stop()


if __name__ == "__main__":
    main()
