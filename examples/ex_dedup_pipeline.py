"""An LLM-training-data pipeline over the documents table: quality stats →
language ID → exact dedup → MinHash near-dedup → fingerprints.

Every stage is a JVM-side DataFrame program designed for 100 TB corpora
(see SCALING.md).  Run: ``python examples/ex_dedup_pipeline.py``
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import zcollection_spark as zc
from zcollection_spark.data import load_table
from zcollection_spark.functions import (dedup_exact, fingerprint,
                                         language_id, lsh_candidate_pairs,
                                         minhash_signatures, text_stats)


def main() -> None:
    spark = zc.get_spark("ex-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")

    # 1. quality features + filter (length / distinct-token gates)
    scored = text_stats(docs)
    kept = scored.where((F.col("n_tokens") >= 10)
                        & (F.col("distinct_ratio") >= 0.3))
    print(f"quality gate: {docs.count()} -> {kept.count()}")

    # 2. heuristic language ID
    tagged = language_id(kept)
    tagged.groupBy("lang_pred").count().show()

    # 3. exact dedup (hash-groupBy, keeps min doc_id)
    unique = dedup_exact(tagged, ["text"], "doc_id")

    # 4. MinHash + LSH near-duplicate candidates
    sigs = minhash_signatures(unique, id_col="doc_id", text_col="text",
                              num_hashes=16, shingle_size=3)
    pairs = lsh_candidate_pairs(sigs, id_col="doc_id", num_hashes=16,
                                bands=4)
    near_dup_ids = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    final = unique.join(near_dup_ids, on="doc_id", how="left_anti")
    print(f"near-dedup: {unique.count()} -> {final.count()} "
          f"({pairs.count()} candidate pairs)")

    # 5. order-sensitive fingerprints for downstream exact-match lookups
    final.select("doc_id", fingerprint("text").alias("fp")).show(5)

    # 6. SemDeDup on the embedding table: k-means cells block the
    # comparison space, pairs are exact cosine WITHIN a cell (the
    # low-threshold regime where LSH recall collapses), min-id
    # representative keeps the decision deterministic across rebuilds.
    from zcollection_spark.functions import semantic_dedup
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    verdicts = semantic_dedup(emb, id_col="vec_id",
                              vec_col="embedding", threshold=0.4,
                              n_cells=8)
    kept_n = verdicts.where("keep = 1").count()
    print(f"semantic dedup: {emb.count()} -> {kept_n} representatives")
    assert 0 < kept_n <= emb.count()

    # 7. span-level dedup (Lee et al. 2021): instead of dropping whole
    # documents, CUT every 8-token span that occurs verbatim in >= 2
    # documents — the unique remainder survives.  Both sides of a pair
    # are cut, so no victim ordering is needed across executors.
    from zcollection_spark.functions import drop_duplicated_spans
    scrubbed = drop_duplicated_spans(unique.select("doc_id", "text"),
                                     id_col="doc_id",
                                     text_col="text", n=8)
    cut = scrubbed.agg(
        F.sum("n_tokens").alias("before"),
        F.sum("n_tokens_kept").alias("after")).first()
    print(f"span scrub: {cut['before']} -> {cut['after']} tokens "
          f"({1 - cut['after'] / cut['before']:.1%} cut)")
    assert 0 < cut["after"] <= cut["before"]
    spark.stop()


if __name__ == "__main__":
    main()
