"""A data-mixture recipe end-to-end: census → mix → LM-filter →
edit-stable chunks → model-free embeddings (the round-16 operator
batch working together).

The mixture side of a pretraining corpus build:

1. ``domain_mix_weights`` computes the per-source token census and a
   temperature-flattened (τ=0.5) target mix — the GPT-3/LLaMA-style
   "epochs per source" table;
2. ``upsample_by_weight`` REALIZES that recipe deterministically
   (same multiset on every rebuild, any engine, any cluster size);
3. ``cross_lm_score`` scores every document under a bigram LM trained
   on one clean reference source — the CCNet/KenLM deployment shape —
   and the tail third is dropped;
4. ``cdc_chunks`` explodes survivors into content-defined chunks
   whose boundaries survive edits (chunk-level exact dedup across
   near-identical documents actually hits);
5. ``feature_hash_embeddings`` attaches model-free hashed vectors —
   ready for the ANN/semantic-dedup family without any model.

Run: ``python examples/ex_data_recipe.py``
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import zcollection_spark as zc
from zcollection_spark.data import load_table
from zcollection_spark.functions import (cdc_chunks, cross_lm_score,
                                         domain_mix_weights,
                                         feature_hash_embeddings,
                                         upsample_by_weight)


def main() -> None:
    spark = zc.get_spark("ex-data-recipe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text", "source")

    # 1. the mixture recipe table
    recipe = domain_mix_weights(docs, group_col="source",
                                temperature=0.5)
    print("-- domain mixture (first 5 sources) --")
    recipe.orderBy("source").show(5, truncate=False)

    # 2. realize the recipe: each source's token mass scales by its
    #    mix_weight, deterministically
    weights = {r["source"]: r["mix_weight"]
               for r in recipe.collect() if r["mix_weight"] is not None}
    mixed = upsample_by_weight(docs, id_col="doc_id",
                               strata_col="source", weights=weights)
    print(f"mixed corpus: {mixed.count()} rows "
          f"(from {docs.count()} documents)")

    # 3. LM-filter against the first source as the clean reference
    ref = docs.where(F.col("source") == "src0")
    scored = cross_lm_score(docs, ref)
    cut = scored.approxQuantile("mean_cond_p", [1 / 3], 0.01)[0]
    keep_ids = scored.where(F.col("mean_cond_p") >= cut) \
        .select("doc_id")
    survivors = docs.join(keep_ids, "doc_id")
    print(f"LM filter: kept {survivors.count()} of {docs.count()} "
          f"(cut at mean_cond_p >= {cut:.6f})")

    # 4. content-defined chunks (boundaries stable under edits)
    chunks = cdc_chunks(survivors, shingle_size=4, boundary_mod=8,
                        min_tokens=4)
    print("-- CDC chunk-length profile --")
    chunks.agg(F.count("*").alias("n_chunks"),
               F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
               F.max("n_tokens").alias("max_tokens")).show()
    dup_chunks = (chunks.groupBy("chunk_text")
                  .agg(F.count("*").alias("n"))
                  .where((F.col("n") > 1) & (F.length("chunk_text") > 0)))
    print(f"chunk-level exact-dup groups: {dup_chunks.count()}")

    # 5. model-free embeddings for the ANN family
    vecs = feature_hash_embeddings(survivors, dim=64)
    print("-- hashed embeddings (sparse rows, unit-norm per doc) --")
    vecs.groupBy("doc_id") \
        .agg(F.round(F.sum(F.col("value") * F.col("value")), 4)
             .alias("sq_norm"),
             F.count("*").alias("nnz")) \
        .orderBy("doc_id").show(3)

    spark.stop()


if __name__ == "__main__":
    main()
