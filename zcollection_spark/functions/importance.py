"""Importance-weighted data selection (DSIR-style).

Data Selection via Importance Resampling (Xie et al. 2023) selects
pretraining documents whose token distribution resembles a TARGET
corpus (a high-quality seed set): each document gets an importance
weight — its likelihood ratio under bag-of-words unigram language
models of the target vs. the source corpus — and documents are sampled
WITHOUT replacement with probability proportional to the softmax of
those weights.  The published recipe hashes n-grams into buckets; on a
whitespace-tokenized corpus the plain unigram form below is the same
estimator with an exact vocabulary.

Scale design — two passes over the corpus, nothing driver-side:

1. two map-side-combined groupBys build the source and target unigram
   count tables (|vocab| rows each, not |corpus|), full-outer-joined
   into one smoothed log-ratio table;
2. the corpus token rows equi-join that table (AQE broadcasts a small
   vocabulary; at web scale it is a shuffle join on the token key)
   and re-aggregate per document — the same shape as
   ``text.unigram_stats``;
3. resampling is the Gumbel top-k device: adding an i.i.d. Gumbel draw
   to each log-weight and taking the global top-k IS sampling without
   replacement from the softmax distribution (Vieira 2014) — and the
   Gumbel comes from the repo's deterministic md5 uniform
   (``sampling.uniform_draw``), so the SAMPLE is a pure function of
   (corpus, target, salt): reproducible across engines, cluster sizes
   and insertion orders, exactly like ``hash_split``.  The global
   top-k is ``orderBy().limit(k)`` — Spark's TakeOrdered, a
   per-partition partial top-k merged on the driver, k-bounded.

``ln`` is the one non-IEEE-exact operation (1 ulp in both engines);
log-weights and Gumbel keys are rounded (default 6 dp) before any
ranking or hashing, the same device the BM25/cosine families use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _attach_cached, _pin_wide
from .sampling import uniform_draw
from .text import word_shingles, words


def _features(frame: DataFrame, text_col: str, shingle_size: int,
              hash_buckets: int | None, *extra_cols):
    """The DSIR feature expansion: one row per token (unigram form) or
    per word n-gram, optionally md5-hashed into ``hash_buckets``
    buckets (the paper's fixed-dimension estimator — collisions are
    part of the model, identical on both corpus sides and in the SQL
    twin)."""
    from .dedup import md5_long
    if shingle_size == 1:
        feat = F.explode(words(text_col))
    else:
        feat = F.explode(word_shingles(text_col, shingle_size))
    feat = feat.alias("__tok")
    out = frame.select(*extra_cols, feat)
    if hash_buckets is not None:
        out = out.select(*extra_cols,
                         F.pmod(md5_long(F.col("__tok")),
                                F.lit(hash_buckets)).alias("__tok"))
    return out


def importance_weights(corpus: DataFrame, target: DataFrame, *,
                       id_col: str, text_col: str = "text",
                       target_text_col: str | None = None,
                       shingle_size: int = 1,
                       hash_buckets: int | None = None,
                       round_to: int = 6) -> DataFrame:
    """Per-document DSIR importance weight: the bag-of-features
    log-likelihood ratio of the document under add-one-smoothed unigram
    models of ``target`` vs. ``corpus``.

    The default feature is the word itself (``shingle_size=1``,
    exact vocabulary); ``shingle_size=2, hash_buckets=10_000`` is the
    published recipe's hashed-bigram estimator — n-grams md5-hashed
    into a FIXED feature dimension, so the count tables stay
    ``hash_buckets``-sized however large the corpus vocabulary grows
    (the scale knob: an unbounded n-gram vocab is Heaps-law-sized;
    the hashed form is O(buckets) with collisions folded into both
    models identically, which is exactly the paper's estimator).

    Returns one row per corpus document: ``(id_col, n_tokens,
    log_weight)`` where ``log_weight = Σ_features ln(p̂_target(w) /
    p̂_corpus(w))`` with both models smoothed over the UNION feature
    vocabulary (so every corpus feature has a finite ratio even when
    absent from the target); ``n_tokens`` counts the document's
    FEATURES — tokens at ``shingle_size=1``, n-grams (or hashed
    buckets, with multiplicity) otherwise.  High = the document reads like the target distribution;
    the weight is length-coupled by construction (a long on-target
    document outweighs a short one), which is the paper's estimator —
    normalize by ``n_tokens`` downstream if a per-token score is
    wanted.

    The smoothed ratio is computed as one ``ln`` of exact double
    products (``(c_t+1)·(T_s+V)`` vs ``(c_s+1)·(T_t+V)``) per VOCAB
    row, not per token occurrence; the per-document sum is rounded to
    ``round_to`` dp.  The vocab table is persisted (it feeds the
    scalar totals and the per-token join) and attached under the
    dedup-family cache contract — release with
    ``unpersist_intermediates`` / ``released``.
    """
    if round_to < 0:
        raise ValueError("round_to must be >= 0")
    if shingle_size < 1:
        raise ValueError("shingle_size must be >= 1")
    if hash_buckets is not None and hash_buckets < 1:
        raise ValueError("hash_buckets must be >= 1")
    src_tok = _features(corpus, text_col, shingle_size, hash_buckets,
                        F.col(id_col))
    tgt_tok = _features(target, target_text_col or text_col,
                        shingle_size, hash_buckets)
    c_s = src_tok.groupBy("__tok").agg(F.count(F.lit(1)).alias("__cs"))
    c_t = tgt_tok.groupBy("__tok").agg(F.count(F.lit(1)).alias("__ct"))
    # the vocab table feeds the scalar totals AND the per-token join;
    # it grows with the vocabulary (Heaps' law), so it pins through
    # the family materialization knob like the shingle expansions
    vocab, vocab_h = _pin_wide(
        c_s.join(c_t, on="__tok", how="full")
        .select(F.col("__tok"),
                F.coalesce("__cs", F.lit(0)).alias("__cs"),
                F.coalesce("__ct", F.lit(0)).alias("__ct")))
    # scalar totals reduce from the (small) vocab table; joined back
    # via a broadcast cross join — no collect, no driver round-trip
    scal = vocab.agg(F.count(F.lit(1)).cast("double").alias("__v"),
                     F.sum("__cs").cast("double").alias("__ts"),
                     F.sum("__ct").cast("double").alias("__tt"))
    lr = (vocab.crossJoin(F.broadcast(scal))
          .select("__tok",
                  (F.log((F.col("__ct") + F.lit(1.0))
                         * (F.col("__ts") + F.col("__v")))
                   - F.log((F.col("__cs") + F.lit(1.0))
                           * (F.col("__tt") + F.col("__v"))))
                  .alias("__lr")))
    out = (src_tok.join(lr, on="__tok")
           .groupBy(id_col)
           .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                F.round(F.sum("__lr"), round_to).alias("log_weight")))
    return _attach_cached(out, vocab_h)


def importance_resample(corpus: DataFrame, target: DataFrame, *,
                        id_col: str, k: int, text_col: str = "text",
                        target_text_col: str | None = None,
                        shingle_size: int = 1,
                        hash_buckets: int | None = None,
                        salt: str = "", round_to: int = 6) -> DataFrame:
    """Gumbel top-``k`` importance resampling: ``k`` corpus documents
    drawn WITHOUT replacement with probability ∝ exp(log_weight) —
    the DSIR selection step, made deterministic.

    Each document's key is ``log_weight + Gumbel(u)`` with
    ``Gumbel(u) = -ln(-ln(u))`` and ``u`` the md5 uniform of
    ``(id, salt)`` — the standard Gumbel-max construction, so the
    top-``k`` by key is an exact softmax sample, yet a pure function
    of the inputs (change ``salt`` to redraw).  Returns
    ``(id_col, n_tokens, log_weight, gumbel_key, rank)``, rank
    1-based by descending key with ties broken by ascending id.

    The uniform is clamped away from 0 (probability 16⁻¹⁵ per row)
    so the double ``ln`` never produces ±inf; keys are rounded before
    ranking for the cross-engine replay contract.

    The final rank is a window over the ``k`` survivors of the
    TakeOrdered ``limit(k)`` — a single task sorting exactly ``k``
    rows, which is the right plan for sampling-sized ``k`` and a
    wrong one for corpus-sized ``k``; config
    ``sampling.gumbel_topk_cap`` makes that bound loud
    (:class:`~zcollection_spark.errors.DriverBoundExceededError`)
    instead of letting a huge ``k`` silently funnel the corpus
    through one task.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from .. import config
    from ..errors import DriverBoundExceededError
    cap = config.get("sampling.gumbel_topk_cap")
    if k > cap:
        raise DriverBoundExceededError(
            f"importance_resample ranks its k survivors in a single "
            f"task; k={k} exceeds {cap} (config "
            f"'sampling.gumbel_topk_cap').  A corpus-sized draw wants "
            f"a threshold on gumbel_key, not a global top-k — or "
            f"raise the cap if a {k}-row single-task sort is "
            f"acceptable.")
    w = importance_weights(corpus, target, id_col=id_col,
                           text_col=text_col,
                           target_text_col=target_text_col,
                           shingle_size=shingle_size,
                           hash_buckets=hash_buckets,
                           round_to=round_to)
    u = F.greatest(uniform_draw(id_col, salt), F.lit(1e-15))
    key = F.round(F.col("log_weight") - F.log(-F.log(u)), round_to)
    order = [F.col("gumbel_key").desc(), F.col(id_col).asc()]
    top = (w.withColumn("gumbel_key", key)
           .orderBy(*order).limit(k))
    # the rank window runs over the k survivors only (k-bounded)
    out = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)))
    return _attach_cached(out, *getattr(w, "_zc_cached", ()))
