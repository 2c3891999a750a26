"""Unit tests for the LLM-pipeline functions on small synthetic frames."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from zcollection_spark.functions import (brute_force_topk, dedup_exact,
                                         embedding_dup_pairs,
                                         exact_duplicate_groups,
                                         ivf_topk, lsh_bucket_topk,
                                         lsh_candidate_pairs,
                                         minhash_signatures,
                                         ngram_jaccard_pairs, simhash,
                                         simhash_duplicate_pairs,
                                         text_stats, token_count, words)
from zcollection_spark.functions.similarity import _lloyd_kmeans


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (3, "completely different words entirely here now"),
        (4, "zzz yyy xxx www vvv uuu"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = exact_duplicate_groups(docs, ["text"], "doc_id").collect()
    assert len(groups) == 1 and groups[0]["keep_id"] == 0 \
        and groups[0]["n_dups"] == 2
    kept = dedup_exact(docs, ["text"], "doc_id")
    assert kept.count() == 4
    assert 2 not in {r["doc_id"] for r in kept.collect()}


def test_minhash_identical_docs_share_signature(spark, docs):
    sigs = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(8))
            for r in minhash_signatures(docs, id_col="doc_id",
                                        text_col="text",
                                        num_hashes=8).collect()}
    assert sigs[0] == sigs[2]          # exact dup → identical signature
    assert sigs[0] != sigs[3]          # unrelated → different


def test_lsh_finds_exact_and_near_dups(spark, docs):
    sigs = minhash_signatures(docs, id_col="doc_id", text_col="text",
                              num_hashes=8)
    pairs = {(r["id_a"], r["id_b"]) for r in
             lsh_candidate_pairs(sigs, id_col="doc_id", num_hashes=8,
                                 bands=4).collect()}
    assert (0, 2) in pairs             # exact dup always collides
    assert not any(3 in p or 4 in p for p in pairs)


def test_ngram_jaccard_scores(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text",
                                 shingle_size=3,
                                 threshold=0.1).collect()}
    assert pairs[(0, 2)] == 1.0        # identical shingle sets
    assert 0 < pairs[(0, 1)] < 1.0     # near-dup
    assert (0, 3) not in pairs


def test_simhash_exact_dup_identical(spark, docs):
    sigs = {r["doc_id"]: r["simhash"] for r in
            simhash(docs, id_col="doc_id", text_col="text").collect()}
    assert sigs[0] == sigs[2]
    pairs = {(r["id_a"], r["id_b"]) for r in
             simhash_duplicate_pairs(docs, id_col="doc_id",
                                     text_col="text").collect()}
    assert (0, 2) in pairs


def test_embedding_dup_pairs(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # ~parallel to 0
        (2, [0.0, 1.0, 0.0]),      # orthogonal
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    pairs = embedding_dup_pairs(df, id_col="vec_id", vec_col="embedding",
                                threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]


def test_brute_force_topk_self_is_rank1(spark):
    rng = np.random.default_rng(0)
    pdf = pd.DataFrame({
        "vec_id": np.arange(20, dtype=np.int64),
        "embedding": [rng.normal(size=8).astype(np.float32).tolist()
                      for _ in range(20)]})
    df = spark.createDataFrame(pdf)
    topk = brute_force_topk(df, df.where(F.col("vec_id") < 3),
                            id_col="vec_id", vec_col="embedding",
                            query_id_col="vec_id", k=3)
    first = {r["query_id"]: r["vec_id"] for r in
             topk.where(F.col("rank") == 1).collect()}
    assert first == {0: 0, 1: 1, 2: 2}  # every vector's NN is itself


def _vec_df(spark, n=20, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [rng.normal(size=dim).astype(np.float32).tolist()
                      for _ in range(n)]})
    return spark.createDataFrame(pdf)


def test_ivf_topk_self_rank1_and_deterministic(spark):
    df = _vec_df(spark)
    queries = df.where(F.col("vec_id") < 3)
    kwargs = dict(id_col="vec_id", vec_col="embedding",
                  query_id_col="vec_id", k=3, n_cells=4, n_probe=2)
    run1 = sorted(map(tuple, ivf_topk(df, queries, **kwargs)
                      .select("query_id", "vec_id", "rank").collect()))
    run2 = sorted(map(tuple, ivf_topk(df, queries, **kwargs)
                      .select("query_id", "vec_id", "rank").collect()))
    assert run1 == run2  # seeded centroids + stable tie-breaks
    # a query drawn from the corpus probes its own cell first, so its
    # nearest neighbor is itself
    first = {q: v for q, v, r in run1 if r == 1}
    assert first == {0: 0, 1: 1, 2: 2}


def test_ivf_topk_clamps_cells_to_corpus(spark):
    df = _vec_df(spark, n=3)
    out = ivf_topk(df, df, id_col="vec_id", vec_col="embedding",
                   query_id_col="vec_id", k=2, n_cells=8,
                   n_probe=4).collect()
    assert len(out) == 6  # 3 queries x top-2 from 3 candidates


def test_lsh_bucket_topk_self_rank1(spark):
    df = _vec_df(spark)
    topk = lsh_bucket_topk(df, df.where(F.col("vec_id") < 3),
                           id_col="vec_id", vec_col="embedding",
                           query_id_col="vec_id", k=3, n_planes=4)
    first = {r["query_id"]: r["vec_id"] for r in
             topk.where(F.col("rank") == 1).collect()}
    assert first == {0: 0, 1: 1, 2: 2}  # self shares its own bucket


def test_lsh_bucket_topk_empty_queries_no_dim(spark):
    """r8 ADVICE: dim sampling from queries.first() must not crash on
    an empty queries frame — fall back to the corpus, and return the
    natural empty frame when both are empty."""
    df = _vec_df(spark)
    empty_q = df.where(F.col("vec_id") < 0)
    out = lsh_bucket_topk(df, empty_q, id_col="vec_id",
                          vec_col="embedding", query_id_col="vec_id",
                          k=3, n_planes=4)
    assert out.columns == ["query_id", "vec_id", "cosine", "rank"]
    assert out.count() == 0
    both_empty = lsh_bucket_topk(empty_q, empty_q, id_col="vec_id",
                                 vec_col="embedding",
                                 query_id_col="vec_id", k=3, n_planes=4)
    assert both_empty.columns == ["query_id", "vec_id", "cosine", "rank"]
    assert both_empty.count() == 0


def test_embedding_dup_pairs_empty_result_keeps_schema(spark):
    vecs = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]  # orthogonal
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = embedding_dup_pairs(df, id_col="vec_id", vec_col="embedding",
                              threshold=0.9)
    assert out.columns == ["id_a", "id_b", "cosine"]
    assert out.count() == 0


def test_lloyd_kmeans_deterministic_and_clamped():
    sample = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.1, 0.9]]
    c1 = _lloyd_kmeans(sample, 2, seed=7, iters=5)
    c2 = _lloyd_kmeans(sample, 2, seed=7, iters=5)
    assert c1 == c2
    assert len(_lloyd_kmeans(sample, 10, seed=7, iters=3)) == 4  # k > n
    with pytest.raises(ValueError):
        _lloyd_kmeans([], 2, seed=7, iters=3)


def test_text_stats_and_tokens(spark, docs):
    stats = text_stats(docs).where(F.col("doc_id") == 0).collect()[0]
    assert stats["n_tokens"] == 9
    assert stats["n_distinct_tokens"] == 8   # 'the' twice
    row = docs.select(token_count("text").alias("n")).limit(1).collect()[0]
    assert row["n"] == 9


# -- ANN quality: recall vs the exact baseline -----------------------------

def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


@pytest.mark.parametrize("query,floor", [
    ("q_knn_lsh", 0.5), ("q_knn_ivf", 0.6)])
def test_ann_recall_vs_bruteforce(spark, query, floor):
    """Approximate top-10 must overlap the exact top-10 well above
    chance (10/1000 = 1% at random); thresholds are loose floors, not
    tuned targets — a hash-bucketing bug drops recall to ~0."""
    from zcollection_spark import entry_queries as eq
    sf = "/root/testdata/sf0.001"
    exact = _topk_sets(eq.q_knn_bruteforce(spark, sf))
    approx = _topk_sets(getattr(eq, query)(spark, sf))
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q])
               for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= floor, f"{query} mean recall {mean_recall:.2f}"


def test_cap_per_group_exact_and_deterministic(spark):
    from zcollection_spark.data import load_table
    from zcollection_spark.functions.sampling import cap_per_group
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    capped = cap_per_group(docs, keys="lang", id_col="doc_id", n=5)
    counts = {r["lang"]: r["n"] for r in
              capped.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(5, full[lang])
    # reproducible: same ids both runs; different salt -> different draw
    ids1 = sorted(r["doc_id"] for r in capped.collect())
    ids2 = sorted(r["doc_id"] for r in
                  cap_per_group(docs, keys="lang", id_col="doc_id",
                                n=5).collect())
    assert ids1 == ids2
    ids3 = sorted(r["doc_id"] for r in
                  cap_per_group(docs, keys="lang", id_col="doc_id",
                                n=5, salt="v2").collect())
    assert ids1 != ids3


def test_audio_features_plumbing(spark):
    from zcollection_spark.data import load_table
    from zcollection_spark.functions.multimodal import (
        attach_fake_payload, extract_audio_features)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .limit(20)
    with_payload = attach_fake_payload(docs, text_col="text")
    feats = extract_audio_features(with_payload, id_col="doc_id")
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_samples"] > 0
        assert abs(r["duration_s"] - r["n_samples"] / 16000.0) < 1e-6
        assert len(r["mfcc"]) == 8 and r["rms"] >= 0.0
    # deterministic across runs
    again = extract_audio_features(with_payload, id_col="doc_id").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # fake=False now runs the real RIFF parser — garbage payloads are
    # rejected loudly, not silently featurized
    import pytest as _pytest
    with _pytest.raises(Exception, match="RIFF"):
        extract_audio_features(with_payload, id_col="doc_id",
                               fake=False).collect()


def test_embedding_dup_pairs_methods_agree(spark):
    """block (distributed exact) and broadcast (driver exact) must return
    identical pair sets; lsh must return a subset that is exact on the
    pairs it keeps."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(30, 16))
    # plant near-dups: rows 30..34 are jittered copies of rows 0..4
    dups = base[:5] + rng.normal(scale=0.01, size=(5, 16))
    mat = np.vstack([base, dups]).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(35, dtype=np.int64),
                        "embedding": [v.tolist() for v in mat]})
    df = spark.createDataFrame(pdf)

    def pairset(method, **kw):
        rows = embedding_dup_pairs(df, id_col="vec_id",
                                   vec_col="embedding", threshold=0.95,
                                   method=method, **kw).collect()
        return {(r["id_a"], r["id_b"]): round(r["cosine"], 9)
                for r in rows}

    block = pairset("block", n_blocks=4)
    bcast = pairset("broadcast")
    assert block == bcast and len(block) >= 5
    lsh = pairset("lsh", n_planes=4, n_tables=8, dim=16)
    assert set(lsh).issubset(set(block))
    for pair, cos in lsh.items():
        assert abs(cos - block[pair]) < 1e-9


def test_embedding_dup_pairs_block_no_driver_collect(spark, monkeypatch):
    """The default (block) path must build a lazy plan — no collect(),
    first(), or toPandas() on the driver during construction."""
    from pyspark.sql import DataFrame as SparkDF
    vecs = [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")

    def boom(*a, **k):
        raise AssertionError("driver materialization during construction")

    for name in ("collect", "first", "take", "toPandas"):
        monkeypatch.setattr(SparkDF, name, boom)
    out = embedding_dup_pairs(df, id_col="vec_id", vec_col="embedding",
                              threshold=0.99)  # method defaults to block
    monkeypatch.undo()
    pairs = [(r["id_a"], r["id_b"]) for r in out.collect()]
    assert pairs == [(0, 1)]


def test_simhash_banded_matches_bruteforce_hamming(spark):
    """Hamming banding is pigeonhole-EXACT: the banded equi-join +
    bit_count filter must produce exactly the pairs a brute-force
    all-pairs Hamming-distance scan finds, for several k."""
    rows = [(i, f"token{i} alpha beta gamma delta epsilon") for i in range(8)]
    rows += [(i + 100, "shared body of words " + ("x " * (i % 3)))
             for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc_id"]: r["simhash"] for r in
            simhash(df, id_col="doc_id", text_col="text",
                    n_bits=24).collect()}
    ids = sorted(sigs)
    for k in (0, 1, 2, 3):
        brute = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
                 if bin(sigs[a] ^ sigs[b]).count("1") <= k}
        banded = {(r["id_a"], r["id_b"]) for r in
                  simhash_duplicate_pairs(
                      df, id_col="doc_id", text_col="text", n_bits=24,
                      max_hamming=k).collect()}
        assert banded == brute, f"k={k}"


def test_simhash_salted_join_matches_unsalted_on_hot_key(spark):
    """Skew guard: many docs with an identical signature (the hot-key
    scenario) must produce the exact same pair set salted or not."""
    rows = [(i, "same words every time") for i in range(12)]
    rows += [(100, "totally different text here"),
             (101, "totally different text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(salt_buckets):
        out = simhash_duplicate_pairs(df, id_col="doc_id",
                                      text_col="text", n_bits=16,
                                      salt_buckets=salt_buckets)
        return sorted((r["id_a"], r["id_b"]) for r in out.collect())

    unsalted, salted = pairs(1), pairs(8)
    assert salted == unsalted
    # the 12 identical docs form a full clique + the pair (100, 101)
    assert len(salted) == 12 * 11 // 2 + 1


def test_simhash_unpacked_matches_packed(spark, docs):
    """packed=False (per-bit sums, exact to 2^62 tokens) is the same
    function: identical signatures on every doc — and the passthrough
    on simhash_duplicate_pairs (the advertised overflow remediation)
    yields the identical pair set."""
    packed = {r["doc_id"]: r["simhash"] for r in
              simhash(docs, id_col="doc_id", text_col="text",
                      n_bits=32).collect()}
    unpacked = {r["doc_id"]: r["simhash"] for r in
                simhash(docs, id_col="doc_id", text_col="text",
                        n_bits=32, packed=False).collect()}
    assert packed == unpacked
    pairs_p = {(r.id_a, r.id_b) for r in simhash_duplicate_pairs(
        docs, id_col="doc_id", text_col="text", n_bits=24,
        max_hamming=1).collect()}
    pairs_u = {(r.id_a, r.id_b) for r in simhash_duplicate_pairs(
        docs, id_col="doc_id", text_col="text", n_bits=24,
        max_hamming=1, packed=False).collect()}
    assert pairs_p == pairs_u


def test_simhash_packed_overflow_fails_loud(spark, monkeypatch):
    """A document with >= 2^SLOT distinct tokens would silently corrupt
    the packed vote counters; the guard must raise instead — and the
    unpacked path must still produce the right signature.  SLOT is
    shrunk to 8 so the pathological doc stays test-sized."""
    import zcollection_spark.functions.dedup as dd
    monkeypatch.setattr(dd, "_SIMHASH_SLOT", 8)
    big = " ".join(f"tok{i}" for i in range(300))   # 300 >= 2^8
    small = "just a few distinct tokens"
    df = spark.createDataFrame([(1, big), (2, small)],
                               "doc_id long, text string")
    with pytest.raises(Exception, match="SIMHASH_PACKED_OVERFLOW"):
        dd.simhash(df, id_col="doc_id", text_col="text",
                   n_bits=24).collect()
    # fallback path: exact, no limit — and bit-identical to packed on
    # the doc that fits (packed checked at the default 20-bit slot)
    unpacked = {r["doc_id"]: r["simhash"] for r in
                dd.simhash(df, id_col="doc_id", text_col="text",
                           n_bits=24, packed=False).collect()}
    monkeypatch.setattr(dd, "_SIMHASH_SLOT", 20)
    packed = {r["doc_id"]: r["simhash"] for r in
              dd.simhash(df, id_col="doc_id", text_col="text",
                         n_bits=24).collect()}
    assert unpacked == packed


def test_dedup_pairs_release_their_cached_banding(spark, docs):
    """lsh_candidate_pairs / simhash_duplicate_pairs persist their band
    frame for the self-join; unpersist_intermediates(pairs) must leave
    NO lingering cached RDDs in the session."""
    from zcollection_spark.functions.dedup import (minhash_signatures,
                                                   lsh_candidate_pairs,
                                                   unpersist_intermediates)
    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    sh = simhash_duplicate_pairs(docs, id_col="doc_id", text_col="text",
                                 n_bits=24, max_hamming=1)
    sh.count()
    sigs = minhash_signatures(docs, id_col="doc_id", text_col="text",
                              shingle_size=3)
    mh = lsh_candidate_pairs(sigs, id_col="doc_id")
    mh.count()
    assert jsc.getPersistentRDDs().size() > base  # caches were live
    unpersist_intermediates(sh)
    unpersist_intermediates(mh)
    assert jsc.getPersistentRDDs().size() == base
    # contract is a safe no-op on frames without intermediates
    unpersist_intermediates(docs)


def test_jaccard_max_df_bounds_hot_shingle_candidates(spark):
    """Property: one shingle present in 50% of docs must not blow up the
    candidate join when max_df is on.  At threshold=0.0 the output IS
    the candidate set, so we can count candidates through the API."""
    n = 40
    rows = []
    for i in range(n):
        unique = f"u{i}a u{i}b u{i}c u{i}d u{i}e"
        # even docs share the hot 3-shingle "common boiler plate"
        text = f"common boiler plate {unique}" if i % 2 == 0 else unique
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def n_candidates(max_df):
        out = ngram_jaccard_pairs(df, id_col="doc_id", text_col="text",
                                  shingle_size=3, threshold=0.0,
                                  max_df=max_df)
        return out.count()

    hot = n_candidates(None)
    guarded = n_candidates(5)
    # unguarded: the 20 hot docs form a C(20,2)=190-pair clique
    assert hot >= 190
    # guarded: the hot shingles (df=20 > 5) are dropped, no clique
    assert guarded == 0
    # and guarded jaccard values stay consistent: identical twin docs
    twin = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "alpha beta gamma delta")],
        "doc_id long, text string")
    got = ngram_jaccard_pairs(twin, id_col="doc_id", text_col="text",
                              shingle_size=2, threshold=0.5,
                              max_df=10).collect()
    assert len(got) == 1 and abs(got[0]["jaccard"] - 1.0) < 1e-12


def test_jaccard_prefix_filter_lossless_on_borderline_pairs(spark):
    """The prefix filter (AllPairs/PPJoin) must be LOSSLESS at every
    ceil boundary of the lemma: random word sets over a small
    vocabulary produce many pairs sitting exactly on / around each
    threshold, and the prefix-filtered path must equal both the full
    self-join path and a pure-Python exact reference."""
    import itertools
    import random
    rng = random.Random(20260815)
    vocab = [f"w{i:02d}" for i in range(60)]
    docs = {i: rng.sample(vocab, rng.randint(3, 25)) for i in range(120)}
    # engineered near-duplicates so the HIGH-threshold strata are
    # populated too: copies of a 20-word doc with 0/1/2 words swapped
    # (J = 1.0, 19/21 ≈ 0.905, 18/22 ≈ 0.818 against the original)
    base = rng.sample(vocab, 20)
    docs[200] = list(base)
    docs[201] = list(base)
    docs[202] = base[:-1] + [f"x{rng.randint(0, 9)}"]
    docs[203] = base[:-2] + ["xa", "xb"]
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in docs.items()],
        "doc_id long, text string")
    sets = {i: set(ws) for i, ws in docs.items()}
    for t in (0.5, 2 / 3, 0.8, 0.9):
        want = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= t:
                want[(a, b)] = j
        got_prefix = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
                      ngram_jaccard_pairs(df, id_col="doc_id",
                                          text_col="text",
                                          shingle_size=1, threshold=t,
                                          prefix_filter=True).collect()}
        got_full = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
                    ngram_jaccard_pairs(df, id_col="doc_id",
                                        text_col="text",
                                        shingle_size=1, threshold=t,
                                        prefix_filter=False).collect()}
        assert set(got_prefix) == set(want) == set(got_full), t
        for pair, j in want.items():
            assert abs(got_prefix[pair] - j) < 1e-12
    # the vocabulary is small enough that borderline pairs exist at
    # every tested threshold — otherwise this test proves nothing
    assert want, "0.9-threshold stratum empty; regenerate the corpus"


def test_jaccard_prefix_filter_float_boundary_threshold(spark):
    """r10-advice regression: thresholds whose double product rounds
    strictly ABOVE an exact integer (0.07*100 = 7.000000000000001)
    used to shorten the prefix by one AND fail the size filter, so an
    exact-boundary pair (|A|=100, |B|=7, B ⊂ A, J = 7/100 = 0.07) was
    missed by the prefix path while the full self-join found it."""
    shared = [f"s{i}" for i in range(7)]
    unique = [f"u{i:02d}" for i in range(93)]
    df = spark.createDataFrame(
        [(0, " ".join(unique + shared)), (1, " ".join(shared))],
        "doc_id long, text string")
    for pf in (True, False):
        got = ngram_jaccard_pairs(df, id_col="doc_id", text_col="text",
                                  shingle_size=1, threshold=0.07,
                                  prefix_filter=pf).collect()
        assert len(got) == 1, (pf, got)
        assert got[0]["id_a"] == 0 and got[0]["id_b"] == 1
        assert abs(got[0]["jaccard"] - 0.07) < 1e-12


def test_embedding_block_guard_fails_fast_and_auto_sizes(spark):
    vecs = [(i, [float(i), 1.0, 0.5, 0.25]) for i in range(64)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    # forced-tiny budget: a materialized block overflows -> clear error
    bad = embedding_dup_pairs(df, id_col="vec_id", vec_col="embedding",
                              threshold=0.99, method="block",
                              n_blocks=2, max_block_bytes=128)
    with pytest.raises(Exception, match="max_block_bytes"):
        bad.collect()
    # auto-sizing picks enough blocks to fit the budget and still works
    from zcollection_spark.functions.similarity import auto_n_blocks
    assert auto_n_blocks(64, 4, 128) == 16  # 64*4*8/128
    auto = embedding_dup_pairs(df, id_col="vec_id", vec_col="embedding",
                               threshold=1.0 - 1e-12, method="block",
                               n_blocks=None, max_block_bytes=2048)
    assert auto.count() == 0  # distinct vectors, threshold ~1


def test_ppm_codec_roundtrip_and_real_image_features(spark):
    from zcollection_spark.functions.multimodal import (
        decode_ppm, encode_ppm, extract_image_features)
    rng = np.random.default_rng(3)
    imgs = {i: rng.integers(0, 256, size=(4 + i, 6, 3), dtype=np.uint8)
            for i in range(5)}
    # codec round-trip, including a commented header
    px = imgs[0]
    assert (decode_ppm(encode_ppm(px)) == px).all()
    commented = b"P6\n# a comment\n6 4\n255\n" + px.tobytes()
    assert (decode_ppm(commented) == px).all()
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"JFIF garbage")

    pdf = pd.DataFrame({"doc_id": list(imgs),
                        "payload": [encode_ppm(v) for v in imgs.values()]})
    df = spark.createDataFrame(pdf, "doc_id long, payload binary")
    rows = {r["id"]: r for r in extract_image_features(
        df, id_col="doc_id", fake=False).collect()}
    for i, px in imgs.items():
        feat = rows[i]["feat"]
        assert feat[0] == 6.0 and feat[1] == float(4 + i)  # w, h
        assert abs(feat[2] - px[:, :, 0].mean()) < 1e-5
        assert abs(feat[5] - px.astype(np.float64).std()) < 1e-5


def test_wav_codec_roundtrip_and_real_audio_features(spark):
    from zcollection_spark.functions.multimodal import (
        decode_wav, encode_wav, extract_audio_features)
    t = np.arange(800) / 8000.0
    sine = np.sin(2 * np.pi * 440 * t)
    for bits, tol in ((16, 1e-3), (8, 2e-2)):
        rate, decoded = decode_wav(encode_wav(sine, 8000, bits=bits))
        assert rate == 8000 and len(decoded) == 800
        assert np.abs(decoded - sine).max() < tol

    pdf = pd.DataFrame({
        "doc_id": [0, 1],
        "payload": [encode_wav(sine, 8000), encode_wav(sine * 0.5, 16000)]})
    df = spark.createDataFrame(pdf, "doc_id long, payload binary")
    rows = {r["id"]: r for r in extract_audio_features(
        df, id_col="doc_id", fake=False).collect()}
    # header-driven: rates differ per row, durations follow the header
    assert rows[0]["n_samples"] == 800
    assert abs(rows[0]["duration_s"] - 0.1) < 1e-9
    assert abs(rows[1]["duration_s"] - 0.05) < 1e-9
    # sine RMS = amplitude/sqrt(2)
    assert abs(rows[0]["rms"] - 1 / np.sqrt(2)) < 1e-2
    assert abs(rows[1]["rms"] - 0.5 / np.sqrt(2)) < 1e-2


def test_brute_force_topk_empty_query_set_keeps_schema(spark):
    df = _vec_df(spark, n=6)
    out = brute_force_topk(df, df.where(F.col("vec_id") < 0),
                           id_col="vec_id", vec_col="embedding",
                           query_id_col="vec_id", k=3)
    assert out.columns == ["query_id", "vec_id", "cosine", "rank"]
    assert out.count() == 0


def test_ivfpq_topk_recall_and_determinism(spark):
    """IVF-PQ: 8-byte codes instead of raw vectors; with exact re-rank
    of the ADC survivors, recall on a real embedding table must clear a
    conservative floor (measured 0.82 at this config), and seeded
    training makes runs identical."""
    from zcollection_spark.data import load_table
    from zcollection_spark.functions.similarity import (brute_force_topk,
                                                        ivfpq_topk)
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    exact = brute_force_topk(emb, queries, id_col="vec_id",
                             vec_col="embedding", query_id_col="vec_id",
                             k=10)
    truth: dict = {}
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    kwargs = dict(id_col="vec_id", vec_col="embedding",
                  query_id_col="vec_id", k=10, n_cells=8, n_probe=4,
                  m=8, n_codes=64, refine_factor=4)
    run1 = ivfpq_topk(emb, queries, **kwargs)
    got: dict = {}
    for r in run1.collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    recall = sum(len(truth[q] & got.get(q, set()))
                 for q in truth) / sum(len(v) for v in truth.values())
    assert recall >= 0.6, recall
    run2 = sorted(map(tuple, ivfpq_topk(emb, queries, **kwargs)
                      .select("query_id", "vec_id", "rank").collect()))
    assert sorted(map(tuple, run1.select("query_id", "vec_id",
                                         "rank").collect())) == run2


def test_ivfpq_self_rank1_no_refine(spark):
    """Even pure ADC (no refine) ranks a corpus vector first for its
    own query — the reconstruction error is identical across
    candidates' shared query."""
    from zcollection_spark.functions.similarity import ivfpq_topk
    df = _vec_df(spark, n=24, dim=16)
    queries = df.where(F.col("vec_id") < 3)
    out = ivfpq_topk(df, queries, id_col="vec_id", vec_col="embedding",
                     query_id_col="vec_id", k=3, n_cells=4, n_probe=4,
                     m=4, n_codes=16)
    first = {r["query_id"]: r["vec_id"] for r in
             out.where(F.col("rank") == 1).collect()}
    assert first == {0: 0, 1: 1, 2: 2}


def test_ivfpq_rejects_bad_subspace_split(spark):
    from zcollection_spark.functions.similarity import ivfpq_topk
    df = _vec_df(spark, n=8, dim=10)
    with pytest.raises(Exception, match="divisible"):
        ivfpq_topk(df, df, id_col="vec_id", vec_col="embedding",
                   query_id_col="vec_id", k=2, n_cells=2, n_probe=1,
                   m=4).collect()


def test_ivfpq_nonunit_norm_corpus(spark):
    """Vectors with wildly varying norms: the cell a row is filed under
    and the centroid its residual was quantized against must be the
    SAME (a raw-vector assigner can disagree with the normalized
    encoder, reconstructing with the wrong cell).  Self-queries must
    still rank themselves first."""
    from zcollection_spark.functions.similarity import ivfpq_topk
    rng = np.random.default_rng(7)
    scales = np.concatenate([np.full(12, 0.05), np.full(12, 50.0)])
    pdf = pd.DataFrame({
        "vec_id": np.arange(24, dtype=np.int64),
        "embedding": [(rng.normal(size=16) * s).astype(
            np.float32).tolist() for s in scales]})
    df = spark.createDataFrame(pdf)
    out = ivfpq_topk(df, df.where(F.col("vec_id").isin(0, 13, 23)),
                     id_col="vec_id", vec_col="embedding",
                     query_id_col="vec_id", k=3, n_cells=4, n_probe=4,
                     m=4, n_codes=16)
    first = {r["query_id"]: r["vec_id"] for r in
             out.where(F.col("rank") == 1).collect()}
    assert first == {0: 0, 13: 13, 23: 23}


def test_ivfpq_empty_corpus_raises_clearly(spark):
    from zcollection_spark.functions.similarity import ivfpq_topk
    df = _vec_df(spark, n=4, dim=8).where("vec_id < 0")
    with pytest.raises(ValueError, match="empty corpus"):
        ivfpq_topk(df, df, id_col="vec_id", vec_col="embedding",
                   query_id_col="vec_id", k=2, n_cells=2, n_probe=1,
                   m=4)


# ---------------------------------------------------------------------------
# curation: PII scrub / decontamination / repetition
# ---------------------------------------------------------------------------

def test_scrub_pii_counts_and_sentinels(spark):
    from zcollection_spark.functions import scrub_pii
    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.io or admin@site.org, host 192.168.0.1, "
             "ssn 123-45-6789 end"),
         (2, "clean text, nothing to scrub 1.2 not-an-ip 12-34-5678")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert (rows[1].n_email, rows[1].n_ipv4, rows[1].n_ssn) == (2, 1, 1)
    assert rows[1].text_scrubbed == (
        "mail <EMAIL> or <EMAIL>, host <IPV4>, ssn <SSN> end")
    assert (rows[2].n_email, rows[2].n_ipv4, rows[2].n_ssn) == (0, 0, 0)
    assert rows[2].text_scrubbed == rows[2].text


def test_contamination_flags_overlap_only(spark):
    from zcollection_spark.functions import contamination
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over it"),
         (2, "totally unrelated words in here now"),
         (3, "quick brown fox appears here too")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "a quick brown fox story")], "doc_id long, text string")
    got = {r.doc_id: r.n_overlap
           for r in contamination(train, bench, id_col="doc_id",
                                  n=3).collect()}
    # docs 1 and 3 share the 3-gram 'quick brown fox'; doc 2 is clean
    assert got == {1: 1, 3: 1}


def test_repetition_stats_known_ratios(spark):
    from zcollection_spark.functions import repetition_stats
    df = spark.createDataFrame(
        [(1, "spam spam spam spam ham"),          # top token 4/5
         (2, "all words here are unique tokens"),  # top token 1/6
         (3, "a b c a b c a b c a b c")],          # repeated 3-grams
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            repetition_stats(df, n=3).collect()}
    assert rows[1].top_token_ratio == pytest.approx(0.8)
    assert rows[2].top_token_ratio == pytest.approx(1 / 6)
    # doc 3: 10 3-grams, only 3 distinct ('a b c','b c a','c a b')
    assert rows[3].dup_ngram_ratio == pytest.approx(0.7)
    assert rows[2].dup_ngram_ratio == 0.0


def test_quality_filter_rules_and_verdict(spark):
    from zcollection_spark.functions import quality_filter
    good = " ".join(f"the quick token{i} of it" for i in range(12))
    df = spark.createDataFrame(
        [(1, good),                                   # passes everything
         (2, "spam " * 60),                           # repetition fails
         (3, "too short"),                            # word count fails
         (4, " ".join(f"w{i}" for i in range(60)))],  # no stopwords
        "doc_id long, text string")
    rows = {r.doc_id: r for r in quality_filter(
        df, rules={"min_words": 20, "min_stopword_hits": 2,
                   "max_top_token_ratio": 0.2}).collect()}
    assert rows[1].keep
    assert not rows[2].keep and not rows[2].q_repetition
    assert not rows[3].keep and not rows[3].q_word_count
    assert not rows[4].keep and not rows[4].q_stopwords
    # per-rule columns stay independently readable (drop-reason audit)
    assert rows[2].q_word_count and rows[3].q_symbol_ratio


def test_quality_filter_null_text_is_dropped_not_lost(spark):
    """ADVICE fix: NULL text must yield keep=False (not NULL) — with a
    NULL verdict the row vanishes from BOTH where('keep') and
    where('NOT keep'), i.e. from drop-reason analytics entirely."""
    from zcollection_spark.functions import quality_filter
    df = spark.createDataFrame([(1, None), (2, "")],
                               "doc_id long, text string")
    out = quality_filter(df)
    rows = {r.doc_id: r for r in out.collect()}
    for doc in (1, 2):
        assert rows[doc].keep is False
        assert rows[doc].q_word_count is False
    # the partition keep/drop must be exhaustive
    assert out.where("keep").count() + out.where("NOT keep").count() == 2


def test_suggest_lsh_planes_scaling():
    """sf1 gate finding: fixed n_planes means fixed bucket COUNT, so
    within-bucket pair work grows quadratically with the corpus
    (measured 7.5s -> 828s sf0.01 -> sf1 at 4 planes).  The helper
    holds the EXPECTED bucket size constant instead."""
    from zcollection_spark.functions import suggest_lsh_planes
    assert suggest_lsh_planes(50) == 4          # tiny corpus: floor
    assert suggest_lsh_planes(2_000) == 5       # sf0.1 embeddings
    assert suggest_lsh_planes(20_000) == 9      # sf1
    assert suggest_lsh_planes(2_000_000) == 15
    assert suggest_lsh_planes(10**12) == 24     # clamped
    # doubling the corpus adds at most one plane (monotone, gentle)
    for n in (10**3, 10**6, 10**9):
        assert 0 <= suggest_lsh_planes(2 * n) - suggest_lsh_planes(n) <= 1


def test_suggest_ann_configs():
    """r9 retune: the graded knn defaults auto-derive from the corpus
    row count.  Pin the measured operating points (ANN_SWEEP.json:
    lsh (4,17) recall 0.94, ivf (16,8) recall 0.90 at sf0.1) and the
    structural properties that make the rule scale."""
    from zcollection_spark.functions.similarity import (suggest_ivf_config,
                                                        suggest_lsh_config)
    assert suggest_lsh_config(500) == (4, 17)    # sf0.01 graded point
    assert suggest_lsh_config(2_000) == (4, 17)  # sf0.1 graded point
    assert suggest_ivf_config(500) == (8, 4)     # sf0.01 graded point
    assert suggest_ivf_config(2_000) == (16, 8)  # sf0.1 graded point
    for n in (10**3, 10**5, 10**7, 10**9):
        planes, tables = suggest_lsh_config(n)
        # feasibility cap: the chosen plane count must still be able
        # to reach the recall target within the table budget
        assert 1 - (1 - 0.60 ** planes) ** tables >= 0.9 - 1e-9
        assert tables <= 64
        cells, probe = suggest_ivf_config(n)
        assert 8 <= cells <= 256 and probe * 2 >= cells  # frac >= 1/2
    import pytest
    with pytest.raises(ValueError, match="target_recall"):
        suggest_lsh_config(1000, target_recall=1.0)


def test_embedding_dup_pairs_auto_planes(spark):
    """n_planes='auto' must stay deterministic and agree with the
    explicit value the helper yields for that corpus size."""
    import numpy as np
    from zcollection_spark.functions import (embedding_dup_pairs,
                                             suggest_lsh_planes)
    rng = np.random.RandomState(7)
    base = rng.randn(40, 8).astype("float32")
    base[1] = base[0] * 1.001  # one planted near-dup pair
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(len(base))],
        "vec_id long, embedding array<float>")
    auto = embedding_dup_pairs(df, id_col="vec_id", vec_col="embedding",
                               threshold=0.95, method="lsh",
                               n_planes="auto", n_tables=8, dim=8)
    explicit = embedding_dup_pairs(
        df, id_col="vec_id", vec_col="embedding", threshold=0.95,
        method="lsh", n_planes=suggest_lsh_planes(40), n_tables=8, dim=8)
    got = sorted((r.id_a, r.id_b) for r in auto.collect())
    want = sorted((r.id_a, r.id_b) for r in explicit.collect())
    assert got == want
    assert (0, 1) in got  # the planted pair survives bucketing


def test_hash_split_deterministic_and_oracle_exact(spark):
    """hash_split: stable across runs/orderings, fractions roughly
    honored, and the uniform draw replays EXACTLY in DuckDB."""
    import duckdb
    from zcollection_spark.functions import hash_split
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, id_col="doc_id",
                     splits={"train": 0.8, "val": 0.1, "test": 0.1})
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    # reshuffled input -> identical assignment
    got2 = {r["doc_id"]: r["split"] for r in
            hash_split(df.orderBy(F.rand(seed=1)), id_col="doc_id",
                       splits={"train": 0.8, "val": 0.1, "test": 0.1})
            .collect()}
    assert got == got2
    counts = {}
    for v in got.values():
        counts[v] = counts.get(v, 0) + 1
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert 0.05 < counts["val"] / 2000 < 0.15
    # DuckDB replay of the same draw agrees row-for-row
    want = dict(duckdb.sql("""
        SELECT i, CASE WHEN u < 0.8 THEN 'train'
                       WHEN u < 0.9 THEN 'val' ELSE 'test' END
        FROM (SELECT i, ('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))
                        ::BIGINT / 16.0^15 AS u
              FROM generate_series(0, 1999) t(i))""").fetchall())
    assert got == want

    with pytest.raises(ValueError):
        hash_split(df, id_col="doc_id", splits={"a": 0.5, "b": 0.4})


def test_chunk_documents_windows_and_overlap(spark):
    from zcollection_spark.functions import chunk_documents
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "short doc"), (3, "one")],
                               "doc_id long, text string")
    out = chunk_documents(df, id_col="doc_id", text_col="text",
                          chunk_tokens=4, overlap=1)
    rows = {(r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
            for r in out.collect()}
    # stride 3, 10 tokens -> ceil((10-1)/3)=3 chunks
    assert rows[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert rows[(1, 1)] == ("w3 w4 w5 w6", 4)
    assert rows[(1, 2)] == ("w6 w7 w8 w9", 4)
    assert (1, 3) not in rows
    assert rows[(2, 0)] == ("short doc", 2)
    assert rows[(3, 0)] == ("one", 1)
    # full coverage: every token appears in some chunk of its doc
    joined = " ".join(rows[(1, i)][0] for i in range(3))
    assert all(f"w{i}" in joined.split() for i in range(10))
    with pytest.raises(ValueError):
        chunk_documents(df, id_col="doc_id", text_col="text",
                        chunk_tokens=4, overlap=4)


def test_chunk_documents_matches_duckdb_replay(spark):
    """Chunk boundaries replay exactly in DuckDB on the real documents
    table (the oracle-style cross-engine pin)."""
    import duckdb
    from zcollection_spark.data import load_table
    from zcollection_spark.functions import chunk_documents
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = chunk_documents(docs, id_col="doc_id", text_col="text",
                          chunk_tokens=64, overlap=8)
    got = {(r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
           for r in out.collect()}
    want = {}
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    for doc_id, cid, text, n in con.execute(r"""
        WITH w AS (SELECT doc_id,
                          regexp_split_to_array(trim(text), '\s+') AS t
                   FROM documents),
        c AS (SELECT doc_id, t,
                     greatest(CAST(ceil((len(t) - 8) / 56.0) AS INT), 1)
                       AS nc FROM w)
        SELECT doc_id, i - 1,
               array_to_string(list_slice(t, (i-1)*56 + 1,
                                          (i-1)*56 + 64), ' '),
               least(len(t) - (i-1)*56, 64)
        FROM c, UNNEST(generate_series(1, nc)) s(i)""").fetchall():
        want[(doc_id, cid)] = (text, n)
    assert got == want


def test_chunk_documents_null_and_empty_text(spark):
    from zcollection_spark.functions import chunk_documents
    df = spark.createDataFrame([(1, None), (2, "")],
                               "doc_id long, text string")
    rows = {(r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
            for r in chunk_documents(df, id_col="doc_id",
                                     text_col="text",
                                     chunk_tokens=4).collect()}
    # a null doc behaves like an empty doc: one empty chunk, never a
    # negative token count
    assert rows == {(1, 0): ("", 1), (2, 0): ("", 1)}


def test_pack_sequences_greedy_invariants(spark):
    """Next-fit packing per group: order preserved, bins never exceed
    the budget unless a single chunk alone does (own bin, never split),
    groups independent."""
    from zcollection_spark.functions.text import pack_sequences
    rows = [  # (doc, chunk, tokens)
        (1, 0, 40), (1, 1, 40), (1, 2, 30),   # 40+40 fits 96; +30 spills
        (1, 3, 120),                          # oversize: own bin
        (1, 4, 10),
        (2, 0, 96), (2, 1, 1),                # exact fit then spill
    ]
    df = spark.createDataFrame(rows, "doc_id long, chunk_id long, "
                                     "n_tokens long")
    out = {(r.doc_id, r.chunk_id): (r.bin, r.bin_fill)
           for r in pack_sequences(df, id_col="doc_id",
                                   order_col="chunk_id",
                                   token_col="n_tokens",
                                   context_len=96).collect()}
    assert out[(1, 0)] == (0, 40)
    assert out[(1, 1)] == (0, 80)
    assert out[(1, 2)] == (1, 30)    # would overflow -> new bin
    assert out[(1, 3)] == (2, 120)   # oversize chunk gets its own bin
    assert out[(1, 4)] == (3, 10)    # and closes it for the next chunk
    assert out[(2, 0)] == (0, 96)    # exact fit stays
    assert out[(2, 1)] == (1, 1)
    import pytest
    with pytest.raises(ValueError, match="context_len"):
        pack_sequences(df, id_col="doc_id", order_col="chunk_id",
                       token_col="n_tokens", context_len=0)


def test_pack_sequences_packing_efficiency(spark, docs):
    """End-to-end with chunk_documents: every chunk appears exactly
    once, bins are dense (0..max consecutive per doc), and fill never
    exceeds the budget except oversize singletons."""
    from zcollection_spark.functions.text import (chunk_documents,
                                                  pack_sequences)
    chunks = chunk_documents(docs, id_col="doc_id", text_col="text",
                             chunk_tokens=4, overlap=1)
    packed = pack_sequences(chunks, id_col="doc_id",
                            order_col="chunk_id", token_col="n_tokens",
                            context_len=10).collect()
    assert len(packed) == chunks.count()
    per_doc: dict = {}
    for r in packed:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc, rows in per_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        bins = [r.bin for r in rows]
        assert bins == sorted(bins) and bins[0] == 0
        assert set(bins) == set(range(max(bins) + 1))  # dense
        fill: dict = {}
        for r in rows:
            fill[r.bin] = fill.get(r.bin, 0) + r.n_tokens
            assert r.bin_fill == fill[r.bin]
        for b, total in fill.items():
            n_in_bin = sum(1 for r in rows if r.bin == b)
            assert total <= 10 or n_in_bin == 1


def test_stratified_sample_exact_deterministic_and_bounded(spark):
    """The sample is a pure function of (id, salt, fractions): same
    subset on every call, different under a new salt, empty for
    unlisted strata, loud on out-of-range fractions."""
    from zcollection_spark.functions import stratified_sample_exact
    rows = [(i, "en" if i % 2 else "de") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kw = dict(id_col="doc_id", strata_col="lang",
              fractions={"en": 0.5, "de": 0.25})
    one = {r.doc_id for r in stratified_sample_exact(df, **kw).collect()}
    two = {r.doc_id for r in stratified_sample_exact(df, **kw).collect()}
    assert one == two and one  # deterministic, non-empty
    resalted = {r.doc_id for r in stratified_sample_exact(
        df, salt="v2", **kw).collect()}
    assert resalted != one  # a new salt draws a fresh sample
    # rough rate sanity: md5 uniform keeps strata near their fractions
    n_en = sum(1 for i in one if i % 2)
    n_de = sum(1 for i in one if not i % 2)
    assert 30 <= n_en <= 70 and 10 <= n_de <= 40
    # unlisted stratum drops entirely
    only_en = stratified_sample_exact(df, id_col="doc_id",
                                      strata_col="lang",
                                      fractions={"en": 1.0})
    assert {r.lang for r in only_en.collect()} == {"en"}
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample_exact(df, id_col="doc_id", strata_col="lang",
                                fractions={"en": 1.5})


def test_pack_sequences_null_group_ids_pack_as_one_group(spark):
    """Arrow->pandas converts nullable long ids to float NaN; the
    packer must canonicalize so ALL null-id rows pack as one group
    (groupBy semantics), not reset per row."""
    from zcollection_spark.functions.text import pack_sequences
    rows = [(None, 0, 60), (None, 1, 60), (None, 2, 10),
            (7, 0, 60), (7, 1, 60)]
    df = spark.createDataFrame(rows, "gid long, pos long, n long")
    out = {(r.gid, r.pos): (r.bin, r.bin_fill)
           for r in pack_sequences(df, id_col="gid", order_col="pos",
                                   token_col="n",
                                   context_len=96).collect()}
    assert out[(None, 0)] == (0, 60)
    assert out[(None, 1)] == (1, 60)   # spills: SAME group, next bin
    assert out[(None, 2)] == (1, 70)
    assert out[(7, 0)] == (0, 60)
    assert out[(7, 1)] == (1, 60)


def test_sample_to_token_budget_invariants(spark):
    """Budget semantics: deterministic, crossing doc included, minimal
    prefix (removing the last selected doc would undershoot), per-group
    independence, and an oversize single doc still emits."""
    from zcollection_spark.functions.sampling import sample_to_token_budget
    rows = [(i, "en", 30) for i in range(20)]          # 600 en chars
    rows += [(100 + i, "de", 500) for i in range(3)]   # oversize docs
    df = spark.createDataFrame(rows, "doc_id long, lang string, n long")
    out = sample_to_token_budget(df, id_col="doc_id", token_col="n",
                                 budget=100, strata_col="lang").collect()
    again = sample_to_token_budget(df, id_col="doc_id", token_col="n",
                                   budget=100, strata_col="lang").collect()
    assert sorted(r.doc_id for r in out) \
        == sorted(r.doc_id for r in again)  # deterministic
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.n)
    # en: 30-char docs, budget 100 -> exactly 4 selected (90 < 100 <= 120)
    assert sum(by_lang["en"]) == 120 and len(by_lang["en"]) == 4
    # de: one 500-char doc crosses a 100 budget on its own
    assert by_lang["de"] == [500]
    # salt draws a different sample (same sizes here, different ids)
    salted = sample_to_token_budget(df, id_col="doc_id", token_col="n",
                                    budget=100, strata_col="lang",
                                    salt="v2").collect()
    assert {r.doc_id for r in salted if r.lang == "en"} \
        != {r.doc_id for r in out if r.lang == "en"}
    # global (no strata) mode and validation
    whole = sample_to_token_budget(df, id_col="doc_id", token_col="n",
                                   budget=10**9)
    assert whole.count() == len(rows)
    with pytest.raises(ValueError, match="budget"):
        sample_to_token_budget(df, id_col="doc_id", token_col="n",
                               budget=0)


def test_upsample_by_weight_exact_copy_counts(spark):
    """Copy counts are a pure function of (id, salt, weights): floor(w)
    copies always, the fractional copy iff the shared md5 draw is under
    frac(w) — verified against a pure-Python replay of the same draw."""
    import hashlib
    import pytest as _pytest
    from zcollection_spark.functions.sampling import upsample_by_weight
    rows = [(i, ["en", "de", "fr", "xx"][i % 4]) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    weights = {"en": 2.5, "de": 1.0, "fr": 0.25}
    out = upsample_by_weight(df, id_col="doc_id", strata_col="lang",
                             weights=weights).collect()

    def u(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15],
                   16) / 16.0 ** 15

    import collections
    got = collections.Counter((r.doc_id, r.lang) for r in out)
    import math
    want = {}
    for i, lang in rows:
        w = weights.get(lang, 0.0)
        n = int(math.floor(w)) + (1 if u(i) < w - math.floor(w) else 0)
        if n:
            want[(i, lang)] = n
    assert dict(got) == want
    # copy indices are dense 0..n-1 per row
    copies = collections.defaultdict(set)
    for r in out:
        copies[r.doc_id].add(r.copy)
    for (i, lang), n in want.items():
        assert copies[i] == set(range(n))
    # en x2.5 means every en doc appears 2 or 3 times; fr is an exact
    # deterministic quarter (same draw as stratified_sample_exact)
    en_counts = {n for (i, lang), n in want.items() if lang == "en"}
    assert en_counts <= {2, 3} and len(en_counts) == 2
    # validation
    with _pytest.raises(ValueError, match="weight"):
        upsample_by_weight(df, id_col="doc_id", strata_col="lang",
                           weights={"en": -1})
    with _pytest.raises(ValueError, match="copy"):
        upsample_by_weight(df.withColumn("copy", F.lit(0)),
                           id_col="doc_id", strata_col="lang",
                           weights={"en": 1.0})


def test_upsample_by_weight_shuffle_free_plan(spark):
    """Pure projection + explode: no Exchange, no Python eval."""
    from zcollection_spark.functions.sampling import upsample_by_weight
    from zcollection_spark.data import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = upsample_by_weight(docs, id_col="doc_id", strata_col="lang",
                             weights={"en": 2.0})
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan


def test_sample_to_token_budget_rejects_negative_tokens(spark):
    """The bucketed decomposition needs a monotone running sum: a
    negative token count must fail loudly, never silently diverge from
    the single-window semantics."""
    from zcollection_spark.functions.sampling import sample_to_token_budget
    df = spark.createDataFrame(
        [(1, "en", 10), (2, "en", -5), (3, "en", 10)],
        "doc_id long, lang string, n long")
    with pytest.raises(Exception, match="must be >= 0"):
        sample_to_token_budget(df, id_col="doc_id", token_col="n",
                               budget=100, strata_col="lang").collect()


def test_shuffle_to_shards_deterministic_balanced_contiguous(spark):
    """shuffle_to_shards: (a) pure function of (id, salt, n) — same
    assignment across runs and input orderings; (b) every shard's
    positions are a contiguous 0..k-1 range; (c) shards are roughly
    balanced; (d) a different salt draws a different permutation."""
    from zcollection_spark.functions import shuffle_to_shards
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = shuffle_to_shards(df, id_col="doc_id", n_shards=8)
    rows = [(r.doc_id, r.shard, r.shard_pos) for r in out.collect()]
    again = [(r.doc_id, r.shard, r.shard_pos)
             for r in shuffle_to_shards(df.orderBy(F.rand(seed=7)),
                                        id_col="doc_id",
                                        n_shards=8).collect()]
    assert sorted(rows) == sorted(again)
    by_shard: dict = {}
    for _, s, p in rows:
        by_shard.setdefault(s, []).append(p)
    assert set(by_shard) == set(range(8))
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), s
        assert 2000 / 8 * 0.6 < len(ps) < 2000 / 8 * 1.4, (s, len(ps))
    salted = {(r.doc_id, r.shard) for r in shuffle_to_shards(
        df, id_col="doc_id", n_shards=8, salt="v2").collect()}
    assert salted != {(d, s) for d, s, _ in rows}
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_to_shards(df, id_col="doc_id", n_shards=0)


def test_quantize_embeddings_roundtrip_error_bound(spark):
    """int8 quantization: values land in [-127, 127], dequantized
    error is bounded by scale/2 per component, and the zero vector
    quantizes to zeros with scale 1 (no divide-by-zero)."""
    import numpy as np

    from zcollection_spark.functions import quantize_embeddings
    rng = np.random.default_rng(5)
    vecs = [list(map(float, rng.normal(size=8))) for _ in range(50)]
    vecs.append([0.0] * 8)                     # zero vector edge case
    pdf = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": vecs})
    df = spark.createDataFrame(pdf)
    out = quantize_embeddings(df, vec_col="embedding").collect()
    for r in out:
        q = r.qvec
        assert all(-127 <= x <= 127 for x in q), r.vec_id
        if all(v == 0.0 for v in r.embedding):
            assert r.qscale == 1.0 and all(x == 0 for x in q)
            continue
        for v, x in zip(r.embedding, q):
            assert abs(x * r.qscale - v) <= r.qscale / 2 + 1e-12


def test_semantic_dedup_within_cell_exact_and_keeps_min_id(spark):
    """semantic_dedup: duplicates that share a cell collapse to the
    min-id representative; singletons keep themselves; the pair stage
    is exact within cells (no threshold-dependent recall loss)."""
    import numpy as np

    from zcollection_spark.functions.similarity import (
        semantic_dedup, semantic_dedup_pairs)
    rng = np.random.default_rng(9)
    # two tight clusters of near-identical vectors + isolated points
    base_a = rng.normal(size=6)
    base_b = rng.normal(size=6)
    vecs = ([list(base_a + rng.normal(scale=1e-3, size=6))
             for _ in range(3)]
            + [list(base_b + rng.normal(scale=1e-3, size=6))
               for _ in range(2)]
            + [list(rng.normal(size=6)) for _ in range(5)])
    pdf = pd.DataFrame({"vec_id": range(len(vecs)),
                        "embedding": [list(map(float, v)) for v in vecs]})
    df = spark.createDataFrame(pdf)
    out = {r.vec_id: (r.rep_id, r.keep)
           for r in semantic_dedup(df, id_col="vec_id",
                                   vec_col="embedding",
                                   threshold=0.999,
                                   n_cells=4, seed=3).collect()}
    assert len(out) == len(vecs)           # every row gets a verdict
    # cluster members that share a cell point at the min id; the
    # representative itself is kept, duplicates are not
    for i in (0, 1, 2):
        rep = out[i][0]
        assert rep == min(r for r in (0, 1, 2) if out[r][0] == rep)
    assert out[0] == (0, 1)
    assert sum(k for _, k in out.values()) < len(vecs)  # something dropped
    # singletons keep themselves
    for i in range(5, 10):
        if out[i][0] == i:
            assert out[i][1] == 1
    # pair stage: exact cosine, ordered ids, >= threshold
    pairs = semantic_dedup_pairs(df, id_col="vec_id",
                                 vec_col="embedding", threshold=0.999,
                                 n_cells=4, seed=3).collect()
    assert pairs and all(p.id_a < p.id_b and p.cosine >= 0.999
                         for p in pairs)


def test_shuffle_to_shards_rejects_reserved_output_names(spark):
    """The output contract is the fixed 'shard'/'shard_pos' names — a
    frame already using them is refused, never silently overwritten
    (the '__salt'/'__zorder' reserved-name discipline)."""
    from zcollection_spark.functions import shuffle_to_shards
    df = spark.range(0, 4).withColumnRenamed("id", "doc_id") \
        .withColumn("shard", F.lit(9))
    with pytest.raises(ValueError, match="reserved column name 'shard'"):
        shuffle_to_shards(df, id_col="doc_id", n_shards=2)


def test_unigram_stats_matches_hand_count(spark):
    """unigram_stats on a corpus small enough to count by hand: the
    corpus frequency table, the per-doc mean token count, and the
    hapax share are exact rational values."""
    from zcollection_spark.functions import unigram_stats
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the cat sat",        # the:3 cat:2 sat:1
                 "the cat ran",        # ran:1
                 "the dog"]})          # dog:1
    out = {r.doc_id: (r.n_tokens, r.avg_token_count, r.hapax_share)
           for r in unigram_stats(
               spark.createDataFrame(pdf)).collect()}
    assert out[1] == (3, (3 + 2 + 1) / 3, 1 / 3)
    assert out[2] == (3, (3 + 2 + 1) / 3, 1 / 3)
    assert out[3] == (2, (3 + 1) / 2, 1 / 2)


def test_unigram_stats_size_gated_pin(spark):
    """The r17 size-gated token-expansion pin: identical results with
    the gate forced on, forced off, and at the default; the pin
    actually engages (persisted handle attached + InMemoryRelation in
    the plan) only when the input's estimated scan size reaches the
    threshold."""
    from zcollection_spark import config
    from zcollection_spark.functions import unigram_stats
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "the dog")],
        "doc_id long, text string")

    def run(threshold):
        with config.override(
                **{"text.pin_tokens_min_input_bytes": threshold}):
            out = unigram_stats(df)
            rows = sorted(map(tuple, out.collect()))
            pinned = bool(getattr(out, "_zc_cached", ()))
            plan = out._jdf.queryExecution().executedPlan().toString()
            for h in getattr(out, "_zc_cached", ()):
                h.unpersist()
            return rows, pinned, plan

    base, pinned_off, _ = run(None)
    rows0, pinned_on, plan0 = run(0)          # always pin
    rows_def, _, _ = run(4 << 20)             # default: tiny df, no pin
    assert not pinned_off
    assert pinned_on and "InMemoryRelation" in plan0
    assert base == rows0 == rows_def


# ---------------------------------------------------------------------------
# bigram LM scoring / duplicated spans / BM25 (round 13 second batch)
# ---------------------------------------------------------------------------

def test_bigram_lm_score_hand_counts(spark):
    from zcollection_spark.functions import bigram_lm_score
    rows = [(0, "a b a b"), (1, "a b c"), (2, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_lm_score(df).collect()}
    # corpus pair counts: "a b"x3, "b a"x1, "b c"x1; context counts:
    # a->3, b->2.  P(a b)=1, P(b a)=.5, P(b c)=.5
    assert set(out) == {0, 1}          # the 1-token doc has no bigrams
    assert out[0]["n_bigrams"] == 3
    assert out[0]["mean_cond_p"] == round((1 + 0.5 + 1) / 3, 6)
    assert out[0]["rare_bigram_share"] == pytest.approx(1 / 3)
    assert out[1]["n_bigrams"] == 2
    assert out[1]["mean_cond_p"] == pytest.approx(0.75)
    assert out[1]["rare_bigram_share"] == pytest.approx(0.5)


def test_bigram_lm_score_matches_python_reference(spark):
    """Randomized corpus vs a dict-counting reference implementation."""
    from collections import Counter

    from zcollection_spark.functions import bigram_lm_score
    rng = np.random.RandomState(7)
    vocab = ["w%d" % i for i in range(12)]
    rows = [(i, " ".join(rng.choice(vocab, size=rng.randint(2, 30))))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pair_rows = [(i, (ws[j], ws[j + 1]))
                 for i, t in rows for ws in [t.split()]
                 for j in range(len(ws) - 1)]
    cb = Counter(p for _, p in pair_rows)
    cu = Counter(p[0] for _, p in pair_rows)
    exp = {}
    for i, _ in rows:
        ps = [cb[p] / cu[p[0]] for j, p in pair_rows if j == i]
        rare = [cb[p] <= 2 for j, p in pair_rows if j == i]
        exp[i] = (len(ps), round(sum(ps) / len(ps), 6),
                  sum(rare) / len(rare))
    got = {r["doc_id"]: r for r in bigram_lm_score(df).collect()}
    assert set(got) == set(exp)
    for i, (n, mean_p, rare) in exp.items():
        assert got[i]["n_bigrams"] == n
        assert got[i]["mean_cond_p"] == pytest.approx(mean_p, abs=1e-6)
        assert got[i]["rare_bigram_share"] == pytest.approx(rare)


def test_duplicated_span_stats_cross_doc_only(spark):
    from zcollection_spark.functions import duplicated_span_stats
    rows = [(0, "a b c"),       # spans(n=2): [a b, b c]
            (1, "b c d"),       # [b c, c d]
            (2, "x y"),         # [x y]
            (3, "q"),           # too short: absent
            (4, "b c b c"),     # [b c, c b, b c] - dup span twice
            (5, "m n m n")]     # within-doc repeat ONLY: not duplicated
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in duplicated_span_stats(df, n=2).collect()}
    assert set(out) == {0, 1, 2, 4, 5}
    assert (out[0]["n_spans"], out[0]["n_dup_spans"]) == (2, 1)
    assert out[0]["dup_ratio"] == pytest.approx(0.5)
    assert (out[1]["n_spans"], out[1]["n_dup_spans"]) == (2, 1)
    assert (out[2]["n_spans"], out[2]["n_dup_spans"]) == (1, 0)
    # positions count with multiplicity: "b c" occurs twice in doc 4
    assert (out[4]["n_spans"], out[4]["n_dup_spans"]) == (3, 2)
    # within-document repetition alone never marks a span
    assert (out[5]["n_spans"], out[5]["n_dup_spans"]) == (3, 0)
    with pytest.raises(ValueError, match="n must be"):
        duplicated_span_stats(df, n=0)


def _bm25_reference(corpus: dict, queries: dict, k1=1.2, b=0.75):
    """Dict-based BM25 (Robertson idf) over whitespace tokens."""
    import math
    from collections import Counter
    tf = {d: Counter(t.split()) for d, t in corpus.items()}
    dl = {d: sum(c.values()) for d, c in tf.items()}
    n = len(corpus)
    avgdl = sum(dl.values()) / n
    df = Counter(t for c in tf.values() for t in c)
    out = {}
    for q, qt in queries.items():
        for d, c in tf.items():
            s = 0.0
            for t in set(qt.split()):
                if t not in c:
                    continue
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * c[t] * (k1 + 1) / (
                    c[t] + k1 * (1 - b + b * dl[d] / avgdl))
            if s > 0:
                out[(q, d)] = round(s, 6)
    return out


def test_bm25_matches_python_reference_and_ranks(spark):
    from zcollection_spark.functions import bm25_topk
    rng = np.random.RandomState(11)
    vocab = ["t%d" % i for i in range(15)]
    corpus = {i: " ".join(rng.choice(vocab, size=rng.randint(3, 25)))
              for i in range(30)}
    queries = {100: "t0 t1 t2", 101: "t7", 102: corpus[5]}
    cdf = spark.createDataFrame(list(corpus.items()),
                                "doc_id long, text string")
    qdf = spark.createDataFrame(list(queries.items()),
                                "query_id long, query_text string")
    got = bm25_topk(cdf, qdf, id_col="doc_id", text_col="text",
                    k=1000).collect()
    exp = _bm25_reference(corpus, queries)
    assert {(r["query_id"], r["doc_id"]) for r in got} == set(exp)
    for r in got:
        assert r["score"] == pytest.approx(
            exp[(r["query_id"], r["doc_id"])], abs=2e-6)
    # ranks are dense, 1-based, ordered by (score desc, doc_id asc)
    for q in queries:
        rows = sorted((r for r in got if r["query_id"] == q),
                      key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r["score"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)


def test_bm25_topk_k_cap_and_two_stage_consistency(spark):
    """k is respected and the two-stage top-k equals a single global
    window over bm25_scores (the salt pruning is lossless)."""
    from pyspark.sql import Window

    from zcollection_spark.functions import bm25_topk
    from zcollection_spark.functions.retrieval import bm25_scores
    rng = np.random.RandomState(3)
    vocab = ["v%d" % i for i in range(8)]
    corpus = {i: " ".join(rng.choice(vocab, size=10)) for i in range(50)}
    cdf = spark.createDataFrame(list(corpus.items()),
                                "doc_id long, text string")
    qdf = spark.createDataFrame([(0, "v0 v1")],
                                "query_id long, query_text string")
    k = 7
    got = bm25_topk(cdf, qdf, id_col="doc_id", text_col="text",
                    k=k).collect()
    assert len(got) == k
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id"))
    exp = (bm25_scores(cdf, qdf, id_col="doc_id", text_col="text")
           .withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= k).collect())
    assert ({(r["doc_id"], r["score"], r["rank"]) for r in got}
            == {(r["doc_id"], r["score"], r["rank"]) for r in exp})
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(cdf, qdf, id_col="doc_id", text_col="text", k=0)
    with pytest.raises(ValueError, match="round_to"):
        bm25_topk(cdf, qdf, id_col="doc_id", text_col="text", k=1,
                  round_to=-1)


def test_rrf_fuse_hand_computed_and_weights(spark):
    from zcollection_spark.functions import rrf_fuse
    sparse = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, doc_id long, rank long")
    dense = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)],
        "query_id long, doc_id long, rank long")
    out = {r["doc_id"]: r
           for r in rrf_fuse([sparse, dense], id_col="doc_id").collect()}
    # doc 11 appears in both lists: 1/(60+2) + 1/(60+1)
    assert out[11]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
    assert out[11]["n_lists"] == 2
    assert out[10]["rrf_score"] == round(1 / 61, 6)
    assert out[13]["rrf_score"] == round(1 / 62, 6)
    assert out[12]["rrf_score"] == round(1 / 63, 6)
    # fused order: 11 (two lists) > 10 > 13 > 12
    assert [d for d, r in sorted(out.items(),
                                 key=lambda kv: kv[1]["rank"])] \
        == [11, 10, 13, 12]
    # weights scale contributions; topk truncates
    w = rrf_fuse([sparse, dense], id_col="doc_id",
                 weights=[0.0, 1.0], topk=1).collect()
    assert len(w) == 1 and w[0]["doc_id"] == 11
    assert w[0]["rrf_score"] == round(1 / 61, 6)
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([], id_col="doc_id")
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse([sparse], id_col="doc_id", weights=[1.0, 2.0])
    with pytest.raises(ValueError, match="k must be"):
        rrf_fuse([sparse], id_col="doc_id", k=0)
    with pytest.raises(ValueError, match="topk"):
        rrf_fuse([sparse], id_col="doc_id", topk=0)


def test_rrf_fuse_best_rank_wins_on_duplicate_rows(spark):
    """Duplicate (query, doc) rows within ONE list never inflate
    rrf_score or n_lists — the best rank wins for that list."""
    from zcollection_spark.functions import rrf_fuse
    dup = spark.createDataFrame(
        [(0, 10, 1), (0, 10, 4), (0, 11, 2)],
        "query_id long, doc_id long, rank long")
    out = {r["doc_id"]: r for r in rrf_fuse([dup], id_col="doc_id").collect()}
    assert out[10]["rrf_score"] == round(1 / 61, 6)   # rank 1, not 1+4
    assert out[10]["n_lists"] == 1
    assert out[11]["rrf_score"] == round(1 / 62, 6)
    with pytest.raises(ValueError, match="non-negative"):
        rrf_fuse([dup], id_col="doc_id", weights=[-1.0])


def test_drop_duplicated_spans_removes_covered_tokens(spark):
    from zcollection_spark.functions import drop_duplicated_spans
    rows = [(0, "a b c x"),    # span(n=2) "a b","b c","c x"
            (1, "z a b q"),    # shares "a b" with doc 0
            (2, "p q"),        # unique span: untouched
            (3, "k")]          # shorter than n: untouched
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in drop_duplicated_spans(df, n=2).collect()}
    assert set(out) == {0, 1, 2, 3}
    # "a b" is cross-doc duplicated: tokens a,b cut from BOTH docs
    assert out[0]["text_scrubbed"] == "c x"
    assert (out[0]["n_tokens"], out[0]["n_tokens_kept"]) == (4, 2)
    assert out[1]["text_scrubbed"] == "z q"
    assert out[2]["text_scrubbed"] == "p q"
    assert out[3]["text_scrubbed"] == "k"
    assert out[3]["n_tokens_kept"] == 1
    # overlapping coverage: a doc that is ENTIRELY duplicated text
    rows2 = [(0, "a b c d e"), (1, "a b c d e"), (2, "m n o p q")]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    out2 = {r["doc_id"]: r
            for r in drop_duplicated_spans(df2, n=3).collect()}
    assert out2[0]["text_scrubbed"] == "" and out2[0]["n_tokens_kept"] == 0
    assert out2[1]["text_scrubbed"] == ""
    assert out2[2]["text_scrubbed"] == "m n o p q"
    # reserved output names guard + bad n
    with pytest.raises(ValueError, match="n must be"):
        drop_duplicated_spans(df, n=0)
    with pytest.raises(ValueError, match="already has"):
        drop_duplicated_spans(
            df.withColumn("n_tokens", F.lit(1)), n=2)


def test_ngram_containment_subset_doc(spark):
    """A short doc fully embedded in a long one: containment 1.0 in
    the short->long direction even though Jaccard is far below any
    dedup threshold — the case the asymmetric measure exists for."""
    from zcollection_spark.functions import (ngram_containment_pairs,
                                             unpersist_intermediates)
    rows = [
        (0, "alpha beta gamma delta"),                       # subset doc
        (1, "intro words alpha beta gamma delta more tail words here"),
        (2, "entirely different content with nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_containment_pairs(df, id_col="doc_id",
                                    text_col="text", shingle_size=3,
                                    threshold=0.9, max_df=100)
    got = pairs.collect()
    unpersist_intermediates(pairs)
    assert len(got) == 1
    r = got[0]
    assert (r["id_a"], r["id_b"]) == (0, 1)
    # all 2 of doc 0's 3-shingles appear in doc 1
    assert r["containment_a_in_b"] == pytest.approx(1.0)
    assert r["containment_b_in_a"] < 0.5   # jaccard-style symmetric
    with pytest.raises(ValueError, match="threshold"):
        ngram_containment_pairs(df, id_col="doc_id", text_col="text",
                                threshold=0.0, max_df=10)
    with pytest.raises(ValueError, match="max_df"):
        ngram_containment_pairs(df, id_col="doc_id", text_col="text",
                                threshold=0.5, max_df=0)


def test_ngram_containment_stop_shingle_guard(spark):
    """Shingles above max_df drop from the WHOLE computation — sizes
    and intersections stay mutually consistent over the pruned
    vocabulary (the Jaccard guard contract, asymmetric edition)."""
    from zcollection_spark.functions import (ngram_containment_pairs,
                                             unpersist_intermediates)
    # "x y z" appears in all 4 docs -> df=4 > max_df=3: dropped, so
    # docs 2/3 share NOTHING after the guard
    rows = [(0, "a b c d x y z"), (1, "a b c d x y z"),
            (2, "p q r x y z"), (3, "s t u x y z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_containment_pairs(df, id_col="doc_id",
                                    text_col="text", shingle_size=3,
                                    threshold=0.5, max_df=3)
    got = {(r["id_a"], r["id_b"]): r for r in pairs.collect()}
    unpersist_intermediates(pairs)
    assert (0, 1) in got
    assert all(k == (0, 1) for k in got)


def test_winnow_selection_guarantee_and_density(spark):
    """The winnowing guarantee (Schleimer et al. 2003): two documents
    sharing a substring of >= k + w - 1 tokens share at least one
    fingerprint; and ~2/(w+1) of gram hashes are kept."""
    from zcollection_spark.functions import winnow_fingerprints
    rng = np.random.RandomState(5)
    vocab = ["w%d" % i for i in range(50)]
    shared = " ".join(rng.choice(vocab, size=12))   # >= k+w-1 = 8 tokens
    rows = [
        (0, " ".join(rng.choice(vocab, size=30)) + " " + shared),
        (1, shared + " " + " ".join(rng.choice(vocab, size=30))),
        (2, " ".join(rng.choice(vocab, size=40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=5, window=4)
    by_doc = {i: {r["fp"] for r in fps.where(F.col("doc_id") == i)
                  .collect()} for i in range(3)}
    assert by_doc[0] & by_doc[1], "shared 12-token substring must share a fp"
    # density: kept fps well below the full gram count (43-ish grams)
    assert len(by_doc[2]) < 40 * 0.8
    with pytest.raises(ValueError, match="k must be"):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError, match="window"):
        winnow_fingerprints(df, window=0)


def test_winnow_matches_python_reference(spark):
    """Window minima vs a pure-python winnower over the same md5_long
    hash family."""
    import hashlib

    from zcollection_spark.functions import winnow_fingerprints
    rng = np.random.RandomState(9)
    vocab = ["t%d" % i for i in range(20)]
    rows = [(i, " ".join(rng.choice(vocab, size=rng.randint(5, 40))))
            for i in range(25)]
    k, w = 5, 4

    def md5_long(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    exp = {}
    for i, t in rows:
        toks = t.split()
        if len(toks) < k:
            continue
        hs = [md5_long(" ".join(toks[j:j + k]))
              for j in range(len(toks) - k + 1)]
        if len(hs) >= w:
            sel = {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}
        else:
            sel = {min(hs)}
        exp[i] = sel
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k=k, window=w).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    assert got == exp


def test_drop_duplicated_spans_gap_boundaries(spark):
    """The interval-gap rebuild at its exact boundaries: consecutive
    duplicated starts b - a == n leave NO gap (coverage is adjacent),
    b - a == n + 1 leaves exactly one surviving token, and coverage
    touching the document start/end empties the head/tail segments."""
    from zcollection_spark.functions import drop_duplicated_spans
    rows = [
        # starts 1 and 4 (b-a=3 > n=2): one-token gap at position 3
        (0, "x0 A B y0 C D z0"),
        # starts 1 and 3 (b-a=2 == n): adjacent coverage, no gap
        (1, "x1 A B C D z1"),
        # coverage at both edges: head and tail segments empty
        (2, "A B m2 C D"),
        # two-token gap, coverage at both edges
        (3, "A B q1 q2 C D"),
    ]
    # the duplicated 2-grams are exactly "A B" and "C D" (every joiner
    # gram carries a doc-unique token, so no accidental duplicates)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in drop_duplicated_spans(df, n=2).collect()}
    assert out[0]["text_scrubbed"] == "x0 y0 z0"
    assert out[1]["text_scrubbed"] == "x1 z1"
    assert out[2]["text_scrubbed"] == "m2"
    assert out[3]["text_scrubbed"] == "q1 q2"
    assert out[2]["n_tokens_kept"] == 1 and out[2]["n_tokens"] == 5


def test_released_scopes_the_cache_contract(spark, docs):
    """`with released(pairs):` releases the attached band/shingle
    frames on exit (errors included); a forgotten release stays
    DETECTABLE via cached_intermediates' storage-level inspection."""
    import pytest
    from zcollection_spark.functions import (cached_intermediates,
                                             released)
    from zcollection_spark.functions.dedup import (lsh_candidate_pairs,
                                                   minhash_signatures,
                                                   unpersist_intermediates)
    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    sigs = minhash_signatures(docs, id_col="doc_id", text_col="text",
                              shingle_size=3)
    with released(lsh_candidate_pairs(sigs, id_col="doc_id")) as pairs:
        pairs.count()
        assert len(cached_intermediates(pairs)) > 0   # live inside
    assert cached_intermediates(pairs) == []          # gone on exit
    assert jsc.getPersistentRDDs().size() == base
    # exceptions still release
    with pytest.raises(RuntimeError, match="boom"):
        with released(lsh_candidate_pairs(sigs, id_col="doc_id")) as p2:
            p2.count()
            raise RuntimeError("boom")
    assert cached_intermediates(p2) == []
    assert jsc.getPersistentRDDs().size() == base
    # the forgotten-release misuse mode is observable, then fixable
    leaked = lsh_candidate_pairs(sigs, id_col="doc_id")
    leaked.count()
    assert len(cached_intermediates(leaked)) > 0      # detected
    unpersist_intermediates(leaked)
    assert cached_intermediates(leaked) == []
    # multi-frame form releases every frame's intermediates
    with released(lsh_candidate_pairs(sigs, id_col="doc_id"),
                  lsh_candidate_pairs(sigs, id_col="doc_id")) as (a, b):
        a.count(); b.count()
    assert cached_intermediates(a) == [] and cached_intermediates(b) == []
    assert jsc.getPersistentRDDs().size() == base
    # plain frames (no attached intermediates) pass through untouched:
    # released() scopes the CONTRACT, it never unpersists the result
    docs.persist().count()
    with released(docs) as d:
        d.count()
    assert docs.storageLevel.useMemory   # caller's own persist survives
    docs.unpersist()


def _importance_reference(corpus: dict, target_texts: list):
    """Pure-python DSIR bag-of-words log-ratio (add-one over the union
    vocabulary) — the independent check on importance_weights."""
    import math
    from collections import Counter
    cs, ct = Counter(), Counter()
    for t in corpus.values():
        cs.update(t.split())
    for t in target_texts:
        ct.update(t.split())
    vocab = set(cs) | set(ct)
    v, ts, tt = float(len(vocab)), float(sum(cs.values())), \
        float(sum(ct.values()))
    lr = {w: math.log((ct[w] + 1.0) * (ts + v))
          - math.log((cs[w] + 1.0) * (tt + v)) for w in vocab}
    return {i: (len(t.split()), sum(lr[w] for w in t.split()))
            for i, t in corpus.items()}


def test_importance_weights_matches_python_reference(spark):
    from zcollection_spark.functions import (importance_weights,
                                             unpersist_intermediates)
    rng = np.random.RandomState(7)
    common = ["c%d" % i for i in range(10)]
    target_only = ["good%d" % i for i in range(5)]
    off = ["junk%d" % i for i in range(5)]
    corpus = {}
    for i in range(40):
        pool = common + (target_only if i % 2 == 0 else off)
        corpus[i] = " ".join(rng.choice(pool, size=rng.randint(4, 30)))
    target_ids = [i for i in corpus if i % 4 == 0]
    cdf = spark.createDataFrame(list(corpus.items()),
                                "doc_id long, text string")
    tdf = cdf.where(F.col("doc_id") % 4 == 0)
    out = importance_weights(cdf, tdf, id_col="doc_id")
    got = {r["doc_id"]: (r["n_tokens"], r["log_weight"])
           for r in out.collect()}
    unpersist_intermediates(out)
    exp = _importance_reference(corpus,
                                [corpus[i] for i in target_ids])
    assert set(got) == set(corpus)
    for i, (n_exp, w_exp) in exp.items():
        assert got[i][0] == n_exp
        assert got[i][1] == pytest.approx(w_exp, abs=2e-6)
    # documents built from target-flavored vocabulary must outscore
    # off-target ones per token (the signal the op exists for)
    import statistics
    per_tok = {i: got[i][1] / got[i][0] for i in got}
    on = statistics.mean(per_tok[i] for i in got if i % 2 == 0)
    offm = statistics.mean(per_tok[i] for i in got if i % 2 == 1)
    assert on > offm


def test_importance_resample_is_deterministic_gumbel_topk(spark):
    from zcollection_spark.functions import (importance_resample,
                                             importance_weights,
                                             unpersist_intermediates)
    from zcollection_spark.functions.sampling import uniform_draw
    rng = np.random.RandomState(19)
    vocab = ["w%d" % i for i in range(12)]
    corpus = {i: " ".join(rng.choice(vocab, size=8)) for i in range(60)}
    cdf = spark.createDataFrame(list(corpus.items()),
                                "doc_id long, text string")
    tdf = cdf.where(F.col("doc_id") < 10)
    out = importance_resample(cdf, tdf, id_col="doc_id", k=15)
    rows = out.collect()
    unpersist_intermediates(out)
    assert len(rows) == 15
    assert [r["rank"] for r in
            sorted(rows, key=lambda r: r["rank"])] == list(range(1, 16))
    # the sample IS the global top-k of (log_weight + gumbel(md5 u))
    w = importance_weights(cdf, tdf, id_col="doc_id")
    u = F.greatest(uniform_draw("doc_id"), F.lit(1e-15))
    keyed = w.withColumn(
        "k2", F.round(F.col("log_weight") - F.log(-F.log(u)), 6))
    exp = keyed.orderBy(F.col("k2").desc(), F.col("doc_id")).limit(15)
    assert ({(r["doc_id"], r["gumbel_key"]) for r in rows}
            == {(r["doc_id"], r["k2"]) for r in exp.collect()})
    unpersist_intermediates(w)
    # a different salt draws a different sample; the same salt replays
    out_b = importance_resample(cdf, tdf, id_col="doc_id", k=15)
    assert ({r["doc_id"] for r in out_b.collect()}
            == {r["doc_id"] for r in rows})
    unpersist_intermediates(out_b)
    out_s = importance_resample(cdf, tdf, id_col="doc_id", k=15,
                                salt="other")
    assert ({r["doc_id"] for r in out_s.collect()}
            != {r["doc_id"] for r in rows})
    unpersist_intermediates(out_s)
    with pytest.raises(ValueError, match="k must be"):
        importance_resample(cdf, tdf, id_col="doc_id", k=0)


def test_tfidf_topk_matches_python_reference(spark):
    import math
    from collections import Counter
    from zcollection_spark.functions import tfidf_topk
    corpus = {0: "apple apple banana cherry",
              1: "banana banana banana date",
              2: "apple date date egg egg egg",
              3: "fig"}
    cdf = spark.createDataFrame(list(corpus.items()),
                                "doc_id long, text string")
    got = tfidf_topk(cdf, id_col="doc_id", text_col="text",
                     k=2).collect()
    dfreq = Counter(w for t in corpus.values() for w in set(t.split()))
    n = float(len(corpus))
    exp = {}
    for i, t in corpus.items():
        scores = {w: c * (math.log((n + 1.0) / (dfreq[w] + 1.0)) + 1.0)
                  for w, c in Counter(t.split()).items()}
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        for rank, (w, s) in enumerate(top, 1):
            exp[(i, w)] = (s, rank)
    assert {(r["doc_id"], r["term"]) for r in got} == set(exp)
    for r in got:
        s, rank = exp[(r["doc_id"], r["term"])]
        assert r["score"] == pytest.approx(s, abs=2e-6)
        assert r["rank"] == rank
    with pytest.raises(ValueError, match="k must be"):
        tfidf_topk(cdf, id_col="doc_id", text_col="text", k=0)


def test_tfidf_topk_size_gated_pin(spark):
    """The r17 size-gated tf-table pin (mirror of the unigram_stats
    gate): identical results with the gate forced on, forced off, and
    at the default; the pin actually engages (persisted handle
    attached + InMemoryRelation in the plan) only when the corpus'
    estimated scan size reaches the threshold."""
    from zcollection_spark import config
    from zcollection_spark.functions import tfidf_topk
    cdf = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "banana date"),
         (2, "apple date date egg")],
        "doc_id long, text string")

    def run(threshold):
        with config.override(
                **{"retrieval.pin_tf_min_input_bytes": threshold}):
            out = tfidf_topk(cdf, id_col="doc_id", text_col="text",
                             k=2)
            rows = sorted(map(tuple, out.collect()))
            pinned = bool(getattr(out, "_zc_cached", ()))
            plan = out._jdf.queryExecution().executedPlan().toString()
            for h in getattr(out, "_zc_cached", ()):
                h.unpersist()
            return rows, pinned, plan

    base, pinned_off, _ = run(None)
    rows0, pinned_on, plan0 = run(0)          # always pin
    rows_def, _, _ = run(4 << 20)             # default: tiny df, no pin
    assert not pinned_off
    assert pinned_on and "InMemoryRelation" in plan0
    assert base == rows0 == rows_def


def test_split_leakage_flags_only_cross_split_near_dups(spark):
    import hashlib
    from zcollection_spark.functions import (split_leakage,
                                             unpersist_intermediates)
    # three exact near-dup pairs + unrelated docs; the hash split is
    # predictable from python's md5, so the expectation is exact
    base = {0: "alpha beta gamma delta epsilon zeta",
            2: "one two three four five six seven",
            4: "red orange yellow green blue indigo"}
    rows = []
    for i, t in base.items():
        rows += [(i, t), (i + 1, t)]           # identical twin
    rows += [(100, "totally unrelated content words here"),
             (101, "other disjoint vocabulary tokens")]
    splits = {"train": 0.5, "val": 0.25, "test": 0.25}

    def py_split(doc_id):
        u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15],
                16) / 16.0 ** 15
        return ("train" if u < 0.5 else "val" if u < 0.75 else "test")

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = split_leakage(df, id_col="doc_id", text_col="text",
                        splits=splits, shingle_size=3, threshold=0.9,
                        max_df=100)
    got = {(r["id_a"], r["id_b"]): (r["split_a"], r["split_b"])
           for r in out.collect()}
    unpersist_intermediates(out)
    exp = {(i, i + 1): (py_split(i), py_split(i + 1))
           for i in base if py_split(i) != py_split(i + 1)}
    assert got == exp
    # sanity: the fixture actually exercises both outcomes (at least
    # one leaking pair and at least one same-split pair)
    assert 0 < len(exp) < len(base)


def test_materialize_dir_swaps_persist_for_parquet_tables(spark, docs,
                                                          tmp_path):
    """With `dedup.materialize_dir` set, the wide shared intermediates
    become write-once parquet tables under the directory (no cached
    RDDs), results are IDENTICAL to the persist path, and release
    deletes the tables — the documented 100-TB posture made real."""
    from zcollection_spark import config
    from zcollection_spark.functions import (cached_intermediates,
                                             ngram_jaccard_pairs,
                                             unpersist_intermediates)
    from zcollection_spark.functions.dedup import (lsh_candidate_pairs,
                                                   minhash_signatures)

    def lsh_pairs():
        sigs = minhash_signatures(docs, id_col="doc_id",
                                  text_col="text", shingle_size=3)
        return lsh_candidate_pairs(sigs, id_col="doc_id")

    def jac_pairs():
        return ngram_jaccard_pairs(docs, id_col="doc_id",
                                   text_col="text", shingle_size=3,
                                   threshold=0.3, max_df=100)

    base_lsh = lsh_pairs()
    base_jac = jac_pairs()
    exp_lsh = {(r["id_a"], r["id_b"]) for r in base_lsh.collect()}
    exp_jac = {(r["id_a"], r["id_b"], round(r["jaccard"], 9))
               for r in base_jac.collect()}
    unpersist_intermediates(base_lsh)
    unpersist_intermediates(base_jac)

    jsc = spark.sparkContext._jsc.sc()
    base_rdds = jsc.getPersistentRDDs().size()
    mat = tmp_path / "intermediates"
    mat.mkdir()
    with config.override(**{"dedup.materialize_dir": str(mat)}):
        p1, p2 = lsh_pairs(), jac_pairs()
        got_lsh = {(r["id_a"], r["id_b"]) for r in p1.collect()}
        got_jac = {(r["id_a"], r["id_b"], round(r["jaccard"], 9))
                   for r in p2.collect()}
    assert got_lsh == exp_lsh and got_jac == exp_jac
    tables = sorted(mat.glob("zc-intermediate-*"))
    # lsh banding + jaccard raw expansion + guarded expansion
    assert len(tables) >= 3
    # only the (small, counted) stop list still persists as a cache
    assert jsc.getPersistentRDDs().size() <= base_rdds + 1
    # the audit sees live table handles; release DELETES the tables
    assert len(cached_intermediates(p1)) >= 1
    assert len(cached_intermediates(p2)) >= 2
    unpersist_intermediates(p1)
    unpersist_intermediates(p2)
    assert cached_intermediates(p1) == []
    assert cached_intermediates(p2) == []
    assert list(mat.glob("zc-intermediate-*")) == []
    assert jsc.getPersistentRDDs().size() == base_rdds


def test_lm_quality_buckets_matches_python_reference(spark):
    """lm_quality_buckets == a Counter-based bigram-LM + exact
    interpolated-percentile replay, including the boundary ties
    (scores AT a rounded boundary go to the lower bucket)."""
    import math
    from collections import Counter
    from zcollection_spark.functions import lm_quality_buckets
    rng = np.random.RandomState(23)
    vocab = ["b%d" % i for i in range(6)]
    corpus = {i: " ".join(rng.choice(vocab, size=rng.randint(2, 18)))
              for i in range(50)}
    corpus[90] = "solo"                       # <2 tokens: absent
    cdf = spark.createDataFrame(list(corpus.items()),
                                "doc_id long, text string")
    got = {r["doc_id"]: (r["lm_score"], r["bucket"])
           for r in lm_quality_buckets(cdf, id_col="doc_id",
                                       text_col="text").collect()}
    # reference scores
    cb, cu = Counter(), Counter()
    pairs = {}
    for i, t in corpus.items():
        ws = t.split()
        pairs[i] = [(ws[j], ws[j] + " " + ws[j + 1])
                    for j in range(len(ws) - 1)]
        for w1, pr in pairs[i]:
            cb[pr] += 1
            cu[w1] += 1
    scores = {i: round(sum(cb[pr] / cu[w1] for w1, pr in ps)
                       / len(ps), 6)
              for i, ps in pairs.items() if ps}

    def pct(vals, p):
        vs = sorted(vals)
        pos = (len(vs) - 1) * p
        lo, hi = math.floor(pos), math.ceil(pos)
        return round(vs[lo] * (hi - pos) + vs[hi] * (pos - lo), 6) \
            if lo != hi else round(vs[lo], 6)

    b1 = pct(scores.values(), 1 / 3)
    b2 = pct(scores.values(), 2 / 3)
    exp = {i: (s, "tail" if s <= b1 else "middle" if s <= b2
               else "head") for i, s in scores.items()}
    assert got == exp
    assert 90 not in got
    # all three buckets occupied, tail scores <= head scores
    labs = {b for _, b in got.values()}
    assert labs == {"tail", "middle", "head"}
    assert (max(s for s, b in got.values() if b == "tail")
            <= min(s for s, b in got.values() if b == "head"))
    # percentile-buffer bound pin (r14 verdict task 5): the score
    # column entering F.percentile is pre-rounded to 6 dp at its
    # source, so the exact-percentile buffer is bounded by the
    # <=1e6-point score grid at ANY corpus size, never by |docs|
    assert all(s == round(s, 6) for s, _ in got.values())
    with pytest.raises(ValueError, match="labels"):
        lm_quality_buckets(cdf, id_col="doc_id", text_col="text",
                           labels=("a", "b"))
    with pytest.raises(ValueError, match="cuts"):
        lm_quality_buckets(cdf, id_col="doc_id", text_col="text",
                           cuts=(0.9, 0.1), labels=("a", "b", "c"))
    # duplicate adjacent cuts are NOT strictly increasing (r14 advice:
    # sorted() alone accepted (0.5, 0.5) and silently emptied a bucket)
    with pytest.raises(ValueError, match="cuts"):
        lm_quality_buckets(cdf, id_col="doc_id", text_col="text",
                           cuts=(0.5, 0.5), labels=("a", "b", "c"))


def test_suggest_minhash_config_is_the_scurve_argmin():
    """The returned (bands, rows) minimizes the weighted FP+FN mass of
    1-(1-s^r)^b over ALL factorizations (brute-force replay), the knee
    tracks the threshold, and recall-weighting widens the bands."""
    from zcollection_spark.functions import suggest_minhash_config

    def masses(bands, rows, t, steps=1000):
        fp = fn = 0.0
        for i in range(steps):
            s = (i + 0.5) / steps
            p = 1.0 - (1.0 - s ** rows) ** bands
            if s < t:
                fp += p / steps
            else:
                fn += (1.0 - p) / steps
        return fp, fn

    for t in (0.3, 0.5, 0.8):
        got = suggest_minhash_config(t, 16)
        assert got["bands"] * got["rows"] == 16
        best = min(((0.5 * sum(masses(b, 16 // b, t)), b)
                    for b in range(1, 17) if 16 % b == 0))
        assert got["bands"] == best[1]
        fp, fn = masses(got["bands"], got["rows"], t)
        assert got["fp_mass"] == pytest.approx(fp)
        assert got["fn_mass"] == pytest.approx(fn)
    # a recall-heavy weighting never narrows the bands (more bands =
    # more candidate chances = fewer false negatives)
    bal = suggest_minhash_config(0.8, 16)
    recall = suggest_minhash_config(0.8, 16, fp_weight=0.1,
                                    fn_weight=0.9)
    assert recall["bands"] >= bal["bands"]
    # knees decrease as thresholds decrease
    knees = [suggest_minhash_config(t, 16)["knee"]
             for t in (0.9, 0.5, 0.3)]
    assert knees == sorted(knees, reverse=True)
    for bad in (0.0, 1.0):
        with pytest.raises(ValueError, match="threshold"):
            suggest_minhash_config(bad, 16)
    with pytest.raises(ValueError, match="num_hashes"):
        suggest_minhash_config(0.5, 0)
    with pytest.raises(ValueError, match="weights"):
        suggest_minhash_config(0.5, 16, fp_weight=0, fn_weight=0)


def test_importance_weights_hashed_bigram_form(spark):
    """shingle_size=2 + hash_buckets replays the paper's hashed-ngram
    estimator: features are md5-bucketed word bigrams, collisions fold
    into both models identically (python hashlib reference)."""
    import hashlib
    import math
    from collections import Counter
    from zcollection_spark.functions import (importance_weights,
                                             unpersist_intermediates)
    rng = np.random.RandomState(31)
    vocab = ["h%d" % i for i in range(9)]
    corpus = {i: " ".join(rng.choice(vocab, size=rng.randint(1, 14)))
              for i in range(30)}
    buckets = 16

    def feats(t):
        ws = t.split()
        grams = ([" ".join(ws[j:j + 2]) for j in range(len(ws) - 1)]
                 if len(ws) >= 2 else [" ".join(ws)])
        return [int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                % buckets for g in grams]

    cs, ct = Counter(), Counter()
    for t in corpus.values():
        cs.update(feats(t))
    target_ids = [i for i in corpus if i % 3 == 0]
    for i in target_ids:
        ct.update(feats(corpus[i]))
    fv = set(cs) | set(ct)
    v, ts, tt = float(len(fv)), float(sum(cs.values())), \
        float(sum(ct.values()))
    lr = {w: math.log((ct[w] + 1.0) * (ts + v))
          - math.log((cs[w] + 1.0) * (tt + v)) for w in fv}
    exp = {i: (len(feats(t)), sum(lr[w] for w in feats(t)))
           for i, t in corpus.items()}
    cdf = spark.createDataFrame(list(corpus.items()),
                                "doc_id long, text string")
    out = importance_weights(cdf, cdf.where(F.col("doc_id") % 3 == 0),
                             id_col="doc_id", shingle_size=2,
                             hash_buckets=buckets)
    got = {r["doc_id"]: (r["n_tokens"], r["log_weight"])
           for r in out.collect()}
    unpersist_intermediates(out)
    assert set(got) == set(exp)
    for i, (n, w) in exp.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(w, abs=2e-6)
    with pytest.raises(ValueError, match="shingle_size"):
        importance_weights(cdf, cdf, id_col="doc_id", shingle_size=0)
    with pytest.raises(ValueError, match="hash_buckets"):
        importance_weights(cdf, cdf, id_col="doc_id", hash_buckets=0)


# -- round-16 batch: domain mixing, cross-reference LM, CDC chunking -------

def test_domain_mix_weights_matches_python_reference(spark):
    import math
    from zcollection_spark.functions import domain_mix_weights
    docs = [(0, "the quick brown fox jumps over the lazy dog", "web"),
            (1, "the quick brown fox naps all day long today", "web"),
            (2, "alpha beta gamma delta epsilon zeta eta theta", "wiki"),
            (3, "one two", "wiki"), (4, "single", "code"),
            (5, None, "code"), (6, "   ", "code")]
    df = spark.createDataFrame(docs, "doc_id long, text string, "
                                     "source string")
    out = {r["source"]: r for r in domain_mix_weights(df).collect()}
    toks, nd = {}, {}
    for _, t, s in docs:
        toks[s] = toks.get(s, 0) + (len(t.split()) if t and t.strip()
                                    else 0)
        nd[s] = nd.get(s, 0) + 1
    tot = sum(toks.values())
    share = {s: toks[s] / tot for s in toks}
    flat = {s: math.sqrt(share[s]) for s in share}
    sflat = sum(flat.values())
    assert set(out) == set(toks)
    for s in toks:
        tgt = flat[s] / sflat
        r = out[s]
        assert r["n_docs"] == nd[s] and r["n_tokens"] == toks[s]
        assert r["natural_share"] == pytest.approx(share[s], abs=1e-6)
        assert r["target_share"] == pytest.approx(tgt, abs=1e-6)
        assert r["mix_weight"] == pytest.approx(tgt / share[s], abs=2e-6)
    # temperature extremes: tau=1 keeps the natural mix exactly
    nat = {r["source"]: r for r in
           domain_mix_weights(df, temperature=1.0).collect()}
    for s in toks:
        assert nat[s]["mix_weight"] == pytest.approx(1.0, abs=2e-6)


def test_domain_mix_weights_composes_with_upsample(spark):
    """The recipe table's mix_weight drives upsample_by_weight: the
    realized token mass per domain scales to ~the target share."""
    from zcollection_spark.functions import (domain_mix_weights,
                                             upsample_by_weight)
    rows = [(i, "tok " * (1 + i % 3), "big" if i < 80 else "small")
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                                     "source string")
    recipe = {r["source"]: r["mix_weight"]
              for r in domain_mix_weights(df).collect()}
    up = upsample_by_weight(df, id_col="doc_id", strata_col="source",
                            weights=recipe)
    got = {r["source"]: r["n"] for r in
           up.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # small domain upweighted, big downweighted; both present
    assert got["small"] > 20 * recipe["small"] * 0.5
    assert got["big"] < 80 * recipe["big"] * 1.5


def test_cross_lm_score_matches_python_reference(spark):
    from collections import Counter
    from zcollection_spark.functions import cross_lm_score
    docs = [(0, "the quick brown fox jumps over the lazy dog", "web"),
            (1, "the quick brown fox naps all day long today", "web"),
            (2, "alpha beta gamma delta epsilon zeta eta theta", "wiki"),
            (3, "one two", "wiki"), (4, "single", "code"),
            (5, None, "code")]
    df = spark.createDataFrame(docs, "doc_id long, text string, "
                                     "source string")
    ref = df.where("source = 'web'")
    got = {r["doc_id"]: r for r in cross_lm_score(df, ref).collect()}
    cb, cu, vocab = Counter(), Counter(), set()
    for _, t, s in docs:
        if s != "web":
            continue
        ws = t.split()
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            cb[(a, b)] += 1
            cu[a] += 1
    V = len(vocab)
    exp = {}
    for i, t, _ in docs:
        ws = (t or "").split()
        if len(ws) < 2:
            continue
        ps = [(cb[(a, b)] + 1) / (cu[a] + V) for a, b in zip(ws, ws[1:])]
        oov = sum((a, b) not in cb for a, b in zip(ws, ws[1:])) / len(ps)
        exp[i] = (len(ps), sum(ps) / len(ps), oov)
    assert set(got) == set(exp)
    for i, (nb, mp, oov) in exp.items():
        assert got[i]["n_bigrams"] == nb
        assert got[i]["mean_cond_p"] == pytest.approx(mp, abs=6e-7)
        assert got[i]["oov_bigram_share"] == pytest.approx(oov)
    # an in-reference doc scores higher than an out-of-register one
    assert got[0]["mean_cond_p"] > got[2]["mean_cond_p"]
    assert got[2]["oov_bigram_share"] == 1.0


def test_cdc_chunks_matches_python_reference(spark):
    import hashlib
    from zcollection_spark.functions import cdc_chunks

    def md5_long(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    k, m = 3, 4
    docs = [(0, "the quick brown fox jumps over the lazy dog and "
                "then runs far away into the deep dark woods tonight"),
            (1, "one two"), (2, "a b c d e f g h i j k l m n o p"),
            (3, None), (4, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = cdc_chunks(df, shingle_size=k, boundary_mod=m).collect()
    bydoc = {}
    for r in rows:
        bydoc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_text"], r["n_tokens"]))
    for i, t in docs:
        ws = t.split() if t else [""]
        n = len(ws)
        bs = ([j for j in range(k, n + 1)
               if md5_long(" ".join(ws[j - k:j])) % m == 0]
              if n >= k else [])
        ends = bs + ([n] if (not bs or bs[-1] != n) else [])
        starts = [0] + ends[:-1]
        exp = [(ci, " ".join(ws[s:e]), e - s)
               for ci, (s, e) in enumerate(zip(starts, ends))]
        assert sorted(bydoc[i]) == exp, i
    # reconstruction: chunks concatenate back to the token stream
    for i, t in docs:
        if not t:
            continue
        joined = " ".join(c[1] for c in sorted(bydoc[i]))
        assert joined == " ".join(t.split())


def test_cdc_chunks_boundaries_stable_under_prefix_insertion(spark):
    """THE content-defined property: prepending text only changes
    chunks near the edit; the downstream chunk set is preserved
    (fixed-stride chunking shifts every boundary instead)."""
    from zcollection_spark.functions import cdc_chunks
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
            "omega one two three four five six seven eight nine ten")
    edited = "NEW TOKENS IN FRONT " + base
    df = spark.createDataFrame([(0, base), (1, edited)],
                               "doc_id long, text string")
    rows = cdc_chunks(df, shingle_size=3, boundary_mod=4).collect()
    chunks = {0: set(), 1: set()}
    for r in rows:
        chunks[r["doc_id"]].add(r["chunk_text"])
    shared = chunks[0] & chunks[1]
    # all but the first chunk(s) of each doc survive the edit
    assert len(shared) >= len(chunks[0]) - 2
    with pytest.raises(ValueError, match="shingle_size"):
        cdc_chunks(df, shingle_size=0)
    with pytest.raises(ValueError, match="boundary_mod"):
        cdc_chunks(df, boundary_mod=0)


def test_cdc_chunks_min_tokens_merges_close_boundaries(spark):
    """min_tokens: a boundary closer than min_tokens to the last
    ACCEPTED boundary is skipped (left fold semantics); the tail chunk
    still closes at n and may be shorter; min_tokens=1 is the
    unconstrained operator."""
    import hashlib
    from zcollection_spark.functions import cdc_chunks

    def md5_long(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    k, m, mn = 2, 2, 4
    docs = [(0, "a b c d e f g h i j k l m n o p q r s t"),
            (1, "one two three"), (2, "x")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = cdc_chunks(df, shingle_size=k, boundary_mod=m,
                      min_tokens=mn).collect()
    bydoc = {}
    for r in rows:
        bydoc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_text"], r["n_tokens"]))
    for i, t in docs:
        ws = t.split()
        n = len(ws)
        raw = ([j for j in range(k, n + 1)
                if md5_long(" ".join(ws[j - k:j])) % m == 0]
               if n >= k else [])
        acc: list = []
        for e in raw:
            if e - (acc[-1] if acc else 0) >= mn:
                acc.append(e)
        ends = acc + ([n] if (not acc or acc[-1] != n) else [])
        starts = [0] + ends[:-1]
        exp = [(ci, " ".join(ws[s:e]), e - s)
               for ci, (s, e) in enumerate(zip(starts, ends))]
        assert sorted(bydoc[i]) == exp, i
        # every non-tail chunk honors the minimum
        for _, _, ntok in sorted(bydoc[i])[:-1]:
            assert ntok >= mn
    # min_tokens=1 is bit-identical to the unconstrained form
    a = sorted(map(tuple, cdc_chunks(df, shingle_size=k, boundary_mod=m)
                   .collect()))
    b = sorted(map(tuple, cdc_chunks(df, shingle_size=k, boundary_mod=m,
                                     min_tokens=1).collect()))
    assert a == b
    with pytest.raises(ValueError, match="min_tokens"):
        cdc_chunks(df, min_tokens=0)


def test_feature_hash_embeddings_matches_python_reference(spark):
    import hashlib
    import math
    from zcollection_spark.functions import feature_hash_embeddings

    def md5_long(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = [(0, "the quick brown fox the quick"),
            (1, "alpha beta gamma"), (2, "x"), (3, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    dim = 16
    got = {}
    for r in feature_hash_embeddings(df, dim=dim).collect():
        got.setdefault(r["doc_id"], {})[r["dim"]] = r["value"]
    assert 3 not in got          # null text -> no embedding rows
    for i, t in docs:
        if not t or not t.strip():
            continue
        ws = t.split()
        raw: dict = {}
        for w in ws:
            b = md5_long(w) % dim
            sg = 1 if md5_long("s:" + w) % 2 == 0 else -1
            raw[b] = raw.get(b, 0) + sg
        nrm = math.sqrt(sum(v * v for v in raw.values()))
        exp = {b: round(v / nrm, 6) if nrm > 0 else float(v)
               for b, v in raw.items()}
        assert got[i] == pytest.approx(exp, abs=1e-9), i
    # normalized vectors are unit length (over the sparse rows)
    for i in (0, 1):
        assert sum(v * v for v in got[i].values()) == \
            pytest.approx(1.0, abs=1e-4)
    # unnormalized form returns the raw signed counts
    rawdf = feature_hash_embeddings(df, dim=dim, normalize=False)
    vals = {(r["doc_id"], r["dim"]): r["value"] for r in rawdf.collect()}
    assert all(float(v).is_integer() for v in vals.values())
    with pytest.raises(ValueError, match="dim"):
        feature_hash_embeddings(df, dim=0)


def test_feature_hash_embeddings_cosine_tracks_token_overlap(spark):
    """The hashing-trick contract: near-identical documents have high
    cosine; disjoint-vocabulary documents have low |cosine|."""
    from zcollection_spark.functions import feature_hash_embeddings
    docs = [(0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon eta"),
            (2, "one two three four five six")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    vecs = {}
    for r in feature_hash_embeddings(df, dim=64).collect():
        vecs.setdefault(r["doc_id"], {})[r["dim"]] = r["value"]

    def cos(a, b):
        return sum(a.get(k, 0.0) * b.get(k, 0.0)
                   for k in set(a) | set(b))

    assert cos(vecs[0], vecs[1]) > 0.6
    assert abs(cos(vecs[0], vecs[2])) < 0.4


def test_ngram_coverage_matches_python_reference(spark):
    from zcollection_spark.functions import ngram_coverage
    docs = [(0, "a b c d e f g h"), (1, "a b c d e x y z"),
            (2, "p q r s t u v w"), (3, "one two")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c d e f g")],
                                  "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_coverage(df, bench).collect()}

    def sh(t, n=5):
        ws = t.split()
        return (set(" ".join(ws[i:i + n])
                    for i in range(len(ws) - n + 1))
                if len(ws) >= n else {" ".join(ws)})

    bs = sh("a b c d e f g")
    for i, t in docs:
        S = sh(t)
        hit = len(S & bs)
        r = out[i]
        assert r["n_shingles"] == len(S)
        assert r["n_contaminated"] == hit
        assert r["coverage"] == pytest.approx(round(hit / len(S), 6))
    # a benchmark member scores high; an unrelated doc scores 0
    assert out[0]["coverage"] > 0.5
    assert out[2]["coverage"] == 0.0


def test_corpus_profile_matches_numpy_percentiles(spark):
    import numpy as np
    from zcollection_spark.functions import corpus_profile
    from zcollection_spark.functions.text import STOPWORDS
    docs = [(0, "the quick brown fox jumps", "s0"),
            (1, "a b", "s0"), (2, "one two three four five six", "s0"),
            (3, "p q r s t u v w x y", "s1"), (4, "of the and", "s1")]
    df = spark.createDataFrame(docs, "doc_id long, text string, "
                                     "source string")
    prof = {r["source"]: r for r in corpus_profile(df).collect()}
    for s in ("s0", "s1"):
        nts = [len(t.split()) for _, t, g in docs if g == s]
        srs = [round(len(set(t.split()) & set(STOPWORDS))
                     / max(len(t.split()), 1), 6)
               for _, t, g in docs if g == s]
        r = prof[s]
        assert r["n_docs"] == len(nts) and r["n_tokens"] == sum(nts)
        for q, col in ((10, "tokens_p10"), (50, "tokens_p50"),
                       (90, "tokens_p90")):
            want = float(np.percentile(nts, q, method="linear"))
            assert r[col] == pytest.approx(round(want, 6), abs=1e-9)
        assert r["stop_ratio_p50"] == pytest.approx(
            round(float(np.percentile(srs, 50, method="linear")), 6),
            abs=1.5e-6)
