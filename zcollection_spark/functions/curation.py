"""Training-data curation: PII scrubbing, benchmark decontamination,
intra-document repetition.

The remaining standard passes of an LLM data pipeline beyond dedup/
quality scoring (functions/text.py, functions/dedup.py): strip
personally-identifying spans, drop documents that leak evaluation
benchmarks, and measure within-document repetition (boilerplate/spam
signal).  All JVM-side column expressions (whole-stage codegen; no
Python in the hot path), with exact DuckDB SQL twins — regex patterns
are restricted to constructs with identical semantics in Java regex
(Spark) and RE2 (DuckDB): no lookaround, no backreferences.

No reference counterpart: the reference is an array-storage engine;
these are the data-pipeline operators the build brief adds as
first-class components.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import word_shingles, words

#: PII span patterns (Java-regex/RE2-identical).  Deliberately
#: conservative, high-precision forms — a curation pass prefers missing
#: an exotic obfuscated email over mangling ordinary text.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}

#: Scrub order is load-bearing: emails can contain digit runs, and an
#: SSN-shaped span inside an already-replaced token must not re-match,
#: so spans are counted on the ORIGINAL text and replaced longest-form
#: first.
_SCRUB_ORDER = ("email", "ipv4", "ssn")


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str = "text_scrubbed") -> DataFrame:
    """Replace PII spans with ``<KIND>`` sentinels and count them.

    Adds ``n_{kind}`` count columns (matched on the original text) and
    ``out_col`` with every span replaced — each kind is one JVM
    ``regexp_replace``/``regexp_extract_all`` over the row, no shuffle,
    no UDF: the pass is scan-speed at any scale.
    """
    out = df
    for kind in _SCRUB_ORDER:
        pat = PII_PATTERNS[kind]
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(text_col, F.lit(pat), F.lit(0))))
    scrubbed: Column = F.col(text_col)
    for kind in _SCRUB_ORDER:
        scrubbed = F.regexp_replace(
            scrubbed, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out.withColumn(out_col, scrubbed)


def contamination(train: DataFrame, benchmark: DataFrame, *,
                  id_col: str, text_col: str = "text",
                  n: int = 5) -> DataFrame:
    """Benchmark decontamination: training documents sharing any word
    ``n``-gram with the benchmark set, with the overlap count.

    Returns ``(id_col, n_overlap)`` for flagged documents only (the
    drop list).  Scale shape: the benchmark side reduces to DISTINCT
    shingles and is broadcast (benchmarks are thousands of documents,
    not billions), so the training side is one scan + explode +
    broadcast semi-join + partial-aggregated count — no full shuffle
    of the corpus and fan-out bounded by tokens-per-document.
    """
    bench_sh = (benchmark
                .select(F.explode(word_shingles(text_col, n))
                        .alias("__s"))
                .distinct())
    train_sh = (train
                .select(F.col(id_col),
                        F.explode(word_shingles(text_col, n))
                        .alias("__s"))
                .distinct())
    return (train_sh.join(F.broadcast(bench_sh), on="__s")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_overlap")))


def _top_token_run(toks) -> Column:
    """Count of the most frequent token — ONE aggregate pass over the
    SORTED token array (longest equal-run == max frequency), shuffle-
    free: the shared kernel of repetition_stats and quality_filter."""
    return F.aggregate(
        F.array_sort(toks),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1))).alias("best")),
        lambda acc: acc["best"])


#: Gopher-style quality-rule thresholds (Rae et al. 2021, "Scaling
#: Language Models: ... Gopher", table A1 — the published heuristics,
#: parameterized).  Tuned DOWN for short synthetic docs in the entry
#: query; production corpora use the paper's values.
GOPHER_RULES = {
    "min_words": 50, "max_words": 100_000,
    "min_mean_word_len": 3.0, "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,       # '#' or '…' per word
    "min_stopword_hits": 2,        # distinct common-word hits
    "max_top_token_ratio": 0.2,    # repetition guard
}


def quality_filter(df: DataFrame, *, text_col: str = "text",
                   rules: dict | None = None) -> DataFrame:
    """Gopher-style quality verdict per document: the published
    heuristic rule set (word-count bounds, mean word length bounds,
    symbol ratio, stopword requirement, repetition guard) as ONE pass
    of JVM column expressions — no shuffle, no Python, so the filter
    is scan-speed over any corpus.

    Adds boolean ``q_*`` columns (one per rule, for drop-reason
    analytics) and ``keep`` (their conjunction).  Thresholds override
    via ``rules``."""
    from .text import STOPWORDS
    r = dict(GOPHER_RULES)
    r.update(rules or {})
    toks = words(text_col)
    n = F.size(toks)
    mean_len = (F.length(text_col) - (n - 1)) / n
    symbols = F.size(F.regexp_extract_all(
        text_col, F.lit(r"[#…]"), F.lit(0)))
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(toks), F.lit(list(STOPWORDS))))
    top_run = _top_token_run(toks)
    checks = {
        "q_word_count": (n >= r["min_words"]) & (n <= r["max_words"]),
        "q_mean_word_len": (mean_len >= r["min_mean_word_len"])
        & (mean_len <= r["max_mean_word_len"]),
        "q_symbol_ratio": (symbols / n) <= r["max_symbol_ratio"],
        "q_stopwords": stop_hits >= r["min_stopword_hits"],
        "q_repetition": (top_run / n.cast("double"))
        <= r["max_top_token_ratio"],
    }
    out = df
    keep = F.lit(True)
    for name, cond in checks.items():
        # NULL text must read as a FAILED rule, not a NULL one:
        # otherwise `where('keep')` AND `where('NOT keep')` both drop
        # the row and null-text documents vanish from drop analytics.
        out = out.withColumn(name, F.coalesce(cond, F.lit(False)))
        keep = keep & F.col(name)
    return out.withColumn("keep", F.coalesce(keep, F.lit(False)))


def repetition_stats(df: DataFrame, *, text_col: str = "text",
                     n: int = 5) -> DataFrame:
    """Within-document repetition: the boilerplate/spam signal.

    Adds ``top_token_ratio`` (most frequent token's share of all
    tokens) and ``dup_ngram_ratio`` (1 - distinct/total word
    ``n``-grams).  Both are per-row Catalyst expressions — the
    top-token count runs over the SORTED token array in one
    ``aggregate`` pass (longest equal-run), so the cost is
    O(tokens·log tokens) per document with NO shuffle, instead of the
    explode + groupBy + window two-shuffle alternative.
    """
    toks = words(text_col)
    run = _top_token_run(toks)
    grams = word_shingles(text_col, n)
    return (df
            .withColumn("top_token_ratio",
                        run / F.size(toks).cast("double"))
            .withColumn("dup_ngram_ratio",
                        F.lit(1.0) - F.size(F.array_distinct(grams))
                        / F.size(grams).cast("double")))


def split_leakage(df: DataFrame, *, id_col: str, text_col: str = "text",
                  splits=None, salt: str = "",
                  shingle_size: int = 5, threshold: float = 0.8,
                  max_df: int | None = None) -> DataFrame:
    """Near-duplicate LEAKAGE across train/val/test splits: document
    pairs that are n-gram near-duplicates of each other yet land in
    DIFFERENT hash splits — the eval-hygiene check every training
    pipeline needs before trusting held-out metrics (a test document
    whose near-copy sits in train is measured as memorization, not
    generalization; splitting uniformly at the document level
    guarantees this happens for every near-dup cluster that straddles
    the split boundary).

    Returns the quarantine list ``(id_a, id_b, jaccard, split_a,
    split_b)`` with ``id_a < id_b``, restricted to pairs whose two
    sides landed in different splits.  ``splits``/``salt`` are
    :func:`~zcollection_spark.functions.sampling.hash_split`'s
    parameters (the assignment replayed here is bit-identical to the
    one a pipeline using ``hash_split`` trained with); ``threshold`` /
    ``shingle_size`` / ``max_df`` are
    :func:`~zcollection_spark.functions.dedup.ngram_jaccard_pairs`'
    (exact Jaccard, prefix-filtered when ``max_df`` is None).

    Scale shape: the pair generation is the bounded Jaccard join (its
    scale contract applies unchanged); the split assignment is a pure
    md5 expression on a two-column projection of the corpus, joined to
    the (small) pair list twice by id — AQE broadcasts the pair side.
    Persisted shingle intermediates ride the result under the
    dedup-family cache contract (``unpersist_intermediates`` /
    ``released``).
    """
    from .dedup import _attach_cached, ngram_jaccard_pairs
    from .sampling import hash_split
    pairs = ngram_jaccard_pairs(df, id_col=id_col, text_col=text_col,
                                shingle_size=shingle_size,
                                threshold=threshold, max_df=max_df)
    assigned = hash_split(df.select(id_col), id_col=id_col,
                          splits=splits, salt=salt)
    a = assigned.select(F.col(id_col).alias("id_a"),
                        F.col("split").alias("split_a"))
    b = assigned.select(F.col(id_col).alias("id_b"),
                        F.col("split").alias("split_b"))
    out = (pairs.join(a, on="id_a").join(b, on="id_b")
           .where(F.col("split_a") != F.col("split_b"))
           .select("id_a", "id_b", "jaccard", "split_a", "split_b"))
    return _attach_cached(out, *getattr(pairs, "_zc_cached", ()))


def source_overlap(df: DataFrame, *, group_col: str = "source",
                   text_col: str = "text", shingle_size: int = 8,
                   max_group_df: int | None = None) -> DataFrame:
    """Cross-source n-gram contamination matrix: for every pair of
    sources (domains, crawls, snapshot dates), the Jaccard overlap of
    their distinct word-``shingle_size``-gram sets — the standard
    corpus-composition audit before mixing sources into a training
    run (two "different" crawls with 0.4 shingle overlap are one
    source for dedup purposes, and a benchmark-derived source
    overlapping a web source is a leak).

    Returns every unordered pair ``(source_a < source_b)``:
    ``(source_a, source_b, n_a, n_b, n_common, jaccard)`` where
    ``n_*`` are distinct-shingle counts and ``jaccard`` =
    ``n_common / (n_a + n_b - n_common)`` rounded to 6 dp (0.0 for
    disjoint pairs — the full matrix is emitted, not just hits).

    ``max_group_df`` (optional): drop shingles present in more than
    that many groups from BOTH the intersection and the union counts
    — "overlap over discriminative shingles".  Near-universal
    shingles inflate every pairwise intersection equally while
    generating O(groups²) join rows each; at a large group count
    (thousands of domains) the guard bounds the join the same way
    ``max_df`` bounds the Jaccard dedup join.

    Scale shape: ONE distinct over (group, shingle-hash) — md5 long
    keys, never shingle text — then a hash equi-join of that table
    with itself (per-hash fan-out ≤ #groups, never a cartesian), a
    map-side-combined pair count, and a groups²-row broadcast join
    against the (tiny) per-group sizes.  The matrix itself is
    O(groups²) rows — thousands of groups, not documents.
    """
    from .dedup import md5_long
    sh = (df.select(F.col(group_col).alias("__g"),
                    F.explode(word_shingles(text_col, shingle_size))
                    .alias("__s"))
          .select("__g", md5_long("__s").alias("__h"))
          .distinct())
    if max_group_df is not None:
        hot = (sh.groupBy("__h")
               .agg(F.count(F.lit(1)).alias("__gdf"))
               .where(F.col("__gdf") > max_group_df)
               .select("__h"))
        sh = sh.join(hot, on="__h", how="left_anti")
    # sizes enumerate the INPUT's groups, not the post-guard table's:
    # a group whose every shingle was dropped by the guard stays in
    # the matrix with n = 0 (jaccard null on a 0/0 pair) instead of
    # silently vanishing from the audit
    sizes = (df.select(F.col(group_col).alias("__g")).distinct()
             .join(sh.groupBy("__g").agg(F.count(F.lit(1))
                                         .alias("__n0")),
                   on="__g", how="left")
             .select("__g", F.coalesce(F.col("__n0"), F.lit(0))
                     .alias("__n")))
    inter = (sh.select(F.col("__g").alias("source_a"), "__h")
             .join(sh.select(F.col("__g").alias("source_b"), "__h"),
                   on="__h")
             .where(F.col("source_a") < F.col("source_b"))
             .groupBy("source_a", "source_b")
             .agg(F.count(F.lit(1)).alias("__common")))
    # the groups² matrix skeleton: an inequality cross of the TINY
    # size table with itself — broadcast-hinted so the plan is a
    # BroadcastNestedLoopJoin on #groups rows, never a shuffle
    # cartesian
    pairs = (sizes.select(F.col("__g").alias("source_a"),
                          F.col("__n").alias("n_a"))
             .join(F.broadcast(sizes.select(
                       F.col("__g").alias("source_b"),
                       F.col("__n").alias("n_b"))),
                   F.col("source_a") < F.col("source_b")))
    n_common = F.coalesce(F.col("__common"), F.lit(0))
    union = F.col("n_a") + F.col("n_b") - n_common
    # a pair of guard-emptied groups has union 0: jaccard is null
    # there, never an ANSI divide-by-zero
    jac = F.when(union > 0,
                 F.round(n_common.cast("double") / union, 6))
    return (pairs.join(inter, on=["source_a", "source_b"], how="left")
            .select("source_a", "source_b", "n_a", "n_b",
                    n_common.alias("n_common"), jac.alias("jaccard")))


def strip_boilerplate(df: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", passage_size: int = 10,
                      min_docs: int = 3) -> DataFrame:
    """CCNet-style corpus-level boilerplate removal (Wenzek et al.
    2020 dedup Common Crawl by PARAGRAPH hash before any scoring:
    headers, cookie banners, navigation chrome repeat verbatim across
    documents and would dominate every downstream statistic).  The
    paragraph proxy here is the non-overlapping window of
    ``passage_size`` tokens (the corpus carries no line structure);
    a passage is boilerplate when its exact text occurs in at least
    ``min_docs`` DISTINCT documents.

    Returns one row per input document: ``(id_col, n_passages,
    n_boilerplate, clean_text)`` — ``clean_text`` is the document
    with boilerplate passages removed, remaining passages joined in
    original order by single spaces ('' when everything was
    boilerplate).

    Scale shape: passages hash per row as pure Catalyst expressions
    (token array let-bound via projection — the O(tokens²)
    higher-order-lambda trap measured in r13 — so hashing is
    O(tokens) per doc); only ``(id, pos, hash)`` rows ever shuffle,
    never passage text.  The distinct-doc count per hash is one
    map-side-combinable aggregate; the kept-position set comes from
    an anti-join against the (small) boilerplate-hash sliver — the
    dup_spans lesson, filter to the sliver before joining — and the
    text reassembly is a per-row array expression over the kept
    positions (O(kept), no membership scans).
    """
    from .dedup import md5_long
    npass = F.ceil(F.size("__toks") / F.lit(passage_size)).cast("int")
    base = (df.select(F.col(id_col), F.col(text_col))
            .withColumn("__toks", words(text_col))
            .withColumn("__np", npass))
    passage = lambda i: F.array_join(  # noqa: E731
        F.slice("__toks", (i - F.lit(1)) * passage_size + F.lit(1),
                passage_size), " ")
    keyed = base.select(
        F.col(id_col),
        F.posexplode(F.transform(
            F.sequence(F.lit(1), F.col("__np")),
            lambda i: md5_long(passage(i)))).alias("__pos0", "__key"))
    doc_counts = (keyed.select("__key", id_col).distinct()
                  .groupBy("__key")
                  .agg(F.count(F.lit(1)).alias("__nd")))
    bp = doc_counts.where(F.col("__nd") >= min_docs).select("__key")
    kept = (keyed.join(bp, on="__key", how="left_anti")
            .groupBy(id_col)
            .agg(F.array_sort(F.collect_list(F.col("__pos0") + 1))
                 .alias("__keep")))
    keep = F.coalesce(F.col("__keep"), F.array().cast("array<int>"))
    return (base.join(kept, on=id_col, how="left")
            .select(
                F.col(id_col),
                F.col("__np").cast("long").alias("n_passages"),
                (F.col("__np") - F.size(keep)).cast("long")
                .alias("n_boilerplate"),
                F.array_join(F.transform(keep, passage), " ")
                .alias("clean_text")))


def novelty_scores(df: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text",
                   shingle_size: int = 3) -> DataFrame:
    """Per-document n-gram novelty against the whole corpus: what
    fraction of a document's distinct word-``shingle_size``-grams
    appear in NO other document — the standard curation signal for
    favoring novel content over recombinations of corpus boilerplate
    (low novelty + low within-doc repetition means the text is stitched
    from phrases the corpus already has; ``repetition_stats`` cannot
    see that).

    Returns one row per document: ``(id_col, n_shingles, n_unique,
    novelty, mean_log_df)`` where ``n_shingles`` counts the document's
    DISTINCT shingles, ``n_unique`` those with corpus document-
    frequency 1 (this document alone), ``novelty = n_unique /
    n_shingles`` and ``mean_log_df`` is the mean natural log of the
    corpus df over the document's distinct shingles (0 for an
    all-novel document; grows with boilerplate density) — both rounded
    to 6 dp for the cross-engine replay contract.

    Scale shape: ONE distinct over (id, md5-shingle-hash) — 64-bit
    keys, never shingle text — then a vocabulary-sized df aggregate
    (map-side combined), one hash equi-join back, and a per-document
    aggregate.  The corpus-wide distinct IS the measured-best form:
    both row-local alternatives lose — ``array_distinct`` on the
    string array is an O(k²) equality scan per document (19.5 vs
    12.6 s at sf1), and hashing inside a ``transform`` lambda first
    runs md5 interpreted per element instead of in whole-stage
    codegen (14.6 s) — so the explode stays codegen'd and the
    doc-dedup rides the shuffle that the df aggregate needs anyway.
    No self-join: unlike the pair operators this is per-document, so
    no max_df guard is needed — a universal shingle contributes one
    row per containing document, exactly like the explode that
    produced it.
    """
    from .dedup import md5_long
    sh = (df.select(F.col(id_col),
                    F.explode(word_shingles(text_col, shingle_size))
                    .alias("__s"))
          .select(id_col, md5_long("__s").alias("__h"))
          .distinct())
    dfreq = sh.groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
    return (sh.join(dfreq, on="__h")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.sum((F.col("__df") == 1).cast("long"))
                 .alias("n_unique"),
                 F.round(F.avg((F.col("__df") == 1).cast("double")), 6)
                 .alias("novelty"),
                 F.round(F.avg(F.log(F.col("__df").cast("double"))), 6)
                 .alias("mean_log_df")))


def pipeline_funnel(df: DataFrame, benchmark: DataFrame, *,
                    id_col: str = "doc_id", text_col: str = "text",
                    group_col: str = "source", rules: dict | None = None,
                    shingle_size: int = 5) -> DataFrame:
    """The end-to-end corpus-cleaning funnel, audited per group: how
    many documents survive each standard pipeline stage —

    1. ``n_raw``      — documents in;
    2. ``n_quality``  — pass the Gopher-style :func:`quality_filter`;
    3. ``n_unique``   — exact-text dedup representatives (min id per
       distinct text) among the quality survivors;
    4. ``n_clean``    — survivors not flagged by
       :func:`contamination` against ``benchmark`` (any shared word
       ``shingle_size``-gram drops the document).

    One row per ``group_col`` value with the four counts — the
    per-source yield report every corpus build ends with (and the
    first thing to diff when a source's contribution collapses
    between builds).  Stage SEMANTICS are exactly the standalone
    operators' (:func:`quality_filter` verdicts, min-id-per-text
    exact dedup, any-shared-shingle contamination against
    ``benchmark``) — pinned by
    tests/test_properties.py::test_pipeline_funnel_matches_python_reference_property,
    which replays the composed stage references row by row — but the
    EXECUTION is fused (r17 optimization, guide §2.1 "one pass"): the
    old form ran each stage as its own operator call, which scanned
    and re-evaluated the quality expressions over the corpus FOUR
    times (Spark has no cross-branch CSE; the before-plan held 4
    corpus-scan subtrees, 510 lines).  The fused form:

    1. ``n_raw``/``n_quality`` reduce straight off the scan — one
       map-side-combined group-sized aggregate, NO corpus exchange
       (the old form exchanged nothing here either, but paid the scan
       and quality expressions separately per stage);
    2. representatives reduce per text among quality survivors (min
       id + its group via ``min_by`` — equal to ``dedup_exact``'s
       min-id-per-text + semi-join because ids are unique) — the one
       text-keyed exchange the standalone dedup stage already paid;
    3. ``n_unique``/``n_clean`` reduce from ONE consumer of the rep
       table: rep texts explode to shingles, LEFT-join the broadcast
       benchmark shingle set (the standalone contamination probe,
       over exactly the deduped survivors it always scored), and a
       per-rep max(hit) → per-group (count, dirty-count) pair of
       map-side-combined aggregates yields both counts without
       re-deriving the rep table.

    Scale shape: two corpus scans (census + dedup — no shared-subtree
    recompute beyond that), one corpus-sized text-keyed exchange; the
    benchmark set broadcasts (same bound as :func:`contamination`);
    everything after step 2 is distinct-text- or group-sized.
    """
    qf = quality_filter(df, text_col=text_col, rules=rules)
    q = F.col("keep")
    counts = qf.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(q.cast("long")).alias("n_quality"))
    # dedup stage: min id per distinct text among quality survivors;
    # min_by picks that id's group (ids are unique, so no ties)
    reps = (qf.where(q)
            .groupBy(text_col)
            .agg(F.min(id_col).alias("__rep_id"),
                 F.min_by(group_col, id_col).alias("__rep_grp")))
    # contamination stage: a representative is dirty iff ANY of its
    # shingles appears in the benchmark's distinct shingle set; the
    # left join + two-level aggregate produces n_unique AND n_dirty
    # from one pass over the rep table
    bench_sh = (benchmark
                .select(F.explode(word_shingles(text_col, shingle_size))
                        .alias("__s"))
                .distinct()
                .withColumn("__hit", F.lit(1)))
    per_rep = (reps.select("__rep_grp", "__rep_id",
                           F.explode(word_shingles(text_col,
                                                   shingle_size))
                           .alias("__s"))
               .join(F.broadcast(bench_sh), on="__s", how="left")
               .groupBy("__rep_grp", "__rep_id")
               .agg(F.max(F.coalesce(F.col("__hit"), F.lit(0)))
                    .alias("__dirty")))
    ucounts = per_rep.groupBy("__rep_grp").agg(
        F.count(F.lit(1)).alias("__n_unique"),
        F.sum("__dirty").alias("__n_dirty"))
    out = counts.join(ucounts,
                      counts[group_col] == ucounts["__rep_grp"], "left")
    n_unique = F.coalesce(F.col("__n_unique"), F.lit(0))
    return out.select(
        group_col,
        F.col("n_raw").cast("long").alias("n_raw"),
        F.col("n_quality").cast("long").alias("n_quality"),
        n_unique.cast("long").alias("n_unique"),
        (n_unique - F.coalesce(F.col("__n_dirty"), F.lit(0)))
        .cast("long").alias("n_clean"))


def ngram_coverage(train: DataFrame, benchmark: DataFrame, *,
                   id_col: str = "doc_id", text_col: str = "text",
                   n: int = 5) -> DataFrame:
    """Fractional benchmark contamination per training document: the
    share of the document's DISTINCT word ``n``-grams that appear
    anywhere in the benchmark set — the rank-and-threshold complement
    to :func:`contamination` (which hard-flags on ANY overlap).  A
    doc quoting one benchmark sentence scores low; a doc that IS a
    benchmark item scores ~1.0 — the cut is the caller's policy knob
    (the GPT-3/PaLM appendices report exactly this distribution).

    Returns one row per training document with ≥ 1 shingle:
    ``(id_col, n_shingles, n_contaminated, coverage)`` — counts exact
    longs, ``coverage`` their single IEEE division rounded to 6 dp.

    Scale shape: the benchmark reduces to DISTINCT shingles and
    broadcasts (same bound as :func:`contamination`); the training
    side is one explode → per-doc distinct → LEFT broadcast join →
    map-side-combined count.  Nothing lands on the driver.
    """
    bench_sh = (benchmark
                .select(F.explode(word_shingles(text_col, n))
                        .alias("__s"))
                .distinct()
                .withColumn("__hit", F.lit(1)))
    train_sh = (train
                .select(F.col(id_col),
                        F.explode(word_shingles(text_col, n))
                        .alias("__s"))
                .distinct())
    tot = F.count(F.lit(1))
    hits = F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
    return (train_sh.join(F.broadcast(bench_sh), on="__s", how="left")
            .groupBy(id_col)
            .agg(tot.cast("long").alias("n_shingles"),
                 hits.cast("long").alias("n_contaminated"),
                 F.round(hits.cast("double") / tot.cast("double"), 6)
                 .alias("coverage")))


def corpus_profile(df: DataFrame, *, group_col: str = "source",
                   text_col: str = "text") -> DataFrame:
    """Per-source dataset-card profile — the numbers a datasheet /
    data-statement reports per corpus slice: document and token
    census plus the shape of the per-document token-count
    distribution and the median stopword ratio.

    Returns one row per group: ``(group_col, n_docs, n_tokens,
    tokens_p10, tokens_p50, tokens_p90, stop_ratio_p50)`` — counts
    exact longs; percentiles are EXACT (Spark ``percentile``, not
    approx) with linear interpolation, rounded to 6 dp before the
    result lands because Spark and DuckDB compute algebraically-equal
    but not bit-identical interpolations (the lm_buckets device).
    The stopword ratio is per-doc ``|distinct ∩ STOPWORDS| /
    n_tokens`` rounded to 6 dp at the source so the percentile
    aggregates over a bounded grid.

    Scale shape: ONE map-side-combined groupBy over the corpus; the
    exact-percentile buffers are bounded by the VALUE GRIDS (integer
    token counts; 6-dp ratios in [0, 1]), not the corpus — the same
    boundedness argument as lm_buckets.  No window, no join, nothing
    on the driver.
    """
    from .text import STOPWORDS, words
    toks = words(text_col)
    n_toks = F.size(toks)
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(toks), F.lit(list(STOPWORDS))))
    per_doc = df.select(
        group_col,
        n_toks.alias("__nt"),
        F.round(stop_hits.cast("double")
                / F.greatest(n_toks, F.lit(1)).cast("double"), 6)
        .alias("__sr"))
    pct = F.percentile("__nt", F.lit([0.1, 0.5, 0.9]))
    return (per_doc.groupBy(group_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("__nt").cast("long").alias("n_tokens"),
                 F.round(F.element_at(pct, 1), 6).alias("tokens_p10"),
                 F.round(F.element_at(pct, 2), 6).alias("tokens_p50"),
                 F.round(F.element_at(pct, 3), 6).alias("tokens_p90"),
                 F.round(F.percentile("__sr", F.lit(0.5)), 6)
                 .alias("stop_ratio_p50")))
