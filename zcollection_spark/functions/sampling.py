"""Deterministic sampling / budget capping for training-data pipelines.

The shapes a corpus build needs constantly — all replayable (the draw
is md5 of the id: stable across runs, engines, cluster sizes, and
insertion order; no RNG state), which is what makes dataset cards and
ablations reproducible:

- :func:`cap_per_group` — "at most N documents per language/source/
  domain": deterministic pseudo-random rank inside each group, one
  window shuffle, EXACT counts (unlike ``sampleBy``).
- :func:`hash_split` — train/val/test assignment as a pure JVM
  expression; the same document lands in the same split on every
  rebuild (uncontaminated eval sets).
- :func:`stratified_sample_exact` — per-stratum fraction sampling
  where the SAMPLE ITSELF is a pure function of (id, salt, fractions).
- :func:`sample_to_token_budget` — "N tokens per language" in md5
  order, crossing document included; bucketed two-pass prefix sum so
  no stratum serializes through one task at scale.
- :func:`stratified_sample` — thin wrapper over ``df.sampleBy`` for
  fraction-based (approximate, Bernoulli) sampling when exactness
  doesn't matter; seeded for reproducibility within one Spark version.
"""

from __future__ import annotations

from typing import Iterable, Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def deterministic_rank(id_col: Column | str, salt: str = "") -> Column:
    """Pseudo-random but reproducible ordering key: md5 of the id (plus
    an optional salt to draw a different sample)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(col.cast("string"), F.lit(salt)))


def uniform_draw(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1): the first 15 md5 hex chars of
    (id, salt) scaled by 16^-15 — THE shared draw behind
    :func:`hash_split` and :func:`stratified_sample_exact`.  One
    definition on purpose: the DuckDB replay contract
    (``('0x' || substr(md5(...), 1, 15))::BIGINT / 16.0 ** 15``)
    depends on every consumer staying bit-identical."""
    return (F.conv(F.substring(deterministic_rank(id_col, salt), 1, 15),
                   16, 10).cast("double") / F.lit(float(16 ** 15)))


def cap_per_group(df: DataFrame, *, keys: str | Iterable[str],
                  id_col: str, n: int, salt: str = "") -> DataFrame:
    """Keep at most ``n`` rows per key group, chosen by deterministic
    md5 rank — exact, reproducible, one shuffle."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*keys).orderBy(deterministic_rank(id_col, salt),
                                          F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n).drop("__rn"))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: Mapping, seed: int = 42) -> DataFrame:
    """Seeded Bernoulli per-stratum sampling (``df.sampleBy``)."""
    return df.sampleBy(strata_col, dict(fractions), seed)


def shuffle_to_shards(df: DataFrame, *, id_col: str, n_shards: int,
                      salt: str = "") -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` training shards:
    ``shard`` = md5 bucket of the id, ``shard_pos`` = 0-based position
    within the shard in md5 order — the standard pre-training global
    shuffle, as a pure function of (id, salt, n_shards).

    Why not ``orderBy(rand())``: a seeded ``rand()`` is stable only for
    a fixed Spark version AND a fixed partition layout of the input —
    re-ingesting the same corpus through a different file split draws a
    different permutation, which silently changes what a training run
    sees.  The md5 bucket is reproducible across runs, engines, cluster
    sizes, and insertion order, and the DuckDB twin replays it exactly
    (``('0x' || substr(md5(id), 1, 15))::BIGINT % n``).

    Scale shape: one hash exchange on ``shard`` (the window's
    partitionBy) and a within-shard sort — no global sort, no driver
    materialization.  Shards are balanced to ±O(√(rows/shards)) by the
    uniformity of md5.  Write the result with
    ``partitionBy("shard")`` and each training reader streams its own
    shard in ``shard_pos`` order.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    # the output contract is these two fixed names — refuse a frame
    # that already uses them rather than silently replacing its data
    # (the '__salt'/'__zorder' reserved-name discipline)
    for reserved in ("shard", "shard_pos"):
        if reserved in df.columns:
            raise ValueError(f"reserved column name {reserved!r}: "
                             f"rename it before shuffle_to_shards")
    from .dedup import md5_long
    rank = deterministic_rank(id_col, salt)
    id_c = F.col(id_col) if isinstance(id_col, str) else id_col
    # md5_long is THE canonical 15-hex-chars→int64 contract (one home,
    # shared with the dedup family's DuckDB twins)
    shard = (md5_long(F.concat(id_c.cast("string"), F.lit(salt)))
             % F.lit(n_shards)).cast("int")
    out = df.withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(rank.asc(),
                                            F.col(id_col).asc())
    return out.withColumn(
        "shard_pos", (F.row_number().over(w) - F.lit(1)).cast("long"))


def hash_split(df: DataFrame, *, id_col: str,
               splits: Mapping[str, float] | None = None,
               salt: str = "") -> DataFrame:
    """Deterministic train/val/test assignment: a ``split`` column
    derived from the md5 of the id — the same document lands in the
    same split on every run, engine, cluster size, and insertion order
    (what keeps eval sets uncontaminated across corpus rebuilds; change
    ``salt`` to draw a fresh assignment).

    ``splits`` maps name → fraction (must sum to ~1; default
    98/1/1 train/val/test).  The uniform draw is the first 15 md5 hex
    chars scaled by 16^-15 — exactly replayable in DuckDB
    (``('0x' || substr(md5(...), 1, 15))::BIGINT / 16.0^15``), so split
    assignment is oracle-checkable like the rest of the dedup family.
    Pure JVM expression; no shuffle, no RNG state.
    """
    splits = dict(splits or {"train": 0.98, "val": 0.01, "test": 0.01})
    if not splits or abs(sum(splits.values()) - 1.0) > 1e-6:
        raise ValueError("split fractions must sum to 1")
    u = uniform_draw(id_col, salt)
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        expr = (F.when(u < F.lit(acc), F.lit(name)) if expr is None
                else expr.when(u < F.lit(acc), F.lit(name)))
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(F.lit(names[-1])))
    return df.withColumn("split", expr)


def stratified_sample_exact(df: DataFrame, *, id_col: str,
                            strata_col: str, fractions: Mapping,
                            salt: str = "") -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its md5 draw
    (same uniform as :func:`hash_split`) falls below its stratum's
    fraction.  Unlike ``stratified_sample`` (Spark's seeded
    ``sampleBy`` — engine RNG, not replayable elsewhere), the SAMPLE
    ITSELF is a pure function of (id, salt, fractions): rebuilds,
    other engines and resized clusters draw the identical subset,
    which is what an audit of "which rows trained" needs.  Strata
    absent from ``fractions`` are dropped (fraction 0).  Pure JVM
    expression; no shuffle, no RNG state.
    """
    fractions = {k: float(v) for k, v in dict(fractions).items()}
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for stratum {name!r} must be "
                             f"in [0, 1], got {frac}")
    u = uniform_draw(id_col, salt)
    frac = None
    for name, fr in fractions.items():
        cond = F.col(strata_col) == F.lit(name)
        frac = (F.when(cond, F.lit(fr)) if frac is None
                else frac.when(cond, F.lit(fr)))
    frac = F.lit(0.0) if frac is None else frac.otherwise(F.lit(0.0))
    return df.where(u < frac)


def upsample_by_weight(df: DataFrame, *, id_col: str,
                       strata_col: str, weights: Mapping,
                       salt: str = "",
                       copy_col: str = "copy") -> DataFrame:
    """Deterministic weighted up/down-sampling — the "epochs per
    source" mixing knob of a pretraining data recipe ("code ×2.5,
    web ×0.8, wiki ×4"): each row appears ``floor(w)`` times plus one
    more iff its md5 draw falls below ``frac(w)``, so a stratum's
    expected token mass scales by EXACTLY ``w`` while every copy count
    is a pure function of (id, salt, weights) — rebuilds, other
    engines and resized clusters produce the identical multiset, which
    is what makes a data-mixture ablation reproducible.  Strata absent
    from ``weights`` drop (weight 0), matching
    :func:`stratified_sample_exact`; a weight in [0, 1) is exact
    deterministic downsampling (same draw as
    :func:`stratified_sample_exact`, so ``w=0.25`` keeps ITS exact
    quarter).  ``copy_col`` (0-based) distinguishes the replicas so
    downstream shuffles/dedup treat them as distinct training
    instances.

    Pure JVM expressions + one ``explode(sequence(...))`` — no
    shuffle, no Python, no RNG state; fan-out is bounded by
    ``ceil(max(weights))`` per row.
    """
    weights = {k: float(v) for k, v in dict(weights).items()}
    for name, w in weights.items():
        if not w >= 0.0:
            raise ValueError(f"weight for stratum {name!r} must be "
                             f">= 0, got {w}")
    if copy_col in df.columns:
        raise ValueError(f"upsample_by_weight adds {copy_col!r} but "
                         f"the input already has it — pass copy_col=")
    w = None
    for name, wv in weights.items():
        cond = F.col(strata_col) == F.lit(name)
        w = (F.when(cond, F.lit(wv)) if w is None
             else w.when(cond, F.lit(wv)))
    w = F.lit(0.0) if w is None else w.otherwise(F.lit(0.0))
    base = F.floor(w).cast("long")
    extra = (uniform_draw(id_col, salt) < (w - F.floor(w))).cast("long")
    # sequence(0, n-1) DESCENDS for n=0 (Spark auto-steps -1): filter
    # the zero-copy rows out BEFORE building the sequence
    return (df.withColumn("__n_copies", base + extra)
            .where(F.col("__n_copies") >= 1)
            .withColumn(copy_col,
                        F.explode(F.sequence(
                            F.lit(0).cast("long"),
                            F.col("__n_copies") - 1)))
            .drop("__n_copies"))


def sample_to_token_budget(df: DataFrame, *, id_col: str,
                           token_col: str,
                           budget: int,
                           strata_col: str | None = None,
                           salt: str = "",
                           num_buckets: int = 256) -> DataFrame:
    """Deterministic token-budget sampling: keep documents — in md5
    order, so the SAME documents on every run/engine/cluster — until
    the running token total reaches ``budget`` (per ``strata_col``
    group when given, e.g. "2 M tokens per language").  The document
    that crosses the budget line is INCLUDED (budgets are met, not
    undershot; a single over-budget document still yields output), so
    every group with data emits at least one row.

    Scale shape (reshaped round 10 — a per-stratum global-sort window
    would serialize a 50 %-English corpus through ONE task at 100 TB):
    the md5 draw is range-bucketed into ``num_buckets`` contiguous
    slices of the sample order, so the running sum decomposes into

    1. per-(stratum, bucket) token totals — an ordinary map-side-
       combined aggregation, fully parallel;
    2. a prefix sum over that TINY totals table (≤ strata × buckets
       rows) picking, per stratum, the buckets that start under
       budget — everything past the cutoff bucket never shuffles;
    3. a broadcast join of those cutoffs back onto the input plus a
       running-sum window partitioned by (stratum, bucket) — many
       small tasks per stratum, each seeded with its bucket's exact
       prefix offset, never one task per stratum.

    Bit-identical to the single-window form (same md5 order, same
    strict ``running - tokens < budget`` rule — the DuckDB oracle is
    unchanged); the deterministic md5 order is what makes the sample
    auditable — engine-native ``sample``/``TABLESAMPLE`` can hit a
    byte budget only approximately and never reproducibly.  Strata are
    expected to be low-cardinality (languages, sources): the cutoff
    table broadcast is ~``strata × ceil(budget-covering buckets)``
    rows."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    keys = [strata_col] if strata_col else []
    order = [deterministic_rank(id_col, salt), F.col(id_col)]
    # floor(u * B) is non-decreasing along the (md5, id) sort order, so
    # buckets are contiguous slices of the per-stratum sample order.
    bucket = F.least(F.floor(uniform_draw(id_col, salt) * num_buckets),
                     F.lit(num_buckets - 1)).cast("int")
    work = df.withColumn("__tb_bucket", bucket)

    # Pass 1: per-(stratum, bucket) totals, then buckets that START
    # under budget.  The prefix window runs over <= num_buckets rows
    # per stratum — metadata-sized — never over the input.
    wb = (Window.partitionBy(*keys).orderBy("__tb_bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    totals = (work.groupBy(*keys, "__tb_bucket")
              .agg(F.sum(F.col(token_col)).alias("__tb_tot"),
                   F.min(F.col(token_col)).alias("__tb_mn")))
    # the bucketed decomposition needs a MONOTONE running sum: a
    # negative token count could re-qualify rows after the budget line,
    # which the cutoff-bucket rule cannot see — fail loudly instead of
    # silently diverging from the single-window semantics.  Evaluated
    # on the metadata-sized totals table, not the input.
    guard = F.assert_true(
        F.col("__tb_mn").isNull() | (F.col("__tb_mn") >= 0),
        F.lit(f"sample_to_token_budget: negative value in "
              f"{token_col!r} — token counts must be >= 0"))
    cuts = (totals
            # a filter can't be pruned away like an unused column: the
            # assert evaluates (null on success -> coalesce keeps the
            # row) or raises
            .where(F.coalesce(guard.cast("boolean"), F.lit(True)))
            .drop("__tb_mn")
            .withColumn("__tb_prefix",
                        F.sum(F.coalesce(F.col("__tb_tot"), F.lit(0)))
                        .over(wb) - F.coalesce(F.col("__tb_tot"),
                                               F.lit(0)))
            .where(F.col("__tb_prefix") < budget)
            .drop("__tb_tot"))
    renames = {c: f"__tb_c_{c}" for c in keys}
    for old, new in renames.items():
        cuts = cuts.withColumnRenamed(old, new)
    cuts = cuts.withColumnRenamed("__tb_bucket", "__tb_c_bucket")

    # Pass 2: broadcast the cutoffs, drop past-cutoff buckets BEFORE
    # the shuffle (the inner join keeps only buckets with a cuts row),
    # and finish with the running sum inside each (stratum, bucket).
    cond = work["__tb_bucket"] == cuts["__tb_c_bucket"]
    for old, new in renames.items():
        cond = cond & work[old].eqNullSafe(cuts[new])
    ww = (Window.partitionBy(*keys, "__tb_bucket").orderBy(*order)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    running = F.col("__tb_prefix") + F.sum(F.col(token_col)).over(ww)
    return (work.join(F.broadcast(cuts), cond, "inner")
            .withColumn("__cum", running)
            .where((F.col("__cum") - F.col(token_col)) < budget)
            .drop("__cum", "__tb_bucket", "__tb_c_bucket", "__tb_prefix",
                  *renames.values()))


def cluster_balanced_sample(df: DataFrame, *, id_col: str, vec_col: str,
                            per_cell: int, n_cells: int = 16,
                            seed: int = 42, train_cap: int = 100_000,
                            max_iter: int = 10,
                            centroids: "list[list[float]] | None" = None,
                            salt: str = "") -> DataFrame:
    """Cluster-balanced (diversity) sampling over an embedding corpus:
    k-means cells partition the semantic space, and at most
    ``per_cell`` rows survive per cell, chosen by deterministic md5
    rank — the embedding-space analog of :func:`cap_per_group` and
    the standard corpus-diversification step (uniform sampling keeps
    the head clusters' redundancy; capping per SEMANTIC cell keeps
    coverage of the tails at a fraction of the rows).

    Returns the kept rows as ``(id_col, cell, cell_rank)`` with
    ``cell_rank`` 1-based within the cell (≤ ``per_cell``).  The
    sample is a pure function of (centroids, id, salt): rebuilds and
    incremental refreshes keep the same rows, and a different
    ``salt`` draws a fresh balanced sample.

    Scale shape: centroids train driver-side on a bounded id-ordered
    sample and assignment is the ONE-scan Arrow-batched BLAS UDF
    shared with ``ivf_topk`` / SemDeDup; the per-cell top-k is a
    window over cells of ~n/k rows — grow ``n_cells`` with the corpus
    (the SemDeDup guidance: cells of ~10³-10⁴ rows) so no single
    cell's sort dominates, and pass pre-trained ``centroids`` to
    reuse the index across batches.
    """
    from .similarity import (_lloyd_kmeans, centroid_arrays,
                             make_cell_assigner, train_centroid_sample)
    if centroids is None:
        sample = train_centroid_sample(df, id_col, vec_col,
                                       train_cap, n_cells)
        cent = _lloyd_kmeans(sample, n_cells, seed=seed, iters=max_iter)
    else:
        cent = [list(map(float, c_)) for c_ in centroids]
    cent_np, cent_sq = centroid_arrays(cent)
    assign = make_cell_assigner(cent_np, cent_sq)
    w = Window.partitionBy("cell").orderBy(
        deterministic_rank(id_col, salt), F.col(id_col))
    return (df.select(F.col(id_col),
                      assign(vec_col).cast("long").alias("cell"))
            .withColumn("cell_rank", F.row_number().over(w).cast("long"))
            .where(F.col("cell_rank") <= per_cell))


def domain_mix_weights(df: DataFrame, *, group_col: str = "source",
                       token_count_col: Column | str | None = None,
                       text_col: str = "text",
                       temperature: float = 0.5) -> DataFrame:
    """Temperature-flattened domain mixture — the "how many epochs of
    each source" table of a multi-source pretraining recipe (the
    GPT-3 / LLaMA dataset-mixture pattern; DoReMi's static baseline):
    the target share of domain *i* is
    ``natural_share_i^τ / Σ_j natural_share_j^τ`` measured in TOKENS,
    so τ=1 keeps the natural mix, τ→0 approaches uniform, and 0<τ<1
    up-weights small high-value domains without discarding the head.
    ``mix_weight = target_share / natural_share`` is exactly the
    per-domain epoch multiplier :func:`upsample_by_weight` consumes —
    the two compose into "compute the recipe, then realize it".

    Returns one row per domain: ``(group_col, n_docs, n_tokens,
    natural_share, target_share, mix_weight)`` — counts exact longs,
    shares/weights rounded to 6 dp.  τ=0.5 (the default) uses
    ``sqrt``, which IEEE-754 requires to be correctly rounded, so the
    whole table replays bit-identically on any engine; other τ go
    through ``pow`` (last-ulp parity not guaranteed cross-engine).

    Scale shape: ONE map-side-combined groupBy over the corpus (the
    token counting rides the scan), producing a |domains|-sized table;
    the share normalization is a window over that tiny table.  Nothing
    lands on the driver.
    """
    if token_count_col is None:
        from .text import words
        # null/blank documents contribute 0 tokens (size(split(NULL))
        # is NULL and would silently vanish from the sum; split('')
        # is [''] and would phantom-count 1)
        token_count_col = F.when(
            F.trim(F.coalesce(F.col(text_col), F.lit(""))) == "",
            F.lit(0)).otherwise(F.size(words(text_col)))
    elif isinstance(token_count_col, str):
        token_count_col = F.col(token_count_col)
    per = (df.groupBy(group_col)
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(token_count_col.cast("long")).alias("n_tokens")))
    # two window steps (share, then flattened-share normalization) —
    # staged through real columns because a window over a window
    # expression is not analyzable in one projection
    w = Window.partitionBy()
    # degenerate groups are NULL, not a crash (hypothesis r16 find: a
    # group whose docs are ALL empty has share 0, and an all-empty
    # corpus has total 0 — either way the ratio columns are undefined
    # and ANSI division would throw)
    total = F.sum("n_tokens").over(w)
    per = per.withColumn(
        "__share",
        F.when(total > 0,
               F.col("n_tokens").cast("double") / total))
    flat = (F.sqrt(F.col("__share")) if temperature == 0.5
            else F.pow(F.col("__share"), F.lit(float(temperature))))
    per = per.withColumn("__target", flat / F.sum(flat).over(w))
    return per.select(
        group_col,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("__share", 6).alias("natural_share"),
        F.round("__target", 6).alias("target_share"),
        F.round(F.when(F.col("__share") > 0,
                       F.col("__target") / F.col("__share")), 6)
        .alias("mix_weight"))
