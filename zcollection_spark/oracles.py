"""DuckDB oracle-literal builders for the approximate-dedup and ANN
query twins (split out of ``entry_queries.py`` — VERDICT r6 style ask).

Each builder emits the SQL an exact DuckDB replay of the corresponding
Spark query needs: seed-deterministic hyperplanes / permutation params /
trained centroids are embedded as literal VALUES rows so both engines
compute from identical constants.  Pure string builders — no Spark, no
DuckDB imports; ``entry_queries.oracle_sql()`` composes them.
"""

from __future__ import annotations

from .functions.dedup import MINHASH_PRIME, _perm_params

#: DuckDB twin of functions.text word tokenization (split on runs of
#: whitespace after trim) — shared by several document oracles.
_SPLIT = r"regexp_split_to_array(trim(text), '\s+')"


def _shingle_sql(n: int) -> str:
    """DuckDB twin of functions.text.word_shingles(col, n)."""
    return f"""
words AS (SELECT doc_id, {_SPLIT} AS w FROM documents),
sh AS (SELECT DISTINCT doc_id,
         CASE WHEN len(w) >= {n}
              THEN array_to_string(list_slice(w, gs, gs + {n - 1}), ' ')
              ELSE array_to_string(w, ' ') END AS s
       FROM words,
            UNNEST(generate_series(
              1, CASE WHEN len(w) >= {n} THEN len(w) - {n - 1}
                      ELSE 1 END)) t(gs))"""


def _shingle_df_sql(max_df: int) -> str:
    """CTE twins of the max_df stop-shingle filter: re-point ``sh`` at
    the pruned vocabulary."""
    return f"""
df_ok AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= {max_df}),
sh2 AS (SELECT sh.doc_id, sh.s FROM sh JOIN df_ok USING (s))"""


def _minhash_oracle(num_hashes: int = 8, bands: int = 4,
                    shingle: int = 3) -> str:
    rows = num_hashes // bands
    mins = []
    for i in range(num_hashes):
        a, b = _perm_params(i)
        mins.append(f"min((x * {a} + {b}) % {MINHASH_PRIME}) AS h{i}")
    band_selects = []
    for bnd in range(bands):
        cols = [f"h{bnd * rows + r}" for r in range(rows)]
        concat = " || '-' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_selects.append(
            f"SELECT doc_id, {bnd} AS band, md5({concat}) AS bucket "
            f"FROM sig")
    bands_sql = " UNION ALL ".join(band_selects)
    return f"""
WITH {_shingle_sql(shingle)},
hx AS (SELECT doc_id,
              ('0x' || substr(md5(s), 1, 15))::BIGINT % {MINHASH_PRIME} AS x
       FROM sh),
sig AS (SELECT doc_id, {', '.join(mins)} FROM hx GROUP BY doc_id),
bands AS ({bands_sql})
SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
FROM bands l JOIN bands r
  ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
"""


def _simhash_oracle(n_bits: int = 32, max_hamming: int = 0) -> str:
    """DuckDB twin of functions.dedup.simhash_duplicate_pairs.

    The vote stage stays in the simple unpacked per-bit formulation
    (Spark packs three counters per long — pure integer arithmetic, so
    the signatures are bit-identical either way).  The pair stage
    replays the Hamming banding — pigeonhole-EXACT for distance ≤ k,
    and it keeps the oracle itself sub-quadratic so the sf1 gate can
    run it (a naive n² bit_count join over 50k docs would dominate the
    whole oracle suite).
    """
    votes = ", ".join(
        f"sum(CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END)"
        f" AS b{j}" for j in range(n_bits))
    bits = " + ".join(
        f"CASE WHEN b{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END"
        for j in range(n_bits))
    bands = max_hamming + 1
    width = n_bits // bands
    band_selects = []
    for b in range(bands):
        lo = b * width
        w = n_bits - lo if b == bands - 1 else width
        band_selects.append(
            f"SELECT doc_id, simhash, {b} AS band, "
            f"(simhash // {1 << lo}) % {1 << w} AS bval FROM sig")
    bands_sql = " UNION ALL ".join(band_selects)
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id, unnest({_SPLIT}) AS t FROM documents)),
hx AS (SELECT doc_id,
              ('0x' || substr(md5(t), 1, 15))::BIGINT
                % {1 << n_bits} AS h
       FROM toks),
votes AS (SELECT doc_id, {votes} FROM hx GROUP BY doc_id),
sig AS (SELECT doc_id, {bits} AS simhash FROM votes),
bands AS ({bands_sql})
SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
FROM bands l JOIN bands r
  ON l.band = r.band AND l.bval = r.bval AND l.doc_id < r.doc_id
WHERE bit_count(xor(l.simhash, r.simhash)) <= {max_hamming}
"""


def _lsh_oracle(dim: int = 64, n_planes: int = 4, n_tables: int = 8,
                seed: int = 42, k: int = 10) -> str:
    """Exact DuckDB replay of :func:`q_knn_lsh`.

    The seed-deterministic hyperplanes (similarity.py ``_hyperplanes``)
    are embedded as literal DOUBLE[] rows; bucket = Σ 2^i over planes
    with a non-negative dot product, exactly the Spark signature."""
    from .functions.similarity import _hyperplanes
    vals = []
    for t in range(n_tables):
        for i, plane in enumerate(_hyperplanes(dim, n_planes,
                                               seed + 7919 * t)):
            lit = "[" + ", ".join(repr(x) for x in plane) + "]"
            vals.append(f"({t}, {1 << i}, CAST({lit} AS DOUBLE[]))")
    planes_sql = ",\n".join(vals)
    return f"""
WITH planes(t, w, p) AS (VALUES {planes_sql}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id, v FROM c WHERE vec_id < 5),
cb AS (SELECT vec_id, t,
              sum(CASE WHEN list_dot_product(v, p) >= 0
                       THEN w ELSE 0 END) AS b
       FROM c, planes GROUP BY vec_id, t),
qb AS (SELECT vec_id, t,
              sum(CASE WHEN list_dot_product(v, p) >= 0
                       THEN w ELSE 0 END) AS b
       FROM q, planes GROUP BY vec_id, t),
cand AS (SELECT DISTINCT qb.vec_id AS qid, cb.vec_id AS cid
         FROM qb JOIN cb ON qb.t = cb.t AND qb.b = cb.b),
s AS (SELECT qid, cid,
             list_dot_product(qv.v, cv.v)
             / (sqrt(list_dot_product(qv.v, qv.v))
                * sqrt(list_dot_product(cv.v, cv.v))) AS cos
      FROM cand
      JOIN q qv ON qv.vec_id = qid
      JOIN c cv ON cv.vec_id = cid),
r AS (SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, cid) AS rank
      FROM s)
SELECT qid AS query_id, cid AS vec_id, round(cos, 6) AS cosine,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def _dedup_lsh_oracle(dim: int = 64, n_planes: int = 4, n_tables: int = 8,
                      seed: int = 42, threshold: float = 0.45) -> str:
    """Exact DuckDB replay of :func:`q_dedup_embedding_lsh`."""
    from .functions.similarity import _hyperplanes
    vals = []
    for t in range(n_tables):
        for i, plane in enumerate(_hyperplanes(dim, n_planes,
                                               seed + 7919 * t)):
            lit = "[" + ", ".join(repr(x) for x in plane) + "]"
            vals.append(f"({t}, {1 << i}, CAST({lit} AS DOUBLE[]))")
    planes_sql = ",\n".join(vals)
    return f"""
WITH planes(t, w, p) AS (VALUES {planes_sql}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, t,
             sum(CASE WHEN list_dot_product(v, p) >= 0
                      THEN w ELSE 0 END) AS b
      FROM c, planes GROUP BY vec_id, t),
cand AS (SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
         FROM b l JOIN b r
           ON l.t = r.t AND l.b = r.b AND l.vec_id < r.vec_id),
s AS (SELECT id_a, id_b,
             list_dot_product(a.v, bb.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(bb.v, bb.v))) AS cos
      FROM cand
      JOIN c a ON a.vec_id = id_a
      JOIN c bb ON bb.vec_id = id_b)
SELECT id_a, id_b, round(cos, 6) AS cosine
FROM s WHERE cos >= {threshold}
"""


def _ivf_oracle(centroids: "list[list[float]]", n_probe: int = 4,
                k: int = 10) -> str:
    """Exact DuckDB replay of :func:`q_knn_ivf` with literal centroids.

    ``csq`` (the |c|² term of the expanded squared distance) is embedded
    as the numpy-computed literal the Spark-side pandas UDF uses, so the
    argmin sees the same constants on both engines."""
    import numpy as np
    cent_np = np.asarray(centroids, dtype=np.float64)
    cent_sq = (cent_np * cent_np).sum(axis=1)
    vals = []
    for j, c in enumerate(centroids):
        # repr(float(...)): numpy >= 2.0 reprs np.float64 as
        # 'np.float64(x)', which is not SQL
        lit = "[" + ", ".join(repr(float(x)) for x in c) + "]"
        vals.append(f"({j}, CAST({lit} AS DOUBLE[]), "
                    f"{float(cent_sq[j])!r})")
    cents_sql = ",\n".join(vals)
    return f"""
WITH cents(cell, p, csq) AS (VALUES {cents_sql}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id, v FROM c WHERE vec_id < 5),
cd AS (SELECT vec_id, cell,
              row_number() OVER (
                PARTITION BY vec_id
                ORDER BY -2.0 * list_dot_product(v, p) + csq, cell) AS rn
       FROM c, cents),
cell_of AS (SELECT vec_id, cell FROM cd WHERE rn = 1),
qd AS (SELECT vec_id, cell,
              row_number() OVER (
                PARTITION BY vec_id
                ORDER BY -2.0 * list_dot_product(v, p) + csq, cell) AS rn
       FROM q, cents),
probes AS (SELECT vec_id, cell FROM qd WHERE rn <= {n_probe}),
cand AS (SELECT pr.vec_id AS qid, co.vec_id AS cid
         FROM probes pr JOIN cell_of co ON pr.cell = co.cell),
s AS (SELECT qid, cid,
             list_dot_product(qv.v, cv.v)
             / (sqrt(list_dot_product(qv.v, qv.v))
                * sqrt(list_dot_product(cv.v, cv.v))) AS cos
      FROM cand
      JOIN q qv ON qv.vec_id = qid
      JOIN c cv ON cv.vec_id = cid),
r AS (SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, cid) AS rank
      FROM s)
SELECT qid AS query_id, cid AS vec_id, round(cos, 6) AS cosine,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def _ivfpq_oracle(cent: "list[list[float]]", books, n_probe: int,
                  k: int, refine_factor: int) -> str:
    """Exact DuckDB replay of :func:`q_knn_ivfpq` with literal
    centroid AND codebook tables (the knn_ivf technique, one level
    deeper): normalize → cell argmin → per-subspace code argmin →
    flatten-reconstruct ``centroid + concat(codebook picks)`` → ADC
    pool of ``refine_factor*k`` → exact re-rank on the raw vectors.
    Every constant (|c|², |b|²) is the numpy-computed literal the
    Spark-side pandas UDFs use, so both engines argmin over the same
    doubles."""
    import numpy as np
    cent_np = np.asarray(cent, dtype=np.float64)
    cent_sq = (cent_np * cent_np).sum(axis=1)
    books = np.asarray(books, dtype=np.float64)
    m, n_codes, sub = books.shape
    dim = cent_np.shape[1]

    def _lit(vec) -> str:
        return "[" + ", ".join(repr(float(x)) for x in vec) + "]"

    cents_sql = ",\n".join(
        f"({j}, CAST({_lit(c)} AS DOUBLE[]), {float(cent_sq[j])!r})"
        for j, c in enumerate(cent_np))
    bsq = (books * books).sum(axis=2)
    books_sql = ",\n".join(
        f"({j}, {t}, CAST({_lit(books[j, t])} AS DOUBLE[]), "
        f"{float(bsq[j, t])!r})"
        for j in range(m) for t in range(n_codes))
    pool = k * refine_factor
    return f"""
WITH cents(cell, p, csq) AS (VALUES {cents_sql}),
books(j, code, b, bsq) AS (VALUES {books_sql}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cn AS (SELECT vec_id, v,
              list_transform(v, x -> x / greatest(
                  sqrt(list_dot_product(v, v)), 1e-12)) AS vn
       FROM c),
q AS (SELECT vec_id, v, vn FROM cn ORDER BY vec_id LIMIT 5),
cd AS (SELECT vec_id, cell, p,
              row_number() OVER (
                PARTITION BY vec_id
                ORDER BY -2.0 * list_dot_product(vn, p) + csq, cell) AS rn
       FROM cn, cents),
cell_of AS (SELECT vec_id, cell, p FROM cd WHERE rn = 1),
resid AS (SELECT cn.vec_id, cell,
                 list_transform(range(1, {dim + 1}),
                                i -> vn[i] - p[i]) AS r
          FROM cn JOIN cell_of USING (vec_id)),
code_rank AS (SELECT vec_id, j, code, b,
                     row_number() OVER (
                       PARTITION BY vec_id, j
                       ORDER BY -2.0 * list_dot_product(
                           list_slice(r, j * {sub} + 1,
                                      (j + 1) * {sub}), b)
                                + bsq, code) AS rn
              FROM resid, books),
flat AS (SELECT vec_id, flatten(list(b ORDER BY j)) AS fb
         FROM code_rank WHERE rn = 1 GROUP BY vec_id),
recon AS (SELECT f.vec_id, co.cell,
                 list_transform(range(1, {dim + 1}),
                                i -> p[i] + fb[i]) AS rv
          FROM flat f JOIN cell_of co ON co.vec_id = f.vec_id),
qd AS (SELECT vec_id, cell,
              row_number() OVER (
                PARTITION BY vec_id
                ORDER BY -2.0 * list_dot_product(vn, p) + csq, cell) AS rn
       FROM q, cents),
probes AS (SELECT vec_id, cell FROM qd WHERE rn <= {n_probe}),
adc AS (SELECT pr.vec_id AS qid, re.vec_id AS cid,
               list_dot_product(qv.vn, re.rv) AS score
        FROM probes pr
        JOIN recon re ON pr.cell = re.cell
        JOIN q qv ON qv.vec_id = pr.vec_id),
cand AS (SELECT qid, cid,
                row_number() OVER (PARTITION BY qid
                                   ORDER BY score DESC, cid) AS rn
         FROM adc),
s AS (SELECT qid, cid,
             list_dot_product(qv.v, cv.v)
             / (sqrt(list_dot_product(qv.v, qv.v))
                * sqrt(list_dot_product(cv.v, cv.v))) AS cos
      FROM cand
      JOIN q qv ON qv.vec_id = qid
      JOIN c cv ON cv.vec_id = cid
      WHERE rn <= {pool}),
r AS (SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, cid) AS rank
      FROM s)
SELECT qid AS query_id, cid AS vec_id, round(cos, 6) AS cosine,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""



def _semantic_dedup_oracle(centroids: "list[list[float]]",
                           threshold: float) -> str:
    """Exact DuckDB replay of :func:`q_dedup_semantic` with literal
    centroids: cell argmin (the _ivf_oracle expansion, same |c|²
    literals the Spark pandas UDF uses) → within-cell exact-cosine
    pairs → connected components as a recursive CTE (the
    ORACLE_DEDUP_CLUSTERS closure) → min-id representative + keep
    flag for every corpus row."""
    import numpy as np
    cent_np = np.asarray(centroids, dtype=np.float64)
    cent_sq = (cent_np * cent_np).sum(axis=1)
    vals = []
    for j, c in enumerate(centroids):
        lit = "[" + ", ".join(repr(float(x)) for x in c) + "]"
        vals.append(f"({j}, CAST({lit} AS DOUBLE[]), "
                    f"{float(cent_sq[j])!r})")
    cents_sql = ",\n".join(vals)
    return f"""
WITH RECURSIVE cents(cell, p, csq) AS (VALUES {cents_sql}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cd AS (SELECT vec_id, cell,
              row_number() OVER (
                PARTITION BY vec_id
                ORDER BY -2.0 * list_dot_product(v, p) + csq, cell) AS rn
       FROM c, cents),
cell_of AS MATERIALIZED (SELECT vec_id, cell FROM cd WHERE rn = 1),
pairs AS MATERIALIZED (SELECT ca.vec_id AS id_a, cb.vec_id AS id_b
          FROM cell_of ca
          JOIN cell_of cb ON ca.cell = cb.cell
                         AND ca.vec_id < cb.vec_id
          JOIN c a ON a.vec_id = ca.vec_id
          JOIN c b ON b.vec_id = cb.vec_id
          WHERE list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v)))
                >= {threshold!r}),
edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach AS (SELECT DISTINCT a AS node, a AS label FROM edges
          UNION
          SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.node),
comp AS (SELECT node, min(label) AS cluster FROM reach GROUP BY node)
SELECT c.vec_id,
       coalesce(comp.cluster, c.vec_id) AS rep_id,
       CAST(CASE WHEN coalesce(comp.cluster, c.vec_id) = c.vec_id
                 THEN 1 ELSE 0 END AS INT) AS keep
FROM c LEFT JOIN comp ON comp.node = c.vec_id
"""
