"""DuckDB oracle SQL for the driver-contract registry (pure data).

Split out of ``entry_queries.py`` (r15 verdict task 8): the SQL twins
are constants, the query functions are code — keeping them apart keeps
the rotation ledger and the query functions reviewable as the registry
grows.  Every constant here is the ANSI-SQL twin of the same-named
``q_*`` query in ``entry_queries.py``; the hash-match design rules
(identical aliases, DECIMAL-exact float paths, md5 as the shared hash,
round-to-6dp before ranking) are documented there.

Only string constants and the literal sub-templates they interpolate
live here — the data-dependent oracle builders (trained centroids, LSH
hyperplanes) stay in ``oracles.py`` and are composed at call time by
``entry_queries.oracle_sql()``.
"""

from __future__ import annotations

from .functions.text import FP_MOD, TOKEN_PATTERN
from .oracles import _SPLIT, _shingle_df_sql, _shingle_sql

EVENTS3 = "event_id, ts, value"


ORACLE_QUERY_PRUNE = f"""
SELECT {EVENTS3} FROM events
WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) IN (3, 4, 5)
"""


ORACLE_PROJECTION = "SELECT event_id, event_type FROM events"


ORACLE_ZONEMAP_SKIP = f"""
SELECT {EVENTS3} FROM events WHERE value > 150.0
"""


ORACLE_CLUSTERED_WHERE = f"""
SELECT {EVENTS3} FROM events WHERE value >= 40.0 AND value < 60.0
"""


ORACLE_ZORDER_WHERE = f"""
SELECT {EVENTS3} FROM events
WHERE value >= 40.0 AND value < 60.0
  AND event_id >= 1000 AND event_id < 60000
"""


ORACLE_BLOOM_SKIP = f"""
SELECT {EVENTS3} FROM events
WHERE event_id = (SELECT min(event_id) FROM events)
   OR event_id = (SELECT max(event_id) FROM events)
"""


ORACLE_CHANGES = """
SELECT DISTINCT 'year=' || year(ts) || '/month=' || month(ts)
       || '/day=' || day(ts) AS relpath
FROM events WHERE day(ts) >= 9
"""


ORACLE_TIME_TRAVEL = """
SELECT event_id, value FROM events WHERE day(ts) < 10
"""


ORACLE_RETAINED_READ = ORACLE_TIME_TRAVEL


ORACLE_SEQUENCE = "SELECT * FROM lineitem WHERE l_linenumber >= 5"


ORACLE_GROUPED_SEQUENCE = """
SELECT event_id, user_id, value FROM events
WHERE user_id >= 0 AND user_id < 50
"""


ORACLE_MERGE_TIME_SERIES = f"""
WITH base AS (SELECT {EVENTS3} FROM events WHERE day(ts) <= 10),
batch AS (SELECT event_id + 1000000 AS event_id, ts,
                 value + 1000.0 AS value
          FROM events WHERE day(ts) BETWEEN 8 AND 12),
bounds AS (SELECT date_trunc('day', ts) AS d, min(ts) AS lo, max(ts) AS hi
           FROM batch GROUP BY 1)
SELECT b.event_id, b.ts, b.value FROM base b
LEFT JOIN bounds ON date_trunc('day', b.ts) = bounds.d
                AND b.ts BETWEEN bounds.lo AND bounds.hi
WHERE bounds.d IS NULL
UNION ALL SELECT {EVENTS3} FROM batch
"""


ORACLE_MERGE_UPSERT = f"""
WITH batch AS (
  SELECT event_id, ts, value + 500.0 AS value FROM events
  WHERE day(ts) IN (5, 6)
  UNION ALL
  SELECT event_id + 2000000 AS event_id, ts + INTERVAL 40 DAY AS ts, value
  FROM events WHERE day(ts) = 7)
SELECT {EVENTS3} FROM events WHERE ts NOT IN (SELECT ts FROM batch)
UNION ALL SELECT {EVENTS3} FROM batch
"""


ORACLE_MERGE_CONCAT = f"""
SELECT {EVENTS3} FROM events
UNION ALL
SELECT event_id + 3000000 AS event_id, ts, value FROM events
WHERE day(ts) = 1
"""


# existing row dropped iff some batch ts within 60 s in the SAME day
# partition (per-partition merge); jitter keeps rows inside day 3 except
# possibly the last 30 s of the day — the EXISTS condition reproduces the
# partition scoping exactly.
ORACLE_MERGE_UPSERT_TOLERANCE = f"""
WITH batch AS (
  SELECT event_id + 4000000 AS event_id, ts + INTERVAL 30 SECOND AS ts,
         value + 7.0 AS value
  FROM events WHERE day(ts) = 3)
SELECT e.event_id, e.ts, e.value FROM events e
WHERE NOT EXISTS (
  SELECT 1 FROM batch b
  WHERE date_trunc('day', b.ts) = date_trunc('day', e.ts)
    AND abs(epoch(b.ts) - epoch(e.ts)) <= 60.0)
UNION ALL SELECT {EVENTS3} FROM batch
"""


ORACLE_MAP_STATS = """
SELECT year(ts) AS year, month(ts) AS month, day(ts) AS day,
       count(*) AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2, 3
"""


ORACLE_UPDATE = """
SELECT event_id, value * 2.0 AS value FROM events WHERE day(ts) <= 5
"""


ORACLE_VIEW = """
SELECT event_id, ts, value, value * 3.0 + 1.0 AS derived FROM events
"""


ORACLE_INDEX = """
SELECT event_id, ts, event_type FROM events WHERE event_type = 'click'
"""


#: Split decimal→double (floor + fraction, one IEEE add): DuckDB's
#: direct cast double-rounds when the scaled mantissa exceeds 2^53
#: (sf1 gate finding) — mirror of the Spark-side ``dbl`` helper.
ORACLE_PRICING = """
WITH s AS (
  SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,4)))
             AS DECIMAL(28,4)) AS s_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)))
             AS DECIMAL(28,4)) AS s_base,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))
             * CAST(1.0 - l_discount AS DECIMAL(12,4)))
             AS DECIMAL(28,4)) AS s_disc,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))
             * CAST(1.0 - l_discount AS DECIMAL(12,4))
             * CAST(1.0 + l_tax AS DECIMAL(12,4)))
             AS DECIMAL(30,6)) AS s_charge,
         count(*) AS count_order
  FROM lineitem GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag, l_linestatus,
       CAST(FLOOR(s_qty) AS DOUBLE)
         + CAST(s_qty - FLOOR(s_qty) AS DOUBLE) AS sum_qty,
       CAST(FLOOR(s_base) AS DOUBLE)
         + CAST(s_base - FLOOR(s_base) AS DOUBLE) AS sum_base_price,
       CAST(FLOOR(s_disc) AS DOUBLE)
         + CAST(s_disc - FLOOR(s_disc) AS DOUBLE) AS sum_disc_price,
       CAST(FLOOR(s_charge) AS DOUBLE)
         + CAST(s_charge - FLOOR(s_charge) AS DOUBLE) AS sum_charge,
       count_order
FROM s
"""


ORACLE_TOP_REVENUE = """
SELECT o_orderkey,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))
           * CAST(1.0 - l_discount AS DECIMAL(12,4)))
           AS DECIMAL(28,4)) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-01-01'
  AND l_shipdate > DATE '1998-01-01'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


ORACLE_REVENUE_DELTA = """
SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                * CAST(l_discount AS DECIMAL(12,4)))
            AS DECIMAL(28,4)) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND CAST(l_discount AS DECIMAL(12,4)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


ORACLE_REGIONAL_REVENUE = """
SELECT n_name,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                * CAST(1.0 - l_discount AS DECIMAL(12,4)))
            AS DECIMAL(28,4)) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


ORACLE_PROMO_REVENUE = """
SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(12,4))
                          * CAST(1.0 - l_discount AS DECIMAL(12,4)) END)
            AS DECIMAL(28,4)) AS DOUBLE) AS promo_revenue,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                * CAST(1.0 - l_discount AS DECIMAL(12,4)))
            AS DECIMAL(28,4)) AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY year(l_shipdate)
"""


ORACLE_ROLLUP = """
SELECT day(ts) AS day, hour(ts) AS hour, count(*) AS n,
       round(CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
             / 1000000, 6) AS sum_value
FROM events GROUP BY ROLLUP (day(ts), hour(ts))
"""


ORACLE_SESSIONS = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts)) > 1800.0
              THEN 1 ELSE 0 END AS new_session
  FROM events)
SELECT user_id, count(*) AS n_events,
       CAST(sum(new_session) AS BIGINT) AS n_sessions
FROM flagged GROUP BY user_id
"""


ORACLE_DEDUP_EXACT = """
SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
"""


#: Hot-shingle document-frequency cutoff used by the graded jaccard
#: queries — shingles in more docs than this are stop-shingles (the
#: skew guard; see ngram_jaccard_pairs).
JACCARD_MAX_DF = 100


ORACLE_DEDUP_JACCARD = f"""
WITH {_shingle_sql(5)},
{_shingle_df_sql(JACCARD_MAX_DF)},
sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
shared AS (SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS c
           FROM sh2 l JOIN sh2 r ON l.s = r.s AND l.doc_id < r.doc_id
           GROUP BY 1, 2)
SELECT id_a, id_b,
       CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
"""


ORACLE_DEDUP_CONTAINMENT = f"""
WITH {_shingle_sql(3)},
{_shingle_df_sql(JACCARD_MAX_DF)},
sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
shared AS (SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS c
           FROM sh2 l JOIN sh2 r ON l.s = r.s AND l.doc_id < r.doc_id
           GROUP BY 1, 2)
SELECT id_a, id_b,
       CAST(c AS DOUBLE) / sa.n AS containment_a_in_b,
       CAST(c AS DOUBLE) / sb.n AS containment_b_in_a
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE greatest(CAST(c AS DOUBLE) / sa.n,
               CAST(c AS DOUBLE) / sb.n) >= 0.8
"""


ORACLE_DEDUP_EMBEDDING = """
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM c a, c b
WHERE a.vec_id < b.vec_id
  AND list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v))
         * sqrt(list_dot_product(b.v, b.v))) >= 0.4
"""


ORACLE_UNIGRAM_STATS = rf"""
WITH tok AS (SELECT doc_id, unnest({_SPLIT}) AS t FROM documents),
vocab AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t)
SELECT tok.doc_id,
       count(*) AS n_tokens,
       CAST(sum(vocab.cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS avg_token_count,
       CAST(sum(CASE WHEN vocab.cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS hapax_share
FROM tok JOIN vocab USING (t)
GROUP BY tok.doc_id
"""


ORACLE_BIGRAM_LM = rf"""
WITH w AS (SELECT doc_id, {_SPLIT} AS w FROM documents),
pairs AS (SELECT doc_id,
            w[gs] AS w1, w[gs] || ' ' || w[gs+1] AS pair
          FROM w, UNNEST(generate_series(1, len(w) - 1)) t(gs)
          WHERE len(w) >= 2),
cb AS (SELECT pair, count(*) AS cb FROM pairs GROUP BY pair),
cu AS (SELECT w1, count(*) AS cu FROM pairs GROUP BY w1)
SELECT doc_id, count(*) AS n_bigrams,
       round(avg(CAST(cb AS DOUBLE) / cu), 6) AS mean_cond_p,
       CAST(sum(CASE WHEN cb <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS rare_bigram_share
FROM pairs JOIN cb USING (pair) JOIN cu USING (w1)
GROUP BY doc_id
"""


ORACLE_DUP_SPANS = rf"""
WITH w AS (SELECT doc_id, {_SPLIT} AS w FROM documents),
sp AS (SELECT doc_id, array_to_string(list_slice(w, gs, gs + 7), ' ') AS s
       FROM w, UNNEST(generate_series(1, len(w) - 7)) t(gs)
       WHERE len(w) >= 8),
nd AS (SELECT s, count(*) AS ndocs
       FROM (SELECT DISTINCT doc_id, s FROM sp) GROUP BY s)
SELECT doc_id, count(*) AS n_spans,
       CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS dup_ratio
FROM sp JOIN nd USING (s)
GROUP BY doc_id
"""


ORACLE_SPAN_SCRUB = rf"""
WITH w AS (SELECT doc_id,
             regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS w
           FROM documents),
sp AS (SELECT doc_id, gs - 1 AS s,
         md5(array_to_string(list_slice(w, gs, gs + 7), ' ')) AS h
       FROM w, UNNEST(generate_series(1, len(w) - 7)) t(gs)
       WHERE len(w) >= 8),
nd AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM sp)
       GROUP BY h HAVING count(*) >= 2),
st AS (SELECT doc_id, list_sort(list(DISTINCT s)) AS ss
       FROM sp JOIN nd USING (h) GROUP BY doc_id),
base AS (SELECT w.doc_id, w.w, coalesce(ss, []) AS ss
         FROM w LEFT JOIN st USING (doc_id)),
kept AS (SELECT doc_id, w,
           list_filter(generate_series(0, len(w) - 1),
             j -> len(list_filter(ss,
                      s -> s <= j AND j <= s + 7)) = 0) AS kj
         FROM base)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(len(kj) AS BIGINT) AS n_tokens_kept,
       md5(coalesce(array_to_string(
            list_transform(kj, j -> w[j + 1]), ' '), ''))
         AS scrub_md5
FROM kept
"""


ORACLE_WINNOW = rf"""
WITH w AS (SELECT doc_id, {_SPLIT} AS w FROM documents),
h AS (SELECT doc_id,
        list_transform(generate_series(1, len(w) - 4),
          gs -> ('0x' || substr(md5(array_to_string(
                   list_slice(w, gs, gs + 4), ' ')), 1, 15))::BIGINT)
          AS hs
      FROM w WHERE len(w) >= 5),
sel AS (SELECT doc_id,
          CASE WHEN len(hs) >= 4
               THEN list_distinct(list_transform(
                      generate_series(1, len(hs) - 3),
                      i -> list_min(list_slice(hs, i, i + 3))))
               ELSE [list_min(hs)] END AS fps
        FROM h),
e AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM sel),
dfreq AS (SELECT fp, count(*) AS nd FROM e GROUP BY fp)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
       CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_fp
FROM e JOIN dfreq USING (fp)
GROUP BY doc_id
"""


#: shared BM25 ``scored`` CTE chain (tok/tf/dl/stats/qt/dfreq/scored)
#: — interpolated into BOTH ORACLE_BM25 and ORACLE_HYBRID_RRF so the
#: scoring function cannot silently diverge between the two twins
_BM25_SCORED_CTE = rf"""tok AS (SELECT doc_id, unnest({_SPLIT}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       GROUP BY doc_id, term),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
qt AS (SELECT doc_id AS query_id,
              unnest(list_distinct({_SPLIT})) AS term
       FROM documents WHERE doc_id < 3),
dfreq AS (SELECT term, count(*) AS df FROM tf
          WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term),
scored AS (SELECT qt.query_id, tf.doc_id,
       round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
             * tf * (1.2 + 1)
             / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6)
         AS score
   FROM qt JOIN tf USING (term) JOIN dfreq USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id, stats
   GROUP BY qt.query_id, tf.doc_id)"""


ORACLE_BM25 = f"""
WITH {_BM25_SCORED_CTE},
r AS (SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
      FROM scored)
SELECT query_id, doc_id, score, rank FROM r WHERE rank <= 10
"""


#: The dense ranks below order by UNROUNDED float cosine — the same
#: convention ORACLE_KNN uses (and the driver has hash-matched for 12
#: rounds): a cross-engine 1-ulp flip would already break
#: knn_bruteforce's own rank column, so feeding the rank into the RRF
#: arithmetic adds no new risk class.
ORACLE_HYBRID_RRF = f"""
WITH {_BM25_SCORED_CTE},
sparse AS (SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
           FROM scored),
qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
       FROM embeddings WHERE vec_id < 3),
cv AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS v
       FROM embeddings),
cos AS (SELECT query_id, cid,
          list_dot_product(qv.v, cv.v)
          / (sqrt(list_dot_product(qv.v, qv.v))
             * sqrt(list_dot_product(cv.v, cv.v))) AS c
        FROM qv, cv),
dense AS (SELECT query_id, cid AS doc_id,
            row_number() OVER (PARTITION BY query_id
                               ORDER BY c DESC, cid) AS rank
          FROM cos),
lists AS (
  SELECT query_id, doc_id, CAST(1 AS DOUBLE) / (60 + rank) AS contrib
  FROM sparse WHERE rank <= 10
  UNION ALL
  SELECT query_id, doc_id, CAST(1 AS DOUBLE) / (60 + rank)
  FROM dense WHERE rank <= 10),
fused AS (SELECT query_id, doc_id,
            round(sum(contrib), 6) AS rrf_score,
            CAST(count(*) AS BIGINT) AS n_lists
          FROM lists GROUP BY query_id, doc_id)
SELECT query_id, doc_id, rrf_score, n_lists,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY rrf_score DESC, doc_id) AS rank
FROM fused
"""


ORACLE_TEXT_STATS = f"""
WITH t AS (SELECT doc_id, length(text) AS n_chars_computed,
                  {_SPLIT} AS w,
                  regexp_extract_all(text, '{TOKEN_PATTERN}') AS bpe
           FROM documents)
SELECT doc_id, n_chars_computed,
       len(w) AS n_tokens,
       len(list_distinct(w)) AS n_distinct_tokens,
       len(bpe) AS n_bpe_tokens,
       CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS distinct_ratio
FROM t
"""


ORACLE_SOURCE_QUALITY = f"""
WITH t AS (SELECT source, {_SPLIT} AS w FROM documents)
SELECT source, count(*) AS n_docs,
       CAST(sum(len(w)) AS BIGINT) AS total_tokens,
       min(len(w)) AS min_tokens,
       max(len(w)) AS max_tokens,
       CAST(sum(len(list_distinct(w))) AS BIGINT) AS total_distinct
FROM t GROUP BY source
"""


ORACLE_FINGERPRINT = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform({_SPLIT},
             t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % {FP_MOD})),
         (acc, h) -> (acc * 31 + h) % {FP_MOD}) AS fp
FROM documents
"""


# DuckDB twin of chunk_documents(chunk_tokens=32, overlap=8):
# stride 24, n_chunks = max(ceil((n-8)/24), 1), window i covers
# 1-based tokens [i*24+1, i*24+32]; list_slice clamps like Spark slice.
ORACLE_CHUNK_DOCUMENTS = f"""
WITH t AS (SELECT doc_id,
                  regexp_split_to_array(trim(coalesce(text, '')), '\\s+')
                  AS w
           FROM documents),
c AS (SELECT doc_id, w,
             unnest(generate_series(0,
               greatest(CAST(ceil((len(w) - 8) / 24.0) AS INT), 1) - 1))
             AS i
      FROM t)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_id,
       array_to_string(list_slice(w, i * 24 + 1, i * 24 + 32), ' ')
         AS chunk_text,
       CAST(least(len(w) - i * 24, 32) AS BIGINT) AS n_tokens
FROM c
"""


ORACLE_HASH_SPLIT = """
SELECT doc_id, lang,
       CASE WHEN u < 0.75 THEN 'train'
            WHEN u < 0.875 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             / 16.0 ** 15 AS u
      FROM documents)
"""


ORACLE_SHUFFLE_SHARDS = """
SELECT doc_id, lang, shard,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY h ASC, doc_id ASC) - 1
            AS BIGINT) AS shard_pos
FROM (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  ::BIGINT % 8 AS INT) AS shard
      FROM documents)
"""


ORACLE_EMBEDDING_QUANTIZE = """
SELECT vec_id,
       round(scale, 9) AS qscale_r,
       CAST(list_sum(list_transform(
           v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)))
            AS BIGINT) AS qsum,
       CAST(list_max(list_transform(
           v, x -> CAST(floor(x / scale + 0.5) AS INT))) AS INT) AS qmax,
       CAST(list_min(list_transform(
           v, x -> CAST(floor(x / scale + 0.5) AS INT))) AS INT) AS qmin
FROM (SELECT vec_id, v,
             CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END AS scale
      FROM (SELECT vec_id,
                   list_transform(embedding,
                                  x -> CAST(x AS DOUBLE)) AS v,
                   list_max(list_transform(
                       embedding,
                       x -> abs(CAST(x AS DOUBLE)))) AS amax
            FROM embeddings))
"""


# the packing recurrence, replayed exactly: next-fit greedy over
# chunk_id order, reset when the bin would exceed 96 tokens
ORACLE_PACK_SEQUENCES = """
WITH RECURSIVE
t AS (SELECT doc_id,
             regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS w
      FROM documents),
c AS (SELECT doc_id, w,
             unnest(generate_series(0,
               greatest(CAST(ceil((len(w) - 8) / 24.0) AS INT), 1) - 1))
             AS i
      FROM t),
chunks AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
                  CAST(least(len(w) - i * 24, 32) AS BIGINT) AS n_tokens
           FROM c),
r AS (
  SELECT doc_id, chunk_id, n_tokens,
         CAST(0 AS BIGINT) AS bin, n_tokens AS bin_fill
  FROM chunks WHERE chunk_id = 0
  UNION ALL
  SELECT ch.doc_id, ch.chunk_id, ch.n_tokens,
         CASE WHEN r.bin_fill + ch.n_tokens > 96
              THEN r.bin + 1 ELSE r.bin END,
         CASE WHEN r.bin_fill + ch.n_tokens > 96
              THEN ch.n_tokens ELSE r.bin_fill + ch.n_tokens END
  FROM chunks ch
  JOIN r ON ch.doc_id = r.doc_id AND ch.chunk_id = r.chunk_id + 1
)
SELECT doc_id, chunk_id, n_tokens, bin, bin_fill FROM r
"""


ORACLE_STRATIFIED_SAMPLE = """
SELECT doc_id, lang, source
FROM (SELECT doc_id, lang, source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             / 16.0 ** 15 AS u
      FROM documents)
WHERE u < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
                    WHEN 'fr' THEN 0.125 ELSE 0.0 END
"""


ORACLE_UPSAMPLE_WEIGHTS = """
SELECT doc_id, lang, c AS copy
FROM (
  SELECT doc_id, lang,
         CAST(floor(w) AS BIGINT)
         + CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END AS n
  FROM (SELECT doc_id, lang,
               CASE lang WHEN 'en' THEN 2.5 WHEN 'de' THEN 1.0
                         WHEN 'fr' THEN 0.25 ELSE 0.0 END AS w,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 ::BIGINT / 16.0 ** 15 AS u
        FROM documents)
) base, LATERAL unnest(generate_series(0, n - 1)) AS g(c)
WHERE n >= 1
"""


ORACLE_TOKEN_BUDGET = """
SELECT doc_id, lang, n_chars
FROM (SELECT doc_id, lang, n_chars,
             sum(n_chars) OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM documents)
WHERE cum - n_chars < 20000
"""


ORACLE_KNN = """
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings),
s AS (SELECT qid, cid,
             list_dot_product(qv, cv)
             / (sqrt(list_dot_product(qv, qv))
                * sqrt(list_dot_product(cv, cv))) AS cos
      FROM q, c),
r AS (SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, cid) AS rank
      FROM s)
SELECT qid AS query_id, cid AS vec_id, round(cos, 6) AS cosine,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 10
"""


ORACLE_MULTIMODAL = """
SELECT doc_id AS id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte
FROM documents
"""


ORACLE_MULTIMODAL_DECODED = """
WITH s AS (
  SELECT doc_id,
         ((doc_id * 31 + i * 7) % 256 - 128) / 128.0 AS v
  FROM documents, UNNEST(generate_series(0, 63)) t(i)
)
SELECT doc_id AS id, CAST(64 AS INTEGER) AS n_samples,
       round(64 / 16000.0, 6) AS duration_s,
       round(sqrt(avg(v * v)), 6) AS rms
FROM s GROUP BY doc_id
"""


ORACLE_ZARR = f"""
SELECT {EVENTS3} FROM events WHERE day(ts) IN (3, 4, 5)
"""


ORACLE_STREAMING = """
SELECT date_trunc('hour', ts) AS window_start, count(*) AS n
FROM events GROUP BY 1
"""


ORACLE_STREAMING_SINK = """
SELECT month(ts) AS m, day(ts) AS d, count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS sum_value
FROM events GROUP BY 1, 2 ORDER BY m, d
"""


ORACLE_STREAMING_CHANGES = """
WITH added AS (
  SELECT DISTINCT 'year=' || year(ts) || '/month=' || month(ts)
         || '/day=' || day(ts) AS relpath
  FROM events WHERE day(ts) >= 15),
removed AS (
  SELECT DISTINCT 'year=' || year(ts) || '/month=' || month(ts)
         || '/day=' || day(ts) AS relpath
  FROM events WHERE day(ts) <= 5)
SELECT 'added' AS change, count(*) AS n_partitions,
       min(relpath) AS first_relpath, max(relpath) AS last_relpath
FROM added HAVING count(*) > 0
UNION ALL
SELECT 'removed' AS change, count(*) AS n_partitions,
       min(relpath) AS first_relpath, max(relpath) AS last_relpath
FROM removed HAVING count(*) > 0
ORDER BY change
"""


ORACLE_STREAMING_STATEFUL = """
SELECT user_id, count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM events GROUP BY user_id
"""


ORACLE_ORDER_PRIORITY = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


ORACLE_RETURNED_LOSSES = """
SELECT c_custkey, c_name, n_name,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))
           * CAST(1.0 - l_discount AS DECIMAL(12,4)))
           AS DECIMAL(28,4)) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


ORACLE_PRIORITY_CLASS = """
SELECT o_orderstatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderstatus
"""


ORACLE_ASOF = """
SELECT l.event_id, l.user_id, l.ts, r.value AS last_purchase_value
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type <> 'purchase') l
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


ORACLE_DEDUP_KEEP_LATEST = """
SELECT event_id, user_id, event_type, ts, value FROM (
  SELECT event_id, user_id, event_type, ts, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


ORACLE_INTERVAL_MATCH = """
WITH iv AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
         min(ts) AS win_lo, max(ts) AS win_hi
  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
SELECT p.event_id, p.user_id, p.ts, iv.day_start, iv.win_lo, iv.win_hi
FROM events p
JOIN iv ON p.user_id = iv.user_id
       AND p.ts >= iv.win_lo AND p.ts <= iv.win_hi
WHERE p.event_type = 'purchase'
"""


ORACLE_PERCENTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       count(*) AS n
FROM events GROUP BY event_type
"""


ORACLE_REVENUE_ROLLUP = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,4)))
           AS DECIMAL(28,4)) AS DOUBLE)
         AS sum_qty,
       GROUPING(l_returnflag, l_linestatus) AS gid
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


ORACLE_STREAMING_DEDUP = """
SELECT event_id, ts, user_id, value FROM events
"""


ORACLE_EMBEDDING_CENTROIDS = """
SELECT label, pos,
       CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 10000000) AS BIGINT))
            AS BIGINT) AS qsum,
       count(*) AS n
FROM (SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) - 1 AS pos
      FROM embeddings)
GROUP BY label, pos
"""


ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_shingle_sql(5)},
{_shingle_df_sql(JACCARD_MAX_DF)},
sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
shared AS (SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS c
           FROM sh2 l JOIN sh2 r ON l.s = r.s AND l.doc_id < r.doc_id
           GROUP BY 1, 2),
pairs AS (SELECT id_a, id_b FROM shared
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
-- MATERIALIZED: the recursive closure otherwise re-inlines (and
-- re-evaluates) the whole shingle-join pipeline once per iteration
-- (measured 130x on the semantic twin at sf1, r14)
edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach AS (SELECT DISTINCT a AS node, a AS label FROM edges
          UNION
          SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.node)
SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
"""


ORACLE_BIG_ORDERS = """
SELECT o_orderkey, o_custkey, o_orderdate, total_qty
FROM orders
JOIN (SELECT l_orderkey,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,4)))
                  AS DECIMAL(28,4)) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING total_qty > 180) ON o_orderkey = l_orderkey
"""


ORACLE_EVENT_GAPS = """
WITH g AS (
  SELECT epoch_us(ts)
         - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)) AS gap_us
  FROM events)
SELECT CAST(floor(gap_us / 3600000000.0) AS BIGINT) AS gap_hours,
       count(*) AS n, min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY 1
"""


ORACLE_CAPPED_SAMPLE = """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR) || ''), doc_id) AS rn
  FROM documents) WHERE rn <= 30
"""


ORACLE_TRADE_FLOWS = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))
           * CAST(1.0 - l_discount AS DECIMAL(12,4)))
           AS DECIMAL(28,4)) AS DOUBLE)
         AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
GROUP BY sn.n_name, cn.n_name
"""


ORACLE_ZARR_DOCUMENTS = """
SELECT doc_id, lang, length(text) AS n_chars_rt, md5(text) AS text_md5
FROM documents
"""


ORACLE_TOP_NGRAMS = f"""
WITH {_shingle_sql(2)}
SELECT s AS gram, count(*) AS df FROM sh
GROUP BY s ORDER BY df DESC, gram LIMIT 20
"""


ORACLE_BROWSE_NO_BUY = """
SELECT DISTINCT user_id, day(ts) AS d FROM events
WHERE event_type = 'view'
EXCEPT
SELECT DISTINCT user_id, day(ts) FROM events
WHERE event_type = 'purchase'
"""


ORACLE_DECONTAMINATE = f"""
WITH {_shingle_sql(3)},
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
train AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
FROM train JOIN bench USING (s)
GROUP BY doc_id
"""


ORACLE_DOC_REPETITION = """
WITH words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+')
                      AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS t, len(w) AS n FROM words),
freq AS (SELECT doc_id, t, count(*) AS c, any_value(n) AS n
         FROM tok GROUP BY doc_id, t),
top AS (SELECT doc_id, max(c) AS mx, any_value(n) AS n
        FROM freq GROUP BY doc_id),
shall AS (SELECT doc_id,
            CASE WHEN len(w) >= 5
                 THEN array_to_string(list_slice(w, gs, gs + 4), ' ')
                 ELSE array_to_string(w, ' ') END AS s
          FROM words,
               UNNEST(generate_series(
                 1, CASE WHEN len(w) >= 5 THEN len(w) - 4
                         ELSE 1 END)) u(gs)),
dup AS (SELECT doc_id,
               1.0 - CAST(count(DISTINCT s) AS DOUBLE) / count(*) AS r
        FROM shall GROUP BY doc_id)
SELECT t.doc_id, round(CAST(t.mx AS DOUBLE) / t.n, 6) AS top_token_ratio,
       round(d.r, 6) AS dup_ngram_ratio
FROM top t JOIN dup d ON d.doc_id = t.doc_id
"""


ORACLE_DSIR_SAMPLE = rf"""
WITH src_tok AS (SELECT doc_id, unnest({_SPLIT}) AS t FROM documents),
tgt_tok AS (SELECT unnest({_SPLIT}) AS t FROM documents
            WHERE lang = 'en'),
cs AS (SELECT t, count(*) AS c FROM src_tok GROUP BY t),
ct AS (SELECT t, count(*) AS c FROM tgt_tok GROUP BY t),
vocab AS (SELECT coalesce(cs.t, ct.t) AS t,
                 coalesce(cs.c, 0) AS csn, coalesce(ct.c, 0) AS ctn
          FROM cs FULL JOIN ct ON cs.t = ct.t),
scal AS (SELECT CAST(count(*) AS DOUBLE) AS v,
                CAST(sum(csn) AS DOUBLE) AS ts,
                CAST(sum(ctn) AS DOUBLE) AS tt FROM vocab),
lr AS (SELECT t, ln((ctn + 1.0) * (ts + v))
                 - ln((csn + 1.0) * (tt + v)) AS lr
       FROM vocab, scal),
w AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             round(sum(lr), 6) AS log_weight
      FROM src_tok JOIN lr USING (t) GROUP BY doc_id),
keyed AS (SELECT *, round(log_weight - ln(-ln(greatest(
            ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            / 16.0 ** 15, 1e-15))), 6) AS gumbel_key
          FROM w)
SELECT doc_id, n_tokens, log_weight, gumbel_key,
       CAST(row_number() OVER (ORDER BY gumbel_key DESC, doc_id)
            AS BIGINT) AS rank
FROM keyed
ORDER BY gumbel_key DESC, doc_id
LIMIT 50
"""


ORACLE_TFIDF_TOPK = rf"""
WITH tok AS (SELECT doc_id, unnest({_SPLIT}) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM tf),
scored AS (SELECT doc_id, term, tf,
                  round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 6)
                    AS score
           FROM tf JOIN dfreq USING (term), n)
SELECT doc_id, term, tf, score, CAST(rnk AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rnk
      FROM scored)
WHERE rnk <= 3
"""


ORACLE_SPLIT_LEAKAGE = f"""
WITH {_shingle_sql(3)},
{_shingle_df_sql(JACCARD_MAX_DF)},
sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
shared AS (SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS c
           FROM sh2 l JOIN sh2 r ON l.s = r.s AND l.doc_id < r.doc_id
           GROUP BY 1, 2),
pairs AS (SELECT id_a, id_b,
                 CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
          FROM shared
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
splits AS (SELECT doc_id,
                  CASE WHEN u < 0.4 THEN 'train'
                       WHEN u < 0.7 THEN 'val'
                       ELSE 'test' END AS split
           FROM (SELECT doc_id,
                        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                        1, 15))::BIGINT
                        / 16.0 ** 15 AS u
                 FROM documents))
SELECT id_a, id_b, jaccard,
       a.split AS split_a, b.split AS split_b
FROM pairs
JOIN splits a ON a.doc_id = id_a
JOIN splits b ON b.doc_id = id_b
WHERE a.split != b.split
"""


ORACLE_LM_BUCKETS = rf"""
WITH w AS (SELECT doc_id, {_SPLIT} AS w FROM documents),
pairs AS (SELECT doc_id,
            w[gs] AS w1, w[gs] || ' ' || w[gs+1] AS pair
          FROM w, UNNEST(generate_series(1, len(w) - 1)) t(gs)
          WHERE len(w) >= 2),
cb AS (SELECT pair, count(*) AS cb FROM pairs GROUP BY pair),
cu AS (SELECT w1, count(*) AS cu FROM pairs GROUP BY w1),
scored AS (SELECT doc_id,
                  round(avg(CAST(cb AS DOUBLE) / cu), 6) AS lm_score
           FROM pairs JOIN cb USING (pair) JOIN cu USING (w1)
           GROUP BY doc_id),
bounds AS (SELECT round(quantile_cont(lm_score, {1/3!r}), 6) AS b1,
                  round(quantile_cont(lm_score, {2/3!r}), 6) AS b2
           FROM scored)
SELECT doc_id, lm_score,
       CASE WHEN lm_score <= b1 THEN 'tail'
            WHEN lm_score <= b2 THEN 'middle'
            ELSE 'head' END AS bucket
FROM scored, bounds
"""


ORACLE_NOVELTY_SCORES = f"""
WITH {_shingle_sql(3)},
dfq AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
SELECT doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique,
       round(avg(CASE WHEN df = 1 THEN 1.0 ELSE 0.0 END), 6)
         AS novelty,
       round(avg(ln(df)), 6) AS mean_log_df
FROM sh JOIN dfq USING (s) GROUP BY doc_id
"""


ORACLE_SOURCE_OVERLAP = f"""
WITH words AS (SELECT source, {_SPLIT} AS w FROM documents),
sh AS (SELECT DISTINCT source,
         CASE WHEN len(w) >= 3
              THEN array_to_string(list_slice(w, gs, gs + 2), ' ')
              ELSE array_to_string(w, ' ') END AS s
       FROM words,
            UNNEST(generate_series(
              1, CASE WHEN len(w) >= 3 THEN len(w) - 2
                      ELSE 1 END)) t(gs)),
sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
inter AS (SELECT a.source AS source_a, b.source AS source_b,
                 count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
          GROUP BY 1, 2),
pairs AS (SELECT a.source AS source_a, b.source AS source_b,
                 a.n AS n_a, b.n AS n_b
          FROM sizes a, sizes b WHERE a.source < b.source)
SELECT source_a, source_b, n_a, n_b,
       CAST(coalesce(c, 0) AS BIGINT) AS n_common,
       round(CAST(coalesce(c, 0) AS DOUBLE)
             / (n_a + n_b - coalesce(c, 0)), 6) AS jaccard
FROM pairs LEFT JOIN inter USING (source_a, source_b)
"""


ORACLE_BOILERPLATE_STRIP = f"""
WITH t AS (SELECT doc_id, {_SPLIT} AS w FROM documents),
p AS (SELECT doc_id,
             CAST(ceil(len(w) / 4.0) AS INT) AS np, w, i
      FROM t, UNNEST(generate_series(
               1, CAST(ceil(len(w) / 4.0) AS INT))) u(i)),
k AS (SELECT doc_id, np, w, i,
             ('0x' || substr(md5(array_to_string(
                list_slice(w, (i - 1) * 4 + 1, i * 4), ' ')),
                1, 15))::BIGINT AS key
      FROM p),
bp AS (SELECT key FROM (SELECT key, count(DISTINCT doc_id) AS nd
                        FROM k GROUP BY key)
       WHERE nd >= 3),
kept AS (SELECT doc_id, list_sort(list(i)) AS keep
         FROM k ANTI JOIN bp USING (key) GROUP BY doc_id)
SELECT t.doc_id,
       CAST(ceil(len(t.w) / 4.0) AS BIGINT) AS n_passages,
       CAST(ceil(len(t.w) / 4.0) AS BIGINT)
         - CAST(coalesce(len(keep), 0) AS BIGINT) AS n_boilerplate,
       coalesce(array_to_string(list_transform(keep,
           i -> array_to_string(
                  list_slice(t.w, (i - 1) * 4 + 1, i * 4), ' ')), ' '),
         '') AS clean_text
FROM t LEFT JOIN kept USING (doc_id)
"""



ORACLE_COLLECTION_NESTED = """
SELECT event_id, value AS ku_value, user_id AS meta_user_id
FROM events
WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) <= 7
"""

ORACLE_DOMAIN_MIX = r"""
WITH per AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\s+'))
                  END) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
s AS (SELECT *, CASE WHEN sum(n_tokens) OVER () > 0
                 THEN CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER ()
            END AS sh
      FROM per),
t AS (SELECT *, sqrt(sh) / sum(sqrt(sh)) OVER () AS tgt FROM s)
SELECT source, n_docs, n_tokens,
       round(sh, 6) AS natural_share,
       round(tgt, 6) AS target_share,
       round(CASE WHEN sh > 0 THEN tgt / sh END, 6) AS mix_weight
FROM t
"""

ORACLE_CROSS_LM = rf"""
WITH ref_pairs AS (
  SELECT w FROM (SELECT {_SPLIT} AS w0 FROM documents
                 WHERE source = 'src0' AND len({_SPLIT}) >= 2) r,
       LATERAL (SELECT array_to_string(list_slice(w0, gs, gs + 1), ' ')
                AS w FROM UNNEST(generate_series(1, len(w0) - 1)) t(gs))),
cb AS (SELECT w AS pair, CAST(count(*) AS BIGINT) AS cb
       FROM ref_pairs GROUP BY w),
cu AS (SELECT split_part(pair, ' ', 1) AS w1,
              CAST(sum(cb) AS BIGINT) AS cu
       FROM cb GROUP BY 1),
v AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
      FROM (SELECT unnest({_SPLIT}) AS t FROM documents
            WHERE source = 'src0')),
doc_pairs AS (
  SELECT doc_id, pair, split_part(pair, ' ', 1) AS w1
  FROM (SELECT doc_id, {_SPLIT} AS w0 FROM documents
        WHERE len({_SPLIT}) >= 2) d,
       LATERAL (SELECT array_to_string(list_slice(w0, gs, gs + 1), ' ')
                AS pair
                FROM UNNEST(generate_series(1, len(w0) - 1)) t(gs))),
scored AS (
  SELECT dp.doc_id,
         (CAST(coalesce(cb.cb, 0) AS DOUBLE) + 1.0)
           / (CAST(coalesce(cu.cu, 0) AS DOUBLE) + CAST(v.v AS DOUBLE))
           AS p,
         CASE WHEN cb.cb IS NULL THEN 1 ELSE 0 END AS oov
  FROM doc_pairs dp
  LEFT JOIN cb ON dp.pair = cb.pair
  LEFT JOIN cu ON dp.w1 = cu.w1
  CROSS JOIN v)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(p), 6) AS mean_cond_p,
       CAST(sum(oov) AS DOUBLE) / count(*) AS oov_bigram_share
FROM scored GROUP BY doc_id
"""

ORACLE_CDC_CHUNKS = r"""
WITH t AS (SELECT doc_id,
                  regexp_split_to_array(trim(coalesce(text, '')), '\s+')
                  AS w
           FROM documents),
b AS (SELECT doc_id, w, len(w) AS n,
             CASE WHEN len(w) >= 4 THEN
               list_filter(generate_series(4, len(w)),
                 i -> ('0x' || substr(md5(array_to_string(
                        list_slice(w, i - 3, i), ' ')), 1, 15))::BIGINT
                      % 8 = 0)
             ELSE [] END AS bs
      FROM t),
e AS (SELECT doc_id, w, n,
             CASE WHEN len(bs) > 0 AND bs[len(bs)] = n THEN bs
                  ELSE list_append(bs, n) END AS ends
      FROM b)
SELECT doc_id,
       CAST(j - 1 AS BIGINT) AS chunk_id,
       array_to_string(list_slice(
         w, (CASE WHEN j = 1 THEN 0 ELSE ends[j - 1] END) + 1,
         ends[j]), ' ') AS chunk_text,
       CAST(ends[j] - (CASE WHEN j = 1 THEN 0 ELSE ends[j - 1] END)
            AS BIGINT) AS n_tokens
FROM e, UNNEST(generate_series(1, len(ends))) u(j)
"""

ORACLE_HASH_EMBEDDINGS = rf"""
WITH tok AS (SELECT doc_id, unnest({_SPLIT}) AS t FROM documents
             WHERE trim(coalesce(text, '')) <> ''),
h AS (SELECT doc_id,
             ('0x' || substr(md5(t), 1, 15))::BIGINT % 32 AS dim,
             CASE WHEN ('0x' || substr(md5('s:' || t), 1, 15))::BIGINT
                       % 2 = 0 THEN 1 ELSE -1 END AS sg
      FROM tok),
v AS (SELECT doc_id, dim, CAST(sum(sg) AS DOUBLE) AS raw
      FROM h GROUP BY doc_id, dim),
n AS (SELECT doc_id, sqrt(sum(raw * raw)) AS nrm FROM v GROUP BY doc_id)
SELECT v.doc_id, CAST(dim AS BIGINT) AS dim,
       round(CASE WHEN nrm > 0 THEN raw / nrm ELSE raw END, 6) AS value
FROM v JOIN n ON v.doc_id = n.doc_id
"""

ORACLE_TEXT_KNN = rf"""
WITH tok AS (SELECT doc_id, unnest({_SPLIT}) AS t FROM documents
             WHERE trim(coalesce(text, '')) <> ''),
h AS (SELECT doc_id,
             ('0x' || substr(md5(t), 1, 15))::BIGINT % 32 AS dim,
             CASE WHEN ('0x' || substr(md5('s:' || t), 1, 15))::BIGINT
                       % 2 = 0 THEN 1 ELSE -1 END AS sg
      FROM tok),
v0 AS (SELECT doc_id, dim, CAST(sum(sg) AS DOUBLE) AS raw
       FROM h GROUP BY doc_id, dim),
n AS (SELECT doc_id, sqrt(sum(raw * raw)) AS nrm FROM v0 GROUP BY doc_id),
v AS (SELECT v0.doc_id, dim,
             round(CASE WHEN nrm > 0 THEN raw / nrm ELSE raw END, 6)
             AS value
      FROM v0 JOIN n ON v0.doc_id = n.doc_id),
scored AS (SELECT q.doc_id AS query_id, d.doc_id,
                  round(sum(d.value * q.value), 6) AS score
           FROM v d JOIN v q USING (dim)
           WHERE q.doc_id < 3 AND d.doc_id <> q.doc_id
           GROUP BY q.doc_id, d.doc_id),
r AS (SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
      FROM scored)
SELECT query_id, doc_id, score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 10
"""

ORACLE_CLUSTER_REPS = f"""
WITH RECURSIVE {_shingle_sql(5)},
{_shingle_df_sql(JACCARD_MAX_DF)},
sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
shared AS (SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS c
           FROM sh2 l JOIN sh2 r ON l.s = r.s AND l.doc_id < r.doc_id
           GROUP BY 1, 2),
pairs AS (SELECT id_a, id_b FROM shared
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach AS (SELECT DISTINCT a AS node, a AS label FROM edges
          UNION
          SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.node),
clusters AS (SELECT node AS doc_id, min(label) AS cluster_id
             FROM reach GROUP BY node),
ntok AS (SELECT doc_id,
                len(regexp_split_to_array(trim(text), '\\s+'))
                AS n_tokens
         FROM documents),
ranked AS (SELECT c.cluster_id, c.doc_id, n.n_tokens,
                  row_number() OVER (
                    PARTITION BY c.cluster_id
                    ORDER BY n.n_tokens DESC, c.doc_id) AS rk
           FROM clusters c JOIN ntok n USING (doc_id)),
csize AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
          FROM clusters GROUP BY cluster_id)
SELECT r.cluster_id, r.doc_id AS rep_id,
       CAST(r.n_tokens AS BIGINT) AS rep_tokens, s.cluster_size
FROM ranked r JOIN csize s USING (cluster_id)
WHERE r.rk = 1
"""


ORACLE_NGRAM_COVERAGE = f"""
WITH {_shingle_sql(5)},
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
scored AS (SELECT d.doc_id,
                  count(*) AS tot,
                  sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END)
                    AS hits
           FROM sh d LEFT JOIN bench b ON d.s = b.s
           GROUP BY d.doc_id)
SELECT doc_id, CAST(tot AS BIGINT) AS n_shingles,
       CAST(hits AS BIGINT) AS n_contaminated,
       round(CAST(hits AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS coverage
FROM scored
"""

ORACLE_CORPUS_PROFILE = rf"""
WITH per AS (
  SELECT source,
         len(regexp_split_to_array(trim(text), '\s+')) AS nt,
         round(CAST(len(list_intersect(
                 list_distinct(regexp_split_to_array(trim(text), '\s+')),
                 ['the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'])) AS DOUBLE)
               / greatest(len(regexp_split_to_array(trim(text), '\s+')),
                          1), 6) AS sr
  FROM documents)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       round(quantile_cont(nt, 0.1), 6) AS tokens_p10,
       round(quantile_cont(nt, 0.5), 6) AS tokens_p50,
       round(quantile_cont(nt, 0.9), 6) AS tokens_p90,
       round(quantile_cont(sr, 0.5), 6) AS stop_ratio_p50
FROM per GROUP BY source
"""
