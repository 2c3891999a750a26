"""Synthesize a larger scale factor from an existing testdata dir.

The driver ships sf0.001/0.01/0.1 only; the 100 TB design claims rest on
plan pins until a measured order-of-magnitude step-up exists.  This tool
replicates every fact table ``k``x with CONSISTENT key shifts (foreign
keys move with their dimensions), so the scaled data keeps the original's
join fan-out, group cardinality growth, and per-entity structure:

- ``region``/``nation`` stay fixed (true of TPC-H at any sf);
- ``customer``/``supplier``/``part``/``orders``/``lineitem`` replicate
  with ``key' = key + copy * (max_key + 1)`` applied to the primary key
  AND every referencing foreign key — referential integrity holds by
  construction;
- ``events`` replicates with shifted ``event_id``/``user_id`` and an
  unchanged time axis: per-hour density grows ``k``x, per-user session
  structure is preserved (how a stream actually grows);
- ``documents`` replicates with shuffled word order per copy, seeded by
  ``(copy, crc32(text))``: exact-duplicate groups stay exact WITHIN each
  copy (same text -> same permutation) while cross-copy shingle overlap
  is destroyed — without this, every dedup candidate count would grow
  O(k^2) by construction and the scale run would measure an artifact;
- ``embeddings`` replicates with ``np.roll(vec, copy)``: norms and
  within-copy pairwise dot products are EXACTLY preserved (cluster
  structure intact per copy) while cross-copy cosines decorrelate.

Everything is deterministic (no wall clock, fixed seeds); output schema
is byte-identical to the source (pyarrow cast to the source schema).

Usage::

    python tools/make_scale.py [--src /root/testdata/sf0.1] \
        [--factor 10] [--out /root/repo/.scale/sf1]
"""

from __future__ import annotations

import argparse
import zlib
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPY_VERBATIM = ("region", "nation")

#: table -> {column: offset-source table whose primary-key max defines
#: the per-copy shift}.  The first entry is the table's own primary key.
KEY_SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events.user_id"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

PRIMARY_KEY = {"customer": "c_custkey", "supplier": "s_suppkey",
               "part": "p_partkey", "orders": "o_orderkey",
               "events": "event_id", "documents": "doc_id",
               "embeddings": "vec_id"}


def _offsets(src: Path) -> dict[str, int]:
    """max(primary key)+1 per key space, read once from the source."""
    out = {}
    for table, key in PRIMARY_KEY.items():
        col = pq.read_table(src / f"{table}.parquet", columns=[key])
        out[table] = int(pc.max(col[key]).as_py()) + 1
    uid = pq.read_table(src / "events.parquet", columns=["user_id"])
    out["events.user_id"] = int(pc.max(uid["user_id"]).as_py()) + 1
    return out


def _shuffle_words(text: str, copy: int) -> str:
    """Deterministic word shuffle + light token substitution, keyed by
    (copy, text): identical source texts map to identical outputs (dup
    groups survive EXACTLY within a copy), while cross-copy similarity
    is destroyed on BOTH axes a fingerprint can see —

    - word ORDER (the shuffle): kills shingle/n-gram overlap, so
      minhash/jaccard candidate counts grow linearly, not O(k^2);
    - word MULTISET (the substitution, ~1/8 of words replaced with
      (copy, text)-keyed tokens): kills order-blind similarity, so
      simhash no longer sees every cross-copy replica pair as a
      genuine near-dup — without this the sf3 simhash point measured
      a data-construction artifact (x8.9 pair growth), not the
      operator (r7 verdict residual #3).

    The substitution tokens embed the seed (copy + text digest), so two
    DIFFERENT source docs never gain shared tokens — no spurious
    within-copy similarity is introduced."""
    words = text.split()
    if len(words) < 2:
        return text
    seed = (copy * 2654435761 + zlib.crc32(text.encode())) % (2 ** 32)
    rng = np.random.RandomState(seed)
    words = [words[i] for i in rng.permutation(len(words))]
    n_sub = min(len(words), max(2, len(words) // 8))
    for j, pos in enumerate(rng.choice(len(words), size=n_sub,
                                       replace=False)):
        words[pos] = f"zz{seed:08x}{j}"
    return " ".join(words)


def scale_table(src: Path, out: Path, table: str, factor: int,
                offsets: dict[str, int]) -> int:
    source = pq.read_table(src / f"{table}.parquet")
    schema = source.schema
    if table in COPY_VERBATIM:
        pq.write_table(source, out / f"{table}.parquet")
        return source.num_rows
    shifts = KEY_SHIFTS[table]
    copies = [source]
    for i in range(1, factor):
        cols = {}
        for name in schema.names:
            col = source[name]
            if name in shifts:
                col = pc.add(col, i * offsets[shifts[name]])
            cols[name] = col
        if table == "documents":
            texts = [_shuffle_words(t, i)
                     for t in cols["text"].to_pylist()]
            cols["text"] = pa.array(texts, type=schema.field("text").type)
            cols["n_chars"] = pa.array(
                [len(t) for t in texts],
                type=schema.field("n_chars").type)
        elif table == "embeddings":
            mat = np.stack(cols["embedding"].to_pandas().to_numpy())
            rolled = np.roll(mat, i, axis=1)
            cols["embedding"] = pa.array(
                list(rolled), type=schema.field("embedding").type)
        copies.append(pa.table(cols, schema=schema))
    scaled = pa.concat_tables(copies).cast(schema)
    pq.write_table(scaled, out / f"{table}.parquet")
    return scaled.num_rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/.scale/sf1")
    args = ap.parse_args()
    src, out = Path(args.src), Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    offsets = _offsets(src)
    tables = list(COPY_VERBATIM) + list(KEY_SHIFTS)
    for table in tables:
        n = scale_table(src, out, table, args.factor, offsets)
        print(f"{table:12s} {n:>9,d} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
