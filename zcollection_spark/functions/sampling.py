"""Deterministic sampling / budget capping for training-data pipelines.

Two shapes a corpus build needs constantly:

- :func:`cap_per_group` — "at most N documents per language/source/
  domain": a deterministic pseudo-random rank inside each group (md5 of
  the id — stable across runs, engines, and partitionings; no RNG
  state), one window shuffle.  Unlike ``sampleBy`` this gives EXACT
  counts and is replayable — the same corpus always yields the same
  sample, which is what makes dataset cards and ablations reproducible.
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
