"""sf1-scale gates (skipped when the make_scale output is absent).

The prefix-filtered AllPairs path and the shared-shingle self-join must
be answer-identical at REAL scale, not just on the toy corpora the fast
suite uses — the r11 crossover grid (SCALING.md) showed the two paths
trade places with boilerplate frequency, so the override flag
(``prefix_filter=``) is a knob operators will actually flip; identical
answers in both directions is the contract that makes it safe to flip.
"""

from __future__ import annotations

from pathlib import Path

import pytest

SF1 = Path("/root/repo/.scale/sf1")

pytestmark = pytest.mark.skipif(
    not (SF1 / "documents.parquet").exists(),
    reason="sf1 scale data not generated (tools/make_scale.py)")


def test_jaccard_override_flag_identical_both_directions_sf1(spark):
    """prefix_filter=True and =False return the same pair set at sf1
    over the UNBOUNDED vocabulary (max_df=None — exactly the regime the
    auto-switch targets)."""
    from zcollection_spark.data import load_table
    from zcollection_spark.functions.dedup import (
        ngram_jaccard_pairs, unpersist_intermediates)
    docs = load_table(spark, str(SF1), "documents")
    results = {}
    for pf in (True, False):
        pairs = ngram_jaccard_pairs(docs, id_col="doc_id",
                                    text_col="text", shingle_size=5,
                                    threshold=0.5, max_df=None,
                                    prefix_filter=pf)
        results[pf] = {(r.id_a, r.id_b, round(r.jaccard, 9))
                       for r in pairs.collect()}
        unpersist_intermediates(pairs)
        spark.catalog.clearCache()
    assert results[True] == results[False]
    assert len(results[True]) > 100   # sf1 really has near-dup mass
