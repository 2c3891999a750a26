"""The ``_money`` ≤2-dp data contract (r16 verdict item 2).

The scaled-long money sums (entry_queries ``_money`` /
``_scaled_sum_cols``) assume every money input is an exact ≤2-dp
value stored as a double: ``round(x·100)`` then recovers the exact
cents integer.  A >2-dp input would be silently ROUNDED where the
decimal pipeline this replaced degraded exactly — so the contract is
enforced loudly here, off the hot path: every testdata tier must
carry zero violations, and a synthetic 3-dp input must be caught.
"""

import os

import pytest

from zcollection_spark.entry_queries import (MONEY_CONTRACT_COLS,
                                             money_contract_violations)

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1")
           if os.path.isdir(d)]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_testdata_money_columns_are_2dp(spark, sf_dir):
    from zcollection_spark.data import load_table
    for table, cols in MONEY_CONTRACT_COLS.items():
        df = load_table(spark, sf_dir, table)
        n = money_contract_violations(df, cols)
        assert n == 0, (sf_dir, table, n)


def test_3dp_input_is_caught(spark):
    df = spark.createDataFrame(
        [(1.25,), (7.10,), (3.141,)], "amount double")
    # the guard flags the 3-dp row; the 2-dp rows pass
    assert money_contract_violations(df, ["amount"]) == 1
    clean = spark.createDataFrame([(1.25,), (7.10,)], "amount double")
    assert money_contract_violations(clean, ["amount"]) == 0
