"""Driver-contract plumbing test: a cheap subset of queries() compared
against their DuckDB oracle_sql() twins at sf0.001 (the full 27-query
sweep runs via tools/check_contract.py; this keeps pytest fast while
still exercising the exact compare path the driver uses)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SUBSET = [
    "exact_dedup_docs",
    "ndf_classification_events",
    "streaming_ndf_classify",
    "restore_prefix_sum",
    "semi_anti_orders",
    "token_stats_docs",
    "topk_hot_fps_events",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{SF}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "cluster_id"}


def test_queries_have_oracles():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert len(qs) >= 25
    missing = set(qs) - set(osql)
    assert not missing, f"queries without oracle SQL: {missing}"


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as e

    got = canon(e.queries()[name](spark, SF).toPandas())
    want = canon(duck.sql(e.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )
