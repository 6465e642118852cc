"""Oracle-equality smoke for the queries() registry at sf0.001.

The full gate is tools/verify_oracle.py at sf0.01 (the driver's exact
comparison); here a fast representative subset keeps `pytest -x -q`
self-contained.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from thuvienphapluat_crawler_spark import queries as Q

SF_SMOKE = "/root/testdata/sf0.001"

SUBSET = [
    "q1_pricing_summary",
    "q3_top_orders",
    "events_sessionize",
    "frontier_rank",
    "spans_build",
    "dedup_exact",
    "docs_minhash_sigs",
    "emb_knn_bruteforce",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64).round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in Q.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    got = normalize(Q.QUERIES[name](spark, SF_SMOKE).toPandas())
    want = normalize(duck.execute(Q.ORACLES[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want)


def test_every_query_has_callable_and_oracle_alignment():
    assert set(Q.ORACLES) <= set(Q.QUERIES)
    # every query is exercised by the driver: non-empty registry
    assert len(Q.QUERIES) >= 25
