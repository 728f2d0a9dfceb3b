"""Driver-contract test: every queries() entry runs; every oracle_sql()
entry matches the Ray result (row count + order-insensitive values),
mimicking the graft driver's comparison at sf0.01."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLED = sorted(entry_mod.oracle_sql().keys())
ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(ray_session, con, name):
    ray_df = _canon(_to_df(entry_mod.queries()[name](SF_DIR)))
    sql_df = _canon(con.sql(entry_mod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (name, ray_df.columns, sql_df.columns)
    assert len(ray_df) == len(sql_df), name
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, atol=1e-4, rtol=1e-6)


@pytest.mark.parametrize("name", [n for n in ALL if n not in ORACLED and not n.startswith("er_")])
def test_nonsql_query_runs(ray_session, name):
    df = _to_df(entry_mod.queries()[name](SF_DIR))
    assert df is not None and len(df.columns) > 0
