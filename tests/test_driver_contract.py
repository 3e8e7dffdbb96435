"""Mimic the grading driver: run every queries() entry at sf0.001 and
compare oracle-checked ones against DuckDB (row count, column names,
order-insensitive values)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m
    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings", "events", "lineitem", "orders",
              "customer", "supplier", "part", "nation", "region"):
        c.sql(f"create view {t} as select * from "
              f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(v))
    return df.sort_values(list(df.columns), ignore_index=True)


def test_entry_smoke(entry_mod):
    res = entry_mod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert {"qid", "external_id", "rank", "score"} <= set(df.columns)


def test_all_queries_run(entry_mod):
    qs = entry_mod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        out = _to_pandas(fn(SF_DIR))
        assert len(out) >= 0, name


def _oracle_names():
    # collect-time: oracle_sql() is a pure dict of SQL strings (no Ray)
    import __ray_entry__ as m
    return sorted(m.oracle_sql())


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_match(entry_mod, con, name):
    ray_out = _canon(_to_pandas(entry_mod.queries()[name](SF_DIR)))
    sql_out = _canon(con.sql(entry_mod.oracle_sql()[name]).df())
    assert list(ray_out.columns) == list(sql_out.columns), name
    assert len(ray_out) == len(sql_out), name
    for c in ray_out.columns:
        a, b = ray_out[c].to_numpy(), sql_out[c].to_numpy()
        if np.issubdtype(ray_out[c].dtype, np.floating):
            np.testing.assert_array_equal(a, b, err_msg=f"{name}.{c}")
        else:
            assert (a == b).all(), f"{name}.{c}: {a[:5]} vs {b[:5]}"
