"""Local mirror of the driver's correctness gate: every ``queries()``
entry with an ``oracle_sql()`` entry must match DuckDB on sf0.01 —
row-count, column names, and order-insensitive values (floats to 6 dp).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


def _pairs():
    import __ray_entry__ as m

    return sorted(set(m.queries()) & set(m.oracle_sql()))


@pytest.mark.parametrize("name", _pairs())
def test_query_matches_oracle(entry_mod, con, name):
    got = _canon(_to_pandas(entry_mod.queries()[name](SF_DIR)))
    exp = _canon(con.execute(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name} columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name} rows {len(got)} != {len(exp)}"
    # values rounded to 6dp on both sides, then compared with a small
    # absolute tolerance: two engines can straddle a rounding boundary by
    # 1 ulp (different summation order), which exact comparison would
    # flag even though the unrounded values agree to 1e-9
    pd.testing.assert_frame_equal(got, exp, check_dtype=True, atol=2e-6, rtol=0)


def test_entry_smoke(entry_mod):
    res = _to_pandas(entry_mod.entry())
    assert len(res) > 0
    assert list(res.columns) == ["query_id", "rank", "doc_id", "score"]


def test_every_query_has_result(entry_mod):
    qs = entry_mod.queries()
    assert len(qs) >= 10
    for name, fn in qs.items():
        df = _to_pandas(fn(SF_DIR))
        assert len(df) > 0, name
