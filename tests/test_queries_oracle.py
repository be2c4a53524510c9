"""Driver-contract simulation: run every oracled query through
``__ray_entry__`` and compare against its DuckDB oracle SQL exactly the
way the driver does (row count + sorted-column values)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF_DIR = '/root/testdata/sf0.001'
TABLES = ('region nation customer supplier part orders lineitem events '
          'documents embeddings').split()


@pytest.fixture(scope='module')
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def to_pandas(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype('datetime64[us]')
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype('int64')
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


ORACLED = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize('name', ORACLED)
def test_query_matches_oracle(ray_session, ducks, name):
    q = entrymod.queries()[name]
    got = canon(to_pandas(q(SF_DIR)))
    want = canon(ducks.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f'{name}: columns {list(got.columns)} != {list(want.columns)}')
    assert len(got) == len(want), f'{name}: {len(got)} rows != {len(want)}'
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


def test_rows_only_queries_run(ray_session):
    qs = entrymod.queries()
    rows_only = sorted(set(qs) - set(entrymod.oracle_sql()))
    for name in rows_only:
        df = to_pandas(qs[name](SF_DIR))
        assert df is not None and len(df.columns) > 0, name


def test_entry_smoke(ray_session):
    out = to_pandas(entrymod.entry())
    assert len(out) > 0
    assert {'url', 'depth', 'visit_order'} <= set(out.columns)
