"""Emulates the driver's correctness gate: every ``queries()`` entry with an
``oracle_sql()`` twin must match DuckDB on row count, column names, and
order-insensitive values (sf0.001 here; driver uses sf0.01)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in entrymod.TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            # Spark toPandas yields ns-resolution, DuckDB us-resolution:
            # same instants, different epoch units — compare as ISO strings
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = pd.to_numeric(df[c], errors="ignore")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"p_value", "n_triples"}


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    spark_df = q(spark, SF_DIR).toPandas()
    duck_df = _duck(entrymod.oracle_sql()[name])
    a, b = _canon(spark_df), _canon(duck_df)
    assert list(a.columns) == list(b.columns), (list(a.columns), list(b.columns))
    assert len(a) == len(b), (len(a), len(b))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-9)
