"""Driver-mirror: every queries() entry must match its oracle_sql() in
DuckDB — row count, column names, and order-insensitive values.

This is exactly the check the driver runs at sf0.01 (CORRECTNESS_r{N});
running it in CI at sf0.001/sf0.01 means the gate can never surprise us.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

# default to sf0.01: the EXACT scale the driver's correctness gate runs at
# (fixture-backed oracles are generated for this sf — see fixture_oracles)
SF_DIR = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.01")
os.environ.setdefault("SPARK_GRAFT_TESTDATA", SF_DIR)

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    con = _duck(SF_DIR)
    odf = con.sql(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(odf.columns)}"
    )
    a, b = _normalize(sdf), _normalize(odf)
    assert len(a) == len(b), f"{name}: row count {len(a)} != {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_entries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_flagship(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert {"query_id", "rank", "doc_id", "score", "repo", "path", "content_sha256"} <= set(
        out.columns
    )
