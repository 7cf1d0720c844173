"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry at sf0.001 and compare row-count,
column names, and values against ``oracle_sql()`` via DuckDB.

(The real driver runs sf0.01; sf0.001 keeps this suite fast. Set
FILIPO_ORACLE_SF=/root/testdata/sf0.01 to run the full scale.)
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("FILIPO_ORACLE_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        return round(v, 6) if not math.isnan(v) else "nan"
    return v


def _rows(rows):
    return sorted(tuple(_norm(x) for x in r) for r in rows)


QUERIES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, oracle_con, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    got_df = fn(spark, SF_DIR)
    got_cols = got_df.columns
    got = _rows([tuple(r) for r in got_df.collect()])
    if sql is None:
        assert len(got) >= 0  # rows-only check, mirrors driver behavior
        return
    res = oracle_con.sql(sql)
    assert [c.lower() for c in got_cols] == [c.lower() for c in res.columns], (
        f"{name}: column mismatch {got_cols} vs {res.columns}"
    )
    want = _rows(res.fetchall())
    assert len(got) == len(want), f"{name}: rowcount {len(got)} vs {len(want)}"
    assert got == want, f"{name}: value mismatch"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
