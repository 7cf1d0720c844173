from __future__ import annotations

import duckdb
import pytest

from filipo_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("filipo-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    yield con
    con.close()


def df_rows(df):
    """Canonical sorted list-of-tuples of a Spark DataFrame."""
    return sorted(tuple(r) for r in df.collect())


def ddb_rows(con, sql):
    return sorted(tuple(r) for r in con.sql(sql).fetchall())
