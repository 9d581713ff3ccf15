"""The correctness gate, run locally: every registered query with an
oracle must hash-match DuckDB on the same parquet; oracle-less queries
must at least run and return a stable row count twice.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_utils import compare, duckdb_conn

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, con, ORACLES[name], name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_is_stable(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    n1 = df.count()
    n2 = QUERIES[name](spark, sf_dir).count()
    assert n1 == n2
    assert n1 >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
