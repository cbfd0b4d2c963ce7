"""Driver-harness mimic: every catalog query vs its DuckDB oracle.

Reproduces what the driver's correctness gate does (row-count + schema +
order-insensitive value compare) for each ``queries()`` / ``oracle_sql()``
pair on the same parquet, at sf0.001 by default (fast); set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the driver's scale.
"""

from __future__ import annotations

import duckdb
import pytest

from monthly_report_etl_spark.catalog import ORACLES, QUERIES
from monthly_report_etl_spark.sources.parquet import TESTDATA_TABLES
from tests.utils import assert_frames_match


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, oracle_con, name):
    actual = QUERIES[name](spark, sf_dir).toPandas()
    expected = oracle_con.execute(ORACLES[name]).fetchdf()
    assert_frames_match(actual, expected)


def test_every_query_has_an_oracle():
    """r5 invariant: the catalog carries no rows-only entries — every
    ``queries()`` name has an ``oracle_sql()`` twin (the former
    engine-hash sketches were made portable or restructured as
    exact-value + within-bounds rows)."""
    assert set(QUERIES) == set(ORACLES)
