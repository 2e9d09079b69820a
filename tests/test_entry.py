"""Driver-contract smoke: entry() runs, every queries() entry returns a
DataFrame at sf0.001, oracle_sql() keys are a subset of queries()."""

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["term", "n_docs", "n_mentions"]


def test_oracle_keys_subset():
    assert set(E.oracle_sql()) <= set(E.queries())


def test_oracle_sql_parses_in_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    for name, sql in E.oracle_sql().items():
        con.sql(sql).df()  # raises on dialect errors


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_query_runs_at_sf0001(spark, name):
    if name == "q_kg_triples":
        pytest.skip("full pipeline covered by test_pipeline.py")
    df = E.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
