"""Driver-contract rehearsal: run every ``queries()`` entry at sf0.01 and
compare against its ``oracle_sql()`` twin via DuckDB — row count, column
names, and order-insensitive values (the same gate the driver applies)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

# the driver gate runs at sf0.01; each round the same suite is re-run at
# sf0.1 (10x) via this override — BENCH.md "Correctness at bench scale":
#   SPARKSCHEMA_ORACLE_SF=/root/testdata/sf0.1 pytest tests/test_entry_contract.py
SF = os.environ.get("SPARKSCHEMA_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, int):
        return str(v)
    return str(v)


def _norm_rows(rows):
    return sorted(tuple(_norm_cell(c) for c in row) for row in rows)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = [c.lower() for c in sdf.columns]

    con = _duck()
    res = con.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} != {duck_cols}"
    assert len(spark_rows) == len(duck_rows), \
        f"{name}: rowcount {len(spark_rows)} != {len(duck_rows)}"
    a, b = _norm_rows(spark_rows), _norm_rows(duck_rows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: first diffs {mismatches}"


def test_rows_only_queries_run(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in set(qs) - set(oracles):
        df = qs[name](spark, SF)
        assert df.count() >= 0, name
        assert df.columns, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert set(df.columns) == {"l_orderkey", "l_linenumber", "keyword",
                               "schema_path", "instance_path", "value", "msg",
                               "errors", "resolution_scope", "referrer"}
