"""Driver-contract mirror: run every queries() entry against its
oracle_sql() in DuckDB on the same parquet (sf0.01), compare row count,
column names, and order-insensitive values — the same gate the driver
applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return round(val, 6)
    if isinstance(val, list):
        return tuple(_normalize(v) for v in val)
    return val


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_normalize(r[i]) for i in order))
    return sorted(out)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    ores = duck.execute(ORACLES[name])
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    assert sorted(scols) == sorted(ocols), (scols, ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    s_set = _rows_to_set(scols, [[r[c] for c in scols] for r in srows])
    o_set = _rows_to_set(ocols, orows)
    mismatch = [(a, b) for a, b in zip(s_set, o_set) if a != b]
    assert not mismatch, f"{name}: first mismatches {mismatch[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert len(sdf.columns) > 0
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
