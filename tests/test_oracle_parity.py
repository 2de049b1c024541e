"""Local replica of the driver's DuckDB-oracle comparison: every
queries() entry with an oracle_sql() twin must match on row count,
column names, and (order-insensitive) values at sf0.001.
"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(rows, cols):
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            elif isinstance(v, (bytes, bytearray)):
                v = bytes(v).hex()
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr), [cols[i] for i in order]


@pytest.mark.parametrize("name", sorted(ORACLES), ids=str)
def test_query_matches_oracle(spark, ddb, name):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    ores = ddb.execute(ORACLES[name])
    ocols = [d[0] for d in ores.description]
    orows = [tuple(r) for r in ores.fetchall()]
    assert sorted(scols) == sorted(ocols), (scols, ocols)
    s_norm, cols = _normalize(srows, scols)
    o_norm, _ = _normalize(orows, ocols)
    assert len(s_norm) == len(o_norm), (
        name, len(s_norm), len(o_norm), s_norm[:3], o_norm[:3]
    )
    mismatches = [
        (a, b) for a, b in zip(s_norm, o_norm) if a != b
    ][:5]
    assert mismatches == [], (name, cols, mismatches)


def test_every_query_runs_rows_only(spark):
    """queries() entries without an oracle still must run and return a
    stable schema (driver rows-only check)."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "score" in df.columns and "doc_key" in df.columns
