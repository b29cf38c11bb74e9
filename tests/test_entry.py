"""Self-check of the driver contract: every queries() entry vs its
oracle_sql() DuckDB result at sf0.01 — row count, schema-insensitive sorted
column comparison, exact values (floats pre-rounded on both sides)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _canon(df_rows, columns):
    """Order-insensitive canonical form: rows as tuples of canonical strings,
    columns sorted by name."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in df_rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.9g}")
            elif v is None:
                vals.append("")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_vs_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        assert len(spark_rows) >= 0  # rows-only contract
        assert len(spark_rows) > 0, f"{name}: rows-only query returned empty"
        return

    res = ddb.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:5]
        diff_b = [r for r in b if r not in set(a)][:5]
        raise AssertionError(f"{name}: value mismatch\nspark-only: {diff_a}\nduck-only: {diff_b}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["subj", "pred", "obj"]
