"""Local pre-validation of the driver's correctness gate: run every
registry query AND its DuckDB oracle side-by-side at sf0.01, compare rows,
schema (sorted column names), and values (floats to 1e-9).

Usage: PYTHONPATH=/root/repo python scripts/check_correctness.py [sf_dir]
Prints one line per key and a final summary; exit code 1 on any mismatch.
"""

from __future__ import annotations

import glob
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np

import __spark_entry__ as entry
from phenoscape_owl_tools_spark.session import get_spark


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="check-correctness")
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        t = Path(p).stem
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    queries, oracles = entry.queries(), entry.oracle_sql()
    bad = []
    for key, fn in queries.items():
        try:
            sdf = fn(spark, sf).toPandas()
            sql = oracles.get(key)
            if sql is None:
                print(f"{key:28s} rows={len(sdf)} (rows-only, no oracle)")
                continue
            odf = con.execute(sql).df()
            a, b = norm(sdf), norm(odf)
            ok = len(a) == len(b) and list(a.columns) == list(b.columns)
            if ok:
                for c in a.columns:
                    if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
                        ok = ok and np.allclose(
                            a[c].astype(float), b[c].astype(float),
                            atol=1e-9, equal_nan=True,
                        )
                    else:
                        ok = ok and (a[c].astype(str) == b[c].astype(str)).all()
            status = "OK" if ok else "MISMATCH"
            print(f"{key:28s} rows={len(a)}/{len(b)} {status}")
            if not ok:
                bad.append(key)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            print(f"{key:28s} ERROR {type(exc).__name__}: {exc}")
            bad.append(key)
    print(f"\n{len(queries) - len(bad)}/{len(queries)} green"
          + (f"; FAILED: {bad}" if bad else ""))
    spark.stop()
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
