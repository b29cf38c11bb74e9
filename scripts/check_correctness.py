"""Local pre-validation of the driver's correctness gate: run every
registry query AND its DuckDB oracle side-by-side at sf0.01, compare rows,
schema (sorted column names), and values (floats to 1e-9).

Usage: PYTHONPATH=/root/repo python scripts/check_correctness.py [sf_dir]
Prints one line per key and a final summary; exit code 1 on any mismatch.
"""

from __future__ import annotations

import glob
import sys
import time
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args else "/root/testdata/sf0.01"
    keys_filter = None
    json_out = None
    for i, a in enumerate(sys.argv):
        if a == "--keys":
            keys_filter = set(sys.argv[i + 1].split(","))
        if a == "--json":
            json_out = sys.argv[i + 1]
    # maxResultSize: the sweep collects full result frames for hashing;
    # sf10-scale keys (property_chains = 19.9M rows) blow the 1g default
    spark = get_spark(
        app_name="check-correctness",
        extra_conf={"spark.driver.maxResultSize": "16g"},
    )
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        t = Path(p).stem
        # make_sf.py writes Spark parquet DIRECTORIES; driver testdata are files
        src = f"{p}/*.parquet" if Path(p).is_dir() else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    queries, oracles = entry.queries(), entry.oracle_sql()
    if keys_filter is not None:
        missing = keys_filter - set(queries)
        if missing:
            raise SystemExit(f"unknown keys: {sorted(missing)}")
        queries = {k: v for k, v in queries.items() if k in keys_filter}
    bad = []
    report: dict[str, dict] = {}
    for key, fn in queries.items():
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf).toPandas()
            sql = oracles.get(key)
            if sql is None:
                print(f"{key:28s} rows={len(sdf)} (rows-only, no oracle)")
                report[key] = {"rows": len(sdf), "oracle": None,
                               "sec": round(time.perf_counter() - t0, 1)}
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
            report[key] = {
                "spark_rows": len(a), "oracle_rows": len(b), "match": bool(ok),
                "sec": round(time.perf_counter() - t0, 1),
            }
            if not ok:
                bad.append(key)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            print(f"{key:28s} ERROR {type(exc).__name__}: {exc}")
            report[key] = {"error": f"{type(exc).__name__}: {exc}"}
            bad.append(key)
    print(f"\n{len(queries) - len(bad)}/{len(queries)} green"
          + (f"; FAILED: {bad}" if bad else ""))
    if json_out:
        import json as _json

        Path(json_out).write_text(_json.dumps(
            {"sf_dir": sf, "checked": len(queries), "failed": bad,
             "results": report}, indent=1))
        print(f"wrote {json_out}")
    spark.stop()
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
