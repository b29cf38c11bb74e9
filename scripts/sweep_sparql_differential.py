"""Offline large-seed sweep of the randomized SPARQL differential tester.

Runs the same generator + dual-evaluation harness as
``tests/test_sparql_differential.py`` over a wide seed range and reports
any mismatching seed (which should then be added to the pytest suite as a
regression). Usage:

    python scripts/sweep_sparql_differential.py 60 1000        # select form
    python scripts/sweep_sparql_differential.py 1020 1600 agg  # aggregate form
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from phenoscape_owl_tools_spark.session import get_spark  # noqa: E402

import test_sparql_differential as diff  # noqa: E402


def main() -> int:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    kind = sys.argv[3] if len(sys.argv) > 3 else "select"
    spark = get_spark("diff-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    bad: list[int] = []
    raised = compared = 0
    t0 = time.time()
    for seed in range(lo, hi):
        try:
            out = diff._run_both(spark, seed, kind=kind)
            if out == "raised":
                raised += 1
            else:
                compared += 1
        except AssertionError as e:
            bad.append(seed)
            print(f"\n=== MISMATCH seed {seed} ===\n{e}\n", flush=True)
        if (seed - lo + 1) % 50 == 0:
            dt = time.time() - t0
            print(f"[{seed - lo + 1}/{hi - lo}] compared={compared} "
                  f"raised={raised} bad={len(bad)} ({dt:.0f}s)", flush=True)
    print(f"DONE kind={kind} seeds=[{lo},{hi}) compared={compared} "
          f"raised={raised} mismatches={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
