"""Deterministically scale the driver testdata to a larger SF (BENCH §9).

Replicates every non-dimension table ``factor``x with CONSISTENT key
offsets (replica r shifts every int64 join key by ``r * STRIDE``), so all
TPC-H joins stay intact within each replica; ``region``/``nation`` stay
fixed (dimensions). Text gets a per-replica suffix token and embeddings a
per-replica epsilon on one component so dedup/ANN queries see realistic
near-duplicates instead of 10x exact clones. No RNG anywhere — output is a
pure function of the input tables and ``factor``.

Usage:
    PYTHONPATH=/root/repo python scripts/make_sf.py \
        /root/testdata/sf0.1 /root/repo/.scratch/sf1 10
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F

from phenoscape_owl_tools_spark.session import get_spark

STRIDE = 100_000_000

# per-table int64 key columns that must shift together across replicas
KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
DIMENSIONS = ["region", "nation"]


def replicate(df: DataFrame, table: str, factor: int) -> DataFrame:
    spark = df.sparkSession
    # The stride must clear the input's OWN key range: chaining runs
    # (sf0.1 -> sf1 -> sf10) used to reuse the fixed base stride, so the
    # second layer's shifted keys collided with the first's (r5 bug —
    # sf10 doc_ids overlapped and near-dup/join results were garbage).
    stride = STRIDE
    keys = KEY_COLS.get(table, [])
    if keys:
        aggs = [F.max(k) for k in keys]
        mcol = aggs[0] if len(aggs) == 1 else F.greatest(*aggs)
        mx = df.select(mcol.alias("m")).collect()[0]["m"]
        while mx is not None and stride <= mx:
            stride *= 10
    reps = spark.range(factor).withColumnRenamed("id", "__rep").repartition(factor)
    out = reps.crossJoin(F.broadcast(df))
    for k in keys:
        out = out.withColumn(k, F.col(k) + F.col("__rep") * stride)
    if table == "documents":
        out = out.withColumn(
            "text",
            F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" rep"), F.col("__rep"))
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings":
        # nudge one component per replica: near-duplicates, not clones
        out = out.withColumn(
            "embedding",
            F.concat(
                F.array((F.element_at("embedding", 1)
                         + F.col("__rep").cast("float") * F.lit(0.001)).cast("float")),
                F.slice("embedding", 2, 10_000),
            ),
        )
    return out.drop("__rep")


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make-sf")
    Path(dst).mkdir(parents=True, exist_ok=True)
    for p in sorted(Path(src).glob("*.parquet")):
        table = p.stem
        df = spark.read.parquet(str(p))
        if table in DIMENSIONS or factor == 1:
            df.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
            n = df.count()
        else:
            out = replicate(df, table, factor)
            out.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
            n = spark.read.parquet(f"{dst}/{table}.parquet").count()
        print(f"{table}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
