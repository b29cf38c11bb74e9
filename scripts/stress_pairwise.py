"""Scale stress for J9 blocked-MICA pairwise similarity (BENCH §8).

Acceptance bar (VERDICT r2 item 1): >=10^4 query x 10^4 corpus profiles over
a deep closure, end-to-end pairwise_scores, with NO straggler task — max
candidate-stream partition <= 4x median. The synthetic ontology reproduces
the hub pathology exactly: every annotation sits under the root and one of 8
hub classes, so a naive shared-ancestor equi-join puts the full
|query-annotations| x |corpus-profiles| product on the root's partition.

Shapes (deterministic, no RNG):
  ontology   root -> 8 hubs -> 50 mids each -> depth-20 chains (8,409 classes,
             leaf ancestor sets of size 23 — "deep closure")
  profiles   N_Q gene profiles x QA annotations, N_C taxon profiles x 1-4
             annotations, leaves assigned by multiplicative hashing

Usage: PYTHONPATH=/root/repo python scripts/stress_pairwise.py [n_q n_c qa hub_bits]
Prints one JSON line with wall times and the partition histograms.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from phenoscape_owl_tools_spark.operators import closure as closure_op
from phenoscape_owl_tools_spark.operators import similarity
from phenoscape_owl_tools_spark.session import get_spark

N_HUBS = 8
MIDS_PER_HUB = 50
CHAIN = 20  # specialization chain below each mid; leaf = last link
N_LEAVES = N_HUBS * MIDS_PER_HUB  # one chain (hence one leaf) per mid


def build_edges(spark):
    rows = [(f"hub{h}", "root") for h in range(N_HUBS)]
    for h in range(N_HUBS):
        for m in range(MIDS_PER_HUB):
            mid = f"mid_{h}_{m}"
            rows.append((mid, f"hub{h}"))
            prev = mid
            for k in range(CHAIN):
                node = f"c_{h}_{m}_{k}" if k < CHAIN - 1 else f"leaf_{h * MIDS_PER_HUB + m}"
                rows.append((node, prev))
                prev = node
    return spark.createDataFrame(rows, ["sub", "sup"])


def build_profiles(spark, prefix: str, n: int, qa: int):
    """n profiles x qa annotations over the leaves, multiplicative-hash
    assignment (deterministic, uniform, generated distributed)."""
    return (
        spark.range(n)
        .select(
            F.concat(F.lit(prefix), F.format_string("%06d", F.col("id"))).alias(
                "individual"
            ),
            F.explode(F.sequence(F.lit(0), F.lit(qa - 1))).alias("j"),
            F.col("id"),
        )
        .select(
            "individual",
            F.concat(
                F.lit("leaf_"),
                ((F.col("id") * 2654435761 + F.col("j") * 40503) % N_LEAVES).cast(
                    "string"
                ),
            ).alias("phenotype"),
        )
        .dropDuplicates()
    )


def partition_histogram(df) -> dict:
    counts = sorted(
        r["count"]
        for r in df.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    )
    med = counts[len(counts) // 2] if counts else 0
    return {
        "n_partitions": len(counts),
        "median": med,
        "max": counts[-1] if counts else 0,
        "max_over_median": (counts[-1] / med) if med else None,
    }


def main() -> None:
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_c = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    qa = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    hub_bits = int(sys.argv[4]) if len(sys.argv) > 4 else 48

    spark = get_spark(app_name="stress-pairwise")
    spark.sparkContext.setLogLevel("WARN")

    edges = build_edges(spark)
    cl = closure_op.transitive_closure(edges)
    q = build_profiles(spark, "GENE_", n_q, qa).localCheckpoint(eager=True)
    c = build_profiles(spark, "TAXON_", n_c, qa).localCheckpoint(eager=True)

    ind = similarity.indirect_associations(q.unionByName(c), cl)
    ic = similarity.information_content(
        ind, c.select("individual").dropDuplicates(), cl
    ).localCheckpoint(eager=True)

    out = {
        "n_q": n_q,
        "n_c": n_c,
        "qa": qa,
        "hub_bits": hub_bits,
        "closure_rows": cl.count(),
        "parallelism": spark.sparkContext.defaultParallelism,
    }

    if "--phase2" not in sys.argv:  # phase2 times the pair table itself
        t0 = time.monotonic()
        n_pair_rows = similarity.pairwise_scores(
            q, c, cl, ic, hub_bits=hub_bits
        ).count()
        wall = time.monotonic() - t0

        # candidate-stream histogram: the rare equi-join (the skew risk)
        q_anc, c_anc = similarity._annotation_ancestors(q, c, cl)
        qi, ci, ranked, *_ = similarity._encoded_inputs(q_anc, c_anc, ic)
        hubs = similarity.hub_ancestors(ic, hub_bits)
        rare_hist = partition_histogram(
            similarity._rare_candidates(qi, ci, similarity._hub_rids(ranked, hubs))
        )
        out["pairwise_rows"] = n_pair_rows
        out["wall_sec"] = round(wall, 1)
        out["pair_rows_per_sec"] = round(n_pair_rows / wall)
        out["rare_join_hist"] = rare_hist

    if "--jaccard" in sys.argv:
        t0 = time.monotonic()
        n_jac = similarity.jaccard_similarity(q, c, cl, hub_bits=min(hub_bits, 62) or 62).count()
        jw = time.monotonic() - t0
        out["jaccard_pairs"] = n_jac
        out["jaccard_wall_sec"] = round(jw, 1)
        out["jaccard_pairs_per_sec"] = round(n_jac / jw)

    if "--phase2" in sys.argv:
        # The reference's FULL phase 2 (OWLsim.scala:108-139 + regression.py):
        # materialized pair-annotation score table -> exact median per pair ->
        # top-20 subsumers per pair -> OLS expect regression -> score triples,
        # composed end-to-end at stress scale. The pair table is materialized
        # ONCE (the reference writes it and reads it back) so median and
        # top-20 don't recompute the MICA join.
        from phenoscape_owl_tools_spark.operators import regression

        import shutil
        import tempfile

        par = spark.sparkContext.defaultParallelism
        # Materialize to PARQUET, not localCheckpoint: the pair table is
        # ~4x10^8 rows of string IRIs — caching it in executor storage
        # memory OOMs a single 128 GiB node (measured), while the columnar
        # dictionary-encoded file is a few GB and every downstream stage
        # scans it in parallel. This is also what the reference does:
        # OWLsim WRITES the score table and phase 2 reads it back.
        pas_dir = tempfile.mkdtemp(prefix="phase2_pas_")
        t0 = time.monotonic()
        similarity.pairwise_scores(q, c, cl, ic, hub_bits=hub_bits).write.mode(
            "overwrite"
        ).parquet(pas_dir)
        pas = spark.read.parquet(pas_dir)
        t_pas = time.monotonic() - t0

        # the window/agg stages hash-partition on the pair key — histogram
        # of that placement is the straggler evidence for BOTH the median
        # groupBy and the top-20 row_number window (same Exchange)
        window_hist = partition_histogram(pas.repartition(par, "query", "corpus"))

        t0 = time.monotonic()
        med_dir = tempfile.mkdtemp(prefix="phase2_med_")
        similarity.groupwise_median(pas).write.mode("overwrite").parquet(med_dir)
        med = spark.read.parquet(med_dir)
        t_med = time.monotonic() - t0

        t0 = time.monotonic()
        n_top = similarity.top_subsumers(pas, k=20).count()
        t_top = time.monotonic() - t0

        t0 = time.monotonic()
        q_sizes = q.groupBy("individual").agg(
            F.countDistinct("phenotype").alias("query_size")
        )
        c_sizes = c.groupBy("individual").agg(
            F.countDistinct("phenotype").alias("corpus_size")
        )
        scored = (
            med.join(q_sizes, med["query"] == q_sizes["individual"])
            .drop("individual")
            .join(c_sizes, med["corpus"] == c_sizes["individual"])
            .drop("individual")
        )
        n_expect = regression.expect_scores(scored).count()
        t_exp = time.monotonic() - t0

        t0 = time.monotonic()
        # agg over the columns forces the sha2/concat projection to actually
        # evaluate — a bare count() lets Catalyst prune the expressions away
        tri = similarity.score_triples(med)
        row = tri.agg(
            F.count(F.lit(1)).alias("n"), F.max(F.length("subj")).alias("_force")
        ).first()
        n_triples = row["n"]
        t_tri = time.monotonic() - t0

        out["phase2"] = {
            "pair_table_rows": pas.count(),
            "pairwise_sec": round(t_pas, 1),
            "median_rows": med.count(),
            "median_sec": round(t_med, 1),
            "top20_rows": n_top,
            "top20_sec": round(t_top, 1),
            "expect_rows": n_expect,
            "expect_sec": round(t_exp, 1),
            "score_triples": n_triples,
            "score_triples_sec": round(t_tri, 1),
            "total_sec": round(t_pas + t_med + t_top + t_exp + t_tri, 1),
            "window_stage_hist": window_hist,
        }
        shutil.rmtree(pas_dir, ignore_errors=True)
        shutil.rmtree(med_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
