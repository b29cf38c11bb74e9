"""Semantic deduplication (SemDeDup-style): cluster the embedding space,
then drop near-duplicate documents *within* each cluster.

The scale argument (Abbas et al. 2023, "SemDeDup"): exact cosine
near-dup over 10^12 embeddings is O(n^2); clustering first restricts the
quadratic work to within-cluster blocks, an O(n^2 / k) reduction that is
exact whenever near-duplicates land in the same cluster (by construction
they do for tight thresholds — near-identical vectors share a nearest
centroid except at cell boundaries, the documented approximation of every
clustered-dedup scheme).

Determinism contract (everything here must be reproducible across runs
and cluster sizes, and expressible in ANSI SQL for the oracle):

- centroids are the unit vectors of the ``k`` smallest ``vec_id`` rows —
  a fixed, content-derived choice (no RNG, no iterative refinement; the
  IVF path in ``operators/annsearch.py`` has the deterministic k-means
  when better centroids are worth a training pass);
- assignment is argmax of round(cosine, 6) with ties to the smallest
  cluster index;
- a document is dropped iff some smaller-id document in the same cluster
  has cosine >= threshold with it (the sorted-greedy keep rule used by
  the exact dedup family in ``operators/dedup.py``).

Execution shape:

- assignment is MAP-ONLY: the k centroid unit vectors are collected to
  the driver (k x dim doubles — dimension-scale, guarded) and scored
  against each Arrow batch with one numpy GEMM in ``mapInPandas`` — no
  shuffle, no per-row Python (see :func:`assign_clusters` for why the
  pure-column-expression alternative is the slow path, not the fast one);
- within-cluster pairs reuse the exact tiled-GEMM shape of
  ``dedup.embedding_near_dups_gemm`` with ``(cluster, block)`` as the
  packing key: B(B+1)/2 tiles per cluster, each scored by one numpy GEMM
  in ``mapInPandas``; no CartesianProduct in the plan, per-task memory =
  2 blocks, tiles are independent tasks. Pick ``n_blocks`` so a cluster
  block fits executor memory.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import unit_vector_col

MAX_CENTROIDS = 4096  # driver-collect guard: centroids are dimension-scale


def _id_type(embeddings: DataFrame) -> str:
    """The vec_id column's Spark type string — schemas below reuse it so
    string/long/int document ids all round-trip unchanged (the corpus
    pipeline joins embeddings to documents on STRING ids)."""
    return embeddings.schema["vec_id"].dataType.simpleString()


def centroid_units(embeddings: DataFrame, k: int) -> list[tuple[int, list[float]]]:
    """The k smallest-vec_id embeddings as (cluster_index, unit_vector).

    Unit vectors are computed JVM-side with the same sequential fold the
    pairwise path and the SQL oracle use, then collected — the driver
    never does float math on them.
    """
    assert 0 < k <= MAX_CENTROIDS
    rows = (
        embeddings.select(
            "vec_id", unit_vector_col(F.col("embedding")).alias("u")
        )
        .orderBy("vec_id")
        .limit(k)
        .collect()
    )
    return [(i, list(r["u"])) for i, r in enumerate(rows)]


def trained_centroids(
    embeddings: DataFrame, k: int, n_iters: int = 5
) -> list[tuple[int, list[float]]]:
    """Balanced centroids via the IVF deterministic k-means (Lloyd rounds
    with content-derived init, `annsearch.ivf_fit`).

    The fixed smallest-k-ids centroids are the ORACLE-expressible default,
    but they inherit whatever the first k vectors happen to be: measured
    at 100k vectors / k=64 they left one mega-cluster of 4,984 members
    against a median of 27 (BENCH §19) — the classic SemDeDup failure
    mode, since within-cluster work is O(size^2). A few Lloyd rounds
    rebalance the cells; still fully deterministic, so dedup decisions
    remain reproducible run-to-run — just not restatable in ANSI SQL
    (train with pytest-verified exactness instead of a DuckDB oracle).
    """
    from .annsearch import ivf_fit

    assert 0 < k <= MAX_CENTROIDS  # same driver-collect guard as the fixed path
    cent = ivf_fit(embeddings, n_cells=k, n_iters=n_iters)
    return [(j, cent[j].tolist()) for j in range(len(cent))]


def assign_clusters(
    embeddings: DataFrame, k: int = 8, centroids: list | None = None
) -> DataFrame:
    """(vec_id, cluster, u): nearest-centroid assignment, map-only.

    ``cluster`` = argmax_j round(cos(u, c_j), 6), ties to the smallest j
    (``np.argmax`` returns the first maximal index). Unit vectors are
    computed JVM-side (one fold per row); the n x k score matrix comes
    from ONE numpy GEMM per Arrow batch in ``mapInPandas`` — no shuffle,
    no per-row Python, nothing grows with k but the GEMM width.

    Measured lesson (BENCH §17): the "pure column math" alternative — k
    unrolled ``aggregate``/``zip_with`` fold expressions + a
    greatest/when argmax — is NOT codegen; higher-order functions are
    interpreted per element, so k=64 centroids cost ~4096 interpreted
    lambda steps per row and assignment alone ran 9x slower than the
    whole exact all-pairs GEMM at 100k rows. Same float contract as the
    IVF assigner (`annsearch.py`): float64 GEMM, round-6, smallest-index
    ties — driver-oracle-verified against the sequential-fold SQL at
    both SFs.
    """
    import numpy as np
    import pandas as pd

    cents = centroids if centroids is not None else centroid_units(embeddings, k)
    cmat = np.array([cu for _, cu in cents], dtype=np.float64)  # k x dim
    base = embeddings.select(
        "vec_id", unit_vector_col(F.col("embedding")).alias("u")
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf["u"]), dtype=np.float64)
            sims = np.round(mat @ cmat.T, 6)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": np.argmax(sims, axis=1).astype(np.int32),
                    "u": pdf["u"],
                }
            )

    return base.mapInPandas(
        assign, f"vec_id {_id_type(embeddings)}, cluster int, u array<double>"
    )


def semantic_near_dups(
    embeddings: DataFrame,
    k: int = 8,
    threshold: float = 0.4,
    n_blocks: int = 8,
    centroids: list | None = None,
) -> DataFrame:
    """(cluster, id_a, id_b, cos): within-cluster pairs with cosine >=
    threshold, id_a < id_b, cos in float64 rounded to 6.

    Tiled exactly like ``dedup.embedding_near_dups_gemm`` (see there for
    why exact tiles beat LSH at near-noise thresholds) but packed by
    ``(cluster, block)`` so the quadratic work is per-cluster. The
    machinery is deliberately NOT shared with the X5 implementation: X5
    normalizes inside numpy from raw embeddings while this path consumes
    the JVM-fold unit vectors the assignment already computed — merging
    them would silently change X5's float contract under its oracle. The
    k=1 degeneration test pins the two paths to identical pairs instead.

    Pass ``centroids=trained_centroids(...)`` to swap the fixed smallest-k
    seed for the k-means codebook when cluster balance matters (see
    :func:`trained_centroids`).
    """
    return _within_cluster_pairs(
        assign_clusters(embeddings, k, centroids), threshold, n_blocks
    )


def _within_cluster_pairs(
    assigned: DataFrame, threshold: float, n_blocks: int
) -> DataFrame:
    import numpy as np
    import pandas as pd

    spark = assigned.sparkSession
    id_t = assigned.schema["vec_id"].dataType.simpleString()
    packed = (
        assigned.withColumn(
            "blk", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_blocks))
        )
        .groupBy("cluster", "blk")
        .agg(F.collect_list(F.struct("vec_id", "u")).alias("vecs"))
    )
    tiles = spark.createDataFrame(
        [(a, b) for a in range(n_blocks) for b in range(n_blocks) if a <= b],
        "ba int, bb int",
    )
    a_side = packed.select(
        "cluster", F.col("blk").alias("ba"), F.col("vecs").alias("vecs_a")
    )
    b_side = packed.select(
        "cluster", F.col("blk").alias("bb"), F.col("vecs").alias("vecs_b")
    )
    tiled = (
        F.broadcast(tiles)
        .join(a_side, "ba")
        .join(b_side, ["cluster", "bb"])
        .select("cluster", "ba", "bb", "vecs_a", "vecs_b")
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                # no forced int64: ids keep their Spark type; string ids
                # must be OBJECT arrays (np.minimum has loops for numeric
                # and object dtypes, not for '<U' unicode)
                def _ids(vs):
                    arr = np.array([v["vec_id"] for v in vs])
                    return arr.astype(object) if arr.dtype.kind in "US" else arr

                ids_a = _ids(row["vecs_a"])
                m_a = np.array([v["u"] for v in row["vecs_a"]], dtype=np.float64)
                if row["ba"] == row["bb"]:
                    ids_b, m_b = ids_a, m_a
                else:
                    ids_b = _ids(row["vecs_b"])
                    m_b = np.array([v["u"] for v in row["vecs_b"]], dtype=np.float64)
                sims = np.round(m_a @ m_b.T, 6)
                hits = sims >= threshold
                if row["ba"] == row["bb"]:
                    # diagonal tile: emit the strict upper triangle only —
                    # (i,j)/(j,i) canonicalize to the same pair (dedup.py
                    # lesson: compare MULTISETS in tests, sets hide doubles)
                    hits = np.triu(hits, k=1)
                ia, ib = np.where(hits)
                lo = np.minimum(ids_a[ia], ids_b[ib])
                hi = np.maximum(ids_a[ia], ids_b[ib])
                keep = lo < hi
                yield pd.DataFrame(
                    {
                        "cluster": np.full(int(keep.sum()), row["cluster"]),
                        "id_a": lo[keep],
                        "id_b": hi[keep],
                        "cos": sims[ia, ib][keep],
                    }
                )

    return tiled.mapInPandas(
        score, f"cluster int, id_a {id_t}, id_b {id_t}, cos double"
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    threshold: float = 0.4,
    n_blocks: int = 8,
    centroids: list | None = None,
    mode: str = "cascade",
) -> DataFrame:
    """(vec_id, cluster, kept): the SemDeDup keep/drop decision per vector.

    ``mode="cascade"`` (default, the oracle-paired registry semantics):
    ``kept = false`` iff ANY smaller-id vector in the same cluster is
    within the cosine threshold — one left-anti-shaped flag join against
    the distinct dropped ids; the pair table is the only quadratic
    artifact and it never leaves the executors unfiltered. NOTE this is
    deliberately STRICTER than Abbas et al. (SemDeDup, 2023), whose rule
    keeps one representative per duplicate group: cosine near-dup is not
    transitive, so in a chain a~b~c (c near b but not near a) cascade
    drops BOTH b and c even though c is not near any kept document. The
    cascade rule is a pure join (no sequential dependence), which is why
    it is the scale default.

    ``mode="kept_set"`` implements the paper's keep-against-kept-set
    greedy exactly: ids are scanned ascending per cluster and a vector is
    dropped only if a KEPT smaller-id neighbor is within threshold (in
    a~b~c, b drops and c survives). The sequential dependence is confined
    to one ``applyInPandas`` over the per-cluster NEAR-DUP PAIR list —
    memory is O(pairs in cluster), not O(cluster²), and only ids that
    appear in some pair are shuffled; pair generation stays the tiled
    GEMM. kept_set never drops more than cascade (asserted in tests).

    The assignment frame feeds both the pair tiling and the final flag
    join; it is materialized ONCE (plans have no subtree reuse — without
    this the scan + unit-fold + GEMM lineage executes twice).
    """
    if mode not in ("cascade", "kept_set"):
        raise ValueError(f"mode must be 'cascade' or 'kept_set', got {mode!r}")
    assigned = assign_clusters(embeddings, k, centroids).localCheckpoint(eager=True)
    pairs = _within_cluster_pairs(assigned, threshold, n_blocks)
    if mode == "cascade":
        dropped = (
            pairs.select(F.col("id_b").alias("vec_id"))
            .dropDuplicates()
            .withColumn("_drop", F.lit(True))
        )
    else:
        dropped = _kept_set_dropped(pairs)
    return assigned.join(dropped, "vec_id", "left").select(
        "vec_id",
        "cluster",
        F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"),
    )


def _kept_set_dropped(pairs: DataFrame) -> DataFrame:
    """Sequential greedy per cluster over the near-dup pair list: scanning
    ids ascending, an id is dropped iff some KEPT smaller neighbor exists.
    Ids in no pair never enter this function (trivially kept upstream)."""
    import pandas as pd

    id_t = pairs.schema["id_a"].dataType.simpleString()

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        smaller: dict = {}
        for a, b in zip(pdf["id_a"], pdf["id_b"]):
            smaller.setdefault(b, []).append(a)
        kept: set = set()
        out = []
        for i in sorted(set(pdf["id_a"]) | set(pdf["id_b"])):
            if any(n in kept for n in smaller.get(i, ())):
                out.append(i)
            else:
                kept.add(i)
        return pd.DataFrame({"vec_id": out, "_drop": True})

    return (
        pairs.select("cluster", "id_a", "id_b")
        .groupBy("cluster")
        .applyInPandas(greedy, f"vec_id {id_t}, _drop boolean")
    )
