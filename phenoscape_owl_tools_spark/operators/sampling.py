"""Deterministic corpus sampling for training-data mixture construction.

A 100 TB pretraining corpus is never used whole: the mixture recipe says
"this many tokens of each language / source / domain". The operator here is
the exact, reproducible version of that cut: within each group, documents
are ordered by a deterministic per-document hash ("shuffled" identically on
every run and every cluster size) and taken front-to-first-overflow of a
token budget.

Scale design — the naive formulation is a single window
``sum(n_tokens) OVER (PARTITION BY grp ORDER BY rk)``, which sorts an
entire group inside one task: with 5 languages over 10^12 documents that is
a straggler by construction. Instead we do a two-level prefix sum:

1. bucket each document by the leading hex byte of its rank hash — buckets
   are *contiguous ranges of the global order*, so per-bucket sums compose;
2. per-(group, bucket) token totals (a tiny aggregate: |groups| x 256
   rows), turned into running offsets by a window over those 256-row
   partitions (dimension-scale, no skew possible);
3. broadcast-join the offsets back and run the cumulative window inside
   (group, bucket) partitions only — each 1/256th of a group, so the sort
   is bounded and parallel regardless of group skew.

The result is bit-identical to the single-window semantics (the SQL oracle
uses exactly that single window) while every shuffle partition stays
bounded. Raise ``buckets`` (any power-of-16 boundary: 16, 256, 4096 via 1,
2, 3 leading hex chars) for larger clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def quota_sample(
    documents: DataFrame,
    budget_tokens: int,
    by: str = "lang",
    text_col: str = "text",
    bucket_chars: int = 2,
) -> DataFrame:
    """Deterministic per-group token-budget sample.

    Within each ``by`` group, order documents by ``md5(doc_id)`` and keep
    every document that *starts* within ``budget_tokens`` (i.e. the
    cumulative token count of the documents before it is < budget). The
    first document to cross the budget is still included — the sample
    always reaches the budget when the group has enough tokens; runs are
    reproducible because the order is a pure function of doc_id.

    Returns ``(doc_id, <by>, n_tokens)`` for the sampled documents.

    Contract: rows with a NULL group key are dropped (the offset join is
    an inner equi-join, and SQL equality never matches NULL) — coalesce
    the group column upstream if un-grouped documents should participate.
    NULL text counts as one empty token — the same total-function contract
    as ``packing._text`` (r4 drift: NULL-text rows used to vanish here via
    NULL ``n_tokens`` while ``pack_sequences`` kept them; both halves of
    the corpus pipeline now agree on the degenerate input, and the SQL
    oracle mirrors the coalesce).
    """
    assert 1 <= bucket_chars <= 4
    t = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(by).alias("grp"),
        F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
        .cast("long")
        .alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("rk"),
    )
    # leading hex chars of rk = a contiguous range of the rk order
    t = t.withColumn("bucket", F.substring("rk", 1, bucket_chars))
    bucket_sums = t.groupBy("grp", "bucket").agg(
        F.sum("n_tokens").alias("btok")
    )
    # running offset over <= 16^bucket_chars rows per group: dimension-scale
    w_off = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.select(
        "grp",
        "bucket",
        F.coalesce(F.sum("btok").over(w_off), F.lit(0)).alias("offset"),
    )
    w_local = (
        Window.partitionBy("grp", "bucket")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = t.join(F.broadcast(offsets), ["grp", "bucket"]).withColumn(
        "tokens_before",
        F.sum("n_tokens").over(w_local) - F.col("n_tokens") + F.col("offset"),
    )
    return cum.where(F.col("tokens_before") < budget_tokens).select(
        "doc_id", F.col("grp").alias(by), "n_tokens"
    )
