"""Training-sequence assembly: concat-and-chunk sequence packing, overlapping
document chunking, and temperature-scaled mixture weights.

These are the operators that turn a filtered/deduplicated corpus into model
input: documents are concatenated in a deterministic pseudo-random order and
cut into fixed-length training sequences (the GPT/Llama "pack then chunk"
recipe), long documents are split into overlapping context windows (RAG /
long-doc training), and per-source sampling weights are derived from token
counts with a temperature exponent (multilingual mixture balancing a la
mBERT/XLM-R exponentiated smoothing).

Scale design:

- ``pack_sequences`` needs a GLOBAL token prefix sum over 10^12 documents.
  A single ``sum() OVER (ORDER BY rk)`` window is one giant sort task; we
  reuse the two-level prefix-sum shape of ``sampling.quota_sample``
  (bucket by leading hex of the order key -> per-bucket totals ->
  dimension-scale running offsets -> bounded per-bucket local cumsum), so
  every sort partition is ~1/16^chars of the corpus regardless of size.
  The result is bit-identical to the single-window semantics (the SQL
  oracle uses exactly that single window).
- ``chunk_documents`` and ``mixture_weights`` are map-only / tiny-agg:
  whole-stage-codegen column expressions, no Python, no skew surface.

Reference anchor: the reference pipeline stops at triple/report sinks
(no training-data assembly exists there); these extend SURVEY.md §2.9's
LLM-pipeline family (X-series) on the same ``documents`` table contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _text(text_col: str) -> F.Column:
    """NULL text reads as the empty string (one empty token) so packed
    streams, chunk fingerprints and mixture sums are total functions of
    the corpus — mirrored by coalesce(text, '') in every SQL oracle."""
    return F.coalesce(F.col(text_col), F.lit(""))


def _token_count(text_col: str) -> F.Column:
    """Whitespace token count — the corpus-wide convention (see
    sampling.quota_sample / textstats): ``size(split(text, ' '))``."""
    return F.size(F.split(_text(text_col), " ")).cast("long")


def pack_sequences(
    documents: DataFrame,
    seq_len: int,
    text_col: str = "text",
    bucket_chars: int = 2,
) -> DataFrame:
    """Assign every document its position in the packed token stream.

    Documents are ordered by ``md5(doc_id)`` (a deterministic global
    shuffle — identical on every run and cluster size), concatenated, and
    cut into back-to-back sequences of ``seq_len`` tokens. Each document
    occupies the half-open token interval ``[start_tok, start_tok +
    n_tokens)`` of the stream and therefore lands in training sequences
    ``seq_first .. seq_last`` (documents crossing a boundary are split
    across sequences — the standard causal-LM packing contract).

    Returns ``(doc_id, n_tokens, start_tok, seq_first, seq_last,
    offset_in_seq)`` — one row per document, a pure function of the corpus
    content, so downstream shards can be rebuilt from any subset of
    partitions.

    The global prefix sum is the two-level form (see module docstring);
    raise ``bucket_chars`` for larger clusters (16^chars sort groups).
    """
    assert seq_len > 0 and 1 <= bucket_chars <= 4
    t = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        _token_count(text_col).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("rk"),
    )
    t = t.withColumn("bucket", F.substring("rk", 1, bucket_chars))
    bucket_sums = t.groupBy("bucket").agg(F.sum("n_tokens").alias("btok"))
    # running offsets over <= 16^bucket_chars rows: dimension-scale window
    w_off = (
        Window.partitionBy(F.lit(0))
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.select(
        "bucket",
        F.coalesce(F.sum("btok").over(w_off), F.lit(0)).alias("offset"),
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = t.join(F.broadcast(offsets), "bucket").withColumn(
        "start_tok",
        F.sum("n_tokens").over(w_local) - F.col("n_tokens") + F.col("offset"),
    )
    return cum.select(
        "doc_id",
        "n_tokens",
        "start_tok",
        F.floor(F.col("start_tok") / seq_len).alias("seq_first"),
        F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / seq_len).alias(
            "seq_last"
        ),
        (F.col("start_tok") % seq_len).alias("offset_in_seq"),
    )


def chunk_documents(
    documents: DataFrame,
    size: int = 32,
    stride: int = 24,
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping ``size``-token windows every
    ``stride`` tokens (the RAG / long-context chunking recipe).

    A document of ``n`` tokens yields ``1 + ceil(max(n - size, 0) /
    stride)`` chunks: starts at ``0, stride, 2*stride, ...`` until the
    window reaches the end of the document (the final chunk may be short;
    chunks wholly contained in the previous window are not emitted).

    Returns ``(doc_id, chunk_id, start_tok, n_chunk_tokens, chunk_hash)``
    where ``chunk_hash = md5`` of the space-joined window — a content
    fingerprint usable for chunk-level dedup without carrying the text.

    Map-only: split / sequence / explode / slice / md5 are all JVM column
    expressions — runs at parquet scan speed with column pruning, no
    shuffle, no Python.
    """
    assert size > 0 and 0 < stride <= size
    toks = F.split(_text(text_col), " ")
    n = F.size(toks).cast("long")
    extra = F.greatest(n - size, F.lit(0).cast("long"))
    n_chunks = (F.lit(1) + F.floor((extra + stride - 1) / stride)).cast("long")
    e = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        toks.alias("toks"),
        n.alias("n"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
    )
    # F.slice's position argument is a 32-bit int, which imposes a
    # PER-DOCUMENT token-count ceiling of 2^31-1 (the corpus-wide stream in
    # pack_sequences stays long-typed; only a single document this long
    # would wrap). Guard the cast instead of silently wrapping.
    start_long = F.col("chunk_id") * stride
    start = F.when(
        start_long < F.lit((1 << 31) - 1 - size).cast("long"),
        start_long.cast("int"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("chunk_documents: document "),
                F.col("doc_id"),
                F.lit(" exceeds the 2^31-1 per-document token ceiling "),
                F.lit("imposed by F.slice's int position argument"),
            )
        )
    )
    window = F.slice(F.col("toks"), start + 1, size)
    return e.select(
        "doc_id",
        "chunk_id",
        start.cast("long").alias("start_tok"),
        F.size(window).cast("long").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", window)).alias("chunk_hash"),
    )


def mixture_weights(
    documents: DataFrame,
    alpha: float = 0.5,
    by: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled sampling weights per corpus source/domain.

    ``weight_s = n_tokens_s^alpha / sum_s' n_tokens_s'^alpha`` — the
    exponentiated-smoothing mixture used to up-sample low-resource
    sources (alpha < 1 flattens the distribution; alpha = 1 is
    proportional sampling). Returns ``(source, n_docs, n_tokens,
    weight)`` with weight rounded to 6 decimals.

    One map-side-combinable aggregate to dimension scale, then a
    broadcast of the scalar normalizer — nothing here grows with corpus
    size except the first scan.
    """
    per = documents.groupBy(F.col(by).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(_token_count(text_col)).alias("n_tokens"),
    )
    scaled = per.withColumn("w_raw", F.pow(F.col("n_tokens").cast("double"), alpha))
    total = scaled.agg(F.sum("w_raw").alias("w_total"))
    return (
        scaled.crossJoin(F.broadcast(total))
        .select(
            F.col("grp").alias(by),
            "n_docs",
            "n_tokens",
            F.round(F.col("w_raw") / F.col("w_total"), 6).alias("weight"),
        )
    )
