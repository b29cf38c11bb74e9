"""phenoscape_owl_tools_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the capabilities of phenoscape/phenoscape-owl-tools.

Everything here is built on the public PySpark DataFrame API. The reference
(read-only at /root/reference) is a single-JVM Scala/OWL-API/ELK/Blazegraph
pipeline; this package re-expresses the same *semantics* as a distributed
Spark pipeline:

- ingest: Iceberg/parquet tables of interleaved text+media documents
  ``documents(doc_id, spans ARRAY<STRUCT<kind,text,media_ref,offset>>)``
- extraction: vectorized pandas/Arrow UDFs (broadcast-trie mention detection,
  entity linking) — no per-row Python
- axiom generation: pure column projections (named restrictions, absence /
  negation classes, develops-from rules, EQ composition)
- reasoning: iterative semi-naive join-based EL subclass-closure
  materialization (replacing ELK), negation-hierarchy rule joins
- canonicalization: connected components (hash-to-min) over equivalence edges
- profiles: gene profiles and Fitch-style evolutionary profiles
  (level-wise tree aggregation)
- similarity: OWLsim layer (IC, max-IC subsumers, exact-median group scores,
  top-k subsumers, profile Jaccard, expect-score regression)
- chains: EL property-chain saturation (VAHM model) with role hierarchy
- training-data ops: exact/MinHash-LSH/SimHash/Jaccard/embedding dedup, ANN
  top-k (brute-force, sign-bucket LSH, numpy-matmul), language-ID, quality
  scoring, token counting, rolling fingerprints, multimodal media plumbing
- streaming: incremental extraction (foreachBatch idempotent sink),
  watermarked event rollups, applyInPandasWithState sessionization
- sinks: (subj, pred, obj) triple tables partitioned by subject hash with
  explicit hub-entity salting, per-stage lineage manifests, resume;
  N-Triples text export
"""

__version__ = "0.1.0"
