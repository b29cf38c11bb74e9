"""Drive phenoscape_owl_tools_spark end-to-end against real /root/testdata/sf0.001."""
import sys
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from phenoscape_owl_tools_spark.session import get_spark
from phenoscape_owl_tools_spark.operators import mention, closure, components

spark = get_spark(app_name="drive", master="local[4]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

# 1. real documents -> interleaved span shape (what the engine ingests)
raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
docs = raw.select(
    F.col("doc_id").cast("string").alias("doc_id"),
    F.array(
        F.struct(F.lit("text").alias("kind"), F.col("text").alias("text"),
                 F.lit(None).cast("string").alias("media_ref"), F.lit(0).alias("offset"))
    ).alias("spans"),
)
print("docs:", docs.count())

# 2. dictionary from a fixed keyword vocabulary -> term IRIs
kw = ["spark", "join", "filter", "window", "merge", "hash scan"]
dictionary = spark.createDataFrame(
    [(w, f"http://example.org/term/{w.replace(' ', '_')}") for w in kw],
    ["surface", "iri"],
)
m = mention.detect_mentions(spark, docs, dictionary)
m.cache()
print("mentions:", m.count())
m.groupBy("term").count().orderBy(F.desc("count")).show(10, False)

# 3. triples + closure over a small taxonomy of the terms
triples = mention.mention_triples(m, "http://purl.org/phenoscape/vocab.owl#mentions")
print("distinct mention triples:", triples.count())

edges = spark.createDataFrame(
    [("http://example.org/term/spark", "http://example.org/term/engine"),
     ("http://example.org/term/engine", "http://example.org/term/software"),
     ("http://example.org/term/join", "http://example.org/term/operator"),
     ("http://example.org/term/operator", "http://example.org/term/software")],
    ["sub", "sup"],
)
cl = closure.transitive_closure(edges)
print("closure edges:")
for r in cl.orderBy("sub", "sup").collect():
    print("  ", r["sub"], "->", r["sup"])

# presence-style path query: docs mentioning anything under 'software'
under_software = cl.where(F.col("sup") == "http://example.org/term/software").select("sub") \
    .unionByName(spark.createDataFrame([("http://example.org/term/software",)], ["sub"]))
hits = triples.join(under_software, triples["obj"] == under_software["sub"], "leftsemi")
print("docs mentioning software-subsumed terms:", hits.select("subj").distinct().count())

# 4. connected components canonicalization
eq = spark.createDataFrame(
    [("http://example.org/term/spark", "http://example.org/term/apache_spark"),
     ("http://example.org/term/join", "http://example.org/term/equijoin")],
    ["a", "b"],
)
cc = components.connected_components(eq)
cc.show(10, False)
canon = components.canonicalize_triples(triples, cc)
print("canonicalized triples:", canon.count())

# PROBES
print("--- probe: cyclic edges terminate ---")
cyc = spark.createDataFrame([("a", "b"), ("b", "a"), ("b", "c")], ["sub", "sup"])
print(sorted((r["sub"], r["sup"]) for r in closure.transitive_closure(cyc).collect()))

print("--- probe: empty dictionary ---")
empty_dict = spark.createDataFrame([], "surface string, iri string")
print("mentions with empty dict:", mention.detect_mentions(spark, docs, empty_dict).count())

print("--- probe: doc with null text span ---")
nulldoc = spark.createDataFrame(
    [("d1", [{"kind": "text", "text": None, "media_ref": None, "offset": 0}])],
    "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
)
print("mentions on null-text doc:", mention.detect_mentions(spark, nulldoc, dictionary).count())
print("ALL OK")
spark.stop()
