"""End-to-end training-data pipeline over the documents table: quality
filter → near-dup cluster dedup → benchmark decontamination → PII
scrub → language-stratified sampling → deterministic split → context
packing.  Every stage is one of the engine's scale-shaped operators
(see SURVEY.md round-3 deltas for the plan shape of each)."""
import joi_spark  # noqa: F401  (facade import keeps the example honest)
from joi_spark.session import get_spark
from joi_spark.operators import corpus as CP
from joi_spark.operators import dedup as DD
from joi_spark.operators import sampling as SP
from joi_spark.operators import text as TX

spark = get_spark("local[4]")
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
print(f"corpus: {docs.count()} docs")

# 1. quality gate: drop too-short / low-alpha / repetitive docs
kept = (TX.quality_filter(docs).filter("keep")
        .select("doc_id").join(docs, "doc_id"))
print(f"after quality filter: {kept.count()}")

# 2. near-dup removal, transitively correct: Jaccard pairs →
#    connected components → keep each cluster's canonical member
pairs = DD.ngram_jaccard_pairs(kept, threshold=0.8)
clusters = DD.dedup_clusters(pairs)
deduped = DD.cluster_canonical(kept, clusters)
print(f"after near-dup dedup: {deduped.count()}")

# 3. decontaminate against a held-out benchmark (here: a sample of
#    the corpus itself, standing in for an eval set)
benchmark = deduped.limit(5).select("doc_id", "text")
clean = DD.decontaminate(deduped, benchmark)

# 4. PII redaction (map-only chained regex)
scrubbed = CP.pii_scrub(clean).join(
    clean.drop("text"), "doc_id")

# 5. language-balanced downsample + deterministic split
sampled = SP.stratified_sample(scrubbed, "lang",
                               {"en": 1.0, "de": 0.5}, seed="demo",
                               default_rate=0.25)
split = CP.hash_split(sampled, seed="demo")
split.groupBy("split", "lang").count().orderBy("split", "lang").show()

# 6. pack the train split into 256-token context windows
train = split.filter("split = 'train'")
packed = CP.pack_sequences(train, capacity=256, n_shards=4)
packed.groupBy("shard").agg({"pack_id": "max"}).show()
spark.stop()
