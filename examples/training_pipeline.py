"""End-to-end training-data pipeline over the documents table: quality
filter → duplicated-window screening → near-dup cluster dedup →
semantic (embedding) dedup → benchmark decontamination → PII scrub →
mixture resampling to target domain proportions → deterministic
split → context packing.  Every stage is one of the engine's
scale-shaped operators (see SURVEY.md round-3 deltas for the plan
shape of each)."""
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

# 2. duplicated-window screening (Lee et al. 2021): drop docs whose
#    8-token windows mostly occur in other documents
kept = DD.window_dedup_filter(kept, n=8, max_dup_fraction=0.9)
print(f"after window screening: {kept.count()}")

# 3. near-dup removal, transitively correct: Jaccard pairs →
#    connected components → keep each cluster's canonical member
pairs = DD.ngram_jaccard_pairs(kept, threshold=0.8)
clusters = DD.dedup_clusters(pairs)
deduped = DD.cluster_canonical(kept, clusters)
print(f"after near-dup dedup: {deduped.count()}")

# 4. semantic dedup (SemDeDup): cluster embeddings on the coarse
#    quantizer, drop same-cluster cosine-near duplicates keep-first
emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
sem = DD.semantic_dedup(emb, id_col="vec_id", threshold=0.98,
                        n_lists=8)
sem_keep = sem.filter("keep").selectExpr("vec_id AS doc_id")
deduped = deduped.join(sem_keep, "doc_id", "left_semi")
print(f"after semantic dedup: {deduped.count()}")

# 5. decontaminate against a held-out benchmark (here: a sample of
#    the corpus itself, standing in for an eval set)
benchmark = deduped.limit(5).select("doc_id", "text")
clean = DD.decontaminate(deduped, benchmark)

# 6. PII redaction (map-only chained regex)
scrubbed = CP.pii_scrub(clean).join(
    clean.drop("text"), "doc_id")

# 7. resample to TARGET source proportions (mixture reweighting),
#    then deterministic split
sampled = SP.mix_to_target(scrubbed, "source",
                           {"src0": 0.4, "src1": 0.3, "src2": 0.3},
                           seed="demo")
split = CP.hash_split(sampled, seed="demo")
split.groupBy("split", "lang").count().orderBy("split", "lang").show()

# 8. pack the train split into 256-token context windows
train = split.filter("split = 'train'")
packed = CP.pack_sequences(train, capacity=256, n_shards=4)
packed.groupBy("shard").agg({"pack_id": "max"}).show()
spark.stop()
