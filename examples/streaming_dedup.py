"""Streaming ingestion dedup: new documents stream in; exact
duplicates are dropped both within the stream (watermarked state) and
against the already-ingested corpus (stream-static anti-join) —
joi_spark.streaming.stream_dedup / corpus_fingerprints."""
import datetime
import shutil
import tempfile

from joi_spark.session import get_spark
from joi_spark.streaming import corpus_fingerprints, stream_dedup

spark = get_spark("local[4]")
src = tempfile.mkdtemp(prefix="joi_stream_demo_src_")
ckpt = tempfile.mkdtemp(prefix="joi_stream_demo_ckpt_")

t0 = datetime.datetime(2024, 1, 1, 0, 30)
batch = spark.createDataFrame(
    [(t0, 0, "already ingested last week"),
     (t0, 1, "a brand new document"),
     (t0, 2, "a brand new document"),        # in-stream duplicate
     (t0, 3, "another fresh one")],
    "ts timestamp, doc_id bigint, text string")
batch.write.mode("overwrite").parquet(src)

history = corpus_fingerprints(spark.createDataFrame(
    [(99, "already ingested last week")], "doc_id bigint, text string"))

stream = spark.readStream.schema(batch.schema).parquet(src)
q = (stream_dedup(stream, watermark_delay="10 minutes", history=history)
     .writeStream.format("memory").queryName("ingested")
     .outputMode("append").option("checkpointLocation", ckpt)
     .trigger(availableNow=True).start())
q.awaitTermination(120)
spark.sql("SELECT doc_id, text FROM ingested ORDER BY doc_id") \
     .show(truncate=False)   # docs {1 or 2} and 3 survive; 0 is history
shutil.rmtree(src, ignore_errors=True)
shutil.rmtree(ckpt, ignore_errors=True)
spark.stop()
