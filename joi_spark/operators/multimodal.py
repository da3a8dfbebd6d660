"""Multimodal-column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The Spark-side contract is real and tested — schema, partitioning,
batch shape, UDF signatures.  The actual codec step is STUBBED: the
decode libraries (PIL / soundfile / av) are not in this container, so
``decode_*`` raises ``NotImplementedError`` unless the library imports,
and ``fake_features`` provides the deterministic stand-in used by tests
and benchmarks.

Scale notes: payload rows are large (MBs) — keep
``spark.sql.files.maxPartitionBytes`` moderate so a task holds O(100)
payloads, and repartition by a uniform key (media_id) before the decode
stage so one task never accumulates the biggest files.  mapInPandas
streams Arrow batches — peak memory is one batch, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),     # opaque bytes
    T.StructField("meta", T.StructType([                # typed metadata
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("digest", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def synthetic_media(spark: SparkSession, n: int = 1000,
                    partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA — payload
    bytes derived from sha2 of the id (column algebra, no driver data).

    The payload is the 64 ASCII bytes of the sha256 hex string (a
    string→binary cast, i.e. UTF-8 bytes) — ASCII rather than raw
    digest bytes so an external oracle that can only hash VARCHARs
    (DuckDB sha256) reproduces ``sha256(payload)`` exactly via
    ``sha256(sha256(CAST(id AS VARCHAR)))``."""
    df = spark.range(0, n, 1,
                     partitions or spark.sparkContext.defaultParallelism)
    kind = (F.when(F.col("id") % 3 == 0, "image")
             .when(F.col("id") % 3 == 1, "audio").otherwise("video"))
    payload = F.sha2(F.col("id").cast("string"), 256).cast("binary")
    meta = F.struct(
        F.when(kind == "image", ((F.col("id") % 64) + 1) * 16)
         .cast("int").alias("width"),
        F.when(kind == "image", ((F.col("id") % 48) + 1) * 16)
         .cast("int").alias("height"),
        F.when(kind == "audio", F.lit(16000)).cast("int")
         .alias("sample_rate"),
        F.when(kind != "image", ((F.col("id") % 300) + 1) * 100)
         .cast("int").alias("duration_ms"))
    return df.select(F.col("id").alias("media_id"), kind.alias("kind"),
                     payload.alias("payload"), meta.alias("meta"))


def _feature_from_bytes(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in feature: bytes of the payload digest
    folded into ``dim`` floats in [-1, 1]."""
    import hashlib
    h = hashlib.sha256(payload or b"").digest()
    out = []
    for i in range(dim):
        b = h[i % len(h)] ^ (i * 37 % 256)
        out.append(round(b / 127.5 - 1.0, 6))
    return out


def decode_image(payload: bytes):  # pragma: no cover - library stub
    """Real decode path — only if PIL is available (it is not in this
    container); the pipeline otherwise uses :func:`fake_features`."""
    try:
        from PIL import Image  # type: ignore
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; use extract_features(fake=True)"
        ) from e
    import io
    return Image.open(io.BytesIO(payload))


def extract_features(df: DataFrame, dim: int = 16, *,
                     fake: bool = True,
                     batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over media payloads —
    ``mapInPandas`` with FEATURE_SCHEMA output.

    ``fake=True`` (default in this container) computes the deterministic
    digest feature; ``fake=False`` would run the real decoder per kind.
    The plumbing — schema, batch iteration, column pruning (only
    media_id/kind/payload are read) — is identical either way.
    """
    if not fake:
        raise NotImplementedError(
            "real codecs are not available in this container; "
            "run with fake=True")
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.map(lambda p: len(p or b"")).astype("int32"),
                "digest": payloads.map(
                    lambda p: hashlib.sha256(p or b"").hexdigest()),
                "feature": payloads.map(
                    lambda p: _feature_from_bytes(p, dim)),
            })

    src = df.select("media_id", "kind", "payload")
    return src.mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id,
    frame_ts_ms) — the explode happens BEFORE decode so frame tasks
    parallelize across the cluster instead of per-file loops.
    Decode of each frame is then an :func:`extract_features`-shaped
    mapInPandas stage."""
    vids = df.filter(F.col("kind") == "video")
    # always sample ≥1 frame (ts 0), even for clips shorter than the step
    n_frames = F.greatest((F.col("meta.duration_ms") / every_ms).cast("int"),
                          F.lit(1))
    return (vids.withColumn(
                "frame_ts_ms",
                F.explode(F.sequence(F.lit(0),
                                     (n_frames - 1) * every_ms,
                                     F.lit(every_ms))))
                .select("media_id", "frame_ts_ms"))
