"""Multimodal-column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The Spark-side contract is real and tested — schema, partitioning,
batch shape, UDF signatures.  The codec step (round-3): P6 PPM images
and PCM-16 WAV audio decode with the STDLIB (``decode_ppm`` /
``decode_wav``), tested end-to-end on real bytes via
:func:`synthetic_real_media` + ``extract_features(fake=False)``.
Compressed formats (jpeg/png/flac) and video frames need libraries
absent from this container (PIL / soundfile / av) and remain honestly
gated: ``decode_image`` raises unless PIL imports, video feature
extraction raises ``NotImplementedError``.

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


# --- real stdlib codecs (round-3: fake=False now has a tested
# end-to-end route for image/audio; video decode would need an av
# library and remains honestly gated) ----------------------------------

def make_ppm_bytes(media_id: int, width: int, height: int) -> bytes:
    """A real binary-PPM (P6) image with a deterministic per-id pixel
    pattern — valid input for ANY ppm decoder, not just ours."""
    header = f"P6\n{width} {height}\n255\n".encode("ascii")
    px = bytearray()
    for y in range(height):
        for x in range(width):
            px.append((media_id * 7 + x * 13 + y * 29) % 256)
            px.append((media_id * 11 + x * 5 + y * 3) % 256)
            px.append((media_id * 17 + x * 23 + y * 19) % 256)
    return header + bytes(px)


def make_wav_bytes(media_id: int, sample_rate: int = 8000,
                   n_samples: int = 160) -> bytes:
    """A real RIFF/WAVE PCM-16 mono clip with a deterministic per-id
    waveform (stdlib ``wave`` writer)."""
    import io
    import struct
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        frames = b"".join(
            struct.pack("<h", (((media_id * 31 + i * 17) % 4096) - 2048) * 8)
            for i in range(n_samples))
        w.writeframes(frames)
    return buf.getvalue()


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM (P6): returns (width, height, rgb_bytes).
    Pure bytes parsing — no image library needed."""
    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":          # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1                                       # single ws after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    rgb = payload[i : i + width * height * 3]
    if len(rgb) != width * height * 3:
        raise ValueError("truncated PPM pixel data")
    return width, height, rgb


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Parse a RIFF/WAVE PCM-16 payload: returns (sample_rate,
    samples).  Stdlib ``wave`` — no audio library needed."""
    import io
    import struct
    import wave
    try:
        with wave.open(io.BytesIO(payload or b"")) as w:
            if w.getsampwidth() != 2:
                raise ValueError("only PCM-16 wav supported")
            sr = w.getframerate()
            frames = w.readframes(w.getnframes())
    except wave.Error as e:
        raise ValueError(f"not a wav payload: {e}") from e
    n = len(frames) // 2
    return sr, list(struct.unpack(f"<{n}h", frames[: n * 2]))


def _fold_feature(vals: list[float], dim: int) -> list[float]:
    """Fold a variable-length normalized sequence into ``dim`` bucket
    means (deterministic, order-preserving)."""
    if not vals:
        return [0.0] * dim
    n = len(vals)
    out = []
    for i in range(dim):
        lo = i * n // dim
        hi = max((i + 1) * n // dim, lo + 1)
        seg = vals[lo:hi]
        out.append(round(sum(seg) / len(seg), 6))
    return out


def synthetic_real_media(spark: SparkSession, n: int = 100,
                         partitions: int | None = None) -> DataFrame:
    """Media table whose payloads are REAL codec bytes — P6 PPM images
    and PCM-16 WAV clips — built worker-side in an Arrow-batched
    mapInPandas stage (ids alternate image/audio; no driver literals).
    The tested end-to-end input for ``extract_features(fake=False)``."""
    base = spark.range(0, n, 1,
                       partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                if mid % 2 == 0:
                    w, h = 8 + mid % 5, 6 + mid % 4
                    rows.append((mid, "image", make_ppm_bytes(mid, w, h),
                                 (w, h, None, None)))
                else:
                    sr, ns = 8000, 160 + mid % 64
                    rows.append((mid, "audio", make_wav_bytes(mid, sr, ns),
                                 (None, None, sr, ns * 1000 // sr)))
            yield pd.DataFrame(rows, columns=["media_id", "kind",
                                              "payload", "meta"])

    return base.mapInPandas(gen, MEDIA_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16, *,
                     fake: bool = True,
                     batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over media payloads —
    ``mapInPandas`` with FEATURE_SCHEMA output.

    ``fake=True`` (the benchmark default) computes the deterministic
    digest feature.  ``fake=False`` runs REAL stdlib decoders: P6 PPM
    for images (pixel-mean buckets) and PCM-16 WAV for audio
    (sample-mean buckets); video needs an av library absent from this
    container and raises.  The plumbing — schema, batch iteration,
    column pruning (only media_id/kind/payload are read) — is identical
    either way.
    """
    import hashlib

    def feature_real(kind: str, payload: bytes) -> list[float]:
        if kind == "image":
            _, _, rgb = decode_ppm(payload)
            return _fold_feature([b / 127.5 - 1.0 for b in rgb], dim)
        if kind == "audio":
            _, samples = decode_wav(payload)
            return _fold_feature([s / 32768.0 for s in samples], dim)
        raise NotImplementedError(
            "video decode requires an av library (not in this container)")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if fake:
                feats = payloads.map(lambda p: _feature_from_bytes(p, dim))
            else:
                feats = [feature_real(k, p)
                         for k, p in zip(pdf["kind"], payloads)]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.map(lambda p: len(p or b"")).astype("int32"),
                "digest": payloads.map(
                    lambda p: hashlib.sha256(p or b"").hexdigest()),
                "feature": feats,
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
