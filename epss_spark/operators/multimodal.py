"""Multimodal columns for training-data pipelines: images/audio/video as
opaque `binary` columns with typed metadata, processed via Arrow-batched
mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition parallelism,
metadata propagation) is real and tested; the actual media decoding is
STUBBED — this environment has no image/audio libraries, so `decode_fn`
defaults to a deterministic fake that derives pseudo-pixels from the bytes.
Swap in a real decoder (PIL / torchaudio / pyav) by passing `decode_fn`.

Design notes for 100 TB:
- binary payloads ride in the same parquet row group as their metadata —
  column pruning means metadata-only queries never read the bytes;
- mapInPandas streams Arrow batches, so executor memory is bounded by
  `spark.sql.execution.arrow.maxRecordsPerBatch` x max payload, not by
  partition size;
- feature extraction keyed by content hash enables dedup-before-decode,
  the single biggest cost saver at scale (decode only distinct payloads).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content_hash", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: fixed-dim 'features' from
    byte statistics. Replace with a real model/codec in production."""
    if not payload:
        return [0.0] * dim
    step = max(1, len(payload) // dim)
    return [sum(payload[i : i + step]) / (255.0 * step) for i in range(0, step * dim, step)]


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode/feature-extract each payload via Arrow-batched mapInPandas.

    Dedup-before-decode: payloads are grouped by content hash inside each
    batch so identical bytes decode once. decode_fn=None uses the
    deterministic fake (no media libs in this environment)."""
    # bind the default decoder as a local lambda so the UDF closure pickles
    # by value — workers then don't need this package on their PYTHONPATH
    if decode_fn is None:
        dim = 8

        def decode_fn(payload: bytes) -> list[float]:
            if not payload:
                return [0.0] * dim
            step = max(1, len(payload) // dim)
            return [sum(payload[i : i + step]) / (255.0 * step) for i in range(0, step * dim, step)]

    fn = decode_fn

    def _extract(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            cache: dict[str, list[float]] = {}
            ids, hashes, sizes, feats = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                h = hashlib.md5(b).hexdigest()
                if h not in cache:
                    cache[h] = fn(b)
                ids.append(mid)
                hashes.append(h)
                sizes.append(len(b))
                feats.append(cache[h])
            yield pd.DataFrame(
                {"media_id": ids, "content_hash": hashes, "n_bytes": sizes, "features": feats}
            )

    return media.select("media_id", "payload").mapInPandas(_extract, schema=FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: metadata is updated JVM-side; the pixel
    transform is a stub (no imaging libs here). The returned frame carries
    the target dims so downstream schema contracts hold."""

    def _resize(batches: Iterator) -> Iterator:
        for pdf in batches:
            raise NotImplementedError(
                "image decode/resize requires an imaging library (e.g. PIL); "
                "this environment stubs the pixel path"
            )

    _ = _resize  # the real path would be media.mapInPandas(_resize, MEDIA_SCHEMA)
    return media.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits one metadata row per sampled
    timestamp via an exploded sequence — pure Catalyst, no decode. The frame
    pixel extraction itself would plug into extract_features."""
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(F.sequence(F.lit(0), n_frames * every_ms, F.lit(every_ms))),
        )
        .select("media_id", "mime", "frame_ms")
    )
