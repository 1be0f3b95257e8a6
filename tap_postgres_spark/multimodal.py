"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side architecture is fully real — schema, partition-friendly
batch shapes, Arrow-batched ``mapInPandas`` UDF signatures, metadata
extraction — while the actual media decoding is stubbed (the sandbox has
no image/audio libraries).  Stubs are deterministic so tests can assert
end-to-end plumbing; swap ``_decode_image_stub`` for PIL/libvips in a
real deployment without touching the Spark topology.

Design for 100 TB of media:
- media bytes stay in one opaque ``binary`` column; all filtering happens
  on typed metadata columns first so Parquet column pruning means the
  bytes are only read by stages that decode them;
- decode / feature-extract run via ``mapInPandas`` — per-partition Arrow
  batches, so the Python worker amortizes per-batch setup and the JVM
  never materializes decoded frames;
- frame sampling yields multiple rows per input (iterator-of-DataFrames
  contract), keeping peak memory at batch granularity.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("data", T.BinaryType(), True),  # opaque payload
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.LongType(), True),
    ]
)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (no external data): payload bytes are
    seeded digests, metadata plausible."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                64 + (i % 8) * 32 if kind != "audio" else None,
                64 + (i % 5) * 32 if kind != "audio" else None,
                (1000 + i * 250) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
def media_stats(df: DataFrame) -> DataFrame:
    """Typed-metadata pass: byte sizes + content hash WITHOUT decoding.
    Pure column expressions — the cheap scan that should precede any
    decode stage in a pipeline."""
    return df.select(
        "media_id",
        "kind",
        F.octet_length("data").alias("n_bytes"),
        F.sha2("data", 256).alias("content_sha256"),
        "meta_width",
        "meta_height",
        "meta_duration_ms",
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feat_mean_byte", T.DoubleType()),
        T.StructField("feat_entropy_proxy", T.DoubleType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def _decode_image_stub(data: bytes) -> dict:
    """STUB: a real deployment decodes with PIL/libvips here.  The stub
    computes deterministic byte statistics so the plumbing is testable.
    Raises NotImplementedError for kinds a real decoder would reject."""
    if data is None:
        raise NotImplementedError("no payload")
    mean = sum(data) / len(data) if data else 0.0
    distinct = len(set(data))
    return {"mean_byte": mean, "entropy_proxy": distinct / 256.0}


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: each partition arrives as an iterator of Arrow-backed
    pandas batches; the UDF is vectorized per batch (one Python call per
    ~10k rows, not per row)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["data"].map(
                lambda b: _decode_image_stub(bytes(b)) if b is not None else None
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat_mean_byte": feats.map(lambda f: f["mean_byte"] if f else None),
                    "feat_entropy_proxy": feats.map(
                        lambda f: f["entropy_proxy"] if f else None
                    ),
                    "decoded": feats.notna(),
                }
            )

    return df.select("media_id", "kind", "data").mapInPandas(_extract, _FEATURE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling plumbing for video rows: N output rows per input at
    ``every_ms`` cadence.  The stub hashes a byte slice per frame; a real
    decoder would emit resized RGB tensors with the same row shape."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in _FRAME_SCHEMA.fields}
            for _, row in pdf.iterrows():
                dur = row["meta_duration_ms"] or 0
                data = bytes(row["data"] or b"")
                n_frames = max(1, int(dur // every_ms))
                for fi in range(n_frames):
                    sl = data[fi % max(len(data), 1) :][:64]
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(fi)
                    out["frame_ts_ms"].append(fi * every_ms)
                    out["frame_sha256"].append(hashlib.sha256(sl).hexdigest())
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "meta_duration_ms", "data")
        .mapInPandas(_sample, _FRAME_SCHEMA)
    )
