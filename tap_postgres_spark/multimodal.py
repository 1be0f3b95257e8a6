"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side architecture is fully real — schema, partition-friendly
batch shapes, Arrow-batched ``mapInPandas`` UDF signatures, metadata
extraction.  Round 2 adds two REAL decoders that need no external
libraries — RIFF/WAV PCM audio and PPM (P6) images, parsed byte-for-byte
in :func:`decode_wav` / :func:`decode_ppm` and wired into
:func:`decode_media` via a mime registry — so the decode stage is a
shipping operator for those formats; kinds with no pure-Python decoder
(video containers, JPEG/PNG entropy coding) still go through the
deterministic stub and are marked ``decoded=False``.  Swap in PIL/libvips
/ffmpeg for those without touching the Spark topology.

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
import math
import struct
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# Real codecs (pure Python, no external libs): RIFF/WAV PCM and PPM (P6).
# ---------------------------------------------------------------------------
def encode_wav(
    samples: Sequence[int], sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Mono/interleaved 16-bit PCM RIFF/WAVE encoder."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff_size = 4 + len(fmt) + len(data_chunk)
    return struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE") + fmt + data_chunk


def decode_wav(data: bytes) -> dict:
    """Parse a PCM RIFF/WAVE payload: walks the chunk list (tolerating
    extra chunks like LIST/fact), returns sample stats.

    Raises ValueError on non-RIFF/non-PCM payloads — decode_media maps
    that to ``decoded=False`` + err, the per-row failure containment a
    100 TB media scrape needs (one corrupt file must not kill a task)."""
    if len(data) < 44 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    samples: list[int] | None = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            # a truncated chunk must be a decode FAILURE, not a silent
            # partial decode with wrong n_samples/duration
            raise ValueError(f"truncated {cid!r} chunk: {len(body)} < {size} bytes")
        if cid == b"fmt ":
            audio_format, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_format != 1 or bits != 16:
                raise ValueError(f"unsupported wav: format={audio_format} bits={bits}")
            fmt = (channels, sample_rate)
        elif cid == b"data":
            n = len(body) // 2
            samples = list(struct.unpack(f"<{n}h", body[: n * 2]))
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    channels, sample_rate = fmt
    n = len(samples)
    mean = sum(samples) / n if n else 0.0
    rms = math.sqrt(sum(s * s for s in samples) / n) if n else 0.0
    return {
        "n_samples": n,
        "sample_rate": sample_rate,
        "channels": channels,
        "duration_ms": (n // channels) * 1000 // sample_rate if sample_rate else 0,
        "mean_sample": mean,
        "rms": rms,
    }


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6), maxval 255."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != w*h*3")
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def decode_ppm(data: bytes) -> dict:
    """Parse a P6 PPM payload (whitespace/comment-tolerant header)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — separated by whitespace,
    # '#' comments allowed
    fields: list[int] = []
    pos = 2
    while len(fields) < 3 and pos < len(data):
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    need = width * height * 3
    body = data[pos : pos + need]
    if len(body) != need:
        raise ValueError("truncated pixel data")
    n = width * height
    return {
        "width": width,
        "height": height,
        "mean_r": sum(body[0::3]) / n,
        "mean_g": sum(body[1::3]) / n,
        "mean_b": sum(body[2::3]) / n,
    }

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


def synth_samples(media_id: int, n: int = 128) -> list[int]:
    """Deterministic int16 sample synth (LCG-ish, SQL-replicable:
    ((id*7919 + i*104729) % 65536) - 32768)."""
    return [((media_id * 7919 + i * 104729) % 65536) - 32768 for i in range(n)]


def synth_pixels(media_id: int, width: int, height: int) -> bytes:
    """Deterministic RGB bytes: (id*31 + p*97) % 256 per byte position."""
    return bytes(((media_id * 31 + p * 97) % 256) for p in range(width * height * 3))


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table (no external data): audio rows carry REAL
    16-bit PCM WAV payloads, image rows REAL P6 PPM payloads (both built
    by the encoders above); video rows stay opaque seeded bytes (no
    pure-Python container codec — honestly undecodable here)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "audio":
            payload = encode_wav(synth_samples(i), sample_rate=8000)
            w = h = None
            dur = 128 * 1000 // 8000
        elif kind == "image":
            w, h = 8 + (i % 8) * 4, 8 + (i % 5) * 4
            payload = encode_ppm(w, h, synth_pixels(i, w, h))
            dur = None
        else:
            payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
            w = h = None
            dur = 1000 + i * 250
        rows.append(
            (
                i,
                kind,
                {"image": "image/x-portable-pixmap", "audio": "audio/wav",
                 "video": "video/mp4"}[kind],
                bytearray(payload),
                w,
                h,
                dur,
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


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("decoded", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("mean_sample", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("err", T.StringType()),
    ]
)

# mime → real decoder; anything else is honestly undecodable here
DECODERS = {
    "audio/wav": decode_wav,
    "audio/x-wav": decode_wav,
    "image/x-portable-pixmap": decode_ppm,
}


def decode_media(df: DataFrame) -> DataFrame:
    """REAL decode stage over the binary column: WAV/PPM parsed
    byte-for-byte; unknown mimes and corrupt payloads yield
    ``decoded=False`` + ``err`` instead of failing the task (per-row
    failure containment).  Same mapInPandas topology as the stub path —
    Arrow batches in, one Python call per batch."""

    field_names = [f.name for f in DECODE_SCHEMA.fields]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in field_names}
            for mid, kind, mime, data in zip(
                pdf["media_id"], pdf["kind"], pdf["mime"], pdf["data"]
            ):
                row = dict.fromkeys(field_names)
                row.update({"media_id": mid, "kind": kind, "mime": mime})
                dec = DECODERS.get(mime)
                try:
                    if data is None:
                        raise ValueError("no payload")
                    if dec is None:
                        raise ValueError(f"no decoder for {mime}")
                    row.update(dec(bytes(data)))
                    row["decoded"] = True
                except (ValueError, struct.error) as e:
                    row["decoded"] = False
                    row["err"] = str(e)
                for k in field_names:
                    out[k].append(row[k])
            yield pd.DataFrame(out)

    return df.select("media_id", "kind", "mime", "data").mapInPandas(
        _decode, DECODE_SCHEMA
    )


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
