"""Multimodal (binary-column) operators (training-data pipeline ops).

Images/audio/video are opaque ``binary`` columns with typed metadata.  The
Spark-side plumbing — schemas, partition-friendly batching, Arrow-vectorized
UDF signatures — is real and tested; the codec step is stubbed because no
image/audio libraries ship in this environment:

- ``sniff_metadata``: magic-byte container detection + sizes (real).
- ``byte_histogram_features``: deterministic 16-bucket byte histogram as a
  stand-in "feature extractor" (real computation, fake semantics).
- ``decode_image`` / ``sample_frames``: STUBS — raise NotImplementedError
  unless ``fake=True``, in which case they produce deterministic fakes with
  the correct schema/shape so downstream plumbing is exercised end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"ID3", "mp3"),
    (b"\x00\x00\x00", "mp4ish"),
]


def sniff_format(b: bytes) -> str:
    if not b:
        return "empty"
    for magic, name in _MAGIC:
        if b.startswith(magic):
            return name
    return "unknown"


def sniff_metadata(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Adds (format string, n_bytes long) metadata columns."""

    @F.pandas_udf("string")
    def fmt(col: pd.Series) -> pd.Series:
        return col.map(lambda b: sniff_format(b or b""))

    return df.withColumn("format", fmt(F.col(bin_col))).withColumn(
        "n_bytes", F.octet_length(F.col(bin_col)).cast("long"))


def byte_histogram_features(df: DataFrame, bin_col: str = "payload",
                            buckets: int = 16) -> DataFrame:
    """Adds ``features array<float>`` — normalized byte histogram (numpy,
    Arrow-batched); deterministic stand-in for a learned feature extractor."""

    @F.pandas_udf("array<float>")
    def hist(col: pd.Series) -> pd.Series:
        out = []
        for b in col:
            if not b:
                out.append([0.0] * buckets)
                continue
            arr = np.frombuffer(b, dtype=np.uint8)
            h = np.bincount(arr >> int(np.log2(256 // buckets)),
                            minlength=buckets).astype(np.float64)
            out.append((h / h.sum()).astype(np.float32).tolist())
        return pd.Series(out)

    return df.withColumn("features", hist(F.col(bin_col)))


DECODE_SCHEMA = ("id long, width int, height int, channels int, "
                 "pixels binary")


def decode_image(df: DataFrame, id_col: str = "id", bin_col: str = "payload",
                 fake: bool = False) -> DataFrame:
    """STUB decode: binary -> (width, height, channels, raw pixels).

    Real decode needs an image codec (PIL/opencv — not in this container).
    ``fake=True`` emits a deterministic 4x4 RGB image derived from the bytes'
    xxhash so the schema/partitioning/batch plumbing is testable.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs unavailable in this environment; "
                    "pass fake=True for deterministic plumbing tests")
            rows = {"id": [], "width": [], "height": [], "channels": [],
                    "pixels": []}
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                seed = np.frombuffer((b or b"\0")[:8].ljust(8, b"\0"),
                                     dtype=np.uint64)[0]
                rng = np.random.default_rng(int(seed))
                px = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
                rows["id"].append(int(i))
                rows["width"].append(4)
                rows["height"].append(4)
                rows["channels"].append(3)
                rows["pixels"].append(px.tobytes())
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col).alias(id_col), F.col(bin_col)).mapInPandas(
        decode, schema=DECODE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, id_col: str = "id",
                  bin_col: str = "payload", fake: bool = False) -> DataFrame:
    """STUB video frame sampling: emits (id, frame_idx, frame binary).

    ``fake=True`` treats every 1 KiB of payload as one "frame" and samples
    every ``every_n``-th — correct explode/array shape without a codec.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video codecs unavailable in this environment; "
                    "pass fake=True for deterministic plumbing tests")
            rows = {"id": [], "frame_idx": [], "frame": []}
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                b = b or b""
                n_frames = max(1, len(b) // 1024)
                for f_idx in range(0, n_frames, every_n):
                    rows["id"].append(int(i))
                    rows["frame_idx"].append(f_idx)
                    rows["frame"].append(b[f_idx * 1024:(f_idx + 1) * 1024])
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        sample, schema="id long, frame_idx int, frame binary")
