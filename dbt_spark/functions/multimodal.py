"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the decode kernels are STUBS with
a deterministic fake implementation (clearly marked) — but the Spark-side
plumbing is real and tested: binary columns, metadata structs, Arrow-batched
``mapInPandas`` with an explicit output schema, and partition-count control so
each task holds only a bounded number of blobs in memory (at 100 TB you size
``spark.sql.files.maxPartitionBytes`` so a task's batch of blobs fits the
executor; blobs never pass through the driver).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def real_decode_image(blob: bytes) -> tuple[int, int]:
    """Real decoder entry point — requires an image codec library.

    STUB: the execution container ships no codec libs; wire Pillow/opencv here
    in a real deployment."""
    raise NotImplementedError("image codec not available in this container")


def fake_decode_meta(blob: bytes) -> tuple[int, int, int]:
    """Deterministic FAKE decode used for plumbing tests: derives (width,
    height, n_frames) from the raw bytes. Mirrors what a real decoder returns
    shape-wise; replace with real_decode_image when codecs exist."""
    n = len(blob)
    width = n % 640
    height = sum(blob[:16]) % 480
    n_frames = n % 30
    return width, height, n_frames


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the opaque binary column (here: utf-8 of text, standing in for a
    fetched media blob) + media_type metadata."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
    )


def decode_media_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    ``mapInPandas`` streams record batches through the (stub) decoder — the
    exact shape a real resize / frame-sample / feature-extract kernel uses."""

    # NOTE: the closure must be fully self-contained (no references to this
    # module's globals) — executor Python workers don't necessarily have
    # dbt_spark on their sys.path, and cloudpickle serializes referenced
    # module globals by name, not by value.
    def batches(it):
        import pandas as _pd

        def _decode(blob: bytes):
            n = len(blob)
            return n % 640, sum(blob[:16]) % 480, n % 30

        for pdf in it:
            metas = [_decode(b) for b in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(b) for b in pdf["payload"]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "n_frames": [m[2] for m in metas],
                }
            )

    return df.mapInPandas(batches, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_off", T.LongType()),
        T.StructField("frame_len", T.LongType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame sampling: one input row fans out to one row per kept frame —
    the 1→N ``mapInPandas`` shape a real video frame-sampler uses (bounded
    memory: frames of a batch are emitted incrementally, never the whole
    video's frame list at once).

    The STUB treats the payload as ``n_frames = n_bytes % 30`` equal-length
    frames laid out back-to-back and keeps every ``every_n``-th; a real
    deployment swaps the offset math for a container demuxer (pyav/ffmpeg).
    Deterministic integer math → DuckDB-oracle checkable."""

    def batches(it):
        import pandas as _pd

        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame_len": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                n = len(blob)
                n_frames = n % 30
                if n_frames == 0:
                    continue
                flen = n // n_frames
                for idx in range(0, n_frames, every_n):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(idx)
                    out["frame_off"].append(idx * flen)
                    out["frame_len"].append(flen)
            yield _pd.DataFrame(out, dtype="int64")

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def resize_images(df: DataFrame, width: int = 64, height: int = 48) -> DataFrame:
    """Resize: binary in → binary out at a fixed target size, the
    batch-transform shape of a real thumbnailer. STUB kernel: truncate/cycle
    the payload to exactly width*height bytes (a real deployment decodes,
    resamples, re-encodes). Output stays binary so downstream ops (storage,
    feature extraction) chain without schema changes."""
    target = width * height

    def batches(it):
        import pandas as _pd

        for pdf in it:
            resized = []
            for blob in pdf["payload"]:
                b = bytes(blob)
                reps = (target // max(len(b), 1)) + 1
                resized.append((b * reps)[:target])
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(batches, schema=RESIZE_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction: binary → fixed-dim float vector (array<float>), the
    embedding-model shape. STUB kernel: per-position byte histogram folded
    into ``dim`` buckets and scaled to [0,1) — deterministic, so tests can
    assert exact values; a real deployment runs the batch through an ONNX /
    torch model here (same signature: one Arrow batch in, one out)."""

    def batches(it):
        import numpy as _np
        import pandas as _pd

        d = dim

        def _embed(blob: bytes):
            arr = _np.frombuffer(bytes(blob), dtype=_np.uint8)
            if arr.size == 0:
                return [0.0] * d
            sums = _np.zeros(d, dtype=_np.int64)
            _np.add.at(sums, _np.arange(arr.size) % d, arr)
            return [float(x % 1000) / 1000.0 for x in sums]

        for pdf in it:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "features": [_embed(b) for b in pdf["payload"]],
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )
    return df.mapInPandas(batches, schema=schema)


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.LongType()),
        T.StructField("win_off", T.LongType()),
        T.StructField("win_len", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
    ]
)


def audio_windows(df: DataFrame, window_bytes: int = 256) -> DataFrame:
    """Audio windowing: one clip fans out to one row per fixed-size PCM
    window with a per-window energy statistic — the framing step of any
    audio feature pipeline (VAD, fingerprinting, spectrogram batching).

    STUB kernel: the payload is treated as 8-bit PCM and the statistic is the
    integer sum of sample bytes per window (a real deployment decodes the
    container and computes RMS/spectral energy in the same 1→N mapInPandas
    shape). Integer-exact → DuckDB-oracle checkable; bounded memory: windows
    stream out per Arrow batch, never a whole clip's window list at once."""

    def batches(it):
        import pandas as _pd

        w = window_bytes
        for pdf in it:
            out = {"doc_id": [], "win_idx": [], "win_off": [], "win_len": [],
                   "byte_sum": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(blob)
                for idx in range((len(b) + w - 1) // w):
                    chunk = b[idx * w:(idx + 1) * w]
                    out["doc_id"].append(int(doc_id))
                    out["win_idx"].append(idx)
                    out["win_off"].append(idx * w)
                    out["win_len"].append(len(chunk))
                    out["byte_sum"].append(int(sum(chunk)))
            yield _pd.DataFrame(out, dtype="int64")

    return df.mapInPandas(batches, schema=AUDIO_WINDOW_SCHEMA)
