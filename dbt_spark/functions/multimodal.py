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
