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


# --------------------------------------------------------------------------
# REAL header parsers — pure-bytes, no codec libraries. Unlike the pixel
# decode stubs above, these are complete implementations of the published
# container formats' header layouts (PNG IHDR, JPEG SOFn marker scan,
# GIF logical screen descriptor, BMP BITMAPINFOHEADER, RIFF/WAVE fmt+data):
# they work on genuine files, and metadata extraction at ingest (dims,
# sample rates, durations) is exactly the pass a 100 TB media pipeline runs
# BEFORE deciding what to decode. Defined inside a factory so cloudpickle
# serializes them by value into executor closures (module-global functions
# pickle by reference, and executors may not have dbt_spark importable).
# --------------------------------------------------------------------------

def _make_header_parsers():
    def parse_image_header(blob):
        """(format, width, height) from real image container headers, or
        None when no known signature matches.

        PNG: 8-byte signature, IHDR chunk at offset 8 (width/height
        big-endian at 16/20). JPEG: scan FF-markers for any SOFn frame
        header (height at +5, width at +7, big-endian), skipping
        variable-length segments. GIF87a/89a: logical screen descriptor
        (LE u16 at 6/8). BMP: BITMAPINFOHEADER (LE i32 at 18/22; height
        may be negative = top-down)."""
        b = bytes(blob)
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
            return ("png", int.from_bytes(b[16:20], "big"),
                    int.from_bytes(b[20:24], "big"))
        if b[:2] == b"\xff\xd8":
            i = 2
            sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
            while i + 9 <= len(b):
                if b[i] != 0xFF:
                    i += 1
                    continue
                marker = b[i + 1]
                if marker == 0xFF:
                    # spec-legal fill byte (ITU T.81 B.1.1.2): any number
                    # of 0xFF may pad before a marker — consume one
                    i += 1
                    continue
                if marker in sof:
                    return ("jpeg", int.from_bytes(b[i + 7:i + 9], "big"),
                            int.from_bytes(b[i + 5:i + 7], "big"))
                if marker == 0xD9:  # EOI
                    break
                if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
                    i += 2  # standalone markers carry no length
                    continue
                i += 2 + int.from_bytes(b[i + 2:i + 4], "big")
            return None
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            return ("gif", int.from_bytes(b[6:8], "little"),
                    int.from_bytes(b[8:10], "little"))
        if b[:2] == b"BM" and len(b) >= 26:
            h = int.from_bytes(b[22:26], "little", signed=True)
            return ("bmp", int.from_bytes(b[18:22], "little", signed=True),
                    abs(h))
        return None

    def parse_wav_header(blob):
        """(channels, sample_rate, bits_per_sample, data_bytes) from a
        RIFF/WAVE stream by walking its chunk list (word-aligned), or None
        when the RIFF/WAVE signature is absent."""
        b = bytes(blob)
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        i = 12
        ch = sr = bits = None
        data = 0
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            sz = int.from_bytes(b[i + 4:i + 8], "little")
            if cid == b"fmt " and i + 24 <= len(b):
                ch = int.from_bytes(b[i + 10:i + 12], "little")
                sr = int.from_bytes(b[i + 12:i + 16], "little")
                bits = int.from_bytes(b[i + 22:i + 24], "little")
            elif cid == b"data":
                data = sz
            i += 8 + sz + (sz & 1)  # chunks are word-aligned
        if sr is None:
            return None
        return (ch, sr, bits, data)

    return parse_image_header, parse_wav_header


parse_image_header, parse_wav_header = _make_header_parsers()


def _make_header_builders():
    """Builders emitting REAL minimal container files (valid signatures,
    chunk layout, CRCs) — the synthetic-blob side of the header round-trip
    queries; also by-value-picklable for executor closures."""

    def build_png(width, height):
        import struct
        import zlib

        ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
        chunk = b"IHDR" + ihdr
        iend = b"IEND"
        return (b"\x89PNG\r\n\x1a\n"
                + struct.pack(">I", len(ihdr)) + chunk
                + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
                + struct.pack(">I", 0) + iend
                + struct.pack(">I", zlib.crc32(iend) & 0xFFFFFFFF))

    def build_jpeg(width, height):
        import struct

        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" \
            + struct.pack(">HH", 72, 72) + b"\x00\x00"
        sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
                + struct.pack(">HH", height, width) + b"\x01\x11\x00")
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"

    def build_gif(width, height):
        import struct

        return (b"GIF89a" + struct.pack("<HH", width, height)
                + b"\x00\x00\x00\x3b")

    def build_bmp(width, height):
        import struct

        info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0,
                           2835, 2835, 0, 0)
        return (b"BM" + struct.pack("<IHHI", 14 + 40, 0, 0, 54) + info)

    def build_wav(channels, sample_rate, bits, n_samples):
        import struct

        block = channels * bits // 8
        data_len = n_samples * block
        fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                          sample_rate * block, block, bits)
        return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + data_len)
                + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", data_len) + b"\x00" * data_len)

    return build_png, build_jpeg, build_gif, build_bmp, build_wav


build_png, build_jpeg, build_gif, build_bmp, build_wav = _make_header_builders()

HEADER_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_format", T.StringType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
])

AUDIO_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("channels", T.LongType()),
    T.StructField("sample_rate", T.LongType()),
    T.StructField("bits", T.LongType()),
    T.StructField("duration_ms", T.LongType()),
])


def image_header_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL header parse over a binary column: (doc_id,
    payload) → (media_format, width, height, n_bytes). Works on genuine
    PNG/JPEG/GIF/BMP files — no codec library involved; unparseable blobs
    yield NULL format/dims instead of failing the batch."""
    parse, _ = _make_header_parsers()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in it:
            metas = [parse(b) for b in pdf["payload"]]
            yield _pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "media_format": [m[0] if m else None for m in metas],
                "width": [m[1] if m else None for m in metas],
                "height": [m[2] if m else None for m in metas],
                "n_bytes": [len(b) for b in pdf["payload"]],
            })

    return df.mapInPandas(batches, schema=HEADER_SCHEMA)


def wav_header_meta(df: DataFrame) -> DataFrame:
    """RIFF/WAVE header parse: (doc_id, payload) → (channels, sample_rate,
    bits, duration_ms) — duration derived from the data chunk length, the
    standard pre-decode audio triage pass."""
    _, parse = _make_header_parsers()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        rows = {"doc_id": [], "channels": [], "sample_rate": [], "bits": [],
                "duration_ms": []}
        for pdf in it:
            out = {k: [] for k in rows}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = parse(blob)
                out["doc_id"].append(int(doc_id))
                # a corrupt fmt chunk (zero channels/rate, sub-byte sample
                # width) must yield NULLs like any unparseable blob, never
                # a ZeroDivisionError that kills the whole Arrow batch
                if m is None or not (m[0] and m[1] and m[2] >= 8):
                    for k in ("channels", "sample_rate", "bits",
                              "duration_ms"):
                        out[k].append(None)
                    continue
                ch, sr, bits, data = m
                out["channels"].append(ch)
                out["sample_rate"].append(sr)
                out["bits"].append(bits)
                out["duration_ms"].append(
                    data * 1000 // (sr * ch * (bits // 8)))
            yield _pd.DataFrame(out)

    return df.mapInPandas(batches, schema=AUDIO_SCHEMA)
