"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Three tiers, all over the same Arrow-batched ``mapInPandas`` plumbing
(binary columns, metadata structs, explicit output schemas, bounded
per-task batches; blobs never pass through the driver — at 100 TB you size
``spark.sql.files.maxPartitionBytes`` so a task's batch of blobs fits the
executor):

1. REAL header parsers (PNG/JPEG/GIF/BMP/RIFF-WAVE) — pure bytes, work on
   genuine files (``parse_image_header`` / ``parse_wav_header``).
2. REAL pixel/audio codecs for ALL the container formats
   (``_make_pixel_codecs``): PNG (CRC-verified chunk walk, zlib inflate,
   all five scanline unfilters, every 8-bit color type, Adam7
   interlacing), 24-bit BMP (both row orders, padding), GIF (full
   variable-width LZW both directions), baseline grayscale JPEG
   (DCT + optimal Huffman both directions), WAV PCM16, and G.711
   μ-law/A-law companding. Out-of-scope variants (16-bit PNG,
   progressive/chroma JPEG, …) raise named NotImplementedErrors.
3. Deterministic FAKE kernels kept for plumbing-shape tests
   (``fake_decode_meta`` and friends), clearly marked.
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


def real_decode_image(blob: bytes):
    """Real pixel decode for ALL FOUR image containers — see
    ``decode_image_rgb``: PNG (zlib inflate + unfilter, every 8-bit color
    type, Adam7), 24-bit BMP, GIF (full LZW), baseline grayscale JPEG
    (Huffman+DCT). Out-of-scope VARIANTS (16-bit PNG, progressive/chroma
    JPEG, compressed BMP) raise named NotImplementedErrors from inside the
    real decoders, like any codec library. Returns (format, width, height,
    rows) with ``rows`` a top-down list of RGB byte strings."""
    return decode_image_rgb(blob)


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


# --------------------------------------------------------------------------
# REAL pixel/audio codecs — stdlib only (zlib + struct), no codec library.
# PNG: full scanline pipeline — chunk walk with CRC verification, IDAT
# concatenation, zlib inflate, and per-row unfilter implementing all five
# filter types of the PNG spec §9 (None/Sub/Up/Average/Paeth) for 8-bit
# RGB (color type 2). BMP: 24-bit BITMAPINFOHEADER rows, 4-byte row
# padding, bottom-up AND top-down (negative height) orders, BGR→RGB.
# WAV: PCM16 sample decode via the RIFF chunk walker. JPEG/GIF pixel
# decode stays a DOCUMENTED stub (DCT entropy / LZW decode genuinely
# require a codec library; their headers parse via parse_image_header).
#
# Defined in a factory so cloudpickle serializes the functions by value
# into executor closures. The per-pixel Python loops are fine for the
# small-blob kernels here; a production deployment swaps libpng/Pillow
# into the SAME mapInPandas batch shape (that swap point, not the loop,
# is what the plumbing pins down).
# --------------------------------------------------------------------------

def _make_pixel_codecs():
    import struct
    import zlib

    def _paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    _ADAM7 = ((0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
              (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2))

    def _png_filter_scanlines(rows, bpp, f_of_row):
        """Filter a list of equal-length raw scanlines (PNG spec §9):
        each row uses filter type ``f_of_row(r)``; returns the serialized
        filter-byte + filtered-bytes stream."""
        out = bytearray()
        prev = bytes(len(rows[0])) if rows else b""
        for r, row in enumerate(rows):
            f = f_of_row(r)
            filt = bytearray([f])
            for i in range(len(row)):
                x = row[i]
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                if f == 0:
                    v = x
                elif f == 1:
                    v = (x - a) & 0xFF
                elif f == 2:
                    v = (x - b) & 0xFF
                elif f == 3:
                    v = (x - (a + b) // 2) & 0xFF
                else:
                    v = (x - _paeth(a, b, cc)) & 0xFF
                filt.append(v)
            out += filt
            prev = row
        return out

    def encode_png_rgb(width, height, pix, interlace=False):
        """Real PNG encoder: ``pix(r, c) -> (R, G, B)``; scanlines are
        filtered with the full rotation of filter types (row r uses type
        r % 5) so a decoder must implement every unfilter path, then
        zlib-compressed into one IDAT; all chunk CRCs are genuine.
        ``interlace=True`` writes Adam7: the seven passes serialize as
        independent sub-images, each filtered against its own previous
        pass row."""
        full = [b"".join(bytes(pix(r, c)) for c in range(width))
                for r in range(height)]
        if not interlace:
            out = _png_filter_scanlines(full, 3, lambda r: r % 5)
        else:
            out = bytearray()
            for (x0, dx, y0, dy) in _ADAM7:
                pw = (width - x0 + dx - 1) // dx
                ph = (height - y0 + dy - 1) // dy
                if pw <= 0 or ph <= 0:
                    continue
                sub = [b"".join(full[y0 + r * dy][(x0 + c * dx) * 3:
                                                  (x0 + c * dx) * 3 + 3]
                                for c in range(pw))
                       for r in range(ph)]
                out += _png_filter_scanlines(sub, 3, lambda r: r % 5)

        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

        ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0,
                           1 if interlace else 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(out)))
                + chunk(b"IEND", b""))

    def _png_unfilter(raw, pos, wpx, hpx, bpp):
        """Unfilter ``hpx`` scanlines of ``wpx`` pixels at ``bpp`` bytes
        each (all five PNG filter types); returns (rows, new_pos)."""
        stride = wpx * bpp
        rows = []
        prev = bytearray(stride)
        for _r in range(hpx):
            if pos >= len(raw):
                raise ValueError("PNG scanline payload truncated")
            f = raw[pos]
            cur = bytearray(raw[pos + 1:pos + 1 + stride])
            if len(cur) < stride:
                raise ValueError("PNG scanline payload truncated")
            pos += 1 + stride
            if f == 1:
                for i2 in range(bpp, stride):
                    cur[i2] = (cur[i2] + cur[i2 - bpp]) & 0xFF
            elif f == 2:
                for i2 in range(stride):
                    cur[i2] = (cur[i2] + prev[i2]) & 0xFF
            elif f == 3:
                for i2 in range(stride):
                    a = cur[i2 - bpp] if i2 >= bpp else 0
                    cur[i2] = (cur[i2] + (a + prev[i2]) // 2) & 0xFF
            elif f == 4:
                for i2 in range(stride):
                    a = cur[i2 - bpp] if i2 >= bpp else 0
                    cc = prev[i2 - bpp] if i2 >= bpp else 0
                    cur[i2] = (cur[i2] + _paeth(a, prev[i2], cc)) & 0xFF
            elif f != 0:
                raise ValueError(f"PNG filter type {f} out of range")
            rows.append(bytes(cur))
            prev = cur
        return rows, pos

    def decode_png_rgb(blob):
        """Real PNG decoder for EVERY 8-bit color type — 0 grayscale,
        2 RGB, 3 palette (PLTE), 4 gray+alpha, 6 RGBA — plus Adam7
        interlacing: CRC-verified chunk walk, IDAT inflate, all five
        unfilter types at the color type's bytes-per-pixel, per-pass
        reconstruction for interlaced streams. Returns (width, height,
        rows) with rows top-down RGB byte strings (alpha channels are
        dropped; 16-bit depths raise NotImplementedError by name)."""
        b = bytes(blob)
        if b[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG stream")
        i = 8
        width = height = None
        plte = None
        idat = bytearray()
        while i + 12 <= len(b):
            ln = int.from_bytes(b[i:i + 4], "big")
            tag = b[i + 4:i + 8]
            data = b[i + 8:i + 8 + ln]
            crc = int.from_bytes(b[i + 8 + ln:i + 12 + ln], "big")
            if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
            if tag == b"IHDR":
                width, height, depth, ctype = struct.unpack(">IIBB", data[:10])
                if depth != 8:
                    raise NotImplementedError(
                        f"PNG decode implemented for 8-bit depth; got "
                        f"depth={depth}")
                if ctype not in (0, 2, 3, 4, 6):
                    raise ValueError(f"PNG color type {ctype} invalid")
                interlace = data[12]
                if interlace not in (0, 1):
                    raise ValueError("PNG interlace method invalid")
            elif tag == b"PLTE":
                plte = [tuple(data[j:j + 3]) for j in range(0, len(data), 3)]
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
            i += 12 + ln
        if width is None:
            raise ValueError("PNG missing IHDR")
        raw = zlib.decompress(bytes(idat))
        bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
        if interlace == 0:
            raws, pos = _png_unfilter(raw, 0, width, height, bpp)
            if pos != len(raw):
                raise ValueError("PNG scanline payload length mismatch")
        else:
            canvas = [bytearray(width * bpp) for _ in range(height)]
            pos = 0
            for (x0, dx, y0, dy) in _ADAM7:
                pw = (width - x0 + dx - 1) // dx
                ph = (height - y0 + dy - 1) // dy
                if pw <= 0 or ph <= 0:
                    continue
                prows, pos = _png_unfilter(raw, pos, pw, ph, bpp)
                for ri, line in enumerate(prows):
                    y = y0 + ri * dy
                    for ci in range(pw):
                        x = x0 + ci * dx
                        canvas[y][x * bpp:(x + 1) * bpp] = \
                            line[ci * bpp:(ci + 1) * bpp]
            if pos != len(raw):
                raise ValueError("PNG scanline payload length mismatch")
            raws = [bytes(r) for r in canvas]
        # normalize every color type to RGB rows
        if ctype == 2:
            return width, height, raws
        rows = []
        for line in raws:
            px = bytearray(width * 3)
            if ctype == 0:
                px[0::3] = line
                px[1::3] = line
                px[2::3] = line
            elif ctype == 4:
                g = line[0::2]
                px[0::3] = g
                px[1::3] = g
                px[2::3] = g
            elif ctype == 6:
                px[0::3] = line[0::4]
                px[1::3] = line[1::4]
                px[2::3] = line[2::4]
            else:  # 3: palette
                if plte is None:
                    raise ValueError("PNG palette image missing PLTE")
                for c, idx in enumerate(line):
                    px[c * 3:c * 3 + 3] = bytes(plte[idx])
            rows.append(bytes(px))
        return width, height, rows

    def encode_bmp_rgb(width, height, pix, top_down=False):
        """Real 24-bit BMP encoder: BITMAPFILEHEADER + BITMAPINFOHEADER,
        BGR byte order, rows padded to 4-byte boundaries, bottom-up by
        default or top-down via negative biHeight."""
        pad = (-(width * 3)) % 4
        body = bytearray()
        order = range(height) if top_down else range(height - 1, -1, -1)
        for r in order:
            for c in range(width):
                rr, gg, bb = pix(r, c)
                body += bytes((bb, gg, rr))
            body += b"\x00" * pad
        info = struct.pack("<IiiHHIIiiII", 40, width,
                           -height if top_down else height,
                           1, 24, 0, len(body), 2835, 2835, 0, 0)
        return (b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
                + info + bytes(body))

    def decode_bmp_rgb(blob):
        """Real 24-bit BMP decoder: honors the pixel-array offset, row
        padding, and both row orders. Returns (width, height, rows) with
        rows top-down RGB byte strings."""
        b = bytes(blob)
        if b[:2] != b"BM" or len(b) < 54:
            raise ValueError("not a BMP stream")
        off = int.from_bytes(b[10:14], "little")
        width = int.from_bytes(b[18:22], "little", signed=True)
        raw_h = int.from_bytes(b[22:26], "little", signed=True)
        bpp = int.from_bytes(b[28:30], "little")
        comp = int.from_bytes(b[30:34], "little")
        if bpp != 24 or comp != 0:
            raise NotImplementedError(
                f"BMP decode implemented for uncompressed 24bpp; got "
                f"bpp={bpp} compression={comp}")
        height = abs(raw_h)
        top_down = raw_h < 0
        stride = width * 3 + ((-(width * 3)) % 4)
        rows = []
        for r in range(height):
            src = r if top_down else height - 1 - r
            line = b[off + src * stride: off + src * stride + width * 3]
            if len(line) < width * 3:
                raise ValueError("BMP pixel array truncated")
            px = bytearray(width * 3)
            px[0::3] = line[2::3]  # R <- byte 2 of each BGR triple
            px[1::3] = line[1::3]
            px[2::3] = line[0::3]
            rows.append(bytes(px))
        return width, height, rows

    # ---- GIF: REAL LZW codec (GIF89a §§15-22, Welch 1984) --------------
    # Variable-width LZW with the GIF conventions: clear/end codes, code
    # width growth up to 12 bits ("late change" on the encoder side — the
    # decoder's string table trails the encoder's by one entry, so the
    # encoder widens one code later than the decoder), deferred-clear
    # tolerant, data packaged in ≤255-byte sub-blocks.

    def _gif_lzw_decode(min_code_size, data):
        clear = 1 << min_code_size
        end = clear + 1
        code_size = min_code_size + 1
        table = {i: (i,) for i in range(clear)}
        next_code = end + 1
        out = []
        prev = None
        bitpos = 0
        total_bits = len(data) * 8
        while True:
            if bitpos + code_size > total_bits:
                break
            code = 0
            for i in range(code_size):
                if (data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1:
                    code |= 1 << i
            bitpos += code_size
            if code == end:
                break
            if code == clear:
                code_size = min_code_size + 1
                table = {i: (i,) for i in range(clear)}
                next_code = end + 1
                prev = None
                continue
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)  # the cScSc special case
            else:
                raise ValueError(f"GIF LZW: code {code} out of sequence")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
        return out

    def _gif_lzw_encode(min_code_size, pixels):
        clear = 1 << min_code_size
        end = clear + 1
        code_size = min_code_size + 1
        table = {(i,): i for i in range(clear)}
        next_code = end + 1
        bits = bytearray()
        acc = 0
        nacc = 0

        out = bytearray()

        def emit(code):
            nonlocal acc, nacc
            acc |= code << nacc
            nacc += code_size
            while nacc >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8

        emit(clear)
        w = ()
        for px in pixels:
            wk = w + (px,)
            if wk in table:
                w = wk
                continue
            emit(table[w])
            if next_code < 4096:
                table[wk] = next_code
                next_code += 1
                # late change: widen AFTER the decoder would (its table
                # trails ours by one entry at read time)
                if next_code == (1 << code_size) + 1 and code_size < 12:
                    code_size += 1
            else:
                emit(clear)
                code_size = min_code_size + 1
                table = {(i,): i for i in range(clear)}
                next_code = end + 1
            w = (px,)
        if w:
            emit(table[w])
        emit(end)
        if nacc:
            out.append(acc & 0xFF)
        del bits
        return bytes(out)

    _GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

    def encode_gif_indexed(width, height, idx, palette, interlace=False):
        """Real GIF89a encoder: ``idx(r, c)`` gives the palette index of
        each pixel; ``palette`` is a list of (R, G, B) whose length is a
        power of two ≤256. True variable-width LZW compression, optional
        interlaced row order, global color table."""
        n_pal = len(palette)
        bits_pp = max(1, (n_pal - 1).bit_length())
        if (1 << bits_pp) != n_pal:
            raise ValueError("GIF palette length must be a power of two")
        min_code = max(2, bits_pp)
        gct = b"".join(bytes(p) for p in palette)
        lsd = struct.pack("<HHBBB", width, height,
                          0x80 | ((bits_pp - 1) << 4) | (bits_pp - 1), 0, 0)
        if interlace:
            order = [r for start, step in _GIF_PASSES
                     for r in range(start, height, step)]
        else:
            order = range(height)
        pixels = [idx(r, c) for r in order for c in range(width)]
        lzw = _gif_lzw_encode(min_code, pixels)
        sub = b"".join(
            bytes([min(255, len(lzw) - i)]) + lzw[i:i + 255]
            for i in range(0, len(lzw), 255)) + b"\x00"
        imd = struct.pack("<BHHHHB", 0x2C, 0, 0, width, height,
                          0x40 if interlace else 0)
        return (b"GIF89a" + lsd + gct + imd + bytes([min_code]) + sub
                + b"\x3b")

    def decode_gif_rgb(blob):
        """Real GIF decoder: logical screen descriptor, global/local color
        tables, extension-block skipping, sub-block reassembly, full LZW
        decompression, interlace reordering. Returns (width, height, rows)
        as top-down RGB byte strings for the FIRST image in the stream."""
        b = bytes(blob)
        if b[:6] not in (b"GIF87a", b"GIF89a"):
            raise ValueError("not a GIF stream")
        sw = int.from_bytes(b[6:8], "little")
        sh = int.from_bytes(b[8:10], "little")
        packed = b[10]
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = [tuple(b[pos + 3 * i:pos + 3 * i + 3]) for i in range(n)]
            pos += 3 * n
        while pos < len(b):
            block = b[pos]
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension: label + sub-blocks
                pos += 2
                while pos < len(b) and b[pos] != 0:
                    pos += 1 + b[pos]
                pos += 1
                continue
            if block != 0x2C:
                raise ValueError(f"GIF: unexpected block 0x{block:02x}")
            width = int.from_bytes(b[pos + 5:pos + 7], "little")
            height = int.from_bytes(b[pos + 7:pos + 9], "little")
            ipacked = b[pos + 9]
            pos += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = [tuple(b[pos + 3 * i:pos + 3 * i + 3])
                       for i in range(n)]
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image has no color table")
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while pos < len(b) and b[pos] != 0:
                ln = b[pos]
                data += b[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idxs = _gif_lzw_decode(min_code, bytes(data))
            if len(idxs) < width * height:
                raise ValueError("GIF pixel data truncated")
            rows = [None] * height
            if ipacked & 0x40:  # interlaced
                order = [r for start, step in _GIF_PASSES
                         for r in range(start, height, step)]
            else:
                order = range(height)
            for out_i, r in enumerate(order):
                line = bytearray()
                for c in range(width):
                    line += bytes(pal[idxs[out_i * width + c]])
                rows[r] = bytes(line)
            return width, height, rows
        raise ValueError(f"GIF: no image descriptor (screen {sw}x{sh})")

    # ---- JPEG: REAL baseline codec, grayscale (ITU T.81) ---------------
    # Full entropy pipeline both directions: level shift, orthonormal 2D
    # DCT as two 8×8 matrix products (numpy), quantization, zigzag, DC
    # prediction, (run, size) AC run-length symbols with ZRL/EOB,
    # OPTIMAL per-image Huffman tables written to DHT (the decoder
    # reconstructs canonical codes from BITS/HUFFVAL like any JPEG
    # reader), MSB-first bit packing with 0xFF byte stuffing. Scope:
    # baseline sequential, single 8-bit component (grayscale), no
    # chroma subsampling / progressive / restart markers — those raise
    # a named NotImplementedError. Constant 8×8 tiles survive the
    # DCT→quantize→IDCT round trip BIT-EXACTLY (only the DC coefficient
    # is nonzero and it is an exact multiple of 8), which is what the
    # value-pinned oracle query exploits; arbitrary images round-trip
    # within ±2 gray levels at quant=1 (float DCT + coefficient
    # rounding), asserted in tests.

    _ZZ = []
    for _s in range(15):
        _rs = list(range(max(0, _s - 7), min(7, _s) + 1))
        if _s % 2 == 0:
            _rs.reverse()
        for _r in _rs:
            _ZZ.append((_r, _s - _r))

    def _dct_matrix():
        import math

        import numpy as np

        m = np.zeros((8, 8))
        for u in range(8):
            for x in range(8):
                cu = math.sqrt(1.0 / 8) if u == 0 else math.sqrt(2.0 / 8)
                m[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16)
        return m

    def _huff_lengths(freqs):
        """Symbol → canonical code length via plain Huffman (heapq);
        alphabets here are ≤ 176 symbols on ≥1 counts, so lengths stay
        far below JPEG's 16-bit cap (asserted)."""
        import heapq
        import itertools

        heap = [(f, n, (s,)) for n, (s, f) in
                enumerate(it for it in freqs.items() if it[1] > 0)]
        heapq.heapify(heap)
        if len(heap) == 1:
            return {heap[0][2][0]: 1}
        counter = itertools.count(len(heap))
        depth = {}
        while len(heap) > 1:
            f1, _, s1 = heapq.heappop(heap)
            f2, _, s2 = heapq.heappop(heap)
            for s in s1 + s2:
                depth[s] = depth.get(s, 0) + 1
            heapq.heappush(heap, (f1 + f2, next(counter), s1 + s2))
        assert max(depth.values()) <= 16, "JPEG Huffman length overflow"
        return depth

    def _canonical_codes(lengths):
        """(BITS, HUFFVAL, symbol→(code, length)) — canonical assignment
        in (length, symbol) order, exactly how DHT is interpreted."""
        by = sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))
        bits = [0] * 17
        huffval = []
        codes = {}
        code = 0
        prev_len = 0
        for sym, ln in by:
            code <<= (ln - prev_len)
            codes[sym] = (code, ln)
            code += 1
            prev_len = ln
            bits[ln] += 1
            huffval.append(sym)
        return bits, huffval, codes

    def _mag_cat(v):
        return 0 if v == 0 else abs(v).bit_length()

    def encode_jpeg_gray(width, height, pix):
        """Real baseline JPEG encoder (grayscale, quant table all ones —
        maximum fidelity): ``pix`` is either ``pix(r, c) -> 0..255`` or a
        (height, width) numpy array (the vectorized fast path the
        registered query uses — per-pixel Python calls dominate
        otherwise). Two passes: collect DC/AC symbol frequencies, build
        optimal Huffman tables, then entropy-encode. Emits
        SOI/APP0/DQT/SOF0/DHT×2/SOS/EOI."""
        import numpy as np

        M = _dct_matrix()
        bw, bh = (width + 7) // 8, (height + 7) // 8
        if isinstance(pix, np.ndarray):
            img = np.pad(pix.astype(np.float64),
                         ((0, bh * 8 - height), (0, bw * 8 - width)),
                         mode="edge")
        else:
            img = np.zeros((bh * 8, bw * 8), dtype=np.float64)
            for r in range(bh * 8):
                for c in range(bw * 8):
                    img[r, c] = pix(min(r, height - 1), min(c, width - 1))
        blocks = []
        for br in range(bh):
            for bc in range(bw):
                blk = img[br * 8:br * 8 + 8, bc * 8:bc * 8 + 8] - 128.0
                coef = M @ blk @ M.T
                q = np.rint(coef).astype(np.int64)
                blocks.append([int(q[r, c]) for (r, c) in _ZZ])

        # pass 1: symbol streams + frequencies
        dc_syms, ac_syms = [], []
        pred = 0
        per_block = []
        for zz in blocks:
            diff = zz[0] - pred
            pred = zz[0]
            ds = _mag_cat(diff)
            dc_syms.append(ds)
            events = [("dc", ds, diff)]
            run = 0
            last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    events.append(("ac", 0xF0, 0))
                    ac_syms.append(0xF0)
                    run -= 16
                sz = _mag_cat(zz[k])
                sym = (run << 4) | sz
                events.append(("ac", sym, zz[k]))
                ac_syms.append(sym)
                run = 0
            if last_nz < 63:
                events.append(("ac", 0x00, 0))
                ac_syms.append(0x00)
            per_block.append(events)

        def freq(syms):
            f = {}
            for s in syms:
                f[s] = f.get(s, 0) + 1
            return f

        dc_bits, dc_vals, dc_codes = _canonical_codes(_huff_lengths(freq(dc_syms)))
        ac_bits, ac_vals, ac_codes = _canonical_codes(_huff_lengths(freq(ac_syms)))

        # pass 2: entropy-coded segment, MSB-first + byte stuffing
        out = bytearray()
        acc = {"v": 0, "n": 0}

        def put(code, length):
            acc["v"] = (acc["v"] << length) | code
            acc["n"] += length
            while acc["n"] >= 8:
                byte = (acc["v"] >> (acc["n"] - 8)) & 0xFF
                out.append(byte)
                if byte == 0xFF:
                    out.append(0x00)
                acc["n"] -= 8
                acc["v"] &= (1 << acc["n"]) - 1

        for events in per_block:
            for kind, sym, val in events:
                code, ln = (dc_codes if kind == "dc" else ac_codes)[sym]
                put(code, ln)
                sz = sym & 15 if kind == "ac" else sym
                if sz:
                    put(val if val > 0 else val + (1 << sz) - 1, sz)
        if acc["n"]:
            pad = 8 - acc["n"]
            put((1 << pad) - 1, pad)  # 1-bit padding per spec

        def seg(marker, payload):
            return bytes([0xFF, marker]) + struct.pack(
                ">H", len(payload) + 2) + payload

        def dht(cls, bits, vals):
            return seg(0xC4, bytes([cls << 4]) + bytes(bits[1:17])
                       + bytes(vals))

        app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00"
                   + struct.pack(">HH", 72, 72) + b"\x00\x00")
        dqt = seg(0xDB, b"\x00" + b"\x01" * 64)
        sof0 = seg(0xC0, b"\x08" + struct.pack(">HH", height, width)
                   + b"\x01" + b"\x01\x11\x00")
        sos = seg(0xDA, b"\x01" + b"\x01\x00" + b"\x00\x3f\x00")
        return (b"\xff\xd8" + app0 + dqt + sof0
                + dht(0, dc_bits, dc_vals) + dht(1, ac_bits, ac_vals)
                + sos + bytes(out) + b"\xff\xd9")

    def decode_jpeg_gray(blob):
        """Real baseline JPEG decoder (grayscale): marker walk, DQT/DHT
        (canonical codes from BITS/HUFFVAL), SOF0 validation, Huffman +
        magnitude decode with DC prediction, dequantize, dezigzag,
        IDCT, clamp. Returns (width, height, rows) of 8-bit gray
        bytes. Progressive / multi-component / restart-interval streams
        raise NotImplementedError by name."""
        import numpy as np

        b = bytes(blob)
        if b[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG stream")
        i = 2
        qtabs = {}
        htabs = {}
        width = height = None
        data = None
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker == 0xD9:
                break
            if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                          0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    f"JPEG SOF{marker - 0xC0}: only baseline sequential "
                    "(SOF0) is implemented")
            ln = int.from_bytes(b[i + 2:i + 4], "big")
            payload = b[i + 4:i + 2 + ln]
            if marker == 0xDB:
                p = 0
                while p < len(payload):
                    pq, tq = payload[p] >> 4, payload[p] & 15
                    if pq != 0:
                        raise NotImplementedError("16-bit quant table")
                    qtabs[tq] = list(payload[p + 1:p + 65])
                    p += 65
            elif marker == 0xC4:
                p = 0
                while p < len(payload):
                    cls, tid = payload[p] >> 4, payload[p] & 15
                    bits = [0] + list(payload[p + 1:p + 17])
                    nval = sum(bits)
                    vals = list(payload[p + 17:p + 17 + nval])
                    lengths = {}
                    vi = 0
                    for L in range(1, 17):
                        for _ in range(bits[L]):
                            lengths[vals[vi]] = L
                            vi += 1
                    # canonical codes must follow DHT order (BITS/HUFFVAL
                    # sequence), not symbol order
                    codes = {}
                    code = 0
                    prev = 0
                    vi = 0
                    for L in range(1, 17):
                        code <<= (L - prev)
                        prev = L
                        for _ in range(bits[L]):
                            codes[(L, code)] = vals[vi]
                            code += 1
                            vi += 1
                    htabs[(cls, tid)] = codes
                    p += 17 + nval
            elif marker == 0xC0:
                height = int.from_bytes(payload[1:3], "big")
                width = int.from_bytes(payload[3:5], "big")
                ncomp = payload[5]
                if ncomp != 1:
                    raise NotImplementedError(
                        f"JPEG with {ncomp} components: only grayscale "
                        "(1 component) is implemented")
                if payload[6 + 1] != 0x11:
                    raise NotImplementedError("JPEG chroma subsampling")
                qsel = payload[6 + 2]
            elif marker == 0xDD:
                raise NotImplementedError("JPEG restart intervals (DRI)")
            elif marker == 0xDA:
                td, ta = payload[2] >> 4, payload[2] & 15
                j = i + 2 + ln
                raw = bytearray()
                while j < len(b) - 1:
                    if b[j] == 0xFF:
                        if b[j + 1] == 0x00:
                            raw.append(0xFF)
                            j += 2
                            continue
                        if 0xD0 <= b[j + 1] <= 0xD7:
                            raise NotImplementedError(
                                "JPEG restart markers (RSTn)")
                        break
                    raw.append(b[j])
                    j += 1
                data = bytes(raw)
                break
            i += 2 + ln
        if width is None or data is None:
            raise ValueError("JPEG missing SOF0/SOS")
        q = qtabs[qsel]
        dc_codes, ac_codes = htabs[(0, td)], htabs[(1, ta)]
        M = _dct_matrix()
        bw, bh = (width + 7) // 8, (height + 7) // 8
        pos = {"bit": 0}
        total = len(data) * 8

        def read_bit():
            p = pos["bit"]
            if p >= total:
                raise ValueError("JPEG entropy data exhausted")
            pos["bit"] += 1
            return (data[p >> 3] >> (7 - (p & 7))) & 1

        def read_sym(codes):
            code = 0
            for L in range(1, 17):
                code = (code << 1) | read_bit()
                if (L, code) in codes:
                    return codes[(L, code)]
            raise ValueError("JPEG: invalid Huffman code")

        def read_val(sz):
            v = 0
            for _ in range(sz):
                v = (v << 1) | read_bit()
            if sz and v < (1 << (sz - 1)):
                v -= (1 << sz) - 1
            return v

        out = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        pred = 0
        for br in range(bh):
            for bc in range(bw):
                zz = [0] * 64
                ds = read_sym(dc_codes)
                pred += read_val(ds)
                zz[0] = pred * q[0]
                k = 1
                while k < 64:
                    sym = read_sym(ac_codes)
                    if sym == 0x00:
                        break
                    if sym == 0xF0:
                        k += 16
                        continue
                    k += sym >> 4
                    if k > 63:
                        raise ValueError("JPEG: AC index out of range")
                    zz[k] = read_val(sym & 15) * q[k]
                    k += 1
                coef = np.zeros((8, 8))
                for idx, (r, c) in enumerate(_ZZ):
                    coef[r, c] = zz[idx]
                blk = M.T @ coef @ M + 128.0
                out[br * 8:br * 8 + 8, bc * 8:bc * 8 + 8] = blk
        clamped = np.clip(np.rint(out), 0, 255).astype(np.uint8)
        rows = [bytes(clamped[r, :width]) for r in range(height)]
        return width, height, rows

    def decode_image_rgb(blob):
        """Dispatching pixel decode — ALL FOUR containers are REAL now:
        PNG (inflate+unfilter), 24-bit BMP, GIF (full LZW), baseline
        grayscale JPEG (Huffman+DCT; gray expanded to RGB). JPEG
        variants outside baseline-grayscale (progressive, chroma
        components, restart markers) raise a NAMED NotImplementedError
        from the JPEG decoder itself."""
        b = bytes(blob)
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            return ("png",) + decode_png_rgb(b)
        if b[:2] == b"BM":
            return ("bmp",) + decode_bmp_rgb(b)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            return ("gif",) + decode_gif_rgb(b)
        if b[:2] == b"\xff\xd8":
            w, h, gray = decode_jpeg_gray(b)
            rows = []
            for line in gray:
                px = bytearray(w * 3)
                px[0::3] = line
                px[1::3] = line
                px[2::3] = line
                rows.append(bytes(px))
            return ("jpeg", w, h, rows)
        raise ValueError("unknown image container")

    def resize_nearest_rgb(width, height, rows, out_w, out_h):
        """Nearest-neighbor resample of a decoded RGB image: output pixel
        (R, C) reads source pixel (R*height//out_h, C*width//out_w) — the
        standard integer NN mapping, exactly reproducible in SQL."""
        out = []
        for r_out in range(out_h):
            src = rows[r_out * height // out_h]
            line = bytearray()
            for c_out in range(out_w):
                c_src = c_out * width // out_w
                line += src[c_src * 3:c_src * 3 + 3]
            out.append(bytes(line))
        return out

    def encode_wav_pcm16(channels, sample_rate, samples):
        """Real PCM16 WAV encoder: interleaved int16 samples into a
        RIFF/WAVE fmt+data layout."""
        data = struct.pack(f"<{len(samples)}h", *samples)
        fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                          sample_rate * channels * 2, channels * 2, 16)
        return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)

    def decode_wav_pcm16(blob):
        """Real PCM16 WAV decoder via the RIFF chunk walk: returns
        (channels, sample_rate, samples) with samples the interleaved
        int16 stream."""
        b = bytes(blob)
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE stream")
        i = 12
        ch = sr = bits = fmt_tag = None
        data = b""
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            sz = int.from_bytes(b[i + 4:i + 8], "little")
            if cid == b"fmt " and i + 24 <= len(b):
                fmt_tag = int.from_bytes(b[i + 8:i + 10], "little")
                ch = int.from_bytes(b[i + 10:i + 12], "little")
                sr = int.from_bytes(b[i + 12:i + 16], "little")
                bits = int.from_bytes(b[i + 22:i + 24], "little")
            elif cid == b"data":
                data = b[i + 8:i + 8 + sz]
            i += 8 + sz + (sz & 1)
        if sr is None:
            raise ValueError("WAV missing fmt chunk")
        if fmt_tag != 1 or bits != 16:
            raise NotImplementedError(
                f"WAV decode implemented for PCM16 (format tag 1); got "
                f"tag={fmt_tag} bits={bits}")
        n = len(data) // 2
        samples = list(struct.unpack(f"<{n}h", data[:n * 2]))
        return ch, sr, samples

    # ---- G.711 μ-law / A-law (ITU-T G.711) -----------------------------
    # The telephony companding codecs — 8 kHz speech corpora (call-center
    # data, classic ASR sets) arrive in these. Bit-exact integer
    # algorithms, so decode(encode(s)) has a CLOSED FORM a SQL oracle
    # reproduces (segment by magnitude range, mantissa by shift).

    def g711_ulaw_encode(s):
        sign = 0x80 if s < 0 else 0
        m = min(32635, abs(s)) + 0x84
        seg = m.bit_length() - 8
        return ~(sign | (seg << 4) | ((m >> (seg + 3)) & 0xF)) & 0xFF

    def g711_ulaw_decode(u):
        u = ~u & 0xFF
        seg = (u >> 4) & 7
        v = ((((u & 0xF) << 3) + 0x84) << seg) - 0x84
        return -v if u & 0x80 else v

    def g711_alaw_encode(s):
        sign = 0x80 if s >= 0 else 0
        a = min(32767, abs(s)) >> 3  # 13-bit magnitude
        if a < 32:
            seg, mant = 0, a >> 1
        else:
            seg = a.bit_length() - 5
            mant = (a >> seg) & 0xF
        return (sign | (seg << 4) | mant) ^ 0x55

    def g711_alaw_decode(code):
        code ^= 0x55
        seg = (code >> 4) & 7
        mant = code & 0xF
        if seg == 0:
            v = (mant << 1) + 1
        else:
            v = (((mant | 0x10) << 1) | 1) << (seg - 1)
        v <<= 3
        return v if code & 0x80 else -v

    def encode_wav_g711(channels, sample_rate, samples, law="ulaw"):
        """Real G.711 WAV: PCM16 samples companded to 8-bit μ-law (format
        tag 7) or A-law (tag 6) in a RIFF/WAVE container."""
        enc = g711_ulaw_encode if law == "ulaw" else g711_alaw_encode
        tag = 7 if law == "ulaw" else 6
        data = bytes(enc(s) for s in samples)
        fmt = struct.pack("<HHIIHH", tag, channels, sample_rate,
                          sample_rate * channels, channels, 8)
        return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)

    def decode_wav_g711(blob):
        """Real G.711 WAV decode: expands μ-law/A-law bytes back to
        linear PCM16. Returns (channels, sample_rate, samples)."""
        b = bytes(blob)
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE stream")
        i = 12
        ch = sr = bits = fmt_tag = None
        data = b""
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            sz = int.from_bytes(b[i + 4:i + 8], "little")
            if cid == b"fmt " and i + 24 <= len(b):
                fmt_tag = int.from_bytes(b[i + 8:i + 10], "little")
                ch = int.from_bytes(b[i + 10:i + 12], "little")
                sr = int.from_bytes(b[i + 12:i + 16], "little")
                bits = int.from_bytes(b[i + 22:i + 24], "little")
            elif cid == b"data":
                data = b[i + 8:i + 8 + sz]
            i += 8 + sz + (sz & 1)
        if sr is None:
            raise ValueError("WAV missing fmt chunk")
        if fmt_tag not in (6, 7) or bits != 8:
            raise NotImplementedError(
                f"G.711 WAV decode needs format tag 6 (A-law) or 7 "
                f"(mu-law) at 8 bits; got tag={fmt_tag} bits={bits}")
        dec = g711_ulaw_decode if fmt_tag == 7 else g711_alaw_decode
        return ch, sr, [dec(x) for x in data]

    return (encode_png_rgb, decode_png_rgb, encode_bmp_rgb, decode_bmp_rgb,
            decode_image_rgb, resize_nearest_rgb, encode_wav_pcm16,
            decode_wav_pcm16, encode_gif_indexed, decode_gif_rgb,
            encode_jpeg_gray, decode_jpeg_gray, encode_wav_g711,
            decode_wav_g711)


(encode_png_rgb, decode_png_rgb, encode_bmp_rgb, decode_bmp_rgb,
 decode_image_rgb, resize_nearest_rgb, encode_wav_pcm16,
 decode_wav_pcm16, encode_gif_indexed, decode_gif_rgb,
 encode_jpeg_gray, decode_jpeg_gray, encode_wav_g711,
 decode_wav_g711) = _make_pixel_codecs()


PIXEL_STATS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_format", T.StringType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("red_sum", T.LongType()),
    T.StructField("green_sum", T.LongType()),
    T.StructField("blue_sum", T.LongType()),
    T.StructField("red_pos_weighted", T.LongType()),
])


def decode_pixel_stats(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL pixel decode over a binary column: PNG blobs go
    through CRC-verified inflate + unfilter, BMPs through padded-row
    BGR→RGB reads; per-image channel sums plus a position-weighted red sum
    (Σ (r*width + c) · R(r,c)) that pins ORIENTATION — a decoder that
    flips rows (e.g. mishandles BMP bottom-up) or transposes axes produces
    the right channel sums but the wrong weighted sum.

    Scale: one task decodes one Arrow batch of blobs at a time; blobs
    never visit the driver. The per-pixel Python loop is the honest
    container-bound kernel — production swaps libpng into this exact
    mapInPandas shape."""
    codecs = _make_pixel_codecs()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        decode = codecs[4]
        for pdf in it:
            out = {k: [] for k in ("doc_id", "media_format", "width",
                                   "height", "red_sum", "green_sum",
                                   "blue_sum", "red_pos_weighted")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                fmt, w, h, rows = decode(blob)
                rs = gs = bs = wsum = 0
                for r, line in enumerate(rows):
                    base = r * w
                    rvals = line[0::3]
                    rs += sum(rvals)
                    gs += sum(line[1::3])
                    bs += sum(line[2::3])
                    wsum += sum((base + c) * v for c, v in enumerate(rvals))
                out["doc_id"].append(int(doc_id))
                out["media_format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["red_sum"].append(rs)
                out["green_sum"].append(gs)
                out["blue_sum"].append(bs)
                out["red_pos_weighted"].append(wsum)
            yield _pd.DataFrame(out)

    return df.mapInPandas(batches, schema=PIXEL_STATS_SCHEMA)


RESIZE_REAL_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("red_sum", T.LongType()),
    T.StructField("green_sum", T.LongType()),
    T.StructField("blue_sum", T.LongType()),
])


def resize_images_real(df: DataFrame, out_w: int = 8, out_h: int = 6) -> DataFrame:
    """REAL thumbnailer: decode (PNG/BMP) → nearest-neighbor resample →
    re-encode as PNG, binary-in/binary-out so downstream stages chain;
    channel sums of the RESIZED image ride along so the value oracle can
    pin the integer NN mapping (src row = r*h//out_h, src col =
    c*w//out_w) without decoding the output blob."""
    codecs = _make_pixel_codecs()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        encode_png, decode, resize = codecs[0], codecs[4], codecs[5]
        for pdf in it:
            out = {k: [] for k in ("doc_id", "payload", "width", "height",
                                   "red_sum", "green_sum", "blue_sum")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                _fmt, w, h, rows = decode(blob)
                small = resize(w, h, rows, out_w, out_h)
                out["doc_id"].append(int(doc_id))
                out["payload"].append(encode_png(
                    out_w, out_h,
                    lambda r, c: tuple(small[r][c * 3:c * 3 + 3])))
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["red_sum"].append(sum(sum(l[0::3]) for l in small))
                out["green_sum"].append(sum(sum(l[1::3]) for l in small))
                out["blue_sum"].append(sum(sum(l[2::3]) for l in small))
            yield _pd.DataFrame(out)

    return df.mapInPandas(batches, schema=RESIZE_REAL_SCHEMA)


PCM_STATS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("channels", T.LongType()),
    T.StructField("sample_rate", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("sample_sum", T.LongType()),
    T.StructField("sample_min", T.LongType()),
    T.StructField("sample_max", T.LongType()),
])


def decode_pcm_stats(df: DataFrame) -> DataFrame:
    """REAL PCM16 decode over WAV blobs: interleaved int16 stream →
    per-clip sum/min/max — the signal-level triage a 100 TB audio
    pipeline runs after the header pass."""
    codecs = _make_pixel_codecs()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        decode = codecs[7]
        for pdf in it:
            out = {k: [] for k in ("doc_id", "channels", "sample_rate",
                                   "n_samples", "sample_sum", "sample_min",
                                   "sample_max")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                ch, sr, samples = decode(blob)
                out["doc_id"].append(int(doc_id))
                out["channels"].append(ch)
                out["sample_rate"].append(sr)
                out["n_samples"].append(len(samples))
                out["sample_sum"].append(sum(samples))
                out["sample_min"].append(min(samples))
                out["sample_max"].append(max(samples))
            yield _pd.DataFrame(out)

    return df.mapInPandas(batches, schema=PCM_STATS_SCHEMA)


PCM_WINDOW_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("win_idx", T.LongType()),
    T.StructField("win_len", T.LongType()),
    T.StructField("abs_sum", T.LongType()),
])


def pcm_window_energy(df: DataFrame, window: int = 64) -> DataFrame:
    """REAL audio windowing: decode PCM16, fan each clip out to one row
    per fixed-length sample window with Σ|s| per window — the framing +
    energy step of VAD/fingerprinting, 1→N over genuine WAV bytes."""
    codecs = _make_pixel_codecs()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        decode = codecs[7]
        w = window
        for pdf in it:
            out = {k: [] for k in ("doc_id", "win_idx", "win_len",
                                   "abs_sum")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                _ch, _sr, samples = decode(blob)
                for idx in range((len(samples) + w - 1) // w):
                    chunk = samples[idx * w:(idx + 1) * w]
                    out["doc_id"].append(int(doc_id))
                    out["win_idx"].append(idx)
                    out["win_len"].append(len(chunk))
                    out["abs_sum"].append(sum(abs(s) for s in chunk))
            yield _pd.DataFrame(out, dtype="int64")

    return df.mapInPandas(batches, schema=PCM_WINDOW_SCHEMA)


PCM_DECIMATE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("sample_rate", T.LongType()),
    T.StructField("n_out_samples", T.LongType()),
    T.StructField("out_sum", T.LongType()),
    T.StructField("out_min", T.LongType()),
    T.StructField("out_max", T.LongType()),
])


def pcm_decimate_2to1(df: DataFrame) -> DataFrame:
    """REAL 2:1 audio downsample over WAV PCM16 blobs: decode, average
    adjacent FRAMES per channel (floor of the pair mean — integer-exact,
    so a SQL oracle reproduces it bit-for-bit), drop a trailing odd frame,
    re-encode at half the sample rate. Binary-in/binary-out like the image
    resizer, with the output stream's stats riding along so the value
    oracle pins the resample without decoding the emitted blob.

    This is the standard anti-aliased-enough decimation a speech pipeline
    runs to normalize 16 kHz→8 kHz corpora (a production kernel swaps a
    polyphase filter into the same mapInPandas shape)."""
    codecs = _make_pixel_codecs()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        encode, decode = codecs[6], codecs[7]
        for pdf in it:
            out = {k: [] for k in ("doc_id", "payload", "sample_rate",
                                   "n_out_samples", "out_sum", "out_min",
                                   "out_max")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                ch, sr, samples = decode(blob)
                n_frames = len(samples) // ch
                half = []
                for g in range(n_frames // 2):
                    for c in range(ch):
                        a = samples[(2 * g) * ch + c]
                        b = samples[(2 * g + 1) * ch + c]
                        half.append((a + b) // 2)
                out["doc_id"].append(int(doc_id))
                out["payload"].append(encode(ch, sr // 2, half))
                out["sample_rate"].append(sr // 2)
                out["n_out_samples"].append(len(half))
                out["out_sum"].append(sum(half) if half else 0)
                out["out_min"].append(min(half) if half else 0)
                out["out_max"].append(max(half) if half else 0)
            yield _pd.DataFrame(out)

    return df.mapInPandas(batches, schema=PCM_DECIMATE_SCHEMA)


PHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("phash", T.LongType()),
])


def perceptual_phash(df: DataFrame, grid: int = 4) -> DataFrame:
    """Arrow-batched REAL-decode perceptual hash (average-hash family):
    decode the blob (PNG/BMP via the stdlib codecs), nearest-neighbor
    sample a ``grid``×``grid`` luma grid (L = R+G+B at integer sample
    points r = i*h//grid, c = j*w//grid), and set bit (i*grid+j) iff
    grid²·L(i,j) > ΣL — all-integer, so a closed-form oracle can rebuild
    the hash bit-for-bit from the image generator's formula while THIS
    path exercises the genuine container decode.

    Scale: one mapInPandas stage, one Arrow batch of blobs per task; the
    hash is 8 bytes per image, so the downstream dedup join shuffles
    (doc_id, phash) pairs only — blobs never move again. Production swaps
    a SIMD pHash/DCT kernel into this exact shape."""
    codecs = _make_pixel_codecs()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        decode = codecs[4]
        g = grid
        for pdf in it:
            out = {k: [] for k in ("doc_id", "width", "height", "phash")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                _fmt, w, h, rows = decode(blob)
                lum = []
                for i in range(g):
                    r = i * h // g
                    line = rows[r]
                    for j in range(g):
                        c = j * w // g
                        lum.append(line[3 * c] + line[3 * c + 1]
                                   + line[3 * c + 2])
                total = sum(lum)
                ph = 0
                for bit, v in enumerate(lum):
                    if g * g * v > total:
                        ph |= 1 << bit
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["phash"].append(ph)
            yield _pd.DataFrame(out)

    return df.mapInPandas(batches, schema=PHASH_SCHEMA)
