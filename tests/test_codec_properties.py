"""Property-based codec invariants (hypothesis): every container codec in
functions/multimodal.py must round-trip ARBITRARY content — not just the
seeded grids the unit tests pin. Each property is the codec's contract:

- PNG: decode(encode(img)) == img for any dims/pixels, interlaced or not
- GIF: same, for any palette size/pixels/interlace (lossless by design)
- BMP: same, both row orders, any padding width
- WAV PCM16: bytes-exact for any sample values
- G.711: decode(encode(s)) equals the ITU closed form for ANY int16, and
  re-companding a companded value is a fixed point (idempotence)
- JPEG (lossy): within ±1 gray at quant=1 for any image; constant tiles
  exactly; decode never crashes on its own encoder's output
"""

import random

from hypothesis import given, settings, strategies as st

from dbt_spark.functions.multimodal import (
    decode_bmp_rgb,
    decode_gif_rgb,
    decode_jpeg_gray,
    decode_png_rgb,
    decode_wav_g711,
    decode_wav_pcm16,
    encode_bmp_rgb,
    encode_gif_indexed,
    encode_jpeg_gray,
    encode_png_rgb,
    encode_wav_g711,
    encode_wav_pcm16,
)

dims = st.tuples(st.integers(1, 24), st.integers(1, 20))


def _grid(w, h, seed, lim=256):
    rng = random.Random(seed)
    return [[rng.randrange(lim) for _ in range(w)] for _ in range(h)]


@settings(max_examples=40, deadline=None)
@given(dims, st.integers(0, 2**31), st.booleans())
def test_png_roundtrip_property(wh, seed, interlace):
    w, h = wh
    g = [_grid(w, h, seed + k) for k in range(3)]

    def pix(r, c):
        return (g[0][r][c], g[1][r][c], g[2][r][c])

    gw, gh, rows = decode_png_rgb(encode_png_rgb(w, h, pix,
                                                 interlace=interlace))
    assert (gw, gh) == (w, h)
    assert rows == [b"".join(bytes(pix(r, c)) for c in range(w))
                    for r in range(h)]


@settings(max_examples=40, deadline=None)
@given(dims, st.integers(0, 2**31), st.booleans())
def test_bmp_roundtrip_property(wh, seed, top_down):
    w, h = wh
    g = [_grid(w, h, seed + k) for k in range(3)]

    def pix(r, c):
        return (g[0][r][c], g[1][r][c], g[2][r][c])

    gw, gh, rows = decode_bmp_rgb(encode_bmp_rgb(w, h, pix,
                                                 top_down=top_down))
    assert (gw, gh) == (w, h)
    assert rows == [b"".join(bytes(pix(r, c)) for c in range(w))
                    for r in range(h)]


@settings(max_examples=40, deadline=None)
@given(dims, st.integers(0, 2**31), st.booleans(),
       st.sampled_from([2, 4, 16, 256]))
def test_gif_roundtrip_property(wh, seed, interlace, npal):
    w, h = wh
    pal = [(i % 256, (2 * i) % 256, (3 * i) % 256) for i in range(npal)]
    grid = _grid(w, h, seed, lim=npal)
    blob = encode_gif_indexed(w, h, lambda r, c: grid[r][c], pal,
                              interlace=interlace)
    gw, gh, rows = decode_gif_rgb(blob)
    assert (gw, gh) == (w, h)
    assert rows == [b"".join(bytes(pal[grid[r][c]]) for c in range(w))
                    for r in range(h)]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=400),
       st.sampled_from([1, 2]))
def test_wav_pcm16_roundtrip_property(samples, ch):
    ch2, sr, got = decode_wav_pcm16(encode_wav_pcm16(ch, 8000, samples))
    assert (ch2, sr, got) == (ch, 8000, samples)


def _ulaw_closed(s):
    m = min(32635, abs(s)) + 132
    seg = m.bit_length() - 8
    v = ((((m >> (seg + 3)) & 15) * 8 + 132) << seg) - 132
    return -v if s < 0 else v


def _alaw_closed(s):
    a = min(32767, abs(s)) >> 3
    if a < 32:
        v = ((a >> 1) * 2 + 1) * 8
    else:
        seg = a.bit_length() - 5
        v = ((((a >> seg) & 15) + 16) * 2 + 1) * (1 << (seg - 1)) * 8
    return v if s >= 0 else -v


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=300),
       st.sampled_from(["ulaw", "alaw"]))
def test_g711_matches_closed_form_and_is_idempotent(samples, law):
    closed = _ulaw_closed if law == "ulaw" else _alaw_closed
    _, _, dec = decode_wav_g711(encode_wav_g711(1, 8000, samples, law=law))
    assert dec == [closed(s) for s in samples]
    # companding a companded value changes nothing (quantizer fixed point)
    _, _, dec2 = decode_wav_g711(encode_wav_g711(1, 8000, dec, law=law))
    assert dec2 == dec


@settings(max_examples=25, deadline=None)
@given(st.tuples(st.integers(1, 32), st.integers(1, 24)),
       st.integers(0, 2**31))
def test_jpeg_tolerance_property(wh, seed):
    w, h = wh
    grid = _grid(w, h, seed)
    gw, gh, rows = decode_jpeg_gray(
        encode_jpeg_gray(w, h, lambda r, c: grid[r][c]))
    assert (gw, gh) == (w, h)
    assert max(abs(rows[r][c] - grid[r][c])
               for r in range(h) for c in range(w)) <= 1


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 4), st.integers(1, 3), st.integers(0, 2**31))
def test_jpeg_constant_tiles_exact_property(tw, th, seed):
    rng = random.Random(seed)
    tiles = [[rng.randrange(256) for _ in range(tw)] for _ in range(th)]
    w, h = tw * 8, th * 8
    gw, gh, rows = decode_jpeg_gray(
        encode_jpeg_gray(w, h, lambda r, c: tiles[r // 8][c // 8]))
    assert all(rows[r][c] == tiles[r // 8][c // 8]
               for r in range(h) for c in range(w))
