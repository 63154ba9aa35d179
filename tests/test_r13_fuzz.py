"""Round-13 differential fuzz families.

1. perceptual_phash codec fuzz: RANDOM pixel content (not the fixture
   grammar) through REAL encode (PNG plain/interlaced, BMP bottom-up/
   top-down) → REAL decode → phash, vs a pure-python replay computing
   the hash straight from the generated pixel matrix. Catches decode
   defects the closed-form fixture cannot (filter rotation, interlace
   reassembly, row order) at the phash sampling points.
2. caption-alignment replay: random token corpora written to a tmp
   sf-dir, run through the REAL multimodal_caption_alignment pipeline
   (page render → html extract → gram containment), vs a pure-python
   replay of the window/noise/gram rules.

Same discipline as tests/test_differential_fuzz.py: fixed seeds, family
base rotated by DBT_SPARK_FUZZ_OFFSET. Family base 380k.
"""

from __future__ import annotations

import math
import os
import random

import pytest

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 380_000


# ---- 1. phash over random pixels ----------------------------------------

def _py_phash(w: int, h: int, pix) -> int:
    lum = []
    for i in range(4):
        r = i * h // 4
        for j in range(4):
            c = j * w // 4
            lum.append(sum(pix(r, c)))
    total = sum(lum)
    ph = 0
    for bit, v in enumerate(lum):
        if 16 * v > total:
            ph |= 1 << bit
    return ph


@pytest.mark.parametrize("seed", range(8))
def test_phash_random_pixels_matches_python_replay(spark, seed):
    from pyspark.sql import functions as F

    from dbt_spark.functions.multimodal import (_make_pixel_codecs,
                                                perceptual_phash)

    rng = random.Random(_BASE + _OFF + seed)
    codecs = _make_pixel_codecs()
    enc_png, enc_bmp = codecs[0], codecs[2]
    n = 40
    # per-image random dims and a keyed pseudo-random pixel function
    specs = []
    for d in range(n):
        w, h = rng.randrange(4, 40), rng.randrange(4, 30)
        a, b, c = rng.randrange(256), rng.randrange(1, 97), rng.randrange(1, 89)
        specs.append((d, w, h, a, b, c))

    def pixfn(a, b, c):
        return lambda r, col: (((a + b * r + c * col) * 2654435761) % 256,
                               ((a ^ (r * 31 + col * 7)) + b) % 256,
                               (a * 3 + b * r * r + c * col) % 256)

    def gen(it):
        import pandas as _pd

        for pdf in it:
            ids, payloads = [], []
            for d in pdf["doc_id"].astype("int64"):
                _, w, h, a, b, c = specs[int(d)]
                p = pixfn(a, b, c)
                if d % 2 == 0:
                    blob = enc_png(w, h, p, interlace=(d % 4 == 2))
                else:
                    blob = enc_bmp(w, h, p, top_down=(d % 4 == 1))
                ids.append(int(d))
                payloads.append(blob)
            yield _pd.DataFrame({"doc_id": ids, "payload": payloads})

    ids = spark.range(0, n).select(F.col("id").alias("doc_id"))
    blobs = ids.mapInPandas(gen, schema="doc_id long, payload binary")
    got = {r["doc_id"]: r["phash"] for r in perceptual_phash(blobs).collect()}
    for d, w, h, a, b, c in specs:
        assert got[d] == _py_phash(w, h, pixfn(a, b, c)), (
            f"seed={seed} doc={d} w={w} h={h}")


# ---- 2. caption alignment python replay ----------------------------------

def _py_alignment(doc_id: int, text: str, k_mod: int, win: int,
                  thresh: float):
    toks = text.strip().split()
    if toks == [] or toks == [""]:
        toks = [""] if text.strip() == "" and text != "" else toks
    k = doc_id % k_mod
    ct = toks[k:k + win]
    if doc_id % 4 == 0:
        ct = ct + [f"zzqa{doc_id % 7}", f"zzqb{doc_id % 7}",
                   f"zzqc{doc_id % 7}"]
    cg = {" ".join(ct[i:i + 3]) for i in range(len(ct) - 2)} \
        if len(ct) >= 3 else set()
    pg = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)} \
        if len(toks) >= 3 else set()
    n = len(cg)
    m = len(cg & pg)
    if n == 0:
        return (0, 0, None, False)
    return (n, m, round(m / n, 6), (m / n) >= thresh)


@pytest.mark.parametrize("seed", range(6))
def test_caption_alignment_random_corpus_replay(spark, tmp_path, seed):
    import duckdb

    from dbt_spark.queries import llmops as L

    rng = random.Random(_BASE + _OFF + 1000 + seed)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(rng.randrange(20, 40)):
        n = rng.choice([0, 1, 2, rng.randrange(3, 40)])
        text = " ".join(rng.choice(vocab) for _ in range(n))
        rows.append((d, text, "en", "web", len(text)))
    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
            "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)
    path = os.path.join(str(tmp_path), "documents.parquet")
    con.sql(f"COPY documents TO '{path}' (FORMAT PARQUET)")

    got = {r["doc_id"]: r for r in
           L.multimodal_caption_alignment(spark, str(tmp_path)).collect()}
    for d, text, *_ in rows:
        n, m, cont, aligned = _py_alignment(
            d, text, L._ALIGN_K_MOD, L._ALIGN_WIN, L._ALIGN_THRESH)
        r = got[d]
        assert r["n_caption_grams"] == n, (seed, d, text)
        assert r["n_matched"] == m, (seed, d, text)
        if cont is None:
            assert r["containment_r6"] is None or (
                isinstance(r["containment_r6"], float)
                and math.isnan(r["containment_r6"]))
        else:
            assert abs(r["containment_r6"] - cont) < 1e-9, (seed, d)
        assert bool(r["aligned"]) == aligned, (seed, d, text)
