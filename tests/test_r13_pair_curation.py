"""Round-13 image-text pair curation gates (queries/llmops.py):

- multimodal_pair_dedup: REAL-decode perceptual phash × portable-md5
  caption MinHash bands, keyed union of both gates
- multimodal_caption_alignment: caption 3-gram containment vs the REAL
  html-extracted page copy
- functions/multimodal.py::perceptual_phash kernel properties
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_SF = "/root/testdata/sf0.001"


def test_perceptual_phash_matches_closed_form(spark):
    """The REAL decode path (PNG and BMP, interlaced/top-down variants)
    must reproduce the generator's closed-form average-hash."""
    from dbt_spark.functions.multimodal import (_make_pixel_codecs,
                                                perceptual_phash)
    from dbt_spark.queries.llmops import _PAIR_IMG_MOD, _pair_blob_gen

    codecs = _make_pixel_codecs()
    ids = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    blobs = ids.mapInPandas(_pair_blob_gen((codecs[0], codecs[2])),
                            schema="doc_id long, payload binary")
    got = {r["doc_id"]: (r["width"], r["height"], r["phash"])
           for r in perceptual_phash(blobs).collect()}

    def expect(d):
        g = d % _PAIR_IMG_MOD
        w, h = 4 + (7 * g) % 13, 4 + (11 * g) % 9
        lum = []
        for i in range(4):
            r = i * h // 4
            for j in range(4):
                c = j * w // 4
                lum.append(((g + 7 * r + 13 * c) % 256)
                           + ((2 * g + 5 * r + 11 * c) % 256)
                           + ((3 * g + 3 * r + 17 * c) % 256))
        total = sum(lum)
        ph = 0
        for bit, v in enumerate(lum):
            if 16 * v > total:
                ph |= 1 << bit
        return (w, h, ph)

    for d in range(120):
        assert got[d] == expect(d), f"doc {d}"


def test_pair_dedup_collapses_planted_image_groups(spark):
    from dbt_spark.queries.llmops import _PAIR_IMG_MOD, multimodal_pair_dedup

    rows = multimodal_pair_dedup(spark, _SF).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert len(rows) == 500
    # pairs in the same image group share a phash, and the group's min
    # doc_id is the img_min for every member
    groups: dict[int, list] = {}
    for r in rows:
        groups.setdefault(r["doc_id"] % _PAIR_IMG_MOD, []).append(r)
    for g, members in groups.items():
        phashes = {m["phash"] for m in members}
        assert len(phashes) == 1, f"group {g} split phashes"
    # img_min is the min doc_id of the PHASH group (distinct planted
    # groups may legitimately merge on a 16-bit perceptual collision)
    ph_groups: dict[int, list] = {}
    for r in rows:
        ph_groups.setdefault(r["phash"], []).append(r)
    for members in ph_groups.values():
        lead = min(m["doc_id"] for m in members)
        assert all(m["img_min"] == lead for m in members)
    # keep semantics: kept rows are exactly those equal to their own
    # least(img_min, cap_min); a dropped row names a smaller keeper
    for r in rows:
        lead = min(r["img_min"], r["cap_min"])
        assert r["keep"] == (r["doc_id"] == lead)
        if not r["keep"]:
            assert lead < r["doc_id"] and lead in by_id
    # both gates actually fire: some drop through the image gate alone
    # and some through the caption gate alone
    img_only = [r for r in rows
                if r["img_min"] < r["doc_id"] <= r["cap_min"]]
    cap_only = [r for r in rows
                if r["cap_min"] < r["doc_id"] <= r["img_min"]]
    assert img_only and cap_only


def test_pair_dedup_deterministic(spark):
    from dbt_spark.queries.llmops import multimodal_pair_dedup

    a = [tuple(r) for r in multimodal_pair_dedup(spark, _SF).collect()]
    b = [tuple(r) for r in multimodal_pair_dedup(spark, _SF).collect()]
    assert a == b


def test_caption_alignment_flags_planted_noise_only(spark):
    from dbt_spark.queries.llmops import multimodal_caption_alignment

    rows = multimodal_caption_alignment(spark, _SF).collect()
    assert len(rows) == 500
    for r in rows:
        if r["n_caption_grams"] == 0:
            assert not r["aligned"] and r["containment_r6"] is None
            continue
        assert 0.0 <= r["containment_r6"] <= 1.0
        if r["doc_id"] % 4 == 0:
            # planted off-page noise tokens: gram containment must drop
            # below the threshold (3 noise tokens taint >=3 of <=13 grams)
            assert not r["aligned"], r
        else:
            # clean captions are consecutive windows of the page copy —
            # every 3-gram is on the page
            assert r["n_matched"] == r["n_caption_grams"], r
            assert r["aligned"]


def test_caption_alignment_noise_grams_counted(spark):
    """Noise pairs keep their full gram count (the audit reports the
    denominator, it doesn't silently drop tainted grams)."""
    from dbt_spark.queries.llmops import multimodal_caption_alignment

    rows = multimodal_caption_alignment(spark, _SF).collect()
    noisy = [r for r in rows
             if r["doc_id"] % 4 == 0 and r["n_caption_grams"] > 3]
    assert noisy
    for r in noisy:
        assert r["n_matched"] < r["n_caption_grams"]


def test_basket_pairs_caps_pathological_order(spark):
    """Adversarial co-purchase basket: one 10k-item order must contribute
    C(cap,2) pairs over its cap smallest part keys — not C(10k,2) —
    while normal baskets are untouched (r12 VERDICT directive #6)."""
    from dbt_spark.queries.curation import _BASKET_CAP, _basket_pairs

    big = [(1, p) for p in range(10_000)]
    small = [(2, p) for p in (7, 3, 11)] + [(3, 42), (3, 42), (3, 7)]
    li = spark.createDataFrame(big + small, "l_orderkey long, l_partkey long")
    pairs = _basket_pairs(li).collect()
    by_ok = {}
    for r in pairs:
        by_ok.setdefault(r["ok"], []).append((r["pa"], r["pb"]))
    cap = _BASKET_CAP
    assert len(by_ok[1]) == cap * (cap - 1) // 2
    # only the cap smallest part keys survive the giant basket
    assert max(max(p) for p in by_ok[1]) == cap - 1
    assert sorted(by_ok[2]) == [(3, 7), (3, 11), (7, 11)]
    # duplicate (order, part) rows collapse before pairing
    assert sorted(by_ok[3]) == [(7, 42)]


def test_stream_pair_phash_dedup_cross_batch(spark):
    """The streaming twin suppresses re-hosted images across the batch
    split: total kept images == distinct closed-form phashes (strictly
    fewer than the 500 pairs), proving the second drop's repeats hit
    the checkpointed state from the first."""
    from dbt_spark.queries.streaming_q import stream_pair_phash_dedup
    from dbt_spark.queries.llmops import _PAIR_IMG_MOD

    rows = stream_pair_phash_dedup(spark, _SF).collect()
    total_unique = sum(r["n_unique_images"] for r in rows)
    # closed form: distinct phash count over the 97 planted image groups
    # (<= _PAIR_IMG_MOD; 16-bit collisions can merge groups)
    assert total_unique <= _PAIR_IMG_MOD
    assert total_unique < 500  # duplicates were actually suppressed
    assert sorted(r["bucket"] for r in rows) == sorted(
        {r["bucket"] for r in rows})  # one row per bucket


def test_phash_neardup_matches_bruteforce_hamming(spark):
    """Band-bucketed candidates + popcount verify must reproduce the
    BRUTE-FORCE Hamming<=2 neighborhood over the distinct hash set (the
    pigeonhole completeness guarantee), and canonicalization is the
    single-round min-neighbor."""
    from dbt_spark.queries.llmops import (_PH_RADIUS,
                                          multimodal_phash_neardup)

    rows = multimodal_phash_neardup(spark, _SF).collect()
    assert len(rows) == 500
    hashes = sorted({r["phash"] for r in rows})
    # brute-force single-round min-neighbor canonical per hash
    expect_canon = {}
    for h in hashes:
        nbs = [o for o in hashes
               if bin(h ^ o).count("1") <= _PH_RADIUS]
        expect_canon[h] = min(nbs)
    for r in rows:
        assert r["canonical_phash"] == expect_canon[r["phash"]], r
    # keep = min doc of the canonical group
    grp = {}
    for r in rows:
        grp.setdefault(r["canonical_phash"], []).append(r["doc_id"])
    for r in rows:
        assert r["keep"] == (r["doc_id"] == min(grp[r["canonical_phash"]]))
    # the planted fixture actually exercises tolerance: some canonical
    # groups span MULTIPLE distinct hashes
    multi = [c for c, _ in expect_canon.items() if expect_canon[c] != c]
    assert multi, "no Hamming-tolerant merges in fixture"


def test_hard_negative_mine_properties(spark):
    """Negatives come from OTHER caption groups, ranks are dense 1..k per
    anchor, and ordering is (shared desc, neg_id asc)."""
    from dbt_spark.queries.llmops import (_NEG_ANCHOR_MOD, _NEG_K,
                                          _PAIR_CAP_MOD,
                                          pair_hard_negative_mine)

    rows = pair_hard_negative_mine(spark, _SF).collect()
    assert rows
    by_anchor = {}
    for r in rows:
        assert r["anchor_id"] % _NEG_ANCHOR_MOD == 0
        # never a same-group (near-positive) candidate
        assert (r["anchor_id"] % _PAIR_CAP_MOD
                != r["neg_id"] % _PAIR_CAP_MOD)
        assert r["n_shared_grams"] >= 1
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    for anchor, rs in by_anchor.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _NEG_K
        for x, y in zip(rs, rs[1:]):
            assert (x["n_shared_grams"], -x["neg_id"]) >= (
                y["n_shared_grams"], -y["neg_id"])


def test_audio_transcript_rate_audit_real_decode(spark):
    """Duration comes from the REAL WAV decode: frames must equal the
    generator's closed form, and the flag matches a python replay."""
    from dbt_spark.queries.llmops import (_RATE_MAX, _RATE_MIN,
                                          _RATE_TOK_MOD,
                                          audio_transcript_rate_audit)

    rows = audio_transcript_rate_audit(spark, _SF).collect()
    assert len(rows) == 500
    ok = flagged = 0
    for r in rows:
        d = r["doc_id"]
        assert r["channels"] == 1 + d % 2
        assert r["sample_rate"] == [8000, 16000, 44100][d % 3]
        assert r["n_frames"] == 50 + d % 101
        assert r["n_transcript_tokens"] <= 1 + d % _RATE_TOK_MOD
        rate = round(r["n_transcript_tokens"] * r["sample_rate"]
                     / r["n_frames"], 6)
        assert abs(r["rate_tok_per_s_r6"] - rate) < 1e-9
        assert r["rate_ok"] == (_RATE_MIN <= rate <= _RATE_MAX)
        ok += r["rate_ok"]; flagged += not r["rate_ok"]
    assert ok and flagged  # band splits the fixture both ways
