"""Round-13 wave-3 differential fuzz: random corpora written to tmp
sf-dirs run through the REAL registered queries, vs pure-python replays
of the documented semantics.

1. domain_mixture_reweight vs a python replay of the pinned (r6/r9)
   multiplicative-weights rounds
2. doc_entropy_quality vs Counter + math.log2 in the same decomposed form
3. lang_script_mismatch_audit vs regex char-class counting incl. the
   Han plant rule
4. dedup_minhash_lsh_paired vs a hashlib.md5 minhash/banding/verify
   replay (exact pair set, band hits, common grams, jaccard)
5. bt_preference_strength vs a Decimal-exact contest derivation +
   pinned Hunter-2004 MM rounds replay
6. dp_exponential_topk vs a hashlib/math Gumbel-max replay (exact
   released set + pinned scores)
7. filter_agreement_kappa vs per-doc gate replays + closed-form kappa

Same discipline as tests/test_differential_fuzz.py: fixed seeds, family
base rotated by DBT_SPARK_FUZZ_OFFSET. Family base 400k.
"""

from __future__ import annotations

import hashlib
import math
import os
import random
import re
from collections import Counter

import pytest

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 400_000

_HAN_CHARS = "中文数据质量审计样本语料清洗模型训练"


def _write_docs(tmp_path, rows):
    import duckdb

    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
            "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)
    path = os.path.join(str(tmp_path), "documents.parquet")
    con.sql(f"COPY documents TO '{path}' (FORMAT PARQUET)")
    return str(tmp_path)


def _rand_corpus(rng, langs=("en",), n_sources=4, min_docs=25, max_docs=50):
    vocab = [f"w{i}" for i in range(20)]
    rows = []
    for d in range(rng.randrange(min_docs, max_docs)):
        n = rng.choice([1, 2, rng.randrange(3, 30)])
        text = " ".join(rng.choice(vocab) for _ in range(n))
        rows.append((d, text, rng.choice(langs),
                     f"s{rng.randrange(n_sources)}", len(text)))
    return rows


# ---- 1. mixture rounds --------------------------------------------------

def _py_mixture(rows, eta, floor):
    per = {}
    for _, text, _, src, _ in rows:
        toks = len(re.split(r"\s+", text.strip()))
        letters = len(re.sub(r"\s+", "", text))
        n, t, l = per.get(src, (0, 0, 0))
        per[src] = (n + 1, t + toks, l + letters)
    total = sum(t for _, t, _ in per.values())
    out = {}
    for src, (n, t, l) in per.items():
        out[src] = {"n_docs": n, "toks": t, "loss": l / t,
                    "w0": round(t / total, 6)}
    srcs = sorted(out)
    w = {s: out[s]["w0"] for s in srcs}
    for _ in range(3):
        m = round(sum(w[s] * out[s]["loss"] for s in srcs), 9)
        r = {s: max(floor, w[s] * (1.0 + eta * (out[s]["loss"] - m)))
             for s in srcs}
        tot_r = round(sum(r[s] for s in srcs), 9)
        w = {s: round(r[s] / tot_r, 6) for s in srcs}
    for s in srcs:
        out[s]["w_opt"] = w[s]
    return out


@pytest.mark.parametrize("seed", range(4))
def test_mixture_reweight_random_corpus_replay(spark, tmp_path, seed):
    from dbt_spark.queries import llmops as L

    rng = random.Random(_BASE + _OFF + seed)
    rows = _rand_corpus(rng)
    sf = _write_docs(tmp_path, rows)
    got = {r["source"]: r for r in
           L.domain_mixture_reweight(spark, sf).collect()}
    want = _py_mixture(rows, L._MIX_ETA, L._MIX_FLOOR)
    assert set(got) == set(want)
    for s, w in want.items():
        g = got[s]
        assert g["n_docs"] == w["n_docs"], (seed, s)
        assert g["toks"] == w["toks"], (seed, s)
        assert abs(g["loss_r6"] - round(w["loss"], 6)) < 1e-9, (seed, s)
        assert abs(g["w_base_r6"] - w["w0"]) < 1e-9, (seed, s)
        assert abs(g["w_opt_r6"] - w["w_opt"]) < 1e-9, (seed, s)


# ---- 2. doc entropy -----------------------------------------------------

@pytest.mark.parametrize("seed", range(4))
def test_doc_entropy_random_corpus_replay(spark, tmp_path, seed):
    from dbt_spark.queries import curation as C

    rng = random.Random(_BASE + _OFF + 1000 + seed)
    rows = _rand_corpus(rng, langs=("en", "fr"))
    sf = _write_docs(tmp_path, rows)
    got = {r["doc_id"]: r for r in
           C.doc_entropy_quality(spark, sf).collect()}
    for d, text, _, _, _ in rows:
        toks = [t for t in re.split(r"\s+", text.strip()) if t]
        if not toks:
            assert d not in got
            continue
        cnt = Counter(toks)
        n = sum(cnt.values())
        h = round(math.log2(n)
                  - sum(c * math.log2(c) for c in cnt.values()) / n, 6)
        g = got[d]
        assert g["n_tokens"] == n, (seed, d)
        assert g["n_types"] == len(cnt), (seed, d)
        assert abs(g["entropy_r6"] - h) < 1e-9, (seed, d, text)
        top = max(cnt.values())
        assert abs(g["top_frac_r6"] - round(top / n, 6)) < 1e-9
        expect = int(h < C._ENTROPY_MIN or 20 * top > 3 * n)
        assert g["low_quality"] == expect, (seed, d, text)


# ---- 3. script audit ----------------------------------------------------

@pytest.mark.parametrize("seed", range(4))
def test_script_audit_random_corpus_replay(spark, tmp_path, seed):
    from dbt_spark.queries import hygiene as H

    rng = random.Random(_BASE + _OFF + 2000 + seed)
    rows = []
    for d in range(rng.randrange(30, 60)):
        lang = rng.choice(["en", "zh", "de"])
        words = []
        for _ in range(rng.randrange(1, 12)):
            if rng.random() < 0.3:
                words.append("".join(rng.choice(_HAN_CHARS)
                                     for _ in range(rng.randrange(1, 4))))
            else:
                words.append(f"w{rng.randrange(30)}")
        text = " ".join(words)
        rows.append((d, text, lang, "s0", len(text)))
    sf = _write_docs(tmp_path, rows)
    got = {r["lang"]: r for r in
           H.lang_script_mismatch_audit(spark, sf).collect()}

    agg = {}
    for d, text, lang, _, _ in rows:
        if lang == "zh" and d % 3 == 0:
            text = text + " " + H._HAN_PLANT
        han = sum(1 for ch in text if "一" <= ch <= "鿿")
        latin = len(re.findall(r"[A-Za-z]", text))
        mism = int((lang == "zh" and han == 0)
                   or (lang != "zh" and han > latin))
        a = agg.setdefault(lang, {"n": 0, "m": 0, "h": 0, "ids": []})
        a["n"] += 1
        a["m"] += mism
        a["h"] += int(han > 0)
        if mism:
            a["ids"].append(d)
    assert set(got) == set(agg)
    for lang, a in agg.items():
        g = got[lang]
        assert g["n_docs"] == a["n"], (seed, lang)
        assert g["n_mismatch"] == a["m"], (seed, lang)
        assert g["n_with_han"] == a["h"], (seed, lang)
        assert g["first_flagged"] == (min(a["ids"]) if a["ids"] else None)
        assert g["last_flagged"] == (max(a["ids"]) if a["ids"] else None)


# ---- 4. banded LSH ------------------------------------------------------

def _py_lsh_pairs(rows, perms, bands, thresh):
    def gramset(text):
        toks = re.split(r"\s+", text.lower().strip())
        if len(toks) < 2:
            return set()
        return {toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    grams = {d: gramset(t) for d, t, *_ in rows}
    grams = {d: g for d, g in grams.items() if g}
    sigs = {
        d: [min(h60(f"{p}|{g}") for g in gs) for p in range(perms)]
        for d, gs in grams.items()
    }
    r = perms // bands
    bhs = {
        d: [hashlib.md5(",".join(str(x) for x in sig[b * r:(b + 1) * r])
                        .encode()).hexdigest()
            for b in range(bands)]
        for d, sig in sigs.items()
    }
    out = {}
    ids = sorted(bhs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            hits = sum(1 for x in range(bands) if bhs[a][x] == bhs[b][x])
            if not hits:
                continue
            common = len(grams[a] & grams[b])
            if common == 0:
                continue  # inner join with the shared-gram table
            jac = common / (len(grams[a]) + len(grams[b]) - common)
            if jac >= thresh:
                out[(a, b)] = (hits, common, round(jac, 6))
    return out


@pytest.mark.parametrize("seed", range(3))
def test_lsh_paired_random_corpus_replay(spark, tmp_path, seed):
    from dbt_spark.queries import curation as C

    rng = random.Random(_BASE + _OFF + 3000 + seed)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    d = 0
    for _ in range(rng.randrange(12, 20)):
        n = rng.randrange(2, 15)
        text = " ".join(rng.choice(vocab) for _ in range(n))
        rows.append((d, text, "en", "s0", len(text)))
        d += 1
        if rng.random() < 0.4:  # plant a near/exact duplicate
            t2 = text if rng.random() < 0.5 else text + " " + rng.choice(vocab)
            rows.append((d, t2, "en", "s0", len(t2)))
            d += 1
    sf = _write_docs(tmp_path, rows)
    got = {(r["id_a"], r["id_b"]): (r["n_bands_hit"], r["n_common"],
                                    r["jaccard_r6"])
           for r in C.dedup_minhash_lsh_paired(spark, sf).collect()}
    want = _py_lsh_pairs(rows, C._LSHP_PERMS, C._LSHP_BANDS,
                         C._LSHP_VERIFY_T)
    assert set(got) == set(want), (seed, set(got) ^ set(want))
    for k, (hits, common, jac) in want.items():
        gh, gc, gj = got[k]
        assert gh == hits and gc == common, (seed, k)
        assert abs(gj - jac) < 1e-9, (seed, k)


# ---- 5. Bradley-Terry ---------------------------------------------------

def _py_bt(events, rounds, floor):
    from decimal import Decimal

    per = {}
    for u, ty, v in events:
        key = (u, ty)
        per[key] = per.get(key, Decimal(0)) + Decimal(str(round(v, 3)))
    by_user = {}
    for (u, ty), s in per.items():
        by_user.setdefault(u, {})[ty] = s
    wins = Counter()
    games = Counter()
    for u, d in by_user.items():
        tys = sorted(d)
        for i, a in enumerate(tys):
            for b in tys[i + 1:]:
                if d[a] == d[b]:
                    continue
                w, l = (a, b) if d[a] > d[b] else (b, a)
                wins[(w, l)] += 1
                games[(a, b)] += 1
                games[(b, a)] += 1
    types = sorted({t for pair in games for t in pair})
    if not types:
        return {}
    n_wins = {t: sum(w for (a, _), w in wins.items() if a == t)
              for t in types}
    n_games = {t: sum(g for (a, _), g in games.items() if a == t)
               for t in types}
    s = {t: round(1.0 / len(types), 6) for t in types}
    for _ in range(rounds):
        denom = {}
        for t in types:
            denom[t] = round(sum(
                games[(t, o)] / (s[t] + s[o])
                for o in types if games.get((t, o))), 9)
        raw = {t: max(floor, n_wins[t] / denom[t]) for t in types}
        tot = round(sum(raw[t] for t in types), 9)
        s = {t: round(raw[t] / tot, 6) for t in types}
    return {t: (n_wins[t], n_games[t], s[t]) for t in types}


@pytest.mark.parametrize("seed", range(3))
def test_bt_strength_random_events_replay(spark, tmp_path, seed):
    import duckdb

    from dbt_spark.queries import curation as C

    rng = random.Random(_BASE + _OFF + 4000 + seed)
    types = ["a", "b", "c", "d"][: rng.randrange(2, 5)]
    events = []
    for e in range(rng.randrange(60, 140)):
        events.append((rng.randrange(12), rng.choice(types),
                       round(rng.uniform(-5, 10), 2)))
    con = duckdb.connect()
    con.sql("CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
            "user_id BIGINT, event_type VARCHAR, value DOUBLE, "
            "props VARCHAR)")
    con.executemany(
        "INSERT INTO events VALUES (?, TIMESTAMP '2024-01-01', ?, ?, ?, '')",
        [(i, u, ty, v) for i, (u, ty, v) in enumerate(events)])
    path = os.path.join(str(tmp_path), "events.parquet")
    con.sql(f"COPY events TO '{path}' (FORMAT PARQUET)")

    got = {r["event_type"]: r for r in
           C.bt_preference_strength(spark, str(tmp_path)).collect()}
    want = _py_bt(events, C._BT_ROUNDS, C._BT_FLOOR)
    assert set(got) == set(want), seed
    for t, (w, g, s) in want.items():
        r = got[t]
        assert r["n_wins"] == w, (seed, t)
        assert r["n_contests"] == g, (seed, t)
        assert abs(r["s_bt_r6"] - s) < 1e-9, (seed, t)


# ---- 6. DP exponential top-k --------------------------------------------

@pytest.mark.parametrize("seed", range(3))
def test_dp_topk_random_corpus_replay(spark, tmp_path, seed):
    from dbt_spark.queries import hygiene as H

    rng = random.Random(_BASE + _OFF + 5000 + seed)
    rows = _rand_corpus(rng)
    sf = _write_docs(tmp_path, rows)
    got = [(r["tok"], r["noisy_score_r6"]) for r in
           H.dp_exponential_topk(spark, sf).collect()]

    cnt = Counter()
    for _, text, *_ in rows:
        for t in re.split(r"\s+", text.lower().strip()):
            if t:
                cnt[t] += 1
    eps = H._DP_EPSILON
    scored = []
    for t, n in cnt.items():
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(1 << 60)
        g = -math.log(-math.log(u))
        scored.append((t, round(n * (eps / 2.0) + g, 6)))
    want = sorted(scored, key=lambda x: (-x[1], x[0]))[:H._DP_TOPK]
    assert [t for t, _ in got] == [t for t, _ in want], seed
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9


# ---- 7. filter agreement kappa ------------------------------------------

@pytest.mark.parametrize("seed", range(3))
def test_kappa_random_corpus_replay(spark, tmp_path, seed):
    from dbt_spark.queries import hygiene as H

    rng = random.Random(_BASE + _OFF + 6000 + seed)
    # long AND short docs so the C4 band actually splits
    vocab = [f"w{i}" for i in range(10)] + ["x" * 20]
    rows = []
    for d in range(rng.randrange(30, 60)):
        n = rng.choice([1, 5, 25, rng.randrange(20, 60)])
        text = " ".join(rng.choice(vocab) for _ in range(n))
        rows.append((d, text, "en", "s0", len(text)))
    sf = _write_docs(tmp_path, rows)
    got = {(r["gate_a"], r["gate_b"]): r for r in
           H.filter_agreement_kappa(spark, sf).collect()}

    flags = {}
    for d, text, *_ in rows:
        toks = [t for t in re.split(r"\s+", text.strip()) if t]
        nt_spark = len(re.split(r"\s+", text.strip()))  # includes '' token
        letters = len(re.sub(r"\s+", "", text))
        g_c4 = int(20 <= nt_spark <= 100000)
        g_wl = int(letters <= 12 * nt_spark)
        if toks:
            cnt = Counter(toks)
            n = sum(cnt.values())
            hh = round(math.log2(n)
                       - sum(c * math.log2(c) for c in cnt.values()) / n, 6)
            low = int(hh < 3.0 or 20 * max(cnt.values()) > 3 * n)
            g_ent = 1 - low
        else:
            g_ent = 0
        flags[d] = (g_c4, g_ent, g_wl)
    names = {"g_c4": 0, "g_entropy": 1, "g_wordlen": 2}
    for (a, b), r in got.items():
        ia, ib = names[a], names[b]
        n11 = sum(1 for f in flags.values() if f[ia] and f[ib])
        n10 = sum(1 for f in flags.values() if f[ia] and not f[ib])
        n01 = sum(1 for f in flags.values() if not f[ia] and f[ib])
        n00 = sum(1 for f in flags.values() if not f[ia] and not f[ib])
        assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (
            n11, n10, n01, n00), (seed, a, b)
        n = n11 + n10 + n01 + n00
        po = (n11 + n00) / n
        pe = ((n11 + n10) * (n11 + n01)
              + (n01 + n00) * (n10 + n00)) / (n * n)
        kappa = 1.0 if pe == 1.0 else (po - pe) / (1.0 - pe)
        assert abs(r["agreement_r6"] - round(po, 6)) < 1e-9
        assert abs(r["kappa_r6"] - round(kappa, 6)) < 1e-9, (seed, a, b)
