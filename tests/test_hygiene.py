"""Corpus-hygiene operators (queries/hygiene.py): PII redaction chain,
boilerplate segment dedup, leakage-safe grouped split.

REPLAY family #18: random PII-bearing strings through the REAL
redact_pii() column chain vs a pure-python re-based oracle running the
identical patterns in the identical order. Family base 340k rotated by
DBT_SPARK_FUZZ_OFFSET.
"""

from __future__ import annotations

import os
import random
import re

import pytest
from pyspark.sql import functions as F

from dbt_spark.functions.pii import EMAIL_RE, IPV4_RE, PHONE_RE, redact_pii

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 340_000
_SF = "/root/testdata/sf0.001"


def _py_redact(text: str) -> dict:
    """Pure-python oracle for the chained count/replace pipeline."""
    emails = len(re.findall(EMAIL_RE, text))
    t1 = re.sub(EMAIL_RE, "<EMAIL>", text)
    phones = len(re.findall(PHONE_RE, t1))
    t2 = re.sub(PHONE_RE, "<PHONE>", t1)
    ips = len(re.findall(IPV4_RE, t2))
    t3 = re.sub(IPV4_RE, "<IP>", t2)
    return {"emails": emails, "phones": phones, "ips": ips, "redacted": t3}


def _gen_text(rng: random.Random) -> str:
    """Random prose interleaved with PII-shaped and near-miss fragments."""
    words = ["alpha", "beta", "gamma", "delta", "run", "fast", "data"]
    frags = []
    for _ in range(rng.randint(1, 12)):
        kind = rng.randint(0, 7)
        if kind == 0:
            frags.append(
                f"user{rng.randint(0, 99999)}@host{rng.randint(0, 9)}.example.com"
            )
        elif kind == 1:
            frags.append(
                "+%d %d%d%d-%04d" % (
                    rng.randint(1, 99), rng.randint(2, 9), rng.randint(0, 9),
                    rng.randint(0, 9), rng.randint(0, 9999),
                )
            )
        elif kind == 2:
            frags.append(
                ".".join(str(rng.randint(0, 300)) for _ in range(4))
            )
        elif kind == 3:  # near-misses: bare @, short digits, trailing dot
            frags.append(rng.choice(["a@b", "12-34", "1.2.3.", "@x.co", "+12"]))
        else:
            frags.append(rng.choice(words))
    return " ".join(frags)


@pytest.mark.parametrize("seed", [_BASE + _OFF + i for i in range(12)])
def test_redact_pii_vs_python(spark, seed):
    rng = random.Random(seed)
    rows = [(i, _gen_text(rng)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, t string")
    cols = redact_pii(F.col("t"))
    got = {
        r["id"]: r
        for r in df.select(
            "id", "t",
            cols["emails"].alias("e"), cols["phones"].alias("p"),
            cols["ips"].alias("i"), cols["redacted"].alias("r"),
        ).collect()
    }
    for i, t in rows:
        want = _py_redact(t)
        g = got[i]
        assert (g["e"], g["p"], g["i"]) == (
            want["emails"], want["phones"], want["ips"]), (seed, t)
        assert g["r"] == want["redacted"], (seed, t)


def test_pii_queries_shapes(spark):
    from dbt_spark.queries.hygiene import pii_doc_audit, pii_redact_stats

    stats = pii_redact_stats(spark, _SF).collect()
    assert len(stats) == 5  # five langs
    assert sum(r["emails"] for r in stats) > 0
    assert sum(r["phones"] for r in stats) > 0
    assert sum(r["ips"] for r in stats) > 0
    for r in stats:
        assert len(r["redacted_md5"]) == 32
    audit = pii_doc_audit(spark, _SF).collect()
    assert len(audit) == 20
    totals = [r["pii_total"] for r in audit]
    assert totals == sorted(totals, reverse=True)
    # injection fixture: no residual raw PII survives redaction anywhere
    from dbt_spark.queries.hygiene import _redacted

    leftover = (
        _redacted(spark, _SF)
        .filter(
            F.col("redacted").rlike(EMAIL_RE)
            | F.col("redacted").rlike(IPV4_RE)
        )
        .count()
    )
    assert leftover == 0


def test_boilerplate_segment_dedup_semantics(spark):
    from dbt_spark.queries.hygiene import boilerplate_segment_dedup

    rows = boilerplate_segment_dedup(spark, _SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["segments_removed"] <= r["segments_total"]
        assert len(r["cleaned_md5"]) == 32
    # the synthetic corpus has hot bigrams above the 5% threshold
    assert sum(r["segments_removed"] for r in rows) > 0


def test_holdout_split_leakproof(spark):
    from dbt_spark.queries.hygiene import holdout_split_grouped
    from dbt_spark.session import load_tables

    rows = {r["split"]: r for r in holdout_split_grouped(spark, _SF).collect()}
    docs = load_tables(spark, _SF, "documents")["documents"]
    total_docs = docs.count()
    total_sources = docs.select("source").distinct().count()
    assert sum(r["n_docs"] for r in rows.values()) == total_docs
    # leakage-safety: each source lands in exactly one split, so the
    # per-split distinct-source counts partition the global set
    assert sum(r["n_sources"] for r in rows.values()) == total_sources
    assert "train" in rows
    assert rows["train"]["n_docs"] == max(r["n_docs"] for r in rows.values())


def test_unicode_nfc_scrub_semantics(spark):
    import unicodedata

    from dbt_spark.queries.hygiene import (
        _DECOMPOSED, _NFC_STABLE, unicode_nfc_scrub)

    # fixture sanity: one injects real decomposed sequences, one is an
    # NFC fixed point (NFKC-only foldings must NOT be applied)
    assert unicodedata.normalize("NFC", _DECOMPOSED) != _DECOMPOSED
    assert unicodedata.normalize("NFC", _NFC_STABLE) == _NFC_STABLE

    rows = unicode_nfc_scrub(spark, _SF).collect()
    assert len(rows) == 5
    assert sum(r["docs_changed"] for r in rows) > 0
    for r in rows:
        # composition only ever shrinks: 2-codepoint combining pairs -> 1
        assert r["chars_after"] <= r["chars_before"]
        assert len(r["norm_md5"]) == 32
    # docs with neither injection (ASCII) are untouched: changed count is
    # exactly the doc_id % 3 == 0 population
    from dbt_spark.session import load_tables

    docs = load_tables(spark, _SF, "documents")["documents"]
    import pyspark.sql.functions as SF

    want = docs.filter(SF.col("doc_id") % 3 == 0).count()
    assert sum(r["docs_changed"] for r in rows) == want


def test_normalize_nfc_function_passthrough(spark):
    from dbt_spark.functions.unicode_norm import normalize_nfc

    df = spark.createDataFrame(
        [(1, "plain"), (2, "café"), (3, None)], "id long, t string")
    out = {r["id"]: (r["t"], r["n"])
           for r in normalize_nfc(df, "t", "n").collect()}
    assert out[1] == ("plain", "plain")
    assert out[2][1] == "café"
    assert out[3] == (None, None)
    # input schema object must not be mutated by the schema build
    assert [f.name for f in df.schema.fields] == ["id", "t"]


def test_blocklist_phrase_filter_semantics(spark):
    from dbt_spark.queries.hygiene import (
        _BLOCK_PHRASES, blocklist_phrase_filter)

    rows = blocklist_phrase_filter(spark, _SF).collect()
    assert len(rows) == 5
    assert sum(r["docs_flagged"] for r in rows) > 0
    for r in rows:
        assert r["total_hits"] >= r["docs_flagged"]
        assert r["docs_flagged"] <= r["docs_total"]
    # independent recount of one phrase family via plain substring checks
    import pandas as pd

    pdf = pd.read_parquet(f"{_SF}/documents.parquet")
    import re

    pat = re.compile(r"\b(?:" + "|".join(_BLOCK_PHRASES) + r")\b")
    want_flagged = int(sum(bool(pat.search(t)) for t in pdf["text"]))
    assert sum(r["docs_flagged"] for r in rows) == want_flagged


def test_corpus_psi_drift_properties(spark):
    from dbt_spark.queries.hygiene import corpus_psi_drift

    rows = corpus_psi_drift(spark, _SF).collect()
    assert len(rows) == 5
    for r in rows:
        # PSI is a nonnegative divergence; identical halves would be ~0
        assert r["psi_r6"] >= 0.0
        assert r["docs_a"] + r["docs_b"] > 0


def test_decontam_exact_substring_cover_semantics(spark):
    from dbt_spark.queries.hygiene import (
        _COVER_W, decontam_exact_substring_cover)

    rows = decontam_exact_substring_cover(spark, _SF).collect()
    assert len(rows) == 5
    total_cov = sum(r["chars_covered"] for r in rows)
    assert total_cov > 0  # the fixture eval set really contaminates
    for r in rows:
        assert 0 <= r["chars_covered"] <= r["chars_total"]
        assert 0.0 <= r["contamination_pct_r6"] <= 1.0
        # every contaminated doc is covered by >= one full window
        if r["docs_contaminated"]:
            assert r["chars_covered"] >= _COVER_W


def test_pii_redact_model_config(project_dir, spark):
    """config(pii_redact=['text']) scrubs inside the materialization —
    the privacy boundary as a declarative model knob, composing with the
    other text-pipeline configs."""
    from dbt_spark.runner import Engine

    files = {
        "dbt_project.yml": "name: piicfg\n",
        "models/sources.yml": """
sources:
  - name: corpus
    tables:
      - name: documents
        meta: {location: "/root/testdata/sf0.001/documents.parquet"}
""",
        "models/scrubbed.sql": (
            "{{ config(materialized='table', pii_redact=['text']) }}"
            "select doc_id, text || ' mail me: a.b@example.com or "
            "10.0.0.1' as text from {{ source('corpus','documents') }}"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    out = eng.store.read("main", "scrubbed")
    assert out.filter(F.col("text").rlike(EMAIL_RE)).count() == 0
    assert out.filter(F.col("text").contains("<EMAIL>")).count() == out.count()
    assert out.filter(F.col("text").contains("<IP>")).count() == out.count()


def test_pii_redact_model_config_bad_column(project_dir, spark):
    from dbt_spark.runner import Engine

    files = {
        "dbt_project.yml": "name: piibad\n",
        "models/m.sql": (
            "{{ config(materialized='table', pii_redact=['nope']) }}"
            "select 1 as id"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    r = eng.invoke(["run"])
    assert not r.success
    assert "pii_redact" in " ".join(x.message or "" for x in r.results)


def test_k_anonymity_release_invariants(spark):
    """EVERY released row (pooled residuals included — ADVICE r11) has
    n >= k; what the release drops is < k per lang; totals otherwise
    conserve the corpus."""
    from pyspark.sql import functions as F

    from dbt_spark.queries.hygiene import _K_ANON, _docs, k_anonymity_release

    rows = k_anonymity_release(spark, "/root/testdata/sf0.001").collect()
    assert rows
    total = _docs(spark, "/root/testdata/sf0.001").count()
    released = sum(r["n"] for r in rows)
    # dropped mass = sub-k residual pools only, each < k
    langs = {r["lang"] for r in rows}
    assert released <= total
    assert total - released < _K_ANON * (len(langs) + 1)
    assert any(not r["suppressed"] for r in rows)
    for r in rows:
        assert r["n"] >= _K_ANON  # the k-anonymity contract, no exceptions
        if not r["suppressed"]:
            assert r["len_decile"] != "*"
        else:
            assert r["len_decile"] == "*"


def test_k_anonymity_subk_residual_dropped(spark):
    """Adversarial fixture: a lang whose ONLY suppressed cell has size 1 —
    the pooled residual would itself violate k and must be dropped, not
    released (ADVICE r11)."""
    import pandas as pd

    from dbt_spark.queries import hygiene as H

    pdf = pd.DataFrame(
        # lang 'aa': 10 docs in decile 0 (released) + 1 doc in decile 9
        # (suppressed; pooled residual n=1 < k → dropped)
        [{"doc_id": i, "lang": "aa", "n_chars": 50} for i in range(10)]
        + [{"doc_id": 10, "lang": "aa", "n_chars": 950}]
        # lang 'bb': 3+3 in two small cells → pooled residual n=6 ≥ k: kept
        + [{"doc_id": 11 + i, "lang": "bb", "n_chars": 50 + 100 * (i % 2)}
           for i in range(6)]
    )
    df = spark.createDataFrame(pdf)
    orig = H._docs
    H._docs = lambda _spark, _sf: df
    try:
        rows = H.k_anonymity_release(spark, "ignored").collect()
    finally:
        H._docs = orig
    got = {(r["lang"], r["len_decile"]): (r["n"], r["suppressed"]) for r in rows}
    assert got == {
        ("aa", "0"): (10, False),
        ("bb", "*"): (6, True),
    }


def test_turn_dedup_model_config(project_dir, spark):
    """config(turn_dedup={...}) dedups conversation turns inside the
    materialization: first occurrence per (conversation, normalized
    content) survives with its full row."""
    from dbt_spark.runner import Engine

    files = {
        "dbt_project.yml": "name: tdcfg\n",
        "seeds/turns.csv": (
            "conv,idx,content,who\n"
            "1,0,hello there,u\n"
            "1,1,Hello   THERE,a\n"   # normalized dup of idx 0
            "1,2,thanks!,u\n"
            "2,0,thanks!,u\n"          # same content, other conversation: kept
            "2,1,bye,a\n"
        ),
        "models/deduped.sql": (
            "{{ config(materialized='table', "
            "turn_dedup={'conversation': 'conv', 'content': 'content', "
            "'order': 'idx'}) }}"
            "select * from {{ ref('turns') }}"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    rows = {(x["conv"], x["idx"]): x
            for x in eng.store.read("main", "deduped").collect()}
    # idx 1 of conv 1 collapsed into idx 0; cross-conversation copy kept
    assert set(rows) == {(1, 0), (1, 2), (2, 0), (2, 1)}
    assert rows[(1, 0)]["who"] == "u"  # the FIRST row's full payload survives


def test_turn_dedup_orderless_survivor_deterministic(project_dir, spark):
    """ADVICE r11: without an 'order' column, two rows identical in content
    but differing elsewhere tie on the raw-content sort — every remaining
    column is a tiebreaker, so the survivor is the lexicographic minimum,
    stable across runs and partitionings."""
    from dbt_spark.runner import Engine

    files = {
        "dbt_project.yml": "name: tdtie\n",
        "seeds/turns.csv": (
            "conv,content,who\n"
            "1,same text,zz\n"
            "1,same text,aa\n"    # identical content, differs only in who
            "1,other,mm\n"
        ),
        "models/deduped.sql": (
            "{{ config(materialized='table', "
            "turn_dedup={'conversation': 'conv', 'content': 'content'}) }}"
            "select * from {{ ref('turns') }}"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    assert eng.invoke(["seed"]).success
    survivors = set()
    for _ in range(3):
        r = eng.invoke(["run", "--full-refresh"])
        assert r.success, [x.message for x in r.results]
        rows = {x["content"]: x["who"]
                for x in eng.store.read("main", "deduped").collect()}
        assert set(rows) == {"same text", "other"}
        survivors.add(rows["same text"])
    assert survivors == {"aa"}  # lexicographic min on the tiebreak columns


def test_turn_dedup_model_config_bad_shape(project_dir, spark):
    from dbt_spark.runner import Engine

    files = {
        "dbt_project.yml": "name: tdbad\n",
        "models/m.sql": (
            "{{ config(materialized='table', turn_dedup={'content': 'c'}) }}"
            "select 1 as c"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    r = eng.invoke(["run"])
    assert not r.success
    assert any("turn_dedup needs" in (x.message or "") for x in r.results)


def test_filter_funnel_monotone_and_conserving(spark):
    """Funnel invariants: stage 1 n_in = corpus size per lang; n_out <=
    n_in; each stage's n_in equals the previous stage's n_out (sequential
    semantics); stage set complete and ordered."""
    from collections import defaultdict

    from dbt_spark.queries.hygiene import (
        _FUNNEL_STAGES,
        _docs,
        filter_funnel_report,
    )

    rows = filter_funnel_report(spark, "/root/testdata/sf0.001").collect()
    per_lang = defaultdict(list)
    for r in rows:
        per_lang[r["lang"]].append(r)
    totals = {
        r["lang"]: r["n"]
        for r in _docs(spark, "/root/testdata/sf0.001")
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_lang) == set(totals)
    for lang, stages in per_lang.items():
        stages.sort(key=lambda r: r["stage_idx"])
        assert [r["stage"] for r in stages] == _FUNNEL_STAGES
        assert stages[0]["n_in"] == totals[lang]
        prev_out = None
        for r in stages:
            assert 0 <= r["n_out"] <= r["n_in"]
            assert r["n_dropped"] == r["n_in"] - r["n_out"]
            if prev_out is not None:
                assert r["n_in"] == prev_out
            prev_out = r["n_out"]


def test_source_ngram_overlap_symmetric_bounds(spark):
    """Overlap matrix invariants: source_a < source_b (upper triangle),
    jaccard in (0, 1], and n_common bounded by the smaller gram set."""
    from dbt_spark.queries.hygiene import _docs, source_ngram_overlap

    rows = source_ngram_overlap(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert r["n_common"] >= 1
        assert 0.0 < r["jaccard"] <= 1.0


def test_dp_laplace_release_mechanism(spark):
    """DP release invariants: every cell of the contingency table is
    released (no suppression), noise is bounded for the fixed portable
    draws (|noise| = ln(1/(1-2|u|)) — finite since u != ±0.5 for md5
    draws), and the noisy counts differ from the true counts."""
    from collections import Counter

    from dbt_spark.queries.hygiene import _docs, dp_laplace_release

    sf = "/root/testdata/sf0.001"
    rows = dp_laplace_release(spark, sf).collect()
    docs = _docs(spark, sf)
    true_cells = (
        docs.selectExpr("lang", "least(cast(n_chars/100 as bigint), 9) d")
        .groupBy("lang", "d").count().collect()
    )
    assert len(rows) == len(true_cells)
    true = {(r["lang"], str(r["d"])): r["count"] for r in true_cells}
    for r in rows:
        t = true[(r["lang"], r["len_decile"])]
        assert abs(r["noisy_n_r4"] - t) < 50  # Laplace(1) tail at md5 draws
        assert r["epsilon"] == 1.0
    assert any(abs(r["noisy_n_r4"] - true[(r["lang"], r["len_decile"])])
               > 1e-6 for r in rows)


def test_chunk_text_model_config(project_dir, spark):
    """config(chunk_text={...}) lands one row per sliding-window chunk:
    idx/start columns added, content replaced by the slice, other
    columns carried through, empty content dropped."""
    from dbt_spark.runner import Engine

    files = {
        "dbt_project.yml": "name: ckcfg\n",
        "models/chunked.sql": (
            "{{ config(materialized='table', "
            "chunk_text={'content': 'body', 'window': 10, 'stride': 6}) }}"
            "select * from (values (1, 'abcdefghijklmnop', 'x'), "
            "(2, 'short', 'y'), (3, '', 'z')) as t(id, body, tag)"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    rows = {(x["id"], x["chunk_idx"]): x
            for x in eng.store.read("main", "chunked").collect()}
    # id 1: len 16 -> starts 0, 6, 12; id 2: len 5 -> one chunk; id 3: none
    assert set(rows) == {(1, 0), (1, 1), (1, 2), (2, 0)}
    assert rows[(1, 0)]["body"] == "abcdefghij"
    assert rows[(1, 1)]["body"] == "ghijklmnop"
    assert rows[(1, 2)]["body"] == "mnop"
    assert rows[(1, 1)]["chunk_start"] == 6
    assert rows[(2, 0)]["body"] == "short"
    assert all(x["tag"] in "xy" for x in rows.values())


def test_chunk_text_model_config_bad_shape(project_dir, spark):
    from dbt_spark.runner import Engine

    files = {
        "dbt_project.yml": "name: ckbad\n",
        "models/m.sql": (
            "{{ config(materialized='table', "
            "chunk_text={'content': 'c', 'window': 5, 'stride': 9}) }}"
            "select 'abc' as c"
        ),
    }
    r = Engine(project_dir(files), spark=spark).invoke(["run"])
    assert not r.success
    assert any("stride" in (x.message or "") for x in r.results)


def test_wilson_ci_brackets_rate(spark):
    """Interval sanity: lo <= rate <= hi, interval within [0,1], and it
    narrows with n (pooled vs per-source width comparison)."""
    from dbt_spark.queries.hygiene import filter_rate_wilson_ci

    rows = filter_rate_wilson_ci(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["wilson_lo_r6"] <= r["rate_r6"] <= r["wilson_hi_r6"] <= 1.0
        assert r["n_pass"] <= r["n"]
        # Wilson width bound: ~2z/(2 sqrt(n)) worst case
        width = r["wilson_hi_r6"] - r["wilson_lo_r6"]
        assert width <= 2 * 1.96 / (2 * (r["n"] ** 0.5)) + 0.05
