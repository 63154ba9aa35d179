"""Round-13 wave-3 curation operators:

- domain_mixture_reweight (queries/llmops.py): linearized DoReMi
  multiplicative-weights mixture optimization over per-source loss
- doc_entropy_quality (queries/curation.py): per-doc unigram entropy +
  top-token-share gate
- lang_script_mismatch_audit (queries/hygiene.py): declared-lang vs
  script consistency with planted Han repairs
"""

from __future__ import annotations

import math

_SF = "/root/testdata/sf0.001"


def test_domain_mixture_reweight_properties(spark):
    from dbt_spark.queries.llmops import domain_mixture_reweight

    rows = domain_mixture_reweight(spark, _SF).collect()
    assert len(rows) > 1
    w_opt = [r["w_opt_r6"] for r in rows]
    w_base = [r["w_base_r6"] for r in rows]
    # a normalized distribution (up to the r6 pinning of each weight)
    assert abs(sum(w_opt) - 1.0) < 1e-4
    assert abs(sum(w_base) - 1.0) < 1e-4
    assert all(w > 0 for w in w_opt)
    # the MW direction: the max-loss source never loses weight and the
    # min-loss source never gains (monotone update around the weighted
    # mean, three rounds)
    by_loss = sorted(rows, key=lambda r: r["loss_r6"])
    assert by_loss[-1]["w_delta_r6"] >= 0
    assert by_loss[0]["w_delta_r6"] <= 0
    for r in rows:
        assert abs(r["w_opt_r6"] - r["w_base_r6"] - r["w_delta_r6"]) < 2e-6


def test_doc_entropy_quality_properties(spark):
    from dbt_spark.queries.curation import (_ENTROPY_MIN, _TOPFRAC_MAX,
                                            doc_entropy_quality)

    rows = doc_entropy_quality(spark, _SF).collect()
    assert len(rows) > 10
    assert _TOPFRAC_MAX == 0.15  # the 20·max_c > 3·n integer form
    for r in rows:
        # 0 ≤ H ≤ log2(n_types) ≤ log2(n_tokens)
        assert -1e-6 <= r["entropy_r6"] <= math.log2(r["n_types"]) + 1e-6
        assert 0 < r["top_frac_r6"] <= 1.0
        assert r["n_types"] <= r["n_tokens"]
        expect = int(r["entropy_r6"] < _ENTROPY_MIN
                     or r["top_frac_r6"] > _TOPFRAC_MAX)
        assert r["low_quality"] == expect
    # the gate discriminates on the fixture: both verdicts occur
    flags = {r["low_quality"] for r in rows}
    assert flags == {0, 1}


def test_lang_script_mismatch_audit_plant_arithmetic(spark):
    from dbt_spark.queries.hygiene import lang_script_mismatch_audit
    from dbt_spark.session import load_tables

    rows = {r["lang"]: r for r in
            lang_script_mismatch_audit(spark, _SF).collect()}
    docs = load_tables(spark, _SF, "documents")["documents"]
    zh_ids = [r["doc_id"] for r in
              docs.filter("lang = 'zh'").select("doc_id").collect()]
    planted = [d for d in zh_ids if d % 3 == 0]
    zh = rows["zh"]
    # every planted doc carries Han, every unplanted zh doc is flagged
    assert zh["n_with_han"] == len(planted)
    assert zh["n_mismatch"] == len(zh_ids) - len(planted)
    assert zh["n_docs"] == len(zh_ids)
    flagged = sorted(set(zh_ids) - set(planted))
    assert zh["first_flagged"] == flagged[0]
    assert zh["last_flagged"] == flagged[-1]
    # Latin-declared languages: all-ASCII corpus -> zero mismatches
    for lang, r in rows.items():
        if lang != "zh":
            assert r["n_mismatch"] == 0
            assert r["first_flagged"] is None


def test_dedup_minhash_lsh_paired_properties(spark):
    from dbt_spark.queries.curation import (_LSHP_VERIFY_T,
                                            dedup_minhash_lsh_paired)

    rows = dedup_minhash_lsh_paired(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 1 <= r["n_bands_hit"] <= 4
        assert r["jaccard_r6"] >= _LSHP_VERIFY_T
        assert r["n_common"] >= 1
    # exact duplicates (jaccard 1.0) must collide in EVERY band
    for r in rows:
        if r["jaccard_r6"] == 1.0:
            assert r["n_bands_hit"] == 4


def test_stream_mixture_reweight_equals_batch(spark):
    """The streaming twin's merged partials reproduce the batch query
    exactly (additive sum-merge is batching-independent)."""
    from dbt_spark.queries.llmops import domain_mixture_reweight
    from dbt_spark.queries.streaming_q import stream_mixture_reweight

    got = stream_mixture_reweight(spark, _SF).collect()
    want = domain_mixture_reweight(spark, _SF).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_bt_preference_strength_properties(spark):
    from dbt_spark.queries.curation import bt_preference_strength

    rows = bt_preference_strength(spark, _SF).collect()
    assert len(rows) >= 2
    s = [r["s_bt_r6"] for r in rows]
    assert abs(sum(s) - 1.0) < 1e-4
    assert all(x > 0 for x in s)
    # BT strengths are winrate-monotone on a balanced complete schedule
    # (every type plays every other the same users): more wins -> more
    # strength
    by_wins = sorted(rows, key=lambda r: r["n_wins"])
    bt_order = [r["event_type"] for r in by_wins]
    by_s = sorted(rows, key=lambda r: r["s_bt_r6"])
    assert [r["event_type"] for r in by_s] == bt_order
    for r in rows:
        assert 0.0 <= r["raw_winrate_r6"] <= 1.0


def test_stream_bt_strength_equals_batch(spark):
    """Decimal partials sum-merge is batching-independent: the streaming
    twin reproduces the batch fit exactly."""
    from dbt_spark.queries.curation import bt_preference_strength
    from dbt_spark.queries.streaming_q import stream_bt_strength

    got = stream_bt_strength(spark, _SF).collect()
    want = bt_preference_strength(spark, _SF).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_dp_exponential_topk_properties(spark):
    """Private selection: exactly k rows, deterministically ordered, and
    the released set is frequency-biased (the true top token survives the
    noise at eps=1 on this corpus's count gaps)."""
    from dbt_spark.queries.curation import _docs
    from dbt_spark.queries.hygiene import _DP_TOPK, dp_exponential_topk
    from pyspark.sql import functions as F

    rows = dp_exponential_topk(spark, _SF).collect()
    assert len(rows) == _DP_TOPK
    scores = [r["noisy_score_r6"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # the argmax of count*eps/2 + Gumbel with count gaps >> noise scale
    # keeps the true most-frequent token at rank 1
    toks = (_docs(spark, _SF)
            .select(F.explode(F.split(F.trim(F.lower("text")), r"\s+"))
                    .alias("t"))
            .filter(F.length("t") > 0)
            .groupBy("t").count().orderBy(F.desc("count"), "t"))
    true_top = toks.first()["t"]
    assert rows[0]["tok"] == true_top


def test_filter_agreement_kappa_properties(spark):
    from dbt_spark.queries.hygiene import filter_agreement_kappa

    rows = filter_agreement_kappa(spark, _SF).collect()
    assert len(rows) == 3
    for r in rows:
        n = r["n11"] + r["n10"] + r["n01"] + r["n00"]
        assert n > 0
        po = (r["n11"] + r["n00"]) / n
        assert abs(r["agreement_r6"] - round(po, 6)) < 1e-9
        assert -1.0 - 1e-9 <= r["kappa_r6"] <= 1.0 + 1e-9
    assert [(r["gate_a"], r["gate_b"]) for r in rows] == [
        ("g_c4", "g_entropy"), ("g_c4", "g_wordlen"),
        ("g_entropy", "g_wordlen")]


def test_timeseries_rollup_cascade_exact_everywhere(spark):
    from dbt_spark.queries.curation import timeseries_rollup_cascade

    rows = timeseries_rollup_cascade(spark, _SF).collect()
    assert len(rows) > 0
    # decimal re-aggregation is lossless: the in-query proof must hold on
    # every day cell
    assert all(r["cascade_exact"] == 1 for r in rows)
    assert all(r["n_events"] > 0 for r in rows)


def test_canary_extraction_audit_inventory(spark):
    from dbt_spark.queries.hygiene import (_CANARY_MOD, _N_CANARY,
                                           _N_CANARY_PLANTED,
                                           canary_extraction_audit)
    from dbt_spark.session import load_tables

    rows = {r["canary_id"]: r for r in
            canary_extraction_audit(spark, _SF).collect()}
    assert len(rows) == _N_CANARY
    ids = [r["doc_id"] for r in
           load_tables(spark, _SF, "documents")["documents"]
           .select("doc_id").collect()]
    for i in range(_N_CANARY):
        r = rows[i]
        if i < _N_CANARY_PLANTED:
            want = [d for d in ids if d % _CANARY_MOD == 3 * i]
            assert r["n_docs_containing"] == len(want), i
            assert r["leaked"] == (1 if want else 0)
            if want:
                assert r["first_doc"] == min(want)
                assert r["last_doc"] == max(want)
        else:
            assert r["n_docs_containing"] == 0
            assert r["leaked"] == 0
            assert r["first_doc"] is None


def test_stream_rollup_cascade_equals_batch(spark):
    from dbt_spark.queries.curation import timeseries_rollup_cascade
    from dbt_spark.queries.streaming_q import stream_rollup_cascade

    got = stream_rollup_cascade(spark, _SF).collect()
    want = timeseries_rollup_cascade(spark, _SF).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert all(r["cascade_exact"] == 1 for r in got)
