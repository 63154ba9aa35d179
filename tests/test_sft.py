"""SFT/conversation operators (queries/sft.py): structural invariants on
sf0.001 — the value-exact cross-engine pairing is tools/check.py's job."""

SF = "/root/testdata/sf0.001"


def test_dialog_turn_flatten_roles_partition(spark):
    from dbt_spark.queries.sft import dialog_turn_flatten

    rows = dialog_turn_flatten(spark, SF).collect()
    assert rows, "conversations expected"
    for r in rows:
        assert r["n_user"] + r["n_assistant"] == r["n_turns"]
        # alternating roles offset by conv parity: counts differ by <= 1
        assert abs(r["n_user"] - r["n_assistant"]) <= 1
        assert len(r["transcript_md5"]) == 32


def test_turn_dedup_counts(spark):
    from dbt_spark.queries.sft import turn_dedup_normalized

    rows = turn_dedup_normalized(spark, SF).collect()
    assert rows
    total_dropped = sum(r["n_dropped"] for r in rows)
    for r in rows:
        assert r["n_unique"] + r["n_dropped"] == r["n_turns"]
        assert r["n_unique"] >= 1
    # fixture injects canned turns on doc_id % 5 in {0,1} — some MUST collapse
    assert total_dropped > 0


def test_best_of_k_is_argmax(spark):
    from dbt_spark.queries.sft import _PROMPTS, rejection_sample_best_of_k, _docs
    from pyspark.sql import functions as F

    best = {r["prompt_id"]: r for r in
            rejection_sample_best_of_k(spark, SF).collect()}
    # independent recompute of the per-prompt max score
    docs = _docs(spark, SF).select(
        (F.col("doc_id") % _PROMPTS).alias("prompt_id"),
        "doc_id",
        ((F.length("text")
          - F.length(F.replace(F.col("text"), F.lit("join"), F.lit("")))) / 4
         * 10 + (F.length("text") % 37)).cast("bigint").alias("score"),
    )
    truth = docs.groupBy("prompt_id").agg(
        F.max("score").alias("mx"),
        F.count(F.lit(1)).alias("n")).collect()
    for t in truth:
        b = best[t["prompt_id"]]
        assert b["best_score"] == t["mx"]
        assert b["n_candidates"] == t["n"]


def test_sequence_pack_conservation(spark):
    """Packing conserves tokens: sum over blocks == corpus token count;
    every block except each shard's last is exactly full."""
    from pyspark.sql import functions as F

    from dbt_spark.queries.sft import (_SEQ_BUDGET, _docs,
                                       sequence_pack_chunks)

    rows = sequence_pack_chunks(spark, SF).collect()
    total = _docs(spark, SF).select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))).collect()[0][0]
    assert sum(r["n_tokens"] for r in rows) == total
    last_per_shard = {}
    for r in rows:
        last_per_shard[r["shard"]] = max(
            last_per_shard.get(r["shard"], -1), r["seq_id"])
    for r in rows:
        if r["seq_id"] != last_per_shard[r["shard"]]:
            assert r["n_tokens"] == _SEQ_BUDGET, r
        assert r["n_docs"] >= 1


def test_chat_template_mask_inside_template(spark):
    """Mask spans cover only assistant content: masked < total, and span
    count equals assistant turn count from the flatten view."""
    from dbt_spark.queries.sft import (chat_template_render,
                                       dialog_turn_flatten)

    masks = {r["conv_id"]: r for r in chat_template_render(spark, SF).collect()}
    flat = {r["conv_id"]: r for r in dialog_turn_flatten(spark, SF).collect()}
    assert set(masks) == set(flat)
    for cid, m in masks.items():
        assert 0 < m["masked_chars"] < m["total_chars"]
        assert m["n_mask_spans"] == flat[cid]["n_assistant"]


def test_context_truncate_suffix_property(spark):
    """Kept turns form a SUFFIX: first_kept_idx + n_kept - 1 == last turn;
    budget respected; dropping anything means the window is full-ish."""
    from dbt_spark.queries.sft import _CTX_BUDGET, context_window_truncate

    rows = context_window_truncate(spark, SF).collect()
    assert rows
    dropped_any = False
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_turns"]
        assert 1 <= r["n_kept"] <= r["n_turns"]
        assert r["chars_kept"] <= _CTX_BUDGET
        assert r["first_kept_idx"] == r["n_turns"] - r["n_kept"]
        dropped_any = dropped_any or r["n_dropped"] > 0
    assert dropped_any  # the budget genuinely bites on this corpus


def test_role_validate_finds_violations(spark):
    """The lossy filter creates both valid and invalid conversations, and
    'valid' is exactly the conjunction of its two components."""
    from dbt_spark.queries.sft import dialog_role_validate

    rows = dialog_role_validate(spark, SF).collect()
    vals = {r["valid"] for r in rows}
    assert vals == {True, False}
    for r in rows:
        assert r["valid"] == (
            r["n_same_role_adjacent"] == 0 and not r["assistant_first"])


def test_dpo_pairs_are_extremes(spark):
    """chosen/rejected are the pool extremes and margins are positive."""
    from dbt_spark.queries.sft import dpo_pair_construct, rejection_sample_best_of_k

    best = {r["prompt_id"]: r for r in
            rejection_sample_best_of_k(spark, SF).collect()}
    pairs = dpo_pair_construct(spark, SF).collect()
    assert pairs
    for p in pairs:
        assert p["margin"] > 0
        assert p["chosen_score"] > p["rejected_score"]
        assert p["chosen_doc_id"] == best[p["prompt_id"]]["best_doc_id"]
        assert p["chosen_score"] == best[p["prompt_id"]]["best_score"]


def test_rm_pairs_are_user_assistant_adjacent(spark):
    """Every extracted pair is an assistant turn whose predecessor in the
    SAME conversation is a user turn; counts bounded by assistant count."""
    from dbt_spark.queries.sft import _turns, rm_pair_extract

    pairs = rm_pair_extract(spark, SF).collect()
    assert pairs
    turns = {(r["conv_id"], r["turn_idx"]): r["role"]
             for r in _turns(spark, SF).collect()}
    for p in pairs:
        assert turns[(p["conv_id"], p["response_idx"])] == "assistant"
        assert turns[(p["conv_id"], p["response_idx"] - 1)] == "user"
        assert p["prompt_chars"] > 0 and p["response_chars"] > 0


def test_matryoshka_overlap_monotone_tendency(spark):
    """Truncation probe sanity: overlaps are in [0,5], every (query, dim)
    row exists, and the 32-dim mean overlap is >= the 8-dim mean (more
    dims can only help on average for exact cosine)."""
    from collections import defaultdict

    from dbt_spark.queries.llmops import matryoshka_overlap_probe

    rows = matryoshka_overlap_probe(spark, SF).collect()
    by_dim = defaultdict(list)
    for r in rows:
        assert 0 <= r["overlap5"] <= 5
        by_dim[r["trunc_dim"]].append(r["overlap5"])
    assert set(by_dim) == {8, 16, 32}
    assert len(by_dim[8]) == len(by_dim[16]) == len(by_dim[32])
    mean = {d: sum(v) / len(v) for d, v in by_dim.items()}
    assert mean[32] >= mean[8]


def test_prompt_decontam_excludes_benchmark_and_bounds(spark):
    """Decontam gate structure: benchmark turns (doc_id % 13 == 0) never
    appear as train rows; 0 <= n_shared <= n_grams; a benchmark turn's
    exact duplicate among train turns would be fully contained."""
    from dbt_spark.queries.sft import _BENCH_MOD, prompt_decontam_ngram

    rows = prompt_decontam_ngram(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % _BENCH_MOD != 0
        assert 0 <= r["n_shared"] <= r["n_grams"]
        assert r["contaminated"] == (r["containment"] >= 0.3)
    # canned turns ('thanks!' etc are <3 tokens, so excluded) — but text
    # prefixes repeat across doc ids; SOME turn must share grams with the
    # benchmark set at this fixture density
    assert any(r["n_shared"] > 0 for r in rows)
    assert any(r["n_shared"] == 0 for r in rows)


def test_preference_consistency_status_partition(spark):
    """Audit statuses partition the pools; flags agree with the dpo
    filter: every pool dpo_pair_construct KEEPS must audit ok or
    tie_broken/degenerate (margin > 0, >= 2 candidates), every pool it
    drops must audit too_small or zero_margin."""
    from dbt_spark.queries.sft import (
        dpo_pair_construct,
        preference_pair_consistency,
    )

    audit = {r["prompt_id"]: r
             for r in preference_pair_consistency(spark, SF).collect()}
    kept = {r["prompt_id"] for r in dpo_pair_construct(spark, SF).collect()}
    assert audit
    for pid, r in audit.items():
        assert r["audit_status"] in (
            "ok", "too_small", "zero_margin", "degenerate", "tie_broken")
        if pid in kept:
            assert r["n_candidates"] >= 2 and r["margin"] > 0
            assert r["audit_status"] in ("ok", "tie_broken", "degenerate")
        else:
            assert r["audit_status"] in ("too_small", "zero_margin")


def test_dialog_mixture_stats_conservation(spark):
    """Mixture cells conserve the turn fixture: per-conv user+assistant
    counts and chars match a direct recount; share in [0,1]; alternating
    roles ⇒ every conversation is role_balanced."""
    from collections import defaultdict

    from dbt_spark.queries.sft import _turns, dialog_mixture_stats

    stats = {r["conv_id"]: r for r in dialog_mixture_stats(spark, SF).collect()}
    counts = defaultdict(lambda: [0, 0, 0, 0])
    for t in _turns(spark, SF).collect():
        c = counts[t["conv_id"]]
        if t["role"] == "user":
            c[0] += 1
            c[2] += len(t["content"])
        else:
            c[1] += 1
            c[3] += len(t["content"])
    assert set(stats) == set(counts)
    for cid, (nu, na, uc, ac) in counts.items():
        r = stats[cid]
        assert (r["n_user"], r["n_assistant"]) == (nu, na)
        assert (r["user_chars"], r["assistant_chars"]) == (uc, ac)
        assert 0.0 <= r["assistant_share"] <= 1.0
        assert r["role_balanced"]  # fixture alternates roles strictly
        assert 0 <= r["len_bucket"] <= 9


def test_packed_attention_boundaries_consistent_with_packing(spark):
    """cu_seqlens metadata agrees with sequence_pack_chunks: same
    (shard, seq_id) keys, n_boundaries == that block's n_docs, fill
    == that block's n_tokens, and boundaries are unique in-range ints
    (recomputed from the same offsets in python)."""
    from dbt_spark.queries.sft import (
        _SEQ_BUDGET,
        packed_attention_doc_mask,
        sequence_pack_chunks,
    )

    packs = {(r["shard"], r["seq_id"]): r
             for r in sequence_pack_chunks(spark, SF).collect()}
    masks = {(r["shard"], r["seq_id"]): r
             for r in packed_attention_doc_mask(spark, SF).collect()}
    assert set(packs) == set(masks)
    for k, m in masks.items():
        assert m["n_boundaries"] == packs[k]["n_docs"]
        assert m["n_tokens"] == packs[k]["n_tokens"]
        assert 1 <= m["n_boundaries"] <= _SEQ_BUDGET
        assert len(m["cu_seqlens_md5"]) == 32
