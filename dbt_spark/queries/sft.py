"""Instruction-tuning (SFT) data operators: dialog-turn flattening and
ordered rejoin, turn-level dedup, and rejection-sampling best-of-k.

The post-pretraining half of a training-data pipeline: conversation
corpora arrive as arrays of (role, content) turns; the pipeline flattens
them for per-turn scrubbing, dedups boilerplate turns ("thanks!") inside
each conversation, rejoins transcripts in role order, and — for RLHF-ish
candidate pools — keeps the argmax-scored response per prompt
(best-of-k rejection sampling, the ``dedup_keep_best`` pattern
generalized to scored candidate groups).

Fixture: the synthetic ``documents`` table is deterministically folded
into a conversations shape with the SAME expressions in both engines
(conv_id = doc_id % 40, turn order by doc_id, alternating roles offset
by conversation parity, canned short turns injected on doc_id % 5 so
turn-level dedup has real work at every SF). The operators under test are the
flatten/collect/dedup/argmax plans; the fold is the fixture.

Scale design (100 TB): every shuffle is keyed on conv_id / prompt_id /
(conv_id, normalized turn) — plain hash partitioning, no skew (turn
counts are bounded by construction, conversation fan-in is the fold
modulus). Windows are PARTITIONED by conversation/prompt — no global
window anywhere; transcripts rejoin via array_sort over collected
structs (per-group memory is one conversation, not a partition). At
real scale the fold disappears — conversations land as an
``array<struct<role,content>>`` column and the same plans run off
``explode`` directly.

Reference parity: the reference engine ships none of these (its corpus
stops at SQL shapes); this is training-data breadth on top of §2E,
same tier as queries/hygiene.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_spark.session import load_tables, spread

#: conversation fold modulus — ~12 turns/conversation at sf0.01; small
#: enough that canned turns (doc_id % 5 classes) repeat within a
#: conversation at every SF (classes collide every 200 doc_ids)
_CONVS = 40
#: prompt-group modulus for best-of-k — ~5 candidates/prompt at sf0.01
_PROMPTS = 97


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load_tables(spark, sf_dir, "documents")["documents"], spark)


def _turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (conv_id, turn_idx, role, content) turn rows.

    Mirrored exactly by the ``turns`` CTE in every oracle below."""
    docs = _docs(spark, sf_dir)
    base = docs.select(
        (F.col("doc_id") % _CONVS).alias("conv_id"),
        F.col("doc_id"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("thanks!"))
        .when(F.col("doc_id") % 5 == 1, F.lit("sounds good"))
        .otherwise(F.substring("text", 1, 60))
        .alias("content"),
    )
    w = Window.partitionBy("conv_id").orderBy("doc_id")
    return base.select(
        "conv_id", "doc_id", "content",
        (F.row_number().over(w) - 1).alias("turn_idx"),
    ).select(
        "conv_id", "doc_id", "turn_idx", "content",
        F.when((F.col("turn_idx") + F.col("conv_id")) % 2 == 0,
               F.lit("user")).otherwise(F.lit("assistant")).alias("role"),
    )


_TURNS_CTE = f"""
        base AS (
            SELECT doc_id % {_CONVS} AS conv_id, doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN 'thanks!'
                        WHEN doc_id % 5 = 1 THEN 'sounds good'
                        ELSE substr(text, 1, 60) END AS content
            FROM documents
        ), turns AS (
            SELECT conv_id, doc_id, content,
                   row_number() OVER (PARTITION BY conv_id ORDER BY doc_id)
                       - 1 AS turn_idx,
                   CASE WHEN (row_number() OVER (PARTITION BY conv_id
                                                 ORDER BY doc_id)
                              - 1 + conv_id) % 2 = 0
                        THEN 'user' ELSE 'assistant' END AS role
            FROM base
        )"""


def dialog_turn_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten conversations to turns, then rejoin each transcript in
    role/turn order — the struct-array collect + ordered-rejoin shape.

    Spark plan: one shuffle keyed conv_id; collect_list(struct(turn_idx,
    role, content)) → array_sort (structs sort by first field = turn
    order) → transform → array_join → md5. Per-group state is ONE
    conversation's turns (bounded), so no window, no skew; at 100 TB the
    same plan holds because conv_id hash-partitions evenly. The md5 of
    the rejoined transcript proves byte-identical ordering cross-engine."""
    t = _turns(spark, sf_dir)
    return (
        t.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            F.sum((F.col("role") == "user").cast("int"))
            .cast("bigint").alias("n_user"),
            F.sum((F.col("role") == "assistant").cast("int"))
            .cast("bigint").alias("n_assistant"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("turn_idx", "role", "content"))),
                        lambda s: F.concat(
                            s["role"], F.lit(": "), s["content"]),
                    ),
                    "\n",
                )
            ).alias("transcript_md5"),
        )
        .orderBy("conv_id")
    )


def turn_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn-level dedup keyed on (conversation, normalized turn):
    whitespace-collapsed lowercase content, keep the FIRST occurrence
    (min turn_idx) — the canned 'thanks!' turns injected by the fixture
    collapse within each conversation.

    Plan: one shuffle keyed (conv_id, norm) with map-side combine, then
    a conv_id re-aggregate; the kept-turn md5 (turn indexes folded in
    order) proves WHICH occurrences survived, not just how many."""
    t = _turns(spark, sf_dir)
    norm = F.lower(F.trim(F.regexp_replace("content", r"\s+", " ")))
    kept = (
        t.select("conv_id", norm.alias("norm"), "turn_idx")
        .groupBy("conv_id", "norm")
        .agg(F.min("turn_idx").alias("kept_idx"),
             F.count(F.lit(1)).alias("occurrences"))
    )
    return (
        kept.groupBy("conv_id")
        .agg(
            F.sum("occurrences").cast("bigint").alias("n_turns"),
            F.count(F.lit(1)).cast("bigint").alias("n_unique"),
            (F.sum("occurrences") - F.count(F.lit(1)))
            .cast("bigint").alias("n_dropped"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("kept_idx")),
                        lambda x: x.cast("string")),
                    ",",
                )
            ).alias("kept_turns_md5"),
        )
        .orderBy("conv_id")
    )


def rejection_sample_best_of_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-k rejection sampling: documents grouped into candidate
    pools (prompt_id = doc_id % 97), scored with a deterministic quality
    score (keyword density + length term), keep the argmax per prompt
    with (score DESC, doc_id ASC) tie-break — ``dedup_keep_best``
    generalized to scored candidate groups.

    Plan: row_number over a window PARTITIONED BY prompt_id (bounded
    groups, hash-partitioned — scalable), filter rn=1, plus a sibling
    aggregate for pool stats joined back on prompt_id. Score is pure
    column algebra both engines compute bit-identically (integer ops)."""
    docs = _docs(spark, sf_dir)
    cand = docs.select(
        (F.col("doc_id") % _PROMPTS).alias("prompt_id"),
        "doc_id",
        (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit("join"), F.lit("")))) / 4
            * 10
            + (F.length("text") % 37)
        ).cast("bigint").alias("score"),
    )
    w = Window.partitionBy("prompt_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("prompt_id", F.col("doc_id").alias("best_doc_id"),
                F.col("score").alias("best_score"))
    )
    pool = cand.groupBy("prompt_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum("score").cast("bigint").alias("sum_score"),
    )
    return best.join(pool, "prompt_id").orderBy("prompt_id")


#: token budget per packed training sequence
_SEQ_BUDGET = 256
#: independent packing streams — a FIXTURE size; at corpus scale the
#: shard count is ∝ corpus size so the per-shard cumsum window stays
#: bounded (shards are the packing parallelism unit)
_SHARDS = 8


def sequence_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate documents (in doc_id order
    within a shard) into one token stream and slice it into fixed
    ``_SEQ_BUDGET``-token training sequences; documents straddle block
    boundaries (the standard pretraining concat-and-chunk, vs the
    no-straddle first-fit variant).

    Plan: whitespace token counts → per-shard cumulative offset (window
    partitioned by shard — bounded because shard count scales with the
    corpus), each doc explodes into the 1..k blocks it overlaps
    (sequence/explode — fan-out ∝ doc length / budget), then one
    (shard, seq_id) aggregate. Integer-only arithmetic → bit-exact
    pairing. Per sequence: docs contributing, tokens filled, straddlers."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        (F.col("doc_id") % _SHARDS).alias("shard"),
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
    )
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    offs = toks.withColumn("off", F.coalesce(F.sum("n_tok").over(w),
                                             F.lit(0)))
    b = F.lit(_SEQ_BUDGET)
    spans = offs.select(
        "shard", "doc_id", "n_tok", "off",
        F.explode(
            F.sequence(
                (F.col("off") / b).cast("bigint"),
                ((F.col("off") + F.col("n_tok") - 1) / b).cast("bigint"),
            )
        ).alias("seq_id"),
    )
    overlap = (
        F.least(F.col("off") + F.col("n_tok"), (F.col("seq_id") + 1) * b)
        - F.greatest(F.col("off"), F.col("seq_id") * b)
    )
    crosses = (
        ((F.col("off") / b).cast("bigint")
         != ((F.col("off") + F.col("n_tok") - 1) / b).cast("bigint"))
        .cast("int")
    )
    return (
        spans.select("shard", "seq_id", overlap.alias("tok_in_block"),
                     crosses.alias("crosses"))
        .groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("tok_in_block").cast("bigint").alias("n_tokens"),
            F.sum("crosses").cast("bigint").alias("n_straddlers"),
        )
        .orderBy("shard", "seq_id")
    )


def packed_attention_doc_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-packed-sequence document-boundary metadata (``cu_seqlens``):
    for every training block produced by the concat-and-chunk packer,
    the sorted intra-block offsets where a new document starts — the
    array a block-diagonal attention mask / flash-attention varlen
    kernel consumes so packed documents cannot attend across boundaries.
    Boundary list is md5-folded to a scalar (driver canonicalizer
    contract); n_boundaries and the block fill are carried alongside.

    Plan: the same shard-partitioned cumulative-offset window and block
    explode as sequence_pack_chunks (one keyed shuffle + bounded
    fan-out), then one (shard, seq_id) aggregate whose collect_list is
    bounded by docs-per-block (≤ budget when every doc is 1 token).
    Integer-only → bit-exact pairing."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        (F.col("doc_id") % _SHARDS).alias("shard"),
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
    )
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    offs = toks.withColumn("off", F.coalesce(F.sum("n_tok").over(w),
                                             F.lit(0)))
    b = F.lit(_SEQ_BUDGET)
    spans = offs.select(
        "shard", "doc_id", "n_tok", "off",
        F.explode(
            F.sequence(
                (F.col("off") / b).cast("bigint"),
                ((F.col("off") + F.col("n_tok") - 1) / b).cast("bigint"),
            )
        ).alias("seq_id"),
    )
    # intra-block start: docs straddling in from the previous block start
    # at offset 0 here, fresh docs at their stream offset modulo the block
    intra = F.greatest(F.col("off") - F.col("seq_id") * b, F.lit(0))
    fill = (
        F.least(F.col("off") + F.col("n_tok"), (F.col("seq_id") + 1) * b)
        - F.greatest(F.col("off"), F.col("seq_id") * b)
    )
    return (
        spans.select("shard", "seq_id", intra.alias("boundary"),
                     fill.alias("fill"))
        .groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_boundaries"),
            F.sum("fill").cast("bigint").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("boundary")),
                        lambda x: x.cast("string")),
                    ",")
            ).alias("cu_seqlens_md5"),
        )
        .orderBy("shard", "seq_id")
    )


def chat_template_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template rendering + loss-mask span computation: each turn
    renders as ``<|role|>content<|end|>``; the training loss is masked to
    assistant CONTENT spans only. Emits per conversation the rendered
    transcript md5 and the mask spans md5 (start:end char offsets over
    the rendered string) — the byte-exact contract a tokenizer-side
    masking step consumes.

    Plan: per-conversation cumulative length window (bounded groups) for
    turn start offsets; span arithmetic is pure column algebra; two md5
    folds prove cross-engine byte equality of both the template and the
    mask. One shuffle keyed conv_id."""
    t = _turns(spark, sf_dir)
    rendered = t.select(
        "conv_id", "turn_idx", "role", "content",
        F.concat(F.lit("<|"), F.col("role"), F.lit("|>"),
                 F.col("content"), F.lit("<|end|>")).alias("r"),
    ).withColumn("rlen", F.length("r"))
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    offs = rendered.withColumn(
        "start", F.coalesce(F.sum("rlen").over(w), F.lit(0)))
    # assistant content span: skip '<|assistant|>' (13 chars), stop
    # before '<|end|>' (7 chars)
    span = offs.withColumn(
        "m_start",
        F.col("start") + F.length("role") + F.lit(4)).withColumn(
        "m_end", F.col("start") + F.col("rlen") - F.lit(7))
    return (
        span.groupBy("conv_id")
        .agg(
            F.sum("rlen").cast("bigint").alias("total_chars"),
            F.sum(
                F.when(F.col("role") == "assistant",
                       F.col("m_end") - F.col("m_start")).otherwise(F.lit(0))
            ).cast("bigint").alias("masked_chars"),
            F.sum((F.col("role") == "assistant").cast("int"))
            .cast("bigint").alias("n_mask_spans"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("turn_idx", "r"))),
                        lambda s: s["r"]),
                    "")
            ).alias("template_md5"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("role") == "assistant",
                                    F.struct(
                                        "turn_idx",
                                        F.concat(
                                            F.col("m_start").cast("string"),
                                            F.lit(":"),
                                            F.col("m_end").cast("string"),
                                        ).alias("s"),
                                    ),
                                )
                            )
                        ),
                        lambda s: s["s"]),
                    ",")
            ).alias("mask_md5"),
        )
        .orderBy("conv_id")
    )


#: rendered-character budget for context-window truncation
_CTX_BUDGET = 200


def context_window_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-limit truncation: keep the longest SUFFIX of each
    conversation's turns whose cumulative rendered length fits the
    budget (what a serving/training stack does when a dialog outgrows
    the context window — drop the oldest turns, keep the recent ones).

    Closed form, no iteration: reverse cumulative length per
    conversation (window ordered turn_idx DESC, bounded groups); a turn
    survives iff its reverse-cumsum ≤ budget. Per conversation: turns
    kept/dropped, chars kept, the first kept turn index, and whether the
    kept window starts on a user turn (stacks re-anchor on a user turn;
    the flag feeds that re-anchoring). One shuffle keyed conv_id."""
    t = _turns(spark, sf_dir)
    rlen = F.length("content") + F.length("role") + F.lit(11)
    w = (Window.partitionBy("conv_id").orderBy(F.col("turn_idx").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    r = t.withColumn("revcum", F.sum(rlen).over(w))
    kept = F.col("revcum") <= _CTX_BUDGET
    return (
        r.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            F.sum(kept.cast("int")).cast("bigint").alias("n_kept"),
            (F.count(F.lit(1)) - F.sum(kept.cast("int")))
            .cast("bigint").alias("n_dropped"),
            F.sum(F.when(kept, rlen).otherwise(F.lit(0)))
            .cast("bigint").alias("chars_kept"),
            # struct-min = lexicographic (turn_idx, role): the earliest
            # kept turn and its role in ONE aggregate, no nested window
            F.min(F.when(kept, F.struct("turn_idx", "role"))).alias("__fk"),
        )
        .select(
            "conv_id", "n_turns", "n_kept", "n_dropped", "chars_kept",
            F.col("__fk.turn_idx").cast("bigint").alias("first_kept_idx"),
            (F.col("__fk.role") == "user").alias("starts_on_user"),
        )
        .orderBy("conv_id")
    )


def dialog_role_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-sequence validation after a lossy filter: drop every turn
    whose doc_id % 11 == 0 (simulating scrubbed/failed turns), then flag
    conversations whose REMAINING sequence violates the chat contract —
    consecutive same-role turns or an assistant-first opening. The
    standard post-scrub data-quality gate before SFT packaging.

    Plan: one filter + per-conversation LAG window (bounded groups) +
    conv-level aggregate. Output one row per conversation with the
    violation counts so downstream can quarantine rather than crash."""
    t = _turns(spark, sf_dir).filter(F.col("doc_id") % 11 != 0)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    r = t.withColumn("prev_role", F.lag("role").over(w)).withColumn(
        "rn", F.row_number().over(w))
    return (
        r.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            F.coalesce(
                F.sum((F.col("prev_role") == F.col("role")).cast("int")),
                F.lit(0),
            ).cast("bigint").alias("n_same_role_adjacent"),
            F.max(
                F.when(F.col("rn") == 1,
                       (F.col("role") == "assistant").cast("int"))
            ).cast("boolean").alias("assistant_first"),
        )
        .withColumn(
            "valid",
            (F.col("n_same_role_adjacent") == 0) & ~F.col("assistant_first"),
        )
        .orderBy("conv_id")
    )


def dpo_pair_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO preference-pair construction: per candidate pool (the
    best-of-k fixture), pair the argmax-scored response (chosen) with
    the argmin-scored one (rejected), deterministic doc_id tie-breaks,
    emit only pools with ≥2 candidates and a strictly positive margin —
    the dataset shape direct-preference-optimization training consumes.

    Plan: two row_numbers over the SAME prompt-partitioned sort (one
    window exchange feeds both), conditional aggregation to one row per
    prompt — no self-join. Integer scores → bit-exact pairing."""
    docs = _docs(spark, sf_dir)
    cand = docs.select(
        (F.col("doc_id") % _PROMPTS).alias("prompt_id"),
        "doc_id",
        ((F.length("text")
          - F.length(F.replace(F.col("text"), F.lit("join"), F.lit("")))) / 4
         * 10 + (F.length("text") % 37)).cast("bigint").alias("score"),
    )
    w_best = Window.partitionBy("prompt_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    w_worst = Window.partitionBy("prompt_id").orderBy(
        F.col("score").asc(), F.col("doc_id").desc())
    r = (cand.withColumn("rb", F.row_number().over(w_best))
         .withColumn("rw", F.row_number().over(w_worst)))
    return (
        r.groupBy("prompt_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.max(F.when(F.col("rb") == 1, F.col("doc_id")))
            .cast("bigint").alias("chosen_doc_id"),
            F.max(F.when(F.col("rb") == 1, F.col("score")))
            .cast("bigint").alias("chosen_score"),
            F.max(F.when(F.col("rw") == 1, F.col("doc_id")))
            .cast("bigint").alias("rejected_doc_id"),
            F.max(F.when(F.col("rw") == 1, F.col("score")))
            .cast("bigint").alias("rejected_score"),
        )
        .withColumn("margin",
                    (F.col("chosen_score") - F.col("rejected_score"))
                    .cast("bigint"))
        .filter((F.col("n_candidates") >= 2) & (F.col("margin") > 0))
        .orderBy("prompt_id")
    )


def rm_pair_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reward-model pair extraction: every assistant turn paired with its
    immediately preceding user turn — the (prompt, response) dataset shape
    RM/annotation pipelines consume. Assistant turns whose predecessor is
    not a user turn (conversation opener) are dropped, and the md5s pin
    both sides byte-exactly.

    Plan: one LAG window per conversation (bounded groups) + a filter —
    no join; at 100 TB this is a single conv-keyed shuffle."""
    t = _turns(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    r = t.withColumn("prev_role", F.lag("role").over(w)).withColumn(
        "prev_content", F.lag("content").over(w))
    return (
        r.filter((F.col("role") == "assistant")
                 & (F.col("prev_role") == "user"))
        .select(
            "conv_id",
            F.col("turn_idx").cast("bigint").alias("response_idx"),
            F.md5("prev_content").alias("prompt_md5"),
            F.md5("content").alias("response_md5"),
            F.length("prev_content").cast("bigint").alias("prompt_chars"),
            F.length("content").cast("bigint").alias("response_chars"),
        )
        .orderBy("conv_id", "response_idx")
    )


#: benchmark-prompt fixture modulus for prompt-level decontamination
_BENCH_MOD = 13
#: shared-3-gram containment threshold flagging a contaminated prompt
_DECON_THRESH = 0.3


def prompt_decontam_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prompt-level SFT decontamination (VERDICT r11 #5a): user turns are
    checked for word-3-gram overlap against a benchmark-prompt set
    (fixture: user turns with doc_id % 13 == 0) — the release gate that
    keeps eval prompts out of the SFT mix, the turn-keyed analogue of
    document-level decontamination_anti_join.

    Per train user turn: distinct 3-grams, how many also occur in ANY
    benchmark prompt, containment = shared/|grams|, contaminated flag at
    the 0.3 threshold. Turns with < 3 tokens carry no 3-gram signal and
    are excluded.

    Plan (100 TB): benchmark prompts are eval-suite sized → their
    distinct gram hashes BROADCAST; train grams explode map-side from
    the token array (no window), match via one broadcast equi-join on
    xxhash64(gram) — 8-byte keys, never strings — then one doc-keyed
    aggregate. The DuckDB oracle joins raw gram strings, so any 64-bit
    collision would surface as a value mismatch."""
    t = _turns(spark, sf_dir).filter(F.col("role") == "user")
    grams = _user_turn_gram_hashes(t)
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    bench = grams.filter(is_bench).select("h").distinct()
    train = grams.filter(~is_bench)
    return _decontam_report(train, bench).orderBy("conv_id", "doc_id")


def _user_turn_gram_hashes(df: DataFrame) -> DataFrame:
    """(conv_id, doc_id) → distinct word-3-gram xxhash64 rows; turns with
    < 3 tokens carry no 3-gram signal and vanish. Map-side explode over
    the token array, then one distinct keyed on 8-byte hashes. Shared by
    the batch query above and its streaming twin
    (queries/streaming_q.py::stream_prompt_decontam)."""
    toks = F.split(F.lower(F.trim("content")), r"\s+")
    return (
        df.select("conv_id", "doc_id", toks.alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "conv_id", "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - 3),
                    lambda i: F.concat_ws(
                        " ", F.element_at("t", i + 1),
                        F.element_at("t", i + 2), F.element_at("t", i + 3)),
                )
            ).alias("g"),
        )
        .select("conv_id", "doc_id", F.xxhash64("g").alias("h"))
        .distinct()
    )


def _decontam_report(train: DataFrame, bench: DataFrame) -> DataFrame:
    """Per-turn containment report: |grams ∩ bench| / |grams| with the
    contamination flag at ``_DECON_THRESH``; ``bench`` broadcasts (it is
    eval-suite sized by contract)."""
    shared = (
        train.join(F.broadcast(bench), "h", "left_semi")
        .groupBy("conv_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    sizes = train.groupBy("conv_id", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"))
    cont = F.round(
        F.col("n_shared").cast("double") / F.col("n_grams").cast("double"), 6)
    return (
        sizes.join(shared, ["conv_id", "doc_id"], "left")
        .select(
            "conv_id", "doc_id", "n_grams",
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
        )
        .select(
            "conv_id", "doc_id", "n_grams", "n_shared",
            cont.alias("containment"),
            (cont >= _DECON_THRESH).alias("contaminated"),
        )
    )


def preference_pair_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair consistency audit (VERDICT r11 #5b): the QA
    complement of dpo_pair_construct — instead of FILTERING bad pools
    out, report per pool WHY it is usable or not: score-tie counts at
    the max/min (argmax/argmin broken only by doc_id order), zero
    margins, and degenerate pairs whose chosen and rejected CONTENT is
    byte-identical (md5) despite distinct doc_ids. The audit a
    preference-data team runs before shipping a DPO/RM mix.

    Plan: same two prompt-partitioned row_number windows as
    dpo_pair_construct (one exchange feeds both) + conditional
    aggregation; tie counts are plain conditional sums against the pool
    max/min — no self-join, one prompt-keyed shuffle."""
    docs = _docs(spark, sf_dir)
    cand = docs.select(
        (F.col("doc_id") % _PROMPTS).alias("prompt_id"),
        "doc_id",
        F.md5("text").alias("content_md5"),
        ((F.length("text")
          - F.length(F.replace(F.col("text"), F.lit("join"), F.lit("")))) / 4
         * 10 + (F.length("text") % 37)).cast("bigint").alias("score"),
    )
    w_best = Window.partitionBy("prompt_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    w_worst = Window.partitionBy("prompt_id").orderBy(
        F.col("score").asc(), F.col("doc_id").desc())
    w_pool = Window.partitionBy("prompt_id")
    r = (cand.withColumn("rb", F.row_number().over(w_best))
         .withColumn("rw", F.row_number().over(w_worst))
         .withColumn("mx", F.max("score").over(w_pool))
         .withColumn("mn", F.min("score").over(w_pool)))
    agg = r.groupBy("prompt_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.max("score").cast("bigint").alias("max_score"),
        F.min("score").cast("bigint").alias("min_score"),
        F.sum((F.col("score") == F.col("mx")).cast("int"))
        .cast("bigint").alias("n_max_ties"),
        F.sum((F.col("score") == F.col("mn")).cast("int"))
        .cast("bigint").alias("n_min_ties"),
        F.max(F.when(F.col("rb") == 1, F.col("content_md5")))
        .alias("chosen_md5"),
        F.max(F.when(F.col("rw") == 1, F.col("content_md5")))
        .alias("rejected_md5"),
    )
    margin = (F.col("max_score") - F.col("min_score")).cast("bigint")
    degenerate = F.col("chosen_md5") == F.col("rejected_md5")
    tie_broken = (F.col("n_max_ties") > 1) | (F.col("n_min_ties") > 1)
    return (
        agg.select(
            "prompt_id", "n_candidates", margin.alias("margin"),
            "n_max_ties", "n_min_ties",
            degenerate.alias("degenerate_pair"),
            F.when(F.col("n_candidates") < 2, F.lit("too_small"))
            .when(margin == 0, F.lit("zero_margin"))
            .when(degenerate, F.lit("degenerate"))
            .when(tie_broken, F.lit("tie_broken"))
            .otherwise(F.lit("ok")).alias("audit_status"),
        )
        .orderBy("prompt_id")
    )


def dialog_mixture_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation role-balance / length-budget stats for SFT
    mixture design (VERDICT r11 #5c): user vs assistant turn and char
    counts, assistant char share, a role-balance flag (alternating chat
    ⇒ |n_user − n_assistant| ≤ 1), and a capped 500-char length bucket —
    the cell keys a mixture designer weights over.

    Plan: ONE conv-keyed aggregate with map-side partials; output is
    conversation-dimension sized. Share is a round-6 double of two
    bigint sums — bit-stable cross-engine."""
    t = _turns(spark, sf_dir)
    is_u = (F.col("role") == "user").cast("int")
    clen = F.length("content")
    agg = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum(is_u).cast("bigint").alias("n_user"),
        F.sum(1 - is_u).cast("bigint").alias("n_assistant"),
        F.sum(F.when(F.col("role") == "user", clen).otherwise(0))
        .cast("bigint").alias("user_chars"),
        F.sum(F.when(F.col("role") == "assistant", clen).otherwise(0))
        .cast("bigint").alias("assistant_chars"),
    )
    total = F.col("user_chars") + F.col("assistant_chars")
    return (
        agg.select(
            "conv_id", "n_turns", "n_user", "n_assistant",
            "user_chars", "assistant_chars",
            F.round(F.col("assistant_chars").cast("double")
                    / total.cast("double"), 6).alias("assistant_share"),
            (F.abs(F.col("n_user") - F.col("n_assistant")) <= 1)
            .alias("role_balanced"),
            F.least((total / 500).cast("bigint"), F.lit(9))
            .alias("len_bucket"),
        )
        .orderBy("conv_id")
    )


ORACLES: dict[str, str] = {
    "prompt_decontam_ngram": f"""
        WITH {_TURNS_CTE}, utoks AS (
            SELECT conv_id, doc_id,
                   string_split_regex(trim(lower(content)), '\\s+') AS t
            FROM turns WHERE role = 'user'
        ), grams AS (
            SELECT DISTINCT conv_id, doc_id, g
            FROM utoks, UNNEST(list_transform(
                     range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(g)
            WHERE len(t) >= 3
        ), bench AS (
            SELECT DISTINCT g FROM grams WHERE doc_id % {_BENCH_MOD} = 0
        ), train AS (
            SELECT * FROM grams WHERE doc_id % {_BENCH_MOD} <> 0
        ), stats AS (
            SELECT conv_id, doc_id,
                   CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(sum(CASE WHEN g IN (SELECT g FROM bench)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
            FROM train GROUP BY 1, 2
        )
        SELECT conv_id, doc_id, n_grams, n_shared,
               round(CAST(n_shared AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
                   AS containment,
               round(CAST(n_shared AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
                   >= {_DECON_THRESH} AS contaminated
        FROM stats ORDER BY conv_id, doc_id
    """,
    "preference_pair_consistency": f"""
        WITH cand AS (
            SELECT doc_id % {_PROMPTS} AS prompt_id, doc_id,
                   md5(text) AS content_md5,
                   CAST((length(text) - length(replace(text, 'join', '')))
                        / 4 * 10 + (length(text) % 37) AS BIGINT) AS score
            FROM documents
        ), r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY prompt_id
                       ORDER BY score DESC, doc_id ASC) AS rb,
                   row_number() OVER (PARTITION BY prompt_id
                       ORDER BY score ASC, doc_id DESC) AS rw,
                   max(score) OVER (PARTITION BY prompt_id) AS mx,
                   min(score) OVER (PARTITION BY prompt_id) AS mn
            FROM cand
        ), agg AS (
            SELECT prompt_id,
                   CAST(count(*) AS BIGINT) AS n_candidates,
                   CAST(max(score) - min(score) AS BIGINT) AS margin,
                   CAST(sum(CASE WHEN score = mx THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_max_ties,
                   CAST(sum(CASE WHEN score = mn THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_min_ties,
                   max(CASE WHEN rb = 1 THEN content_md5 END) AS chosen_md5,
                   max(CASE WHEN rw = 1 THEN content_md5 END) AS rejected_md5
            FROM r GROUP BY prompt_id
        )
        SELECT prompt_id, n_candidates, margin, n_max_ties, n_min_ties,
               chosen_md5 = rejected_md5 AS degenerate_pair,
               CASE WHEN n_candidates < 2 THEN 'too_small'
                    WHEN margin = 0 THEN 'zero_margin'
                    WHEN chosen_md5 = rejected_md5 THEN 'degenerate'
                    WHEN n_max_ties > 1 OR n_min_ties > 1 THEN 'tie_broken'
                    ELSE 'ok' END AS audit_status
        FROM agg ORDER BY prompt_id
    """,
    "dialog_mixture_stats": f"""
        WITH {_TURNS_CTE}, agg AS (
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_user,
                   CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_assistant,
                   CAST(sum(CASE WHEN role = 'user' THEN length(content)
                                 ELSE 0 END) AS BIGINT) AS user_chars,
                   CAST(sum(CASE WHEN role = 'assistant'
                                 THEN length(content) ELSE 0 END)
                        AS BIGINT) AS assistant_chars
            FROM turns GROUP BY conv_id
        )
        SELECT conv_id, n_turns, n_user, n_assistant,
               user_chars, assistant_chars,
               round(CAST(assistant_chars AS DOUBLE)
                     / CAST(user_chars + assistant_chars AS DOUBLE), 6)
                   AS assistant_share,
               abs(n_user - n_assistant) <= 1 AS role_balanced,
               CAST(least((user_chars + assistant_chars) // 500, 9)
                    AS BIGINT) AS len_bucket
        FROM agg ORDER BY conv_id
    """,
    "packed_attention_doc_mask": f"""
        WITH toks AS (
            SELECT doc_id % {_SHARDS} AS shard, doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                        AS BIGINT) AS n_tok
            FROM documents
        ), offs AS (
            SELECT shard, doc_id, n_tok,
                   CAST(COALESCE(SUM(n_tok) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS tok_off
            FROM toks
        ), spans AS (
            SELECT shard, n_tok, tok_off, CAST(s AS BIGINT) AS seq_id
            FROM offs,
                 unnest(generate_series(tok_off // {_SEQ_BUDGET},
                     (tok_off + n_tok - 1) // {_SEQ_BUDGET})) AS g(s)
        ), marked AS (
            SELECT shard, seq_id,
                   greatest(tok_off - seq_id * {_SEQ_BUDGET}, 0) AS boundary,
                   least(tok_off + n_tok, (seq_id + 1) * {_SEQ_BUDGET})
                   - greatest(tok_off, seq_id * {_SEQ_BUDGET}) AS fill
            FROM spans
        )
        SELECT shard, seq_id,
               CAST(count(*) AS BIGINT) AS n_boundaries,
               CAST(sum(fill) AS BIGINT) AS n_tokens,
               md5(string_agg(CAST(boundary AS VARCHAR), ','
                              ORDER BY boundary)) AS cu_seqlens_md5
        FROM marked GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "rm_pair_extract": f"""
        WITH {_TURNS_CTE}, r AS (
            SELECT conv_id, turn_idx, role, content,
                   lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                       AS prev_role,
                   lag(content) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                       AS prev_content
            FROM turns
        )
        SELECT conv_id,
               CAST(turn_idx AS BIGINT) AS response_idx,
               md5(prev_content) AS prompt_md5,
               md5(content) AS response_md5,
               CAST(length(prev_content) AS BIGINT) AS prompt_chars,
               CAST(length(content) AS BIGINT) AS response_chars
        FROM r
        WHERE role = 'assistant' AND prev_role = 'user'
        ORDER BY conv_id, response_idx
    """,
    "dialog_turn_flatten": f"""
        WITH {_TURNS_CTE}
        SELECT conv_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_user,
               CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_assistant,
               md5(string_agg(role || ': ' || content, chr(10)
                              ORDER BY turn_idx)) AS transcript_md5
        FROM turns GROUP BY conv_id ORDER BY conv_id
    """,
    "turn_dedup_normalized": f"""
        WITH {_TURNS_CTE}, kept AS (
            SELECT conv_id,
                   lower(trim(regexp_replace(content, '\\s+', ' ', 'g')))
                       AS norm,
                   min(turn_idx) AS kept_idx,
                   count(*) AS occurrences
            FROM turns GROUP BY 1, 2
        )
        SELECT conv_id,
               CAST(sum(occurrences) AS BIGINT) AS n_turns,
               CAST(count(*) AS BIGINT) AS n_unique,
               CAST(sum(occurrences) - count(*) AS BIGINT) AS n_dropped,
               md5(string_agg(CAST(kept_idx AS VARCHAR), ','
                              ORDER BY kept_idx)) AS kept_turns_md5
        FROM kept GROUP BY conv_id ORDER BY conv_id
    """,
    "sequence_pack_chunks": f"""
        WITH toks AS (
            SELECT doc_id % {_SHARDS} AS shard, doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                        AS BIGINT) AS n_tok
            FROM documents
        ), offs AS (
            SELECT shard, doc_id, n_tok,
                   CAST(COALESCE(SUM(n_tok) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS tok_off
            FROM toks
        ), spans AS (
            SELECT shard, n_tok, tok_off, CAST(s AS BIGINT) AS seq_id
            FROM offs,
                 unnest(generate_series(tok_off // {_SEQ_BUDGET},
                     (tok_off + n_tok - 1) // {_SEQ_BUDGET})) AS g(s)
        )
        SELECT shard, seq_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(least(tok_off + n_tok,
                              (seq_id + 1) * {_SEQ_BUDGET})
                        - greatest(tok_off, seq_id * {_SEQ_BUDGET}))
                    AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN tok_off // {_SEQ_BUDGET}
                             <> (tok_off + n_tok - 1) // {_SEQ_BUDGET}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
        FROM spans GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "chat_template_render": f"""
        WITH {_TURNS_CTE}, rendered AS (
            SELECT conv_id, turn_idx, role,
                   '<|' || role || '|>' || content || '<|end|>' AS r
            FROM turns
        ), offs AS (
            SELECT conv_id, turn_idx, role, r, length(r) AS rlen,
                   COALESCE(SUM(length(r)) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS st
            FROM rendered
        ), span AS (
            SELECT *, st + length(role) + 4 AS m_start,
                   st + rlen - 7 AS m_end
            FROM offs
        )
        SELECT conv_id,
               CAST(sum(rlen) AS BIGINT) AS total_chars,
               CAST(sum(CASE WHEN role = 'assistant'
                             THEN m_end - m_start ELSE 0 END)
                    AS BIGINT) AS masked_chars,
               CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_mask_spans,
               md5(string_agg(r, '' ORDER BY turn_idx)) AS template_md5,
               md5(COALESCE(string_agg(
                   CASE WHEN role = 'assistant'
                        THEN CAST(m_start AS VARCHAR) || ':'
                             || CAST(m_end AS VARCHAR) END,
                   ',' ORDER BY turn_idx), '')) AS mask_md5
        FROM span GROUP BY conv_id ORDER BY conv_id
    """,
    "context_window_truncate": f"""
        WITH {_TURNS_CTE}, r AS (
            SELECT conv_id, turn_idx, role,
                   length(content) + length(role) + 11 AS rlen,
                   CAST(SUM(length(content) + length(role) + 11) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS revcum
            FROM turns
        )
        SELECT conv_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(sum(CASE WHEN revcum <= {_CTX_BUDGET} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(count(*)
                    - sum(CASE WHEN revcum <= {_CTX_BUDGET} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped,
               CAST(sum(CASE WHEN revcum <= {_CTX_BUDGET} THEN rlen
                             ELSE 0 END) AS BIGINT) AS chars_kept,
               CAST(min(CASE WHEN revcum <= {_CTX_BUDGET} THEN turn_idx END)
                    AS BIGINT) AS first_kept_idx,
               arg_min(role, turn_idx)
                   FILTER (WHERE revcum <= {_CTX_BUDGET}) = 'user'
                   AS starts_on_user
        FROM r GROUP BY conv_id ORDER BY conv_id
    """,
    "dialog_role_validate": f"""
        WITH {_TURNS_CTE}, f AS (
            SELECT conv_id, turn_idx, role,
                   lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                       AS prev_role,
                   row_number() OVER (PARTITION BY conv_id
                                      ORDER BY turn_idx) AS rn
            FROM turns WHERE doc_id % 11 <> 0
        ), agg AS (
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(COALESCE(sum(CASE WHEN prev_role = role
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_same_role_adjacent,
                   CAST(max(CASE WHEN rn = 1 THEN
                                 CASE WHEN role = 'assistant'
                                      THEN 1 ELSE 0 END END)
                        AS BOOLEAN) AS assistant_first
            FROM f GROUP BY conv_id
        )
        SELECT conv_id, n_turns, n_same_role_adjacent, assistant_first,
               (n_same_role_adjacent = 0 AND NOT assistant_first) AS valid
        FROM agg ORDER BY conv_id
    """,
    "dpo_pair_construct": f"""
        WITH cand AS (
            SELECT doc_id % {_PROMPTS} AS prompt_id, doc_id,
                   CAST((length(text) - length(replace(text, 'join', '')))
                        / 4 * 10 + (length(text) % 37) AS BIGINT) AS score
            FROM documents
        ), r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY prompt_id
                       ORDER BY score DESC, doc_id ASC) AS rb,
                   row_number() OVER (PARTITION BY prompt_id
                       ORDER BY score ASC, doc_id DESC) AS rw
            FROM cand
        )
        SELECT prompt_id,
               CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(max(CASE WHEN rb = 1 THEN doc_id END) AS BIGINT)
                   AS chosen_doc_id,
               CAST(max(CASE WHEN rb = 1 THEN score END) AS BIGINT)
                   AS chosen_score,
               CAST(max(CASE WHEN rw = 1 THEN doc_id END) AS BIGINT)
                   AS rejected_doc_id,
               CAST(max(CASE WHEN rw = 1 THEN score END) AS BIGINT)
                   AS rejected_score,
               CAST(max(CASE WHEN rb = 1 THEN score END)
                    - max(CASE WHEN rw = 1 THEN score END) AS BIGINT)
                   AS margin
        FROM r GROUP BY prompt_id
        HAVING count(*) >= 2
           AND max(CASE WHEN rb = 1 THEN score END)
               - max(CASE WHEN rw = 1 THEN score END) > 0
        ORDER BY prompt_id
    """,
    "rejection_sample_best_of_k": f"""
        WITH cand AS (
            SELECT doc_id % {_PROMPTS} AS prompt_id, doc_id,
                   CAST((length(text) - length(replace(text, 'join', '')))
                        / 4 * 10 + (length(text) % 37) AS BIGINT) AS score
            FROM documents
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY prompt_id
                                         ORDER BY score DESC, doc_id ASC)
                       AS rn
            FROM cand
        ), pool AS (
            SELECT prompt_id,
                   CAST(count(*) AS BIGINT) AS n_candidates,
                   CAST(sum(score) AS BIGINT) AS sum_score
            FROM cand GROUP BY 1
        )
        SELECT r.prompt_id, r.doc_id AS best_doc_id,
               r.score AS best_score, p.n_candidates, p.sum_score
        FROM ranked r JOIN pool p ON r.prompt_id = p.prompt_id
        WHERE r.rn = 1 ORDER BY r.prompt_id
    """,
}

QUERIES = {
    "prompt_decontam_ngram": prompt_decontam_ngram,
    "preference_pair_consistency": preference_pair_consistency,
    "dialog_mixture_stats": dialog_mixture_stats,
    "dialog_turn_flatten": dialog_turn_flatten,
    "turn_dedup_normalized": turn_dedup_normalized,
    "rejection_sample_best_of_k": rejection_sample_best_of_k,
    "sequence_pack_chunks": sequence_pack_chunks,
    "packed_attention_doc_mask": packed_attention_doc_mask,
    "chat_template_render": chat_template_render,
    "context_window_truncate": context_window_truncate,
    "dialog_role_validate": dialog_role_validate,
    "dpo_pair_construct": dpo_pair_construct,
    "rm_pair_extract": rm_pair_extract,
}
