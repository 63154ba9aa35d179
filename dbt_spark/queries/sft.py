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


ORACLES: dict[str, str] = {
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
    "dialog_turn_flatten": dialog_turn_flatten,
    "turn_dedup_normalized": turn_dedup_normalized,
    "rejection_sample_best_of_k": rejection_sample_best_of_k,
    "sequence_pack_chunks": sequence_pack_chunks,
    "chat_template_render": chat_template_render,
}
