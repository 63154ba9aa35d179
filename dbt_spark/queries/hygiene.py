"""Corpus-hygiene operators: PII redaction, boilerplate segment removal,
leakage-safe holdout splits, Unicode NFC canonicalization, blocklist
content filtering, snapshot drift detection (PSI), and cross-corpus
exact-substring decontamination coverage.

The pre-release scrub stage of a training-data pipeline: strip personally
identifiable information, drop boilerplate that repeats across documents
(CCNet-style line dedup, Wenzek et al. 2020), and carve train/valid/test
splits that keep every document group (here: source feed) inside one
split so near-duplicates can't leak across the eval boundary.

Relationship to queries/llmops.py: ``pii_redaction`` there is the
single-pass email scrub on truncated text; this module is the full
chained multi-kind pipeline with corpus-level byte-equality proofs.
``train_val_test_split`` there is the row-wise iid split (md5 of
doc_id); ``holdout_split_grouped`` here splits at GROUP granularity —
the anti-leakage variant (near-duplicates share a source and must share
a split).

Every query is a pure DataFrame plan (regex + aggregates, no UDFs) with
an exactly-paired DuckDB oracle. Cross-engine equality of the *redacted
text itself* is proven by md5 fingerprints folded in doc_id order —
Spark: md5(array_join(transform(array_sort(collect_list(struct(...))))));
DuckDB: md5(string_agg(... ORDER BY doc_id)) — so a single differing
byte anywhere in the corpus flips the hash.

Scale notes per query inline. Reference parity: the reference engine
ships none of these (its test corpus stops at SQL shapes); this is
training-data breadth on top of §2E, same tier as functions/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark.functions.pii import EMAIL_RE, IPV4_RE, PHONE_RE, redact_pii
from dbt_spark.session import load_tables, spread


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load_tables(spark, sf_dir, "documents")["documents"], spark)


# --------------------------------------------------------------------------
# PII injection fixture (the synthetic corpus contains no digits at all, so
# matches would be vacuously zero; inject deterministic contact lines from
# doc_id/source with the SAME expression in both engines — the operator
# under test is the redaction chain, the injection is the fixture)
# --------------------------------------------------------------------------

def _with_pii(docs: DataFrame) -> DataFrame:
    email = F.concat(
        F.lit(" reach user"), F.col("doc_id").cast("string"),
        F.lit("@"), F.col("source"), F.lit(".example.com"),
    )
    phone = F.concat(
        F.lit(" dial +1 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    ip = F.concat(
        F.lit(" from 10."), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit("."), (F.col("doc_id") % 250).cast("string"),
    )
    full = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, email).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 1, phone).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 2, ip).otherwise(F.lit("")),
    )
    return docs.withColumn("full_text", full)


_PII_SQL = """
        SELECT *,
               text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@'
                            || source || '.example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 4 = 1
                       THEN ' dial +1 555-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 2
                       THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                            || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                            || '.' || CAST(doc_id % 250 AS VARCHAR)
                       ELSE '' END AS full_text
        FROM documents
"""

# the chained count/replace pipeline in DuckDB SQL — counts taken on the
# string each pattern actually sees, mirroring functions/pii.py exactly
_REDACT_SQL = f"""
        SELECT doc_id, lang,
               len(regexp_extract_all(full_text, '{EMAIL_RE}')) AS emails,
               len(regexp_extract_all(t1, '{PHONE_RE}')) AS phones,
               len(regexp_extract_all(t2, '{IPV4_RE}')) AS ips,
               t3 AS redacted
        FROM (
            SELECT *, regexp_replace(t2, '{IPV4_RE}', '<IP>', 'g') AS t3
            FROM (
                SELECT *, regexp_replace(t1, '{PHONE_RE}', '<PHONE>', 'g') AS t2
                FROM (
                    SELECT *,
                           regexp_replace(full_text, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
                    FROM ({_PII_SQL})
                )
            )
        )
"""


def _redacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_pii(_docs(spark, sf_dir))
    cols = redact_pii(F.col("full_text"))
    return docs.select(
        "doc_id", "lang",
        cols["emails"].alias("emails"),
        cols["phones"].alias("phones"),
        cols["ips"].alias("ips"),
        cols["redacted"].alias("redacted"),
    )


def _ordered_md5(key_col: str, val_col: str):
    """md5 over per-row md5s folded in key order — one aggregate column
    whose value pins every byte of ``val_col`` across the whole group."""
    return F.md5(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(key_col).alias("k"),
                                            F.md5(F.col(val_col)).alias("h")))
                ),
                lambda s: s["h"],
            ),
            "",
        )
    )


def pii_redact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language PII scrub report: match counts by kind, documents
    touched, and an order-folded md5 of every redacted byte.

    Scale: redaction is row-local codegen on the scan stage; the only
    shuffle is the final groupBy(lang) (5 groups, map-side partials).
    The fingerprint keeps per-group state at one 32-char hash per doc —
    at 100 TB you'd swap the ordered fold for xxhash64-XOR (order-free,
    constant state); the ordered form is chosen here because DuckDB can
    replicate it exactly."""
    r = _redacted(spark, sf_dir)
    return (
        r.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("emails").cast("bigint").alias("emails"),
            F.sum("phones").cast("bigint").alias("phones"),
            F.sum("ips").cast("bigint").alias("ips"),
            F.sum(
                ((F.col("emails") + F.col("phones") + F.col("ips")) > 0)
                .cast("int")
            ).cast("bigint").alias("docs_touched"),
            _ordered_md5("doc_id", "redacted").alias("redacted_md5"),
        )
        .orderBy("lang")
    )


def pii_doc_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by PII density with per-doc redaction proof
    (count triple + md5 + post-redaction length). TakeOrderedAndProject —
    no full sort materializes."""
    r = _redacted(spark, sf_dir)
    return (
        r.select(
            "doc_id", "lang", "emails", "phones", "ips",
            (F.col("emails") + F.col("phones") + F.col("ips")).alias("pii_total"),
            F.length("redacted").cast("bigint").alias("redacted_len"),
            F.md5("redacted").alias("redacted_md5"),
        )
        .orderBy(F.col("pii_total").desc(), F.col("doc_id").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# Boilerplate segment removal (CCNet-style line dedup)
# --------------------------------------------------------------------------

def boilerplate_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove word-segments that repeat across >=5% of documents (CCNet
    line-level dedup, Wenzek et al. 2020 — the corpus has no newlines, so
    the "line" unit is a fixed 2-word segment; the operator shape is
    identical for any segmenter). Emits per-language removal stats plus
    an order-folded md5 of the cleaned corpus.

    Scale: segmenting is shuffle-free array math on the scan (split +
    slice). Document frequency shuffles ONLY 8-byte xxhash64 keys with
    map-side partial distinct — segment strings never travel. The
    boilerplate set is metadata-sized BY CONSTRUCTION — at threshold
    share t, |boiler| ≤ segments_per_doc/t regardless of corpus row
    count (20·avg_segs_per_doc here) — so it collects to the driver like
    an ANN codebook and broadcasts back as a sorted array literal the
    removal probes with a codegen'd array membership test. Removal and
    text rebuild are then entirely row-local: no flags explode, no
    reassembly shuffle. Total: one hash-key shuffle + the final
    groupBy(lang). (First version shuffled segment strings twice —
    explode→DF-count→join→group-back — and probed 9.4× at ×10 data; this
    shape probes ~2×.) 64-bit hash membership: a collision removing a
    non-boilerplate segment needs |segments|·|boiler| ≈ 2^64 pairs."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    nseg = F.ceil(F.size(toks) / F.lit(2)).cast("int")
    segs_arr = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(F.slice(toks, i * 2 + 1, 2), " "),
    )
    base = docs.select("doc_id", "lang", segs_arr.alias("segs"))
    total = docs.agg(F.count(F.lit(1)).alias("n_total"))
    boiler_rows = (
        base.select(
            "doc_id",
            F.explode(
                F.transform(F.col("segs"), lambda s: F.xxhash64(s))
            ).alias("h"),
        )
        .groupBy("h")
        .agg(F.countDistinct("doc_id").alias("df_docs"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("df_docs") * 20 >= F.col("n_total"))
        .select("h")
        .collect()  # bounded: ≤ segs_per_doc / threshold_share values
    )
    boiler = sorted(r["h"] for r in boiler_rows)
    boiler_lit = (
        F.lit(boiler) if boiler else F.array().cast("array<bigint>")
    )
    is_clean = lambda s: ~F.array_contains(boiler_lit, F.xxhash64(s))  # noqa: E731
    cleaned = base.select(
        "doc_id", "lang",
        F.size("segs").alias("segments_total"),
        (F.size("segs") - F.size(F.filter("segs", is_clean)))
        .alias("segments_removed"),
        F.array_join(F.filter("segs", is_clean), " ").alias("cleaned"),
    )
    return (
        cleaned.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("segments_total").cast("bigint").alias("segments_total"),
            F.sum("segments_removed").cast("bigint").alias("segments_removed"),
            _ordered_md5("doc_id", "cleaned").alias("cleaned_md5"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Unicode NFC normalization (Arrow mapInPandas vs DuckDB nfc_normalize)
# --------------------------------------------------------------------------

#: injection fixture (the corpus is pure ASCII, an NFC fixed point):
#: decomposed combining sequences that NFC composes …
_DECOMPOSED = " cafe\u0301 nai\u0308ve"
#: … and NFC fixed points that must survive untouched (ligature ﬁ and a
#: fullwidth letter are only folded by NFKC, never NFC; é is composed)
_NFC_STABLE = " ﬁne ｗide é"


def unicode_nfc_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize corpus text to NFC and report per-language what
    changed: docs touched, chars before/after (composition shrinks
    combining pairs), and an order-folded md5 of every normalized byte.

    The normalizer is functions/unicode_norm.py::normalize_nfc — Arrow
    mapInPandas over Python unicodedata, shuffle-free on the scan stage;
    the DuckDB oracle runs its native nfc_normalize over the identically
    augmented text, so the pairing proves the two independent Unicode
    implementations agree byte-for-byte AND that NFC fixed points
    (ligatures, fullwidth forms — NFKC-only foldings) pass through."""
    from dbt_spark.functions.unicode_norm import normalize_nfc

    docs = _docs(spark, sf_dir)
    raw = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(_DECOMPOSED)).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 1, F.lit(_NFC_STABLE)).otherwise(F.lit("")),
    )
    aug = docs.select("doc_id", "lang", raw.alias("raw"))
    norm = normalize_nfc(aug, "raw", "norm")
    return (
        norm.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("norm") != F.col("raw")).cast("int"))
            .cast("bigint").alias("docs_changed"),
            F.sum(F.length("raw")).cast("bigint").alias("chars_before"),
            F.sum(F.length("norm")).cast("bigint").alias("chars_after"),
            _ordered_md5("doc_id", "norm").alias("norm_md5"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Leakage-safe grouped holdout split
# --------------------------------------------------------------------------

def holdout_split_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split keyed on
    md5(source) — every document group lands wholly in one split, so
    near-duplicates sharing a source can never straddle the eval
    boundary (the leakage failure mode of row-wise random splits).

    Bucket = (ascii(h1)*16 + ascii(h2)) % 10 over the first two md5 hex
    chars: engine-portable (no engine-specific hash()), uniform enough
    over real group keys, and a pure scan-stage expression. One groupBy
    shuffle on (split); at 100 TB the split column is written back as a
    partition key so downstream reads prune."""
    docs = _docs(spark, sf_dir)
    h = F.md5(F.col("source"))
    bucket = (
        F.ascii(F.substring(h, 1, 1)) * 16 + F.ascii(F.substring(h, 2, 1))
    ) % 10
    split = (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket == 8, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "source", "n_chars", "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("source").alias("first_source"),
            F.max("source").alias("last_source"),
        )
        .orderBy("split")
    )


#: content blocklist — multi-phrase matcher compiled to ONE alternation
#: regex (the regexp-engine analog of Aho-Corasick multi-pattern search);
#: phrases chosen to actually occur in the synthetic corpus
_BLOCK_PHRASES = ["batch batch", "window window", "merge merge"]
_BLOCK_RE = r"\b(?:" + "|".join(_BLOCK_PHRASES) + r")\b"


def blocklist_phrase_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content filtering against a phrase blocklist (the NSFW/bad-words
    gate every production corpus runs): all phrases compile into ONE
    alternation regex evaluated once per document — a single scan-stage
    codegen pass regardless of blocklist size (the regexp-automaton
    analog of Aho-Corasick), never one pass per phrase. Emits per-lang
    kept/flagged counts, total hits, and an md5 fold of the SURVIVING
    corpus proving both engines dropped exactly the same documents.

    At 100 TB with ~10⁵-phrase blocklists the same shape holds: the
    automaton compiles once per task, the corpus is read once."""
    docs = _docs(spark, sf_dir)
    hits = F.regexp_count(F.col("text"), F.lit(_BLOCK_RE))
    scored = docs.select(
        "doc_id", "lang", "text", hits.alias("hits"),
        (hits > 0).alias("flagged"),
    )
    kept = scored.filter(~F.col("flagged"))
    per_lang = scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_total"),
        F.sum(F.col("flagged").cast("int")).cast("bigint")
        .alias("docs_flagged"),
        F.sum("hits").cast("bigint").alias("total_hits"),
    )
    kept_md5 = kept.groupBy("lang").agg(
        _ordered_md5("doc_id", "text").alias("kept_md5"))
    return per_lang.join(kept_md5, "lang", "left").select(
        "lang", "docs_total", "docs_flagged", "total_hits",
        F.coalesce("kept_md5", F.lit("")).alias("kept_md5"),
    ).orderBy("lang")


def corpus_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two corpus snapshots (even vs
    odd doc_ids as the A/B fixture — in production: yesterday's crawl vs
    today's) over document-length buckets, per language. PSI =
    Σ (pₐ−p_b)·ln(pₐ/p_b) with +1-smoothed bucket counts; the standard
    drift alarm (<0.1 stable, >0.25 shifted).

    All bucket counts are exact integers from one groupBy; shares and
    the ln() ride a single double expression per bucket and the
    9-bucket sum is rounded to 6 (the documented 1-ulp ln contract).
    One shuffle on (lang, bucket); the bucket table is metadata-sized."""
    docs = _docs(spark, sf_dir)
    # floor() explicitly: CAST(double AS INT) truncates in Spark but
    # ROUNDS in DuckDB (documented dialect trap) — floor is exact in both
    bucket = F.least(F.floor(F.col("n_chars") / F.lit(100.0)),
                     F.lit(8)).cast("int")
    side = F.when(F.col("doc_id") % 2 == 0, F.lit("a")).otherwise(F.lit("b"))
    counts = (
        docs.select("lang", bucket.alias("bucket"), side.alias("side"))
        .groupBy("lang", "bucket", "side")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("lang", "bucket")
        .agg(
            F.sum(F.when(F.col("side") == "a", F.col("n")).otherwise(0))
            .alias("na"),
            F.sum(F.when(F.col("side") == "b", F.col("n")).otherwise(0))
            .alias("nb"),
        )
    )
    tot = counts.groupBy("lang").agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb"),
        F.count(F.lit(1)).alias("nbuckets"),
    )
    j = counts.join(tot, "lang")
    pa = (F.col("na") + 1).cast("double") / (F.col("ta") + F.col("nbuckets")).cast("double")
    pb = (F.col("nb") + 1).cast("double") / (F.col("tb") + F.col("nbuckets")).cast("double")
    term = (pa - pb) * F.log(pa / pb)
    return (
        j.select("lang", term.alias("term"), "ta", "tb")
        .groupBy("lang")
        .agg(
            F.max("ta").cast("bigint").alias("docs_a"),
            F.max("tb").cast("bigint").alias("docs_b"),
            F.round(F.sum("term"), 6).alias("psi_r6"),
        )
        .orderBy("lang")
    )


#: exact-substring decontamination window width (chars); 20 yields real
#: cross-corpus overlap on the synthetic corpus (124 matched windows /
#: 50 contaminated docs at sf0.01) while keeping the Lee-2021 shape —
#: production corpora use ~50 tokens; the operator is width-agnostic
_COVER_W = 20


def decontam_exact_substring_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus EXACT-SUBSTRING contamination coverage (the GPT-3 /
    Lee 2021 decontamination standard at substring granularity): how many
    characters of each train document are covered by some >=W-char span
    that also appears in the benchmark set (eval fixture: doc_id % 97 == 0).

    Key identity making this a JOIN and not a suffix problem: a shared
    span of length L >= W contains a shared W-gram at EVERY offset, so
    positional coverage by >=W shared spans == positional coverage by
    matched W-grams. The benchmark side is always tiny (eval suites), so
    its distinct window hashes broadcast; train windows stream through
    one equi-join on xxhash64(window) — 8-byte keys, never the strings —
    and coverage is the interval union of matched spans (gaps-and-islands
    merge, O(matches) rows — not a per-char explode).
    Per-lang report: train docs, contaminated docs, covered/total chars,
    round-6 pct. 64-bit hash joins: a false match needs ~2^64 pairs
    (same contract as the boilerplate filter); the DuckDB oracle joins on
    the raw substrings, so any collision would surface as a mismatch."""
    docs = _docs(spark, sf_dir)
    w = _COVER_W
    is_eval = F.col("doc_id") % 97 == 0
    long_enough = F.length("text") >= w
    ev_hashes = (
        docs.filter(is_eval & long_enough)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.length("text") - (w - 1))).alias("p"),
            F.col("text"),
        )
        .select(F.xxhash64(F.expr(f"substring(text, p, {w})")).alias("h"))
        .distinct()
    )
    train = docs.filter(~is_eval)
    tr_windows = (
        train.filter(long_enough)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("text") - (w - 1))).alias("p"),
            F.col("text"),
        )
        .select(
            "doc_id", "p",
            F.xxhash64(F.expr(f"substring(text, p, {w})")).alias("h"),
        )
    )
    matched = tr_windows.join(F.broadcast(ev_hashes), "h").select("doc_id", "p")
    # Coverage = union length of the matched [p, p+W-1] spans — a
    # gaps-and-islands interval merge (VERDICT r11 #4): spans sorted by p
    # within each doc merge while p <= prev_p + W (overlap or adjacency);
    # each island contributes max_p - min_p + W chars. O(matches) rows
    # through ONE doc-keyed window — the old per-char explode+distinct
    # shuffled W× the matched volume, dominant on a contaminated shard.
    # (matched is unique on (doc_id, p): tr_windows has one row per
    # position and ev_hashes is distinct on h.)
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy("p")
    new_island = F.when(F.col("p") > F.lag("p").over(win) + w, 1).otherwise(0)
    island_id = F.sum(new_island).over(
        win.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    covered = (
        matched.withColumn("island", island_id)
        .groupBy("doc_id", "island")
        .agg((F.max("p") - F.min("p") + w).alias("ilen"))
        .groupBy("doc_id")
        .agg(F.sum("ilen").alias("covered"))
    )
    per_doc = train.join(covered, "doc_id", "left").select(
        "lang",
        F.coalesce("covered", F.lit(0)).alias("covered"),
        F.length("text").alias("len"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("train_docs"),
            F.sum((F.col("covered") > 0).cast("int")).cast("bigint")
            .alias("docs_contaminated"),
            F.sum("covered").cast("bigint").alias("chars_covered"),
            F.sum("len").cast("bigint").alias("chars_total"),
            F.round(
                F.sum("covered").cast("double")
                / F.sum("len").cast("double"), 6,
            ).alias("contamination_pct_r6"),
        )
        .orderBy("lang")
    )


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-level diff between two corpus snapshots (the ops
    complement to corpus_psi_drift's distribution view): per-language
    added / removed / changed / unchanged document counts plus changed
    bytes, from one full outer join on doc_id comparing md5(text).
    Snapshot fixture: v1 drops doc_id % 101 == 0 (late arrivals), v2
    rewrites text for doc_id % 89 == 0 (re-crawled docs) — both sides
    derived with the SAME expressions in both engines.

    Scale: one co-partitioned full outer join on the id + md5 compare —
    content equality via 16-byte digests, never text transfer; at 100 TB
    both sides are id-bucketed so the join is shuffle-free."""
    docs = _docs(spark, sf_dir)
    v1 = docs.filter(F.col("doc_id") % 101 != 0).select(
        "doc_id", "lang", F.md5("text").alias("h1"),
        F.length("text").alias("len1"))
    v2_text = (
        F.when(F.col("doc_id") % 89 == 0,
               F.concat(F.lit("recrawled "), F.col("text")))
        .otherwise(F.col("text"))
    )
    v2 = docs.select(
        "doc_id", "lang",
        F.md5(v2_text).alias("h2"),
        F.length(v2_text).alias("len2"),
    )
    j = v1.join(v2, ["doc_id", "lang"], "full_outer")
    status = (
        F.when(F.col("h1").isNull(), F.lit("added"))
        .when(F.col("h2").isNull(), F.lit("removed"))
        .when(F.col("h1") != F.col("h2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select("lang", status.alias("status"),
                 F.coalesce("len2", "len1").alias("nbytes"))
        .groupBy("lang", "status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nbytes").cast("bigint").alias("nbytes"),
        )
        .orderBy("lang", "status")
    )


#: k-anonymity threshold for quasi-identifier release
_K_ANON = 5


def k_anonymity_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity suppression over quasi-identifiers before a stats
    release (Sweeney 2002): cells of the (lang, length-decile)
    contingency table with fewer than k members are SUPPRESSED — their
    identifying attribute generalized to '*' and their counts pooled
    into one residual row per lang — and a pooled residual that STILL
    has n < k (e.g. a lang with one suppressed cell of size 1) is
    dropped entirely (ADVICE r11), so no released row isolates fewer
    than k documents. The privacy gate that runs before any per-slice
    corpus stats leave the enclave.

    Plan: one exact groupBy on the quasi-identifier triple (map-side
    partials), a conditional re-aggregate for the suppressed pool —
    two keyed shuffles, no row-level data movement beyond the first
    aggregate; at 100 TB the released table is dimension-sized. The
    decile comes from integer bucketing (n_chars/100 capped), not a
    quantile sketch, so both engines agree bit-for-bit."""
    docs = _docs(spark, sf_dir)
    bucket = F.least((F.col("n_chars") / 100).cast("bigint"), F.lit(9))
    cells = (
        docs.select("lang", bucket.alias("len_decile"))
        .groupBy("lang", "len_decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    released = cells.filter(F.col("n") >= _K_ANON).select(
        "lang", F.col("len_decile").cast("string").alias("len_decile"),
        "n", F.lit(False).alias("suppressed"),
    )
    pooled = (
        cells.filter(F.col("n") < _K_ANON)
        .groupBy("lang")
        .agg(F.sum("n").cast("bigint").alias("n"))
        .filter(F.col("n") >= _K_ANON)  # residual itself must satisfy k
        .select("lang", F.lit("*").alias("len_decile"), "n",
                F.lit(True).alias("suppressed"))
    )
    return (
        released.unionByName(pooled)
        .orderBy("lang", "len_decile")
    )


#: funnel stage names, in gate order (index 1-based in the report)
_FUNNEL_STAGES = [
    "token_count", "mean_token_len", "stopwords", "symbol_ratio",
    "exact_dedup", "decontam",
]


def filter_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate FUNNEL: the per-stage survival report a curation team
    reads before shipping a corpus — every document walks the standard
    cascade (C4/Gopher token-count → mean-token-length → stopword →
    symbol-ratio bounds, then exact-dedup survivorship, then the eval
    decontamination anti-join) and the report counts, per (lang, stage),
    how many docs entered, survived, and dropped. Sequential semantics:
    a doc reaches stage i only if it passed stages 1..i-1 — the funnel
    shape (same gates as quality_filter_c4 / dedup_exact /
    decontamination_anti_join, composed).

    Plan (100 TB): per-doc gate flags are one codegen'd scan (higher-
    order aggregates over the token array, no explode); the dedup gate
    is the only keyed shuffle (min doc_id per md5(text) — 16-byte keys);
    docs then reduce to (lang, pass-depth) counts (dimension-sized), and
    the 6-stage expansion is a broadcast join against a 6-row literal.
    Nothing after the first aggregate touches row-level data."""
    from dbt_spark.functions import text as X
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    d = docs.select(
        "doc_id", "lang",
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint")
        .alias("n_tokens"),
        F.expr("aggregate(split(trim(text), '\\\\s+'), 0L, "
               "(a, t) -> a + length(t))").cast("bigint")
        .alias("token_chars"),
        F.length("text").cast("bigint").alias("n_chars"),
        (F.length("text")
         - F.length(F.translate("text", ".,!?;:#{}[]|", "")))
        .cast("bigint").alias("n_symbols"),
        X.count_matches("text", X.STOPWORDS).alias("stop_hits"),
        F.md5("text").alias("h"),
    )
    w = Window.partitionBy("h")
    d = d.withColumn("is_first", F.col("doc_id") == F.min("doc_id").over(w))
    mean_len = (F.col("token_chars").cast("double")
                / F.col("n_tokens").cast("double"))
    sym_ratio = (F.col("n_symbols").cast("double")
                 / F.col("n_chars").cast("double"))
    g = [
        (F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 100000),
        (mean_len >= 3.0) & (mean_len <= 10.0),
        F.col("stop_hits") >= 2,
        sym_ratio <= 0.1,
        F.col("is_first"),
        F.col("doc_id") % 97 != 0,
    ]
    # pass-depth: # of consecutive leading gates passed (cumulative ANDs
    # are null-proof: false AND null = false, and gate 1 is never null)
    cum = g[0]
    depth = cum.cast("int")
    for gi in g[1:]:
        cum = cum & gi
        depth = depth + cum.cast("int")
    counts = (
        d.select("lang", depth.alias("depth"))
        .groupBy("lang", "depth")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    stages = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(_FUNNEL_STAGES)],
        "stage_idx INT, stage STRING",
    )
    return (
        counts.crossJoin(F.broadcast(stages))  # 6-row literal, broadcast
        .groupBy("lang", "stage_idx", "stage")
        .agg(
            F.sum(F.when(F.col("depth") >= F.col("stage_idx") - 1,
                         F.col("cnt")).otherwise(0))
            .cast("bigint").alias("n_in"),
            F.sum(F.when(F.col("depth") >= F.col("stage_idx"),
                         F.col("cnt")).otherwise(0))
            .cast("bigint").alias("n_out"),
        )
        .select(
            "lang", F.col("stage_idx").cast("bigint").alias("stage_idx"),
            "stage", "n_in", "n_out",
            (F.col("n_in") - F.col("n_out")).cast("bigint")
            .alias("n_dropped"),
            F.round(
                F.when(F.col("n_in") > 0,
                       (F.col("n_in") - F.col("n_out")).cast("double")
                       / F.col("n_in").cast("double")).otherwise(0.0),
                6).alias("drop_share"),
        )
        .orderBy("lang", "stage_idx")
    )


#: z for 95% two-sided Wilson interval
_WILSON_Z = 1.96


def filter_rate_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-gate pass rates with Wilson score intervals
    (Wilson 1927, public) — the monitoring table that distinguishes a
    REAL filter-rate shift from small-sample noise before anyone pages
    on a 2-point drop in a 50-doc source. Pass = the C4 token-count gate
    (20 ≤ tokens ≤ 100k), the cheapest always-on gate.

    Determinism: counts are exact bigints; the interval is one closed-
    form expression over them (+ − × ÷ sqrt — all IEEE correctly
    rounded), rounded to 6. One scan + one source-keyed aggregate,
    dimension-sized output."""
    docs = _docs(spark, sf_dir)
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    passed = ((n_tokens >= 20) & (n_tokens <= 100000)).cast("int")
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(passed).cast("bigint").alias("n_pass"),
    )
    z = _WILSON_Z
    n = F.col("n").cast("double")
    p = F.col("n_pass").cast("double") / n
    z2 = z * z
    denom = 1.0 + z2 / n
    # association mirrors the oracle exactly: (center_num ± half_num)/denom
    center_num = p + z2 / (2.0 * n)
    half_num = z * F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    return (
        agg.select(
            "source", "n", "n_pass",
            F.round(p, 6).alias("rate_r6"),
            F.round((center_num - half_num) / denom, 6)
            .alias("wilson_lo_r6"),
            F.round((center_num + half_num) / denom, 6)
            .alias("wilson_hi_r6"),
        )
        .orderBy("source")
    )


#: DP release budget (Laplace scale = sensitivity/epsilon = 1/epsilon)
_DP_EPSILON = 1.0
#: largest float64 strictly below 0.5 — the |u| clamp that keeps the
#: Laplace inverse-CDF ln() argument positive for every 60-bit hash
_DP_U_MAX = 0.49999999999999994


def dp_laplace_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private contingency release (Dwork 2006, public):
    the SAME (lang, length-decile) table k_anonymity_release suppresses
    is instead released in full with Laplace(1/ε) noise on every count —
    the other standard privacy gate (noise, not suppression; sensitivity
    of a disjoint count histogram is 1). Noise is a DETERMINISTIC
    portable draw — u = md5-60-bit(cell key)/2⁶⁰ − ½, noise =
    −(1/ε)·sign(u)·ln(1−2|u|) — so both engines produce the identical
    release and the pairing checks the mechanism end-to-end; a
    production run swaps the keyed hash for a seeded RNG.

    Plan: one keyed aggregate (map-side partials) + row-local noise
    math; output is dimension-sized. ln() is the one transcendental —
    1-ulp engine divergence — so the noisy count rounds to 4 decimals
    (boundary probability ~1e-12 per cell)."""
    docs = _docs(spark, sf_dir)
    bucket = F.least((F.col("n_chars") / 100).cast("bigint"), F.lit(9))
    cells = (
        docs.select("lang", bucket.alias("len_decile"))
        .groupBy("lang", "len_decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", "lang", F.col("len_decile").cast("string"))),
            1, 15),
        16, 10,
    ).cast("bigint")
    # Clamp |u| strictly inside (-0.5, 0.5): h = 0 would make u exactly
    # -0.5 and ln(1-2|u|) = -inf (ADVICE r12 — probability ~2^-60 per
    # cell, but deterministic once a colliding cell key exists). The
    # bound is the largest double < 0.5; an additive 2^-60 shift would
    # round away under float64 (ulp(0.5) = 2^-53). Both engines parse
    # the literal to the identical double, so the pairing is exact.
    u0 = h.cast("double") / float(1 << 60) - 0.5
    u = F.signum(u0) * F.least(F.abs(u0), F.lit(_DP_U_MAX))
    noise = (
        -(1.0 / _DP_EPSILON) * F.signum(u)
        * F.log(1.0 - 2.0 * F.abs(u))
    )
    return (
        cells.select(
            "lang",
            F.col("len_decile").cast("string").alias("len_decile"),
            F.round(F.col("n") + noise, 4).alias("noisy_n_r4"),
            F.lit(float(_DP_EPSILON)).alias("epsilon"),
        )
        .orderBy("lang", "len_decile")
    )


#: canary inventory: 8 planted (doc_id % 41 == 3·i) + 2 never planted,
#: giving both 'leaked' and 'clean' verdicts on any corpus with ≥42 docs
_N_CANARY_PLANTED = 8
_N_CANARY = 10
_CANARY_MOD = 41


def canary_extraction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization-canary audit (Carlini et al. 2019 'secret sharer',
    public): unique canary strings are planted into the corpus and an
    exact-substring detector accounts for every copy — the
    pre/post-training control surface for extraction tests (before
    training you verify the planted inventory SURVIVED dedup/filtering
    intact; after training you probe the model for them). Canary i =
    'canary-' + md5('c<i>')[:8], planted into docs with doc_id %
    41 == 3·i (mirrored in the oracle); canaries 8-9 are never planted,
    so the audit demonstrates both 'leaked' and 'clean' verdicts.

    Determinism: all-integer accounting (counts, sources, min/max doc).

    Scale: the canary inventory is dimension-sized and broadcast; the
    scan applies contains() row-locally (codegen, no shuffle before the
    canary-keyed rollup) — the blocklist-scan shape. A production sweep
    with thousands of canaries swaps contains() for the Aho-Corasick /
    gram-hash routing of the decontam family."""
    docs = _docs(spark, sf_dir)
    import hashlib as _hl

    canaries = [
        (i, "canary-" + _hl.md5(f"c{i}".encode()).hexdigest()[:8],
         (3 * i) if i < _N_CANARY_PLANTED else None)
        for i in range(_N_CANARY)
    ]
    planted = docs.withColumn(
        "text2",
        F.concat(
            F.col("text"),
            *[
                F.when(
                    F.col("doc_id") % _CANARY_MOD == resid,
                    F.lit(" " + c)).otherwise(F.lit(""))
                for _, c, resid in canaries if resid is not None
            ],
        ),
    )
    dim = spark.createDataFrame(
        [(i, c) for i, c, _ in canaries], "canary_id int, canary string")
    matched = (
        planted.crossJoin(F.broadcast(dim))
        .filter(F.col("text2").contains(F.col("canary")))
        .select("canary_id", "canary", "doc_id", "source")
    )
    # countDistinct never shares a groupBy with other aggregates here
    # (the Expand-plan shuffle blowup — round-4b discipline): counts and
    # distinct-source cardinality aggregate separately and join on the
    # canary key
    counts = matched.groupBy("canary_id", "canary").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_containing"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
    srcs = (
        matched.select("canary_id", "canary", "source").distinct()
        .groupBy("canary_id", "canary")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sources"))
    )
    hits = counts.join(srcs, ["canary_id", "canary"])
    return (
        dim.join(hits, ["canary_id", "canary"], "left")
        .na.fill({"n_docs_containing": 0, "n_sources": 0})
        .select(
            "canary_id", "canary", "n_docs_containing", "n_sources",
            "first_doc", "last_doc",
            (F.col("n_docs_containing") > 0).cast("int").alias("leaked"),
        )
        .orderBy("canary_id")
    )


def filter_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise agreement matrix between quality gates (confusion counts,
    raw agreement, Cohen's kappa — Cohen 1960, public): the meta-analysis
    a pipeline owner runs before stacking filters, because two gates with
    kappa near 1 are redundant (pay one compute pass, not two) while
    kappa near 0 means they prune DIFFERENT failure modes and both earn
    their place in the funnel. Gates: the C4 token-count band (the
    filter_rate_wilson_ci gate), the unigram-entropy gate
    (doc_entropy_quality's), and a mean-word-length boilerplate gate.

    Determinism: every verdict is integer-exact (the entropy gate
    compares the r6-pinned entropy exactly as doc_entropy_quality does;
    word-length uses 12·tokens ≥ letters cross-multiplication); kappa is
    one closed-form rational over bigint counts, rounded to 6.

    Scale: ONE corpus pass for the row-local gates + one doc-keyed
    explode/aggregate for entropy (the token_count shape); the agreement
    rollup is a single aggregate to a 3-row output."""
    docs = _docs(spark, sf_dir)
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    letters = F.length(F.regexp_replace("text", r"\s+", ""))
    base = docs.select(
        "doc_id",
        ((n_tokens >= 20) & (n_tokens <= 100000)).cast("int").alias("g_c4"),
        # mean word length ≤ 12 ⇔ letters ≤ 12·tokens (exact integers)
        (letters <= 12 * n_tokens).cast("int").alias("g_wordlen"),
    )
    from dbt_spark.queries.curation import doc_entropy_quality

    ent = doc_entropy_quality(spark, sf_dir).select(
        "doc_id", (1 - F.col("low_quality")).alias("g_entropy"))
    flags = base.join(ent, "doc_id", "left").na.fill({"g_entropy": 0})
    pairs = [("g_c4", "g_entropy"), ("g_c4", "g_wordlen"),
             ("g_entropy", "g_wordlen")]
    out = None
    for a, b in pairs:
        fa, fb = F.col(a), F.col(b)
        agg = flags.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((fa * fb)).cast("bigint").alias("n11"),
            F.sum((fa * (1 - fb))).cast("bigint").alias("n10"),
            F.sum(((1 - fa) * fb)).cast("bigint").alias("n01"),
            F.sum(((1 - fa) * (1 - fb))).cast("bigint").alias("n00"),
        ).select(
            F.lit(a).alias("gate_a"), F.lit(b).alias("gate_b"),
            "n", "n11", "n10", "n01", "n00",
        )
        out = agg if out is None else out.unionByName(agg)
    n = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / n
    pe = (
        ((F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
         + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00")))
        .cast("double") / (n * n)
    )
    return (
        out.select(
            "gate_a", "gate_b", "n11", "n10", "n01", "n00",
            F.round(po, 6).alias("agreement_r6"),
            # degenerate chance-agreement pe=1 (both gates constant):
            # kappa is defined as 1 — perfect agreement with no room for
            # chance correction
            F.round(
                F.when(pe == 1.0, F.lit(1.0))
                .otherwise((po - pe) / (1.0 - pe)), 6).alias("kappa_r6"),
        )
        .orderBy("gate_a", "gate_b")
    )


#: DP top-k release size
_DP_TOPK = 10


def dp_exponential_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private TOP-K release via the exponential mechanism
    (McSherry-Talwar 2007, public), implemented with the Gumbel-max trick
    (argmax of score·ε/2Δ + Gumbel noise samples the exponential
    mechanism exactly — public equivalence): the top-10 corpus tokens by
    frequency are released through PRIVATE SELECTION rather than additive
    noise — the other standard DP release class next to
    dp_laplace_release (Laplace = noisy values for every cell; this =
    noisy choice of WHICH cells to reveal, the right tool when the
    domain, not the counts, is the sensitive surface).

    Noise is a DETERMINISTIC portable draw so both engines release the
    identical set: u = (h + 0.5)/2⁶⁰ ∈ (0,1) strictly (never hits either
    endpoint for any 60-bit hash h — no clamp needed, unlike the Laplace
    twin), g = −ln(−ln(u)), noisy = count·ε/2 + g pinned to 6 decimals
    BEFORE ranking, so the double-transcendental 1-ulp divergence cannot
    flip the cross-engine ordering. A production run swaps the keyed
    hash for a seeded RNG.

    Scale: one explode + token-keyed count with map-side partials;
    selection is TakeOrdered over vocab-sized rows (never a global
    window); output is k rows."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    ).filter(F.length("tok") > 0)
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("double")
    u = (h + 0.5) / float(1 << 60)
    g = -F.log(-F.log(u))
    noisy = F.round(
        F.col("n").cast("double") * (float(_DP_EPSILON) / 2.0) + g, 6)
    return (
        cnt.select(
            "tok",
            noisy.alias("noisy_score_r6"),
            F.lit(float(_DP_EPSILON)).alias("epsilon"),
        )
        .orderBy(F.desc("noisy_score_r6"), "tok")
        .limit(_DP_TOPK)
    )


def source_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair n-gram overlap matrix: distinct word-5-gram Jaccard
    between every pair of ingest sources — the corpus-level similarity
    report that tells a mixture designer which sources are near-copies
    (mirrors, re-crawls) BEFORE they are weighted as if independent.
    The source-granular complement of doc-level dedup_ngram_jaccard.

    Plan (100 TB): grams reduce to DISTINCT (xxhash64(gram), source)
    map-side — 8-byte keys + a source id, strings never shuffle; the
    self-join fans out ≤ #sources rows per gram key (bounded by the
    SOURCE count, not the corpus — no df cap needed, unlike the doc-pair
    variant); output is C(#sources, 2)-sized. The DuckDB oracle joins
    raw gram strings, so a 64-bit collision would surface as a value
    mismatch."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    grams = (
        docs.select("source", toks.alias("t"))
        .filter(F.size("t") >= 5)
        .select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - 5),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at("t", i + k) for k in range(1, 6)]
                    ),
                )
            ).alias("g"),
        )
        .select("source", F.xxhash64("g").alias("h"))
        .distinct()
    )
    sizes = grams.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    a = grams.alias("a")
    b = grams.alias("b")
    pairs = (
        a.join(b, (F.col("a.h") == F.col("b.h"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"),
                 F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"),
                      F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"),
                      F.col("n").alias("nb"))
    return (
        pairs.join(sa, "source_a").join(sb, "source_b")
        .select(
            "source_a", "source_b", "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common"))
                .cast("double"), 6).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


_STOP_ARR_SQL = None  # built lazily below to avoid import-order cycles


def _stop_arr() -> str:
    from dbt_spark.functions import text as X

    return "['" + "', '".join(X.STOPWORDS) + "']"


def _funnel_oracle() -> str:
    stages_values = ", ".join(
        f"({i + 1}, '{s}')" for i, s in enumerate(_FUNNEL_STAGES))
    return f"""
        WITH d AS (
            SELECT doc_id, lang,
                   CAST(len(string_split_regex(trim(text), '\\s+'))
                        AS BIGINT) AS n_tokens,
                   CAST(list_sum(list_transform(
                            string_split_regex(trim(text), '\\s+'),
                            t -> length(t))) AS BIGINT) AS token_chars,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(text) -
                        length(translate(text, '.,!?;:#{{}}[]|', ''))
                        AS BIGINT) AS n_symbols,
                   CAST(len(list_filter(
                            string_split_regex(trim(lower(text)), '\\s+'),
                            t -> list_contains({_stop_arr()}, t)))
                        AS BIGINT) AS stop_hits,
                   md5(text) AS h
            FROM documents
        ), dd AS (
            SELECT *, doc_id = min(doc_id) OVER (PARTITION BY h) AS g5
            FROM d
        ), flags AS (
            SELECT lang,
                   (n_tokens BETWEEN 20 AND 100000) AS g1,
                   (CAST(token_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                        BETWEEN 3.0 AND 10.0) AS g2,
                   (stop_hits >= 2) AS g3,
                   (CAST(n_symbols AS DOUBLE) / CAST(n_chars AS DOUBLE)
                        <= 0.1) AS g4,
                   g5,
                   (doc_id % 97 <> 0) AS g6
            FROM dd
        ), dpt AS (
            SELECT lang,
                   CAST(g1 AS INT) + CAST(g1 AND g2 AS INT)
                   + CAST(g1 AND g2 AND g3 AS INT)
                   + CAST(g1 AND g2 AND g3 AND g4 AS INT)
                   + CAST(g1 AND g2 AND g3 AND g4 AND g5 AS INT)
                   + CAST(g1 AND g2 AND g3 AND g4 AND g5 AND g6 AS INT)
                       AS depth
            FROM flags
        ), counts AS (
            SELECT lang, depth, CAST(count(*) AS BIGINT) AS cnt
            FROM dpt GROUP BY 1, 2
        ), stages(stage_idx, stage) AS (VALUES {stages_values})
        SELECT lang, CAST(stage_idx AS BIGINT) AS stage_idx, stage,
               CAST(sum(CASE WHEN depth >= stage_idx - 1 THEN cnt
                             ELSE 0 END) AS BIGINT) AS n_in,
               CAST(sum(CASE WHEN depth >= stage_idx THEN cnt
                             ELSE 0 END) AS BIGINT) AS n_out,
               CAST(sum(CASE WHEN depth >= stage_idx - 1 THEN cnt
                             ELSE 0 END)
                    - sum(CASE WHEN depth >= stage_idx THEN cnt
                               ELSE 0 END) AS BIGINT) AS n_dropped,
               round(CASE WHEN sum(CASE WHEN depth >= stage_idx - 1
                                        THEN cnt ELSE 0 END) > 0
                          THEN CAST(sum(CASE WHEN depth >= stage_idx - 1
                                             THEN cnt ELSE 0 END)
                                    - sum(CASE WHEN depth >= stage_idx
                                               THEN cnt ELSE 0 END)
                                    AS DOUBLE)
                               / CAST(sum(CASE WHEN depth >= stage_idx - 1
                                               THEN cnt ELSE 0 END)
                                      AS DOUBLE)
                          ELSE 0.0 END, 6) AS drop_share
        FROM counts CROSS JOIN stages
        GROUP BY lang, stage_idx, stage
        ORDER BY lang, stage_idx
    """


#: deterministic Han repair appended to every third zh doc so the audit
#: has true negatives AND true positives on the all-ASCII fixture
_HAN_PLANT = "中文数据质量审计样本"


def lang_script_mismatch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-language vs script consistency audit — the metadata-
    trust gate a multilingual crawl runs before per-language routing:
    a doc tagged `zh` containing zero Han characters (or a Latin-tagged
    doc dominated by Han) means the upstream language tag is wrong and
    every per-lang decision downstream (tokenizer, mix weight, filters)
    is misrouted. Distinct from lang_id_heuristic (which PREDICTS a
    language from content); this checks content against the DECLARED tag.

    The fixture corpus is all-ASCII, so every zh doc is naturally
    mismatched; a deterministic Han repair is planted on doc_id % 3 == 0
    zh docs (mirrored in the oracle) so both verdicts occur. All
    comparisons are exact integers (presence/majority, never ratios) —
    no float boundary anywhere.

    Scale: one scan, two regexp counts per row (codegen'd, no shuffle),
    one lang-keyed aggregate with map-side partials; output is
    lang-cardinality-sized."""
    docs = _docs(spark, sf_dir)
    planted = docs.withColumn(
        "text2",
        F.when(
            (F.col("lang") == "zh") & (F.col("doc_id") % 3 == 0),
            F.concat(F.col("text"), F.lit(" " + _HAN_PLANT)),
        ).otherwise(F.col("text")),
    )
    counted = planted.select(
        "doc_id", "lang",
        F.regexp_count("text2", F.lit(r"\p{IsHan}")).cast("bigint")
        .alias("han"),
        F.regexp_count("text2", F.lit("[A-Za-z]")).cast("bigint")
        .alias("latin"),
    )
    mism = (
        ((F.col("lang") == "zh") & (F.col("han") == 0))
        | ((F.col("lang") != "zh") & (F.col("han") > F.col("latin")))
    ).cast("int")
    return (
        counted.withColumn("mismatch", mism)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("mismatch").cast("bigint").alias("n_mismatch"),
            F.sum((F.col("han") > 0).cast("int")).cast("bigint")
            .alias("n_with_han"),
            F.min(F.when(F.col("mismatch") == 1, F.col("doc_id")))
            .alias("first_flagged"),
            F.max(F.when(F.col("mismatch") == 1, F.col("doc_id")))
            .alias("last_flagged"),
        )
        .orderBy("lang")
    )


def _canary_oracle() -> str:
    import hashlib as _hl

    cans = [
        (i, "canary-" + _hl.md5(f"c{i}".encode()).hexdigest()[:8],
         (3 * i) if i < _N_CANARY_PLANTED else None)
        for i in range(_N_CANARY)
    ]
    plant = " || ".join(
        f"CASE WHEN doc_id % {_CANARY_MOD} = {resid} "
        f"THEN ' {c}' ELSE '' END"
        for _, c, resid in cans if resid is not None)
    dim_vals = ", ".join(f"({i}, '{c}')" for i, c, _ in cans)
    return f"""
        WITH planted AS (
            SELECT doc_id, source, text || {plant} AS text2
            FROM documents
        ), dim(canary_id, canary) AS (VALUES {dim_vals}),
        matched AS (
            SELECT d.canary_id, d.canary, p.doc_id, p.source
            FROM planted p JOIN dim d ON contains(p.text2, d.canary)
        ), counts AS (
            SELECT canary_id, canary,
                   CAST(count(*) AS BIGINT) AS n_docs_containing,
                   min(doc_id) AS first_doc, max(doc_id) AS last_doc
            FROM matched GROUP BY 1, 2
        ), srcs AS (
            SELECT canary_id, canary,
                   CAST(count(*) AS BIGINT) AS n_sources
            FROM (SELECT DISTINCT canary_id, canary, source FROM matched)
            GROUP BY 1, 2
        )
        SELECT dim.canary_id, dim.canary,
               COALESCE(c.n_docs_containing, 0) AS n_docs_containing,
               COALESCE(s.n_sources, 0) AS n_sources,
               c.first_doc, c.last_doc,
               CAST(COALESCE(c.n_docs_containing, 0) > 0 AS INT) AS leaked
        FROM dim
        LEFT JOIN counts c ON dim.canary_id = c.canary_id
        LEFT JOIN srcs s ON dim.canary_id = s.canary_id
        ORDER BY dim.canary_id
    """


ORACLES: dict[str, str] = {
    "canary_extraction_audit": _canary_oracle(),
    "filter_funnel_report": _funnel_oracle(),
    "lang_script_mismatch_audit": f"""
        WITH planted AS (
            SELECT doc_id, lang,
                   CASE WHEN lang = 'zh' AND doc_id % 3 = 0
                        THEN text || ' {_HAN_PLANT}' ELSE text END AS text2
            FROM documents
        ), counted AS (
            SELECT doc_id, lang,
                   CAST(len(regexp_extract_all(text2, '\\p{{Han}}'))
                        AS BIGINT) AS han,
                   CAST(len(regexp_extract_all(text2, '[A-Za-z]'))
                        AS BIGINT) AS latin
            FROM planted
        ), flagged AS (
            SELECT *, CAST((lang = 'zh' AND han = 0)
                           OR (lang <> 'zh' AND han > latin) AS INT)
                          AS mismatch
            FROM counted
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(mismatch) AS BIGINT) AS n_mismatch,
               CAST(sum(CASE WHEN han > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_with_han,
               min(CASE WHEN mismatch = 1 THEN doc_id END) AS first_flagged,
               max(CASE WHEN mismatch = 1 THEN doc_id END) AS last_flagged
        FROM flagged
        GROUP BY lang ORDER BY lang
    """,
    "filter_rate_wilson_ci": f"""
        WITH agg AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN len(string_split_regex(trim(text),
                                     '\\s+')) BETWEEN 20 AND 100000
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
            FROM documents GROUP BY 1
        ), calc AS (
            SELECT source, n, n_pass,
                   CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                   CAST(n AS DOUBLE) AS nd
            FROM agg
        )
        SELECT source, n, n_pass,
               round(p, 6) AS rate_r6,
               round(((p + {_WILSON_Z * _WILSON_Z!r} / (2.0 * nd))
                      - ({_WILSON_Z!r} * sqrt(p * (1.0 - p) / nd
                         + {_WILSON_Z * _WILSON_Z!r} / (4.0 * nd * nd))))
                     / (1.0 + {_WILSON_Z * _WILSON_Z!r} / nd), 6)
                   AS wilson_lo_r6,
               round(((p + {_WILSON_Z * _WILSON_Z!r} / (2.0 * nd))
                      + ({_WILSON_Z!r} * sqrt(p * (1.0 - p) / nd
                         + {_WILSON_Z * _WILSON_Z!r} / (4.0 * nd * nd))))
                     / (1.0 + {_WILSON_Z * _WILSON_Z!r} / nd), 6)
                   AS wilson_hi_r6
        FROM calc ORDER BY source
    """,
    "filter_agreement_kappa": """
        WITH words AS (
            SELECT doc_id, w
            FROM (SELECT doc_id,
                         unnest(string_split_regex(trim(text), '\\s+')) AS w
                  FROM documents)
            WHERE length(w) > 0
        ), wcnt AS (
            SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
            FROM words GROUP BY doc_id, w
        ), per_doc AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(max(c) AS BIGINT) AS max_c,
                   sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS clogc
            FROM wcnt GROUP BY doc_id
        ), ent AS (
            SELECT doc_id,
                   CASE WHEN round(log2(CAST(n_tokens AS DOUBLE))
                                   - clogc / CAST(n_tokens AS DOUBLE), 6)
                             < 3.0
                          OR 20 * max_c > 3 * n_tokens
                        THEN 0 ELSE 1 END AS g_entropy
            FROM per_doc
        ), base AS (
            SELECT doc_id,
                   CASE WHEN len(string_split_regex(trim(text), '\\s+'))
                             BETWEEN 20 AND 100000
                        THEN 1 ELSE 0 END AS g_c4,
                   CASE WHEN length(regexp_replace(text, '\\s+', '', 'g'))
                             <= 12 * len(string_split_regex(trim(text),
                                                            '\\s+'))
                        THEN 1 ELSE 0 END AS g_wordlen
            FROM documents
        ), flags AS (
            SELECT b.doc_id, b.g_c4, b.g_wordlen,
                   COALESCE(e.g_entropy, 0) AS g_entropy
            FROM base b LEFT JOIN ent e ON b.doc_id = e.doc_id
        ), cells AS (
            SELECT 'g_c4' AS gate_a, 'g_entropy' AS gate_b,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(g_c4 * g_entropy) AS BIGINT) AS n11,
                   CAST(sum(g_c4 * (1 - g_entropy)) AS BIGINT) AS n10,
                   CAST(sum((1 - g_c4) * g_entropy) AS BIGINT) AS n01,
                   CAST(sum((1 - g_c4) * (1 - g_entropy)) AS BIGINT) AS n00
            FROM flags
            UNION ALL
            SELECT 'g_c4', 'g_wordlen',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(g_c4 * g_wordlen) AS BIGINT),
                   CAST(sum(g_c4 * (1 - g_wordlen)) AS BIGINT),
                   CAST(sum((1 - g_c4) * g_wordlen) AS BIGINT),
                   CAST(sum((1 - g_c4) * (1 - g_wordlen)) AS BIGINT)
            FROM flags
            UNION ALL
            SELECT 'g_entropy', 'g_wordlen',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(g_entropy * g_wordlen) AS BIGINT),
                   CAST(sum(g_entropy * (1 - g_wordlen)) AS BIGINT),
                   CAST(sum((1 - g_entropy) * g_wordlen) AS BIGINT),
                   CAST(sum((1 - g_entropy) * (1 - g_wordlen)) AS BIGINT)
            FROM flags
        )
        SELECT gate_a, gate_b, n11, n10, n01, n00,
               round(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6)
                   AS agreement_r6,
               round(CASE WHEN CAST((n11 + n10) * (n11 + n01)
                                    + (n01 + n00) * (n10 + n00) AS DOUBLE)
                               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                               = 1.0
                          THEN 1.0
                          ELSE (CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
                                - CAST((n11 + n10) * (n11 + n01)
                                       + (n01 + n00) * (n10 + n00) AS DOUBLE)
                                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                               / (1.0
                                  - CAST((n11 + n10) * (n11 + n01)
                                         + (n01 + n00) * (n10 + n00)
                                         AS DOUBLE)
                                    / (CAST(n AS DOUBLE)
                                       * CAST(n AS DOUBLE)))
                          END, 6) AS kappa_r6
        FROM cells
        ORDER BY gate_a, gate_b
    """,
    "dp_exponential_topk": f"""
        WITH toks AS (
            SELECT tok FROM (
                SELECT unnest(string_split_regex(trim(lower(text)), '\\s+'))
                    AS tok
                FROM documents)
            WHERE length(tok) > 0
        ), cnt AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok
        )
        SELECT tok,
               round(CAST(n AS DOUBLE) * {float(_DP_EPSILON) / 2.0}
                     + (-ln(-ln((CAST(('0x' || substr(md5(tok), 1, 15))
                                      AS BIGINT) + 0.5)
                                / {float(1 << 60)!r}))), 6)
                   AS noisy_score_r6,
               {float(_DP_EPSILON)!r} AS epsilon
        FROM cnt
        ORDER BY noisy_score_r6 DESC, tok
        LIMIT {_DP_TOPK}
    """,
    "dp_laplace_release": f"""
        WITH cells AS (
            SELECT lang,
                   least(n_chars // 100, 9) AS len_decile,
                   CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2
        ), noised AS (
            SELECT lang, CAST(len_decile AS VARCHAR) AS len_decile, n,
                   CAST(('0x' || substr(md5(lang || ':'
                                        || CAST(len_decile AS VARCHAR)),
                                        1, 15)) AS BIGINT)
                   / {float(1 << 60):.1f} - 0.5 AS u0
            FROM cells
        ), clamped AS (
            SELECT lang, len_decile, n,
                   sign(u0) * least(abs(u0), {_DP_U_MAX!r}) AS u
            FROM noised
        )
        SELECT lang, len_decile,
               round(n + (-(1.0 / {_DP_EPSILON}) * sign(u)
                          * ln(1.0 - 2.0 * abs(u))), 4) AS noisy_n_r4,
               {float(_DP_EPSILON)} AS epsilon
        FROM clamped ORDER BY lang, len_decile
    """,
    "source_ngram_overlap": """
        WITH toks AS (
            SELECT source,
                   string_split_regex(trim(lower(text)), '\\s+') AS t
            FROM documents
        ), grams AS (
            SELECT DISTINCT source, g
            FROM toks, UNNEST(list_transform(
                     range(1, len(t) - 3),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                          || t[i+3] || ' ' || t[i+4])) AS u(g)
            WHERE len(t) >= 5
        ), sizes AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n
            FROM grams GROUP BY 1
        ), pairs AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM grams a JOIN grams b
                 ON a.g = b.g AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT source_a, source_b, n_common,
               round(CAST(n_common AS DOUBLE)
                     / CAST(sa.n + sb.n - n_common AS DOUBLE), 6) AS jaccard
        FROM pairs
        JOIN sizes sa ON source_a = sa.source
        JOIN sizes sb ON source_b = sb.source
        ORDER BY source_a, source_b
    """,
    "k_anonymity_release": f"""
        WITH cells AS (
            SELECT lang,
                   least(n_chars // 100, 9) AS len_decile,
                   CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2
        ), released AS (
            SELECT lang, CAST(len_decile AS VARCHAR) AS len_decile,
                   n, FALSE AS suppressed
            FROM cells WHERE n >= {_K_ANON}
        ), pooled AS (
            SELECT lang, '*' AS len_decile,
                   CAST(sum(n) AS BIGINT) AS n, TRUE AS suppressed
            FROM cells WHERE n < {_K_ANON} GROUP BY lang
            HAVING sum(n) >= {_K_ANON}
        )
        SELECT * FROM released
        UNION ALL
        SELECT * FROM pooled
        ORDER BY lang, len_decile
    """,
    "corpus_snapshot_diff": """
        WITH v1 AS (
            SELECT doc_id, lang, md5(text) AS h1, length(text) AS len1
            FROM documents WHERE doc_id % 101 <> 0
        ), v2 AS (
            SELECT doc_id, lang,
                   md5(CASE WHEN doc_id % 89 = 0
                            THEN 'recrawled ' || text ELSE text END) AS h2,
                   length(CASE WHEN doc_id % 89 = 0
                               THEN 'recrawled ' || text ELSE text END) AS len2
            FROM documents
        ), j AS (
            SELECT coalesce(v1.lang, v2.lang) AS lang,
                   CASE WHEN h1 IS NULL THEN 'added'
                        WHEN h2 IS NULL THEN 'removed'
                        WHEN h1 <> h2 THEN 'changed'
                        ELSE 'unchanged' END AS status,
                   coalesce(len2, len1) AS nbytes
            FROM v1 FULL OUTER JOIN v2 USING (doc_id, lang)
        )
        SELECT lang, status,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nbytes) AS BIGINT) AS nbytes
        FROM j GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "decontam_exact_substring_cover": f"""
        WITH ev AS (
            SELECT DISTINCT substr(text, CAST(p AS INT), {_COVER_W}) AS wnd
            FROM documents,
                 unnest(generate_series(1, length(text) - {_COVER_W - 1}))
                     AS g(p)
            WHERE doc_id % 97 = 0 AND length(text) >= {_COVER_W}
        ), tw AS (
            SELECT doc_id, CAST(p AS INT) AS p,
                   substr(text, CAST(p AS INT), {_COVER_W}) AS wnd
            FROM documents,
                 unnest(generate_series(1, length(text) - {_COVER_W - 1}))
                     AS g(p)
            WHERE doc_id % 97 <> 0 AND length(text) >= {_COVER_W}
        ), matched AS (
            SELECT tw.doc_id, tw.p FROM tw JOIN ev USING (wnd)
        ), covered AS (
            SELECT doc_id, count(DISTINCT c) AS covered
            FROM matched,
                 unnest(generate_series(p, p + {_COVER_W - 1})) AS u(c)
            GROUP BY doc_id
        ), per_doc AS (
            SELECT d.lang, coalesce(c.covered, 0) AS covered,
                   length(d.text) AS len
            FROM documents d LEFT JOIN covered c USING (doc_id)
            WHERE d.doc_id % 97 <> 0
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS train_docs,
               CAST(sum(CASE WHEN covered > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_contaminated,
               CAST(sum(covered) AS BIGINT) AS chars_covered,
               CAST(sum(len) AS BIGINT) AS chars_total,
               round(CAST(sum(covered) AS DOUBLE) / CAST(sum(len) AS DOUBLE), 6)
                   AS contamination_pct_r6
        FROM per_doc GROUP BY lang ORDER BY lang
    """,
    "pii_redact_stats": f"""
        WITH r AS ({_REDACT_SQL})
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(emails) AS BIGINT) AS emails,
               CAST(sum(phones) AS BIGINT) AS phones,
               CAST(sum(ips) AS BIGINT) AS ips,
               CAST(sum(CASE WHEN emails + phones + ips > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS docs_touched,
               md5(string_agg(md5(redacted), '' ORDER BY doc_id)) AS redacted_md5
        FROM r GROUP BY lang ORDER BY lang
    """,
    "pii_doc_audit": f"""
        WITH r AS ({_REDACT_SQL})
        SELECT doc_id, lang, emails, phones, ips,
               emails + phones + ips AS pii_total,
               CAST(length(redacted) AS BIGINT) AS redacted_len,
               md5(redacted) AS redacted_md5
        FROM r
        ORDER BY pii_total DESC, doc_id ASC LIMIT 20
    """,
    "boilerplate_segment_dedup": """
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word,
                   generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) AS ord
            FROM documents
        ), segs AS (
            SELECT doc_id, lang, (ord - 1) // 2 AS seg_id,
                   string_agg(word, ' ' ORDER BY ord) AS segment
            FROM toks GROUP BY 1, 2, 3
        ), boiler AS (
            SELECT segment FROM segs
            GROUP BY segment
            HAVING count(DISTINCT doc_id) * 20 >= (SELECT count(*) FROM documents)
        ), flagged AS (
            SELECT s.*, (b.segment IS NOT NULL) AS is_boiler
            FROM segs s LEFT JOIN boiler b USING (segment)
        ), cleaned AS (
            SELECT doc_id, lang,
                   count(*) AS segments_total,
                   sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS segments_removed,
                   coalesce(string_agg(CASE WHEN is_boiler THEN NULL ELSE segment END,
                                       ' ' ORDER BY seg_id), '') AS cleaned
            FROM flagged GROUP BY 1, 2
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(segments_total) AS BIGINT) AS segments_total,
               CAST(sum(segments_removed) AS BIGINT) AS segments_removed,
               md5(string_agg(md5(cleaned), '' ORDER BY doc_id)) AS cleaned_md5
        FROM cleaned GROUP BY lang ORDER BY lang
    """,
    "blocklist_phrase_filter": f"""
        WITH scored AS (
            SELECT doc_id, lang, text,
                   len(regexp_extract_all(text, '{_BLOCK_RE}')) AS hits
            FROM documents
        ), per_lang AS (
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS docs_total,
                   CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS docs_flagged,
                   CAST(sum(hits) AS BIGINT) AS total_hits
            FROM scored GROUP BY lang
        ), kept AS (
            SELECT lang, md5(string_agg(md5(text), '' ORDER BY doc_id))
                       AS kept_md5
            FROM scored WHERE hits = 0 GROUP BY lang
        )
        SELECT p.lang, p.docs_total, p.docs_flagged, p.total_hits,
               coalesce(k.kept_md5, '') AS kept_md5
        FROM per_lang p LEFT JOIN kept k ON p.lang = k.lang
        ORDER BY p.lang
    """,
    "corpus_psi_drift": """
        WITH c AS (
            SELECT lang,
                   least(CAST(floor(n_chars / 100.0) AS INT), 8) AS bucket,
                   sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
                   sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS nb
            FROM documents GROUP BY 1, 2
        ), tot AS (
            SELECT lang, sum(na) AS ta, sum(nb) AS tb,
                   count(*) AS nbuckets
            FROM c GROUP BY lang
        )
        SELECT c.lang,
               CAST(max(ta) AS BIGINT) AS docs_a,
               CAST(max(tb) AS BIGINT) AS docs_b,
               round(sum(
                   (CAST(na + 1 AS DOUBLE) / CAST(ta + nbuckets AS DOUBLE)
                    - CAST(nb + 1 AS DOUBLE) / CAST(tb + nbuckets AS DOUBLE))
                   * ln((CAST(na + 1 AS DOUBLE) / CAST(ta + nbuckets AS DOUBLE))
                        / (CAST(nb + 1 AS DOUBLE) / CAST(tb + nbuckets AS DOUBLE)))
               ), 6) AS psi_r6
        FROM c JOIN tot ON c.lang = tot.lang
        GROUP BY c.lang ORDER BY c.lang
    """,
    "unicode_nfc_scrub": f"""
        WITH aug AS (
            SELECT doc_id, lang,
                   text
                   || CASE WHEN doc_id % 3 = 0 THEN '{_DECOMPOSED}' ELSE '' END
                   || CASE WHEN doc_id % 5 = 1 THEN '{_NFC_STABLE}' ELSE '' END
                   AS raw
            FROM documents
        ), n AS (
            SELECT doc_id, lang, raw, nfc_normalize(raw) AS norm FROM aug
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN norm <> raw THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_changed,
               CAST(sum(length(raw)) AS BIGINT) AS chars_before,
               CAST(sum(length(norm)) AS BIGINT) AS chars_after,
               md5(string_agg(md5(norm), '' ORDER BY doc_id)) AS norm_md5
        FROM n GROUP BY lang ORDER BY lang
    """,
    "holdout_split_grouped": """
        WITH b AS (
            SELECT *,
                   (ascii(substr(md5(source), 1, 1)) * 16
                    + ascii(substr(md5(source), 2, 1))) % 10 AS bucket
            FROM documents
        )
        SELECT CASE WHEN bucket < 8 THEN 'train'
                    WHEN bucket = 8 THEN 'valid'
                    ELSE 'test' END AS split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               min(source) AS first_source,
               max(source) AS last_source
        FROM b GROUP BY 1 ORDER BY 1
    """,
}

QUERIES = {
    "pii_redact_stats": pii_redact_stats,
    "pii_doc_audit": pii_doc_audit,
    "boilerplate_segment_dedup": boilerplate_segment_dedup,
    "holdout_split_grouped": holdout_split_grouped,
    "unicode_nfc_scrub": unicode_nfc_scrub,
    "blocklist_phrase_filter": blocklist_phrase_filter,
    "corpus_psi_drift": corpus_psi_drift,
    "decontam_exact_substring_cover": decontam_exact_substring_cover,
    "corpus_snapshot_diff": corpus_snapshot_diff,
    "k_anonymity_release": k_anonymity_release,
    "filter_funnel_report": filter_funnel_report,
    "source_ngram_overlap": source_ngram_overlap,
    "dp_laplace_release": dp_laplace_release,
    "dp_exponential_topk": dp_exponential_topk,
    "filter_agreement_kappa": filter_agreement_kappa,
    "canary_extraction_audit": canary_extraction_audit,
    "filter_rate_wilson_ci": filter_rate_wilson_ci,
    "lang_script_mismatch_audit": lang_script_mismatch_audit,
}
