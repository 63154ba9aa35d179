"""Mergeable-summary operators: Misra-Gries heavy hitters.

Misra & Gries 1982 ("Finding repeated elements"); the summary-merge
framing is Agarwal et al. 2012 ("Mergeable Summaries", PODS). The
at-scale problem: exact token frequencies over a 100 TB corpus need a
groupBy whose hash table is the full vocabulary (billions of keys,
spill-bound). For THRESHOLD queries — every item with count > N/k — the
two-pass candidate/verify shape bounds memory at k counters per
partition:

1. candidate pass: each partition streams once through a k-counter
   Misra-Gries summary (Arrow-batched ``mapInPandas``; state persists
   across the partition's batches). Pigeonhole guarantee: an item with
   global count > N/k exceeds its local n_p/k share in at least one
   partition, so the union of partition summaries is a SUPERSET of every
   global heavy hitter — regardless of how rows are partitioned.
2. verify pass: exact counts for candidates only — the corpus streams
   through a broadcast semi-join (candidates ≤ k × partitions, tiny), so
   the aggregation hash table holds candidate keys, never the vocabulary.

The result is EXACT (deterministic, partition-independent): MG only
generates candidates; the threshold is applied to true counts.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_merge_histogram(counters: dict, hist, k: int) -> None:
    """WEIGHTED Misra-Gries update of ``counters`` (≤ k-1 keys) with a
    batch histogram {item: count} — the vectorized common case: the
    per-row Python walk is replaced by one C-speed ``value_counts`` per
    Arrow batch plus a dict merge per DISTINCT item; the O(k) decrement
    walk runs only when the summary saturates on a new item.

    Weighted-update correctness (Misra-Gries 1982 generalizes to weights;
    Agarwal 2012 §2 mergeable summaries): adding (item, c) to a full
    summary subtracts d = min(c, min counter) from every counter AND from
    c, inserting the remainder if a slot freed. Each such event removes
    ≥ d·k total weight, and removed weight is bounded by the partition's
    n_p, so any item's retained count ≥ true count − n_p/k — the same
    pigeonhole superset guarantee as the unit-weight walk, independent of
    row order or batching."""
    for item, c in hist.items():
        c = int(c)
        if c <= 0:
            continue
        if item in counters:
            counters[item] += c
        elif len(counters) < k - 1:
            counters[item] = c
        else:
            mn = min(counters.values())
            d = c if c < mn else mn
            dead = []
            for key in counters:
                counters[key] -= d
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
            if c > d:
                counters[item] = c - d


def _mg_summarize(k: int, col: str):
    """mapInPandas kernel: one Misra-Gries summary per partition, fed one
    value_counts histogram per Arrow batch (state persists across the
    partition's batches)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for batch in batches:
            mg_merge_histogram(
                counters, batch[col].value_counts(dropna=False), k)
        yield pd.DataFrame(
            {col: list(counters.keys()), "mg_count": list(counters.values())}
        )

    return fn


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned: (col, mg_count) with
    ≤ k-1 rows per partition. mg_count is a LOWER bound on the partition-
    local count (standard MG undercount ≤ n_p/k)."""
    src = df.select(F.col(col).cast("string").alias(col))
    schema = f"{col} string, mg_count long"
    return src.mapInPandas(_mg_summarize(k, col), schema=schema)


def bloom_build(df: DataFrame, col, m_bits: int = 1 << 17, h: int = 4) -> list:
    """Build an m-bit Bloom filter (Bloom 1970) over ``col`` as a python
    list of m/64 longs — the driver-side artifact a probe expression embeds
    as a literal. The set-bit positions are computed DISTRIBUTIVELY
    (h seeded xxhash64 per row, distinct), so the collect is bounded by
    min(h·n, m) ints regardless of input size. Spark's own runtime-filter
    machinery uses the same shape internally (BloomFilterAggregate);
    bloom_filter_agg isn't in the public function registry, so the words
    are assembled here. At very large m (≫ tens of MB) prefer the
    broadcast semi-join — a literal that size bloats the plan."""
    pos = (
        df.select(
            F.explode(
                F.array(*[
                    F.pmod(F.xxhash64(F.lit(i), F.col(col) if isinstance(col, str) else col),
                           F.lit(m_bits))
                    for i in range(h)
                ])
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos:
        p = int(r["p"])
        words[p >> 6] |= 1 << (p & 63)
    # Spark longs are signed; normalize to the signed 64-bit range
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(words: list, col, m_bits: int = 1 << 17, h: int = 4):
    """Codegen'd probe: AND over h (element_at(words, p>>6) >> (p&63)) & 1
    tests against the literal words array — a map-side filter, no shuffle,
    no UDF. False positives only (the caller's exact join removes them);
    never false negatives."""
    arr = F.array(*[F.lit(w) for w in words])
    c = F.col(col) if isinstance(col, str) else col
    cond = F.lit(True)
    for i in range(h):
        p = F.pmod(F.xxhash64(F.lit(i), c), F.lit(m_bits))
        word = F.element_at(arr, (p / F.lit(64)).cast("int") + F.lit(1))
        shifted = F.call_function("shiftright", word, (p % F.lit(64)).cast("int"))
        cond = cond & (shifted.bitwiseAND(F.lit(1)) == F.lit(1))
    return cond


def water_fill(caps: list[tuple[str, float]], budget: float) -> dict[str, float]:
    """Water-filling allocation (UniMax, Chung et al. 2023): quota_i =
    min(cap_i, tau) with tau chosen so the quotas sum to ``budget`` (or
    quota=cap everywhere when the budget covers all caps). ``caps`` must
    be sorted ascending by (cap, key); runs on metadata-sized input (one
    row per language/source)."""
    n = len(caps)
    prefix, tau, kfull = 0.0, float("inf"), n
    for i in range(n):
        level = (budget - prefix) / (n - i)
        if caps[i][1] >= level:
            tau, kfull = level, i
            break
        prefix += caps[i][1]
    return {
        key: (cap if i < kfull else min(cap, tau))
        for i, (key, cap) in enumerate(caps)
    }


def heavy_hitters_threshold(df: DataFrame, col: str, k: int) -> DataFrame:
    """EXACT (item, cnt) for every item with count > N/k — bounded-memory
    two-pass shape (module docstring). Returns (col, cnt)."""
    src = df.select(F.col(col).cast("string").alias(col))
    n_total = src.count()
    cands = mg_candidates(src, col, k).select(col).distinct()
    exact = (
        src.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return exact.filter(F.col("cnt") > n_total / float(k))


def hll_registers(df, col: str = None, p: int = 12, group_cols: list | None = None,
                  hash_col=None, hash_bits: int = 63):
    """Explicit HyperLogLog registers (Flajolet et al. 2007) as a
    DataFrame aggregate — the mergeable-cardinality sketch spelled out
    (same tier as the explicit Bloom build above; Spark's
    approx_count_distinct wraps the same math opaquely).

    63-bit positive hash (sign bit masked so ``>>`` is portable between
    arithmetic and logical shifts), low ``p`` bits route to one of 2^p
    buckets, and rho = leading-zero count of the remaining 63-p bits + 1
    comes from ``length(bin(w))`` — an EXACT integer identity
    (len = floor(log2 w)+1), no float log anywhere. Registers are
    groupBy(bucket).max(rho): order-free, mergeable, shuffle of at most
    2^p longs per group. Returns (bucket, rho).

    ``hash_col`` overrides the default xxhash64 with any 64-bit column —
    the oracle-paired query passes a portable md5-derived 60-bit hash so
    DuckDB reproduces the registers bit-for-bit; production keeps the
    cheaper codegen xxhash64.
    """
    from pyspark.sql import functions as F

    # hash_bits MUST match the real entropy width of the hash: a window
    # wider than the hash guarantees leading zeros in every value, which
    # inflates rho uniformly and multiplies the estimate by 2^slack
    if col is None and hash_col is None:
        raise ValueError(
            "hll_registers: supply exactly one of col= (a column to "
            "xxhash64) or hash_col= (a precomputed 64-bit hash column)")
    if col is not None and hash_col is not None:
        raise ValueError(
            "hll_registers: col= and hash_col= are mutually exclusive")
    if not p < hash_bits <= 64:
        raise ValueError(
            f"hll_registers: hash_bits={hash_bits} must satisfy "
            f"p ({p}) < hash_bits <= 64 — the bucket index consumes the "
            "low p bits and rho needs at least one bit of w")
    wbits = hash_bits - p
    raw = hash_col if hash_col is not None else F.xxhash64(F.col(col))
    hp = raw.bitwiseAND(F.lit((1 << hash_bits) - 1))
    bucket = hp.bitwiseAND(F.lit((1 << p) - 1))
    w = F.shiftright(hp, p)
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    keys = list(group_cols or [])
    return (
        df.select(*keys, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def cms_counters(df, col: str, depth: int = 4, width: int = 1024,
                 portable: bool = False):
    """Count-Min Sketch counters (Cormode & Muthukrishnan 2005) as a
    DataFrame aggregate: ``depth`` independent hash rows × ``width``
    buckets, each counter the SUM of arrivals routed there. One
    explode(depth) + one (row, bucket) groupBy with map-side partials —
    state is depth·width longs, mergeable by addition (the per-shard
    frequency sketch; point estimate = min over rows, always >= truth).

    ``portable=True`` routes with md5-salted 32-bit hashes both DuckDB
    and Spark compute identically (oracle pairing); default is codegen
    xxhash64 with the row index as seed-salt.
    """
    from pyspark.sql import functions as F

    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    base = df.select(F.col(col).alias("__it"), rows)
    if portable:
        bucket = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("r").cast("string"),
                                   F.lit("|"), F.col("__it"))), 1, 8),
                16, 10,
            ).cast("bigint") % width
        )
    else:
        bucket = F.pmod(
            F.xxhash64(F.col("r").cast("string"), F.col("__it")),
            F.lit(width),
        )
    return (
        base.select("r", bucket.alias("b"))
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
