"""Differential fuzzing: seeded random relational queries, one shared ANSI
SQL text per case, executed by BOTH Spark SQL and DuckDB and compared exactly.

This extends the oracle gate from the hand-written inventory to a generated
family: random conjunctive/disjunctive predicates, group keys, and aggregate
sets over `orders`. Sums go through DECIMAL casts so every result is
bit-deterministic regardless of partitioning (the same discipline as the
declared inventory). Seeds are fixed — failures reproduce exactly.

Seed rotation: each family draws from its own base offset (0 / 10k / 20k /
...). Set DBT_SPARK_FUZZ_OFFSET=N (e.g. the ISO week number in CI) to shift
every family's base by N — determinism is preserved per run while the
sampled corner of the grammar moves each rotation.
"""

from __future__ import annotations

import math
import os
import random

import duckdb
import pandas as pd
import pytest

from dbt_spark.session import load_tables

from tests.conftest import SF_DIR

# weekly-rotation knob: shifts every family's seed base
_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))

NUM_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]
STR_COLS = {
    "o_orderstatus": ["F", "O", "P"],
    "o_orderpriority": [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ],
}
CMP = ["<", "<=", ">", ">=", "=", "!="]


def _atom(rng: random.Random) -> str:
    kind = rng.randrange(3)
    if kind == 0:
        col = rng.choice(NUM_COLS)
        bound = {
            "o_orderkey": rng.randrange(1, 60000),
            "o_custkey": rng.randrange(1, 1500),
            "o_totalprice": rng.randrange(1000, 400000),
        }[col]
        return f"{col} {rng.choice(CMP)} {bound}"
    if kind == 1:
        col = rng.choice(list(STR_COLS))
        vals = rng.sample(STR_COLS[col], rng.randrange(1, len(STR_COLS[col])))
        quoted = ", ".join(f"'{v}'" for v in vals)
        return f"{col} IN ({quoted})"
    year = rng.randrange(1993, 1999)
    return f"o_orderdate {rng.choice(['<', '>='])} TIMESTAMP '{year}-07-01 00:00:00'"


def _gen_sql(seed: int) -> str:
    rng = random.Random(_OFF + seed)
    atoms = [_atom(rng) for _ in range(rng.randrange(1, 4))]
    glue = " AND " if rng.random() < 0.6 else " OR "
    where = glue.join(atoms)

    key_pool = ["o_orderstatus", "o_orderpriority", "year(o_orderdate)"]
    keys = rng.sample(key_pool, rng.randrange(0, 3))
    key_aliases = [f"k{i}" for i in range(len(keys))]

    agg_pool = [
        "CAST(count(*) AS BIGINT) AS n",
        "CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust",
        "CAST(min(o_orderkey) AS BIGINT) AS min_key",
        "CAST(max(o_custkey) AS BIGINT) AS max_cust",
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total",
        "CAST(min(o_orderdate) AS TIMESTAMP) AS first_date",
    ]
    aggs = rng.sample(agg_pool, rng.randrange(1, 4))

    select_keys = [
        # STRING: shared spelling (Spark rejects bare VARCHAR; DuckDB aliases
        # STRING to VARCHAR)
        f"CAST({k} AS {'BIGINT' if 'year' in k else 'STRING'}) AS {a}"
        for k, a in zip(keys, key_aliases)
    ]
    select = ", ".join(select_keys + aggs)
    sql = f"SELECT {select} FROM orders WHERE {where}"
    if keys:
        sql += " GROUP BY " + ", ".join(keys)
    return sql


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    return sorted(tuple(cell(v) for v in row)
                  for row in df[cols].itertuples(index=False))


def _gen_join_window_sql(seed: int) -> str:
    """Random join type + window function over orders⋈customer."""
    rng = random.Random(_OFF + seed)
    jtype = rng.choice(["JOIN", "LEFT JOIN", "LEFT SEMI JOIN", "LEFT ANTI JOIN"])
    where = _atom(rng)
    if "SEMI" in jtype or "ANTI" in jtype:
        return (
            f"SELECT o_orderkey, o_custkey FROM orders {jtype} customer "
            f"ON o_custkey = c_custkey WHERE {where}"
        )
    wfn = rng.choice(
        [
            "ROW_NUMBER()",
            "RANK()",
            "running_sum",
            "LAG(o_orderkey) OVER (PARTITION BY c_mktsegment ORDER BY o_orderkey)",
        ]
    )
    if wfn == "running_sum":
        # NOTE: stays DOUBLE — CAST(double AS BIGINT) truncates in Spark but
        # rounds in DuckDB (a true dialect divergence this fuzzer surfaced)
        expr = (
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER "
            "(PARTITION BY c_mktsegment ORDER BY o_orderkey "
            "ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS w"
        )
    else:
        if wfn in ("ROW_NUMBER()", "RANK()"):
            wfn += " OVER (PARTITION BY c_mktsegment ORDER BY o_orderkey)"
        expr = f"CAST({wfn} AS BIGINT) AS w"
    return (
        f"SELECT o_orderkey, c_mktsegment, {expr} "
        f"FROM orders {jtype} customer ON o_custkey = c_custkey WHERE {where}"
    )


def _duck(con, sql: str):
    # DuckDB spells semi/anti without LEFT prefix ambiguity the same way —
    # both engines accept LEFT SEMI/ANTI? DuckDB uses SEMI/ANTI keywords.
    return con.sql(sql.replace("LEFT SEMI JOIN", "SEMI JOIN")
                      .replace("LEFT ANTI JOIN", "ANTI JOIN")).df()


def _run_case(spark, sql: str, seed: int) -> None:
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(SF_DIR, f'{t}.parquet')}'"
        )
    got = spark.sql(sql).toPandas()
    want = _duck(con, sql)
    assert sorted(got.columns) == sorted(want.columns), sql
    assert _canon(got) == _canon(want), f"seed={seed}: {sql}"


@pytest.mark.parametrize("seed", range(60))
def test_differential_random_query(spark, seed):
    load_tables(spark, SF_DIR, "orders")
    _run_case(spark, _gen_sql(seed), seed)


@pytest.mark.parametrize("seed", range(30))
def test_differential_join_window(spark, seed):
    load_tables(spark, SF_DIR, "orders", "customer")
    _run_case(spark, _gen_join_window_sql(seed), seed)


def _gen_setop_grouping_sql(seed: int) -> str:
    """Random set operations and grouping-set shapes."""
    rng = random.Random(_OFF + seed)
    if rng.random() < 0.5:
        op = rng.choice(
            ["UNION", "UNION ALL", "INTERSECT", "EXCEPT",
             "INTERSECT ALL", "EXCEPT ALL"]
        )
        a, b = _atom(rng), _atom(rng)
        return (
            f"SELECT o_custkey FROM orders WHERE {a} "
            f"{op} "
            f"SELECT o_custkey FROM orders WHERE {b}"
        )
    shape = rng.choice(
        [
            "ROLLUP (o_orderstatus, o_orderpriority)",
            "CUBE (o_orderstatus, o_orderpriority)",
            "GROUPING SETS ((o_orderstatus), (o_orderpriority), ())",
        ]
    )
    # Known dialect divergence (fuzzer-surfaced): on an EMPTY input, the
    # grand-total grouping set yields one NULL/0 row in DuckDB (SQL standard)
    # but zero rows in Spark. Keep the input provably non-empty so the fuzz
    # compares the shared semantics, not that documented edge.
    where = f"(o_orderkey >= {rng.randrange(1, 1000)} OR {_atom(rng)})"
    return (
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
        f"FROM orders WHERE {where} GROUP BY {shape}"
    )


@pytest.mark.parametrize("seed", range(30))
def test_differential_setop_grouping(spark, seed):
    load_tables(spark, SF_DIR, "orders")
    _run_case(spark, _gen_setop_grouping_sql(seed), seed)


def _gen_scalar_expr(rng: random.Random, depth: int = 0) -> str:
    """Random scalar string expression over o_orderpriority/o_orderstatus —
    dialect-shared function spellings only."""
    base = rng.choice(["o_orderpriority", "o_orderstatus"])
    if depth >= 2 or rng.random() < 0.3:
        return base
    inner = _gen_scalar_expr(rng, depth + 1)
    return rng.choice(
        [
            f"upper({inner})",
            f"lower({inner})",
            f"trim({inner})",
            f"reverse({inner})",
            f"substring({inner}, 1, {rng.randrange(1, 6)})",
            f"replace({inner}, '-', '_')",
            f"concat({inner}, '|', o_orderstatus)",
            f"lpad({inner}, {rng.randrange(8, 14)}, '*')",
            f"left({inner}, {rng.randrange(1, 5)})",
        ]
    )


def _gen_scalar_sql(seed: int) -> str:
    rng = random.Random(_OFF + seed)
    e1 = _gen_scalar_expr(rng)
    date_expr = rng.choice(
        [
            "CAST(year(o_orderdate) AS BIGINT)",
            "CAST(month(o_orderdate) AS BIGINT)",
            "CAST(day(o_orderdate) AS BIGINT)",
            "CAST(length(o_orderpriority) AS BIGINT)",
            "CAST(ascii(o_orderstatus) AS BIGINT)",
        ]
    )
    # NOTE: no round() over DECIMAL ties here — Spark rounds decimals
    # HALF_UP, DuckDB HALF_EVEN (x.xx5 diverges); exact decimal arithmetic
    # cast to double is tie-free.
    return (
        f"SELECT o_orderkey, {e1} AS s, {date_expr} AS n, "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS frac "
        f"FROM orders WHERE {_atom(rng)}"
    )


@pytest.mark.parametrize("seed", range(25))
def test_differential_scalar_funcs(spark, seed):
    load_tables(spark, SF_DIR, "orders")
    _run_case(spark, _gen_scalar_sql(seed), seed)


# --------------------------------------------------------------------------
# higher-order array functions (the token-array building blocks of the
# LLM-ops inventory). Spellings differ per dialect, so the generator makes
# the SAME random choices and renders a (spark_sql, duck_sql) pair.
# --------------------------------------------------------------------------

_HOF_TOKENS_SPARK = "split(trim(text), '\\\\s+')"
_HOF_TOKENS_DUCK = "string_split_regex(trim(text), '\\s+')"


def _gen_hof_pair(seed: int) -> tuple[str, str]:
    rng = random.Random(10_000 + _OFF + seed)
    s_arr, d_arr = _HOF_TOKENS_SPARK, _HOF_TOKENS_DUCK

    # optional per-token filter on length
    if rng.random() < 0.7:
        k = rng.randrange(2, 6)
        op = rng.choice([">", ">=", "<="])
        s_arr = f"filter({s_arr}, t -> length(t) {op} {k})"
        d_arr = f"list_filter({d_arr}, t -> length(t) {op} {k})"

    # optional per-token transform
    if rng.random() < 0.7:
        fn = rng.choice(["upper", "reverse", "lower"])
        s_arr = f"transform({s_arr}, t -> {fn}(t))"
        d_arr = f"list_transform({d_arr}, t -> {fn}(t))"

    # scalar reductions over the (possibly filtered/transformed) array
    probe = rng.choice(["the", "data", "zz", "spark"])
    n_slice = rng.randrange(2, 6)
    s_cols = (
        f"CAST(size({s_arr}) AS BIGINT) AS n, "
        f"CAST(aggregate({s_arr}, 0L, (a, t) -> a + length(t)) AS BIGINT) AS total_len, "
        f"array_contains({s_arr}, '{probe}') AS has_probe, "
        f"array_join(slice(array_sort({s_arr}), 1, {n_slice}), ' ') AS head_sorted"
    )
    d_cols = (
        f"CAST(len({d_arr}) AS BIGINT) AS n, "
        f"CAST(coalesce(list_sum(list_transform({d_arr}, t -> length(t))), 0) AS BIGINT) AS total_len, "
        f"list_contains({d_arr}, '{probe}') AS has_probe, "
        # dialect edge surfaced by this family: DuckDB array_to_string([])
        # is NULL, Spark array_join([]) is '' — coalesce the oracle side
        f"coalesce(array_to_string(list_slice(list_sort({d_arr}), 1, {n_slice}), ' '), '') AS head_sorted"
    )
    where = f"doc_id % {rng.randrange(2, 5)} = 0"
    return (
        f"SELECT doc_id, {s_cols} FROM documents WHERE {where}",
        f"SELECT doc_id, {d_cols} FROM documents WHERE {where}",
    )


@pytest.mark.parametrize("seed", range(25))
def test_differential_higher_order_funcs(spark, seed):
    load_tables(spark, SF_DIR, "documents")
    spark_sql, duck_sql = _gen_hof_pair(seed)
    con = duckdb.connect()
    con.sql(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(SF_DIR, 'documents.parquet')}'"
    )
    got = spark.sql(spark_sql).toPandas()
    want = con.sql(duck_sql).df()
    assert sorted(got.columns) == sorted(want.columns), spark_sql
    assert _canon(got) == _canon(want), f"seed={seed}: {spark_sql}"


# --------------------------------------------------------------------------
# window frames: random ROWS / RANGE bounds over a unique ordering key
# (deterministic peer order ⟹ frame contents identical in both engines)
# --------------------------------------------------------------------------

def _gen_frame_sql(seed: int) -> str:
    rng = random.Random(20_000 + _OFF + seed)
    part = rng.choice(["o_orderstatus", "o_orderpriority", "o_custkey % 7"])
    kind = rng.choice(["ROWS", "RANGE"])
    if kind == "ROWS":
        lo = rng.choice(["UNBOUNDED PRECEDING", f"{rng.randrange(1, 5)} PRECEDING",
                         "CURRENT ROW"])
        hi = rng.choice(["CURRENT ROW", f"{rng.randrange(1, 5)} FOLLOWING",
                         "UNBOUNDED FOLLOWING"])
        if lo == "CURRENT ROW" and hi == "CURRENT ROW":
            hi = "UNBOUNDED FOLLOWING"
    else:
        lo = rng.choice(["UNBOUNDED PRECEDING", f"{rng.randrange(100, 900)} PRECEDING"])
        hi = rng.choice(["CURRENT ROW", f"{rng.randrange(100, 900)} FOLLOWING"])
    agg = rng.choice([
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)",
        "CAST(count(*) OVER w AS BIGINT)",
        "CAST(min(o_orderkey) OVER w AS BIGINT)",
        "CAST(max(o_orderkey) OVER w AS BIGINT)",
    ])
    return (
        f"SELECT o_orderkey, {agg} AS wv FROM orders "
        f"WHERE {_atom(rng)} "
        f"WINDOW w AS (PARTITION BY {part} ORDER BY o_orderkey "
        f"{kind} BETWEEN {lo} AND {hi})"
    )


@pytest.mark.parametrize("seed", range(20))
def test_differential_window_frames(spark, seed):
    load_tables(spark, SF_DIR, "orders")
    _run_case(spark, _gen_frame_sql(seed), seed)


# --------------------------------------------------------------------------
# date/time functions: spellings and arg orders differ per dialect
# (Spark datediff(end, start) vs DuckDB datediff('day', start, end)), so the
# generator renders a (spark_sql, duck_sql) pair from shared choices.
# --------------------------------------------------------------------------

def _gen_datetime_pair(seed: int) -> tuple[str, str]:
    rng = random.Random(30_000 + _OFF + seed)
    grain = rng.choice(["year", "quarter", "month", "week", "day"])
    n_days = rng.randrange(1, 400)
    anchor = f"TIMESTAMP '199{rng.randrange(3, 9)}-0{rng.randrange(1, 10)}-15 00:00:00'"
    part = rng.choice(["year", "month", "day", "dayofweek", "quarter"])
    s_part = {"dayofweek": "dayofweek(o_orderdate)",
              "year": "year(o_orderdate)", "month": "month(o_orderdate)",
              "day": "day(o_orderdate)",
              "quarter": "quarter(o_orderdate)"}[part]
    # DuckDB dayofweek: 0=Sunday; Spark dayofweek: 1=Sunday — shift DuckDB
    d_part = {"dayofweek": "dayofweek(o_orderdate) + 1",
              "year": "year(o_orderdate)", "month": "month(o_orderdate)",
              "day": "day(o_orderdate)",
              "quarter": "quarter(o_orderdate)"}[part]
    where = _atom(rng)
    s_cols = (
        f"CAST(date_trunc('{grain.upper()}', o_orderdate) AS TIMESTAMP) AS tg, "
        f"CAST(datediff(o_orderdate, {anchor}) AS BIGINT) AS dd, "
        f"CAST(o_orderdate + INTERVAL {n_days} DAYS AS TIMESTAMP) AS shifted, "
        f"CAST({s_part} AS BIGINT) AS pt, "
        f"CAST(last_day(o_orderdate) AS TIMESTAMP) AS eom"
    )
    d_cols = (
        f"CAST(date_trunc('{grain}', o_orderdate) AS TIMESTAMP) AS tg, "
        f"CAST(datediff('day', {anchor}, o_orderdate) AS BIGINT) AS dd, "
        f"CAST(o_orderdate + INTERVAL '{n_days}' DAY AS TIMESTAMP) AS shifted, "
        f"CAST({d_part} AS BIGINT) AS pt, "
        f"CAST(last_day(o_orderdate) AS TIMESTAMP) AS eom"
    )
    return (
        f"SELECT o_orderkey, {s_cols} FROM orders WHERE {where}",
        f"SELECT o_orderkey, {d_cols} FROM orders WHERE {where}",
    )


@pytest.mark.parametrize("seed", range(15))
def test_differential_datetime_funcs(spark, seed):
    load_tables(spark, SF_DIR, "orders")
    spark_sql, duck_sql = _gen_datetime_pair(seed)
    con = duckdb.connect()
    con.sql(
        "CREATE OR REPLACE VIEW orders AS SELECT * FROM "
        f"'{os.path.join(SF_DIR, 'orders.parquet')}'"
    )
    got = spark.sql(spark_sql).toPandas()
    want = con.sql(duck_sql).df()
    assert sorted(got.columns) == sorted(want.columns), spark_sql
    assert _canon(got) == _canon(want), f"seed={seed}: {spark_sql}"


# --------------------------------------------------------------------------
# LATERAL correlated subqueries (Spark ≥3.2 and DuckDB share the spelling).
# Aggregate laterals always yield one row, so inner-join row counts match by
# construction; top-n laterals order by the unique key for determinism.
# --------------------------------------------------------------------------

def _gen_lateral_sql(seed: int) -> str:
    rng = random.Random(40_000 + _OFF + seed)
    k = rng.randrange(37, 211)
    outer = f"c_custkey % {rng.randrange(5, 23)} = 0 AND c_custkey < {k * 7}"
    if rng.random() < 0.6:
        atom = _atom(rng)
        aggs = rng.sample(
            [
                "CAST(count(*) AS BIGINT) AS n",
                "CAST(coalesce(max(o_orderkey), 0) AS BIGINT) AS mx",
                "CAST(coalesce(min(o_custkey), -1) AS BIGINT) AS mn",
                "CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) "
                "AS DOUBLE) AS tot",
            ],
            rng.randrange(2, 4),
        )
        return (
            f"SELECT c_custkey, c_mktsegment, t.* FROM customer, LATERAL ("
            f"SELECT {', '.join(aggs)} FROM orders "
            f"WHERE o_custkey = c_custkey AND {atom}) t "
            f"WHERE {outer}"
        )
    n = rng.randrange(1, 4)
    return (
        f"SELECT c_custkey, t.o_orderkey FROM customer, LATERAL ("
        f"SELECT o_orderkey FROM orders WHERE o_custkey = c_custkey "
        f"ORDER BY o_orderkey LIMIT {n}) t "
        f"WHERE {outer}"
    )


@pytest.mark.parametrize("seed", range(15))
def test_differential_lateral(spark, seed):
    load_tables(spark, SF_DIR, "orders", "customer")
    _run_case(spark, _gen_lateral_sql(seed), seed)


# --------------------------------------------------------------------------
# map-typed expressions: Spark map()/element_at vs DuckDB MAP{}/bracket —
# spellings differ (and DuckDB's m['k'] yields a LIST, unwrapped with [1]),
# so the generator renders a (spark_sql, duck_sql) pair from shared choices.
# --------------------------------------------------------------------------

def _gen_map_pair(seed: int) -> tuple[str, str]:
    rng = random.Random(50_000 + _OFF + seed)
    mod = rng.randrange(3, 9)
    probe = rng.choice(["p", "q", "zz"])
    where = _atom(rng)
    s_map = f"map('p', o_custkey, 'q', o_orderkey % {mod})"
    d_map = f"MAP {{'p': o_custkey, 'q': o_orderkey % {mod}}}"
    s_cols = (
        f"CAST(element_at(m, '{probe}') AS BIGINT) AS mv, "
        "CAST(size(m) AS BIGINT) AS msz, "
        "array_join(array_sort(map_keys(m)), ',') AS mk, "
        "CAST(aggregate(map_values(m), 0L, (a, v) -> a + v) AS BIGINT) AS vsum"
    )
    d_cols = (
        f"CAST(m['{probe}'][1] AS BIGINT) AS mv, "
        "CAST(cardinality(m) AS BIGINT) AS msz, "
        "coalesce(array_to_string(list_sort(map_keys(m)), ','), '') AS mk, "
        "CAST(list_sum(map_values(m)) AS BIGINT) AS vsum"
    )
    return (
        f"SELECT o_orderkey, {s_cols} FROM "
        f"(SELECT o_orderkey, {s_map} AS m FROM orders WHERE {where}) x",
        f"SELECT o_orderkey, {d_cols} FROM "
        f"(SELECT o_orderkey, {d_map} AS m FROM orders WHERE {where}) x",
    )


@pytest.mark.parametrize("seed", range(15))
def test_differential_map_funcs(spark, seed):
    load_tables(spark, SF_DIR, "orders")
    spark_sql, duck_sql = _gen_map_pair(seed)
    con = duckdb.connect()
    con.sql(
        "CREATE OR REPLACE VIEW orders AS SELECT * FROM "
        f"'{os.path.join(SF_DIR, 'orders.parquet')}'"
    )
    got = spark.sql(spark_sql).toPandas()
    want = con.sql(duck_sql).df()
    assert sorted(got.columns) == sorted(want.columns), spark_sql
    assert _canon(got) == _canon(want), f"seed={seed}: {spark_sql}"


# --------------------------------------------------------------------------
# correlated / quantified subqueries: EXISTS, NOT EXISTS, IN, NOT IN (the
# NULL-semantics minefield — NOT IN over a set containing NULL is empty),
# and scalar correlated subqueries. Shared ANSI spelling in both engines.
# --------------------------------------------------------------------------

def _gen_subquery_sql(seed: int) -> str:
    rng = random.Random(60_000 + _OFF + seed)
    kind = rng.randrange(4)
    inner_pred = _atom(rng)
    outer_pred = f"c_custkey % {rng.randrange(3, 11)} = 0"
    if kind == 0:
        q = rng.choice(["EXISTS", "NOT EXISTS"])
        return (
            f"SELECT c_custkey, c_mktsegment FROM customer "
            f"WHERE {outer_pred} AND {q} ("
            f"SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            f"AND {inner_pred})"
        )
    if kind == 1:
        # IN / NOT IN with a guaranteed-non-NULL key set (both engines agree
        # on three-valued logic; o_custkey is non-null in the data, so the
        # comparison exercises set membership rather than the NULL-poisoned
        # always-empty NOT IN)
        q = rng.choice(["IN", "NOT IN"])
        return (
            f"SELECT c_custkey FROM customer "
            f"WHERE {outer_pred} AND c_custkey {q} ("
            f"SELECT o_custkey FROM orders WHERE {inner_pred})"
        )
    if kind == 2:
        # scalar correlated aggregate in the SELECT list
        agg = rng.choice(
            ["CAST(count(*) AS BIGINT)", "CAST(coalesce(max(o_orderkey), 0) AS BIGINT)"])
        return (
            f"SELECT c_custkey, ("
            f"SELECT {agg} FROM orders WHERE o_custkey = c_custkey "
            f"AND {inner_pred}) AS sub "
            f"FROM customer WHERE {outer_pred}"
        )
    # quantified comparison via min/max rewrite shared by both dialects
    cmp_op = rng.choice(["<", ">"])
    return (
        f"SELECT c_custkey FROM customer "
        f"WHERE {outer_pred} AND c_custkey * 40 {cmp_op} ("
        f"SELECT coalesce(min(o_orderkey), 0) FROM orders "
        f"WHERE o_custkey = c_custkey)"
    )


@pytest.mark.parametrize("seed", range(15))
def test_differential_subqueries(spark, seed):
    load_tables(spark, SF_DIR, "orders", "customer")
    _run_case(spark, _gen_subquery_sql(seed), seed)


# --------------------------------------------------------------------------
# JSON extraction over events.props — Spark get_json_object vs DuckDB
# json_extract_string, rendered as per-dialect pairs from shared choices.
# --------------------------------------------------------------------------

def _gen_json_pair(seed: int) -> tuple[str, str]:
    rng = random.Random(70_000 + _OFF + seed)
    s_k = "CAST(get_json_object(props, '$.k') AS BIGINT)"
    d_k = "CAST(json_extract_string(props, '$.k') AS BIGINT)"
    mod = rng.randrange(2, 7)
    shape = rng.randrange(3)
    if shape == 0:
        where = f"% {mod} = {rng.randrange(mod)}"
        return (
            f"SELECT event_id, {s_k} AS k FROM events WHERE {s_k} {where}",
            f"SELECT event_id, {d_k} AS k FROM events WHERE {d_k} {where}",
        )
    if shape == 1:
        return (
            "SELECT event_type, "
            f"CAST(sum({s_k}) AS BIGINT) AS ksum, "
            f"CAST(max({s_k}) AS BIGINT) AS kmax, "
            "CAST(count(*) AS BIGINT) AS n "
            "FROM events GROUP BY event_type",
            "SELECT event_type, "
            f"CAST(sum({d_k}) AS BIGINT) AS ksum, "
            f"CAST(max({d_k}) AS BIGINT) AS kmax, "
            "CAST(count(*) AS BIGINT) AS n "
            "FROM events GROUP BY event_type",
        )
    missing = rng.choice(["$.nope", "$.k2"])
    return (
        f"SELECT event_id, coalesce(CAST(get_json_object(props, '{missing}') "
        f"AS BIGINT), -1) AS miss, {s_k} % {mod} AS kb FROM events "
        f"WHERE event_id % 3 = 0",
        f"SELECT event_id, coalesce(CAST(json_extract_string(props, "
        f"'{missing}') AS BIGINT), -1) AS miss, {d_k} % {mod} AS kb "
        f"FROM events WHERE event_id % 3 = 0",
    )


@pytest.mark.parametrize("seed", range(10))
def test_differential_json_funcs(spark, seed):
    from dbt_spark.session import read_parquet

    read_parquet(
        spark, os.path.join(SF_DIR, "events.parquet")
    ).createOrReplaceTempView("events")
    spark_sql, duck_sql = _gen_json_pair(seed)
    con = duckdb.connect()
    con.sql(
        "CREATE OR REPLACE VIEW events AS SELECT * FROM "
        f"'{os.path.join(SF_DIR, 'events.parquet')}'"
    )
    got = spark.sql(spark_sql).toPandas()
    want = con.sql(duck_sql).df()
    assert sorted(got.columns) == sorted(want.columns), spark_sql
    assert _canon(got) == _canon(want), f"seed={seed}: {spark_sql}"


# --------------------------------------------------------------------------
# LIKE / regexp predicate family — pattern-matching semantics shared by both
# engines (escape handling, anchors, char classes); regexp spelling differs
# (Spark rlike ~ DuckDB regexp_matches), rendered as pairs.
# --------------------------------------------------------------------------

def _gen_like_pair(seed: int) -> tuple[str, str]:
    rng = random.Random(80_000 + _OFF + seed)
    shape = rng.randrange(3)
    if shape == 0:
        pat = rng.choice(["%URGENT%", "_-HIGH", "%LOW", "1-%", "%E%T%"])
        neg = rng.choice(["", "NOT "])
        shared = (
            f"SELECT o_orderkey, o_orderpriority FROM orders "
            f"WHERE o_orderpriority {neg}LIKE '{pat}' "
            f"AND o_orderkey % {rng.randrange(3, 9)} = 0"
        )
        return shared, shared
    if shape == 1:
        rx = rng.choice(["^[12]-", "URGENT$", "H|L", "[A-Z]{4,}"])
        mod = rng.randrange(3, 9)
        return (
            f"SELECT o_orderkey, o_orderpriority rlike '{rx}' AS m "
            f"FROM orders WHERE o_orderkey % {mod} = 0",
            f"SELECT o_orderkey, regexp_matches(o_orderpriority, '{rx}') AS m "
            f"FROM orders WHERE o_orderkey % {mod} = 0",
        )
    # regex class escapes need DIALECT-SPECIFIC literals: Spark processes
    # backslash escapes inside single-quoted strings ('\\w' → \w) while
    # DuckDB's single-quoted strings are escape-free ('\w' IS \w) — a
    # shared literal silently changes the pattern on one side (caught by
    # the DBT_SPARK_FUZZ_OFFSET=777 rotation)
    grp_spark, grp_duck = rng.choice([
        ("([0-9])-", "([0-9])-"),
        ("-(\\\\w+)", "-(\\w+)"),
    ])
    mod = rng.randrange(3, 9)

    def q(grp):
        return (f"SELECT o_orderkey, "
                f"regexp_extract(o_orderpriority, '{grp}', 1) AS g "
                f"FROM orders WHERE o_orderkey % {mod} = 0")

    return q(grp_spark), q(grp_duck)


@pytest.mark.parametrize("seed", range(12))
def test_differential_like_regexp(spark, seed):
    load_tables(spark, SF_DIR, "orders")
    spark_sql, duck_sql = _gen_like_pair(seed)
    con = duckdb.connect()
    con.sql(
        "CREATE OR REPLACE VIEW orders AS SELECT * FROM "
        f"'{os.path.join(SF_DIR, 'orders.parquet')}'"
    )
    got = spark.sql(spark_sql).toPandas()
    want = con.sql(duck_sql).df()
    assert sorted(got.columns) == sorted(want.columns), spark_sql
    assert _canon(got) == _canon(want), f"seed={seed}: {spark_sql}"


# --------------------------------------------------------------------------
# Exact DECIMAL arithmetic. Inputs are fixed to scale 3 so one multiplication
# lands exactly on scale 6; every intermediate stays decimal-exact (no
# HALF_UP/HALF_EVEN tie divergence — the known cross-engine trap) and only
# the final render casts to DOUBLE (both engines round the same exact
# decimal to the same nearest double; DuckDB's pandas bridge returns
# float64 for decimals, so a decimal-typed output would str()-mismatch). Integer ops use Spark `div` / DuckDB `//` for floored quotients.
# --------------------------------------------------------------------------

def _gen_decimal_pair(seed: int) -> tuple[str, str]:
    rng = random.Random(80_000 + _OFF + seed)
    a, b = rng.sample(["o_totalprice", "o_totalprice * 0.5",
                       "o_totalprice - 1000"], 2)
    dec = "DECIMAL(18,3)"
    xa, xb = f"CAST({a} AS {dec})", f"CAST({b} AS {dec})"
    k = rng.randrange(2, 9)
    where = _atom(rng)
    exprs_s = [
        f"CAST({xa} + {xb} * {k} AS DOUBLE) AS e1",
        f"CAST(abs({xa} - {xb}) AS DOUBLE) AS e2",
        f"CAST(greatest({xa}, {xb}) AS DOUBLE) AS e3",
        f"CAST(sign({xa} - {xb}) AS BIGINT) AS e4",
        f"CAST(floor({xa}) AS BIGINT) AS e5",
        f"CAST(ceil({xb}) AS BIGINT) AS e6",
        f"CAST(o_orderkey % {k} AS BIGINT) AS e7",
        f"CAST(o_orderkey div {k} AS BIGINT) AS e8",
    ]
    exprs_d = [e.replace(" div ", " // ") for e in exprs_s]
    agg = rng.random() < 0.5
    if agg:
        s = (f"SELECT o_orderstatus, CAST(sum({xa} + {xb}) AS DOUBLE) "
             f"AS s1, CAST(count(*) AS BIGINT) AS c1 "
             f"FROM orders WHERE {where} GROUP BY o_orderstatus")
        return s, s
    sel_s = ", ".join(exprs_s)
    sel_d = ", ".join(exprs_d)
    return (
        f"SELECT o_orderkey, {sel_s} FROM orders WHERE {where}",
        f"SELECT o_orderkey, {sel_d} FROM orders WHERE {where}",
    )


@pytest.mark.parametrize("seed", range(15))
def test_differential_decimal_arithmetic(spark, seed):
    load_tables(spark, SF_DIR, "orders")
    spark_sql, duck_sql = _gen_decimal_pair(seed)
    con = duckdb.connect()
    con.sql(
        "CREATE OR REPLACE VIEW orders AS SELECT * FROM "
        f"'{os.path.join(SF_DIR, 'orders.parquet')}'"
    )
    got = spark.sql(spark_sql).toPandas()
    want = con.sql(duck_sql).df()
    assert sorted(got.columns) == sorted(want.columns), spark_sql
    assert _canon(got) == _canon(want), f"seed={seed}: {spark_sql}"


# --------------------------------------------------------------------------
# Locale-free string-function family: split_part / lpad / rpad / left /
# right / replace / instr / repeat / reverse / translate share names and
# semantics across both engines on ASCII inputs (no collation, no locale
# casing edge cases — o_orderpriority values are plain ASCII).
# --------------------------------------------------------------------------

def _gen_string_pair(seed: int) -> tuple[str, str]:
    rng = random.Random(90_000 + _OFF + seed)
    col = "o_orderpriority"
    n = rng.randrange(1, 4)
    pad = rng.randrange(6, 12)
    where = _atom(rng)
    exprs = [
        f"split_part({col}, '-', {n}) AS e1",
        f"lpad({col}, {pad}, '.') AS e2",
        f"rpad({col}, {pad}, '_') AS e3",
        f"left({col}, {n + 1}) AS e4",
        f"right({col}, {n + 2}) AS e5",
        f"replace({col}, '-', '/') AS e6",
        f"CAST(instr({col}, '-') AS BIGINT) AS e7",
        f"repeat(left({col}, 1), {n}) AS e8",
        f"reverse({col}) AS e9",
        f"translate({col}, '-E', '_e') AS e10",
    ]
    sel = ", ".join(rng.sample(exprs, 6))
    s = f"SELECT o_orderkey, {sel} FROM orders WHERE {where}"
    return s, s


@pytest.mark.parametrize("seed", range(12))
def test_differential_string_funcs2(spark, seed):
    load_tables(spark, SF_DIR, "orders")
    spark_sql, duck_sql = _gen_string_pair(seed)
    con = duckdb.connect()
    con.sql(
        "CREATE OR REPLACE VIEW orders AS SELECT * FROM "
        f"'{os.path.join(SF_DIR, 'orders.parquet')}'"
    )
    got = spark.sql(spark_sql).toPandas()
    want = con.sql(duck_sql).df()
    assert sorted(got.columns) == sorted(want.columns), spark_sql
    assert _canon(got) == _canon(want), f"seed={seed}: {spark_sql}"


# --------------------------------------------------------------------------
# Struct construction / field access / tuple comparison. Spark spells
# named_struct('k', x) / struct(x, y); DuckDB struct_pack(k := x) / ROW(x,
# y) — per-dialect pairs, scalar (non-struct) outputs so canonicalization
# stays engine-neutral.
# --------------------------------------------------------------------------

def _gen_struct_pair(seed: int) -> tuple[str, str]:
    rng = random.Random(95_000 + _OFF + seed)
    a, b = rng.sample(NUM_COLS, 2)
    cmp_op = rng.choice(["<", "<=", ">", ">=", "=", "!="])
    where = _atom(rng)
    s_cols = (
        f"CAST(named_struct('k', {a}, 'p', {b}).p AS DOUBLE) AS e1, "
        f"CASE WHEN struct(CAST({a} AS DOUBLE), CAST({b} AS DOUBLE)) {cmp_op} "
        f"struct(CAST({b} AS DOUBLE), CAST({a} AS DOUBLE)) "
        f"THEN 1 ELSE 0 END AS e2, "
        f"CAST(named_struct('o', named_struct('i', {a})).o.i AS DOUBLE) AS e3"
    )
    d_cols = (
        f"CAST(struct_pack(k := {a}, p := {b}).p AS DOUBLE) AS e1, "
        f"CASE WHEN ROW(CAST({a} AS DOUBLE), CAST({b} AS DOUBLE)) {cmp_op} "
        f"ROW(CAST({b} AS DOUBLE), CAST({a} AS DOUBLE)) "
        f"THEN 1 ELSE 0 END AS e2, "
        f"CAST(struct_pack(o := struct_pack(i := {a})).o.i AS DOUBLE) AS e3"
    )
    return (
        f"SELECT o_orderkey, {s_cols} FROM orders WHERE {where}",
        f"SELECT o_orderkey, {d_cols} FROM orders WHERE {where}",
    )


@pytest.mark.parametrize("seed", range(12))
def test_differential_struct_exprs(spark, seed):
    load_tables(spark, SF_DIR, "orders")
    spark_sql, duck_sql = _gen_struct_pair(seed)
    con = duckdb.connect()
    con.sql(
        "CREATE OR REPLACE VIEW orders AS SELECT * FROM "
        f"'{os.path.join(SF_DIR, 'orders.parquet')}'"
    )
    got = spark.sql(spark_sql).toPandas()
    want = con.sql(duck_sql).df()
    assert sorted(got.columns) == sorted(want.columns), spark_sql
    assert _canon(got) == _canon(want), f"seed={seed}: {spark_sql}"


# --------------------------------------------------------------------------
# Time-zone / DST family. Probed agreements (both engines ship IANA tzdata):
# UTC→local conversion (Spark from_utc_timestamp == DuckDB naive AT TIME
# ZONE 'UTC' AT TIME ZONE z), hour/date_trunc of the converted value,
# local→UTC for UNAMBIGUOUS local times, and epoch seconds — across DST
# start/end in both hemispheres and a half-hour-offset zone.
# Legitimate divergence (pinned in test_dst_overlap_divergence_pinned, kept
# OUT of the random family): a local time inside the DST fall-back overlap
# maps to two instants — Spark to_utc_timestamp picks the EARLIER (DST)
# offset, DuckDB AT TIME ZONE the LATER (standard) one.
# --------------------------------------------------------------------------

_TZ_ZONES = ["America/New_York", "Europe/Berlin", "Australia/Sydney",
             "Asia/Kolkata", "UTC"]
# UTC anchors that place the generated 0-96h window across a DST transition
_TZ_ANCHORS = [
    "2021-03-13 12:00:00",  # US spring-forward (Mar 14)
    "2021-11-06 12:00:00",  # US fall-back (Nov 7)
    "2021-03-27 12:00:00",  # EU spring-forward (Mar 28)
    "2021-10-30 12:00:00",  # EU fall-back (Oct 31)
    "2021-04-03 12:00:00",  # AU fall-back (Apr 4, southern hemisphere)
    "2021-10-02 12:00:00",  # AU spring-forward (Oct 3)
]


def _gen_tz_pair(seed: int) -> tuple[str, str]:
    rng = random.Random(130_000 + _OFF + seed)
    z = rng.choice(_TZ_ZONES)
    anchor = rng.choice(_TZ_ANCHORS)
    span = rng.randrange(48, 97)  # hours; crosses the transition
    k = rng.randrange(100, 400)
    base = (f"SELECT o_orderkey, TIMESTAMP '{anchor}' "
            f"+ make_interval(0, 0, 0, 0, CAST(o_orderkey % {span} AS INT), 0, 0) AS ts "
            f"FROM orders WHERE o_orderkey < {k}")
    d_base = (f"SELECT o_orderkey, TIMESTAMP '{anchor}' "
              f"+ to_hours(o_orderkey % {span}) AS ts "
              f"FROM orders WHERE o_orderkey < {k}")
    # local = utc→zone; noon = an always-unambiguous local instant
    # (transitions in the chosen zones happen 01:00-04:00 local)
    s_cols = (
        f"CAST(from_utc_timestamp(ts, '{z}') AS TIMESTAMP) AS lcl, "
        f"CAST(hour(from_utc_timestamp(ts, '{z}')) AS BIGINT) AS h, "
        f"CAST(date_trunc('DAY', from_utc_timestamp(ts, '{z}')) AS TIMESTAMP) AS ld, "
        f"CAST(unix_timestamp(ts) AS BIGINT) AS ep, "
        f"CAST(to_utc_timestamp(date_trunc('DAY', from_utc_timestamp(ts, '{z}')) "
        f"+ INTERVAL 12 HOURS, '{z}') AS TIMESTAMP) AS noon_utc"
    )
    d_cols = (
        f"CAST(ts AT TIME ZONE 'UTC' AT TIME ZONE '{z}' AS TIMESTAMP) AS lcl, "
        f"CAST(hour(ts AT TIME ZONE 'UTC' AT TIME ZONE '{z}') AS BIGINT) AS h, "
        f"CAST(date_trunc('day', ts AT TIME ZONE 'UTC' AT TIME ZONE '{z}') AS TIMESTAMP) AS ld, "
        f"CAST(epoch(ts) AS BIGINT) AS ep, "
        f"CAST((date_trunc('day', ts AT TIME ZONE 'UTC' AT TIME ZONE '{z}') "
        f"+ INTERVAL '12' HOUR) AT TIME ZONE '{z}' AT TIME ZONE 'UTC' AS TIMESTAMP) AS noon_utc"
    )
    return (f"SELECT o_orderkey, {s_cols} FROM ({base})",
            f"SELECT o_orderkey, {d_cols} FROM ({d_base})")


@pytest.mark.parametrize("seed", range(20))
def test_differential_timezone_dst(spark, seed):
    load_tables(spark, SF_DIR, "orders")
    spark_sql, duck_sql = _gen_tz_pair(seed)
    con = duckdb.connect()
    con.sql(
        "CREATE OR REPLACE VIEW orders AS SELECT * FROM "
        f"'{os.path.join(SF_DIR, 'orders.parquet')}'"
    )
    got = spark.sql(spark_sql).toPandas()
    want = con.sql(duck_sql).df()
    assert sorted(got.columns) == sorted(want.columns), spark_sql
    assert _canon(got) == _canon(want), f"seed={seed}: {spark_sql}"


def test_dst_overlap_divergence_pinned(spark):
    """The fall-back overlap hour has TWO valid UTC instants; the engines
    legitimately pick different ones (Spark: earlier/DST offset; DuckDB:
    later/standard offset). Pin both so a silent behavior change in either
    engine — or in this engine's future timestamp handling — surfaces."""
    t = "2021-11-07 01:30:00"  # America/New_York reads this twice
    s = spark.sql(
        f"SELECT CAST(to_utc_timestamp(TIMESTAMP '{t}', "
        "'America/New_York') AS TIMESTAMP) AS c").collect()[0]
    con = duckdb.connect()
    d = con.sql(
        f"SELECT CAST(TIMESTAMP '{t}' AT TIME ZONE 'America/New_York' "
        "AT TIME ZONE 'UTC' AS TIMESTAMP) AS c").df().iloc[0]
    assert str(s.c) == "2021-11-07 05:30:00"       # EDT (-04:00)
    assert str(d.c.to_pydatetime()) == "2021-11-07 06:30:00"  # EST (-05:00)


# --------------------------------------------------------------------------
# Unicode / collation family. Probed agreements: both engines compare and
# min/max strings by UTF-8 BINARY order (Spark UTF8_BINARY default collation,
# DuckDB memcmp), count length in CODEPOINTS (astral emoji = 1), and agree
# on substring/instr/lpad/rpad/reverse/concat over non-ASCII including
# surrogate-pair characters. Legitimate divergence (kept OUT of the random
# family, pinned below): full vs simple Unicode case mapping — Spark (Java)
# expands ß→SS / ﬁ→FI / ŉ→ʼN and lowers İ with a combining dot; DuckDB maps
# 1:1 (ß→ẞ, ﬁ→ﬁ). The random family uses case-safe alphabets for
# upper/lower and the full alphabet (divergent chars included) for binary
# comparison ops.
# --------------------------------------------------------------------------

_U_SAFE = ["a", "A", "z", "Z", "ä", "Ä", "é", "ñ", "ü", "Ωmega", "ωmega",
           "Ábc", "ábc", "naïve", "ı"]
_U_BINARY_ONLY = ["ß", "ẞ", "İ", "ﬁ", "ŉ", "maße", "MASSE", "中文字",
                  "日本語", "한국어", "😀😁x", "😀", "éé"]


def _gen_collation_pair(seed: int) -> tuple[str, str]:
    rng = random.Random(140_000 + _OFF + seed)
    pool = _U_SAFE + _U_BINARY_ONLY
    vals = rng.sample(pool, rng.randrange(6, min(14, len(pool))))
    case_vals = [v for v in vals if v in _U_SAFE] or [rng.choice(_U_SAFE)]
    vs = ", ".join(f"('{v}')" for v in vals)
    cs = ", ".join(f"('{v}')" for v in case_vals)
    pivot = rng.choice(["m", "z", "Ä", "中", "é"])
    common = (
        "SELECT CAST(min(s) AS {st}) AS mn, CAST(max(s) AS {st}) AS mx, "
        "CAST(sum(CASE WHEN s < '" + pivot + "' THEN 1 ELSE 0 END) AS BIGINT) AS n_lt, "
        "CAST(sum(length(s)) AS BIGINT) AS total_cp, "
        "CAST(max(substring(s, 1, 2)) AS {st}) AS mx_pre, "
        "CAST(min(reverse(s)) AS {st}) AS mn_rev "
        "FROM (VALUES " + vs + ") AS t(s)"
    )
    case_q = (
        "SELECT CAST(min(upper(s)) AS {st}) AS mn_up, "
        "CAST(max(lower(s)) AS {st}) AS mx_lo "
        "FROM (VALUES " + cs + ") AS t(s)"
    )
    s_sql = (f"SELECT * FROM ({common.format(st='STRING')}) "
             f"CROSS JOIN ({case_q.format(st='STRING')})")
    d_sql = (f"SELECT * FROM ({common.format(st='VARCHAR')}) "
             f"CROSS JOIN ({case_q.format(st='VARCHAR')})")
    return s_sql, d_sql


@pytest.mark.parametrize("seed", range(20))
def test_differential_unicode_collation(spark, seed):
    spark_sql, duck_sql = _gen_collation_pair(seed)
    con = duckdb.connect()
    got = spark.sql(spark_sql).toPandas()
    want = con.sql(duck_sql).df()
    assert sorted(got.columns) == sorted(want.columns), spark_sql
    assert _canon(got) == _canon(want), f"seed={seed}: {spark_sql}"


def test_unicode_case_mapping_divergence_pinned(spark):
    """Full (Spark/Java) vs simple (DuckDB) Unicode case mapping — the
    dialect divergence the collation family must exclude; pin it."""
    s = spark.sql("SELECT upper('ß') a, upper('ﬁ') b, lower('İ') c").collect()[0]
    con = duckdb.connect()
    d = con.sql("SELECT upper('ß') a, upper('ﬁ') b, lower('İ') c").df().iloc[0]
    assert (s.a, s.b) == ("SS", "FI")      # full mapping expands
    assert (d.a, d.b) == ("ẞ", "ﬁ")        # simple mapping is 1:1
    assert s.c != d.c                       # İ lowers with/without combining dot


# --------------------------------------------------------------------------
# Ordered-set aggregate family: PERCENTILE_DISC(p) WITHIN GROUP and MEDIAN —
# the SQL-standard discrete percentile (smallest value with cume_dist >= p,
# an ACTUAL data value → exactly comparable) is newly load-bearing for the
# semantic layer's use_discrete_percentile measures. MEDIAN (continuous,
# interpolated midpoint) rounds to 6 dp — both engines interpolate the same
# two order statistics, divergence is FP-ulp only.
# --------------------------------------------------------------------------

def _gen_ordered_set_pair(seed: int) -> tuple[str, str]:
    rng = random.Random(101_000 + _OFF + seed)
    p = rng.choice([0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    col = rng.choice(["o_totalprice", "o_orderkey", "o_custkey"])
    grp = rng.choice(["o_orderstatus", "o_orderpriority"])
    where = _atom(rng)
    # CAST pd to DOUBLE: the discrete percentile IS an exact data value,
    # but Spark types the aggregate DOUBLE while DuckDB keeps the input's
    # BIGINT — same value, different render without the cast
    s = (
        f"SELECT {grp} AS g, "
        f"CAST(PERCENTILE_DISC({p}) WITHIN GROUP (ORDER BY {col}) "
        f"AS DOUBLE) AS pd, "
        f"round(CAST(MEDIAN({col}) AS DOUBLE), 6) AS med, "
        f"CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM orders WHERE {where} GROUP BY {grp}"
    )
    return s, s


@pytest.mark.parametrize("seed", range(12))
def test_differential_ordered_set_aggs(spark, seed):
    load_tables(spark, SF_DIR, "orders")
    spark_sql, duck_sql = _gen_ordered_set_pair(seed)
    con = duckdb.connect()
    con.sql(
        "CREATE OR REPLACE VIEW orders AS SELECT * FROM "
        f"'{os.path.join(SF_DIR, 'orders.parquet')}'"
    )
    got = spark.sql(spark_sql).toPandas()
    want = con.sql(duck_sql).df()
    assert sorted(got.columns) == sorted(want.columns), spark_sql
    assert _canon(got) == _canon(want), f"seed={seed}: {spark_sql}"
