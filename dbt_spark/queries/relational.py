"""Relational operator inventory (SURVEY.md §2E) as (spark, sf_dir) -> DataFrame.

Each query here is the Spark-first realization of an operator dbt delegates to
the warehouse (reference cites in SURVEY.md §2E — e.g. joins/aggregates from
``tests/fixtures/jaffle_shop.py:29-73``, pivot from ``jaffle_shop.py:98+``,
union-all from ``performance/projects/01_2000_simple_models``). The paired
ANSI-SQL oracle (ORACLES) is run by DuckDB on the same parquet.

Determinism contract with the oracle (hash-exact, order-insensitive):
- monetary aggregations cast to DECIMAL(18,2/4) first (exact, order-independent
  sums), final result cast back to DOUBLE;
- every computed integer cast to BIGINT (DuckDB's count/extract/length width);
- windows and LIMIT always carry a unique tie-break key.

Scale notes: all queries are pure DataFrame plans — Catalyst pushes filters and
column pruning into the parquet scan, AQE picks broadcast vs shuffle joins at
runtime. Explicit ``F.broadcast`` marks the dimension sides that will always be
small at any SF (region/nation: fixed cardinality 5/25).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from dbt_spark.session import load_tables


def _dec(col: str, scale: int = 2) -> Column:
    return F.col(col).cast(f"decimal(18,{scale})")


def _dsum(col: str, scale: int = 2) -> Column:
    """Exact (order-independent) sum of a monetary double, as double."""
    return F.sum(_dec(col, scale)).cast("double")


# --------------------------------------------------------------------------
# scan / project / filter
# --------------------------------------------------------------------------

def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") < F.lit("1995-03-15").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


# --------------------------------------------------------------------------
# hash aggregate (TPC-H Q1 pricing summary shape)
# --------------------------------------------------------------------------

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    charge = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")) * (
        F.lit(1) + _dec("l_tax")
    )
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def agg_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_custs"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            _dsum("o_totalprice").alias("sum_price"),
            (F.sum(_dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
        )
    )


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------

def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"), "inner")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
            _dsum("o_totalprice").alias("revenue"),
        )
    )


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no 1998+ orders — the `relationships`-test anti-join shape."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    recent = t["orders"].filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    return (
        t["customer"]
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    recent = t["orders"].filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
    return (
        t["customer"]
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ nation ⋈ region with broadcast dims (fixed-cardinality sides)."""
    t = load_tables(spark, sf_dir, "customer", "nation", "region")
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum("c_acctbal").alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# pivot via conditional aggregation (jaffle_shop orders.sql idiom)
# --------------------------------------------------------------------------

ORDER_STATUSES = ["O", "F", "P"]


def pivot_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    aggs = [
        F.sum(F.when(F.col("o_orderstatus") == s, _dec("o_totalprice")).otherwise(F.lit(0)))
        .cast("double")
        .alias(f"amount_{s.lower()}")
        for s in ORDER_STATUSES
    ]
    aggs.append(F.count(F.lit(1)).alias("n_orders"))
    return t["orders"].groupBy("o_orderpriority").agg(*aggs)


# --------------------------------------------------------------------------
# set operators
# --------------------------------------------------------------------------

def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    a = t["orders"].filter(F.col("o_orderdate") < F.lit("1994-01-01").cast("timestamp")).select(
        "o_orderkey", "o_orderstatus"
    )
    b = t["orders"].filter(F.col("o_totalprice") > 150000).select("o_orderkey", "o_orderstatus")
    return a.unionAll(b)


def distinct_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem")
    return t["lineitem"].select("l_returnflag", "l_linestatus").distinct()


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    building = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    with_orders = t["orders"].select(F.col("o_custkey").alias("c_custkey"))
    return building.intersect(with_orders)


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    all_custs = t["customer"].select("c_custkey")
    with_orders = (
        t["orders"]
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return all_custs.exceptAll(with_orders).distinct()


# --------------------------------------------------------------------------
# sort / limit (deterministic via unique tie-break)
# --------------------------------------------------------------------------

def orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


def orderby_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT + OFFSET pagination (deterministic: total order via unique
    tie-break). At scale a TakeOrderedAndProject keeps only offset+limit rows
    per partition — no global sort materialization."""
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(20)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# window functions
# --------------------------------------------------------------------------

def window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "rn")
    )


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        )
        .cast("bigint")
        .alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: 30-day trailing spend per customer —
    the calendar-interval window frame (RANGE BETWEEN INTERVAL ... PRECEDING)
    Spark executes natively in one window exchange."""
    load_tables(spark, sf_dir, "orders")
    return spark.sql("""
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS trailing_30d_spend
        FROM orders
    """)


def agg_bitwise_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_and/bit_or/bit_xor) + ordered string
    aggregation (sort_array→array_join, the deterministic LISTAGG shape)."""
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.bit_and("o_orderkey").cast("bigint").alias("key_bit_and"),
            F.bit_or("o_orderkey").cast("bigint").alias("key_bit_or"),
            F.bit_xor("o_orderkey").cast("bigint").alias("key_bit_xor"),
            F.array_join(
                F.sort_array(F.collect_set("o_orderpriority")), ","
            ).alias("priorities"),
        )
        .orderBy("o_orderstatus")
    )


def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-customer aggregates → long (metric, value)
    rows via Spark's native unpivot — the inverse of the conditional pivot.
    One aggregate exchange; the unpivot itself is a zero-shuffle Expand."""
    t = load_tables(spark, sf_dir, "orders")
    wide = (
        t["orders"]
        .filter(F.col("o_custkey") < 200)
        .groupBy("o_custkey")
        .agg(
            F.count("*").cast("double").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_spend"),
            F.max(_dec("o_totalprice")).cast("double").alias("max_order"),
        )
    )
    return (
        wide.unpivot(
            "o_custkey",
            ["n_orders", "total_spend", "max_order"],
            "metric",
            "value",
        )
        .orderBy("o_custkey", "metric")
    )


def regexp_extract_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface: extract, extract-all + flatten count, replace — over
    part names. All codegen'd JVM regex; one scan, no shuffle before the agg."""
    t = load_tables(spark, sf_dir, "part")
    return (
        t["part"]
        .select(
            "p_partkey",
            F.regexp_extract("p_name", r"(\w+)", 1).alias("first_word"),
            F.size(F.regexp_extract_all("p_name", F.lit(r"(\w+)"), 1))
            .cast("bigint")
            .alias("n_words"),
            F.regexp_replace("p_name", r"\s+", "_").alias("snake_name"),
        )
        .orderBy("p_partkey")
    )


def json_extract_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ops over the events.props JSON column: path extraction
    (get_json_object), typed parse (from_json), and aggregation on the
    extracted value. JSON parsing is JVM-side codegen — the scan reads only
    (event_type, props) and the whole pipeline is one partial-agg exchange."""
    t = load_tables(spark, sf_dir, "events")
    parsed = t["events"].select(
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_path"),
        F.from_json("props", "struct<k:bigint>").getField("k").alias("k_typed"),
    )
    return (
        parsed.filter(F.col("k_path") == F.col("k_typed"))  # both APIs agree
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("k_typed").cast("bigint").alias("sum_k"),
            F.min("k_typed").cast("bigint").alias("min_k"),
            F.max("k_typed").cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )


def agg_array_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted array aggregation per group (collect_list + sort_array),
    serialized to a CSV string so the result survives any hasher that
    cannot canonicalize array-typed cells (deterministic despite
    unordered shuffle arrival)."""
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 100)
        .groupBy("o_custkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("o_orderkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("order_keys"),
            F.count("*").cast("bigint").alias("n"),
        )
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# CTE composition (jaffle_shop `customers` model shape)
# --------------------------------------------------------------------------

def cte_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH order_stats AS (...), spend AS (...) SELECT ... — expressed as
    DataFrame composition; Catalyst inlines exactly like dbt's ephemeral CTEs."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    order_stats = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.min(F.col("o_orderdate")).alias("first_order"),
            F.max(F.col("o_orderdate")).alias("most_recent_order"),
            F.count(F.lit(1)).alias("number_of_orders"),
            _dsum("o_totalprice").alias("customer_lifetime_value"),
        )
    )
    return (
        t["customer"]
        .join(order_stats, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "c_name",
            "first_order",
            "most_recent_order",
            F.coalesce(F.col("number_of_orders"), F.lit(0)).cast("bigint").alias(
                "number_of_orders"
            ),
            F.coalesce(F.col("customer_lifetime_value"), F.lit(0.0)).alias(
                "customer_lifetime_value"
            ),
        )
    )


# --------------------------------------------------------------------------
# grouping sets / rollup / cube
# --------------------------------------------------------------------------

def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"), _dsum("l_quantity").alias("sum_qty"))
    )


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# scalar functions
# --------------------------------------------------------------------------

def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "part")
    return t["part"].select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.substring(F.col("p_name"), 1, 10).alias("name_prefix"),
        F.length(F.col("p_name")).cast("bigint").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.md5(F.col("p_name")).alias("name_md5"),
        (F.col("p_partkey") % 7).cast("bigint").alias("key_mod7"),
        F.floor(F.col("p_retailprice")).cast("bigint").alias("price_floor"),
    )


def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    return t["orders"].select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("bigint")
        .alias("days_to_eoy"),
    )


# --------------------------------------------------------------------------
# approximate aggregation (engine capability; no exact oracle by construction)
# --------------------------------------------------------------------------

def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct at the DEFAULT precision (rsd=0.05), verified by
    contract: HLL++ sketch estimates are engine-specific, so instead of
    hash-comparing the raw estimate across engines the output carries the
    exact distinct count plus a flag that the estimate landed inside a
    4-sigma 20% band. The oracle asserts the flag is true, which makes the
    approximate operator itself driver-checkable (mirrors
    approx_distinct_bounded, which exercises the tuned rsd=0.02 path on a
    different column)."""
    t = load_tables(spark, sf_dir, "lineitem")
    # exact and sketch in SEPARATE aggregates joined on the group key:
    # mixing countDistinct with a regular aggregate forces Spark's Expand
    # plan (rows replicated per aggregate family through the shuffle);
    # split, each exchange carries only partials and the join input is
    # group-key cardinality
    li = t["lineitem"]
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").cast("bigint").alias("exact_supps"))
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey").alias("approx_supps"))
    return (
        exact.join(F.broadcast(approx), "l_returnflag")
        .select(
            "l_returnflag",
            "exact_supps",
            (
                F.abs(F.col("approx_supps") - F.col("exact_supps"))
                <= F.col("exact_supps") * 0.20
            ).alias("within_bound"),
        )
        .orderBy("l_returnflag")
    )


def approx_distinct_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct verified against its own contract: the output is
    the EXACT distinct count plus a flag that the HLL++ estimate (rsd=0.02)
    landed within a 4-sigma 8% band — so the approximate operator IS
    oracle-checked (the oracle states the flag must be true), without
    hash-comparing sketch internals across engines."""
    t = load_tables(spark, sf_dir, "lineitem")
    # split aggregates for the same no-Expand reason as approx_distinct
    li = t["lineitem"]
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("bigint").alias("exact_parts"))
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"))
    return (
        exact.join(F.broadcast(approx), "l_returnflag")
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= F.col("exact_parts") * 0.08
            ).alias("within_bound"),
        )
        .orderBy("l_returnflag")
    )


def hll_sketch_union_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches HLL with MERGEABILITY proven: per-group hll_sketch_agg
    (lgConfigK=14, rsd ~0.8%), then hll_union_agg merges the group sketches
    into the global estimate — exactly how 1000 executors' partial sketches
    combine at 100 TB (fixed-size state, one tiny exchange). Contract
    oracle: every estimate (per group AND the merged total) within a
    5-sigma-ish 5% band of the exact distinct count."""
    t = load_tables(spark, sf_dir, "lineitem")
    per = t["lineitem"].groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("bigint").alias("exact_parts"),
        F.expr("hll_sketch_agg(l_partkey, 14)").alias("sk"),
    )
    groups = per.select(
        F.col("l_returnflag").alias("flag"),
        "exact_parts",
        F.expr("hll_sketch_estimate(sk)").cast("bigint").alias("est"),
    )
    total = (
        per.agg(
            F.sum(F.lit(0)).alias("__z"),  # keep a single-row aggregate
            F.expr("hll_sketch_estimate(hll_union_agg(sk))")
            .cast("bigint").alias("est"),
        ).crossJoin(
            t["lineitem"].agg(
                F.countDistinct("l_partkey").cast("bigint").alias("exact_parts"))
        ).select(F.lit("ALL").alias("flag"), "exact_parts", "est")
    )
    return groups.unionByName(total).select(
        "flag", "exact_parts",
        (F.abs(F.col("est") - F.col("exact_parts"))
         <= F.col("exact_parts") * 0.05).alias("within_bound"),
    ).orderBy("flag")


# --------------------------------------------------------------------------
# full-outer / cross joins
# --------------------------------------------------------------------------

def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two pre-aggregated sides (customer vs supplier per nation).

    Scale note: both sides are aggregated to |nation| rows before the join, so
    the full-outer itself is a broadcastable 25-row join at any SF — the heavy
    lifting is the two partial-aggregate shuffles, which AQE coalesces.
    """
    t = load_tables(spark, sf_dir, "customer", "supplier")
    c = t["customer"].groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_customers"))
    s = t["supplier"].groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_suppliers"))
    return (
        c.join(s, c["c_nationkey"] == s["s_nationkey"], "full_outer")
        .select(
            F.coalesce(c["c_nationkey"], s["s_nationkey"]).alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny dims (region × distinct order status)."""
    t = load_tables(spark, sf_dir, "region", "orders")
    statuses = t["orders"].select("o_orderstatus").distinct()
    return t["region"].select("r_name").crossJoin(statuses)


# --------------------------------------------------------------------------
# TPC-H-shaped analytics (Q3 / Q5 / Q10) — the multi-join benchmark shapes
# --------------------------------------------------------------------------

def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filtered both sides, top-10 by revenue.

    Scale: filters reach the parquet scans (segment, two date predicates) before
    the orderkey shuffle join; the final top-10 is a TakeOrdered, no full sort.
    """
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1995-03-15").cast("timestamp")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join keeping only same-nation customer/supplier pairs.

    Scale: region/nation are `F.broadcast` (fixed cardinality 5/25); the
    customer→orders and orders→lineitem joins shuffle on their keys; the
    supplier join carries the c_nationkey = s_nationkey residual.
    """
    t = load_tables(spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join then priority counts (adapted to this
    schema: the exists predicate is l_shipdate > o_orderdate — the testdata
    lacks commit/receipt dates).

    Scale: a literal semi-join can never broadcast here (the build side of a
    left-semi is the filter side — the full lineitem), so it sort-merges both
    inputs. Instead EXISTS(l_shipdate > o_orderdate) is rewritten as
    max(l_shipdate) per order > o_orderdate: ONE lineitem hash aggregate
    (map-side partials shrink the exchange to distinct orderkeys) and then a
    broadcast inner join against the date-filtered orders (the small side) —
    no lineitem sort, no orders shuffle.
    """
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    last_ship = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_shipdate"))
    )
    # no broadcast hint: AQE broadcasts the date-filtered orders when its
    # runtime size fits (true at any sane orders:window ratio) and falls back
    # to a shuffled join when it doesn't — a forced hint would OOM at 100 TB
    return (
        last_ship.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("max_shipdate") > F.col("o_orderdate")),
            "inner",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue between two nations by direction and year.

    Scale: nation is broadcast to BOTH sides; the only big shuffles are the
    customer→orders and orders→lineitem equi-joins; year extraction stays in
    codegen.
    """
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("cust_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's share of regional revenue per year —
    conditional-sum ratio over a 6-way join.

    Scale: region/nation broadcast; numerator/denominator computed in ONE
    aggregation pass (sum(when) / sum), no self-join.
    """
    t = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region", "part"
    )
    disc_price = (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("volume")
    n_cust = t["nation"].select(
        F.col("n_nationkey").alias("cn_nk"), F.col("n_regionkey").alias("cn_rk")
    )
    n_supp = t["nation"].select(
        F.col("n_nationkey").alias("sn_nk"), F.col("n_name").alias("supp_nation")
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("p_type").startswith("SMALL"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_nk"))
        .join(F.broadcast(t["region"]), F.col("cn_rk") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_nk"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            # exact decimal sums; the ratio is IEEE double-divided so both
            # engines round identically
            (
                F.sum(F.when(F.col("supp_nation") == "GERMANY", disc_price)
                      .otherwise(F.lit(0).cast("decimal(18,2)"))).cast("double")
                / F.sum(disc_price).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue percentage — conditional ratio after a
    part join over one month of lineitem."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
        )
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), disc_price)
                        .otherwise(F.lit(0).cast("decimal(18,2)"))).cast("double")
                / F.sum(disc_price).cast("double")
            ).alias("promo_revenue")
        )
    )


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold —
    GROUP BY + HAVING feeding a semi-join back to the detail.

    Scale: the HAVING aggregate runs first and is tiny (big-quantity keys),
    so the back-join broadcasts the qualifying keys.
    """
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
        .select("l_orderkey", "sum_qty")
    )
    return (
        t["orders"]
        .join(big.withColumnRenamed("l_orderkey", "bk"), F.col("o_orderkey") == F.col("bk"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.col("sum_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def tpch_q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of brand/size/quantity band predicates
    evaluated inside one part join (adapted: no container column).

    Scale: the equi-join key (partkey) is extracted from the OR'd predicate so
    Catalyst still plans a hash join; the residual disjunction is a post-join
    filter in codegen — never a cartesian.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    band = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    ) | (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    ) | (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 30))
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )


def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich customers with no orders — scalar-average
    subquery + anti-join, grouped by nation bucket (adapted: nationkey stands
    in for the phone country code).

    Scale: the scalar avg is one tiny aggregate broadcast into the filter; the
    anti-join shuffles on custkey once.
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg(F.avg(_dec("c_acctbal", 4)).alias("avg_bal"))
    )
    # "no recent orders": every synthetic customer has SOME order, so the
    # anti-join is against the recent window (keeps the Q22 shape non-empty)
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return (
        t["customer"]
        .join(F.broadcast(avg_bal))
        .filter(_dec("c_acctbal", 4) > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("bigint").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal", 4)).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# --------------------------------------------------------------------------
# ranking windows / exact percentiles / arrays / null-handling / explode
# --------------------------------------------------------------------------

def window_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank / percent_rank / cume_dist / ntile over a deterministic order."""
    t = load_tables(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        t["orders"]
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.dense_rank().over(w).cast("bigint").alias("price_dense_rank"),
            F.percent_rank().over(w).alias("price_percent_rank"),
            F.cume_dist().over(w).alias("price_cume_dist"),
            F.ntile(4).over(w).cast("bigint").alias("price_quartile"),
        )
        .filter(F.col("price_dense_rank") <= 100)
    )


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (median/p25/p75) per group."""
    t = load_tables(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(CAST(l_quantity AS DOUBLE), 0.25)").alias("p25_qty"),
            F.expr("percentile(CAST(l_quantity AS DOUBLE), 0.5)").alias("median_qty"),
            F.expr("percentile(CAST(l_quantity AS DOUBLE), 0.75)").alias("p75_qty"),
            F.min(q).alias("min_qty"),
            F.max(q).alias("max_qty"),
        )
    )


def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops incl. higher-order transform over the embedding column.

    Only order-independent reductions (max/min of a transformed array) are used
    so the oracle comparison stays bit-exact regardless of accumulation order.
    """
    t = load_tables(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return t["embeddings"].select(
        "vec_id",
        F.size(emb).cast("bigint").alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_val"),
        F.array_max(emb).cast("double").alias("max_val"),
        F.array_min(emb).cast("double").alias("min_val"),
        F.array_max(F.transform(emb, lambda x: F.abs(x))).cast("double").alias("max_abs"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("bigint").alias("n_positive"),
    )


def null_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE / NULLIF / CASE / LEAST / GREATEST over customer."""
    t = load_tables(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return t["customer"].select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("(masked)"))
        .alias("segment_masked"),
        F.when(bal < 0, "overdrawn").when(bal < 5000, "standard").otherwise("premium")
        .alias("balance_tier"),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(1000.0)).alias("bal_cap1000"),
    )


def explode_split_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode of split() output — word frequency over part names."""
    t = load_tables(spark, sf_dir, "part")
    return (
        t["part"]
        .select(F.explode(F.split(F.col("p_name"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

_Q1_DISC = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

ORACLES: dict[str, str] = {
    "scan_filter_project": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-03-15'
    """,
    "pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM({_Q1_DISC}) AS DOUBLE) AS sum_disc_price,
               CAST(SUM({_Q1_DISC} * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "agg_funcs": """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT o_custkey) AS n_custs,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        FROM orders GROUP BY o_orderpriority
    """,
    "join_inner": f"""
        SELECT o_orderpriority,
               CAST(SUM({_Q1_DISC}) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    "join_left": """
        SELECT c_mktsegment,
               COUNT(o_orderkey) AS n_orders,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1998-01-01')
    """,
    "join_semi": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1997-01-01')
    """,
    "join_multiway": """
        SELECT r_name,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "pivot_conditional": """
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'O'
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS amount_o,
               CAST(SUM(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS amount_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'P'
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS amount_p,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
    "union_all": """
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE o_orderdate < TIMESTAMP '1994-01-01'
        UNION ALL
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 150000
    """,
    "distinct_op": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "set_intersect": """
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS c_custkey FROM orders
    """,
    "set_except": """
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    """,
    "orderby_limit": """
        SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "window_row_number": """
        SELECT o_custkey, o_orderkey, rn FROM (
            SELECT o_custkey, o_orderkey,
                   CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
            FROM orders) t
        WHERE rn <= 2
    """,
    "window_lag_lead": """
        SELECT o_orderkey, o_custkey,
               CAST(DATE_DIFF('day',
                    LAG(CAST(o_orderdate AS DATE)) OVER w,
                    CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev,
               LEAD(o_orderkey) OVER w AS next_orderkey
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "window_running_sum": """
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                    AS running_spend
        FROM orders
    """,
    "cte_composition": """
        WITH order_stats AS (
            SELECT o_custkey,
                   MIN(o_orderdate) AS first_order,
                   MAX(o_orderdate) AS most_recent_order,
                   COUNT(*) AS number_of_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS customer_lifetime_value
            FROM orders GROUP BY o_custkey
        )
        SELECT c_custkey, c_name, first_order, most_recent_order,
               CAST(COALESCE(number_of_orders, 0) AS BIGINT) AS number_of_orders,
               COALESCE(customer_lifetime_value, 0.0) AS customer_lifetime_value
        FROM customer LEFT JOIN order_stats ON c_custkey = o_custkey
    """,
    "rollup_agg": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_agg": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "scalar_string_funcs": """
        SELECT p_partkey,
               UPPER(p_brand) AS brand_upper,
               SUBSTRING(p_name, 1, 10) AS name_prefix,
               CAST(LENGTH(p_name) AS BIGINT) AS name_len,
               REPLACE(p_type, ' ', '_') AS type_snake,
               CONCAT_WS('|', p_brand, p_type) AS brand_type,
               MD5(p_name) AS name_md5,
               CAST(p_partkey % 7 AS BIGINT) AS key_mod7,
               CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor
        FROM part
    """,
    "scalar_date_funcs": """
        SELECT o_orderkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
               DATE_TRUNC('month', o_orderdate) AS month_start,
               CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT)
                   AS days_to_eoy
        FROM orders
    """,
    "subquery_ops": """
        SELECT c.c_custkey, c.c_name,
               CAST((SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,2)))
                     FROM orders o2) AS DOUBLE)
                   / (SELECT COUNT(*) FROM orders) AS global_avg_price
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000)
          AND c.c_nationkey IN (SELECT n_nationkey FROM nation
                                WHERE n_regionkey <= 2)
    """,
    "agg_salted_twophase": """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
    """,
    "agg_bitwise_stringagg": """
        SELECT o_orderstatus,
               CAST(BIT_AND(o_orderkey) AS BIGINT) AS key_bit_and,
               CAST(BIT_OR(o_orderkey) AS BIGINT) AS key_bit_or,
               CAST(BIT_XOR(o_orderkey) AS BIGINT) AS key_bit_xor,
               list_aggregate(list_sort(list(DISTINCT o_orderpriority)), 'string_agg', ',')
                   AS priorities
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "unpivot_melt": """
        WITH wide AS (
            SELECT o_custkey,
                   CAST(COUNT(*) AS DOUBLE) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
                   CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_order
            FROM orders WHERE o_custkey < 200 GROUP BY o_custkey
        )
        SELECT o_custkey, metric, value FROM (
            SELECT o_custkey, 'n_orders' AS metric, n_orders AS value FROM wide
            UNION ALL
            SELECT o_custkey, 'total_spend', total_spend FROM wide
            UNION ALL
            SELECT o_custkey, 'max_order', max_order FROM wide
        ) ORDER BY o_custkey, metric
    """,
    "regexp_extract_ops": r"""
        SELECT p_partkey,
               coalesce(regexp_extract(p_name, '(\w+)', 1), '') AS first_word,
               CAST(len(regexp_extract_all(p_name, '(\w+)', 1)) AS BIGINT) AS n_words,
               regexp_replace(p_name, '\s+', '_', 'g') AS snake_name
        FROM part ORDER BY p_partkey
    """,
    "json_extract_ops": """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
               CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """,
    "window_range_frame": """
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS trailing_30d_spend
        FROM orders
    """,
    "agg_array_collect": """
        SELECT o_custkey,
               string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
                   AS order_keys,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders WHERE o_custkey < 100
        GROUP BY o_custkey ORDER BY o_custkey
    """,
    "orderby_limit_offset": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10 OFFSET 20
    """,
    "hll_sketch_union_bounded": """
        WITH g AS (
            SELECT l_returnflag AS flag,
                   CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts
            FROM lineitem GROUP BY 1
        ),
        a AS (
            SELECT 'ALL' AS flag,
                   CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts
            FROM lineitem
        )
        SELECT flag, exact_parts, TRUE AS within_bound
        FROM (SELECT * FROM g UNION ALL SELECT * FROM a) u
        ORDER BY flag
    """,
    "approx_distinct_bounded": """
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               TRUE AS within_bound
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "join_skew_salted": """
        SELECT upper(event_type) AS label,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    "grouping_sets_agg": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
    """,
    "join_asof": """
        SELECT e.event_id, e.user_id, e.ts,
               (SELECT o.o_orderkey FROM orders o
                WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1)
                   AS asof_orderkey,
               (SELECT o.o_totalprice FROM orders o
                WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1)
                   AS asof_totalprice
        FROM events e
    """,
    "join_range": """
        WITH bands(band, lo, hi) AS (
            VALUES ('P0_50K', 0.0, 50000.0), ('P50_150K', 50000.0, 150000.0),
                   ('P150_300K', 150000.0, 300000.0), ('P300K_PLUS', 300000.0, 1e12)
        )
        SELECT band, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders JOIN bands
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band
    """,
    "approx_distinct": """
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
               TRUE AS within_bound
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "join_full_outer": """
        SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
               COALESCE(n_customers, 0) AS n_customers,
               COALESCE(n_suppliers, 0) AS n_suppliers
        FROM (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers
              FROM customer GROUP BY c_nationkey) c
        FULL OUTER JOIN
             (SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers
              FROM supplier GROUP BY s_nationkey) s
          ON c.c_nationkey = s.s_nationkey
    """,
    "join_cross": """
        SELECT r_name, o_orderstatus
        FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) st
    """,
    "tpch_q3_shipping_priority": f"""
        SELECT l_orderkey, o_orderdate, CAST(SUM({_Q1_DISC}) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
        LIMIT 10
    """,
    "tpch_q5_local_supplier": f"""
        SELECT n_name, CAST(SUM({_Q1_DISC}) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1994-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
        GROUP BY n_name
    """,
    "tpch_q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(SUM({_Q1_DISC}) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1995-10-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "tpch_q4_order_priority": """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-07-01'
          AND o_orderdate < TIMESTAMP '1995-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "tpch_q7_volume_shipping": f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(volume) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                   {_Q1_DISC} AS volume
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "tpch_q8_market_share": f"""
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'GERMANY' THEN volume
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        FROM (
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                   {_Q1_DISC} AS volume, n2.n_name AS supp_nation
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'EUROPE' AND p_type LIKE 'SMALL%'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year
    """,
    "tpch_q14_promo_revenue": f"""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_Q1_DISC}
                                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                    / CAST(SUM({_Q1_DISC}) AS DOUBLE) AS promo_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01'
          AND l_shipdate < TIMESTAMP '1995-10-01'
    """,
    "tpch_q18_large_orders": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(big.sum_qty AS DOUBLE) AS total_qty
        FROM orders
        JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150) big
          ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    "tpch_q19_disjunctive_join": f"""
        SELECT CAST(SUM({_Q1_DISC}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q22_global_sales_opportunity": """
        SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE CAST(c_acctbal AS DECIMAL(18,4)) >
              (SELECT AVG(CAST(c_acctbal AS DECIMAL(18,4))) FROM customer
               WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2001-01-01')
        GROUP BY cntrycode
        ORDER BY cntrycode
    """,
    "window_rank_funcs": """
        SELECT * FROM (
            SELECT o_orderkey, o_orderpriority,
                   CAST(DENSE_RANK() OVER w AS BIGINT) AS price_dense_rank,
                   PERCENT_RANK() OVER w AS price_percent_rank,
                   CUME_DIST() OVER w AS price_cume_dist,
                   CAST(NTILE(4) OVER w AS BIGINT) AS price_quartile
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice DESC, o_orderkey ASC)
        ) ranked WHERE price_dense_rank <= 100
    """,
    "agg_percentiles": """
        SELECT l_returnflag,
               quantile_cont(CAST(l_quantity AS DOUBLE), 0.25) AS p25_qty,
               quantile_cont(CAST(l_quantity AS DOUBLE), 0.5)  AS median_qty,
               quantile_cont(CAST(l_quantity AS DOUBLE), 0.75) AS p75_qty,
               MIN(CAST(l_quantity AS DOUBLE)) AS min_qty,
               MAX(CAST(l_quantity AS DOUBLE)) AS max_qty
        FROM lineitem GROUP BY l_returnflag
    """,
    "array_funcs": """
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_val,
               CAST(list_max(embedding) AS DOUBLE) AS max_val,
               CAST(list_min(embedding) AS DOUBLE) AS min_val,
               CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS max_abs,
               CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
        FROM embeddings
    """,
    "null_conditional_funcs": """
        SELECT c_custkey,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(masked)') AS segment_masked,
               CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                    WHEN c_acctbal < 5000 THEN 'standard'
                    ELSE 'premium' END AS balance_tier,
               GREATEST(c_acctbal, 0.0) AS bal_floor0,
               LEAST(c_acctbal, 1000.0) AS bal_cap1000
        FROM customer
    """,
    "explode_split_tokens": """
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part) t
        GROUP BY word
    """,
}



# --------------------------------------------------------------------------
# as-of join & range (theta) join — engine capabilities beyond the reference
# (SURVEY §2E last row; Spark-first implementations)
# --------------------------------------------------------------------------

def subquery_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + uncorrelated IN + scalar subquery in one query —
    Catalyst decorrelates EXISTS into a left-semi join and the scalar
    subquery into a broadcast aggregate (no per-row re-execution)."""
    load_tables(spark, sf_dir, "customer", "orders", "nation")
    return spark.sql("""
        SELECT c.c_custkey, c.c_name,
               CAST((SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,2)))
                     FROM orders o2) AS DOUBLE)
                   / (SELECT COUNT(*) FROM orders) AS global_avg_price
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000)
          AND c.c_nationkey IN (SELECT n_nationkey FROM nation
                                WHERE n_regionkey <= 2)
    """)


def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant aggregation: explicit salt → partial agg → final agg.

    At 100 TB a groupBy on a low-cardinality/skewed key funnels whole keys
    through single reducers; salting fans each hot key across
    ``n_salts`` reducers, then a cheap second agg (n_keys × n_salts rows)
    folds the partials. Result is identical to the plain GROUP BY — proven
    here by the oracle. (Spark's partial aggregation + AQE skew handling
    cover many cases; explicit salting is the pattern for the rest, e.g.
    high-cardinality aggregation states like collect_list/HLL merge.)"""
    t = load_tables(spark, sf_dir, "events")
    n_salts = 16
    salted = t["events"].withColumn(
        "__salt", (F.xxhash64("event_id") % n_salts).cast("int")
    )
    partial = salted.groupBy("event_type", "__salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("bigint").alias("n_events"),
        F.sum("pv").cast("double").alias("total_value"),
    )


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join: replicate the small dim across ``n_salts`` salt
    values and give each fact row a hashed salt — a hot join key (here
    event_type: ~5 values over the whole fact table) fans across n_salts
    reducers instead of funneling through one.

    The salt doesn't change the result (dim is replicated over ALL salts),
    which the plain-join DuckDB oracle proves. AQE's skew-join splitting
    covers sort-merge cases automatically; explicit salting is the pattern
    when the skewed side must hash-partition anyway (e.g. into a stateful op
    or a bucketed write)."""
    t = load_tables(spark, sf_dir, "events")
    n_salts = 8
    ev = t["events"].select("event_id", "event_type", "value")
    dim = (
        ev.select("event_type").distinct()
        .withColumn("label", F.upper("event_type"))
    )
    salted_dim = dim.crossJoin(
        spark.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    )
    fact = ev.withColumn(
        "__salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salts)).cast("int")
    )
    return (
        fact.join(F.broadcast(salted_dim), ["event_type", "__salt"])
        .groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            .alias("total_value"),
        )
        .orderBy("label")
    )


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY GROUPING SETS — finer control than rollup/cube (SURVEY §2E
    capability row). Spark SQL literal; single shuffle with Expand."""
    load_tables(spark, sf_dir, "orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
    """)


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the latest order of the same customer with
    o_orderdate <= ts.

    Spark-first plan: ONE shuffle. Tag both sides, union, sort within each
    key partition, and carry the last order forward with
    last(..., ignorenulls=True) — no per-key cross product, no range
    explosion; scales as sort-merge over (key, time). The naive
    equi-join + filter + row_number alternative is O(|events|x|orders|)
    per key and is exactly what this shape avoids at 100 TB."""
    t = load_tables(spark, sf_dir, "events", "orders")
    # dedupe orders to one row per (custkey, date): greatest orderkey wins
    w_dedup = W.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    orders = (
        t["orders"]
        .withColumn("__rn", F.row_number().over(w_dedup))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("o_custkey").alias("key"),
            F.col("o_orderdate").alias("t"),
            F.col("o_orderkey").alias("ord_key"),
            F.col("o_totalprice").alias("ord_price"),
            F.lit(0).alias("is_event"),
            F.lit(None).cast("bigint").alias("event_id"),
        )
    )
    events = t["events"].select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(None).cast("bigint").alias("ord_key"),
        F.lit(None).cast("double").alias("ord_price"),
        F.lit(1).alias("is_event"),
        "event_id",
    )
    # order rows sort before events at equal t (is_event asc) → <= semantics
    w = (
        W.partitionBy("key")
        .orderBy("t", "is_event", "ord_key")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = orders.unionByName(events).select(
        "*",
        F.last("ord_key", ignorenulls=True).over(w).alias("asof_orderkey"),
        F.last("ord_price", ignorenulls=True).over(w).alias("asof_totalprice"),
    )
    return (
        merged.filter(F.col("is_event") == 1)
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            F.col("t").alias("ts"),
            "asof_orderkey",
            "asof_totalprice",
        )
    )


def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/theta join: orders banded by totalprice against a small interval
    table. The band side broadcasts (BroadcastNestedLoopJoin on the theta
    condition) — the scalable shape for interval lookups: never shuffle the
    fact side on a non-equi key."""
    t = load_tables(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("P0_50K", 0.0, 50_000.0), ("P50_150K", 50_000.0, 150_000.0),
         ("P150_300K", 150_000.0, 300_000.0), ("P300K_PLUS", 300_000.0, 1e12)],
        "band string, lo double, hi double",
    )
    joined = t["orders"].join(
        F.broadcast(bands),
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        "inner",
    )
    return joined.groupBy("band").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        _dsum("o_totalprice").alias("total"),
    )


QUERIES = {
    "scan_filter_project": scan_filter_project,
    "pricing_summary": pricing_summary,
    "agg_funcs": agg_funcs,
    "join_inner": join_inner,
    "join_left": join_left,
    "join_anti": join_anti,
    "join_semi": join_semi,
    "join_multiway": join_multiway,
    "pivot_conditional": pivot_conditional,
    "union_all": union_all,
    "distinct_op": distinct_op,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "orderby_limit": orderby_limit,
    "window_row_number": window_row_number,
    "window_lag_lead": window_lag_lead,
    "window_running_sum": window_running_sum,
    "cte_composition": cte_composition,
    "rollup_agg": rollup_agg,
    "cube_agg": cube_agg,
    "scalar_string_funcs": scalar_string_funcs,
    "scalar_date_funcs": scalar_date_funcs,
    "approx_distinct": approx_distinct,
    "subquery_ops": subquery_ops,
    "agg_salted_twophase": agg_salted_twophase,
    "join_skew_salted": join_skew_salted,
    "window_range_frame": window_range_frame,
    "json_extract_ops": json_extract_ops,
    "unpivot_melt": unpivot_melt,
    "agg_bitwise_stringagg": agg_bitwise_stringagg,
    "regexp_extract_ops": regexp_extract_ops,
    "agg_array_collect": agg_array_collect,
    "approx_distinct_bounded": approx_distinct_bounded,
    "hll_sketch_union_bounded": hll_sketch_union_bounded,
    "orderby_limit_offset": orderby_limit_offset,
    "grouping_sets_agg": grouping_sets_agg,
    "join_asof": join_asof,
    "join_range": join_range,
    "join_full_outer": join_full_outer,
    "join_cross": join_cross,
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "tpch_q5_local_supplier": tpch_q5_local_supplier,
    "tpch_q10_returned_items": tpch_q10_returned_items,
    "tpch_q4_order_priority": tpch_q4_order_priority,
    "tpch_q7_volume_shipping": tpch_q7_volume_shipping,
    "tpch_q8_market_share": tpch_q8_market_share,
    "tpch_q14_promo_revenue": tpch_q14_promo_revenue,
    "tpch_q18_large_orders": tpch_q18_large_orders,
    "tpch_q19_disjunctive_join": tpch_q19_disjunctive_join,
    "tpch_q22_global_sales_opportunity": tpch_q22_global_sales_opportunity,
    "window_rank_funcs": window_rank_funcs,
    "agg_percentiles": agg_percentiles,
    "array_funcs": array_funcs,
    "null_conditional_funcs": null_conditional_funcs,
    "explode_split_tokens": explode_split_tokens,
}
