"""Remaining TPC-H query shapes (Q2, Q6, Q9, Q11-13, Q15-17, Q20, Q21).

Together with ``relational.py`` (Q1/Q3/Q4/Q5/Q7/Q8/Q10/Q14/Q18/Q19/Q22) this
completes the 22-query TPC-H shape inventory over the driver's synthetic
star schema. The schema lacks ``partsupp``, ``l_commitdate``/``l_receiptdate``
and a few attribute columns, so each query is *adapted* — the join topology,
subquery structure, and aggregate shape of the official query are preserved,
with stand-ins documented per query:

- partsupp            -> SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
- ps_supplycost       -> s_acctbal (any per-supplier scalar works for the
                         "min/max-over-correlated-group" shape of Q2)
- "late" (commitdate) -> l_shipdate > o_orderdate (same adaptation Q4 uses)
- supplier complaints -> s_acctbal < 0 (Q16's NOT IN subquery)

Determinism contract (hash-exact vs the DuckDB oracle, order-insensitive):
monetary math in DECIMAL(18,2/4) (exact, order-independent), results cast to
DOUBLE at the end; computed integers cast to BIGINT; LIMIT always carries a
unique tie-break. Q17's correlated ``l_quantity < 0.2 * avg(l_quantity)``
threshold is rewritten to the integer-exact ``5 * qty * n < sum_qty`` so no
IEEE division sits inside a comparison.

Scale notes (100 TB): every join below is either key-equi (shuffle on the
join key, AQE picks broadcast when a side is small) or an explicitly
broadcast fixed-cardinality dim (nation=25, region=5). Scalar subqueries
(Q11 total, Q15 max) reduce to one row and broadcast into the filter. No
query collects to the driver or performs a cartesian product.

Reference behavior cited from dbt-core's delegation model: dbt pipes user SQL
untouched to the warehouse (core/dbt/compilation.py:609-615), so the engine's
query surface is Spark SQL itself; these shapes exercise it the way warehouse
users exercise dbt models.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark.session import load_tables


def _dec(col: str, scale: int = 2) -> Column:
    return F.col(col).cast(f"decimal(18,{scale})")


def _disc() -> Column:
    # Built lazily: Column construction needs an active SparkContext, and this
    # module must be importable before the session exists (bench.py imports
    # QUERIES at startup).
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
_Q1_DISC = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


# --------------------------------------------------------------------------
# Q2 — min-cost supplier: correlated max-per-group subquery + join-back
# --------------------------------------------------------------------------

def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part best supplier within a region (correlated
    aggregate subquery), adapted with s_acctbal standing in for supply cost
    (maximize instead of minimize, same shape).

    Scale: candidate set is pre-filtered by part size/type BEFORE the
    per-group max, so the aggregate and the join-back both run on the reduced
    set; nation/region broadcast.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation", "region")
    eur = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # part filter BEFORE the pair-distinct: the dedup shuffle runs over the
    # ~1/250 of lineitem that survives the join, not the whole table
    cand = (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(
            t["part"].filter((F.col("p_size") == 15) & (F.col("p_type") == "SMALL")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_partkey", "l_suppkey", "p_partkey", "p_brand")
        .distinct()
        .join(eur, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_brand", "s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    best = cand.groupBy(F.col("p_partkey").alias("bk")).agg(
        F.max("s_acctbal").alias("max_bal")
    )
    return (
        cand.join(
            best,
            (F.col("p_partkey") == F.col("bk")) & (F.col("s_acctbal") == F.col("max_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", F.col("p_partkey").asc()
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q6 — forecast revenue: tight scan-filter-aggregate (no join)
# --------------------------------------------------------------------------

def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-table filtered sum — the pure pushdown benchmark.
    All three predicates reach the parquet scan (PushedFilters); the sum is
    map-side partial + one-row exchange."""
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (_dec("l_discount").between(F.lit("0.02").cast("decimal(18,2)"),
                                          F.lit("0.06").cast("decimal(18,2)")))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit: 5-way join, group by nation x year
# --------------------------------------------------------------------------

def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    matching a name pattern (adapted: profit = discounted price; the schema
    has no ps_supplycost to subtract).

    Scale: the part filter runs before the joins (pruned scan); nation
    broadcast; lineitem shuffles once per equi-join key.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation")
    return (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_name").contains("widget")).select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"].select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(_disc()).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q11 — important stock: HAVING against a scalar fraction-of-total subquery
# --------------------------------------------------------------------------

def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value for one nation's suppliers, kept when
    above a fraction of the nation's total (scalar subquery in HAVING).
    Adapted: value = sum of extendedprice over lineitem (no partsupp).

    Scale: the grouped aggregate and the one-row total derive from the same
    filtered join; the total broadcasts into the post-agg filter — the big
    input is traversed twice but never re-shuffled for the comparison.
    """
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    base = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_3")
        .select("l_partkey", "l_extendedprice")
    )
    per_part = base.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice")).alias("value_dec")
    )
    total = base.agg(F.sum(_dec("l_extendedprice")).alias("total_dec"))
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("value_dec").cast("double")
            > F.col("total_dec").cast("double") * F.lit(0.001)
        )
        .select(
            "l_partkey", F.col("value_dec").cast("double").alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
    )


# --------------------------------------------------------------------------
# Q12 — shipping priority classes: join + conditional counts
# --------------------------------------------------------------------------

def tpch_q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional priority counts over late lines, grouped
    by a line attribute (adapted: l_linestatus stands in for l_shipmode and
    l_shipdate > o_orderdate stands in for the receipt/commit lateness test).
    """
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution: left join + two-level aggregate
# --------------------------------------------------------------------------

def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of orders-per-customer including zero-order
    customers (LEFT OUTER join preserving unmatched, then re-aggregate).

    Scale: first aggregate shuffles on custkey (same key as the join — AQE
    reuses the exchange); second aggregate's domain is tiny (distinct counts).
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(
            t["orders"]
            .filter(~F.col("o_orderpriority").startswith("4"))
            .select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q15 — top supplier: aggregate view + scalar max + equality join-back
# --------------------------------------------------------------------------

def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the maximum quarterly revenue —
    the view + scalar-subquery-on-the-view shape. Revenue kept as exact
    DECIMAL until after the max-equality so both engines compare identically.
    """
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_disc()).alias("total_rev_dec"))
    )
    top = rev.agg(F.max("total_rev_dec").alias("max_rev_dec"))
    return (
        rev.join(F.broadcast(top))
        .filter(F.col("total_rev_dec") == F.col("max_rev_dec"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.col("total_rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 — parts/supplier relationship: NOT-IN subquery + count-distinct
# --------------------------------------------------------------------------

def tpch_q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type, size)
    excluding one brand/type and a NOT IN supplier blocklist (adapted:
    "complaints" = negative account balance).

    Scale: the blocklist is tiny -> anti-join broadcasts; count(distinct)
    expands then collapses in two exchanges (Spark's standard expand plan).
    """
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    # No pre-distinct over (partkey, suppkey): COUNT(DISTINCT suppkey) per
    # group collapses duplicate pairs anyway, so the partsupp materialization
    # (a full extra shuffle of lineitem) is dead weight here. The filtered
    # part dim joins first so the only wide exchange is the final aggregate.
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(
            t["part"].filter(
                (F.col("p_brand") != "Brand#5")
                & (F.col("p_type") != "STANDARD")
                & (F.col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49))
            ).select("p_partkey", "p_brand", "p_type", "p_size"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity revenue: correlated per-part average threshold
# --------------------------------------------------------------------------

def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lines whose quantity is below 20% of the
    part's average quantity. The correlated AVG is computed as a grouped
    aggregate joined back; the threshold test ``qty < 0.2 * sum/n`` is
    rewritten integer-exact as ``5 * qty * n < sum`` (all DECIMAL) so both
    engines decide borderline rows identically.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    # The per-part AVG only matters for parts surviving the brand/type filter,
    # so the part filter is applied BEFORE the grouped aggregate: at scale the
    # aggregate runs over ~1/125 of lineitem instead of all of it, and the
    # join-back keys both sides by l_partkey (one co-partitioned exchange).
    sel = (
        t["lineitem"]
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(
            t["part"].filter(
                (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "MEDIUM")
            ).select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    per_part = sel.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.count("*").alias("n_lines"),
        F.sum(_dec("l_quantity")).alias("sum_qty"),
    )
    return (
        sel.join(per_part, F.col("l_partkey") == F.col("ak"))
        .filter(
            _dec("l_quantity") * F.lit(5) * F.col("n_lines") < F.col("sum_qty")
        )
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q20 — potential promotion: nested IN subqueries (semi-join chain)
# --------------------------------------------------------------------------

def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers IN (shipped enough of parts IN (name
    pattern)) within one nation — a two-deep semi-join chain. Adapted: the
    availqty > half-of-shipped threshold becomes a fixed shipped-quantity
    threshold (the schema has no partsupp.availqty), keeping the nested-IN
    topology intact.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    red_parts = t["part"].filter(F.col("p_name").startswith("red")).select("p_partkey")
    heavy = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(red_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_1")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: EXISTS + NOT EXISTS self-joins
# --------------------------------------------------------------------------

def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: for finished orders, count late lines whose supplier
    is the ONLY late supplier on a multi-supplier order — EXISTS (another
    supplier on the order) plus NOT EXISTS (another LATE supplier). Adapted:
    "late" = l_shipdate > o_orderdate (no receipt/commit dates), nation
    filter NATION_2.

    Scale: both EXISTS branches become distinct-pair semi/anti joins on
    orderkey — three shuffles over lineitem-derived sets, no cartesian.
    """
    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier", "nation")
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(
            t["orders"].filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
    )
    l1 = (
        late.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_2")
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    # The EXISTS / NOT EXISTS pair collapses to two per-order aggregates:
    # EXISTS(other supplier)      ⇔ count(distinct supplier) ≥ 2
    # NOT EXISTS(other LATE supp) ⇔ count(distinct late supplier) = 1
    # (an l1 row's own supplier IS late, so "1 late supplier" means "only
    # me"). Two hash aggregates + equi joins — map-side partials and AQE
    # broadcasts of the aggregated (one-row-per-order) sides replace the
    # distinct-pair materialization and the non-equi sort-merge joins the
    # literal translation needs.
    n_supp = li.groupBy(F.col("l_orderkey").alias("e_ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    ).filter(F.col("n_supp") >= 2)
    n_late = late.groupBy(F.col("l_orderkey").alias("ne_ok")).agg(
        F.countDistinct("l_suppkey").alias("n_late")
    ).filter(F.col("n_late") == 1)
    return (
        l1.join(n_supp, F.col("l_orderkey") == F.col("e_ok"), "left_semi")
        .join(n_late, F.col("l_orderkey") == F.col("ne_ok"), "left_semi")
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


ORACLES: dict[str, str] = {
    "tpch_q2_min_cost_supplier": """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        cand AS (
            SELECT p_partkey, p_brand, s_suppkey, s_acctbal, s_name, n_name
            FROM ps
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'SMALL')
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
        FROM cand c
        WHERE s_acctbal = (SELECT MAX(s_acctbal) FROM cand c2
                           WHERE c2.p_partkey = c.p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey ASC
        LIMIT 100
    """,
    "tpch_q6_forecast_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND CAST(l_discount AS DECIMAL(18,2))
              BETWEEN CAST('0.02' AS DECIMAL(18,2)) AND CAST('0.06' AS DECIMAL(18,2))
          AND l_quantity < 24
    """,
    "tpch_q9_product_type_profit": f"""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM({_Q1_DISC}) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, EXTRACT(year FROM o_orderdate)
        ORDER BY nation, o_year DESC
    """,
    "tpch_q11_important_stock": """
        WITH base AS (
            SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS px
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3')
        SELECT l_partkey, CAST(SUM(px) AS DOUBLE) AS part_value
        FROM base
        GROUP BY l_partkey
        HAVING CAST(SUM(px) AS DOUBLE)
               > (SELECT CAST(SUM(px) AS DOUBLE) FROM base) * 0.001
        ORDER BY part_value DESC, l_partkey ASC
    """,
    "tpch_q12_late_lines_by_status": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "tpch_q13_customer_distribution": """
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
            FROM customer
            LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
                       WHERE o_orderpriority NOT LIKE '4%') o
              ON c_custkey = o_custkey
            GROUP BY c_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey, SUM({_Q1_DISC}) AS total_rev_dec
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total_rev_dec AS DOUBLE) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM rev)
        ORDER BY s_suppkey
    """,
    "tpch_q16_parts_supplier": """
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5'
          AND p_type <> 'STANDARD'
          AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "tpch_q17_small_qty_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN (SELECT l_partkey AS ak, COUNT(*) AS n_lines,
                     SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
              FROM lineitem GROUP BY l_partkey) pp
          ON l_partkey = ak
        WHERE p_brand = 'Brand#3' AND p_type = 'MEDIUM'
          AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * n_lines < sum_qty
    """,
    "tpch_q20_potential_promotion": """
        SELECT s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
          AND s_suppkey IN (
              SELECT l_suppkey
              FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE 'red%')
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
              GROUP BY l_suppkey, l_partkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50)
        ORDER BY s_name
    """,
    "tpch_q21_waiting_supplier": """
        WITH late AS (
            SELECT l_orderkey, l_suppkey
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate)
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM late l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_2'
          AND EXISTS (SELECT 1 FROM (SELECT DISTINCT l_orderkey, l_suppkey
                                     FROM lineitem) l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM (SELECT DISTINCT l_orderkey, l_suppkey
                                         FROM late) l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 100
    """,
}

QUERIES: dict = {
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
    "tpch_q9_product_type_profit": tpch_q9_product_type_profit,
    "tpch_q11_important_stock": tpch_q11_important_stock,
    "tpch_q12_late_lines_by_status": tpch_q12_late_lines_by_status,
    "tpch_q13_customer_distribution": tpch_q13_customer_distribution,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q16_parts_supplier": tpch_q16_parts_supplier,
    "tpch_q17_small_qty_revenue": tpch_q17_small_qty_revenue,
    "tpch_q20_potential_promotion": tpch_q20_potential_promotion,
    "tpch_q21_waiting_supplier": tpch_q21_waiting_supplier,
}
