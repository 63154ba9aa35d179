"""Metric/saved-query compilation and execution (plans/metric_compile.py).

Semantics verified against handwritten SQL over the same seeds; YAML shapes
mirror the reference's semantic-layer format (schema_yaml_readers.py:189
metrics, :511 semantic models, :739 saved queries)."""

import pytest

from dbt_spark.plans.metric_compile import (
    MetricQueryError,
    compile_metrics_sql,
    compile_saved_query,
)
from dbt_spark.runner import Engine

ORDERS_SM = {
    "name": "orders_sm",
    "model": "ref('orders')",
    "defaults": {"agg_time_dimension": "order_date"},
    "primary_entity": "order",
    "entities": [
        {"name": "order_id", "type": "primary", "expr": "o_id"},
        {"name": "customer", "type": "foreign", "expr": "o_cust"},
    ],
    "dimensions": [
        {"name": "order_date", "type": "time", "expr": "o_date",
         "type_params": {"time_granularity": "day"}},
        {"name": "status", "type": "categorical", "expr": "o_status"},
    ],
    "measures": [
        {"name": "order_count", "agg": "count", "expr": "1"},
        {"name": "order_total", "agg": "sum", "expr": "o_total"},
        {"name": "distinct_customers", "agg": "count_distinct",
         "expr": "o_cust"},
        {"name": "large_total", "agg": "sum", "expr": "o_total",
         "filter": "{{ Dimension('status') }} = 'F'"},
    ],
}

PAYMENTS_SM = {
    "name": "payments_sm",
    "model": "ref('payments')",
    "defaults": {"agg_time_dimension": "paid_date"},
    "entities": [{"name": "payment_id", "type": "primary", "expr": "p_id"}],
    "dimensions": [
        {"name": "paid_date", "type": "time", "expr": "p_date",
         "type_params": {"time_granularity": "day"}},
        {"name": "status", "type": "categorical", "expr": "p_status"},
    ],
    "measures": [
        {"name": "payment_total", "agg": "sum", "expr": "p_amount"},
    ],
}

METRICS = [
    {"name": "orders", "type": "simple", "label": "orders",
     "type_params": {"measure": "order_count"}},
    {"name": "revenue", "type": "simple", "label": "revenue",
     "type_params": {"measure": "order_total"}},
    {"name": "finished_revenue", "type": "simple", "label": "fr",
     "type_params": {"measure": "order_total"},
     "filter": "{{ Dimension('status') }} = 'F'"},
    {"name": "avg_order_value", "type": "ratio", "label": "aov",
     "type_params": {"numerator": "order_total",
                     "denominator": "order_count"}},
    {"name": "revenue_per_customer", "type": "derived", "label": "rpc",
     "type_params": {"expr": "rev / NULLIF(custs, 0)",
                     "metrics": [{"name": "revenue", "alias": "rev"},
                                 {"name": "distinct_customers_m",
                                  "alias": "custs"}]}},
    {"name": "distinct_customers_m", "type": "simple", "label": "dc",
     "type_params": {"measure": "distinct_customers"}},
    {"name": "payments", "type": "simple", "label": "p",
     "type_params": {"measure": "payment_total"}},
    {"name": "cumulative_revenue", "type": "cumulative", "label": "cr",
     "type_params": {"measure": "order_total"}},
]

TABLES = {"orders": "t_orders", "payments": "t_payments"}

ORDERS_ROWS = [
    (1, 10, "2024-01-05", "F", 100.0),
    (2, 10, "2024-01-20", "O", 50.0),
    (3, 20, "2024-02-03", "F", 200.0),
    (4, 30, "2024-02-10", "F", 75.0),
    (5, 20, "2024-03-01", "O", 25.0),
]

PAYMENTS_ROWS = [
    (1, "2024-01-06", "ok", 90.0),
    (2, "2024-02-04", "ok", 210.0),
    (3, "2024-04-01", "ok", 5.0),
]


@pytest.fixture(scope="module")
def views(spark):
    spark.createDataFrame(
        ORDERS_ROWS, "o_id int, o_cust int, o_date string, o_status string, o_total double"
    ).selectExpr("o_id", "o_cust", "CAST(o_date AS DATE) AS o_date",
                 "o_status", "o_total").createOrReplaceTempView("t_orders")
    spark.createDataFrame(
        PAYMENTS_ROWS, "p_id int, p_date string, p_status string, p_amount double"
    ).selectExpr("p_id", "CAST(p_date AS DATE) AS p_date", "p_status",
                 "p_amount").createOrReplaceTempView("t_payments")
    return spark


def _run(spark, metric_names, **kw):
    sql = compile_metrics_sql(
        metric_names, METRICS, [ORDERS_SM, PAYMENTS_SM], TABLES, **kw)
    return sql, spark.sql(sql)


def test_simple_metrics_fuse_into_one_aggregate(views):
    sql, df = _run(views, ["orders", "revenue"], group_by=["status"])
    rows = {r["status"]: (r["orders"], r["revenue"]) for r in df.collect()}
    assert rows == {"F": (3, 375.0), "O": (2, 75.0)}
    # both metrics share one semantic model → exactly one aggregate CTE
    assert sql.count("GROUP BY") == 1


def test_time_grain_and_metric_time(views):
    _, df = _run(views, ["revenue"], group_by=["metric_time__month"])
    rows = {str(r["metric_time__month"]): r["revenue"] for r in df.collect()}
    assert rows == {"2024-01-01": 150.0, "2024-02-01": 275.0,
                    "2024-03-01": 25.0}


def test_metric_level_filter(views):
    _, df = _run(views, ["finished_revenue"])
    assert df.collect()[0]["finished_revenue"] == 375.0


def test_measure_level_filter(views):
    sql = compile_metrics_sql(
        ["revenue"], METRICS,
        [{**ORDERS_SM,
          "measures": [{"name": "order_total", "agg": "sum",
                        "expr": "o_total",
                        "filter": "{{ Dimension('status') }} = 'O'"}]}],
        TABLES)
    assert views.sql(sql).collect()[0]["revenue"] == 75.0


def test_ratio_metric(views):
    _, df = _run(views, ["avg_order_value"], group_by=["status"])
    rows = {r["status"]: r["avg_order_value"] for r in df.collect()}
    assert rows == {"F": 125.0, "O": 37.5}


def test_derived_metric(views):
    _, df = _run(views, ["revenue_per_customer"])
    assert df.collect()[0]["revenue_per_customer"] == 450.0 / 3


def test_cross_model_full_outer_join(views):
    sql, df = _run(views, ["revenue", "payments"],
                   group_by=["metric_time__month"])
    rows = {str(r["metric_time__month"]): (r["revenue"], r["payments"])
            for r in df.collect()}
    # April exists only in payments; March only in orders — full outer keeps both
    assert rows["2024-04-01"] == (None, 5.0)
    assert rows["2024-03-01"] == (25.0, None)
    assert rows["2024-01-01"] == (150.0, 90.0)
    assert "FULL OUTER JOIN" in sql


def test_cumulative_metric_running_total(views):
    _, df = _run(views, ["cumulative_revenue"],
                 group_by=["metric_time__month"])
    rows = sorted((str(r["metric_time__month"]), r["cumulative_revenue"])
                  for r in df.collect())
    assert [v for _, v in rows] == [150.0, 425.0, 450.0]


def test_query_level_where(views):
    _, df = _run(views, ["revenue"],
                 where="{{ Dimension('status') }} <> 'O'")
    assert df.collect()[0]["revenue"] == 375.0


def test_errors(views):
    with pytest.raises(MetricQueryError, match="not defined"):
        _run(views, ["nope"])
    with pytest.raises(MetricQueryError, match="no dimension or entity"):
        _run(views, ["revenue"], group_by=["bogus_dim"])
    with pytest.raises(MetricQueryError, match="grain"):
        _run(views, ["revenue"], group_by=["status__month"])


def test_saved_query_compilation(views):
    sq = {
        "name": "monthly",
        "query_params": {
            "metrics": ["revenue", "orders"],
            "group_by": ["TimeDimension('metric_time', 'month')",
                         "Dimension('status')"],
            "where": ["{{ Dimension('status') }} IN ('F', 'O')"],
            "order_by": ["metric_time__month", "status"],
            "limit": 10,
        },
    }
    sql = compile_saved_query(sq, METRICS, [ORDERS_SM, PAYMENTS_SM], TABLES)
    rows = views.sql(sql).collect()
    assert rows[0]["status"] == "F" and rows[0]["revenue"] == 100.0
    assert [(str(r["metric_time__month"]), r["status"], r["revenue"])
            for r in rows] == [
        ("2024-01-01", "F", 100.0), ("2024-01-01", "O", 50.0),
        ("2024-02-01", "F", 275.0), ("2024-03-01", "O", 25.0)]


PROJECT_FILES = {
    "dbt_project.yml": "name: sl\nmodel-paths: ['models']\nseed-paths: ['seeds']\n",
    "seeds/raw_orders.csv": (
        "o_id,o_cust,o_date,o_status,o_total\n"
        "1,10,2024-01-05,F,100\n2,10,2024-01-20,O,50\n"
        "3,20,2024-02-03,F,200\n4,30,2024-02-10,F,75\n5,20,2024-03-01,O,25\n"
    ),
    "models/orders.sql": "select * from {{ ref('raw_orders') }}",
    "models/semantic.yml": """
version: 2
semantic_models:
  - name: orders_sm
    model: ref('orders')
    defaults: {agg_time_dimension: order_date}
    entities:
      - {name: order_id, type: primary, expr: o_id}
    dimensions:
      - {name: order_date, type: time, expr: "CAST(o_date AS DATE)", type_params: {time_granularity: day}}
      - {name: status, type: categorical, expr: o_status}
    measures:
      - {name: order_total, agg: sum, expr: o_total}
      - {name: order_count, agg: count, expr: "1"}
metrics:
  - name: revenue
    label: revenue
    type: simple
    type_params: {measure: order_total}
  - name: orders_m
    label: orders
    type: simple
    type_params: {measure: order_count}
saved_queries:
  - name: monthly_revenue
    query_params:
      metrics: [revenue, orders_m]
      group_by: ["TimeDimension('metric_time', 'month')"]
    exports:
      - name: monthly_revenue_tbl
        config: {export_as: table}
""",
}


def test_saved_query_export_materializes_in_build(project_dir, spark):
    root = project_dir(PROJECT_FILES)
    eng = Engine(root, spark=spark)
    # default build: saved query is a NoOp leaf (reference core behavior)
    r = eng.invoke(["build"])
    assert r.success
    assert not eng.store.exists("main", "monthly_revenue_tbl")
    # --export-saved-queries (current spelling; --include-saved-query is
    # its deprecated alias): exports materialize
    r = eng.invoke(["build", "--export-saved-queries"])
    assert r.success
    msg = next(x.message for x in r.results
               if x.unique_id == "saved_query.sl.monthly_revenue")
    assert "monthly_revenue_tbl" in msg
    out = {str(row["metric_time__month"]): (row["revenue"], row["orders_m"])
           for row in eng.store.read("main", "monthly_revenue_tbl").collect()}
    assert out == {"2024-01-01": (150.0, 2), "2024-02-01": (275.0, 2),
                   "2024-03-01": (25.0, 1)}
    # programmatic API agrees
    api = {str(r2["metric_time__month"]): r2["revenue"]
           for r2 in eng.query_metrics(
               ["revenue"], group_by=["metric_time__month"]).collect()}
    assert api == {"2024-01-01": 150.0, "2024-02-01": 275.0,
                   "2024-03-01": 25.0}


def test_compiled_metric_sql_is_byte_stable():
    """Compiled SQL for filtered measures must be identical across calls
    (and processes) — leaf aliases derive from md5, not randomized hash()."""
    from dbt_spark.plans.metric_compile import compile_metrics_sql

    sm = {
        "name": "s", "model": "ref('orders')",
        "defaults": {"agg_time_dimension": "d"},
        "entities": [{"name": "o", "type": "primary", "expr": "o_orderkey"}],
        "dimensions": [
            {"name": "d", "type": "time", "expr": "o_orderdate",
             "type_params": {"time_granularity": "day"}},
            {"name": "status", "type": "categorical", "expr": "o_orderstatus"},
        ],
        "measures": [{"name": "n", "agg": "count", "expr": "1"}],
    }
    metrics = [{
        "name": "open_orders", "type": "simple",
        "filter": "{{ Dimension('status') }} = 'O'",
        "type_params": {"measure": "n"},
    }]
    args = (["open_orders"], metrics, [sm], {"orders": "orders"})
    a = compile_metrics_sql(*args, group_by=["status"])
    b = compile_metrics_sql(*args, group_by=["status"])
    assert a == b
    import hashlib
    expected = hashlib.md5(
        "(({{ Dimension('status') }} = 'O'))".encode()).hexdigest()[:8]
    # stable digest actually appears in the text (not a process-random tag)
    assert expected in a or "__m_n_" in a


EVENTS_SM = {
    "name": "events_sm",
    "model": "ref('events_t')",
    "defaults": {"agg_time_dimension": "etime"},
    "entities": [{"name": "user", "type": "primary", "expr": "u"}],
    "dimensions": [
        {"name": "etime", "type": "time", "expr": "ts",
         "type_params": {"time_granularity": "day"}},
        {"name": "kind", "type": "categorical", "expr": "k"},
    ],
    "measures": [
        {"name": "signups", "agg": "count", "expr": "1",
         "filter": "{{ Dimension('kind') }} = 'signup'"},
        {"name": "purchases", "agg": "count", "expr": "1",
         "filter": "{{ Dimension('kind') }} = 'purchase'"},
        {"name": "spend", "agg": "sum", "expr": "1"},
    ],
}

CONV_METRICS = [
    {"name": "conv_n", "type": "conversion", "label": "c",
     "type_params": {"conversion_type_params": {
         "base_measure": "signups", "conversion_measure": "purchases",
         "entity": "user", "window": "7 days",
         "calculation": "conversions"}}},
    {"name": "conv_rate", "type": "conversion", "label": "r",
     "type_params": {"conversion_type_params": {
         "base_measure": "signups", "conversion_measure": "purchases",
         "entity": "user", "window": "7 days"}}},
    {"name": "conv_bad_agg", "type": "conversion", "label": "b",
     "type_params": {"conversion_type_params": {
         "base_measure": "spend", "conversion_measure": "purchases",
         "entity": "user"}}},
]

EVENT_ROWS = [
    (1, "signup", "2024-01-01 10:00:00"),
    (1, "purchase", "2024-01-03 10:00:00"),   # within 7d -> converted
    (2, "signup", "2024-01-01 10:00:00"),
    (2, "purchase", "2024-01-20 10:00:00"),   # outside 7d -> not
    (3, "signup", "2024-01-01 10:00:00"),     # no purchase -> not
    (4, "signup", "2024-02-01 10:00:00"),
    (4, "purchase", "2024-02-02 10:00:00"),   # two purchases...
    (4, "purchase", "2024-02-03 10:00:00"),   # ...dedup to ONE conversion
    (5, "purchase", "2024-01-02 10:00:00"),   # purchase w/o signup: ignored
    (6, "signup", "2024-02-05 10:00:00"),
    (6, "purchase", "2024-02-05 10:00:00"),   # same instant: strictly-later
]


@pytest.fixture(scope="module")
def conv_views(spark):
    spark.createDataFrame(
        EVENT_ROWS, "u int, k string, ts string"
    ).selectExpr("u", "k", "CAST(ts AS TIMESTAMP) AS ts"
                 ).createOrReplaceTempView("t_events")
    return spark


def test_conversion_metric_counts_and_rate(conv_views):
    """Jan: 3 signups, 1 converted; Feb: 2 signups, 1 converted (multiple
    purchases dedup; same-instant purchase is NOT strictly later)."""
    sql = compile_metrics_sql(
        ["conv_n", "conv_rate"], CONV_METRICS, [EVENTS_SM],
        {"events_t": "t_events"}, group_by=["metric_time__month"])
    rows = {str(r["metric_time__month"]): (r["conv_n"],
                                           round(r["conv_rate"], 6))
            for r in conv_views.sql(sql).collect()}
    assert rows == {"2024-01-01": (1, round(1 / 3, 6)),
                    "2024-02-01": (1, 0.5)}


def test_conversion_metric_global_and_no_window(conv_views):
    nowin = [{"name": "conv_all", "type": "conversion", "label": "a",
              "type_params": {"conversion_type_params": {
                  "base_measure": "signups",
                  "conversion_measure": "purchases",
                  "entity": "user", "calculation": "conversions"}}}]
    sql = compile_metrics_sql(["conv_all"], nowin, [EVENTS_SM],
                              {"events_t": "t_events"})
    # without a window user 2's late purchase now converts; user 6 still
    # fails strictly-later
    assert conv_views.sql(sql).collect()[0]["conv_all"] == 3


def test_conversion_metric_errors(conv_views):
    with pytest.raises(MetricQueryError, match="agg: count"):
        compile_metrics_sql(["conv_bad_agg"], CONV_METRICS, [EVENTS_SM],
                            {"events_t": "t_events"})
    # cross-model conversion is supported, but the entity must exist on
    # BOTH sides — ORDERS_SM has no `user` entity
    cross = [{"name": "x", "type": "conversion", "label": "x",
              "type_params": {"conversion_type_params": {
                  "base_measure": "signups",
                  "conversion_measure": "order_count",
                  "entity": "user"}}}]
    with pytest.raises(MetricQueryError, match="entity 'user' not found"):
        compile_metrics_sql(["x"], cross, [EVENTS_SM, ORDERS_SM],
                            {"events_t": "t_events", "orders": "t_orders"})


SIGNUPS_SM = {
    "name": "signups_sm",
    "model": "ref('signups_t')",
    "defaults": {"agg_time_dimension": "stime"},
    "entities": [{"name": "user", "type": "primary", "expr": "u"}],
    "dimensions": [
        {"name": "stime", "type": "time", "expr": "ts",
         "type_params": {"time_granularity": "day"}},
    ],
    "measures": [{"name": "signup_events", "agg": "count", "expr": "1"}],
}

PURCHASES_SM = {
    "name": "purchases_sm",
    "model": "ref('purchases_t')",
    "defaults": {"agg_time_dimension": "ptime"},
    "entities": [{"name": "user", "type": "foreign", "expr": "buyer"}],
    "dimensions": [
        {"name": "ptime", "type": "time", "expr": "pts",
         "type_params": {"time_granularity": "day"}},
    ],
    "measures": [{"name": "purchase_events", "agg": "count", "expr": "1"}],
}


@pytest.fixture(scope="module")
def cross_conv_views(conv_views):
    # same timeline as EVENT_ROWS, split across two tables with DIFFERENT
    # entity/time column names per side
    conv_views.sql(
        "SELECT u, ts FROM t_events WHERE k = 'signup'"
    ).createOrReplaceTempView("t_signups")
    conv_views.sql(
        "SELECT u AS buyer, ts AS pts FROM t_events WHERE k = 'purchase'"
    ).createOrReplaceTempView("t_purchases")
    return conv_views


def test_conversion_metric_cross_model(cross_conv_views):
    """Base and conversion measures on DIFFERENT semantic models sharing the
    `user` entity: each side joins through its own entity/time exprs.
    Expected counts identical to the single-model twin
    (test_conversion_metric_counts_and_rate) since the data is the same
    timeline split in two."""
    m = [{"name": "xconv", "type": "conversion", "label": "x",
          "type_params": {"conversion_type_params": {
              "base_measure": "signup_events",
              "conversion_measure": "purchase_events",
              "entity": "user", "window": "7 days",
              "calculation": "conversions"}}},
         {"name": "xrate", "type": "conversion", "label": "xr",
          "type_params": {"conversion_type_params": {
              "base_measure": "signup_events",
              "conversion_measure": "purchase_events",
              "entity": "user", "window": "7 days"}}}]
    sql = compile_metrics_sql(
        ["xconv", "xrate"], m, [SIGNUPS_SM, PURCHASES_SM],
        {"signups_t": "t_signups", "purchases_t": "t_purchases"},
        group_by=["metric_time__month"])
    rows = {str(r["metric_time__month"]): (r["xconv"], round(r["xrate"], 6))
            for r in cross_conv_views.sql(sql).collect()}
    assert rows == {"2024-01-01": (1, round(1 / 3, 6)),
                    "2024-02-01": (1, 0.5)}
    # the conversion CTE must read the conversion model's OWN table
    assert "t_purchases" in sql and "buyer" in sql


def test_derived_offset_window_period_over_period(views):
    """offset_window input: revenue vs revenue one month earlier (MetricFlow
    MetricInput.offset_window) — the prior month's aggregate re-buckets onto
    the current month's key via a shifted-time instance of the model."""
    mom = METRICS + [
        {"name": "revenue_mom", "type": "derived", "label": "mom",
         "type_params": {
             "expr": "COALESCE(cur, 0) - COALESCE(prev, 0)",
             "metrics": [
                 {"name": "revenue", "alias": "cur"},
                 {"name": "revenue", "alias": "prev",
                  "offset_window": "1 month"},
             ]}},
    ]
    sql = compile_metrics_sql(
        ["revenue_mom"], mom, [ORDERS_SM, PAYMENTS_SM], TABLES,
        group_by=["metric_time__month"])
    rows = {str(r["metric_time__month"]): r["revenue_mom"]
            for r in views.sql(sql).collect()}
    # monthly revenue: Jan 150, Feb 275, Mar 25  ->  MoM: 150, 125, -250;
    # April appears as 0 - 25 (March's shifted bucket with no current rows)
    assert rows == {"2024-01-01": 150.0, "2024-02-01": 125.0,
                    "2024-03-01": -250.0, "2024-04-01": -25.0}


def test_derived_offset_requires_time_group_by(views):
    mom = METRICS + [
        {"name": "bad_mom", "type": "derived", "label": "b",
         "type_params": {
             "expr": "cur - prev",
             "metrics": [
                 {"name": "revenue", "alias": "cur"},
                 {"name": "revenue", "alias": "prev",
                  "offset_window": "1 month"},
             ]}},
    ]
    with pytest.raises(MetricQueryError, match="time group-by"):
        compile_metrics_sql(["bad_mom"], mom, [ORDERS_SM, PAYMENTS_SM],
                            TABLES, group_by=["status"])


def test_cumulative_grain_to_date_resets(views):
    """grain_to_date: year resets the running total at year boundaries —
    add a 2025 order and assert the cumulative restarts."""
    views.createDataFrame(
        ORDERS_ROWS + [(6, 40, "2025-01-15", "F", 10.0)],
        "o_id int, o_cust int, o_date string, o_status string, o_total double",
    ).selectExpr("o_id", "o_cust", "CAST(o_date AS DATE) AS o_date",
                 "o_status", "o_total").createOrReplaceTempView("t_orders_g2d")
    mtd = [
        {"name": "ytd_revenue", "type": "cumulative", "label": "ytd",
         "type_params": {"measure": "order_total",
                         "cumulative_type_params": {"grain_to_date": "year"}}},
    ]
    sql = compile_metrics_sql(
        ["ytd_revenue"], mtd, [ORDERS_SM], {"orders": "t_orders_g2d"},
        group_by=["metric_time__month"])
    rows = sorted((str(r["metric_time__month"]), r["ytd_revenue"])
                  for r in views.sql(sql).collect())
    assert [v for _, v in rows] == [150.0, 425.0, 450.0, 10.0]


def test_conversion_metric_matches_bruteforce_random(conv_views):
    """Randomized timelines with PLANTED same-timestamp collisions: the
    compiled conversion SQL equals a brute-force python evaluation for
    BOTH fidelity modes — strict (default, conversion strictly later) and
    MetricFlow-inclusive (conversion at the same timestamp counts,
    `conversion_type_params.fidelity: inclusive`) — across several
    seeds, and the two modes demonstrably diverge on the collisions."""
    import random as _random

    spark = conv_views
    modes_diverged = False
    for seed in range(4):
        rng = _random.Random(1234 + seed)
        rows = []
        for _ in range(120):
            u = rng.randrange(0, 8)
            kind = rng.choice(["signup", "purchase", "noise"])
            # integer-second timestamps over ~40 days
            t = rng.randrange(0, 40 * 86400)
            rows.append((u, kind, t))
        # plant purchase events at EXACTLY a signup's timestamp — the case
        # where strict (>) and inclusive (>=) bounds differ
        planted = 0
        for u, kind, t in list(rows):
            if kind == "signup" and planted < 5:
                rows.append((u, "purchase", t))
                planted += 1
        spark.createDataFrame(rows, "u int, k string, sec int").selectExpr(
            "u", "k", "timestamp_seconds(sec) AS ts", "sec"
        ).createOrReplaceTempView("t_events_rand")

        expected = {"strict": 0, "inclusive": 0}
        for u, kind, t in rows:
            if kind != "signup":
                continue
            for mode, lo_ok in (("strict", lambda ct, t=t: t < ct),
                                ("inclusive", lambda ct, t=t: t <= ct)):
                if any(cu == u and ck == "purchase" and lo_ok(ct)
                       and ct <= t + 7 * 86400
                       for cu, ck, ct in rows):
                    expected[mode] += 1

        for mode in ("strict", "inclusive"):
            ctp = {"base_measure": "signups",
                   "conversion_measure": "purchases",
                   "entity": "user", "window": "7 days",
                   "calculation": "conversions"}
            if mode == "inclusive":
                ctp["fidelity"] = "inclusive"
            m = [{"name": "c", "type": "conversion", "label": "c",
                  "type_params": {"conversion_type_params": ctp}}]
            sql = compile_metrics_sql(["c"], m, [EVENTS_SM],
                                      {"events_t": "t_events_rand"})
            got = spark.sql(sql).collect()[0]["c"]
            assert got == expected[mode], (
                f"seed={seed} mode={mode}: {got} != {expected[mode]}")
        if expected["inclusive"] > expected["strict"]:
            modes_diverged = True
    # the planted collisions must actually exercise the divergence
    assert modes_diverged


def test_conversion_fidelity_validation():
    m = [{"name": "c", "type": "conversion", "label": "c",
          "type_params": {"conversion_type_params": {
              "base_measure": "signups", "conversion_measure": "purchases",
              "entity": "user", "fidelity": "metricflow"}}}]
    with pytest.raises(MetricQueryError, match="fidelity"):
        compile_metrics_sql(["c"], m, [EVENTS_SM], {"events_t": "t"})


# --------------------------------------------------------------------------
# entity-linked cross-model dimensions (_LinkedModel;
# core/dbt/artifacts/resources/v1/semantic_model.py:201-206 entity links)
# --------------------------------------------------------------------------

CUSTOMERS_SM = {
    "name": "customers_sm",
    "model": "ref('customers')",
    "entities": [{"name": "customer", "type": "primary", "expr": "c_id"}],
    "dimensions": [
        {"name": "segment", "type": "categorical", "expr": "c_segment"},
        {"name": "signup_date", "type": "time", "expr": "c_signup",
         "type_params": {"time_granularity": "day"}},
    ],
    "measures": [{"name": "customer_count", "agg": "count", "expr": "1"}],
}

LINK_TABLES = {**TABLES, "customers": "t_customers"}
LINK_MODELS = [ORDERS_SM, PAYMENTS_SM, CUSTOMERS_SM]


@pytest.fixture(scope="module")
def link_views(views):
    views.createDataFrame(
        [(10, "A", "2023-05-01"), (20, "B", "2023-06-01"),
         (30, "C", "2023-07-01")],
        "c_id int, c_segment string, c_signup string",
    ).selectExpr("c_id", "c_segment", "CAST(c_signup AS DATE) AS c_signup"
                 ).createOrReplaceTempView("t_customers")
    return views


def _run_linked(spark, metric_names, **kw):
    sql = compile_metrics_sql(
        metric_names, METRICS, LINK_MODELS, LINK_TABLES, **kw)
    return sql, spark.sql(sql)


def test_entity_linked_dimension_group_by(link_views):
    sql, df = _run_linked(link_views, ["revenue"],
                          group_by=["customer__segment"])
    rows = {r["customer__segment"]: r["revenue"] for r in df.collect()}
    # cust 10: 100+50, cust 20: 200+25, cust 30: 75
    assert rows == {"A": 150.0, "B": 225.0, "C": 75.0}
    # the hop is a single LEFT JOIN against a key+dim projection
    assert sql.count("LEFT JOIN") == 1
    assert "__ek" in sql


def test_entity_linked_dimension_in_filter(link_views):
    _, df = _run_linked(
        link_views, ["revenue"], group_by=["status"],
        where="{{ Dimension('customer__segment') }} = 'B'")
    rows = {r["status"]: r["revenue"] for r in df.collect()}
    assert rows == {"F": 200.0, "O": 25.0}


def test_entity_linked_time_dimension_with_grain(link_views):
    _, df = _run_linked(link_views, ["orders"],
                        group_by=["customer__signup_date__month"])
    rows = {str(r["customer__signup_date__month"]): r["orders"]
            for r in df.collect()}
    assert rows == {"2023-05-01": 2, "2023-06-01": 2, "2023-07-01": 1}


def test_entity_linked_mixed_with_local_dims(link_views):
    _, df = _run_linked(link_views, ["revenue"],
                        group_by=["customer__segment", "status"])
    rows = {(r["customer__segment"], r["status"]): r["revenue"]
            for r in df.collect()}
    assert rows[("A", "F")] == 100.0
    assert rows[("B", "O")] == 25.0


def test_entity_link_ambiguous_raises(link_views):
    clone = {**CUSTOMERS_SM, "name": "customers_sm_2",
             "model": "ref('customers')"}
    with pytest.raises(MetricQueryError, match="ambiguous entity link"):
        compile_metrics_sql(
            ["revenue"], METRICS, LINK_MODELS + [clone], LINK_TABLES,
            group_by=["customer__segment"])


def test_entity_link_non_unique_entity_raises(link_views):
    weak = {**CUSTOMERS_SM,
            "entities": [{"name": "customer", "type": "foreign",
                          "expr": "c_id"}]}
    with pytest.raises(MetricQueryError, match="not primary/unique"):
        compile_metrics_sql(
            ["revenue"], METRICS, [ORDERS_SM, PAYMENTS_SM, weak],
            LINK_TABLES, group_by=["customer__segment"])


def test_entity_link_unknown_dimension_still_local_error(link_views):
    with pytest.raises(MetricQueryError, match="no dimension or entity"):
        _run_linked(link_views, ["revenue"], group_by=["customer__bogus"])


# --------------------------------------------------------------------------
# join_to_timespine / fill_nulls_with (MetricInputMeasure,
# core/dbt/artifacts/resources/v1/metric.py:36-37)
# --------------------------------------------------------------------------

SPINE_METRICS = METRICS + [
    {"name": "open_revenue_spine", "type": "simple",
     "type_params": {"measure": {"name": "order_total",
                                 "join_to_timespine": True,
                                 "fill_nulls_with": 0}},
     "filter": "{{ Dimension('status') }} = 'O'"},
    {"name": "open_revenue_nullspine", "type": "simple",
     "type_params": {"measure": {"name": "order_total",
                                 "join_to_timespine": True}},
     "filter": "{{ Dimension('status') }} = 'O'"},
    {"name": "revenue_fill", "type": "simple",
     "type_params": {"measure": {"name": "order_total",
                                 "fill_nulls_with": 0}}},
]


def _run_spine(spark, metric_names, **kw):
    sql = compile_metrics_sql(
        metric_names, SPINE_METRICS, [ORDERS_SM, PAYMENTS_SM], TABLES, **kw)
    return sql, spark.sql(sql)


def test_timespine_fills_missing_periods(views):
    # 'O' orders exist in Jan and Mar only; the spine (orders' own range,
    # Jan..Mar) re-adds Feb, zero-filled
    _, df = _run_spine(views, ["open_revenue_spine"],
                       group_by=["metric_time__month"])
    rows = {str(r["metric_time__month"]): r["open_revenue_spine"]
            for r in df.collect()}
    assert rows == {"2024-01-01": 50.0, "2024-02-01": 0.0,
                    "2024-03-01": 25.0}


def test_timespine_without_fill_keeps_null(views):
    _, df = _run_spine(views, ["open_revenue_nullspine"],
                       group_by=["metric_time__month"])
    rows = {str(r["metric_time__month"]): r["open_revenue_nullspine"]
            for r in df.collect()}
    assert rows["2024-02-01"] is None
    assert rows["2024-01-01"] == 50.0


def test_timespine_crosses_non_time_dims(views):
    # panel shape: every (status × month) cell exists, gaps zero-filled
    _, df = _run_spine(views, ["open_revenue_spine"],
                       group_by=["status", "metric_time__month"])
    rows = {(r["status"], str(r["metric_time__month"])):
            r["open_revenue_spine"] for r in df.collect()}
    assert len(rows) == 6  # 2 statuses x 3 months
    assert rows[("O", "2024-01-01")] == 50.0
    assert rows[("F", "2024-03-01")] == 0.0
    assert rows[("O", "2024-02-01")] == 0.0


def test_fill_nulls_without_timespine_on_outer_join_miss(views):
    # April exists only in payments → revenue would be NULL after the
    # full-outer join; fill_nulls_with coalesces it without a spine
    _, df = _run_spine(views, ["revenue_fill", "payments"],
                       group_by=["metric_time__month"])
    rows = {str(r["metric_time__month"]): (r["revenue_fill"], r["payments"])
            for r in df.collect()}
    assert rows["2024-04-01"] == (0.0, 5.0)
    assert rows["2024-03-01"] == (25.0, None)


def test_timespine_requires_time_group_by(views):
    with pytest.raises(MetricQueryError, match="join_to_timespine"):
        _run_spine(views, ["open_revenue_spine"], group_by=["status"])


def test_timespine_spans_union_of_multiple_owners(views):
    """Two spined metrics whose measures live on DIFFERENT semantic models:
    the spine must span the UNION of both owners' time ranges (orders end
    in March, payments in April → the panel runs Jan..April for both)."""
    multi = SPINE_METRICS + [
        {"name": "payments_spine", "type": "simple",
         "type_params": {"measure": {"name": "payment_total",
                                     "join_to_timespine": True,
                                     "fill_nulls_with": 0}}},
    ]
    sql = compile_metrics_sql(
        ["open_revenue_spine", "payments_spine"], multi,
        [ORDERS_SM, PAYMENTS_SM], TABLES, group_by=["metric_time__month"])
    rows = {str(r["metric_time__month"]):
            (r["open_revenue_spine"], r["payments_spine"])
            for r in views.sql(sql).collect()}
    assert sorted(rows) == ["2024-01-01", "2024-02-01",
                            "2024-03-01", "2024-04-01"]
    assert rows["2024-04-01"] == (0.0, 5.0)   # beyond orders' own range
    assert rows["2024-02-01"] == (0.0, 210.0)
    assert rows["2024-01-01"] == (50.0, 90.0)


def test_timespine_time_item_only_on_second_spined_owner(views):
    """ADVICE r7 (metric_compile time-item detection): the group-by item is
    recognized as a TIME item only by the SECOND spined owner — the first
    owner declares a same-named dimension as categorical (still
    bounds-resolvable, so the per-owner range scan works). owners[0]-only
    detection rejected this with 'requires a time-dimension'; detection
    must consult every spined owner."""
    orders_sm = {
        **ORDERS_SM,
        "dimensions": ORDERS_SM["dimensions"] + [
            {"name": "shared_date", "type": "categorical", "expr": "o_date"},
        ],
    }
    payments_sm = {
        **PAYMENTS_SM,
        "dimensions": PAYMENTS_SM["dimensions"] + [
            {"name": "shared_date", "type": "time", "expr": "p_date",
             "type_params": {"time_granularity": "day"}},
        ],
    }
    multi = SPINE_METRICS + [
        {"name": "payments_spine", "type": "simple",
         "type_params": {"measure": {"name": "payment_total",
                                     "join_to_timespine": True,
                                     "fill_nulls_with": 0}}},
    ]
    sql = compile_metrics_sql(
        ["open_revenue_spine", "payments_spine"], multi,
        [orders_sm, payments_sm], TABLES, group_by=["shared_date"])
    rows = {str(r["shared_date"]):
            (r["open_revenue_spine"], r["payments_spine"])
            for r in views.sql(sql).collect()}
    # day-grain panel over the UNION of both owners' shared_date ranges:
    # orders span 2024-01-05..2024-03-01, payments 2024-01-06..2024-04-01
    assert len(rows) == 88  # 2024-01-05 .. 2024-04-01 inclusive
    assert rows["2024-01-20"] == (50.0, 0.0)   # open order, no payment
    assert rows["2024-02-04"] == (0.0, 210.0)  # payment-only day
    assert rows["2024-04-01"] == (0.0, 5.0)    # beyond orders' range
    assert rows["2024-01-07"] == (0.0, 0.0)    # zero-filled panel cell


def test_timespine_unresolvable_on_one_owner_names_the_model(views):
    """When the time item resolves on one spined owner but not the other,
    the error must NAME the failing model (whether raised by aggregate
    resolution or the per-owner bounds loop) — not the misleading
    'requires a time-dimension' the owners[0]-only detection produced."""
    multi = SPINE_METRICS + [
        {"name": "payments_spine", "type": "simple",
         "type_params": {"measure": {"name": "payment_total",
                                     "join_to_timespine": True,
                                     "fill_nulls_with": 0}}},
    ]
    with pytest.raises(MetricQueryError, match="orders_sm"):
        compile_metrics_sql(
            ["open_revenue_spine", "payments_spine"], multi,
            [ORDERS_SM, PAYMENTS_SM], TABLES,
            group_by=["paid_date__month"])


# --------------------------------------------------------------------------
# multi-hop entity links: a__b__dim chains (MetricFlow's multi-hop joins;
# each hop primary/unique-guarded, cycle-cut, ambiguity-diagnosed)
# --------------------------------------------------------------------------

CUSTOMERS2_SM = {
    "name": "customers2_sm",
    "model": "ref('customers2')",
    "entities": [
        {"name": "customer", "type": "primary", "expr": "c_id"},
        {"name": "region", "type": "foreign", "expr": "c_region_id"},
    ],
    "dimensions": [
        {"name": "segment", "type": "categorical", "expr": "c_segment"},
    ],
    "measures": [{"name": "c2_count", "agg": "count", "expr": "1"}],
}

REGIONS_SM = {
    "name": "regions_sm",
    "model": "ref('regions')",
    "entities": [{"name": "region", "type": "primary", "expr": "r_id"}],
    "dimensions": [
        {"name": "region_name", "type": "categorical", "expr": "r_name"},
        {"name": "founded", "type": "time", "expr": "r_founded",
         "type_params": {"time_granularity": "day"}},
    ],
    "measures": [{"name": "region_count", "agg": "count", "expr": "1"}],
}

HOP_TABLES = {**TABLES, "customers2": "t_customers2", "regions": "t_regions"}
HOP_MODELS = [ORDERS_SM, PAYMENTS_SM, CUSTOMERS2_SM, REGIONS_SM]


@pytest.fixture(scope="module")
def hop_views(views):
    views.createDataFrame(
        [(10, "A", 1), (20, "B", 1), (30, "C", 2)],
        "c_id int, c_segment string, c_region_id int",
    ).createOrReplaceTempView("t_customers2")
    views.createDataFrame(
        [(1, "EMEA", "1999-02-01"), (2, "APAC", "2004-09-15")],
        "r_id int, r_name string, r_founded string",
    ).selectExpr("r_id", "r_name", "CAST(r_founded AS DATE) AS r_founded"
                 ).createOrReplaceTempView("t_regions")
    return views


def _run_hops(spark, metric_names, models=None, **kw):
    sql = compile_metrics_sql(
        metric_names, METRICS, models or HOP_MODELS, HOP_TABLES, **kw)
    return sql, spark.sql(sql)


def test_two_hop_dimension_group_by(hop_views):
    sql, df = _run_hops(hop_views, ["revenue"],
                        group_by=["customer__region__region_name"])
    rows = {r["customer__region__region_name"]: r["revenue"]
            for r in df.collect()}
    # cust 10,20 -> region 1 (EMEA): 100+50+200+25; cust 30 -> APAC: 75
    assert rows == {"EMEA": 375.0, "APAC": 75.0}
    # two nested LEFT JOINs: fact->customers2 and customers2->regions
    assert sql.count("LEFT JOIN") == 2


def test_two_hop_in_filter_and_mixed_group_by(hop_views):
    _, df = _run_hops(
        hop_views, ["revenue"],
        group_by=["customer__segment", "customer__region__region_name"],
        where="{{ Dimension('customer__region__region_name') }} = 'EMEA'")
    rows = {(r["customer__segment"], r["customer__region__region_name"]):
            r["revenue"] for r in df.collect()}
    assert rows == {("A", "EMEA"): 150.0, ("B", "EMEA"): 225.0}


def test_two_hop_time_dimension_with_grain(hop_views):
    sql, df = _run_hops(hop_views, ["orders"],
                        group_by=["customer__region__founded__month"])
    rows = {str(r["customer__region__founded__month"]): r["orders"]
            for r in df.collect()}
    assert rows == {"1999-02-01": 4, "2004-09-01": 1}


def test_two_hop_ambiguous_second_hop_raises(hop_views):
    clone = {**REGIONS_SM, "name": "regions_sm_2", "model": "ref('regions')"}
    with pytest.raises(MetricQueryError, match="ambiguous entity link"):
        compile_metrics_sql(
            ["revenue"], METRICS, HOP_MODELS + [clone], HOP_TABLES,
            group_by=["customer__region__region_name"])


def test_two_hop_non_unique_second_hop_raises(hop_views):
    weak = {**REGIONS_SM,
            "entities": [{"name": "region", "type": "foreign",
                          "expr": "r_id"}]}
    with pytest.raises(MetricQueryError, match="not primary/unique"):
        compile_metrics_sql(
            ["revenue"], METRICS, [ORDERS_SM, CUSTOMERS2_SM, weak],
            HOP_TABLES, group_by=["customer__region__region_name"])


def test_entity_cycle_diagnoses_instead_of_recursing(hop_views):
    """customers2 and regions each carry the OTHER side's entity too, so a
    bogus chain walks a->b->a->...: the visited set cuts the cycle and the
    unresolvable item diagnoses as a normal resolution error."""
    c_cyc = {**CUSTOMERS2_SM,
             "entities": CUSTOMERS2_SM["entities"]
             + [{"name": "rc_link", "type": "unique", "expr": "c_id"}]}
    r_cyc = {**REGIONS_SM,
             "entities": REGIONS_SM["entities"]
             + [{"name": "rc_link", "type": "unique", "expr": "r_id"}],
             "dimensions": REGIONS_SM["dimensions"]}
    with pytest.raises(MetricQueryError, match="no dimension or entity"):
        compile_metrics_sql(
            ["revenue"], METRICS, [ORDERS_SM, c_cyc, r_cyc], HOP_TABLES,
            group_by=["customer__rc_link__rc_link__rc_link__bogus"])


# --------------------------------------------------------------------------
# user-declared time-spine models + custom granularities (reference
# model-level time_spine: config, core/dbt/artifacts/resources/v1/model.py:
# 26-35 TimeSpine/CustomGranularity, parsed core/dbt/parser/schemas.py:730-744)
# --------------------------------------------------------------------------

SPINE_DECL = {
    "model": "all_days",
    "standard_granularity_column": "date_day",
    "granularity": "day",
    "custom_granularities": [
        {"name": "fiscal_quarter", "column_name": "fq"},
        {"name": "retail_week"},
    ],
}

SPINE_TABLES = {**TABLES, "all_days": "t_all_days"}


@pytest.fixture(scope="module")
def spine_views(views):
    # day spine Dec 2023 .. Apr 2024 — wider than orders' own Jan..Mar
    # range — with a fiscal calendar column (fiscal year starts Dec 1)
    views.sql("""
        SELECT explode(sequence(DATE'2023-12-01', DATE'2024-04-30',
                                INTERVAL 1 DAY)) AS date_day
    """).selectExpr(
        "date_day",
        "concat('FY', year(date_day + INTERVAL 1 MONTH), 'Q', "
        "quarter(date_day + INTERVAL 1 MONTH)) AS fq",
        "weekofyear(date_day) AS retail_week",
    ).createOrReplaceTempView("t_all_days")
    return views


def _run_decl_spine(spark, metric_names, **kw):
    sql = compile_metrics_sql(
        metric_names, SPINE_METRICS, [ORDERS_SM, PAYMENTS_SM], SPINE_TABLES,
        time_spines=[SPINE_DECL], **kw)
    return sql, spark.sql(sql)


def test_declared_timespine_replaces_generated(spine_views):
    """With a declared spine the panel spans the SPINE's range (Dec..Apr),
    not the measure owner's own min/max, and no sequence() is generated."""
    sql, df = _run_decl_spine(spine_views, ["open_revenue_spine"],
                              group_by=["metric_time__month"])
    rows = {str(r["metric_time__month"]): r["open_revenue_spine"]
            for r in df.collect()}
    assert sorted(rows) == ["2023-12-01", "2024-01-01", "2024-02-01",
                            "2024-03-01", "2024-04-01"]
    assert rows["2023-12-01"] == 0.0 and rows["2024-01-01"] == 50.0
    assert "t_all_days" in sql and "sequence(" not in sql


def test_no_declared_spine_falls_back_to_generated(spine_views):
    sql, df = _run_spine(spine_views, ["open_revenue_spine"],
                         group_by=["metric_time__month"])
    assert "sequence(" in sql and "t_all_days" not in sql
    assert df.count() == 3  # orders' own Jan..Mar range


def test_custom_granularity_group_by(spine_views):
    """Group-by at a custom granularity: the fact's time dim joins the
    spine at day grain and groups by the fiscal-quarter column."""
    sql = compile_metrics_sql(
        ["revenue"], METRICS, [ORDERS_SM, PAYMENTS_SM], SPINE_TABLES,
        group_by=["metric_time__fiscal_quarter"], time_spines=[SPINE_DECL])
    rows = {r["metric_time__fiscal_quarter"]: r["revenue"]
            for r in spine_views.sql(sql).collect()}
    # fiscal year starts Dec 1: Jan+Feb 2024 -> FY2024Q1, Mar -> FY2024Q2
    assert rows == {"FY2024Q1": 425.0, "FY2024Q2": 25.0}
    assert "LEFT JOIN" in sql


def test_custom_granularity_without_column_name_uses_name(spine_views):
    sql = compile_metrics_sql(
        ["orders"], METRICS, [ORDERS_SM, PAYMENTS_SM], SPINE_TABLES,
        group_by=["metric_time__retail_week"], time_spines=[SPINE_DECL])
    got = {r["metric_time__retail_week"]: r["orders"]
           for r in spine_views.sql(sql).collect()}
    assert sum(got.values()) == 5 and all(isinstance(k, int) for k in got)


def test_custom_granularity_with_timespine_fill(spine_views):
    """join_to_timespine at a custom granularity: quarters with no pending
    orders still appear, zero-filled, enumerated from the spine itself."""
    sql, df = _run_decl_spine(spine_views, ["open_revenue_spine"],
                              group_by=["metric_time__fiscal_quarter"])
    rows = {r["metric_time__fiscal_quarter"]: r["open_revenue_spine"]
            for r in df.collect()}
    # spine covers FY2024Q1 (Dec-Feb) and FY2024Q2 (Mar-May window part)
    assert rows == {"FY2024Q1": 50.0, "FY2024Q2": 25.0}


def test_custom_granularity_unknown_name_raises(spine_views):
    with pytest.raises(MetricQueryError, match="no dimension or entity"):
        compile_metrics_sql(
            ["revenue"], METRICS, [ORDERS_SM, PAYMENTS_SM], SPINE_TABLES,
            group_by=["metric_time__bogus_gran"], time_spines=[SPINE_DECL])


def test_custom_granularity_on_non_time_base_raises(spine_views):
    with pytest.raises(MetricQueryError, match="time dimension"):
        compile_metrics_sql(
            ["revenue"], METRICS, [ORDERS_SM, PAYMENTS_SM], SPINE_TABLES,
            group_by=["status__fiscal_quarter"], time_spines=[SPINE_DECL])


def test_custom_granularity_declared_twice_raises(spine_views):
    dup = {**SPINE_DECL, "model": "all_days_2"}
    with pytest.raises(MetricQueryError, match="multiple"):
        compile_metrics_sql(
            ["revenue"], METRICS, [ORDERS_SM, PAYMENTS_SM],
            {**SPINE_TABLES, "all_days_2": "t_all_days"},
            group_by=["metric_time__fiscal_quarter"],
            time_spines=[SPINE_DECL, dup])


def test_declared_spine_too_coarse_raises(spine_views):
    coarse = {"model": "all_months", "standard_granularity_column": "m",
              "granularity": "month", "custom_granularities": []}
    with pytest.raises(MetricQueryError, match="fine enough"):
        compile_metrics_sql(
            ["open_revenue_spine"], SPINE_METRICS, [ORDERS_SM, PAYMENTS_SM],
            {**SPINE_TABLES, "all_months": "t_all_days"},
            group_by=["metric_time__day"], time_spines=[coarse])


def test_declared_spine_missing_table_raises(spine_views):
    with pytest.raises(MetricQueryError, match="no table registered"):
        sql = compile_metrics_sql(
            ["open_revenue_spine"], SPINE_METRICS, [ORDERS_SM, PAYMENTS_SM],
            TABLES, group_by=["metric_time__month"],
            time_spines=[SPINE_DECL])


SPINE_PROJECT_FILES = {
    "dbt_project.yml": "name: sl2\nmodel-paths: ['models']\nseed-paths: ['seeds']\n",
    "seeds/raw_orders.csv": (
        "o_id,o_cust,o_date,o_status,o_total\n"
        "1,10,2024-01-05,F,100\n2,10,2024-01-20,O,50\n"
        "3,20,2024-02-03,F,200\n4,30,2024-02-10,F,75\n5,20,2024-03-01,O,25\n"
    ),
    "models/orders.sql": "select * from {{ ref('raw_orders') }}",
    "models/all_days.sql": (
        "select date_day,\n"
        "  concat('FY', year(date_day + interval 1 month), 'Q',\n"
        "         quarter(date_day + interval 1 month)) as fq\n"
        "from (select explode(sequence(date'2023-12-01', date'2024-04-30',\n"
        "                              interval 1 day)) as date_day)"
    ),
    "models/schema.yml": """
version: 2
models:
  - name: all_days
    time_spine:
      standard_granularity_column: date_day
      custom_granularities:
        - name: fiscal_quarter
          column_name: fq
    columns:
      - name: date_day
        granularity: day
""",
    "models/semantic.yml": """
version: 2
semantic_models:
  - name: orders_sm
    model: ref('orders')
    defaults: {agg_time_dimension: order_date}
    entities:
      - {name: order_id, type: primary, expr: o_id}
    dimensions:
      - {name: order_date, type: time, expr: "CAST(o_date AS DATE)", type_params: {time_granularity: day}}
      - {name: status, type: categorical, expr: o_status}
    measures:
      - {name: order_total, agg: sum, expr: o_total}
metrics:
  - name: revenue_spined
    label: rs
    type: simple
    type_params:
      measure: {name: order_total, join_to_timespine: true, fill_nulls_with: 0}
""",
}


def test_engine_declared_time_spine_model(project_dir, spark):
    """End-to-end through the Engine: a model carrying the YAML
    ``time_spine:`` config is picked up by _semantic_inputs, its table
    feeds join_to_timespine (panel spans the SPINE's Dec..Apr range), and
    custom-granularity group-bys resolve through it."""
    root = project_dir(SPINE_PROJECT_FILES)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["build"]).success
    node = eng.manifest.nodes["model.sl2.all_days"]
    ts = node.config.meta["time_spine"]
    assert ts["standard_granularity_column"] == "date_day"
    assert ts["custom_granularities"][0] == {
        "name": "fiscal_quarter", "column_name": "fq"}
    rows = {str(r["metric_time__month"]): r["revenue_spined"]
            for r in eng.query_metrics(
                ["revenue_spined"],
                group_by=["metric_time__month"]).collect()}
    assert sorted(rows) == ["2023-12-01", "2024-01-01", "2024-02-01",
                            "2024-03-01", "2024-04-01"]
    assert rows["2023-12-01"] == 0.0 and rows["2024-02-03"[:7] + "-01"] == 275.0
    fiscal = {r["metric_time__fiscal_quarter"]: r["revenue_spined"]
              for r in eng.query_metrics(
                  ["revenue_spined"],
                  group_by=["metric_time__fiscal_quarter"]).collect()}
    assert fiscal == {"FY2024Q1": 425.0, "FY2024Q2": 25.0}


# --------------------------------------------------------------------------
# randomized semantic-layer differential family: random worlds + random
# metric specs (simple/filtered/ratio/derived/cumulative/offset/timespine/
# custom-grain/entity-hop/two-hop) compiled by plans/metric_compile.py and
# checked against an independent pandas oracle — generalizes the seeded
# conversion brute-force above. Seed bases rotate with DBT_SPARK_FUZZ_OFFSET
# like tests/test_differential_fuzz.py's families.
# --------------------------------------------------------------------------

import datetime as _dt
import math as _math
import os as _os
import random as _random

import pandas as _pd

_FUZZ_OFF = int(_os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))

_FUZZ_FACT_SM = {
    "name": "fact_sm",
    "model": "ref('fact')",
    "defaults": {"agg_time_dimension": "d"},
    "entities": [
        {"name": "order", "type": "primary", "expr": "o_id"},
        {"name": "customer", "type": "foreign", "expr": "cust"},
    ],
    "dimensions": [
        {"name": "d", "type": "time", "expr": "d",
         "type_params": {"time_granularity": "day"}},
        {"name": "status", "type": "categorical", "expr": "status"},
    ],
    "measures": [
        {"name": "amt_sum", "agg": "sum", "expr": "amount"},
        {"name": "qty_sum", "agg": "sum", "expr": "qty"},
        {"name": "n_rows", "agg": "count", "expr": "1"},
        {"name": "amt_sum_a", "agg": "sum", "expr": "amount",
         "filter": "{{ Dimension('status') }} = 'A'"},
        {"name": "n_rows_a", "agg": "count", "expr": "1",
         "filter": "{{ Dimension('status') }} = 'A'"},
        {"name": "n_rows_b", "agg": "count", "expr": "1",
         "filter": "{{ Dimension('status') }} = 'B'"},
        {"name": "amt_last", "agg": "sum", "expr": "amount",
         "non_additive_dimension": {
             "name": "d", "window_choice": "max",
             "window_groupings": ["customer"]}},
        {"name": "amt_first", "agg": "sum", "expr": "amount",
         "non_additive_dimension": {
             "name": "d", "window_choice": "min",
             "window_groupings": ["customer"]}},
        {"name": "amt_p50d", "agg": "percentile", "expr": "amount",
         "agg_params": {"percentile": 0.5,
                        "use_discrete_percentile": True}},
        {"name": "amt_avg", "agg": "average", "expr": "amount",
         "create_metric": True},
    ],
}

_FUZZ_FACT2_SM = {
    "name": "fact2_sm",
    "model": "ref('fact2')",
    "defaults": {"agg_time_dimension": "d2"},
    "entities": [
        {"name": "pay", "type": "primary", "expr": "p_id"},
        {"name": "customer", "type": "foreign", "expr": "cust2"},
    ],
    "dimensions": [
        {"name": "d2", "type": "time", "expr": "d2",
         "type_params": {"time_granularity": "day"}},
        {"name": "status", "type": "categorical", "expr": "status2"},
    ],
    "measures": [
        {"name": "pay_sum", "agg": "sum", "expr": "paid"},
        {"name": "pay_n", "agg": "count", "expr": "1"},
    ],
}

_FUZZ_CUST_SM = {
    "name": "cust_sm",
    "model": "ref('customers')",
    "entities": [
        {"name": "customer", "type": "primary", "expr": "c_id"},
        {"name": "region", "type": "foreign", "expr": "region_id"},
    ],
    "dimensions": [
        {"name": "segment", "type": "categorical", "expr": "segment"}],
    "measures": [{"name": "c_n", "agg": "count", "expr": "1"}],
}

_FUZZ_REGION_SM = {
    "name": "region_sm",
    "model": "ref('regions')",
    "entities": [{"name": "region", "type": "primary", "expr": "r_id"}],
    "dimensions": [{"name": "rname", "type": "categorical", "expr": "rname"}],
    "measures": [{"name": "r_n", "agg": "count", "expr": "1"}],
}

_FUZZ_MODELS = [_FUZZ_FACT_SM, _FUZZ_FACT2_SM, _FUZZ_CUST_SM,
                _FUZZ_REGION_SM]


def _fuzz_world(rng):
    n_cust = rng.randrange(3, 6)
    customers = [(c, rng.choice("XYZ"), rng.randrange(2))
                 for c in range(n_cust)]
    regions = [(0, "north"), (1, "south")]
    base = _dt.date(2024, 1, 1)
    rows = [
        (i, rng.randrange(n_cust),
         base + _dt.timedelta(days=rng.randrange(0, 100)),
         rng.choice("ABC"), rng.randrange(1, 50), rng.randrange(1, 5))
        for i in range(rng.randrange(25, 45))
    ]
    # second fact table on a different (overlapping-but-wider) date range;
    # cust2 keys it to customers so cross-model conversion can join on the
    # shared `customer` entity
    rows2 = [
        (i, rng.randrange(n_cust),
         base + _dt.timedelta(days=rng.randrange(30, 130)),
         rng.choice("ABC"), rng.randrange(1, 30))
        for i in range(rng.randrange(10, 25))
    ]
    # user-declared day spine with a PYTHON-computed fiscal-quarter label
    # (fiscal year starts Feb): both engines consume the same literal rows,
    # so no cross-dialect date-arithmetic ambiguity sneaks into the oracle
    spine = []
    day = base
    while day <= _dt.date(2024, 4, 30):
        shifted = day + _dt.timedelta(days=31)
        spine.append((day, f"FY{shifted.year}Q{(shifted.month - 1) // 3 + 1}"))
        day += _dt.timedelta(days=1)
    return rows, rows2, customers, regions, spine


def _fuzz_register(spark, rows, rows2, customers, regions, spine):
    spark.createDataFrame(
        rows, "o_id long, cust long, d date, status string, amount long, qty long"
    ).createOrReplaceTempView("fz_fact")
    spark.createDataFrame(
        rows2, "p_id long, cust2 long, d2 date, status2 string, paid long"
    ).createOrReplaceTempView("fz_fact2")
    spark.createDataFrame(
        customers, "c_id long, segment string, region_id long"
    ).createOrReplaceTempView("fz_customers")
    spark.createDataFrame(
        regions, "r_id long, rname string").createOrReplaceTempView("fz_regions")
    spark.createDataFrame(
        spine, "date_day date, fq string").createOrReplaceTempView("fz_spine")


_FUZZ_TABLES = {"fact": "fz_fact", "fact2": "fz_fact2",
                "customers": "fz_customers",
                "regions": "fz_regions", "fiscal_days": "fz_spine"}

_FUZZ_SPINE_DECL = {
    "model": "fiscal_days",
    "standard_granularity_column": "date_day",
    "granularity": "day",
    "custom_granularities": [{"name": "fiscal_q", "column_name": "fq"}],
}


def _fuzz_keys(group_by, fact, cust_map, seg_map, reg_map, fq_map):
    """Resolve group-by items into per-row key columns (pandas)."""
    out = {}
    for item in group_by:
        if item == "status":
            out[item] = fact["status"]
        elif item == "metric_time__month":
            out[item] = fact["d"].map(lambda v: v.replace(day=1))
        elif item == "metric_time__fiscal_q":
            out[item] = fact["d"].map(fq_map)
        elif item == "customer__segment":
            out[item] = fact["cust"].map(seg_map)
        elif item == "customer__region__rname":
            out[item] = fact["cust"].map(cust_map).map(reg_map)
        else:  # pragma: no cover
            raise AssertionError(item)
    return _pd.DataFrame(out) if out else None


def _fuzz_measure(work, measure):
    """Grouped measure value per the engine's CASE-WHEN-inside-aggregate
    semantics: COUNT of no matches is 0, SUM of no matches is NULL."""
    name = {"amt_sum": ("sum", "amount", None),
            "qty_sum": ("sum", "qty", None),
            "n_rows": ("count", None, None),
            "amt_sum_a": ("sum", "amount", "A"),
            "n_rows_a": ("count", None, "A")}[measure]
    agg, col, filt = name

    def f(g):
        rows = g if filt is None else g[g["status"] == filt]
        if agg == "count":
            return len(rows)
        return rows[col].sum() if len(rows) else None

    return f


def _fuzz_grouped(work, keys, value_fn):
    """[(key_tuple, value)] with engine grouping semantics."""
    if keys is None:
        return {(): value_fn(work)}
    kcols = [f"__k_{c}" for c in keys.columns]
    w = work.join(keys.set_axis(kcols, axis=1))
    out = {}
    for kt, g in w.groupby(kcols, dropna=False, sort=False):
        if not isinstance(kt, tuple):
            kt = (kt,)
        out[kt] = value_fn(g)
    return out


def _fuzz_norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if _math.isnan(v):
            return None
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return str(v)[:10]
    if isinstance(v, _pd.Timestamp):
        return str(v)[:10]
    return v


def _fuzz_rows(mapping):
    return sorted(
        (tuple(_fuzz_norm(k) for k in kt) + (_fuzz_norm(v),)
         for kt, v in mapping.items()),
        key=lambda t: tuple(str(x) for x in t))


def _fuzz_spark_rows(df, group_by, metric):
    cols = list(group_by) + [metric]
    out = {}
    for r in df.select(*cols).collect():
        out[tuple(r[c] for c in group_by)] = r[metric]
    return _fuzz_rows(out)


@pytest.mark.parametrize("seed", range(64))
def test_semantic_layer_differential_random(spark, seed):
    rng = _random.Random(_FUZZ_OFF + 777_000 + seed)
    rows, rows2, customers, regions, spine = _fuzz_world(rng)
    _fuzz_register(spark, rows, rows2, customers, regions, spine)
    fact = _pd.DataFrame(
        rows, columns=["o_id", "cust", "d", "status", "amount", "qty"])
    seg_map = {c: s for c, s, _ in customers}
    cust_map = {c: r for c, _, r in customers}
    reg_map = dict(regions)
    fq_map = dict(spine)

    # composed kinds (round-8 depth pass) combine two orthogonal features
    # in one spec: non_additive_hop (semi-additive × entity hop),
    # conversion_hop (conversion × entity hop), cum_filtered (cumulative ×
    # measure filter), timespine_filtered (zero-fill spine × metric
    # filter), plus two REJECTION compositions pinning documented
    # constraints (ratio_of_cumulative, offset at custom grain)
    kind = rng.choice(
        ["simple", "simple_filtered", "ratio", "derived", "cumulative",
         "offset", "timespine", "custom_grain", "hop", "two_hop",
         "multi_model", "offset_grain", "cum_custom", "conversion",
         "non_additive", "ratio_input", "percentile_disc", "proxy",
         "non_additive_hop", "conversion_hop", "cum_filtered",
         "timespine_filtered", "ratio_of_cumulative",
         "offset_custom_grain"])

    if kind == "ratio_of_cumulative":
        # composition REJECTION: a cumulative metric cannot feed a ratio /
        # derived input (its running window applies at query level)
        metrics = [
            {"name": "cum_m", "type": "cumulative",
             "type_params": {"measure": "amt_sum"}},
            {"name": "m", "type": "ratio",
             "type_params": {"numerator": {"name": "cum_m"},
                             "denominator": "n_rows"}}]
        with pytest.raises(MetricQueryError, match="cumulative"):
            compile_metrics_sql(["m"], metrics, _FUZZ_MODELS, _FUZZ_TABLES,
                                group_by=["metric_time__month"])
        return
    if kind == "offset_custom_grain":
        # composition REJECTION: offset inputs need a standard time
        # group-by — a custom-granularity item is not an offset anchor
        metrics = [
            {"name": "cur_m", "type": "simple",
             "type_params": {"measure": "amt_sum"}},
            {"name": "m", "type": "derived",
             "type_params": {"expr": "cur - prev",
                             "metrics": [
                                 {"name": "cur_m", "alias": "cur"},
                                 {"name": "cur_m", "alias": "prev",
                                  "offset_window": "1 month"}]}}]
        with pytest.raises(MetricQueryError, match="time group-by"):
            compile_metrics_sql(["m"], metrics, _FUZZ_MODELS, _FUZZ_TABLES,
                                group_by=["metric_time__fiscal_q"],
                                time_spines=[_FUZZ_SPINE_DECL])
        return
    plain_groups = [["status"], ["metric_time__month"],
                    ["status", "metric_time__month"], []]
    measure = rng.choice(["amt_sum", "qty_sum", "n_rows"])
    spines = None
    order_by = None

    if kind in ("simple", "simple_filtered", "ratio", "derived",
                "conversion", "non_additive", "ratio_input",
                "percentile_disc", "proxy"):
        group_by = rng.choice(plain_groups)
    elif kind in ("cumulative", "offset", "offset_grain", "cum_filtered"):
        group_by = rng.choice([["metric_time__month"],
                               ["status", "metric_time__month"]])
    elif kind in ("non_additive_hop", "conversion_hop"):
        group_by = rng.choice([["customer__segment"],
                               ["customer__segment", "status"]])
    elif kind in ("timespine", "timespine_filtered"):
        group_by = rng.choice([["metric_time__month"],
                               ["status", "metric_time__month"]])
    elif kind == "custom_grain":
        group_by = ["metric_time__fiscal_q"]
        spines = [_FUZZ_SPINE_DECL]
    elif kind == "cum_custom":
        group_by = rng.choice([["metric_time__fiscal_q"],
                               ["status", "metric_time__fiscal_q"]])
        spines = [_FUZZ_SPINE_DECL]
    elif kind == "hop":
        group_by = rng.choice([["customer__segment"],
                               ["customer__segment", "status"]])
    elif kind == "two_hop":
        group_by = [rng.choice([["customer__region__rname"]])[0]]
    else:  # multi_model: items must resolve on BOTH semantic models
        group_by = rng.choice([["metric_time__month"], ["status"],
                               ["status", "metric_time__month"]])

    if kind == "simple_filtered":
        measure = rng.choice(["amt_sum_a", "n_rows_a"])
        metrics = [{"name": "m", "type": "simple",
                    "type_params": {"measure": measure}}]
    elif kind == "ratio":
        metrics = [{"name": "m", "type": "ratio",
                    "type_params": {"numerator": "amt_sum",
                                    "denominator": "n_rows"}}]
    elif kind == "derived":
        metrics = [
            {"name": "a_m", "type": "simple",
             "type_params": {"measure": "amt_sum"}},
            {"name": "q_m", "type": "simple",
             "type_params": {"measure": "qty_sum"}},
            {"name": "m", "type": "derived",
             "type_params": {"expr": "a + 2 * q",
                             "metrics": [{"name": "a_m", "alias": "a"},
                                         {"name": "q_m", "alias": "q"}]}},
        ]
    elif kind == "cumulative":
        cum_window = rng.choice([None, "2 months"])
        tp_c = {"measure": measure}
        if cum_window:
            tp_c["window"] = cum_window
        metrics = [{"name": "m", "type": "cumulative",
                    "type_params": tp_c}]
    elif kind == "cum_custom":
        period_agg = rng.choice(["first", "last", "average"])
        metrics = [{"name": "m", "type": "cumulative",
                    "type_params": {"measure": measure,
                                    "cumulative_type_params":
                                        {"period_agg": period_agg}}}]
    elif kind == "offset":
        off_window = rng.choice(["1 month", "14 days"])
        metrics = [
            {"name": "cur_m", "type": "simple",
             "type_params": {"measure": measure}},
            {"name": "m", "type": "derived",
             "type_params": {"expr": "cur - prev",
                             "metrics": [
                                 {"name": "cur_m", "alias": "cur"},
                                 {"name": "cur_m", "alias": "prev",
                                  "offset_window": off_window}]}},
        ]
    elif kind == "offset_grain":
        metrics = [
            {"name": "cur_m", "type": "simple",
             "type_params": {"measure": measure}},
            {"name": "m", "type": "derived",
             "type_params": {"expr": "cur - anchor",
                             "metrics": [
                                 {"name": "cur_m", "alias": "cur"},
                                 {"name": "cur_m", "alias": "anchor",
                                  "offset_to_grain": "quarter"}]}},
        ]
    elif kind == "timespine":
        metrics = [{"name": "m", "type": "simple",
                    "type_params": {"measure": {
                        "name": measure, "join_to_timespine": True,
                        "fill_nulls_with": 0}}}]
    elif kind == "multi_model":
        metrics = [
            {"name": "m", "type": "simple",
             "type_params": {"measure": measure}},
            {"name": "m2", "type": "simple",
             "type_params": {"measure": "pay_sum"}},
        ]
    elif kind in ("non_additive", "non_additive_hop"):
        # semi-additive measure: sum of amount over each customer's rows at
        # the MIN/MAX of d — per queried month bucket when the group-by has
        # a time item, globally otherwise; the _hop variant groups by an
        # entity-linked dimension (customer__segment), composing the NAD
        # window with the cross-model join path
        nad_choice = rng.choice(["min", "max"])
        measure = "amt_first" if nad_choice == "min" else "amt_last"
        metrics = [{"name": "m", "type": "simple",
                    "type_params": {"measure": measure}}]
    elif kind == "cum_filtered":
        # cumulative × measure-level filter: buckets with no status-A rows
        # aggregate to NULL and the running/trailing window must skip them
        cum_window = rng.choice([None, "2 months"])
        tp_c = {"measure": "amt_sum_a"}
        if cum_window:
            tp_c["window"] = cum_window
        metrics = [{"name": "m", "type": "cumulative",
                    "type_params": tp_c}]
    elif kind == "timespine_filtered":
        # zero-fill spine × metric-level filter: the panel spans the FULL
        # fact's time range while values come from the filtered subset
        metrics = [{"name": "m", "type": "simple",
                    "filter": "{{ Dimension('status') }} = 'A'",
                    "type_params": {"measure": {
                        "name": measure, "join_to_timespine": True,
                        "fill_nulls_with": 0}}}]
    elif kind == "percentile_disc":
        # SQL-standard discrete percentile: smallest value whose cume_dist
        # >= p (PERCENTILE_DISC WITHIN GROUP; v1/semantic_model.py
        # MeasureAggregationParameters.use_discrete_percentile)
        metrics = [{"name": "m", "type": "simple",
                    "type_params": {"measure": "amt_p50d"}}]
    elif kind == "proxy":
        # create_metric: true — the measure IS the metric, no declared
        # metric entry at all (Measure.create_metric)
        metrics = []
    elif kind == "ratio_input":
        # ratio legs as MetricInput refs: numerator = metric narrowed by an
        # input-level filter, denominator = the same metric unfiltered
        metrics = [
            {"name": "a_m", "type": "simple",
             "type_params": {"measure": "amt_sum"}},
            {"name": "m", "type": "ratio",
             "type_params": {
                 "numerator": {"name": "a_m",
                               "filter": "{{ Dimension('status') }} = 'A'"},
                 "denominator": {"name": "a_m"}}},
        ]
    elif kind in ("conversion", "conversion_hop"):
        # base events on fact; conversion events either later same-model
        # status-B rows or cross-model fact2 rows, linked on the shared
        # `customer` entity — exercising window, calculation, fidelity
        # (strict default vs MetricFlow-inclusive >=), and the
        # cross-model entity-resolution path of the compiler
        conv_cross = rng.random() < 0.5
        conv_calc = rng.choice(["conversions", "conversion_rate"])
        conv_win = rng.choice([None, "7 days", "1 month"])
        conv_base = rng.choice(["n_rows", "n_rows_a"])
        conv_fid = rng.choice(["strict", "inclusive"])
        # plant same-date conversion events for a few base rows — where
        # the strict (>) and inclusive (>=) join bounds diverge (incl.
        # the self-conversion case when both measures share the model)
        nid = max(r[0] for r in rows) + 1
        nid2 = (max(r[0] for r in rows2) + 1) if rows2 else 0
        for r in rng.sample(rows, k=min(4, len(rows))):
            if conv_cross:
                rows2.append((nid2, r[1], r[2], rng.choice("ABC"),
                              rng.randrange(1, 30)))
                nid2 += 1
            else:
                rows.append((nid, r[1], r[2], "B", rng.randrange(1, 50),
                             rng.randrange(1, 5)))
                nid += 1
        _fuzz_register(spark, rows, rows2, customers, regions, spine)
        fact = _pd.DataFrame(
            rows, columns=["o_id", "cust", "d", "status", "amount", "qty"])
        ctp = {"base_measure": conv_base,
               "conversion_measure": "pay_n" if conv_cross else "n_rows_b",
               "entity": "customer", "calculation": conv_calc}
        if conv_win:
            ctp["window"] = conv_win
        if conv_fid == "inclusive":
            ctp["fidelity"] = "inclusive"
        metrics = [{"name": "m", "type": "conversion",
                    "type_params": {"conversion_type_params": ctp}}]
    else:  # simple / custom_grain / hop / two_hop
        metrics = [{"name": "m", "type": "simple",
                    "type_params": {"measure": measure}}]

    names = (["m", "m2"] if kind == "multi_model"
             else ["amt_avg"] if kind == "proxy" else ["m"])
    sql = compile_metrics_sql(names, metrics, _FUZZ_MODELS, _FUZZ_TABLES,
                              group_by=group_by, order_by=order_by,
                              time_spines=spines)
    if kind == "multi_model":
        # two legs FULL OUTER joined on the group keys: rows exist for the
        # UNION of both models' key combos; the missing side is NULL
        got_rows = {}
        for r in spark.sql(sql).collect():
            got_rows[tuple(r[c] for c in group_by)] = (r["m"], r["m2"])
        got = sorted(
            (tuple(_fuzz_norm(k) for k in kt)
             + (_fuzz_norm(v[0]), _fuzz_norm(v[1]))
             for kt, v in got_rows.items()),
            key=lambda t: tuple(str(x) for x in t))
        fact2 = _pd.DataFrame(
            rows2, columns=["p_id", "cust2", "d2", "status2", "paid"])
        keys_a = _fuzz_keys(group_by, fact, cust_map, seg_map, reg_map,
                            fq_map)
        kb = {}
        for item in group_by:
            if item == "status":
                kb[item] = fact2["status2"]
            else:
                kb[item] = fact2["d2"].map(lambda v: v.replace(day=1))
        keys_b = _pd.DataFrame(kb)
        leg_a = _fuzz_grouped(fact, keys_a, _fuzz_measure(fact, measure))
        leg_b = _fuzz_grouped(
            fact2, keys_b,
            lambda g: g["paid"].sum() if len(g) else None)
        want2 = {}
        for kt in set(leg_a) | set(leg_b):
            want2[kt] = (leg_a.get(kt), leg_b.get(kt))
        want_rows = sorted(
            (tuple(_fuzz_norm(k) for k in kt)
             + (_fuzz_norm(v[0]), _fuzz_norm(v[1]))
             for kt, v in want2.items()),
            key=lambda t: tuple(str(x) for x in t))
        assert got == want_rows, (
            f"seed={seed} kind={kind} group_by={group_by}\nsql={sql}")
        return
    got = _fuzz_spark_rows(spark.sql(sql), group_by, names[0])

    # ---- pandas oracle ----
    keys = _fuzz_keys(group_by, fact, cust_map, seg_map, reg_map, fq_map)
    if kind in ("simple", "simple_filtered", "custom_grain", "hop", "two_hop"):
        want = _fuzz_grouped(fact, keys, _fuzz_measure(fact, measure))
    elif kind == "ratio":
        num = _fuzz_grouped(fact, keys, _fuzz_measure(fact, "amt_sum"))
        den = _fuzz_grouped(fact, keys, _fuzz_measure(fact, "n_rows"))
        want = {k: (float(num[k]) / float(den[k]) if den[k] else None)
                for k in num}
    elif kind == "derived":
        a = _fuzz_grouped(fact, keys, _fuzz_measure(fact, "amt_sum"))
        q = _fuzz_grouped(fact, keys, _fuzz_measure(fact, "qty_sum"))
        want = {k: a[k] + 2 * q[k] for k in a}
    elif kind == "cumulative":
        base = _fuzz_grouped(fact, keys, _fuzz_measure(fact, measure))
        ti = group_by.index("metric_time__month")
        want = {}
        if cum_window:
            # trailing '2 months' = strict (t - 2mo, t]: the current and
            # the immediately-previous month bucket only
            for kt, v in base.items():
                m = kt[ti]
                pm = (m.replace(year=m.year - 1, month=12) if m.month == 1
                      else m.replace(month=m.month - 1))
                pkt = kt[:ti] + (pm,) + kt[ti + 1:]
                vals = [x for x in (v, base.get(pkt)) if x is not None]
                want[kt] = sum(vals) if vals else None
        else:
            by_part = {}
            for kt in sorted(base, key=lambda t: str(t[ti])):
                part = tuple(v for i, v in enumerate(kt) if i != ti)
                by_part[part] = by_part.get(part, 0) + base[kt]
                want[kt] = by_part[part]
    elif kind == "cum_filtered":
        # cumulative over a filtered measure: month buckets exist wherever
        # ANY fact row exists, but only status-A rows contribute — NULL
        # buckets are skipped by the running/trailing sum (SUM ignores
        # NULL) and the total stays NULL until the first contributing
        # bucket
        base = _fuzz_grouped(fact, keys, _fuzz_measure(fact, "amt_sum_a"))
        ti = group_by.index("metric_time__month")
        want = {}
        if cum_window:
            for kt, v in base.items():
                m = kt[ti]
                pm = (m.replace(year=m.year - 1, month=12) if m.month == 1
                      else m.replace(month=m.month - 1))
                pkt = kt[:ti] + (pm,) + kt[ti + 1:]
                vals = [x for x in (v, base.get(pkt)) if x is not None]
                want[kt] = sum(vals) if vals else None
        else:
            by_part = {}
            for kt in sorted(base, key=lambda t: str(t[ti])):
                part = tuple(v for i, v in enumerate(kt) if i != ti)
                if base[kt] is not None:
                    by_part[part] = by_part.get(part, 0) + base[kt]
                want[kt] = by_part.get(part)
    elif kind == "timespine_filtered":
        # panel shape (months × dims) comes from the FULL fact — the spine
        # spans the owner table's unfiltered time range and non-time dims
        # cross with it — while values come from the metric-filtered
        # subset, zero-filled
        filt_m = {"amt_sum": "amt_sum_a", "qty_sum": None,
                  "n_rows": "n_rows_a"}[measure]
        if filt_m is None:
            vals = _fuzz_grouped(
                fact, keys,
                lambda g: (g[g["status"] == "A"]["qty"].sum()
                           if len(g[g["status"] == "A"]) else None))
        else:
            vals = _fuzz_grouped(fact, keys, _fuzz_measure(fact, filt_m))
        full = _fuzz_grouped(fact, keys, _fuzz_measure(fact, "n_rows"))
        ti = group_by.index("metric_time__month")
        months_present = sorted({kt[ti] for kt in full})
        months, m = [], months_present[0]
        while m <= months_present[-1]:
            months.append(m)
            m = (m.replace(year=m.year + 1, month=1) if m.month == 12
                 else m.replace(month=m.month + 1))
        parts = sorted({tuple(v for i, v in enumerate(kt) if i != ti)
                        for kt in full}, key=str)
        want = {}
        for part in parts:
            for mm in months:
                kt = part[:ti] + (mm,) + part[ti:]
                v = vals.get(kt)
                want[kt] = 0 if v is None else v
    elif kind == "offset":
        cur = _fuzz_grouped(fact, keys, _fuzz_measure(fact, measure))
        # ROW-level shift then month-bucket (the engine shifts raw time
        # BEFORE truncation — a '14 days' offset spills late-month rows
        # into the next month's offset bucket)
        if off_window == "1 month":
            shifted = fact.assign(d=fact["d"].map(
                lambda d: (_pd.Timestamp(d) + _pd.DateOffset(months=1))
                .date()))
        else:
            shifted = fact.assign(d=fact["d"].map(
                lambda d: d + _dt.timedelta(days=14)))
        keys_p = _fuzz_keys(group_by, shifted, cust_map, seg_map, reg_map,
                            fq_map)
        prev = _fuzz_grouped(shifted, keys_p,
                             _fuzz_measure(shifted, measure))
        want = {}
        for kt in set(cur) | set(prev):
            c, p = cur.get(kt), prev.get(kt)
            want[kt] = None if (c is None or p is None) else c - p
    elif kind == "cum_custom":
        # day-grain running total per non-time keys, mapped onto the
        # spine's fiscal quarters, then first/last/average per period
        ci = group_by.index("metric_time__fiscal_q")
        nt_items = [i for i in group_by if i != "metric_time__fiscal_q"]
        day_keys = _fuzz_keys(nt_items, fact, cust_map, seg_map, reg_map,
                              fq_map)
        w = fact.copy()
        if day_keys is not None:
            w = w.join(day_keys.set_axis(
                [f"__k_{c}" for c in day_keys.columns], axis=1))
        vals = {}
        mfun = _fuzz_measure(fact, measure)
        ntc = [f"__k_{c}" for c in nt_items]
        for kt, g in (w.groupby(ntc + ["d"], dropna=False, sort=False)
                      if ntc else w.groupby(["d"], sort=False)):
            if not isinstance(kt, tuple):
                kt = (kt,)
            vals[kt] = mfun(g)
        cum = {}
        running = {}
        for kt in sorted(vals, key=lambda t: str(t[-1])):
            part = kt[:-1]
            running[part] = running.get(part, 0) + (vals[kt] or 0)
            cum[kt] = running[part]
        per_period = {}
        for kt, c in cum.items():
            d = kt[-1]
            fq = fq_map.get(d)
            if fq is None:
                continue
            okt = kt[:-1][:ci] + (fq,) + kt[:-1][ci:]
            per_period.setdefault(okt, []).append((d, c))
        want = {}
        for okt, pairs in per_period.items():
            pairs.sort()
            if period_agg == "first":
                want[okt] = pairs[0][1]
            elif period_agg == "last":
                want[okt] = pairs[-1][1]
            else:
                want[okt] = round(sum(c for _, c in pairs) / len(pairs), 9)
    elif kind == "offset_grain":
        cur = _fuzz_grouped(fact, keys, _fuzz_measure(fact, measure))
        ti = group_by.index("metric_time__month")

        def qstart(kt):
            m = kt[ti]
            qm = ((m.month - 1) // 3) * 3 + 1
            return kt[:ti] + (m.replace(month=qm),) + kt[ti + 1:]

        # LEFT-join semantics: output periods are cur's; anchor is cur's
        # value at the quarter-start period (None when that period absent)
        want = {}
        for kt, c in cur.items():
            a = cur.get(qstart(kt))
            want[kt] = None if (c is None or a is None) else c - a
    elif kind in ("non_additive", "non_additive_hop"):
        # filter fact to per-(customer[, month]) snapshot rows at min/max d,
        # then aggregate exactly like a plain sum
        w = fact.copy()
        part_cols = ["cust"]
        if "metric_time__month" in group_by:
            w = w.assign(__mb=w["d"].map(lambda v: v.replace(day=1)))
            part_cols = ["cust", "__mb"]
        wv = w.groupby(part_cols)["d"].transform(nad_choice)
        w = w[w["d"] == wv].drop(columns=["__mb"], errors="ignore")
        w = w.reset_index(drop=True)
        keys_n = _fuzz_keys(group_by, w, cust_map, seg_map, reg_map, fq_map)
        want = _fuzz_grouped(w, keys_n, _fuzz_measure(w, "amt_sum"))
    elif kind == "percentile_disc":
        def _p50d(g):
            import math as _m
            vals = sorted(g["amount"].tolist())
            return float(vals[_m.ceil(0.5 * len(vals)) - 1])

        want = _fuzz_grouped(fact, keys, _p50d)
    elif kind == "proxy":
        def _mean(g):
            return (float(g["amount"].sum()) / len(g)) if len(g) else None

        want = _fuzz_grouped(fact, keys, _mean)
    elif kind == "ratio_input":
        num = _fuzz_grouped(fact, keys, _fuzz_measure(fact, "amt_sum_a"))
        den = _fuzz_grouped(fact, keys, _fuzz_measure(fact, "amt_sum"))
        want = {k: (None if num[k] is None or not den[k]
                    else float(num[k]) / float(den[k]))
                for k in den}
    elif kind in ("conversion", "conversion_hop"):
        # brute force: a base event converts iff ANY conversion event of the
        # same entity is later — strictly under the default fidelity,
        # same-timestamp-allowed under MetricFlow-inclusive — and inside
        # the window when set; output groups come from the base side only
        # (engine's __cvg1 LEFT JOIN __cvg2 shape); dedup of multiple
        # conversions is implicit
        base_rows = (fact[fact["status"] == "A"]
                     if conv_base == "n_rows_a" else fact)
        if conv_cross:
            conv_ev = [(r[1], r[2]) for r in rows2]
        else:
            conv_ev = [(r[1], r[2]) for r in rows if r[3] == "B"]
        by_ent = {}
        for c, d in conv_ev:
            by_ent.setdefault(c, []).append(d)

        def _converted(c, t):
            for tc in by_ent.get(c, ()):
                if (tc <= t) if conv_fid == "strict" else (tc < t):
                    continue
                if conv_win is None:
                    return True
                if conv_win == "7 days":
                    lim = t + _dt.timedelta(days=7)
                else:  # calendar month, day-clamped like Spark add_months
                    lim = (_pd.Timestamp(t) + _pd.DateOffset(months=1)).date()
                if tc <= lim:
                    return True
            return False

        def conv_val(g):
            nb = len(g)
            nc = sum(1 for _, r in g.iterrows()
                     if _converted(r["cust"], r["d"]))
            if conv_calc == "conversions":
                return nc
            return (nc / nb) if nb else None

        keys_c = _fuzz_keys(group_by, base_rows, cust_map, seg_map,
                            reg_map, fq_map)
        want = _fuzz_grouped(base_rows, keys_c, conv_val)
    else:  # timespine
        base = _fuzz_grouped(fact, keys, _fuzz_measure(fact, measure))
        ti = group_by.index("metric_time__month")
        months_present = sorted({kt[ti] for kt in base})
        months, m = [], months_present[0]
        while m <= months_present[-1]:
            months.append(m)
            m = (m.replace(year=m.year + 1, month=1) if m.month == 12
                 else m.replace(month=m.month + 1))
        parts = sorted({tuple(v for i, v in enumerate(kt) if i != ti)
                        for kt in base}, key=str)
        want = {}
        for part in parts:
            for m in months:
                kt = part[:ti] + (m,) + part[ti:]
                v = base.get(kt)
                want[kt] = 0 if v is None else v

    assert got == _fuzz_rows(want), (
        f"seed={seed} kind={kind} group_by={group_by}\nsql={sql}")


def test_engine_time_spine_missing_column_errors(project_dir, spark):
    """Parse-time validation mirrors the reference
    (contracts/graph/semantic_manifest.py:140-148): the declared standard
    granularity column must exist in columns and carry a granularity."""
    from dbt_spark.plans.compile import CompilationError

    bad_missing = dict(SPINE_PROJECT_FILES)
    bad_missing["models/schema.yml"] = """
version: 2
models:
  - name: all_days
    time_spine:
      standard_granularity_column: date_day
"""
    with pytest.raises(CompilationError, match="not declared"):
        Engine(project_dir(bad_missing), spark=spark).parse()

    bad_gran = dict(SPINE_PROJECT_FILES)
    bad_gran["models/schema.yml"] = """
version: 2
models:
  - name: all_days
    time_spine:
      standard_granularity_column: date_day
    columns:
      - name: date_day
"""
    with pytest.raises(CompilationError, match="granularity"):
        Engine(project_dir(bad_gran), spark=spark).parse()


def test_custom_granularity_in_where_filter(spine_views):
    """{{ TimeDimension('metric_time', '<custom>') }} in a query-level
    where resolves through the declared spine (the filter's spine join
    accumulates before joined_from renders)."""
    sql = compile_metrics_sql(
        ["revenue"], METRICS, [ORDERS_SM, PAYMENTS_SM], SPINE_TABLES,
        group_by=["status"],
        where="{{ TimeDimension('metric_time', 'fiscal_quarter') }} = 'FY2024Q1'",
        time_spines=[SPINE_DECL])
    rows = {r["status"]: r["revenue"] for r in spine_views.sql(sql).collect()}
    # FY2024Q1 = Dec 2023..Feb 2024 -> orders 1,2,3,4 (Jan/Feb)
    assert rows == {"F": 375.0, "O": 50.0}


def test_semantic_manifest_artifact_written(project_dir, spark):
    """target/semantic_manifest.json mirrors the reference artifact
    (parser/manifest.py:2088 write_semantic_manifest): semantic models,
    metrics, saved queries, and project_configuration.time_spines."""
    import json as _json

    root = project_dir(SPINE_PROJECT_FILES)
    eng = Engine(root, spark=spark)
    eng.parse()
    p = _os.path.join(root, "target", "semantic_manifest.json")
    assert _os.path.exists(p)
    doc = _json.load(open(p))
    assert [m["name"] for m in doc["metrics"]] == ["revenue_spined"]
    assert [s["name"] for s in doc["semantic_models"]] == ["orders_sm"]
    spines = doc["project_configuration"]["time_spines"]
    assert spines[0]["primary_column"] == {
        "name": "date_day", "time_granularity": "day"}
    assert spines[0]["custom_granularities"][0]["name"] == "fiscal_quarter"


def test_legacy_metricflow_time_spine_fallback(project_dir, spark):
    """A model named metricflow_time_spine with a day-grain date_day column
    is picked up as the spine when no time_spine: config exists (reference
    legacy path, contracts/graph/semantic_manifest.py:196-227)."""
    files = dict(SPINE_PROJECT_FILES)
    del files["models/schema.yml"]  # no declared spine config
    files["models/metricflow_time_spine.sql"] = (
        "select explode(sequence(date'2023-12-01', date'2024-04-30', "
        "interval 1 day)) as date_day"
    )
    del files["models/all_days.sql"]
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["build"]).success
    rows = {str(r["metric_time__month"]): r["revenue_spined"]
            for r in eng.query_metrics(
                ["revenue_spined"], group_by=["metric_time__month"]).collect()}
    # panel spans the legacy spine's Dec..Apr range, zero-filled
    assert sorted(rows) == ["2023-12-01", "2024-01-01", "2024-02-01",
                            "2024-03-01", "2024-04-01"]
    assert rows["2024-04-01"] == 0.0


def test_behavior_flag_nested_cumulative_type_params(project_dir, spark):
    """require_nested_cumulative_type_params (reference
    contracts/graph/semantic_manifest.py:70-95): top-level
    type_params.window on a cumulative metric errors when the flag is on,
    and fires the D019 deprecation when off."""
    files = dict(PROJECT_FILES)
    files["models/semantic.yml"] = PROJECT_FILES["models/semantic.yml"].replace(
        "saved_queries:",
        """  - name: cum_old_style
    label: c
    type: cumulative
    type_params: {measure: order_total, window: 2 month}
saved_queries:""")
    files["dbt_project.yml"] = (
        "name: sl\nmodel-paths: ['models']\nseed-paths: ['seeds']\n"
        "flags: {require_nested_cumulative_type_params: true}\n")
    from dbt_spark.plans.compile import CompilationError

    with pytest.raises(CompilationError, match="cumulative_type_params"):
        Engine(project_dir(files), spark=spark).parse()

    files["dbt_project.yml"] = (
        "name: sl\nmodel-paths: ['models']\nseed-paths: ['seeds']\n")
    eng = Engine(project_dir(files), spark=spark)
    seen = []
    eng.events.callbacks.append(seen.append)
    eng.parse()  # flag off: parses, deprecation D019 fired
    assert any(e.name == "MFCumulativeTypeParamsDeprecation" for e in seen)


def test_behavior_flag_mf_time_spine_yaml_required(project_dir, spark):
    """require_yaml_configuration_for_mf_time_spines: a legacy
    metricflow_time_spine model without YAML time_spine: config errors when
    the flag is on, and fires the D018 deprecation when off."""
    files = dict(SPINE_PROJECT_FILES)
    del files["models/schema.yml"]
    del files["models/all_days.sql"]
    files["models/metricflow_time_spine.sql"] = (
        "select explode(sequence(date'2024-01-01', date'2024-03-31', "
        "interval 1 day)) as date_day")
    files["dbt_project.yml"] = (
        "name: sl2\nmodel-paths: ['models']\nseed-paths: ['seeds']\n"
        "flags: {require_yaml_configuration_for_mf_time_spines: true}\n")
    from dbt_spark.plans.compile import CompilationError

    with pytest.raises(CompilationError, match="time_spine"):
        Engine(project_dir(files), spark=spark).parse()

    files["dbt_project.yml"] = (
        "name: sl2\nmodel-paths: ['models']\nseed-paths: ['seeds']\n")
    eng = Engine(project_dir(files), spark=spark)
    seen = []
    eng.events.callbacks.append(seen.append)
    eng.parse()
    assert any(e.name == "MFTimespineWithoutYamlConfigurationDeprecation"
               for e in seen)


def test_behavior_flag_custom_microbatch_macro_deprecation(project_dir, spark):
    """A user-defined `get_incremental_microbatch_sql` macro beside
    microbatch models fires D020 while
    require_batched_execution_for_custom_microbatch_strategy is off
    (reference parser/manifest.py:660-675 + the non-core locality check
    manifest.py:1760); setting the flag silences it (batched execution is
    this engine's only mode either way)."""
    files = {
        "dbt_project.yml": "name: mb\nmodel-paths: ['models']\nmacro-paths: ['macros']\n",
        "macros/microbatch.sql":
            "{% macro get_incremental_microbatch_sql(arg_dict) %}"
            "select 1{% endmacro %}",
        "models/ev.sql": (
            "{{ config(materialized='incremental', "
            "incremental_strategy='microbatch', event_time='ts', "
            "batch_size='day', begin='2024-01-01') }}\n"
            "select CAST('2024-01-01' AS TIMESTAMP) as ts, 1 as v"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    seen = []
    eng.events.callbacks.append(seen.append)
    eng.parse()
    assert any(e.name == "MicrobatchMacroOutsideOfBatchesDeprecation"
               for e in seen)

    files["dbt_project.yml"] += (
        "flags: {require_batched_execution_for_custom_microbatch_strategy: true}\n")
    eng2 = Engine(project_dir(files), spark=spark)
    seen2 = []
    eng2.events.callbacks.append(seen2.append)
    eng2.parse()
    assert not any(e.name == "MicrobatchMacroOutsideOfBatchesDeprecation"
                   for e in seen2)


def test_conversion_constant_properties(spark):
    """ConversionTypeParams.constant_properties (v1/metric.py:86-87): the
    conversion must share the listed properties with its base event — a
    purchase in a DIFFERENT session than the signup does not convert."""
    spark.createDataFrame(
        [
            (1, "signup", "2024-01-01 10:00:00", "s1"),
            (1, "purchase", "2024-01-02 10:00:00", "s1"),   # same session ✓
            (2, "signup", "2024-01-01 10:00:00", "s2"),
            (2, "purchase", "2024-01-02 10:00:00", "s9"),   # other session ✗
            (3, "signup", "2024-01-01 10:00:00", "s3"),     # no purchase ✗
        ],
        "u int, k string, ts string, sess string",
    ).selectExpr("u", "k", "CAST(ts AS TIMESTAMP) AS ts", "sess"
                 ).createOrReplaceTempView("t_events_cp")
    sm = {**EVENTS_SM, "model": "ref('events_cp')",
          "dimensions": EVENTS_SM["dimensions"]
          + [{"name": "session", "type": "categorical", "expr": "sess"}]}
    m = [{"name": "c", "type": "conversion",
          "type_params": {"conversion_type_params": {
              "base_measure": "signups", "conversion_measure": "purchases",
              "entity": "user", "window": "7 days",
              "calculation": "conversions",
              "constant_properties": [
                  {"base_property": "session",
                   "conversion_property": "session"}]}}},
         {"name": "r", "type": "conversion",
          "type_params": {"conversion_type_params": {
              "base_measure": "signups", "conversion_measure": "purchases",
              "entity": "user", "window": "7 days",
              "constant_properties": [
                  {"base_property": "session",
                   "conversion_property": "session"}]}}}]
    sql = compile_metrics_sql(["c", "r"], m, [sm],
                              {"events_cp": "t_events_cp"})
    row = spark.sql(sql).collect()[0]
    assert row["c"] == 1
    assert abs(row["r"] - 1 / 3) < 1e-9


def test_derived_offset_to_grain_quarter_anchor(views):
    """offset_to_grain (v1/metric.py MetricInput.offset_to_grain): each
    output month reads the input's value at the START of its containing
    quarter — Jan anchors Q1, so Feb/Mar compare against Jan's revenue."""
    m = METRICS + [
        {"name": "rev_vs_qstart", "type": "derived",
         "type_params": {"expr": "cur - qstart",
                         "metrics": [
                             {"name": "revenue", "alias": "cur"},
                             {"name": "revenue", "alias": "qstart",
                              "offset_to_grain": "quarter"}]}},
    ]
    sql = compile_metrics_sql(
        ["rev_vs_qstart"], m, [ORDERS_SM, PAYMENTS_SM], TABLES,
        group_by=["metric_time__month"])
    rows = {str(r["metric_time__month"]): r["rev_vs_qstart"]
            for r in views.sql(sql).collect()}
    # Jan 150, Feb 275, Mar 25; Q1 anchor = Jan's 150
    assert rows == {"2024-01-01": 0.0, "2024-02-01": 125.0,
                    "2024-03-01": -125.0}
    # the anchor leg LEFT-joins through the grain mapping (no extra
    # output periods, no COALESCE key growth)
    assert "LEFT JOIN __sm_orders_sm__otg_quarter" in sql
    assert "DATE_TRUNC('QUARTER'" in sql


def test_derived_offset_to_grain_with_extra_dim(views):
    """offset_to_grain composes with a non-time group-by: the grain-start
    anchor matches within each status partition."""
    m = METRICS + [
        {"name": "rev_vs_ystart", "type": "derived",
         "type_params": {"expr": "cur - ystart",
                         "metrics": [
                             {"name": "revenue", "alias": "cur"},
                             {"name": "revenue", "alias": "ystart",
                              "offset_to_grain": "year"}]}},
    ]
    sql = compile_metrics_sql(
        ["rev_vs_ystart"], m, [ORDERS_SM, PAYMENTS_SM], TABLES,
        group_by=["status", "metric_time__month"])
    rows = {(r["status"], str(r["metric_time__month"])): r["rev_vs_ystart"]
            for r in views.sql(sql).collect()}
    # year start = Jan: F Jan 100, O Jan 50
    assert rows[("F", "2024-01-01")] == 0.0
    assert rows[("F", "2024-02-01")] == 175.0   # 275 - 100
    assert rows[("O", "2024-03-01")] == -25.0   # 25 - 50


def test_offset_to_grain_errors(views):
    m = METRICS + [
        {"name": "bad_both", "type": "derived",
         "type_params": {"expr": "a", "metrics": [
             {"name": "revenue", "alias": "a",
              "offset_window": "1 month", "offset_to_grain": "month"}]}},
        {"name": "bad_grain", "type": "derived",
         "type_params": {"expr": "a", "metrics": [
             {"name": "revenue", "alias": "a",
              "offset_to_grain": "fortnight"}]}},
        {"name": "bad_no_time", "type": "derived",
         "type_params": {"expr": "a", "metrics": [
             {"name": "revenue", "alias": "a",
              "offset_to_grain": "month"}]}},
    ]
    with pytest.raises(MetricQueryError, match="both offset_window"):
        compile_metrics_sql(["bad_both"], m, [ORDERS_SM, PAYMENTS_SM],
                            TABLES, group_by=["metric_time__month"])
    with pytest.raises(MetricQueryError, match="not a standard grain"):
        compile_metrics_sql(["bad_grain"], m, [ORDERS_SM, PAYMENTS_SM],
                            TABLES, group_by=["metric_time__month"])
    with pytest.raises(MetricQueryError, match="needs a time"):
        compile_metrics_sql(["bad_no_time"], m, [ORDERS_SM, PAYMENTS_SM],
                            TABLES, group_by=["status"])


def test_metric_level_time_granularity_default(views):
    """Metric.time_granularity (v1/metric.py:133): a BARE metric_time
    group-by defaults to the metric's declared grain; with several metrics
    the COARSEST declared grain wins (MetricFlow's common-grain rule), and
    the output column is named at the applied grain."""
    m = METRICS + [
        {"name": "rev_monthly", "type": "simple", "time_granularity": "month",
         "type_params": {"measure": "order_total"}},
        {"name": "rev_quarterly", "type": "simple",
         "time_granularity": "quarter",
         "type_params": {"measure": "order_total"}},
    ]
    sql = compile_metrics_sql(["rev_monthly"], m, [ORDERS_SM, PAYMENTS_SM],
                              TABLES, group_by=["metric_time"])
    rows = {str(r["metric_time__month"]): r["rev_monthly"]
            for r in views.sql(sql).collect()}
    assert rows == {"2024-01-01": 150.0, "2024-02-01": 275.0,
                    "2024-03-01": 25.0}
    # two metrics, different grains -> quarter (coarsest) applies to both
    sql2 = compile_metrics_sql(
        ["rev_monthly", "rev_quarterly"], m, [ORDERS_SM, PAYMENTS_SM],
        TABLES, group_by=["metric_time"])
    rows2 = {str(r["metric_time__quarter"]):
             (r["rev_monthly"], r["rev_quarterly"])
             for r in views.sql(sql2).collect()}
    assert rows2 == {"2024-01-01": (450.0, 450.0)}
    # an EXPLICIT grain still wins over the metric default
    sql3 = compile_metrics_sql(
        ["rev_quarterly"], m, [ORDERS_SM, PAYMENTS_SM], TABLES,
        group_by=["metric_time__month"])
    assert len(views.sql(sql3).collect()) == 3
    # undeclared metrics leave bare metric_time at the raw day expr
    sql4 = compile_metrics_sql(["revenue"], METRICS,
                               [ORDERS_SM, PAYMENTS_SM], TABLES,
                               group_by=["metric_time"])
    assert "metric_time__" not in sql4.split("SELECT")[0]

    with pytest.raises(MetricQueryError, match="standard grain"):
        compile_metrics_sql(
            ["bad"],
            m + [{"name": "bad", "type": "simple",
                  "time_granularity": "fortnight",
                  "type_params": {"measure": "order_total"}}],
            [ORDERS_SM, PAYMENTS_SM], TABLES, group_by=["metric_time"])


def test_cumulative_at_custom_granularity_period_agg(spine_views):
    """CumulativeTypeParams.period_agg (v1/metric.py:90-94): a cumulative
    metric queried at a CUSTOM granularity rolls up the day-grain running
    total per fiscal quarter — first / last / average of the sub-period
    cumulative (MetricFlow applies period_agg exactly for custom-calendar
    grains; standard grains compute directly)."""
    def _m(pa):
        return [{"name": "cum", "type": "cumulative",
                 "type_params": {"measure": "order_total",
                                 "cumulative_type_params":
                                     {"period_agg": pa}}}]

    out = {}
    for pa in ("first", "last", "average"):
        sql = compile_metrics_sql(
            ["cum"], _m(pa), [ORDERS_SM, PAYMENTS_SM], SPINE_TABLES,
            group_by=["metric_time__fiscal_quarter"],
            time_spines=[SPINE_DECL])
        out[pa] = {r["metric_time__fiscal_quarter"]: r["cum"]
                   for r in spine_views.sql(sql).collect()}
    # orders: Jan 5 -> 100, Jan 20 -> +50, Feb 3 -> +200, Feb 10 -> +75,
    # Mar 1 -> +25. FY2024Q1 = Dec..Feb (cum days: 100,150,350,425);
    # FY2024Q2 = Mar..May (cum days: 450)
    assert out["first"] == {"FY2024Q1": 100.0, "FY2024Q2": 450.0}
    assert out["last"] == {"FY2024Q1": 425.0, "FY2024Q2": 450.0}
    assert out["average"] == {"FY2024Q1": 256.25, "FY2024Q2": 450.0}


def test_cumulative_custom_grain_with_extra_dim_and_errors(spine_views):
    m = [{"name": "cum", "type": "cumulative",
          "type_params": {"measure": "order_total",
                          "cumulative_type_params": {"period_agg": "last"}}}]
    sql = compile_metrics_sql(
        ["cum"], m, [ORDERS_SM, PAYMENTS_SM], SPINE_TABLES,
        group_by=["status", "metric_time__fiscal_quarter"],
        time_spines=[SPINE_DECL])
    rows = {(r["status"], r["metric_time__fiscal_quarter"]): r["cum"]
            for r in spine_views.sql(sql).collect()}
    # per-status running totals at quarter end
    assert rows[("F", "FY2024Q1")] == 375.0
    assert rows[("O", "FY2024Q1")] == 50.0
    assert rows[("O", "FY2024Q2")] == 75.0

    with pytest.raises(MetricQueryError, match="period_agg"):
        compile_metrics_sql(
            ["bad"],
            [{"name": "bad", "type": "cumulative",
              "type_params": {"measure": "order_total",
                              "cumulative_type_params":
                                  {"period_agg": "median"}}}],
            [ORDERS_SM, PAYMENTS_SM], SPINE_TABLES,
            group_by=["metric_time__fiscal_quarter"],
            time_spines=[SPINE_DECL])
    with pytest.raises(MetricQueryError, match="at most ONE custom"):
        compile_metrics_sql(
            ["cum"], m, [ORDERS_SM, PAYMENTS_SM], SPINE_TABLES,
            group_by=["metric_time__month", "metric_time__fiscal_quarter"],
            time_spines=[SPINE_DECL])


def test_saved_query_export_alias_and_schema_name(project_dir, spark):
    """ExportConfig.alias / schema_name (v1/saved_query.py:24-30) control
    the materialized identifier of a saved-query export."""
    files = dict(PROJECT_FILES)
    files["models/semantic.yml"] = PROJECT_FILES["models/semantic.yml"].replace(
        """      - name: monthly_revenue_tbl
        config: {export_as: table}""",
        """      - name: monthly_revenue_tbl
        config: {export_as: table, alias: rev_monthly, schema_name: marts}""")
    eng = Engine(project_dir(files), spark=spark)
    r = eng.invoke(["build", "--include-saved-query"])
    assert r.success
    assert eng.store.exists("marts", "rev_monthly")
    assert not eng.store.exists("main", "monthly_revenue_tbl")


@pytest.mark.parametrize("seed", range(12))
def test_saved_query_object_syntax_roundtrip(seed):
    """compile_saved_query is a pure translation layer over
    compile_metrics_sql: MetricFlow object syntax (Dimension / TimeDimension
    / Entity group-bys, where as a LIST of filters, limit/order_by) must
    compile to byte-identical SQL as the directly-parameterized call —
    randomized over the fuzz world's semantic models."""
    rng = _random.Random(_FUZZ_OFF + 888_000 + seed)
    pool = [
        ("status", "Dimension('status')"),
        ("metric_time__month", "TimeDimension('metric_time', 'month')"),
        ("customer__segment", "Dimension('customer__segment')"),
        ("customer", "Entity('customer')"),
    ]
    picks = rng.sample(pool, rng.randrange(0, 4))
    metrics = [{"name": "m", "type": "simple",
                "type_params": {"measure": rng.choice(
                    ["amt_sum", "qty_sum", "n_rows"])}}]
    where = rng.choice([
        None,
        ["{{ Dimension('status') }} = 'A'"],
        ["{{ Dimension('status') }} <> 'B'",
         "{{ Dimension('status') }} <> 'C'"],
    ])
    limit = rng.choice([None, 5])
    order_by = ([picks[0][0]] if picks and rng.random() < 0.5 else None)
    direct = compile_metrics_sql(
        ["m"], metrics, _FUZZ_MODELS, _FUZZ_TABLES,
        group_by=[p[0] for p in picks],
        where=(" AND ".join(f"({w})" for w in where) if where else None),
        order_by=order_by, limit=limit)
    sq = {"name": "sq", "query_params": {
        "metrics": ["m"], "group_by": [p[1] for p in picks],
        "where": where, "order_by": order_by, "limit": limit}}
    via_sq = compile_saved_query(sq, metrics, _FUZZ_MODELS, _FUZZ_TABLES)
    assert via_sq == direct


# --------------------------------------------------------------------------
# measure/metric-input parity: non_additive_dimension, MetricInput ratio &
# derived filters, create_metric proxies, agg "average", percentile flavors,
# filter lists (WhereFilterIntersection)
# --------------------------------------------------------------------------

BALANCES_SM = {
    "name": "bal_sm",
    "model": "ref('bal')",
    "defaults": {"agg_time_dimension": "ds"},
    "entities": [{"name": "account", "type": "primary", "expr": "acct"}],
    "dimensions": [
        {"name": "ds", "type": "time", "expr": "ds",
         "type_params": {"time_granularity": "day"}},
        {"name": "kind", "type": "categorical", "expr": "kind"},
    ],
    "measures": [
        {"name": "eod_balance", "agg": "sum", "expr": "balance",
         "non_additive_dimension": {
             "name": "ds", "window_choice": "max",
             "window_groupings": ["account"]}},
        {"name": "bod_balance", "agg": "sum", "expr": "balance",
         "non_additive_dimension": {
             "name": "ds", "window_choice": "min",
             "window_groupings": ["account"]}},
        {"name": "latest_any", "agg": "sum", "expr": "balance",
         "non_additive_dimension": {"name": "ds", "window_choice": "max"}},
        {"name": "bal_avg", "agg": "average", "expr": "balance",
         "create_metric": True},
        {"name": "bal_p50_disc", "agg": "percentile", "expr": "balance",
         "agg_params": {"percentile": 0.5, "use_discrete_percentile": True}},
        {"name": "bal_p50_approx", "agg": "percentile", "expr": "balance",
         "agg_params": {"percentile": 0.5,
                        "use_approximate_percentile": True}},
    ],
}

BAL_ROWS = [
    # acct, ds, balance, kind
    (1, "2024-01-10", 100, "checking"),
    (1, "2024-01-31", 120, "checking"),
    (1, "2024-02-15", 130, "checking"),
    (2, "2024-01-20", 50, "savings"),
    (2, "2024-02-28", 70, "savings"),
    (2, "2024-02-28", 5, "checking"),
]


@pytest.fixture(scope="module")
def bal_views(spark):
    spark.createDataFrame(
        BAL_ROWS, "acct int, ds string, balance long, kind string"
    ).selectExpr("acct", "CAST(ds AS DATE) AS ds", "balance",
                 "kind").createOrReplaceTempView("t_bal")
    return spark


def _bal_run(spark, metrics, names, **kw):
    sql = compile_metrics_sql(
        names, metrics, [BALANCES_SM], {"bal": "t_bal"}, **kw)
    return sql, spark.sql(sql)


def test_non_additive_dimension_window_per_group_and_period(bal_views):
    """Bank-balance semantics (Measure.non_additive_dimension,
    v1/semantic_model.py:143-147,158): SUM over accounts at each account's
    MAX/MIN snapshot date WITHIN each queried month."""
    metrics = [
        {"name": "total_balance", "type": "simple",
         "type_params": {"measure": "eod_balance"}},
        {"name": "start_balance", "type": "simple",
         "type_params": {"measure": "bod_balance"}},
    ]
    sql, df = _bal_run(bal_views, metrics, ["total_balance", "start_balance"],
                       group_by=["metric_time__month"],
                       order_by=["metric_time__month"])
    rows = [(str(r["metric_time__month"]), r["total_balance"],
             r["start_balance"]) for r in df.collect()]
    # Jan: acct1@31st=120 + acct2@20th=50; starts: 100+50
    # Feb: acct1@15th=130 + acct2@28th=70+5;  starts: 130+75
    assert rows == [("2024-01-01", 170, 150), ("2024-02-01", 205, 205)]
    # the semi-additive window is an aggregate JOINed back, never an
    # unpartitioned window function
    assert "OVER (" not in sql.upper().replace("OVER(", "OVER (") or \
        "PARTITION BY" in sql
    assert "__nad_w" in sql


def test_non_additive_dimension_global_window(bal_views):
    """No window_groupings and no time group-by: the window is global —
    only rows at the single overall MAX date survive (current snapshot)."""
    metrics = [{"name": "latest", "type": "simple",
                "type_params": {"measure": "latest_any"}}]
    _, df = _bal_run(bal_views, metrics, ["latest"], group_by=["kind"])
    rows = {r["kind"]: r["latest"] for r in df.collect()}
    # global max ds = 2024-02-28 → acct2's two rows only
    assert rows == {"savings": 70, "checking": 5}


def test_non_additive_dimension_validation_errors():
    bad_dim = {**BALANCES_SM, "measures": [
        {"name": "m1", "agg": "sum", "expr": "balance",
         "non_additive_dimension": {"name": "kind", "window_choice": "max"}}]}
    with pytest.raises(MetricQueryError, match="time dimension"):
        compile_metrics_sql(
            ["x"], [{"name": "x", "type": "simple",
                     "type_params": {"measure": "m1"}}],
            [bad_dim], {"bal": "t_bal"})
    bad_choice = {**BALANCES_SM, "measures": [
        {"name": "m1", "agg": "sum", "expr": "balance",
         "non_additive_dimension": {"name": "ds", "window_choice": "sum"}}]}
    with pytest.raises(MetricQueryError, match="window_choice"):
        compile_metrics_sql(
            ["x"], [{"name": "x", "type": "simple",
                     "type_params": {"measure": "m1"}}],
            [bad_choice], {"bal": "t_bal"})


def test_ratio_of_metrics_with_input_filter(views):
    """Ratio numerator/denominator are MetricInput refs (v1/metric.py:100-103)
    — metric names with an input-level filter list — not just measures."""
    metrics = METRICS + [
        {"name": "finished_share", "type": "ratio", "label": "fs",
         "type_params": {
             "numerator": {"name": "revenue",
                           "filter": ["{{ Dimension('status') }} = 'F'"]},
             "denominator": {"name": "revenue"}}},
    ]
    sql = compile_metrics_sql(["finished_share"], metrics,
                              [ORDERS_SM, PAYMENTS_SM], TABLES)
    [r] = views.sql(sql).collect()
    assert r["finished_share"] == pytest.approx(375.0 / 450.0)


def test_ratio_with_offset_window_input(views):
    """Ratio input carrying offset_window: month-over-month revenue ratio."""
    metrics = METRICS + [
        {"name": "mom_revenue", "type": "ratio", "label": "mom",
         "type_params": {
             "numerator": {"name": "revenue"},
             "denominator": {"name": "revenue",
                             "offset_window": "1 month"}}},
    ]
    sql = compile_metrics_sql(
        ["mom_revenue"], metrics, [ORDERS_SM, PAYMENTS_SM], TABLES,
        group_by=["metric_time__month"], order_by=["metric_time__month"])
    rows = {str(r["metric_time__month"]): r["mom_revenue"]
            for r in views.sql(sql).collect()}
    # Jan 150, Feb 275, Mar 25 → Feb/Jan, Mar/Feb
    assert rows["2024-02-01"] == pytest.approx(275.0 / 150.0)
    assert rows["2024-03-01"] == pytest.approx(25.0 / 275.0)
    assert rows["2024-01-01"] is None


def test_ratio_measure_shorthand_still_works(views):
    """Legacy measure-name shorthand keeps compiling (back-compat)."""
    sql, df = _run(views, ["avg_order_value"])
    [r] = df.collect()
    assert r["avg_order_value"] == pytest.approx(450.0 / 5)


def test_ratio_filter_on_composed_input_rejected(views):
    metrics = METRICS + [
        {"name": "bad", "type": "ratio",
         "type_params": {
             "numerator": {"name": "avg_order_value",
                           "filter": "{{ Dimension('status') }} = 'F'"},
             "denominator": "order_count"}},
    ]
    with pytest.raises(MetricQueryError, match="simple input metric"):
        compile_metrics_sql(["bad"], metrics, [ORDERS_SM, PAYMENTS_SM],
                            TABLES)


def test_derived_input_filter(views):
    """MetricInput.filter on a derived input (v1/metric.py:64) re-aggregates
    the input's measure with the extra guard."""
    metrics = METRICS + [
        {"name": "f_share_pct", "type": "derived", "label": "d",
         "type_params": {
             "expr": "100 * f / t",
             "metrics": [
                 {"name": "revenue", "alias": "f",
                  "filter": "{{ Dimension('status') }} = 'F'"},
                 {"name": "revenue", "alias": "t"},
             ]}},
    ]
    sql = compile_metrics_sql(["f_share_pct"], metrics,
                              [ORDERS_SM, PAYMENTS_SM], TABLES)
    [r] = views.sql(sql).collect()
    assert r["f_share_pct"] == pytest.approx(100 * 375.0 / 450.0)


def test_create_metric_proxy_and_average_agg(bal_views):
    """create_metric: true (Measure.create_metric, v1/semantic_model.py:154)
    exposes the measure as a same-named simple metric; agg 'average' (the
    reference's AggregationType spelling) compiles to AVG."""
    _, df = _bal_run(bal_views, [], ["bal_avg"])
    [r] = df.collect()
    assert r["bal_avg"] == pytest.approx(475.0 / 6)


def test_declared_metric_wins_over_proxy(bal_views):
    """A declared metric with the measure's name takes precedence."""
    metrics = [{"name": "bal_avg", "type": "simple",
                "type_params": {"measure": "eod_balance"}}]
    _, df = _bal_run(bal_views, metrics, ["bal_avg"])
    [r] = df.collect()
    assert r["bal_avg"] == 205  # eod_balance, not AVG(balance)


def test_percentile_flavors(bal_views):
    """MeasureAggregationParameters (v1/semantic_model.py:136-140):
    use_discrete_percentile → PERCENTILE_DISC (an actual data value),
    use_approximate_percentile → APPROX_PERCENTILE."""
    metrics = [
        {"name": "p50d", "type": "simple",
         "type_params": {"measure": "bal_p50_disc"}},
        {"name": "p50a", "type": "simple",
         "type_params": {"measure": "bal_p50_approx"}},
    ]
    sql, df = _bal_run(bal_views, metrics, ["p50d", "p50a"])
    [r] = df.collect()
    # balances sorted: 5,50,70,100,120,130 — DISC picks an actual value
    assert r["p50d"] in (50, 70)
    assert r["p50a"] in (5, 50, 70, 100, 120, 130)
    assert "PERCENTILE_DISC" in sql and "APPROX_PERCENTILE" in sql


def test_metric_filter_list(views):
    """Metric.filter as a LIST (WhereFilterIntersection): all predicates
    must hold."""
    metrics = METRICS + [
        {"name": "jan_f_revenue", "type": "simple",
         "type_params": {"measure": "order_total"},
         "filter": ["{{ Dimension('status') }} = 'F'",
                    "{{ TimeDimension('order_date', 'month') }} = DATE'2024-01-01'"]},
    ]
    sql = compile_metrics_sql(["jan_f_revenue"], metrics,
                              [ORDERS_SM, PAYMENTS_SM], TABLES)
    [r] = views.sql(sql).collect()
    assert r["jan_f_revenue"] == 100.0


def test_saved_query_config_defaults_and_cache(project_dir, spark):
    """SavedQueryConfig (v1/saved_query.py:59-79): saved-query-level
    export_as / schema are DEFAULTS for exports without their own config,
    and cache.enabled materializes the compiled result once (Spark persist)
    for all table exports."""
    files = dict(PROJECT_FILES)
    files["models/semantic.yml"] = PROJECT_FILES["models/semantic.yml"].replace(
        """saved_queries:
  - name: monthly_revenue
    query_params:""",
        """saved_queries:
  - name: monthly_revenue
    config:
      export_as: table
      schema: marts
      cache: {enabled: true}
    query_params:""").replace(
        """    exports:
      - name: monthly_revenue_tbl
        config: {export_as: table}""",
        """    exports:
      - name: monthly_revenue_tbl
      - name: monthly_revenue_copy""")
    eng = Engine(project_dir(files), spark=spark)
    r = eng.invoke(["build", "--include-saved-query"])
    assert r.success
    # both exports land in the config-level schema as tables
    assert eng.store.exists("marts", "monthly_revenue_tbl")
    assert eng.store.exists("marts", "monthly_revenue_copy")
    a = {str(row["metric_time__month"]): row["revenue"]
         for row in eng.store.read("marts", "monthly_revenue_tbl").collect()}
    b = {str(row["metric_time__month"]): row["revenue"]
         for row in eng.store.read("marts", "monthly_revenue_copy").collect()}
    assert a == b == {"2024-01-01": 150.0, "2024-02-01": 275.0,
                      "2024-03-01": 25.0}


def test_saved_query_config_validation():
    from dbt_spark.plans.semantic import validate_entry, SemanticValidationError

    with pytest.raises(SemanticValidationError, match="export_as"):
        validate_entry("saved_queries", {
            "name": "sq", "query_params": {"metrics": ["m"]},
            "config": {"export_as": "materialized_view"}})
    with pytest.raises(SemanticValidationError, match="cache"):
        validate_entry("saved_queries", {
            "name": "sq", "query_params": {"metrics": ["m"]},
            "config": {"cache": "yes"}})


def test_engine_non_additive_dimension_yaml(project_dir, spark):
    """End-to-end through the Engine: a semantic model declaring
    non_additive_dimension in project YAML compiles and answers the
    bank-balance query (per-account last-snapshot sum by month)."""
    files = {
        "dbt_project.yml": "name: nad\nmodel-paths: ['models']\nseed-paths: ['seeds']\n",
        "seeds/raw_bal.csv": (
            "acct,ds,balance\n"
            "1,2024-01-10,100\n1,2024-01-31,120\n1,2024-02-15,130\n"
            "2,2024-01-20,50\n2,2024-02-28,70\n"
        ),
        "models/balances.sql": "select acct, CAST(ds AS DATE) AS ds, balance from {{ ref('raw_bal') }}",
        "models/semantic.yml": """
version: 2
semantic_models:
  - name: bal_sm
    model: ref('balances')
    defaults: {agg_time_dimension: ds}
    entities:
      - {name: account, type: primary, expr: acct}
    dimensions:
      - {name: ds, type: time, expr: ds, type_params: {time_granularity: day}}
    measures:
      - name: eod_balance
        agg: sum
        expr: balance
        create_metric: true
        non_additive_dimension:
          name: ds
          window_choice: max
          window_groupings: [account]
""",
    }
    eng = Engine(project_dir(files), spark=spark)
    assert eng.invoke(["build"]).success
    rows = {str(r["metric_time__month"]): r["eod_balance"]
            for r in eng.query_metrics(
                ["eod_balance"],
                group_by=["metric_time__month"]).collect()}
    assert rows == {"2024-01-01": 170, "2024-02-01": 200}


def test_filter_list_of_falsy_entries_is_no_filter(views):
    """filter: [""] / [null] normalizes to 'no filter', never a crash."""
    metrics = METRICS + [
        {"name": "rev_nofilter", "type": "simple",
         "type_params": {"measure": "order_total"}, "filter": [""]},
    ]
    sql = compile_metrics_sql(["rev_nofilter"], metrics,
                              [ORDERS_SM, PAYMENTS_SM], TABLES)
    [r] = views.sql(sql).collect()
    assert r["rev_nofilter"] == 450.0
    # measure-level falsy list too
    sm2 = {**ORDERS_SM, "measures": ORDERS_SM["measures"] + [
        {"name": "ot2", "agg": "sum", "expr": "o_total", "filter": [None]}]}
    sql = compile_metrics_sql(
        ["m2x"], [{"name": "m2x", "type": "simple",
                   "type_params": {"measure": "ot2"}}],
        [sm2, PAYMENTS_SM], TABLES)
    [r] = views.sql(sql).collect()
    assert r["m2x"] == 450.0


def test_non_additive_custom_grain_rejected(bal_views):
    """NAD + custom-granularity group-by is an explicit error, not a
    silently-global window."""
    spine = {
        "model": "t_bal",  # any registered table works for the probe
        "standard_granularity_column": "ds",
        "granularity": "day",
        "custom_granularities": [{"name": "fq", "column_name": "kind"}],
    }
    metrics = [{"name": "tb", "type": "simple",
                "type_params": {"measure": "eod_balance"}}]
    with pytest.raises(MetricQueryError, match="custom granularity"):
        compile_metrics_sql(
            ["tb"], metrics, [BALANCES_SM], {"bal": "t_bal"},
            group_by=["ds__fq"], time_spines=[spine])


# --------------------------------------------------------------------------
# review-driven semantics fixes: offset shift-before-truncate, strict
# cumulative window bounds, quarter interval units, nested cumulative/fill
# inputs, .grain() object syntax, order_by rewrites
# --------------------------------------------------------------------------

def test_offset_window_finer_than_grain_spills_periods(views):
    """offset_window '14 days' queried at MONTH grain: rows shift by raw
    time BEFORE truncation, so a Jan-20 row lands in February's offset
    bucket — shifting the truncated key would produce month-start+14d keys
    that never match the anchor leg (all-NULL output)."""
    metrics = METRICS + [
        {"name": "rev_14d_delta", "type": "derived",
         "type_params": {"expr": "cur - prev",
                         "metrics": [
                             {"name": "revenue", "alias": "cur"},
                             {"name": "revenue", "alias": "prev",
                              "offset_window": "14 days"}]}},
    ]
    sql = compile_metrics_sql(
        ["rev_14d_delta"], metrics, [ORDERS_SM, PAYMENTS_SM], TABLES,
        group_by=["metric_time__month"])
    rows = {str(r["metric_time__month"]): r["rev_14d_delta"]
            for r in views.sql(sql).collect()}
    # shifted buckets: Jan {100}, Feb {50, 200, 75}, Mar {25}
    assert rows["2024-01-01"] == 150.0 - 100.0
    assert rows["2024-02-01"] == 275.0 - 325.0
    assert rows["2024-03-01"] == 25.0 - 25.0


def test_cumulative_window_strict_lower_bound(views):
    """Trailing window '7 days' at day grain covers (t-7, t] — the Feb-03
    bucket is EXACTLY 7 days before Feb-10 and must not be included
    (MetricFlow: event_time > t - window)."""
    metrics = METRICS + [
        {"name": "rev_7d", "type": "cumulative",
         "type_params": {"measure": "order_total", "window": "7 days"}},
    ]
    sql = compile_metrics_sql(
        ["rev_7d"], metrics, [ORDERS_SM, PAYMENTS_SM], TABLES,
        group_by=["metric_time__day"])
    rows = {str(r["metric_time__day"]): r["rev_7d"]
            for r in views.sql(sql).collect()}
    assert rows["2024-02-10"] == 75.0  # NOT 275: Feb-03 is outside (t-7, t]
    assert rows["2024-02-03"] == 200.0


def test_quarter_window_units_compile_and_run(views):
    """'quarter' is not a Spark interval unit — windows/offsets spelled in
    quarters must rewrite to months, not raise ParseException."""
    metrics = METRICS + [
        {"name": "rev_q_prev", "type": "derived",
         "type_params": {"expr": "cur - prev",
                         "metrics": [
                             {"name": "revenue", "alias": "cur"},
                             {"name": "revenue", "alias": "prev",
                              "offset_window": "1 quarter"}]}},
        {"name": "rev_cum_q", "type": "cumulative",
         "type_params": {"measure": "order_total", "window": "1 quarter"}},
    ]
    sql = compile_metrics_sql(
        ["rev_q_prev"], metrics, [ORDERS_SM, PAYMENTS_SM], TABLES,
        group_by=["metric_time__month"])
    months = {str(r["metric_time__month"]) for r in views.sql(sql).collect()}
    assert "2024-04-01" in months  # the +3-month offset leg's periods
    sql = compile_metrics_sql(
        ["rev_cum_q"], metrics, [ORDERS_SM, PAYMENTS_SM], TABLES,
        group_by=["metric_time__month"])
    rows = {str(r["metric_time__month"]): r["rev_cum_q"]
            for r in views.sql(sql).collect()}
    # 1 quarter = 3 month-buckets: Mar covers (Dec, Mar] = Jan+Feb+Mar
    assert rows["2024-03-01"] == 450.0


def test_cumulative_as_derived_input_rejected(views):
    metrics = METRICS + [
        {"name": "bad", "type": "derived",
         "type_params": {"expr": "c / 2",
                         "metrics": [{"name": "cumulative_revenue",
                                      "alias": "c"}]}},
    ]
    with pytest.raises(MetricQueryError, match="derived/ratio input"):
        compile_metrics_sql(["bad"], metrics, [ORDERS_SM, PAYMENTS_SM],
                            TABLES, group_by=["metric_time__month"])


def test_nested_fill_nulls_with_applies_value_level(views):
    """A derived input whose measure declares fill_nulls_with gets
    COALESCE'd inside the consuming expression: months with no payments
    contribute 0, not NULL."""
    metrics = METRICS + [
        {"name": "pay0", "type": "simple",
         "type_params": {"measure": {"name": "payment_total",
                                     "fill_nulls_with": 0}}},
        {"name": "rev_plus_pay", "type": "derived",
         "type_params": {"expr": "r + p",
                         "metrics": [{"name": "revenue", "alias": "r"},
                                     {"name": "pay0", "alias": "p"}]}},
    ]
    sql = compile_metrics_sql(
        ["rev_plus_pay"], metrics, [ORDERS_SM, PAYMENTS_SM], TABLES,
        group_by=["metric_time__month"])
    rows = {str(r["metric_time__month"]): r["rev_plus_pay"]
            for r in views.sql(sql).collect()}
    assert rows["2024-03-01"] == 25.0  # payments absent -> 0, not NULL
    assert rows["2024-01-01"] == 150.0 + 90.0


def test_saved_query_grain_object_syntax(views):
    """Dimension('x').grain('g') resolves to x__g (not silently truncated
    to the bare dimension), in group_by AND in filter templates."""
    sq = {"name": "sq", "query_params": {
        "metrics": ["revenue"],
        "group_by": ["Dimension('metric_time').grain('month')"],
        "where": ["{{ Dimension('order_date').grain('month') }} = DATE'2024-01-01'"],
    }}
    sql = compile_saved_query(sq, METRICS, [ORDERS_SM, PAYMENTS_SM], TABLES)
    rows = views.sql(sql).collect()
    assert [str(r["metric_time__month"]) for r in rows] == ["2024-01-01"]
    assert rows[0]["revenue"] == 150.0


def test_saved_query_order_by_object_syntax_desc(views):
    sq = {"name": "sq", "query_params": {
        "metrics": ["revenue"],
        "group_by": ["TimeDimension('metric_time', 'month')"],
        "order_by": ["-TimeDimension('metric_time', 'month')"],
    }}
    sql = compile_saved_query(sq, METRICS, [ORDERS_SM, PAYMENTS_SM], TABLES)
    months = [str(r["metric_time__month"]) for r in views.sql(sql).collect()]
    assert months == sorted(months, reverse=True)


def test_bare_metric_time_order_by_follows_grain_rewrite(views):
    metrics = METRICS + [
        {"name": "rev_monthly", "type": "simple",
         "type_params": {"measure": "order_total"},
         "time_granularity": "month"},
    ]
    sql = compile_metrics_sql(
        ["rev_monthly"], metrics, [ORDERS_SM, PAYMENTS_SM], TABLES,
        group_by=["metric_time"], order_by=["metric_time"])
    months = [str(r["metric_time__month"]) for r in views.sql(sql).collect()]
    assert months == sorted(months)


def test_cumulative_orders_by_time_not_dunder_dimension(views):
    """A dunder NON-time dimension in the group-by must not be mistaken for
    the running window's time axis."""
    sql, df = _run(views, ["cumulative_revenue"],
                   group_by=["order_id__status", "metric_time__day"])
    rows = {(r["order_id__status"], str(r["metric_time__day"])):
            r["cumulative_revenue"] for r in df.collect()}
    assert rows[("F", "2024-02-10")] == 375.0  # 100+200+75 running within F
    assert rows[("O", "2024-03-01")] == 75.0
    # and no time item at all is an error, not a silent categorical order
    with pytest.raises(MetricQueryError, match="time group-by"):
        _run(views, ["cumulative_revenue"], group_by=["status"])


def test_offset_without_group_by_rejected(views):
    metrics = METRICS + [
        {"name": "mom", "type": "derived",
         "type_params": {"expr": "cur - prev",
                         "metrics": [
                             {"name": "revenue", "alias": "cur"},
                             {"name": "revenue", "alias": "prev",
                              "offset_window": "1 month"}]}},
    ]
    with pytest.raises(MetricQueryError, match="time group-by"):
        compile_metrics_sql(["mom"], metrics, [ORDERS_SM, PAYMENTS_SM],
                            TABLES, group_by=[])
