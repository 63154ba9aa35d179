"""The examples/jaffle_spark project builds end-to-end: seeds, staging views,
mart tables (SQL + python), dbt_utils pivot, generic + unit tests, snapshot."""

import os
import shutil

from dbt_spark.runner import Engine

EXAMPLE = os.path.join(os.path.dirname(__file__), "..", "examples", "jaffle_spark")


def test_example_project_builds(tmp_path, spark):
    root = str(tmp_path / "jaffle_spark")
    shutil.copytree(EXAMPLE, root)
    eng = Engine(root, spark=spark)
    r = eng.invoke(["build"])
    assert r.success, [(x.unique_id, x.message[:200]) for x in r.results
                       if x.status not in ("success", "pass", "warn")]

    cust = {x["customer_id"]: x for x in eng.store.read("main", "customers").collect()}
    assert cust[1]["number_of_orders"] == 2
    assert float(cust[1]["customer_lifetime_value"]) == 12.5

    piv = {x["order_id"]: x for x in
           eng.store.read("main", "order_payments").collect()}
    assert float(piv[1]["credit_card"]) == 10.0 and float(piv[1]["coupon"]) == 0

    top = eng.store.read("main", "top_customers").collect()
    assert len(top) == 2 and top[0]["customer_lifetime_value"] >= top[1]["customer_lifetime_value"]

    # custom incremental strategy (get_incremental_append_new_sql macro):
    # run 1 created order_events_log via build; run 2 re-offers the same
    # orders and the first-write-wins DML must insert nothing new
    n1 = eng.store.read("main", "order_events_log").count()
    r = eng.invoke(["run", "--select", "order_events_log"])
    assert r.success, [x.message for x in r.results]
    assert eng.store.read("main", "order_events_log").count() == n1 == 4

    # snapshot (separate command), then verify SCD2 columns
    r = eng.invoke(["snapshot"])
    assert r.success
    snap = eng.store.read("main", "customers_snapshot")
    assert "dbt_valid_from" in snap.columns and snap.count() == 3

    # unit test ran as part of build
    assert any(x.unique_id.endswith("ut_customers_clv") and x.status == "pass"
               for x in eng.invoke(["test"]).results)

    # selectors.yml works
    ids = {x.unique_id for x in eng.invoke(["ls", "--selector", "marts_only"]).results}
    assert "model.jaffle_spark.customers" in ids
    assert "model.jaffle_spark.stg_orders" not in ids

    # semantic layer: programmatic metric query over the built models
    # (semantic.yml defines orders_sm + simple/ratio/cumulative metrics)
    rows = {
        str(r["status"]): r
        for r in eng.query_metrics(
            ["orders_total", "completed_share"], group_by=["status"]
        ).collect()
    }
    assert rows["completed"]["orders_total"] == 3
    assert rows["completed"]["completed_share"] == 1.0
    assert rows["returned"]["completed_share"] == 0.0
    run_tot = (
        eng.query_metrics(["orders_running_total"],
                          group_by=["metric_time__month"])
        .orderBy("metric_time__month").collect()
    )
    assert [r["orders_running_total"] for r in run_tot] == [2, 4]


CURATION = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "pretraining_curation")


def test_curation_example_builds(tmp_path, spark):
    """examples/pretraining_curation: staged stats → quality gate →
    fingerprint dedup (model config) → balanced sample → shards, with
    generic tests and an exposure, all through one `build`."""
    root = str(tmp_path / "pretraining_curation")
    shutil.copytree(CURATION, root)
    eng = Engine(root, spark=spark)
    r = eng.invoke(["build"])
    assert r.success, [(x.unique_id, x.message[:200]) for x in r.results
                       if x.status not in ("success", "pass", "warn")]

    total = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    clean = eng.store.read("main", "clean_documents")
    n_clean = clean.count()
    assert 0 < n_clean < total  # gate + dedup dropped something
    ids = [r_["doc_id"] for r_ in clean.select("doc_id").collect()]
    assert len(ids) == len(set(ids))

    sample = eng.store.read("main", "balanced_sample").collect()
    per_lang = {}
    for row in sample:
        per_lang.setdefault(row["lang"], 0)
        per_lang[row["lang"]] += 1
    assert per_lang and all(n <= 20 for n in per_lang.values())

    shards = eng.store.read("main", "training_shards").collect()
    assert len(shards) == len(sample)
    assert all(0 <= row["shard"] <= 15 for row in shards)

    stats = {row["lang"]: row["n_docs"]
             for row in eng.store.read("main", "corpus_stats").collect()}
    assert sum(stats.values()) == n_clean

    # exposure parsed and selectable
    ids = {x.unique_id for x in eng.invoke(
        ["ls", "--select", "+exposure:pretraining_dataset"]).results}
    assert "model.curation.training_shards" in ids
    assert "model.curation.clean_documents" in ids


STREAMING = os.path.join(os.path.dirname(__file__), "..", "examples",
                         "streaming_ingest")


def test_streaming_example_checkpoints_between_runs(tmp_path, spark, monkeypatch):
    """examples/streaming_ingest: run 1 ingests batch 1; run 2 processes
    ONLY batch 2's files (checkpoint offsets); the downstream batch model
    sees the union."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "streaming_ingest")
    shutil.copytree(STREAMING, root)
    landing = str(tmp_path / "landing")
    monkeypatch.setenv("STREAM_LANDING_DIR", landing)

    from dbt_spark.session import read_parquet
    events = read_parquet(spark, "/root/testdata/sf0.001/events.parquet")
    mid = events.agg(F.max("event_id")).collect()[0][0] // 2
    events.filter(F.col("event_id") <= mid).write.mode("append").parquet(landing)

    eng = Engine(root, spark=spark)
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results if x.status != "success"]
    n1 = eng.store.read("main", "events_clean").count()
    want1 = events.filter((F.col("event_id") <= mid)
                          & (F.col("event_type") != "error")).count()
    assert n1 == want1

    events.filter(F.col("event_id") > mid).write.mode("append").parquet(landing)
    eng2 = Engine(root, spark=spark)
    assert eng2.invoke(["run"]).success
    n2 = eng2.store.read("main", "events_clean").count()
    assert n2 == events.filter(F.col("event_type") != "error").count()
    totals = eng2.store.read("main", "user_totals")
    assert totals.agg(F.sum("n_events")).collect()[0][0] == n2
