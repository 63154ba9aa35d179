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
