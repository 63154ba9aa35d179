"""Physical-plan shape assertions: the SCALE.md claims as executable checks.

Every headline query family must (a) push its filters into the parquet scan,
(b) prune the read schema to referenced columns, (c) broadcast fixed-size
dimension sides, and (d) keep hot expressions inside WholeStageCodegen. These
are the properties that decide whether a plan survives a 1000× scale-up."""

from dbt_spark.queries import QUERIES

from tests.conftest import SF_DIR_MED


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q6_pushdown_and_pruning(spark):
    """Q6 (pure scan-filter-agg): all predicates reach PushedFilters; the
    scan reads only the 4 referenced columns of lineitem's 10."""
    plan = _formatted(QUERIES["tpch_q6_forecast_revenue"](spark, SF_DIR_MED))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read
    assert "l_orderkey" not in read and "l_comment" not in read.lower()


def test_q3_broadcasts_dimension(spark):
    """Q3: the filtered customer dimension joins via broadcast, not shuffle."""
    plan = _formatted(QUERIES["tpch_q3_shipping_priority"](spark, SF_DIR_MED))
    assert "BroadcastHashJoin" in plan


def test_dedup_exact_partial_aggregation(spark):
    """Exact dedup is a hash aggregate with a map-side partial pass (the
    property that makes it shuffle one row per distinct key, not every row)."""
    plan = _formatted(QUERIES["dedup_exact"](spark, SF_DIR_MED))
    assert "HashAggregate" in plan and "Window" not in plan
    assert "partial_min" in plan  # map-side partial pass
    assert "hashpartitioning" in plan


def test_training_pipeline_single_scan_no_udf(spark):
    """The composed training-data pipeline reads documents ONCE and contains
    no Python UDF (BatchEvalPython) stages — all column math is codegen'd."""
    import re

    plan = _formatted(QUERIES["training_data_pipeline"](spark, SF_DIR_MED))
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_minhash_signature_single_aggregate(spark):
    """The minhash signature aggregate is ONE groupBy(id) with num_perm min
    buffers — no explode over the permutation index, so the exchange carries
    one signature row per doc (SCALE.md: MinHash LSH)."""
    from dbt_spark.functions.dedup import minhash_signatures
    from dbt_spark.session import load_tables

    docs = load_tables(spark, SF_DIR_MED, "documents")["documents"]
    import re

    plan = _formatted(minhash_signatures(docs, "text", "doc_id", num_perm=16))
    assert "partial_min" in plan  # map-side combine before the shuffle
    # shingle explode only — no permutation-index explode
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1


def test_simhash_no_bit_explode(spark):
    """SimHash runs 64 per-bit sums in one aggregate: no 64x bit Generate."""
    from dbt_spark.functions.dedup import simhash_bands
    from dbt_spark.session import load_tables

    docs = load_tables(spark, SF_DIR_MED, "documents")["documents"]
    import re

    plan = _formatted(simhash_bands(docs, "text", "doc_id"))
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1  # token explode only
    assert "partial_sum" in plan


def test_gaps_islands_single_shuffle_key(spark):
    """Both window passes and the final aggregate share the user_id hash
    partitioning — one exchange, reused across stages."""
    import re

    plan = _formatted(QUERIES["gaps_islands_sessions"](spark, SF_DIR_MED))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_pivot_native_single_pass(spark):
    """Explicit pivot values -> no distinct-values pre-job; one aggregate."""
    plan = _formatted(QUERIES["pivot_native"](spark, SF_DIR_MED))
    assert "HashAggregate" in plan and (
        "partial_pivotfirst" in plan.lower() or "pivotfirst" in plan.lower()
    )
