"""End-to-end engine tests: jaffle-shop-mini (seed → staging views → mart
table → generic tests), mirroring tests/functional/basic/test_jaffle_shop.py
in the reference (inline fixtures, real commands, assertions on relations)."""

import os

import pytest

from dbt_spark.runner import Engine

DBT_PROJECT = """
name: jaffle
model-paths: ["models"]
seed-paths: ["seeds"]
models:
  jaffle:
    +materialized: view
    marts:
      +materialized: table
"""

RAW_CUSTOMERS = "id,first_name,last_name\n1,Michael,P.\n2,Shawn,M.\n3,Kathleen,P.\n"
RAW_ORDERS = (
    "id,user_id,order_date,status\n"
    "1,1,2018-01-01,returned\n"
    "2,3,2018-01-02,completed\n"
    "3,1,2018-01-04,completed\n"
    "4,2,2018-01-05,placed\n"
)
RAW_PAYMENTS = (
    "id,order_id,payment_method,amount\n"
    "1,1,credit_card,1000\n"
    "2,2,credit_card,2000\n"
    "3,3,coupon,100\n"
    "4,4,bank_transfer,500\n"
)

STG_CUSTOMERS = "select id as customer_id, first_name, last_name from {{ ref('raw_customers') }}"
STG_ORDERS = "select id as order_id, user_id as customer_id, order_date, status from {{ ref('raw_orders') }}"
STG_PAYMENTS = "select id as payment_id, order_id, payment_method, amount from {{ ref('raw_payments') }}"

CUSTOMERS_MODEL = """
with customer_orders as (
    select customer_id,
           min(order_date) as first_order,
           max(order_date) as most_recent_order,
           count(order_id) as number_of_orders
    from {{ ref('stg_orders') }}
    group by customer_id
),
customer_payments as (
    select o.customer_id, sum(p.amount) as total_amount
    from {{ ref('stg_payments') }} p
    left join {{ ref('stg_orders') }} o on p.order_id = o.order_id
    group by o.customer_id
)
select c.customer_id, c.first_name, c.last_name,
       o.first_order, o.most_recent_order,
       coalesce(o.number_of_orders, 0) as number_of_orders,
       coalesce(p.total_amount, 0) as customer_lifetime_value
from {{ ref('stg_customers') }} c
left join customer_orders o on c.customer_id = o.customer_id
left join customer_payments p on c.customer_id = p.customer_id
"""

SCHEMA_YML = """
models:
  - name: customers
    columns:
      - name: customer_id
        data_tests:
          - not_null
          - unique
  - name: stg_orders
    columns:
      - name: status
        data_tests:
          - accepted_values:
              values: [placed, shipped, completed, return_pending, returned]
      - name: customer_id
        data_tests:
          - relationships:
              to: ref('stg_customers')
              field: customer_id
"""

JAFFLE_FILES = {
    "dbt_project.yml": DBT_PROJECT,
    "seeds/raw_customers.csv": RAW_CUSTOMERS,
    "seeds/raw_orders.csv": RAW_ORDERS,
    "seeds/raw_payments.csv": RAW_PAYMENTS,
    "models/staging/stg_customers.sql": STG_CUSTOMERS,
    "models/staging/stg_orders.sql": STG_ORDERS,
    "models/staging/stg_payments.sql": STG_PAYMENTS,
    "models/marts/customers.sql": CUSTOMERS_MODEL,
    "models/marts/schema.yml": SCHEMA_YML,
}


@pytest.fixture()
def jaffle(project_dir, spark):
    root = project_dir(JAFFLE_FILES)
    return Engine(root, spark=spark)


def test_parse_builds_manifest_and_dag(jaffle):
    manifest = jaffle.parse()
    assert "model.jaffle.customers" in manifest.nodes
    assert "seed.jaffle.raw_orders" in manifest.nodes
    customers = manifest.nodes["model.jaffle.customers"]
    assert set(customers.depends_on) == {
        "model.jaffle.stg_customers",
        "model.jaffle.stg_orders",
        "model.jaffle.stg_payments",
    }
    # dir-hierarchy config: marts/ is table, staging/ inherits view
    assert customers.config.materialized == "table"
    assert manifest.nodes["model.jaffle.stg_orders"].config.materialized == "view"
    tests = [n for n in manifest.nodes.values() if n.resource_type.value == "test"]
    assert len(tests) == 4


def test_seed_then_run_then_test(jaffle, spark):
    assert jaffle.invoke(["seed"]).success
    r = jaffle.invoke(["run"])
    assert r.success, [x.message for x in r.results if x.status == "error"]
    customers = jaffle.store.read("main", "customers").orderBy("customer_id").collect()
    assert len(customers) == 3
    assert customers[0]["number_of_orders"] == 2
    assert customers[0]["customer_lifetime_value"] == 1100
    assert customers[1]["number_of_orders"] == 1
    t = jaffle.invoke(["test"])
    assert t.success
    assert all(x.status == "pass" for x in t.results)


def test_build_runs_everything_with_test_edges(jaffle):
    r = jaffle.invoke(["build"])
    assert r.success
    statuses = {x.unique_id: x.status for x in r.results}
    assert statuses["model.jaffle.customers"] == "success"
    assert sum(1 for uid in statuses if uid.startswith("test.")) == 4


def test_failing_test_blocks_downstream_in_build(project_dir, spark):
    files = dict(JAFFLE_FILES)
    # inject a duplicate customer id -> `unique` fails on stg_customers,
    # and with test edges the downstream mart must be skipped
    files["seeds/raw_customers.csv"] = RAW_CUSTOMERS + "3,Dup,Row\n"
    files["models/marts/schema.yml"] = """
models:
  - name: stg_customers
    columns:
      - name: customer_id
        data_tests: [unique]
"""
    eng = Engine(project_dir(files), spark=spark)
    r = eng.invoke(["build"])
    assert not r.success
    by_id = {x.unique_id: x.status for x in r.results}
    assert by_id["test.jaffle.unique_stg_customers_customer_id"] == "fail"
    assert by_id["model.jaffle.customers"] == "skipped"


def test_selectors(jaffle):
    jaffle.parse()
    r = jaffle.invoke(["ls", "--select", "+customers"])
    ids = {x.unique_id for x in r.results}
    assert "model.jaffle.customers" in ids
    assert "model.jaffle.stg_orders" in ids
    assert "seed.jaffle.raw_orders" in ids
    r2 = jaffle.invoke(["ls", "--select", "tag:nonexistent"])
    assert r2.results == []
    r3 = jaffle.invoke(["ls", "--select", "stg_*"])
    ids3 = {x.unique_id for x in r3.results}
    # the three models, plus their attached tests via eager indirect selection
    assert {u for u in ids3 if u.startswith("model.")} == {
        "model.jaffle.stg_customers",
        "model.jaffle.stg_orders",
        "model.jaffle.stg_payments",
    }
    assert all(u.startswith(("model.", "test.")) for u in ids3)
    r4 = jaffle.invoke(["ls", "--select", "stg_*", "--indirect-selection", "empty"])
    assert {x.unique_id for x in r4.results} == {
        "model.jaffle.stg_customers",
        "model.jaffle.stg_orders",
        "model.jaffle.stg_payments",
    }


def test_run_subset_with_persisted_upstream(jaffle):
    assert jaffle.invoke(["seed"]).success
    assert jaffle.invoke(["run", "--select", "stg_orders"]).success
    # downstream-only run must re-register persisted upstream relations
    r = jaffle.invoke(["run", "--select", "customers"])
    assert not r.success  # stg_customers/stg_payments views never built
    assert jaffle.invoke(["run"]).success


def test_ephemeral_inlining(project_dir, spark):
    files = {
        "dbt_project.yml": "name: eph\n",
        "seeds/nums.csv": "n\n1\n2\n3\n",
        "models/doubled.sql": (
            "{{ config(materialized='ephemeral') }}\n"
            "select n * 2 as n2 from {{ ref('nums') }}"
        ),
        "models/final.sql": (
            "{{ config(materialized='table') }}\n"
            "select sum(n2) as total from {{ ref('doubled') }}"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    assert eng.store.read("main", "final").collect()[0]["total"] == 12
    # ephemeral must not be materialized
    assert eng.store.get("main", "doubled") is None


def test_python_model(project_dir, spark):
    files = {
        "dbt_project.yml": "name: pymod\n",
        "seeds/nums.csv": "n\n1\n2\n3\n",
        "models/py_stats.py": (
            "def model(dbt, session):\n"
            "    dbt.config(materialized='table')\n"
            "    df = dbt.ref('nums')\n"
            "    from pyspark.sql import functions as F\n"
            "    return df.agg(F.sum('n').alias('total'))\n"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    assert eng.store.read("main", "py_stats").collect()[0]["total"] == 6


def test_hooks_and_vars(project_dir, spark):
    files = {
        "dbt_project.yml": (
            "name: hooky\nvars:\n  factor: 3\n"
        ),
        "seeds/nums.csv": "n\n1\n2\n",
        "models/scaled.sql": (
            "{{ config(materialized='table', post_hook='select 1') }}\n"
            "select n * {{ var('factor') }} as scaled from {{ ref('nums') }}"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    rows = eng.store.read("main", "scaled").orderBy("scaled").collect()
    assert [r["scaled"] for r in rows] == [3, 6]


def test_relationships_test_on_child_no_cycle(project_dir, spark):
    """A relationships test attached to the child model whose to: target is
    also the child's upstream must not cycle the build graph
    (second-order test edges exclude the test's upstream closure)."""
    from dbt_spark.runner import Engine

    root = project_dir({
        "dbt_project.yml": "name: cyc\n",
        "models/parent.sql": "select 1 as id",
        "models/child.sql": "select id from {{ ref('parent') }}",
        "models/schema.yml": """
models:
  - name: child
    columns:
      - name: id
        data_tests:
          - relationships:
              to: ref('parent')
              field: id
""",
    })
    r = Engine(root, spark=spark).invoke(["build"])
    assert r.success, [x.message for x in r.results]
    assert any("relationships" in x.unique_id and x.status == "pass"
               for x in r.results)


def test_compile_inlines_ephemeral_ctes(project_dir, spark):
    """`compile` output inlines ephemeral refs as __dbt__cte__ clauses
    (compilation.py:493-583), including transitive chains and models with
    their own WITH clause."""
    from dbt_spark.runner import Engine

    root = project_dir({
        "dbt_project.yml": "name: eph\n",
        "models/base.sql": "{{ config(materialized='ephemeral') }} select 1 as id",
        "models/mid.sql": (
            "{{ config(materialized='ephemeral') }} "
            "select id, id * 2 as dbl from {{ ref('base') }}"
        ),
        "models/final.sql": (
            "with local_cte as (select 10 as bonus) "
            "select m.id, m.dbl + b.bonus as v from {{ ref('mid') }} m "
            "cross join local_cte b"
        ),
    })
    eng = Engine(root, spark=spark)
    r = eng.invoke(["compile", "--select", "final"])
    assert r.success, [x.message for x in r.results]
    compiled = open(os.path.join(root, "target", "compiled", "models", "final.sql")).read()
    assert "__dbt__cte__mid" in compiled and "__dbt__cte__base" in compiled
    # merged into ONE with-clause; base (transitive dep) defined before use
    assert compiled.lower().count("with ") == 1
    assert compiled.index("__dbt__cte__base") < compiled.index("select id, id * 2")
    # the compiled string is self-contained runnable SQL
    assert spark.sql(compiled).collect()[0]["v"] == 12


def test_bucketed_tables_join_without_shuffle(project_dir, spark):
    """config(bucket_by=..., buckets=N) writes a hash-bucketed, per-bucket
    sorted table; a join between two co-bucketed models runs with NO shuffle
    exchange (the 100 TB co-location primitive — Catalyst reads the bucket
    spec as each scan's outputPartitioning)."""
    from tests.conftest import SF_DIR

    files = {
        "dbt_project.yml": "name: bkt\n",
        "models/sources.yml": f"""
sources:
  - name: tpch
    tables:
      - name: orders
        meta: {{location: "{SF_DIR}/orders.parquet"}}
      - name: customer
        meta: {{location: "{SF_DIR}/customer.parquet"}}
""",
        "models/b_orders.sql": (
            "{{ config(materialized='table', bucket_by='o_custkey', buckets=4) }}"
            "select o_orderkey, o_custkey, o_totalprice "
            "from {{ source('tpch','orders') }}"
        ),
        "models/b_cust.sql": (
            "{{ config(materialized='table', bucket_by='c_custkey', buckets=4) }}"
            "select c_custkey, c_name from {{ source('tpch','customer') }}"
        ),
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]

    orders = eng.store.read("main", "b_orders")
    cust = eng.store.read("main", "b_cust")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # forbid broadcast so the only shuffle-free path is the bucket spec
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        n = joined.count()
        assert n > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # the layout survives a fresh store/catalog (bucket ids live in file
    # names; _ensure_bucketed_table recreates the catalog entry)
    spark.sql("DROP TABLE IF EXISTS main__b_orders")
    from dbt_spark.catalog import RelationStore

    store2 = RelationStore(spark, eng.store.warehouse)
    df2 = store2.read("main", "b_orders")
    assert df2.count() == orders.count()
    desc = spark.sql("DESCRIBE EXTENDED main__b_orders").collect()
    txt = "\n".join(str(row) for row in desc)
    assert "o_custkey" in txt and "4" in txt


def test_profiles_yml_targets(project_dir, spark, tmp_path):
    """Reference profiles.yml layout: profile-name -> outputs -> target
    (config/profile.py:56-77); the project's `profile:` key selects the
    entry, `target:` (or Engine(target=...)) picks the output; `{{ target }}`
    reflects the chosen output."""
    wh_dev = str(tmp_path / "wh_dev")
    wh_prod = str(tmp_path / "wh_prod")
    files = {
        "dbt_project.yml": "name: ptest\nprofile: my_wh\n",
        "profiles.yml": f"""
my_wh:
  target: dev
  outputs:
    dev: {{warehouse: "{wh_dev}", schema: main, threads: 2}}
    prod: {{warehouse: "{wh_prod}", schema: main, threads: 8}}
""",
        "models/t.sql": "select '{{ target.name }}' as tname",
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.project.profile["warehouse"] == wh_dev
    assert eng.project.profile["threads"] == 2
    assert eng.invoke(["run"]).success
    assert [r["tname"] for r in eng.store.read("main", "t").collect()] == ["dev"]

    eng_prod = Engine(root, spark=spark, target="prod")
    assert eng_prod.project.profile["warehouse"] == wh_prod
    assert eng_prod.invoke(["run"]).success
    assert [r["tname"] for r in eng_prod.store.read("main", "t").collect()] == ["prod"]

    import pytest as _pytest

    with _pytest.raises(KeyError):
        Engine(root, spark=spark, target="nope")


def test_resource_type_flag(jaffle):
    """--resource-type narrows build/ls to the named resource kinds
    (reference --resource-type flag)."""
    eng = jaffle
    r = eng.invoke(["ls", "--resource-type", "seed"])
    ids = {x.unique_id for x in r.results}
    assert ids and all(u.startswith("seed.") for u in ids)
    r = eng.invoke(["build", "--resource-type", "seed"])
    assert r.success
    assert all(x.unique_id.startswith("seed.") for x in r.results)


def test_sort_by_clusters_rows_within_files(project_dir, spark):
    """config(sort_by=...) writes per-file sorted data (row-group min/max
    pruning fodder): each parquet file's column is locally ordered."""
    from tests.conftest import SF_DIR

    files = {
        "dbt_project.yml": "name: srt\n",
        "models/sources.yml": f"""
sources:
  - name: tpch
    tables:
      - name: orders
        meta: {{location: "{SF_DIR}/orders.parquet"}}
""",
        "models/sorted_orders.sql": (
            "{{ config(materialized='table', sort_by='o_orderdate') }}"
            "select o_orderkey, o_orderdate from {{ source('tpch','orders') }}"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    assert eng.invoke(["run"]).success
    rel = eng.store.get("main", "sorted_orders")
    import pyarrow.parquet as pq

    checked = 0
    for dp, _d, fs in os.walk(rel.path):
        for fn in fs:
            if not fn.endswith(".parquet"):
                continue
            col = pq.read_table(os.path.join(dp, fn), columns=["o_orderdate"])
            vals = col.column(0).to_pylist()
            assert vals == sorted(vals), fn
            checked += 1
    assert checked > 0


def test_python_model_context_members(project_dir, spark):
    """Python models see dbt.this / dbt.is_incremental() / dbt.config.get
    and may return a pandas DataFrame (lifted to Spark) — reference python
    model context (providers.py:1566-1578 + py_script_postfix surface)."""
    files = {
        "dbt_project.yml": "name: pym\n",
        "models/base.sql": "select 1 as id union all select 2 as id",
        "models/pmodel.py": """
def model(dbt, session):
    dbt.config(materialized="table", meta_tag="x")
    base = dbt.ref("base")
    assert str(dbt.this).endswith("__pmodel")
    assert dbt.is_incremental is False  # property, like the reference API
    assert dbt.config.get("materialized") == "table"
    return base.toPandas()  # pandas return is lifted back to Spark
""",
    }
    eng = Engine(project_dir(files), spark=spark)
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    assert sorted(x["id"] for x in eng.store.read("main", "pmodel").collect()) == [1, 2]


def test_ephemeral_cache_config(project_dir, spark):
    """config(cache=true) on an ephemeral model caches the shared subplan so
    N consumers compute it once (SURVEY §4 common-subplan reuse)."""
    files = {
        "dbt_project.yml": "name: ephc\n",
        "models/shared.sql": (
            "{{ config(materialized='ephemeral', cache=true) }}"
            "select 1 as id union all select 2 as id"
        ),
        "models/a.sql": "select count(*) as n from {{ ref('shared') }}",
        "models/b.sql": "select sum(id) as s from {{ ref('shared') }}",
    }
    eng = Engine(project_dir(files), spark=spark)
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    assert spark.catalog.isCached("__eph__shared")
    assert [x["n"] for x in eng.store.read("main", "a").collect()] == [2]
    assert [x["s"] for x in eng.store.read("main", "b").collect()] == [3]
    spark.catalog.uncacheTable("__eph__shared")


def test_seed_size_cap(project_dir, spark):
    """Seeds over 1 MB are rejected (MAXIMUM_SEED_SIZE,
    core/dbt/constants.py:7) — seeds are version-controlled inputs, not a
    data-loading path."""
    big = "id,v\n" + "\n".join(f"{i},{'x' * 60}" for i in range(20000))
    assert len(big) > 1024 * 1024
    root = project_dir({
        "dbt_project.yml": "name: bigseed\n",
        "seeds/huge.csv": big,
    })
    r = Engine(root, spark=spark).invoke(["seed"])
    assert not r.success
    assert "capped at 1048576" in r.results[0].message


def test_python_incremental_model(project_dir, spark):
    """Python model + incremental materialization: dbt.is_incremental gates
    the slice, merge strategy upserts."""
    files = {
        "dbt_project.yml": "name: pyi\n",
        "seeds/rows.csv": "id,val\n1,10\n2,20\n",
        "models/acc.py": """
def model(dbt, session):
    dbt.config(materialized="incremental", incremental_strategy="merge",
               unique_key="id")
    df = dbt.ref("rows")
    if dbt.is_incremental:
        df = df.withColumn("val", df.val + 100)
    return df
""",
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    assert {r["id"]: r["val"] for r in eng.store.read("main", "acc").collect()} \
        == {1: 10, 2: 20}
    # second run takes the incremental branch; merge upserts by id
    assert eng.invoke(["run"]).success
    assert {r["id"]: r["val"] for r in eng.store.read("main", "acc").collect()} \
        == {1: 110, 2: 120}


def test_concurrent_wide_graph_stress(project_dir, spark):
    """48 models across 3 DAG tiers at threads=8: the FAIR-scheduler thread
    pool must keep per-thread compile/materialize state isolated (guards the
    temp-view registration race) and topological order across tiers."""
    from tests.conftest import SF_DIR
    files = {
        "dbt_project.yml": "name: wide\n",
        "models/sources.yml": f"""
sources:
  - name: tpch
    tables:
      - name: orders
        meta: {{location: "{SF_DIR}/orders.parquet"}}
""",
    }
    for i in range(16):
        files[f"models/t0_{i}.sql"] = (
            "{{ config(materialized='table') }} "
            f"select o_orderkey, o_custkey, o_totalprice from "
            "{{ source('tpch','orders') }} "
            f"where o_orderkey % 16 = {i}"
        )
    for i in range(16):
        files[f"models/t1_{i}.sql"] = (
            f"select o_custkey, count(*) as n, {i} as branch from "
            f"{{{{ ref('t0_{i}') }}}} group by o_custkey"
        )
    for i in range(16):
        a, b = i, (i + 1) % 16
        files[f"models/t2_{i}.sql"] = (
            f"select a.branch, count(*) as n from {{{{ ref('t1_{a}') }}}} a "
            f"join {{{{ ref('t1_{b}') }}}} b on a.o_custkey = b.o_custkey "
            "group by a.branch"
        )
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    r = eng.invoke(["run", "--threads", "8"])
    assert r.success, [(x.unique_id, x.message[:120]) for x in r.results
                       if x.status != "success"]
    assert len(r.results) == 48
    # spot-check tier-2 correctness against a direct computation
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    t2_0 = eng.store.read("main", "t2_0").collect()
    from pyspark.sql import functions as F
    a = orders.filter(F.col("o_orderkey") % 16 == 0).groupBy("o_custkey").count()
    b = orders.filter(F.col("o_orderkey") % 16 == 1).groupBy("o_custkey").count()
    want = a.join(b, "o_custkey").count()
    assert t2_0[0]["n"] == want


def test_file_format_and_location_root(project_dir, spark, tmp_path):
    """config(file_format=..., location_root=...): dbt-spark adapter storage
    knobs — orc/json/csv tables round-trip with exact types (schema JSON
    persisted for schema-light formats), external location honored, and an
    incremental merge works on a csv-backed target."""
    from tests.conftest import SF_DIR

    ext = str(tmp_path / "external")
    files = {
        "dbt_project.yml": "name: fmt\n",
        "models/sources.yml": f"""
sources:
  - name: tpch
    tables:
      - name: orders
        meta: {{location: "{SF_DIR}/orders.parquet"}}
""",
        "models/t_orc.sql": (
            "{{ config(materialized='table', file_format='orc') }} "
            "select o_orderkey, o_totalprice, o_orderdate from "
            "{{ source('tpch','orders') }} where o_orderkey < 100"
        ),
        "models/t_csv.sql": (
            "{{ config(materialized='table', file_format='csv') }} "
            "select o_orderkey, o_orderstatus, o_totalprice from "
            "{{ source('tpch','orders') }} where o_orderkey < 100"
        ),
        "models/t_ext.sql": (
            "{{ config(materialized='table', location_root='%s') }} "
            "select count(*) as n from {{ ref('t_orc') }}" % ext
        ),
        "models/t_incr_csv.sql": (
            "{{ config(materialized='incremental', incremental_strategy='merge', "
            "unique_key='o_orderkey', file_format='csv') }} "
            "select o_orderkey, o_totalprice from {{ source('tpch','orders') }} "
            "where o_orderkey < {{ var('hi', 50) }}"
        ),
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark, vars={"hi": 50})
    r = eng.invoke(["run"])
    assert r.success, [(x.unique_id, x.message[:150]) for x in r.results
                       if x.status != "success"]

    want = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter("o_orderkey < 100")
    orc = eng.store.read("main", "t_orc")
    assert orc.count() == want.count()
    assert dict(orc.dtypes)["o_totalprice"] == "double"
    csvt = eng.store.read("main", "t_csv")
    assert dict(csvt.dtypes)["o_orderkey"] == "bigint"  # exact, not inferred str
    assert csvt.count() == want.count()
    # models can ref() across formats; external location on disk
    assert os.path.isdir(os.path.join(ext, "t_ext"))
    assert eng.store.read("main", "t_ext").collect()[0]["n"] == want.count()

    # csv-backed incremental merge: second run widens the key range
    eng2 = Engine(root, spark=spark, vars={"hi": 80})
    assert eng2.invoke(["run", "--select", "t_incr_csv"]).success
    got = eng2.store.read("main", "t_incr_csv")
    assert got.count() == spark.read.parquet(
        f"{SF_DIR}/orders.parquet").filter("o_orderkey < 80").count()

    # insert_overwrite + non-parquet is a loud error, not silent corruption
    files2 = dict(files)
    files2["models/t_bad.sql"] = (
        "{{ config(materialized='incremental', "
        "incremental_strategy='insert_overwrite', partition_by='o_orderstatus', "
        "file_format='csv') }} "
        "select o_orderkey, o_orderstatus from {{ source('tpch','orders') }}"
    )
    root2 = str(tmp_path / "fmt2")
    os.makedirs(root2, exist_ok=True)
    for rel, content in files2.items():
        p = os.path.join(root2, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            f.write(content)
    r2 = Engine(root2, spark=spark).invoke(["run", "--select", "t_bad"])
    assert not r2.success
    assert "not supported with partitioned incremental" in " ".join(
        x.message or "" for x in r2.results)


def test_compact_preserves_file_format(project_dir, spark):
    """compact on a csv-backed incremental target keeps the csv format
    (a parquet rewrite under unchanged meta would break every later read)."""
    from tests.conftest import SF_DIR

    files = {
        "dbt_project.yml": "name: cfmt\n",
        "models/sources.yml": f"""
sources:
  - name: tpch
    tables:
      - name: orders
        meta: {{location: "{SF_DIR}/orders.parquet"}}
""",
        "models/t_csv_inc.sql": (
            "{{ config(materialized='incremental', incremental_strategy='append', "
            "file_format='csv') }} "
            "select o_orderkey, o_totalprice from {{ source('tpch','orders') }} "
            "where o_orderkey % 4 = {{ var('m', 0) }}"
        ),
    }
    root = project_dir(files)
    for m in range(3):  # 3 appends -> several small csv files
        assert Engine(root, spark=spark, vars={"m": m}).invoke(["run"]).success
    eng = Engine(root, spark=spark, vars={"m": 0})
    before_count = eng.store.read("main", "t_csv_inc").count()
    r = eng.invoke(["run-operation", "compact",
                    "--args", "{relation: t_csv_inc}"])
    assert r.success, [x.message for x in r.results]
    rel = eng.store.get("main", "t_csv_inc")
    import glob as _glob
    data_files = [f for f in _glob.glob(os.path.join(rel.path, "*"))
                  if not os.path.basename(f).startswith(("_", "."))]
    assert data_files and all(f.endswith(".csv") for f in data_files), data_files
    assert eng.store.read("main", "t_csv_inc").count() == before_count


def test_cache_config_reuses_inmemory_relation(project_dir, spark):
    """config(cache=true) on a shared view: consumers read the
    InMemoryRelation instead of re-running the view plan; the runner
    releases the cache at end of invocation."""
    from tests.conftest import SF_DIR

    files = {
        "dbt_project.yml": "name: cch\n",
        "models/sources.yml": f"""
sources:
  - name: tpch
    tables:
      - name: orders
        meta: {{location: "{SF_DIR}/orders.parquet"}}
""",
        "models/hot.sql": (
            "{{ config(materialized='view', cache=true) }} "
            "select o_custkey, count(*) as n from {{ source('tpch','orders') }} "
            "group by o_custkey"
        ),
        "models/use_a.sql": (
            "{{ config(materialized='table') }} "
            "select count(*) as c from {{ ref('hot') }} where n > 1"
        ),
        "models/use_b.sql": (
            "{{ config(materialized='table') }} "
            "select max(n) as m from {{ ref('hot') }}"
        ),
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    # during the run the consumers' plans must hit the in-memory relation:
    # verify by re-creating the cached view state mid-invocation via a probe
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results if x.status != "success"]
    a = eng.store.read("main", "use_a").collect()[0]["c"]
    b = eng.store.read("main", "use_b").collect()[0]["m"]
    direct = spark.read.parquet(f"{SF_DIR}/orders.parquet")\
        .groupBy("o_custkey").count()
    assert a == direct.filter("count > 1").count()
    assert b == direct.groupBy().max("count").collect()[0][0]
    # direct probe of the mechanism: materialize with cache -> isCached,
    # consumer plan reads InMemoryTableScan, uncache releases
    from dbt_spark.operators.materialize import ExecutionContext, materialize_view
    ctx = ExecutionContext(spark=spark, store=eng.store,
                           manifest=eng.manifest, project=eng.project)
    node = eng.manifest.nodes["model.cch.hot"]
    rel = materialize_view(ctx, node)
    assert spark.catalog.isCached(rel.identifier)
    plan = spark.sql(f"select max(n) from {rel.identifier}")\
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan, plan
    spark.sql(f"UNCACHE TABLE {rel.identifier}")
    assert not spark.catalog.isCached(rel.identifier)


def test_orphaned_staging_dirs_swept_and_never_read(project_dir, spark):
    """Crash resilience: an orphaned __staging__ dir beside a relation never
    affects reads and is swept by the next successful write."""
    files = {
        "dbt_project.yml": "name: stg\n",
        "seeds/nums.csv": "n\n1\n2\n3\n",
        "models/t.sql": "{{ config(materialized='table') }} "
                        "select sum(n) as total from {{ ref('nums') }}",
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success and eng.invoke(["run"]).success
    rel = eng.store.get("main", "t")
    # simulate a crashed earlier write
    orphan = f"{rel.path}.__staging__123"
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "junk.parquet"), "w") as f:
        f.write("not parquet")
    assert eng.store.read("main", "t").collect()[0]["total"] == 6
    assert Engine(root, spark=spark).invoke(["run"]).success
    assert not os.path.exists(orphan)
    assert eng.store.read("main", "t").collect()[0]["total"] == 6


# --------------------------------------------------------------------------
# catalog persistence: snapshot + write-ahead journal (O(1) per relation
# save — the whole-file rewrite was O(catalog) per model and dominated
# 2,000-model runs)
# --------------------------------------------------------------------------


def test_catalog_journal_appends_and_compacts_on_load(spark, tmp_path):
    from dbt_spark.catalog import RelationStore

    wh = str(tmp_path / "wh")
    store = RelationStore(spark, wh)
    for i in range(5):
        store.save_view("main", f"v{i}", f"SELECT {i} AS id")
    log = os.path.join(wh, "_catalog.json.log")
    # steady state: upserts land in the journal, snapshot untouched
    assert os.path.exists(log)
    assert len(open(log).read().strip().splitlines()) == 5
    import json as _json
    snap = (_json.load(open(os.path.join(wh, "_catalog.json")))
            if os.path.exists(os.path.join(wh, "_catalog.json")) else {})
    assert "main.v3" not in snap

    # a fresh store replays the journal, folds it into the snapshot, and
    # truncates the log
    store2 = RelationStore(spark, wh)
    assert sorted(r.name for r in store2.list_relations("main")) == [
        f"v{i}" for i in range(5)]
    assert not os.path.exists(log)
    snap = _json.load(open(os.path.join(wh, "_catalog.json")))
    assert "main.v3" in snap


def test_catalog_journal_tombstone_and_torn_tail(spark, tmp_path):
    from dbt_spark.catalog import RelationStore

    wh = str(tmp_path / "wh")
    store = RelationStore(spark, wh)
    store.save_view("main", "keep", "SELECT 1 AS id")
    store.save_view("main", "gone", "SELECT 2 AS id")
    store.drop("main", "gone")
    log = os.path.join(wh, "_catalog.json.log")
    # simulate a crash mid-append: torn (truncated) trailing json line
    with open(log, "a") as f:
        f.write('{"k": "main.torn", "r": {"schema": "mai')
    store2 = RelationStore(spark, wh)
    names = sorted(r.name for r in store2.list_relations("main"))
    assert names == ["keep"]  # tombstone applied, torn line ignored
    assert not os.path.exists(log)


def test_generic_test_custom_config_fields(project_dir, spark):
    """not_null/unique with CUSTOM config keys parse and run: unknown keys
    route into config.meta instead of erroring — the reference fixed this
    exact shape for its not_null/unique shortcut path
    (.changes/unreleased/Fixes-20250110-155824.yaml, issue 11208;
    schema_generic_tests.py:288-298 keeps builder.config verbatim)."""
    root = project_dir({
        "dbt_project.yml": "name: custcfg\n",
        "models/m.sql": "select 1 as id",
        "models/schema.yml": (
            "models:\n"
            "  - name: m\n"
            "    columns:\n"
            "      - name: id\n"
            "        data_tests:\n"
            "          - not_null:\n"
            "              config:\n"
            "                custom_owner: data-eng\n"
            "                severity: warn\n"
            "          - unique:\n"
            "              config:\n"
            "                ticket: ABC-123\n"
        ),
    })
    eng = Engine(root, spark=spark)
    manifest = eng.parse()
    nn = manifest.nodes["test.custcfg.not_null_m_id"]
    uq = manifest.nodes["test.custcfg.unique_m_id"]
    assert nn.config.meta.get("custom_owner") == "data-eng"
    assert nn.config.severity == "warn"  # known keys still bind typed
    assert uq.config.meta.get("ticket") == "ABC-123"
    res = eng.invoke(["build"])
    assert res.success
    statuses = {r.unique_id: r.status for r in res.results}
    assert statuses["test.custcfg.not_null_m_id"] == "pass"
    assert statuses["test.custcfg.unique_m_id"] == "pass"
