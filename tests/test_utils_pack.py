"""dbt_utils-compatible generic tests (the built-in global package).

Reference consumption pattern: hub package dbt-labs/dbt_utils
macros/generic_tests/* invoked from YAML as
``data_tests: [dbt_utils.<name>: {...}]``; execution contract is the core
failing-rows semantics (core/dbt/task/test.py:142-197). Every test here
runs the REAL engine path: YAML parse -> namespaced {% test %} macro
lookup -> runtime render (ref()/source() kwargs resolved) -> failing-rows
SQL -> severity policy.

Each dbt_utils test gets a passing and a failing case over seed data
engineered to trip exactly that assertion.
"""

import os

import pytest

from dbt_spark.runner import Engine


BASE = {
    "dbt_project.yml": "name: utilpack\n",
    # child/parent pair with controlled defects
    "seeds/parent.csv": "id,grp\n1,a\n2,a\n3,b\n",
    "seeds/child.csv": (
        "id,parent_id,grp,status,amount,seq,lo,hi,name\n"
        "1,1,a,open,5.0,1,0,10,x\n"
        "2,1,a,open,7.5,2,10,20,y\n"
        "3,2,b,closed,9.9,3,20,30,z\n"
    ),
    # defective twin: dup combo, bad range, blank string, gap+overlap
    "seeds/bad.csv": (
        "id,parent_id,grp,status,amount,seq,lo,hi,name\n"
        "1,1,a,open,5.0,1,0,10,x\n"
        '1,9,a,open,-1.0,3,5,8," "\n'
        "3,2,b,void,150.0,9,8,8,z\n"
    ),
    "models/kids.sql": "select * from {{ ref('child') }}",
    "models/bads.sql": "select * from {{ ref('bad') }}",
    "models/kids_copy.sql": "select * from {{ ref('child') }}",
}


@pytest.fixture()
def eng(project_dir, spark):
    pdir = project_dir(BASE)
    return Engine(pdir, spark=spark), pdir


def _run_tests(eng_pdir, yaml_text, select=None):
    eng, pdir = eng_pdir
    with open(os.path.join(pdir, "models", "schema.yml"), "w") as f:
        f.write(yaml_text)
    argv = ["build"]
    if select:
        argv += ["--select", select]
    return eng.invoke(argv)


def _statuses(r):
    return {
        x.unique_id: x.status
        for x in r.results
        if x.unique_id.startswith("test.")
    }


def test_equal_rowcount_and_fewer_rows_than(eng):
    r = _run_tests(eng, """
models:
  - name: kids
    data_tests:
      - dbt_utils.equal_rowcount: {compare_model: ref('kids_copy')}
      - dbt_utils.fewer_rows_than: {compare_model: ref('bads')}
""")
    st = _statuses(r)
    assert st["test.utilpack.dbt_utils_equal_rowcount_kids"] == "pass"
    # kids has 3 rows, bads has 3 rows -> NOT fewer -> fail
    assert st["test.utilpack.dbt_utils_fewer_rows_than_kids"] == "fail"
    assert not r.success


def test_equal_rowcount_grouped_fail(eng):
    r = _run_tests(eng, """
models:
  - name: kids
    data_tests:
      - dbt_utils.equal_rowcount:
          compare_model: ref('bads')
          group_by_columns: [grp]
""")
    # kids: a=2,b=1; bads: a=2,b=1 -> equal per group -> pass
    assert _statuses(r)["test.utilpack.dbt_utils_equal_rowcount_kids"] == "pass"


def test_not_constant_and_at_least_one(eng):
    r = _run_tests(eng, """
models:
  - name: kids
    columns:
      - name: status
        data_tests:
          - dbt_utils.not_constant
          - dbt_utils.at_least_one
  - name: bads
    columns:
      - name: name
        data_tests:
          - dbt_utils.at_least_one
      - name: grp
        data_tests:
          - dbt_utils.not_constant
""")
    st = _statuses(r)
    assert st["test.utilpack.dbt_utils_not_constant_kids_status"] == "pass"
    assert st["test.utilpack.dbt_utils_at_least_one_kids_status"] == "pass"
    # bads.name: blank-but-non-null value exists -> pass at_least_one
    assert st["test.utilpack.dbt_utils_at_least_one_bads_name"] == "pass"
    # bads.grp is all 'a','a','b'? -> a,a,b not constant -> pass
    assert st["test.utilpack.dbt_utils_not_constant_bads_grp"] == "pass"


def test_not_constant_fails_on_constant_column(eng):
    r = _run_tests(eng, """
models:
  - name: kids
    columns:
      - name: grp
        data_tests: []
      - name: status
        data_tests: []
  - name: kids_copy
    columns:
      - name: grp
        data_tests: []
""")
    # direct failing case: constant column via where filter
    r = _run_tests(eng, """
models:
  - name: kids
    columns:
      - name: status
        data_tests:
          - dbt_utils.not_constant:
              config: {where: "grp = 'a'"}
""")
    # within grp='a', status is all 'open' -> constant -> fail
    assert _statuses(r)["test.utilpack.dbt_utils_not_constant_kids_status"] == "fail"


def test_unique_combination_of_columns(eng):
    r = _run_tests(eng, """
models:
  - name: kids
    data_tests:
      - dbt_utils.unique_combination_of_columns:
          combination_of_columns: [parent_id, seq]
  - name: bads
    data_tests:
      - dbt_utils.unique_combination_of_columns:
          combination_of_columns: [id, grp]
""")
    st = _statuses(r)
    assert st["test.utilpack.dbt_utils_unique_combination_of_columns_kids"] == "pass"
    # bads has two rows with id=1, grp=a
    assert st["test.utilpack.dbt_utils_unique_combination_of_columns_bads"] == "fail"


def test_accepted_range_and_not_accepted_values(eng):
    r = _run_tests(eng, """
models:
  - name: kids
    columns:
      - name: amount
        data_tests:
          - dbt_utils.accepted_range: {min_value: 0, max_value: 100}
      - name: status
        data_tests:
          - dbt_utils.not_accepted_values: {values: ['void'], quote: true}
  - name: bads
    columns:
      - name: amount
        data_tests:
          - dbt_utils.accepted_range: {min_value: 0, max_value: 100}
      - name: status
        data_tests:
          - dbt_utils.not_accepted_values: {values: ['void']}
""")
    st = _statuses(r)
    assert st["test.utilpack.dbt_utils_accepted_range_kids_amount"] == "pass"
    assert st["test.utilpack.dbt_utils_not_accepted_values_kids_status"] == "pass"
    # bads.amount: -1.0 and 150.0 out of range
    assert st["test.utilpack.dbt_utils_accepted_range_bads_amount"] == "fail"
    # bads.status contains 'void'
    assert st["test.utilpack.dbt_utils_not_accepted_values_bads_status"] == "fail"


def test_accepted_range_exclusive_bound(eng):
    r = _run_tests(eng, """
models:
  - name: kids
    columns:
      - name: amount
        data_tests:
          - dbt_utils.accepted_range: {min_value: 5.0, inclusive: false}
""")
    # amount has a value exactly 5.0 -> exclusive bound trips
    assert _statuses(r)["test.utilpack.dbt_utils_accepted_range_kids_amount"] == "fail"


def test_mutually_exclusive_ranges(eng):
    r = _run_tests(eng, """
models:
  - name: kids
    data_tests:
      - dbt_utils.mutually_exclusive_ranges:
          lower_bound_column: lo
          upper_bound_column: hi
          gaps: not_allowed
  - name: bads
    data_tests:
      - dbt_utils.mutually_exclusive_ranges:
          lower_bound_column: lo
          upper_bound_column: hi
""")
    st = _statuses(r)
    # kids: [0,10),[10,20),[20,30) tile exactly -> pass under not_allowed
    assert st["test.utilpack.dbt_utils_mutually_exclusive_ranges_kids"] == "pass"
    # bads: [0,10) overlaps [5,8); [8,8] zero-length -> fail
    assert st["test.utilpack.dbt_utils_mutually_exclusive_ranges_bads"] == "fail"


def test_sequential_values(eng):
    r = _run_tests(eng, """
models:
  - name: kids
    columns:
      - name: seq
        data_tests:
          - dbt_utils.sequential_values: {interval: 1}
  - name: bads
    columns:
      - name: seq
        data_tests:
          - dbt_utils.sequential_values: {interval: 1}
""")
    st = _statuses(r)
    assert st["test.utilpack.dbt_utils_sequential_values_kids_seq"] == "pass"
    # bads.seq = 1,3,9 -> gaps -> fail
    assert st["test.utilpack.dbt_utils_sequential_values_bads_seq"] == "fail"


def test_expression_is_true_forms(eng):
    r = _run_tests(eng, """
models:
  - name: kids
    data_tests:
      - dbt_utils.expression_is_true: {expression: "hi > lo"}
    columns:
      - name: amount
        data_tests:
          - dbt_utils.expression_is_true: {expression: "> 0"}
  - name: bads
    data_tests:
      - dbt_utils.expression_is_true: {expression: "hi > lo"}
""")
    st = _statuses(r)
    assert st["test.utilpack.dbt_utils_expression_is_true_kids"] == "pass"
    assert st["test.utilpack.dbt_utils_expression_is_true_kids_amount"] == "pass"
    # bads has lo=8, hi=8
    assert st["test.utilpack.dbt_utils_expression_is_true_bads"] == "fail"


def test_not_empty_string_and_not_null_proportion(eng):
    r = _run_tests(eng, """
models:
  - name: kids
    columns:
      - name: name
        data_tests:
          - dbt_utils.not_empty_string
          - dbt_utils.not_null_proportion: {at_least: 1.0}
  - name: bads
    columns:
      - name: name
        data_tests:
          - dbt_utils.not_empty_string
          - dbt_utils.not_null_proportion: {at_least: 0.9}
""")
    st = _statuses(r)
    assert st["test.utilpack.dbt_utils_not_empty_string_kids_name"] == "pass"
    assert st["test.utilpack.dbt_utils_not_null_proportion_kids_name"] == "pass"
    # bads.name: ' ' trims to empty -> fail; all values non-null
    # -> proportion 1.0 >= 0.9 -> pass
    assert st["test.utilpack.dbt_utils_not_empty_string_bads_name"] == "fail"
    assert st["test.utilpack.dbt_utils_not_null_proportion_bads_name"] == "pass"


def test_relationships_where_and_cardinality_equality(eng):
    r = _run_tests(eng, """
models:
  - name: kids
    columns:
      - name: parent_id
        data_tests:
          - dbt_utils.relationships_where:
              to: ref('parent')
              field: id
          - dbt_utils.cardinality_equality:
              to: ref('parent')
              field: id
  - name: bads
    columns:
      - name: parent_id
        data_tests:
          - dbt_utils.relationships_where:
              to: ref('parent')
              field: id
              from_condition: "id != 3"
""")
    st = _statuses(r)
    assert st["test.utilpack.dbt_utils_relationships_where_kids_parent_id"] == "pass"
    # kids.parent_id = {1:2, 2:1}; parent.id = {1,2,3} -> cardinality differs
    assert st["test.utilpack.dbt_utils_cardinality_equality_kids_parent_id"] == "fail"
    # bads: parent_id 9 missing from parent, but from_condition keeps rows
    # id in (1,1): parent_ids 1 and 9 -> 9 dangles -> fail
    assert st["test.utilpack.dbt_utils_relationships_where_bads_parent_id"] == "fail"


def test_equality_and_recency(eng):
    r = _run_tests(eng, """
models:
  - name: kids
    data_tests:
      - dbt_utils.equality: {compare_model: ref('kids_copy')}
      - dbt_utils.equality:
          compare_model: ref('bads')
          compare_columns: [id]
""")
    st = _statuses(r)
    assert st["test.utilpack.dbt_utils_equality_kids"] == "pass"
    # kids ids {1,2,3} vs bads ids {1,1,3}: EXCEPT-distinct catches 2
    assert st["test.utilpack.dbt_utils_equality_kids_2"] == "fail"


def test_recency(eng, project_dir):
    eng_, pdir = eng
    with open(os.path.join(pdir, "models", "fresh.sql"), "w") as f:
        f.write("select current_timestamp() as loaded_at, 1 as id")
    r = _run_tests(eng, """
models:
  - name: fresh
    data_tests:
      - dbt_utils.recency: {field: loaded_at, datepart: day, interval: 1}
""")
    assert _statuses(r)["test.utilpack.dbt_utils_recency_fresh"] == "pass"
    r = _run_tests(eng, """
models:
  - name: kids
    data_tests:
      - dbt_utils.recency: {field: "timestamp'2000-01-01'", datepart: day, interval: 1}
""")
    assert _statuses(r)["test.utilpack.dbt_utils_recency_kids"] == "fail"


def test_graph_dependency_from_kwarg_ref(eng):
    """compare_model: ref('x') must create a DAG edge (test runs after x)."""
    eng_, pdir = eng
    with open(os.path.join(pdir, "models", "schema.yml"), "w") as f:
        f.write("""
models:
  - name: kids
    data_tests:
      - dbt_utils.equal_rowcount: {compare_model: ref('kids_copy')}
""")
    r = eng_.invoke(["build"])
    assert r.success
    man = eng_.manifest
    tnode = man.nodes["test.utilpack.dbt_utils_equal_rowcount_kids"]
    dep_names = set()
    for uid in tnode.depends_on:
        n = man.nodes.get(uid)
        if n is not None:
            dep_names.add(n.name)
    assert {"kids", "kids_copy"} <= dep_names


# ---------------------------------------------------------------------------
# dbt_utils MACROS (beyond the generic tests): each rendered inside a real
# model through the engine (parse -> namespace bind -> run)
# ---------------------------------------------------------------------------

MACRO_BASE = {
    "dbt_project.yml": "name: utilmac\n",
    "seeds/raw.csv": (
        "id,grp,a,b,url,title,lat,lon\n"
        "1,x,1,,http://www.example.com/path/page?utm=abc&x=1,Hello World! 42,40.7,-74.0\n"
        "2,x,2,5,https://sub.shop.org/,  Mixed--CASE  thing ,34.05,-118.24\n"
        "3,y,,7,ftp://files.net/a/b.txt?x=2,already_slugged,40.7,-74.0\n"
        "4,y,4,1,http://files.net,Trailing spaces  ,51.5,-0.1\n"
    ),
}


@pytest.fixture()
def macro_eng(project_dir, spark):
    pdir = project_dir(MACRO_BASE)
    return Engine(pdir, spark=spark), pdir


def _run_model(eng_pdir, name, sql):
    eng, pdir = eng_pdir
    os.makedirs(os.path.join(pdir, "models"), exist_ok=True)
    with open(os.path.join(pdir, "models", f"{name}.sql"), "w") as f:
        f.write(sql)
    r = eng.invoke(["build", "--select", f"+{name}"])
    assert r.success, [getattr(x, "message", None) for x in r.results]
    return eng.store.read("main", name)


def test_macro_deduplicate(macro_eng):
    df = _run_model(
        macro_eng, "dedup",
        "{{ dbt_utils.deduplicate(ref('raw'), partition_by='grp',"
        " order_by='id desc') }}",
    )
    rows = {r["grp"]: r["id"] for r in df.collect()}
    assert rows == {"x": 2, "y": 4}
    assert "_dbt_dedup_rn" not in df.columns


def test_macro_unpivot(macro_eng):
    df = _run_model(
        macro_eng, "unpiv",
        "{{ dbt_utils.unpivot(ref('raw'), cast_to='string',"
        " exclude=['id'], remove=['grp', 'url', 'title', 'lat', 'lon']) }}",
    )
    got = {(r["id"], r["field_name"]): r["value"] for r in df.collect()}
    assert got[(1, "a")] == "1" and got[(1, "b")] is None
    assert got[(2, "b")] == "5"
    assert len(got) == 8  # 4 rows x 2 unpivoted cols


def test_macro_get_column_values_and_pivot(macro_eng):
    # list-returning macro feeding pivot() — needs the return() escape
    df = _run_model(
        macro_eng, "piv",
        "select grp, {{ dbt_utils.pivot('grp',"
        " dbt_utils.get_column_values(ref('raw'), 'grp', order_by='value')) }}"
        " from {{ ref('raw') }} group by grp",
    )
    rows = {r["grp"]: (r["x"], r["y"]) for r in df.collect()}
    assert rows == {"x": (2, 0), "y": (0, 2)}


def test_macro_get_filtered_columns_and_safe_math(macro_eng):
    df = _run_model(
        macro_eng, "safem",
        "select id, {{ dbt_utils.safe_add(['a', 'b']) }} as s,"
        " {{ dbt_utils.safe_subtract(['a', 'b']) }} as d"
        " from {{ ref('raw') }}",
    )
    rows = {r["id"]: (r["s"], r["d"]) for r in df.collect()}
    assert rows[1] == (1, 1) and rows[2] == (7, -3) and rows[3] == (7, -7)
    # get_filtered_columns_in_relation returns a python list at render time
    df2 = _run_model(
        macro_eng, "filtered",
        "{% set cols = dbt_utils.get_filtered_columns_in_relation("
        "ref('raw'), except=['url', 'title', 'lat', 'lon']) %}"
        "select {{ cols | join(', ') }} from {{ ref('raw') }}",
    )
    assert df2.columns == ["id", "grp", "a", "b"]


def test_macro_url_helpers_and_slugify(macro_eng):
    df = _run_model(
        macro_eng, "urls",
        "select id, {{ dbt_utils.get_url_host('url') }} as host,"
        " {{ dbt_utils.get_url_path('url') }} as path,"
        " {{ dbt_utils.get_url_parameter('url', 'x') }} as px,"
        " {{ dbt_utils.slugify('title') }} as slug"
        " from {{ ref('raw') }}",
    )
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["host"] == "www.example.com"
    assert rows[1]["path"] == "/path/page"
    assert rows[1]["px"] == "1"
    assert rows[1]["slug"] == "hello_world_42"
    assert rows[2]["host"] == "sub.shop.org"
    assert rows[2]["path"] == "/"
    assert rows[2]["px"] is None
    assert rows[2]["slug"] == "mixed_case_thing"
    assert rows[3]["host"] == "files.net"
    assert rows[3]["path"] == "/a/b.txt"
    assert rows[3]["px"] == "2"
    assert rows[3]["slug"] == "already_slugged"
    assert rows[4]["path"] is None
    assert rows[4]["slug"] == "trailing_spaces"


def test_macro_series_bucket_haversine(macro_eng):
    df = _run_model(
        macro_eng, "series",
        "{{ dbt_utils.generate_series(5) }}",
    )
    assert sorted(r["generated_number"] for r in df.collect()) == [1, 2, 3, 4, 5]
    df2 = _run_model(
        macro_eng, "geo",
        "select id, {{ dbt_utils.width_bucket('a', 0, 10, 5) }} as wb,"
        " {{ dbt_utils.haversine_distance('lat', 'lon', 40.7, -74.0) }} as mi"
        " from {{ ref('raw') }} where a is not null",
    )
    rows = {r["id"]: r for r in df2.collect()}
    assert rows[1]["wb"] == 1 and rows[4]["wb"] == 3
    assert abs(rows[1]["mi"]) < 1e-6          # same point
    assert 2400 < rows[2]["mi"] < 2500        # NYC -> LA great-circle ~2445 mi


def test_macro_get_relations_by_pattern_union(macro_eng):
    """get_relations_by_pattern/prefix list live relations; composed with
    union_relations they build the classic shard-union model (run staged:
    shards first, then the union — the dynamic listing is execute-time)."""
    eng, pdir = macro_eng
    os.makedirs(os.path.join(pdir, "models"), exist_ok=True)
    with open(os.path.join(pdir, "models", "part_a.sql"), "w") as f:
        f.write("select id, grp from {{ ref('raw') }} where id <= 2")
    with open(os.path.join(pdir, "models", "part_b.sql"), "w") as f:
        f.write("select id, grp, a from {{ ref('raw') }} where id > 2")
    r = eng.invoke(["build", "--select", "+part_a +part_b"])
    assert r.success
    df = _run_model(
        macro_eng, "unioned",
        "{{ dbt_utils.union_relations("
        "dbt_utils.get_relations_by_pattern('main', 'part_%')) }}",
    )
    rows = df.collect()
    assert len(rows) == 4
    assert set(df.columns) == {"_dbt_source_relation", "id", "grp", "a"}
    by_id = {r["id"]: r for r in rows}
    assert by_id[1]["a"] is None          # part_a lacks `a` -> null-filled
    assert by_id[4]["a"] == 4
    assert "part_a" in by_id[1]["_dbt_source_relation"]
    # prefix variant + exclude
    df2 = _run_model(
        macro_eng, "only_b",
        "{% set rels = dbt_utils.get_relations_by_prefix('main', 'part_',"
        " exclude='part_a') %}select * from {{ rels[0] }}",
    )
    assert sorted(r["id"] for r in df2.collect()) == [3, 4]


def test_utils_test_store_failures_audit(eng):
    """The core severity/store_failures knobs apply to dbt_utils tests
    unchanged: a failing accepted_range with store_failures persists its
    failing rows under the audit schema."""
    eng_, pdir = eng
    with open(os.path.join(pdir, "models", "schema.yml"), "w") as f:
        f.write("""
models:
  - name: bads
    columns:
      - name: amount
        data_tests:
          - dbt_utils.accepted_range:
              min_value: 0
              max_value: 100
              config: {severity: warn, store_failures: true}
""")
    r = eng_.invoke(["build"])
    assert any(x.status == "warn" for x in r.results)
    audit = eng_.store.list_relations("main_dbt_test__audit")
    assert audit, "failing rows not persisted under the audit schema"
    stored = eng_.store.read(audit[0].schema, audit[0].name)
    assert stored.count() == 2  # -1.0 and 150.0


def test_macro_nullcheck_table(macro_eng):
    df = _run_model(
        macro_eng, "nullchecked",
        "{{ dbt_utils.nullcheck_table(ref('raw')) }}",
    )
    rows = {r["id"]: r for r in df.collect()}
    # title for id=2 is non-empty -> kept; empty strings would become NULL
    assert rows[2]["title"] is not None
    assert set(df.columns) == {"id", "grp", "a", "b", "url", "title",
                               "lat", "lon"}


def test_unique_combination_store_failures_parity(eng):
    """dbt_utils.unique_combination_of_columns with store_failures: the
    persisted audit rows must EQUAL the failing-rows query's own output
    (store-failures parity — task/test.py:142-197 persists exactly the
    failing rows; fixture usage tests/functional/schema_tests/
    fixtures.py:402-470)."""
    r = _run_tests(eng, """
models:
  - name: bads
    data_tests:
      - dbt_utils.unique_combination_of_columns:
          combination_of_columns: [id, grp]
          config: {severity: warn, store_failures: true}
""")
    eng_, pdir = eng
    assert any(x.status == "warn" for x in r.results)
    audit = eng_.store.list_relations("main_dbt_test__audit")
    assert audit, "failing rows not persisted under the audit schema"
    stored = eng_.store.read(audit[0].schema, audit[0].name)
    rows = {(r["id"], r["grp"]): r["n_records"] for r in stored.collect()}
    # bads has id=1/grp=a twice — exactly one failing combination
    assert rows == {(1, "a"): 2}
    assert set(stored.columns) == {"id", "grp", "n_records"}


def test_fewer_rows_than_introspective_config(eng):
    """fewer_rows_than with an INTROSPECTIVE config.where — a subquery over
    {{ ref(...) }} rendered inside the test kwargs/config (the reference's
    custom-generic-test-config fixture idiom)."""
    r = _run_tests(eng, """
models:
  - name: kids
    data_tests:
      - dbt_utils.fewer_rows_than:
          compare_model: ref('bads')
          config:
            where: "id in (select id from {{ ref('kids_copy') }})"
""")
    st = _statuses(r)
    # kids filtered to kids_copy ids (all 3) still has 3 rows = bads' 3 ->
    # NOT fewer -> fail; proves the where-subquery actually applied
    assert st["test.utilpack.dbt_utils_fewer_rows_than_kids"] == "fail"
