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
