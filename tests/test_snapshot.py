"""SCD2 snapshots: timestamp + check strategies, hard-delete handling.

Scenario mirrors FIXTURES.md §5: insert v1 rows → snapshot → mutate subset +
delete one → snapshot → assert closed/current/deleted rows."""

import os
from pathlib import Path

from dbt_spark.runner import Engine

V1_CSV = (
    "id,name,updated_at\n"
    "1,alice,2020-01-01 00:00:00\n"
    "2,bob,2020-01-01 00:00:00\n"
    "3,carol,2020-01-01 00:00:00\n"
)
# id=2 renamed (newer updated_at), id=3 deleted, id=4 added
V2_CSV = (
    "id,name,updated_at\n"
    "1,alice,2020-01-01 00:00:00\n"
    "2,robert,2020-02-01 00:00:00\n"
    "4,dave,2020-02-01 00:00:00\n"
)

SNAP_TS = """
{% snapshot people_snap %}
{{ config(strategy='timestamp', unique_key='id', updated_at='updated_at',
          hard_deletes='invalidate') }}
select * from {{ ref('people') }}
{% endsnapshot %}
"""

SNAP_CHECK = """
{% snapshot people_snap %}
{{ config(strategy='check', unique_key='id', check_cols=['name']) }}
select id, name from {{ ref('people') }}
{% endsnapshot %}
"""


def _setup(project_dir, spark, snapshot_sql):
    files = {
        "dbt_project.yml": "name: snap\n",
        "seeds/people.csv": V1_CSV,
        "snapshots/people.sql": snapshot_sql,
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success
    return root, eng


def test_timestamp_strategy(project_dir, spark):
    root, eng = _setup(project_dir, spark, SNAP_TS)
    assert eng.invoke(["snapshot"], snapshot_ts="2020-01-15 00:00:00").success
    snap = eng.store.read("main", "people_snap").collect()
    assert len(snap) == 3
    assert all(r["dbt_valid_to"] is None for r in snap)
    assert all(r["dbt_scd_id"] is not None for r in snap)

    Path(root, "seeds/people.csv").write_text(V2_CSV)
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["snapshot"], snapshot_ts="2020-02-15 00:00:00")
    assert r.success, [x.message for x in r.results]

    rows = eng.store.read("main", "people_snap").collect()
    by = {}
    for row in rows:
        by.setdefault(row["id"], []).append(row)
    # id=1 unchanged: one current row
    assert len(by[1]) == 1 and by[1][0]["dbt_valid_to"] is None
    # id=2 changed: closed v1 (valid_to = new updated_at) + current v2
    v2 = sorted(by[2], key=lambda r: r["dbt_valid_from"])
    assert len(v2) == 2
    assert v2[0]["name"] == "bob" and str(v2[0]["dbt_valid_to"]).startswith("2020-02-01")
    assert v2[1]["name"] == "robert" and v2[1]["dbt_valid_to"] is None
    # id=3 hard-deleted: invalidated at snapshot ts
    assert len(by[3]) == 1 and str(by[3][0]["dbt_valid_to"]).startswith("2020-02-15")
    # id=4 new: current
    assert len(by[4]) == 1 and by[4][0]["dbt_valid_to"] is None


def test_check_strategy(project_dir, spark):
    root, eng = _setup(project_dir, spark, SNAP_CHECK)
    assert eng.invoke(["snapshot"], snapshot_ts="2020-01-15 00:00:00").success
    Path(root, "seeds/people.csv").write_text(V2_CSV)
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["snapshot"], snapshot_ts="2020-02-15 00:00:00")
    assert r.success, [x.message for x in r.results]
    rows = eng.store.read("main", "people_snap").collect()
    by = {}
    for row in rows:
        by.setdefault(row["id"], []).append(row)
    assert len(by[1]) == 1  # unchanged
    assert len(by[2]) == 2  # name changed -> two versions
    cur2 = [r for r in by[2] if r["dbt_valid_to"] is None]
    assert cur2[0]["name"] == "robert"
    # hard_deletes defaults to ignore: id=3 stays current
    assert len(by[3]) == 1 and by[3][0]["dbt_valid_to"] is None
    assert len(by[4]) == 1


def test_snapshot_idempotent_when_unchanged(project_dir, spark):
    _, eng = _setup(project_dir, spark, SNAP_TS)
    assert eng.invoke(["snapshot"], snapshot_ts="2020-01-15 00:00:00").success
    assert eng.invoke(["snapshot"], snapshot_ts="2020-01-16 00:00:00").success
    snap = eng.store.read("main", "people_snap").collect()
    assert len(snap) == 3
    assert all(r["dbt_valid_to"] is None for r in snap)


def test_snapshot_config_validation(project_dir, spark):
    files = {
        "dbt_project.yml": "name: snap\n",
        "snapshots/bad.sql": (
            "{% snapshot bad_snap %}\n"
            "{{ config(strategy='timestamp', unique_key='id') }}\n"
            "select 1 as id\n"
            "{% endsnapshot %}\n"
        ),
    }
    root = project_dir(files)
    import pytest
    from dbt_spark.plans.compile import CompilationError

    with pytest.raises(CompilationError, match="updated_at"):
        Engine(root, spark=spark).parse()


def test_snapshot_meta_column_renames(project_dir, spark):
    """snapshot_meta_column_names (v1/snapshot.py:35-42): user-facing names
    for the SCD2 meta columns, stable across successive runs."""
    from dbt_spark.runner import Engine

    root = project_dir({
        "dbt_project.yml": "name: smr\n",
        "seeds/people.csv": "id,name\n1,ann\n2,bob\n",
        "snapshots/people_snap.sql": """
{% snapshot people_snap %}
{{ config(unique_key='id', strategy='check', check_cols=['name'],
          snapshot_meta_column_names={'dbt_valid_from': 'valid_from',
                                      'dbt_valid_to': 'valid_to',
                                      'dbt_scd_id': 'scd_id'}) }}
select * from {{ ref('people') }}
{% endsnapshot %}
""",
    })
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["snapshot"], snapshot_ts="2021-01-01 00:00:00")
    assert r.success, [x.message for x in r.results]
    snap = eng.store.read("main", "people_snap")
    assert {"valid_from", "valid_to", "scd_id"} <= set(snap.columns)
    assert "dbt_valid_from" not in snap.columns
    # change a row, snapshot again: rename survives the round-trip
    (root_path := os.path.join(root, "seeds", "people.csv"))
    with open(root_path, "w") as f:
        f.write("id,name\n1,ann\n2,bobby\n")
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["snapshot"], snapshot_ts="2021-06-01 00:00:00")
    assert r.success, [x.message for x in r.results]
    snap = eng.store.read("main", "people_snap")
    assert snap.count() == 3  # 2 current + 1 closed
    closed = snap.filter("valid_to is not null").collect()
    assert len(closed) == 1 and closed[0]["name"] == "bob"


def test_versioned_ref(project_dir, spark):
    """ref('m', version=2) resolves to the v2 model (providers.py:576-673)."""
    from dbt_spark.runner import Engine

    root = project_dir({
        "dbt_project.yml": "name: ver\n",
        "models/api_v1.sql": "select 1 as id, 'old' as flavor",
        "models/api_v2.sql": "select 1 as id, 'new' as flavor, true as extra",
        "models/consumer.sql": "select * from {{ ref('api', version=2) }}",
    })
    eng = Engine(root, spark=spark)
    m = eng.parse()
    assert "model.ver.api_v2" in m.nodes["model.ver.consumer"].depends_on
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    assert "extra" in eng.store.read("main", "consumer").columns


def test_dbt_valid_to_current_sentinel(project_dir, spark):
    """dbt_valid_to_current: current rows carry a sentinel timestamp instead
    of NULL (sargable BETWEEN predicates on the history table)."""
    from dbt_spark.runner import Engine

    root = project_dir({
        "dbt_project.yml": "name: vtc\n",
        "seeds/items.csv": "id,price\n1,10\n2,20\n",
        "snapshots/items_snap.sql": """
{% snapshot items_snap %}
{{ config(unique_key='id', strategy='check', check_cols=['price'],
          dbt_valid_to_current="date'9999-12-31'") }}
select * from {{ ref('items') }}
{% endsnapshot %}
""",
    })
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["snapshot"], snapshot_ts="2021-01-01 00:00:00").success
    snap = eng.store.read("main", "items_snap")
    assert snap.filter("dbt_valid_to is null").count() == 0
    assert snap.filter("dbt_valid_to = date'9999-12-31'").count() == 2
    # second run with a change: closed row gets real end, current keeps sentinel
    with open(os.path.join(root, "seeds", "items.csv"), "w") as f:
        f.write("id,price\n1,10\n2,25\n")
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["snapshot"], snapshot_ts="2021-06-01 00:00:00")
    assert r.success, [x.message for x in r.results]
    snap = eng.store.read("main", "items_snap")
    assert snap.filter("dbt_valid_to = date'9999-12-31'").count() == 2
    assert snap.filter("dbt_valid_to = timestamp'2021-06-01 00:00:00'").count() == 1


def test_scd2_invariants_random_histories(project_dir, spark):
    """Property over 3 seeded random edit histories: after any sequence of
    insert/update/delete steps, the check-strategy snapshot satisfies the
    SCD2 invariants — exactly one open row per live key, at most one open
    row per key overall, non-overlapping validity windows in edit order, and
    the open row carries the latest value. hard_deletes='invalidate' so
    deletions close the open row (default 'ignore' keeps it — reference
    behavior, covered by the strategy tests above)."""
    snap_sql = SNAP_CHECK.replace(
        "check_cols=['name']",
        "check_cols=['name'], hard_deletes='invalidate'")
    import random

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        live = {i: f"v0_{i}" for i in range(1, 5)}
        files = {
            "dbt_project.yml": f"name: scdp{seed}\n",
            "seeds/people.csv": "id,name\n" + "".join(
                f"{k},{v}\n" for k, v in sorted(live.items())),
            "snapshots/people.sql": snap_sql,
        }
        root = project_dir(files) if seed == 0 else root_for(files, spark)
        eng = Engine(root, spark=spark)
        assert eng.invoke(["seed"]).success
        assert eng.invoke(["snapshot"],
                          snapshot_ts="2020-01-01 00:00:00").success
        next_id = 5
        for step in range(1, 4):
            # random edits: each key may update or delete; maybe add one
            for k in list(live):
                roll = rng.random()
                if roll < 0.3:
                    live[k] = f"v{step}_{k}"
                elif roll < 0.4:
                    del live[k]
            if rng.random() < 0.7:
                live[next_id] = f"new{step}"
                next_id += 1
            Path(root, "seeds/people.csv").write_text(
                "id,name\n" + "".join(f"{k},{v}\n" for k, v in sorted(live.items())))
            assert eng.invoke(["seed"]).success
            assert eng.invoke(
                ["snapshot"], snapshot_ts=f"2020-0{step + 1}-01 00:00:00"
            ).success

        rows = eng.store.read("main", "people_snap").collect()
        by: dict = {}
        for r in rows:
            by.setdefault(r["id"], []).append(r)
        for key, versions in by.items():
            open_rows = [r for r in versions if r["dbt_valid_to"] is None]
            assert len(open_rows) <= 1, (seed, key)
            if key in live:
                assert len(open_rows) == 1, (seed, key)
                assert open_rows[0]["name"] == live[key], (seed, key)
            else:
                assert not open_rows, (seed, key, "deleted key left open row")
            ordered = sorted(versions, key=lambda r: r["dbt_valid_from"])
            for a, b in zip(ordered, ordered[1:]):
                assert a["dbt_valid_to"] is not None
                assert a["dbt_valid_to"] <= b["dbt_valid_from"], (seed, key)


def root_for(files, spark):
    import tempfile
    base = tempfile.mkdtemp(prefix="scdp_")
    for rel, content in files.items():
        p = os.path.join(base, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            f.write(content)
    return base


SNAP_CUSTOM = """
{% snapshot people_snap %}
{{ config(strategy='newer_name', unique_key='id', updated_at='updated_at') }}
select * from {{ ref('people') }}
{% endsnapshot %}
"""

# reference-shaped custom strategy macro: same signature the adapters-side
# snapshot materialization dispatches (node, snapshotted_rel, current_rel,
# model_config, target_exists) returning SQL-expression entries
CUSTOM_STRATEGY_MACRO = """
{% macro snapshot_newer_name_strategy(node, snapshotted_rel, current_rel, model_config, target_exists) %}
{{ return({
    'unique_key': model_config['unique_key'],
    'updated_at': current_rel ~ '.updated_at',
    'row_changed': current_rel ~ '.name <> ' ~ snapshotted_rel ~ '.name'
}) }}
{% endmacro %}
"""


def test_custom_strategy_e2e(project_dir, spark):
    files = {
        "dbt_project.yml": "name: snap\n",
        "seeds/people.csv": V1_CSV,
        "snapshots/people.sql": SNAP_CUSTOM,
        "macros/strategy.sql": CUSTOM_STRATEGY_MACRO,
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["snapshot"], snapshot_ts="2020-01-15 00:00:00")
    assert r.success, [x.message for x in r.results]
    snap = eng.store.read("main", "people_snap").collect()
    assert len(snap) == 3
    # custom updated_at expr drives dbt_valid_from on first write
    assert all(str(row["dbt_valid_from"]).startswith("2020-01-01") for row in snap)

    Path(root, "seeds/people.csv").write_text(V2_CSV)
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["snapshot"], snapshot_ts="2020-02-15 00:00:00")
    assert r.success, [x.message for x in r.results]
    rows = eng.store.read("main", "people_snap").collect()
    by = {}
    for row in rows:
        by.setdefault(row["id"], []).append(row)
    # id=1: name unchanged -> custom row_changed says no new version
    assert len(by[1]) == 1 and by[1][0]["dbt_valid_to"] is None
    # id=2: name changed -> closed at the custom updated_at expression's
    # value (source_data.updated_at = 2020-02-01), plus a new current row
    v2 = sorted(by[2], key=lambda r: r["dbt_valid_from"])
    assert len(v2) == 2
    assert v2[0]["name"] == "bob"
    assert str(v2[0]["dbt_valid_to"]).startswith("2020-02-01")
    assert v2[1]["name"] == "robert" and v2[1]["dbt_valid_to"] is None
    # id=3: hard_deletes defaults to ignore
    assert len(by[3]) == 1 and by[3][0]["dbt_valid_to"] is None
    assert len(by[4]) == 1 and by[4][0]["dbt_valid_to"] is None


def test_custom_strategy_missing_macro_errors(project_dir, spark):
    files = {
        "dbt_project.yml": "name: snap\n",
        "seeds/people.csv": V1_CSV,
        "snapshots/people.sql": SNAP_CUSTOM.replace("newer_name", "nope"),
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["snapshot"], snapshot_ts="2020-01-15 00:00:00")
    assert not r.success
    msgs = " ".join(x.message or "" for x in r.results)
    assert "snapshot_nope_strategy" in msgs


def test_timestamp_strategy_rejects_check_cols(project_dir, spark):
    import pytest as _pytest

    from dbt_spark.plans.compile import CompilationError

    bad = SNAP_TS.replace(
        "hard_deletes='invalidate'",
        "hard_deletes='invalidate', check_cols=['name']",
    )
    files = {
        "dbt_project.yml": "name: snap\n",
        "seeds/people.csv": V1_CSV,
        "snapshots/people.sql": bad,
    }
    root = project_dir(files)
    with _pytest.raises(CompilationError, match="should not have 'check_cols'"):
        Engine(root, spark=spark).invoke(["snapshot"])


YAML_SNAPSHOT = """
snapshots:
  - name: people_snap
    relation: ref('people')
    description: YAML-defined snapshot, no SQL file
    config:
      strategy: timestamp
      unique_key: id
      updated_at: updated_at
      hard_deletes: invalidate
"""


def test_yaml_defined_snapshot_e2e(project_dir, spark):
    """dbt 1.9 YAML snapshots (schemas.py _add_yaml_snapshot_nodes_to_
    manifest): a `snapshots:` entry with `relation:` IS the snapshot —
    body synthesized as select * from the relation, full SCD2 applies."""
    files = {
        "dbt_project.yml": "name: snap\n",
        "seeds/people.csv": V1_CSV,
        "snapshots/people.yml": YAML_SNAPSHOT,
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["snapshot"], snapshot_ts="2020-01-15 00:00:00")
    assert r.success, [x.message for x in r.results]
    snap = eng.store.read("main", "people_snap").collect()
    assert len(snap) == 3 and all(x["dbt_valid_to"] is None for x in snap)

    Path(root, "seeds/people.csv").write_text(V2_CSV)
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["snapshot"], snapshot_ts="2020-02-15 00:00:00")
    assert r.success, [x.message for x in r.results]
    rows = eng.store.read("main", "people_snap").collect()
    by = {}
    for row in rows:
        by.setdefault(row["id"], []).append(row)
    assert len(by[2]) == 2  # changed -> two versions
    assert len(by[3]) == 1 and str(by[3][0]["dbt_valid_to"]).startswith("2020-02-15")
    assert len(by[4]) == 1


def test_yaml_snapshot_bad_relation_errors(project_dir, spark):
    import pytest as _pytest

    from dbt_spark.plans.compile import CompilationError

    files = {
        "dbt_project.yml": "name: snap\n",
        "seeds/people.csv": V1_CSV,
        "snapshots/people.yml": YAML_SNAPSHOT.replace(
            "ref('people')", "just_a_table_name"),
    }
    root = project_dir(files)
    with _pytest.raises(CompilationError, match="ref\\(...\\) or source"):
        Engine(root, spark=spark).invoke(["snapshot"])


# ---- round-11: custom strategy unique_key contract + error fidelity ----

EXPR_KEY_STRATEGY = """
{% macro snapshot_by_code_strategy(node, snapshotted_rel, current_rel, model_config, target_exists) %}
{{ return({
    'unique_key': 'upper(code)',
    'updated_at': current_rel ~ '.updated_at',
    'row_changed': current_rel ~ '.val <> ' ~ snapshotted_rel ~ '.val'
}) }}
{% endmacro %}
"""

SNAP_BY_CODE = """
{% snapshot things_snap %}
{{ config(strategy='by_code', unique_key='id', updated_at='updated_at') }}
select * from {{ ref('things') }}
{% endsnapshot %}
"""


def test_custom_strategy_unique_key_honored(project_dir, spark):
    """A custom strategy's returned unique_key (here an EXPRESSION,
    upper(code)) drives the join — not node.config.unique_key. Run 2's
    row carries a different id AND a case-changed code; matching on the
    strategy key closes the old version instead of inserting a new key."""
    files = {
        "dbt_project.yml": "name: snap\n",
        "seeds/things.csv": (
            "id,code,val,updated_at\n"
            "1,a,10,2020-01-01 00:00:00\n"
            "2,b,20,2020-01-01 00:00:00\n"
        ),
        "snapshots/things.sql": SNAP_BY_CODE,
        "macros/strategy.sql": EXPR_KEY_STRATEGY,
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["snapshot"], snapshot_ts="2020-01-15 00:00:00")
    assert r.success, [x.message for x in r.results]

    # id flips 1->9 and code flips a->A: same strategy key upper(code)='A'
    Path(root, "seeds/things.csv").write_text(
        "id,code,val,updated_at\n"
        "9,A,11,2020-02-01 00:00:00\n"
        "2,b,20,2020-01-01 00:00:00\n"
    )
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["snapshot"], snapshot_ts="2020-02-15 00:00:00")
    assert r.success, [x.message for x in r.results]
    rows = eng.store.read("main", "things_snap").collect()
    # derived helper key column must not leak into the stored table
    assert not any(c.startswith("__sg_strat_key") for c in rows[0].asDict())
    by_code = {}
    for row in rows:
        by_code.setdefault(row["code"].upper(), []).append(row)
    a = sorted(by_code["A"], key=lambda r: str(r["dbt_valid_from"]))
    assert len(a) == 2, rows  # matched on upper(code): closed + new version
    assert a[0]["val"] == 10 and a[0]["dbt_valid_to"] is not None
    assert a[1]["val"] == 11 and a[1]["id"] == 9 and a[1]["dbt_valid_to"] is None
    assert len(by_code["B"]) == 1 and by_code["B"][0]["dbt_valid_to"] is None


BUGGY_STRATEGY = """
{% macro snapshot_buggy_strategy(node, snapshotted_rel, current_rel, model_config, target_exists) %}
{% set oops = totally_missing_helper() %}
{{ return({
    'unique_key': model_config['unique_key'],
    'updated_at': current_rel ~ '.updated_at',
    'row_changed': current_rel ~ '.name <> ' ~ snapshotted_rel ~ '.name'
}) }}
{% endmacro %}
"""


def test_custom_strategy_macro_bug_not_misreported(project_dir, spark):
    """A genuine bug INSIDE an existing strategy macro (undefined variable)
    must surface as that bug — not as 'requires a macro named ...'. The
    missing-macro error now comes from a registry lookup, not exception
    substring matching."""
    files = {
        "dbt_project.yml": "name: snap\n",
        "seeds/people.csv": V1_CSV,
        "snapshots/people.sql": SNAP_CUSTOM.replace("newer_name", "buggy"),
        "macros/strategy.sql": BUGGY_STRATEGY,
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["snapshot"], snapshot_ts="2020-01-15 00:00:00")
    assert not r.success
    msgs = " ".join(x.message or "" for x in r.results)
    assert "requires a macro named" not in msgs
    assert "totally_missing_helper" in msgs


def test_yaml_snapshot_versioned_ref_relation(project_dir, spark):
    """YAML snapshot relation: accepts ref('name', version=N) — the
    reference's statically_parse_ref_or_source grammar
    (core/dbt/parser/schemas.py), previously rejected by the regex."""
    yaml_snap = YAML_SNAPSHOT.replace(
        "ref('people')", "ref('people_m', version=2)")
    files = {
        "dbt_project.yml": "name: snap\n",
        "seeds/people.csv": V1_CSV,
        "models/people_m_v2.sql": "select * from {{ ref('people') }}",
        "snapshots/people.yml": yaml_snap,
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    m = eng.parse()
    assert "model.snap.people_m_v2" in m.nodes["snapshot.snap.people_snap"].depends_on
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    r = eng.invoke(["snapshot"], snapshot_ts="2020-01-15 00:00:00")
    assert r.success, [x.message for x in r.results]
    snap = eng.store.read("main", "people_snap").collect()
    assert len(snap) == 3 and all(x["dbt_valid_to"] is None for x in snap)


def test_yaml_snapshot_versioned_ref_warm_reparse(project_dir, spark):
    """Partial-parse stability for the round-11 versioned-ref YAML
    snapshot grammar: a warm second parse (unchanged files) resolves the
    same dependency edge the cold parse did."""
    yaml_snap = YAML_SNAPSHOT.replace(
        "ref('people')", "ref('people_m', version=2)")
    files = {
        "dbt_project.yml": "name: snap\n",
        "seeds/people.csv": V1_CSV,
        "models/people_m_v2.sql": "select * from {{ ref('people') }}",
        "snapshots/people.yml": yaml_snap,
    }
    root = project_dir(files)
    m1 = Engine(root, spark=spark).parse()
    dep = "model.snap.people_m_v2"
    assert dep in m1.nodes["snapshot.snap.people_snap"].depends_on
    # warm engine over the same root: partial-parse path
    m2 = Engine(root, spark=spark).parse()
    assert dep in m2.nodes["snapshot.snap.people_snap"].depends_on
    assert m1.nodes["snapshot.snap.people_snap"].raw_code == \
        m2.nodes["snapshot.snap.people_snap"].raw_code
