"""Public test kit for projects built on dbt_spark.

The reference ships a reusable functional-test harness for adapter and
package repos: ``core/dbt/tests/fixtures/project.py`` (the ``project``
fixture composed from class-scoped ``models``/``seeds``/... fixtures) and
``core/dbt/tests/util.py`` (``run_dbt``, ``run_dbt_and_capture``,
``get_manifest``, ``check_relations_equal``, file helpers). This package is
the same contract for out-of-tree users of this engine:

    pytest_plugins = ["dbt_spark.testing.fixtures"]

    class TestMyModel:
        @pytest.fixture(scope="class")
        def models(self):
            return {"my_model.sql": "select 1 as id"}

        def test_run(self, project):
            results = run_dbt(project, ["run"])
            assert len(results.results) == 1

Everything here is public API; nothing imports from tests/conftest.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

__all__ = [
    "TestProject",
    "run_dbt",
    "run_dbt_and_capture",
    "get_logging_events",
    "get_manifest",
    "get_run_results",
    "get_artifact",
    "write_file",
    "read_file",
    "rm_file",
    "file_exists",
    "copy_file",
    "update_config_file",
    "get_unique_ids_in_results",
    "check_result_nodes_by_name",
    "check_result_nodes_by_unique_id",
    "check_relations_equal",
    "check_relation_has_expected_schema",
    "check_table_does_exist",
    "check_table_does_not_exist",
]


class TestProject:
    """Handle returned by the ``project`` fixture (fixtures/project.py:394
    ``TestProjInfo``): the project root, the engine instance, and the schema
    relations land in."""

    # not a test class, despite the name (keeps the reference's naming)
    __test__ = False

    def __init__(self, root: str, engine: Any, schema: str = "main") -> None:
        self.project_root = root
        self.engine = engine
        self.test_schema = schema

    @property
    def spark(self):
        return self.engine.spark

    def run_sql(self, sql: str, fetch: Optional[str] = None):
        """run_sql_with_adapter analog (util.py:304): execute against the
        engine's session with relations registered; fetch="one"/"all"."""
        for rel in self.engine.store.list_relations():
            self.engine.store.read(rel.schema, rel.name).createOrReplaceTempView(rel.name)
        self.engine.store.ensure_registered_for(sql)
        df = self.spark.sql(sql)
        if fetch == "one":
            rows = df.limit(1).collect()
            return tuple(rows[0]) if rows else None
        if fetch == "all":
            return [tuple(r) for r in df.collect()]
        return None


def _engine_of(project: Any):
    return project.engine if isinstance(project, TestProject) else project


def run_dbt(project: Any, args: list[str], expect_pass: bool = True):
    """Invoke a command list against a TestProject/Engine and (by default)
    assert it succeeded — reference util.py:76. Returns the RunnerResult."""
    res = _engine_of(project).invoke(list(args))
    if expect_pass:
        failed = [
            (r.unique_id, r.status, (r.message or "")[:200])
            for r in res.results
            if r.status not in ("success", "pass", "warn", "skipped")
        ]
        assert res.success, f"dbt {args[0]} failed: {failed}"
    else:
        assert not res.success, f"dbt {args[0]} unexpectedly succeeded"
    return res


def run_dbt_and_capture(project: Any, args: list[str], expect_pass: bool = True):
    """run_dbt + the structured log lines it appended (util.py:116 captures
    stdout; here the capture surface is the JSONL event log)."""
    engine = _engine_of(project)
    log_path = engine.events.log_path
    before = 0
    if log_path and os.path.exists(log_path):
        with open(log_path) as f:
            before = sum(1 for _ in f)
    res = run_dbt(project, args, expect_pass=expect_pass)
    lines: list[dict] = []
    if log_path and os.path.exists(log_path):
        with open(log_path) as f:
            lines = [json.loads(ln) for ln in f if ln.strip()][before:]
    return res, lines


def get_logging_events(log_lines: list[dict], event_name: str) -> list[dict]:
    """Filter captured structured-log lines by info.name (util.py:132)."""
    return [ln for ln in log_lines if ln.get("info", {}).get("name") == event_name]


# -- artifact access (util.py:151-243) --------------------------------------

def get_artifact(*paths: str) -> dict:
    with open(os.path.join(*paths)) as f:
        return json.load(f)


def get_manifest(project_root: str) -> Optional[dict]:
    path = os.path.join(project_root, "target", "manifest.json")
    return get_artifact(path) if os.path.exists(path) else None


def get_run_results(project_root: str) -> Optional[dict]:
    path = os.path.join(project_root, "target", "run_results.json")
    return get_artifact(path) if os.path.exists(path) else None


# -- file helpers (util.py:173-258) ------------------------------------------

def write_file(contents: str, *paths: str) -> None:
    path = os.path.join(*paths)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(contents)


def read_file(*paths: str) -> str:
    with open(os.path.join(*paths)) as f:
        return f.read()


def rm_file(*paths: str) -> None:
    os.remove(os.path.join(*paths))


def file_exists(*paths: str) -> bool:
    return os.path.exists(os.path.join(*paths))


def copy_file(src_path: str, src: str, dest_path: str, dest: str) -> None:
    shutil.copyfile(os.path.join(src_path, src), os.path.join(dest_path, dest))


def update_config_file(updates: dict, *paths: str) -> None:
    """Deep-merge updates into a YAML config file (util.py:244)."""
    import yaml

    path = os.path.join(*paths)
    with open(path) as f:
        config = yaml.safe_load(f) or {}

    def merge(base: dict, extra: dict) -> None:
        for k, v in extra.items():
            if isinstance(v, dict) and isinstance(base.get(k), dict):
                merge(base[k], v)
            else:
                base[k] = v

    merge(config, updates)
    with open(path, "w") as f:
        yaml.safe_dump(config, f)


# -- result assertions (util.py:260-283) -------------------------------------

def get_unique_ids_in_results(results: Any) -> list[str]:
    return [r.unique_id for r in results.results]


def check_result_nodes_by_name(results: Any, names: list[str]) -> None:
    got = sorted(uid.split(".")[-1] for uid in get_unique_ids_in_results(results))
    assert got == sorted(names), f"{got} != {sorted(names)}"


def check_result_nodes_by_unique_id(results: Any, unique_ids: list[str]) -> None:
    got = sorted(get_unique_ids_in_results(results))
    assert got == sorted(unique_ids), f"{got} != {sorted(unique_ids)}"


# -- relation assertions (util.py:329-565) ------------------------------------

def check_relations_equal(project: Any, relation_names: list[str],
                          schema: str = "main") -> None:
    """Pairwise value equality between named relations (util.py:401): same
    row count and symmetric-difference-empty, computed engine-side (exceptAll
    both directions, no driver-side sort of the full data)."""
    assert len(relation_names) >= 2
    engine = _engine_of(project)
    base = engine.store.read(schema, relation_names[0])
    for other_name in relation_names[1:]:
        other = engine.store.read(schema, other_name)
        assert base.columns == other.columns, (
            f"{relation_names[0]} vs {other_name}: "
            f"{base.columns} != {other.columns}"
        )
        diff = base.exceptAll(other).count() + other.exceptAll(base).count()
        assert diff == 0, (
            f"{relation_names[0]} vs {other_name}: {diff} differing rows"
        )


def check_relation_has_expected_schema(project: Any, relation_name: str,
                                       expected_schema: dict,
                                       schema: str = "main") -> None:
    """Column name → Spark simpleString type check (util.py:414)."""
    df = _engine_of(project).store.read(schema, relation_name)
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for col, typ in expected_schema.items():
        assert col in actual, f"{relation_name}: missing column {col} ({actual})"
        assert actual[col] == typ, (
            f"{relation_name}.{col}: {actual[col]} != {typ}"
        )


def check_table_does_exist(project: Any, name: str, schema: str = "main") -> None:
    assert _engine_of(project).store.exists(schema, name), f"{name} missing"


def check_table_does_not_exist(project: Any, name: str,
                               schema: str = "main") -> None:
    assert not _engine_of(project).store.exists(schema, name), f"{name} exists"
