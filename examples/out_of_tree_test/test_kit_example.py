"""An out-of-tree functional test using ONLY the public dbt_spark.testing kit
(the reference publishes the same pattern for adapter/package repos via
core/dbt/tests/fixtures/project.py + core/dbt/tests/util.py). Run from any
directory: pytest test_kit_example.py."""

import pytest

from dbt_spark.testing import (
    check_relation_has_expected_schema,
    check_relations_equal,
    check_result_nodes_by_name,
    check_table_does_exist,
    get_logging_events,
    get_manifest,
    get_run_results,
    run_dbt,
    run_dbt_and_capture,
)

pytest_plugins = ["dbt_spark.testing.fixtures"]

SEED_CSV = "id,name\n1,alpha\n2,beta\n3,gamma\n"

MODEL_SQL = """
{{ config(materialized='table') }}
select id, upper(name) as name_upper from {{ ref('raw_names') }}
"""

MODEL_COPY_SQL = """
{{ config(materialized='table') }}
select id, upper(name) as name_upper from {{ ref('raw_names') }}
"""

SCHEMA_YML = """
version: 2
models:
  - name: names
    columns:
      - name: id
        data_tests: [not_null, unique]
"""


class TestKitEndToEnd:
    @pytest.fixture(scope="class")
    def models(self):
        return {
            "names.sql": MODEL_SQL,
            "names_copy.sql": MODEL_COPY_SQL,
            "schema.yml": SCHEMA_YML,
        }

    @pytest.fixture(scope="class")
    def seeds(self):
        return {"raw_names.csv": SEED_CSV}

    def test_build_and_inspect(self, project):
        res = run_dbt(project, ["seed"])
        check_result_nodes_by_name(res, ["raw_names"])

        res, logs = run_dbt_and_capture(project, ["run"])
        check_result_nodes_by_name(res, ["names", "names_copy"])
        assert get_logging_events(logs, "LogModelResult")

        check_table_does_exist(project, "names")
        check_relations_equal(project, ["names", "names_copy"])
        check_relation_has_expected_schema(
            project, "names", {"id": "int", "name_upper": "string"}
        )

        run_dbt(project, ["test"])
        assert (project.run_sql(
            "select count(*) from names where name_upper = 'ALPHA'",
            fetch="one") or (0,))[0] == 1

        manifest = get_manifest(project.project_root)
        assert "model.test.names" in manifest["nodes"]
        rr = get_run_results(project.project_root)
        assert all(r["status"] in ("success", "pass") for r in rr["results"])
