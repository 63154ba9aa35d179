"""dbt_spark.testing: the public functional-test kit (reference:
core/dbt/tests/fixtures/project.py + core/dbt/tests/util.py)."""

import os
import shutil
import subprocess
import sys

from dbt_spark.runner import Engine
from dbt_spark.testing import (
    TestProject,
    check_relations_equal,
    get_logging_events,
    run_dbt,
    run_dbt_and_capture,
    update_config_file,
    write_file,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_out_of_tree_example_passes_from_foreign_cwd(tmp_path):
    """The examples/ test must pass with only PYTHONPATH=repo, run from a
    directory outside the repo — the kit is importable public API, not
    something that leans on tests/conftest.py."""
    src = os.path.join(REPO, "examples", "out_of_tree_test",
                       "test_kit_example.py")
    dst = tmp_path / "test_kit_example.py"
    shutil.copyfile(src, str(dst))
    env = {**os.environ, "PYTHONPATH": REPO}
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", str(dst), "-q", "--no-header", "-p",
         "no:cacheprovider"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "1 passed" in proc.stdout


def test_util_helpers_direct(project_dir, spark, tmp_path):
    root = project_dir({
        "dbt_project.yml": "name: kit\nmodel-paths: ['models']\nseed-paths: ['seeds']\n",
        "seeds/raw.csv": "id,v\n1,a\n2,b\n",
        "models/m1.sql": "select * from {{ ref('raw') }}",
        "models/m2.sql": "select * from {{ ref('raw') }}",
    })
    project = TestProject(root, Engine(root, spark=spark))
    run_dbt(project, ["seed"])
    res, logs = run_dbt_and_capture(project, ["run"])
    assert len(res.results) == 2
    assert len(get_logging_events(logs, "LogModelResult")) == 2
    # capture is delta-only: a second invocation captures only its own lines
    _, logs2 = run_dbt_and_capture(project, ["run"])
    assert logs2[0]["info"]["name"] == "MainReportVersion"
    check_relations_equal(project, ["m1", "m2"])
    assert project.run_sql("select count(*) from m1", fetch="one") == (2,)
    assert project.run_sql("select id from m1 order by id", fetch="all") == [
        (1,), (2,)]
    # expect_pass=False path
    write_file("select * from {{ ref('nope') }}", root, "models", "bad.sql")
    try:
        run_dbt(project, ["run"], expect_pass=False)
    except Exception as e:  # parse errors may raise instead of failing
        assert "nope" in str(e)
    # update_config_file deep-merges
    write_file("name: kit\nmodels:\n  kit:\n    +materialized: view\n",
               str(tmp_path), "cfg.yml")
    update_config_file({"models": {"kit": {"+tags": ["x"]}}},
                       str(tmp_path), "cfg.yml")
    import yaml
    cfg = yaml.safe_load(open(tmp_path / "cfg.yml"))
    assert cfg["models"]["kit"] == {"+materialized": "view", "+tags": ["x"]}
