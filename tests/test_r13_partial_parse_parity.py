"""Round-13 parity with two unreleased partial-parsing fixes:

- 'Make partial parsing reparse referencing nodes of newly versioned
  models' (Fixes-20241204-100429): after a warm parse, an unversioned
  ref('m') must re-resolve to the LATEST version when m becomes
  versioned — which also requires unversioned-ref-to-latest resolution
  (manifest.ref_lookup) and versions finalizing BEFORE ref resolution.
- 'Implement partial parsing for singular data test configs in yaml
  files' (Fixes-20241212-113611): a top-level `data_tests:` yaml patch
  (SingularTestPatchParser shape) configures a singular tests/*.sql
  node, and editing the yaml takes effect on a warm (cached) parse.
"""

from __future__ import annotations

import os

from dbt_spark.plans.partial import ParseCache, project_cache_token
from dbt_spark.project import Project, parse_project


def _parse_warm(root: str):
    proj = Project.load(root)
    path = os.path.join(root, "target", "parse_cache.json")
    cache = ParseCache.load(path, project_cache_token(proj))
    man = parse_project(proj, cache=cache)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cache.save(path)
    return man


def _write(root: str, rel: str, body: str) -> None:
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write(body)


def test_newly_versioned_model_rebinds_referencing_nodes(tmp_path):
    root = str(tmp_path)
    _write(root, "dbt_project.yml", "name: vparse\n")
    _write(root, "models/m.sql", "select 1 as id")
    _write(root, "models/user.sql", "select * from {{ ref('m') }}")
    m1 = _parse_warm(root)
    assert m1.nodes["model.vparse.user"].depends_on == ["model.vparse.m"]

    # m becomes versioned; the user model FILE is untouched (cache-hit)
    os.remove(os.path.join(root, "models", "m.sql"))
    _write(root, "models/m_v1.sql", "select 1 as id")
    _write(root, "models/m_v2.sql", "select 2 as id")
    _write(root, "models/schema.yml",
           "models:\n  - name: m\n    latest_version: 2\n"
           "    versions:\n      - v: 1\n      - v: 2\n")
    m2 = _parse_warm(root)
    assert m2.nodes["model.vparse.user"].depends_on == ["model.vparse.m_v2"]
    # explicit version refs still work alongside
    _write(root, "models/old_user.sql",
           "select * from {{ ref('m', version=1) }}")
    m3 = _parse_warm(root)
    assert m3.nodes["model.vparse.old_user"].depends_on == [
        "model.vparse.m_v1"]


def test_singular_test_yaml_config_applies_and_reparses(tmp_path):
    root = str(tmp_path)
    _write(root, "dbt_project.yml", "name: stparse\n")
    _write(root, "models/m.sql", "select 1 as id")
    _write(root, "tests/singular_check.sql",
           "select * from {{ ref('m') }} where id < 0")
    m1 = _parse_warm(root)
    t1 = m1.nodes["test.stparse.singular_check"]
    assert t1.config.severity == "error"

    _write(root, "tests/schema.yml",
           "data_tests:\n  - name: singular_check\n"
           "    description: negative ids are corrupt\n"
           "    meta: {owner: dq-team}\n"
           "    config:\n      severity: warn\n      where: \"id != 99\"\n")
    m2 = _parse_warm(root)
    t2 = m2.nodes["test.stparse.singular_check"]
    assert t2.config.severity == "warn"
    assert t2.config.where == "id != 99"
    assert t2.config.meta.get("owner") == "dq-team"
    assert "corrupt" in t2.description

    # editing the yaml takes effect on the NEXT warm parse
    _write(root, "tests/schema.yml",
           "data_tests:\n  - name: singular_check\n"
           "    config:\n      severity: error\n")
    m3 = _parse_warm(root)
    assert m3.nodes["test.stparse.singular_check"].config.severity == "error"


def test_unknown_singular_patch_name_is_ignored(tmp_path):
    root = str(tmp_path)
    _write(root, "dbt_project.yml", "name: stmiss\n")
    _write(root, "models/m.sql", "select 1 as id")
    _write(root, "tests/schema.yml",
           "data_tests:\n  - name: no_such_test\n"
           "    config: {severity: warn}\n")
    man = _parse_warm(root)  # must not raise
    assert "model.stmiss.m" in man.nodes
