"""Class-scoped pytest fixtures for functional tests of dbt_spark projects.

Mirrors the reference's composable fixture design
(core/dbt/tests/fixtures/project.py): a test class overrides any of
``models``/``seeds``/``macros``/``snapshots``/``tests``/``analyses``
(each a {filename: contents} dict), optionally ``project_config_update`` and
``packages``, and receives a ready ``project`` fixture whose files are
written under a temp root with an Engine attached.

Usage in an out-of-tree conftest.py or test module::

    pytest_plugins = ["dbt_spark.testing.fixtures"]
"""

from __future__ import annotations

import os

import pytest

from dbt_spark.testing import TestProject, write_file

_SUBDIRS = {
    "models": "models",
    "seeds": "seeds",
    "macros": "macros",
    "snapshots": "snapshots",
    "tests": "tests",
    "analyses": "analyses",
}


@pytest.fixture(scope="class")
def prefix() -> str:
    """Unique-per-class schema prefix (fixtures/project.py:75)."""
    import random
    import time

    return f"test{int(time.time())}{random.randint(0, 9999):04d}"


@pytest.fixture(scope="class")
def project_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("dbt_spark_project"))


# -- overridable content fixtures (fixtures/project.py:214-280) --------------

@pytest.fixture(scope="class")
def models():
    return {}


@pytest.fixture(scope="class")
def seeds():
    return {}


@pytest.fixture(scope="class")
def macros():
    return {}


@pytest.fixture(scope="class")
def snapshots():
    return {}


@pytest.fixture(scope="class")
def tests():
    return {}


@pytest.fixture(scope="class")
def analyses():
    return {}


@pytest.fixture(scope="class")
def project_config_update():
    """Dict merged into the default dbt_project.yml (fixtures/project.py:184)."""
    return {}


@pytest.fixture(scope="class")
def packages():
    """packages.yml contents as dict (fixtures/project.py:253)."""
    return {}


@pytest.fixture(scope="class")
def project_name() -> str:
    return "test"


@pytest.fixture(scope="session")
def _testing_spark():
    from dbt_spark.session import get_spark

    return get_spark("dbt_spark_testing")


@pytest.fixture(scope="class")
def project(project_root, project_name, models, seeds, macros, snapshots,
            tests, analyses, project_config_update, packages, _testing_spark):
    """The composed project fixture (fixtures/project.py:286-420): writes the
    project files, builds the Engine, yields a TestProject handle."""
    import yaml

    from dbt_spark.runner import Engine

    config = {
        "name": project_name,
        "model-paths": ["models"],
        "seed-paths": ["seeds"],
        "macro-paths": ["macros"],
        "snapshot-paths": ["snapshots"],
        "test-paths": ["tests"],
        "analysis-paths": ["analyses"],
    }
    config.update(project_config_update)
    write_file(yaml.safe_dump(config), project_root, "dbt_project.yml")
    if packages:
        write_file(yaml.safe_dump(packages), project_root, "packages.yml")
    for fixture_files, subdir in (
        (models, "models"), (seeds, "seeds"), (macros, "macros"),
        (snapshots, "snapshots"), (tests, "tests"), (analyses, "analyses"),
    ):
        for rel, contents in fixture_files.items():
            write_file(contents, project_root, subdir, rel)
    os.makedirs(os.path.join(project_root, "target"), exist_ok=True)
    engine = Engine(project_root, spark=_testing_spark)
    yield TestProject(project_root, engine)
