"""adapter.dispatch search-order semantics (VERDICT r9 directive #1).

Reference: core/dbt/context/providers.py:126-224 (_get_search_packages /
_get_adapter_macro_prefixes / dispatch) + core/dbt/config/project.py:775
(get_macro_search_order over the project-level ``dispatch:`` config).
The dbt_utils→spark_utils shim idiom depends on exactly this resolution:
a project-level dispatch entry reroutes a whole macro namespace to an
override package without touching any call site.
"""

import os
from types import SimpleNamespace

import pytest

from dbt_spark.plans.compile import CompilationError
from dbt_spark.plans.macros import make_dispatcher
from dbt_spark.runner import Engine


# ---------------------------------------------------------------- unit level

def _mk(tag):
    fn = lambda *a, **k: tag  # noqa: E731
    return fn


BOUND = {
    "spark__m": _mk("global-spark"),
    "default__m": _mk("global-default"),
    "bare_only": _mk("global-bare"),
    "pkgA": SimpleNamespace(default__m=_mk("A-default")),
    "pkgB": SimpleNamespace(spark__m=_mk("B-spark"), default__m=_mk("B-default")),
    "rootp": SimpleNamespace(default__other=_mk("root-other")),
}


def _dispatcher(**kw):
    kw.setdefault("root_project", "rootp")
    kw.setdefault("dependencies", ["pkgA", "pkgB"])
    return make_dispatcher(BOUND, **kw)


def test_no_namespace_prefers_adapter_prefix_in_global_namespace():
    d = _dispatcher()
    assert d("m")() == "global-spark"


def test_default_prefix_when_adapter_missing():
    bound = {"default__m": _mk("only-default")}
    d = make_dispatcher(bound)
    assert d("m")() == "only-default"


def test_bare_name_lenience_only_without_namespace():
    d = _dispatcher()
    assert d("bare_only")() == "global-bare"
    with pytest.raises(CompilationError) as e:
        d("bare_only", macro_namespace="pkgA")
    # error lists every attempted candidate (providers.py:218-221)
    assert "rootp.spark__bare_only" in str(e.value)
    assert "pkgA.default__bare_only" in str(e.value)


def test_dependency_namespace_searches_root_then_package():
    d = _dispatcher()
    # rootp lacks m -> falls to the namespace package; spark__ beats default__
    assert d("m", macro_namespace="pkgB")() == "B-spark"
    assert d("m", macro_namespace="pkgA")() == "A-default"


def test_dispatch_config_overrides_search_order():
    cfg = [{"macro_namespace": "pkgA", "search_order": ["pkgB", "pkgA"]}]
    d = _dispatcher(dispatch_config=cfg)
    assert d("m", macro_namespace="pkgA")() == "B-spark"


def test_unknown_namespace_falls_back_to_global():
    d = _dispatcher()
    assert d("m", macro_namespace="not_installed")() == "global-spark"


def test_dotted_macro_name_raises_with_suggestion():
    d = _dispatcher()
    with pytest.raises(CompilationError) as e:
        d("pkgA.m")
    assert 'macro_namespace="pkgA"' in str(e.value)


def test_non_string_namespace_raises():
    d = _dispatcher()
    with pytest.raises(CompilationError):
        d("m", macro_namespace=["pkgA"])


# ------------------------------------------------------------- engine level

PKG_BASE = {
    "dbt_project.yml": (
        "name: rootproj\n"
        "packages: []\n"
    ),
    "packages.yml": (
        "packages:\n"
        "  - local: pkgs/basepack\n"
        "  - local: pkgs/shimpack\n"
    ),
    "pkgs/basepack/dbt_project.yml": "name: basepack\n",
    "pkgs/basepack/macros/greet.sql": (
        "{% macro default__greet() %}'base' as who{% endmacro %}"
    ),
    "pkgs/shimpack/dbt_project.yml": "name: shimpack\n",
    "pkgs/shimpack/macros/greet.sql": (
        "{% macro default__greet() %}'shim-default' as who{% endmacro %}\n"
        "{% macro spark__greet() %}'shim-spark' as who{% endmacro %}"
    ),
    "models/hello.sql": (
        "select {{ adapter.dispatch('greet', macro_namespace='basepack')() }}"
    ),
}


def _who(pdir, spark):
    eng = Engine(pdir, spark=spark)
    r = eng.invoke(["run", "--select", "hello"])
    assert r.success, [getattr(x, "message", None) for x in r.results]
    return eng.store.read("main", "hello").collect()[0]["who"]


def test_engine_dispatch_defaults_to_namespace_package(project_dir, spark):
    pdir = project_dir(PKG_BASE)
    assert _who(pdir, spark) == "base"


def test_engine_dispatch_config_reroutes_namespace(project_dir, spark):
    files = dict(PKG_BASE)
    files["dbt_project.yml"] = (
        "name: rootproj\n"
        "dispatch:\n"
        "  - macro_namespace: basepack\n"
        "    search_order: ['rootproj', 'shimpack', 'basepack']\n"
    )
    pdir = project_dir(files)
    # shimpack precedes basepack and its spark__ variant beats default__
    assert _who(pdir, spark) == "shim-spark"


def test_engine_dispatch_root_project_wins_search_order(project_dir, spark):
    files = dict(PKG_BASE)
    files["dbt_project.yml"] = (
        "name: rootproj\n"
        "dispatch:\n"
        "  - macro_namespace: basepack\n"
        "    search_order: ['rootproj', 'shimpack', 'basepack']\n"
    )
    files["macros/local_greet.sql"] = (
        "{% macro spark__greet() %}'root-spark' as who{% endmacro %}"
    )
    pdir = project_dir(files)
    assert _who(pdir, spark) == "root-spark"


def test_engine_malformed_dispatch_config_rejected(project_dir, spark):
    files = dict(PKG_BASE)
    files["dbt_project.yml"] = (
        "name: rootproj\n"
        "dispatch:\n"
        "  - macro_namespace: basepack\n"
    )
    pdir = project_dir(files)
    with pytest.raises(ValueError, match="dispatch entry"):
        Engine(pdir, spark=spark)


# ------------------------------------------------- restrict-access semantics

ACC_BASE = {
    "dbt_project.yml": "name: rootproj\n",
    "packages.yml": "packages:\n  - local: pkgs/libpack\n",
    "pkgs/libpack/models/guarded.sql": "select 1 as id",
    "models/consumer.sql": "select * from {{ ref('guarded') }}",
}


def test_cross_package_protected_ref_allowed_without_flag(project_dir, spark):
    """Reference default: protected models accept cross-package refs unless
    the defining package sets restrict-access
    (manifest.py:1502 is_invalid_protected_ref)."""
    files = dict(ACC_BASE)
    files["pkgs/libpack/dbt_project.yml"] = "name: libpack\n"
    pdir = project_dir(files)
    eng = Engine(pdir, spark=spark)
    m = eng.parse()
    assert "model.rootproj.consumer" in m.nodes


def test_cross_package_protected_ref_errors_with_flag(project_dir, spark):
    files = dict(ACC_BASE)
    files["pkgs/libpack/dbt_project.yml"] = (
        "name: libpack\nrestrict-access: true\n"
    )
    pdir = project_dir(files)
    eng = Engine(pdir, spark=spark)
    with pytest.raises(CompilationError, match="restrict-access"):
        eng.parse()


def test_private_ref_cross_package_gated_by_flag(project_dir, spark):
    # same group, different package: allowed without the flag,
    # rejected with it (manifest.py is_invalid_private_ref)
    files = dict(ACC_BASE)
    files["pkgs/libpack/models/guarded.sql"] = (
        "{{ config(access='private', group='g1') }} select 1 as id"
    )
    files["models/consumer.sql"] = (
        "{{ config(group='g1') }} select * from {{ ref('guarded') }}"
    )
    files["pkgs/libpack/dbt_project.yml"] = "name: libpack\n"
    pdir = project_dir(files)
    assert "model.rootproj.consumer" in Engine(pdir, spark=spark).parse().nodes

    files["pkgs/libpack/dbt_project.yml"] = (
        "name: libpack\nrestrict-access: true\n"
    )
    pdir2 = project_dir(files)
    with pytest.raises(CompilationError, match="restrict-access"):
        Engine(pdir2, spark=spark).parse()


def test_dispatch_config_change_invalidates_partial_parse_cache():
    """dispatch: edits reroute macro resolution inside parse-renders, so
    the partial-parse validity token must change (plans/partial.py
    project_cache_token)."""
    from dbt_spark.plans.partial import project_cache_token

    class P:
        vars = {}
        model_config = {}
        seed_config = {}
        profile = {"schema": "main"}
        dispatch = []
        restrict_access = False
        root = "/nonexistent"
        macro_paths = []
        test_paths = []
        packages = []
        name = "p"

    a = project_cache_token(P())
    P.dispatch = [{"macro_namespace": "dbt_utils",
                   "search_order": ["p", "dbt_utils"]}]
    b = project_cache_token(P())
    assert a != b
