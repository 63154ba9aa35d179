"""Differential fuzzing for adapter.dispatch macro search order.

Random worlds: 0-3 local packages plus the root project, each randomly
defining ``spark__greet`` / ``default__greet`` / bare ``greet`` bodies
tagged by owner; a random ``dispatch:`` config entry; a model calling
``adapter.dispatch('greet', macro_namespace=...)``. The REAL path runs
Project.load -> parse_project (macro namespacing, dependency registry)
-> parse_render (bound dispatcher); the oracle independently replays the
reference search-order rules (core/dbt/context/providers.py:126-224,
core/dbt/config/project.py:775):

    search packages: dispatch-config entry for the namespace, else
    [root, namespace] when the namespace is an installed package, else
    the flat global namespace (last-registration-wins);
    prefixes: spark__ then default__ within each package;
    bare-name lenience only in the namespace-less global path.

No Spark needed. Fixed seeds; family base 300k rotated by
DBT_SPARK_FUZZ_OFFSET.
"""

from __future__ import annotations

import os
import random

import pytest

from dbt_spark.plans.compile import CompilationError, parse_render
from dbt_spark.project import Project, parse_project

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 300_000

PKG_POOL = ["pkga", "pkgb", "pkgc"]
VARIANTS = ["spark__greet", "default__greet", "greet"]


def _gen_world(rng):
    pkgs = PKG_POOL[: rng.randint(0, 3)]
    # owner -> set of defined variants (each owner defines at least one)
    defs = {}
    for owner in pkgs + ["rootproj"]:
        picked = [v for v in VARIANTS if rng.random() < 0.5]
        if not picked:
            picked = [rng.choice(VARIANTS)]
        defs[owner] = picked
    config = None
    if rng.random() < 0.5 and pkgs:
        ns = rng.choice(pkgs + ["ghostpkg"])
        pool = ["rootproj"] + pkgs + (["ghostpkg"] if rng.random() < 0.2 else [])
        order = rng.sample(pool, rng.randint(1, len(pool)))
        config = {"macro_namespace": ns, "search_order": order}
    namespace = rng.choice([None] + pkgs + ["ghostpkg"])
    return pkgs, defs, config, namespace


def _write_world(tmp_path, pkgs, defs, config):
    def macro_file(owner):
        return "\n".join(
            "{%% macro %s() %%}'%s' as who{%% endmacro %%}" % (v, f"{owner}:{v}")
            for v in defs[owner]
        )

    proj_yml = "name: rootproj\n"
    if config is not None:
        proj_yml += (
            "dispatch:\n"
            f"  - macro_namespace: {config['macro_namespace']}\n"
            f"    search_order: {config['search_order']!r}\n"
        )
    files = {
        "dbt_project.yml": proj_yml,
        "macros/greet.sql": macro_file("rootproj"),
    }
    if pkgs:
        files["packages.yml"] = "packages:\n" + "".join(
            f"  - local: pkgs/{p}\n" for p in pkgs
        )
        for p in pkgs:
            files[f"pkgs/{p}/dbt_project.yml"] = f"name: {p}\n"
            files[f"pkgs/{p}/macros/greet.sql"] = macro_file(p)
    for rel, content in files.items():
        f = tmp_path / rel
        f.parent.mkdir(parents=True, exist_ok=True)
        f.write_text(content)
    return str(tmp_path)


def _oracle(pkgs, defs, config, namespace):
    """Predict the winning tag, or None for a dispatch error."""
    deps = ["dbt_utils"] + pkgs  # builtin global package registers first

    def from_package(pkg, variant):
        if pkg in defs and variant in defs[pkg]:
            return f"{pkg}:{variant}"
        return None

    def from_flat(variant):
        # flat registration order: builtin, packages (packages.yml order),
        # then the root project — LAST registration wins
        winner = None
        for owner in pkgs + ["rootproj"]:
            if variant in defs.get(owner, ()):
                winner = f"{owner}:{variant}"
        return winner

    if namespace is None:
        search = [None]
    elif config and config["macro_namespace"] == namespace:
        search = list(config["search_order"])
    elif namespace in deps:
        search = ["rootproj", namespace]
    else:
        search = [None]
    for pkg in search:
        for variant in ("spark__greet", "default__greet"):
            got = from_flat(variant) if pkg is None else from_package(pkg, variant)
            if got is not None:
                return got
    if namespace is None:
        return from_flat("greet")
    return None


@pytest.mark.parametrize("seed", [_BASE + _OFF + i for i in range(14)])
def test_dispatch_vs_reference_search_order(seed, tmp_path):
    rng = random.Random(seed)
    pkgs, defs, config, namespace = _gen_world(rng)
    pdir = _write_world(tmp_path, pkgs, defs, config)
    project = Project.load(pdir)
    manifest = parse_project(project)
    ns_arg = "" if namespace is None else f", macro_namespace='{namespace}'"
    raw = f"select {{{{ adapter.dispatch('greet'{ns_arg})() }}}}"
    meta = {
        "config": manifest.dispatch_config,
        "root_project": manifest.project_name,
        "dependencies": manifest.dependencies,
    }
    expect = _oracle(pkgs, defs, config, namespace)
    if expect is None:
        with pytest.raises(CompilationError, match="No macro named 'greet'"):
            parse_render(raw, "m", {}, {}, macros=manifest.macros,
                         dispatch_meta=meta)
        return
    rendered, _, _, _ = parse_render(
        raw, "m", {}, {}, macros=manifest.macros, dispatch_meta=meta
    )
    assert f"'{expect}' as who" in rendered, (
        f"seed={seed} pkgs={pkgs} defs={defs} config={config} "
        f"namespace={namespace}: got {rendered!r}"
    )
