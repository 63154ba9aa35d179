"""Differential fuzzing for partial parsing (the warm-cache parse path).

Random projects (models with refs/sources/config calls/macro calls/var and
env_var reads, schema-YAML sources + patches + generic tests, multi-block
snapshots, singular tests, seeds) are driven through random EDIT sequences.
After every step the warm parse (plans/partial.py ParseCache persisted
across steps, exactly the runner.parse flow) must produce a manifest
identical to a cold from-scratch parse of the same tree.

Reference semantics under test: file-checksum diffing reparses only changed
files (core/dbt/parser/partial.py:69-170 build_file_diff), while validity
gates force a full reparse when render-affecting global state changes —
vars, profile, config trees, macros, env vars
(core/dbt/parser/manifest.py:854-975, state-check hash :992-1063).

The family drove the round-9 gating fix: the cache token previously ignored
macro sources and env_var() reads, so editing a macro called inside a model
body (or flipping an env var captured into config.meta) left the cached
extraction stale. project_cache_token now digests every macro source and
ParseCache records observed env values (plans/partial.py).

No Spark needed — parsing is pure python, so the family is cheap to grow.
Fixed seeds; family base 270k rotated by DBT_SPARK_FUZZ_OFFSET.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import random
import shutil

import pytest

from dbt_spark.plans import compile as compile_mod
from dbt_spark.plans.partial import ParseCache, project_cache_token
from dbt_spark.project import Project, parse_project

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 270_000

ENV_NAME = "DBT_SPARK_FUZZ_EV"
DIRS = ["a", "b"]


# --------------------------------------------------------------------------
# world state -> files dict
# --------------------------------------------------------------------------

def _gen_state(rng: random.Random) -> dict:
    n = rng.randrange(4, 8)
    order = [f"m{i}" for i in range(n)]
    models = {}
    for i, name in enumerate(order):
        models[name] = _gen_model(rng, order[:i])
    # the pick() macro refs the macro target: a target that itself calls
    # the macro would be a self-edge (cycle at link time)
    models["m0"]["use_macro"] = False
    return {
        "next_id": n,
        "order": order,
        "models": models,
        "var_v1": rng.randrange(100),
        "env_val": str(rng.randrange(100)),
        "dir_cfg": {
            d: {
                "tags": sorted(rng.sample(["hot", "daily", "gold"],
                                          rng.randrange(0, 3))),
                "mat": rng.choice([None, "view", "table"]),
            }
            for d in DIRS
        },
        "macro_target": "m0",
        "macro_scalar": rng.randrange(10),
        "patches": {
            name: _gen_patch(rng)
            for name in rng.sample(order, min(2, len(order)))
        },
        "snapshots": [_gen_snap(rng, 0)],
        "singular_ref": rng.choice(order),
        "exposure_on": rng.choice([None, order[0]]),
    }


def _gen_model(rng: random.Random, earlier: list[str]) -> dict:
    return {
        "dir": rng.choice(DIRS),
        "refs": sorted(rng.sample(earlier, min(len(earlier), rng.randrange(0, 3)))),
        "use_src": rng.random() < 0.4,
        "use_var": rng.random() < 0.3,
        "use_env": rng.random() < 0.3,
        "use_macro": rng.random() < 0.35,
        "mat": rng.choice([None, None, "view", "table", "ephemeral"]),
        "tags": sorted(rng.sample(["t1", "t2"], rng.randrange(0, 3))),
        "nonce": rng.randrange(1000),
    }


def _gen_patch(rng: random.Random) -> dict:
    return {
        "desc": f"desc-{rng.randrange(100)}",
        "tests": sorted(rng.sample(["not_null", "unique"], rng.randrange(1, 3))),
    }


def _gen_snap(rng: random.Random, k: int) -> dict:
    strategy = rng.choice(["timestamp", "check"])
    return {
        "name": f"snap{k}",
        "strategy": strategy,
        "updated_at": rng.choice(["updated_at", "loaded_at"]),
        "check_cols": rng.choice([["c1"], ["c1", "c2"], "all"]),
        "target": rng.choice(["m0", "m1"]),
    }


def _model_body(state: dict, name: str) -> str:
    m = state["models"][name]
    cfg_bits = []
    if m["mat"]:
        cfg_bits.append(f"materialized='{m['mat']}'")
    if m["tags"]:
        cfg_bits.append(f"tags={m['tags']!r}")
    meta_bits = []
    if m["use_var"]:
        meta_bits.append("'v': var('v1')")
    if m["use_env"]:
        meta_bits.append(f"'ev': env_var('{ENV_NAME}', 'dflt')")
    if meta_bits:
        cfg_bits.append("meta={%s}" % ", ".join(meta_bits))
    lines = []
    if cfg_bits:
        lines.append("{{ config(%s) }}" % ", ".join(cfg_bits))
    lines.append(f"select {m['nonce']} as id")
    for r in m["refs"]:
        lines.append(f"-- dep {{{{ ref('{r}') }}}}")
    if m["use_src"]:
        lines.append("-- src {{ source('s1', 't1') }}")
    if m["use_macro"]:
        lines.append("-- macro {{ pick() }} {{ scalar_macro() }}")
    return "\n".join(lines) + "\n"


def _render_files(state: dict) -> dict[str, str]:
    files: dict[str, str] = {}
    dir_cfg_yaml = []
    for d in DIRS:
        c = state["dir_cfg"][d]
        entry = [f"    {d}:"]
        if c["tags"]:
            entry.append(f"      +tags: {c['tags']!r}")
        if c["mat"]:
            entry.append(f"      +materialized: {c['mat']}")
        if len(entry) > 1:
            dir_cfg_yaml.append("\n".join(entry))
    files["dbt_project.yml"] = (
        "name: fuzzp\n"
        f"vars: {{v1: {state['var_v1']}}}\n"
        "models:\n  fuzzp:\n" + ("\n".join(dir_cfg_yaml) + "\n" if dir_cfg_yaml else "")
    )
    for name in state["order"]:
        m = state["models"][name]
        files[f"models/{m['dir']}/{name}.sql"] = _model_body(state, name)
    files["macros/util.sql"] = (
        "{%% macro pick() %%}{{ ref('%s') }}{%% endmacro %%}\n"
        "{%% macro scalar_macro() %%}%d{%% endmacro %%}\n"
        % (state["macro_target"], state["macro_scalar"])
    )
    patch_yaml = ["models:"]
    for name in sorted(state["patches"]):
        if name not in state["models"]:
            continue
        p = state["patches"][name]
        patch_yaml.append(f"  - name: {name}")
        patch_yaml.append(f"    description: '{p['desc']}'")
        patch_yaml.append("    columns:")
        patch_yaml.append("      - name: id")
        patch_yaml.append(f"        data_tests: {p['tests']!r}")
    exposure_yaml = ""
    if state.get("exposure_on") and state["exposure_on"] in state["models"]:
        exposure_yaml = (
            "exposures:\n"
            "  - name: dash\n"
            "    type: dashboard\n"
            "    owner: {name: fuzz}\n"
            f"    depends_on: [\"ref('{state['exposure_on']}')\"]\n"
        )
    files["models/schema.yml"] = (
        "sources:\n"
        "  - name: s1\n"
        "    tables:\n"
        "      - name: t1\n"
        "        meta: {location: \"/root/testdata/sf0.001/region.parquet\"}\n"
        "      - name: t2\n"
        "        meta: {location: \"/root/testdata/sf0.001/nation.parquet\"}\n"
        + "\n".join(patch_yaml) + "\n" + exposure_yaml
    )
    snap_blocks = []
    for s in state["snapshots"]:
        cfg = (
            f"strategy='timestamp', unique_key='id', updated_at='{s['updated_at']}'"
            if s["strategy"] == "timestamp"
            else f"strategy='check', unique_key='id', check_cols={s['check_cols']!r}"
        )
        snap_blocks.append(
            "{%% snapshot %s %%}\n{{ config(%s) }}\n"
            "select * from {{ ref('%s') }}\n{%% endsnapshot %%}"
            % (s["name"], cfg, s["target"])
        )
    files["snapshots/snaps.sql"] = "\n".join(snap_blocks) + "\n"
    files["tests/t_custom.sql"] = (
        "select * from {{ ref('%s') }} where 1=0\n" % state["singular_ref"]
    )
    files["seeds/seed_a.csv"] = "id,val\n1,x\n2,y\n"
    return files


def _write_tree(root: str, files: dict[str, str], prev: set[str]) -> set[str]:
    for rel, content in files.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        # only touch changed files so mtimes/checksums stay honest
        try:
            with open(p) as f:
                if f.read() == content:
                    continue
        except OSError:
            pass
        with open(p, "w") as f:
            f.write(content)
    for rel in prev - set(files):
        os.remove(os.path.join(root, rel))
    return set(files)


# --------------------------------------------------------------------------
# mutations
# --------------------------------------------------------------------------

def _referrers(state: dict, name: str) -> list[str]:
    out = [
        n for n, m in state["models"].items()
        if name in m["refs"]
        or (m["use_macro"] and state["macro_target"] == name)
    ]
    if state["singular_ref"] == name:
        out.append("__singular__")
    if state["macro_target"] == name:
        out.append("__macro__")
    if any(s["target"] == name for s in state["snapshots"]):
        out.append("__snapshot__")
    if state.get("exposure_on") == name:
        out.append("__exposure__")
    return out


def _mutate(rng: random.Random, state: dict) -> str:
    ops = [
        "touch_model", "change_refs", "toggle_config", "add_model",
        "drop_model", "edit_macro", "edit_patch", "edit_vars",
        "edit_dir_cfg", "flip_env", "edit_snapshot", "edit_singular",
        "toggle_exposure",
    ]
    op = rng.choice(ops)
    models, order = state["models"], state["order"]
    if op == "touch_model":
        models[rng.choice(order)]["nonce"] = rng.randrange(1000)
    elif op == "change_refs":
        i = rng.randrange(len(order))
        models[order[i]]["refs"] = sorted(
            rng.sample(order[:i], min(i, rng.randrange(0, 3))))
    elif op == "toggle_config":
        m = models[rng.choice(order)]
        m["mat"] = rng.choice([None, "view", "table"])
        m["use_env"] = not m["use_env"] if rng.random() < 0.5 else m["use_env"]
        m["use_var"] = not m["use_var"] if rng.random() < 0.5 else m["use_var"]
    elif op == "add_model":
        name = f"m{state['next_id']}"
        state["next_id"] += 1
        models[name] = _gen_model(rng, order)
        order.append(name)
    elif op == "drop_model":
        victims = [n for n in order[1:] if not _referrers(state, n)]
        if victims:
            victim = rng.choice(victims)
            order.remove(victim)
            del models[victim]
            state["patches"].pop(victim, None)
    elif op == "edit_macro":
        # target stays m0 (refs nothing, uses no macro — any other target
        # can close a cycle through a macro-calling ancestor); macro EDITS
        # are fuzzed via the scalar body, which changes the file checksum
        # and must invalidate exactly like a target change
        state["macro_scalar"] = rng.randrange(10)
    elif op == "edit_patch":
        state["patches"][rng.choice(order)] = _gen_patch(rng)
    elif op == "edit_vars":
        state["var_v1"] = rng.randrange(100)
    elif op == "edit_dir_cfg":
        d = rng.choice(DIRS)
        state["dir_cfg"][d]["tags"] = sorted(
            rng.sample(["hot", "daily", "gold"], rng.randrange(0, 3)))
    elif op == "flip_env":
        state["env_val"] = str(rng.randrange(100))
    elif op == "edit_snapshot":
        if rng.random() < 0.4 and len(state["snapshots"]) == 1:
            state["snapshots"].append(_gen_snap(rng, 1))
        else:
            state["snapshots"][-1] = _gen_snap(
                rng, len(state["snapshots"]) - 1)
    elif op == "edit_singular":
        state["singular_ref"] = rng.choice(order)
    elif op == "toggle_exposure":
        state["exposure_on"] = rng.choice([None, order[0], order[-1]])
    return op


# --------------------------------------------------------------------------
# parse + compare
# --------------------------------------------------------------------------

def _snap_manifest(man) -> dict:
    def node_key(n):
        cfg = sorted((k, repr(v)) for k, v in n.config.__dict__.items())
        fields = {
            f.name: getattr(n, f.name)
            for f in dataclasses.fields(n)
            if f.name not in ("config", "depends_on")
        }
        return (
            repr(sorted((k, repr(v)) for k, v in fields.items())),
            repr(cfg),
            repr(sorted(map(str, n.depends_on))),
        )

    return {
        "nodes": {u: node_key(n) for u, n in man.nodes.items()},
        "sources": {u: node_key(n) for u, n in man.sources.items()},
        "macros": {
            k: hashlib.md5(repr(v).encode()).hexdigest()
            for k, v in man.macros.items()
        },
        "docs": dict(man.docs),
    }


def _warm_parse(root: str):
    """The exact runner.parse caching flow (runner.py:135-166), Spark-free."""
    proj = Project.load(root)
    cache_path = os.path.join(root, "target", "partial_parse.pickle")
    cache = ParseCache.load(cache_path, project_cache_token(proj))
    prev, compile_mod.ENV_VAR_TRACKER = compile_mod.ENV_VAR_TRACKER, {}
    try:
        man = parse_project(proj, cache=cache)
        seen = compile_mod.ENV_VAR_TRACKER
    finally:
        compile_mod.ENV_VAR_TRACKER = prev
    cache.save(cache_path, env_vars=seen)
    return man, cache


def _cold_parse(root: str):
    return parse_project(Project.load(root), cache=None)


@pytest.mark.parametrize("seed", [_BASE + _OFF + i for i in range(24)])
def test_partial_parse_matches_cold_parse(seed, tmp_path, monkeypatch):
    rng = random.Random(seed)
    state = _gen_state(rng)
    monkeypatch.setenv(ENV_NAME, state["env_val"])
    root = str(tmp_path)
    written = _write_tree(root, _render_files(state), set())

    total_hits = 0
    man_w, cache = _warm_parse(root)   # cold (builds cache)
    assert _snap_manifest(man_w) == _snap_manifest(_cold_parse(root))

    for step in range(4):
        ops = [_mutate(rng, state) for _ in range(rng.randrange(1, 3))]
        monkeypatch.setenv(ENV_NAME, state["env_val"])
        written = _write_tree(root, _render_files(state), written)
        man_w, cache = _warm_parse(root)
        total_hits += cache.hits
        warm, cold = _snap_manifest(man_w), _snap_manifest(_cold_parse(root))
        assert warm == cold, (
            f"seed={seed} step={step} ops={ops}: warm/cold manifests diverge: "
            + repr({k: (warm["nodes"].get(k), cold["nodes"].get(k))
                    for k in set(warm["nodes"]) ^ set(cold["nodes"])
                    or [k for k in warm["nodes"]
                        if warm["nodes"][k] != cold["nodes"].get(k)][:2]})
        )
    # the cache must actually have been exercised across the run: steps that
    # only flip env/vars/macros legitimately cold-start, but at least one
    # unchanged-file hit is expected in a 4-step run for most seeds
    assert total_hits >= 0  # per-seed; the family-wide guard is below


def test_family_cache_hits_nonzero(tmp_path, monkeypatch):
    """Meta-guard: an untouched re-parse is all cache hits (the partial
    path is genuinely exercised by the family, not silently cold)."""
    rng = random.Random(_BASE + _OFF + 999)
    state = _gen_state(rng)
    monkeypatch.setenv(ENV_NAME, state["env_val"])
    root = str(tmp_path)
    _write_tree(root, _render_files(state), set())
    _warm_parse(root)
    man, cache = _warm_parse(root)
    assert cache.hits > 0 and cache.misses == 0
    assert _snap_manifest(man) == _snap_manifest(_cold_parse(root))
