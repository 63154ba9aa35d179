"""Differential fuzzing for the node-selection DSL.

Random DAGs × random selector expressions (graph operators +/n+/+n/@,
comma intersections, multi-spec unions, excludes, name and tag methods)
evaluated by the REAL selector (plans/graph.py::select_nodes over a
Linker-built graph) and compared against an independent BFS replay of the
reference semantics (core/dbt/graph/selector_spec.py operators,
selector_methods.py tag/name methods):

    n+name  ancestors within n hops (bare + unbounded)
    name+n  descendants within n hops
    @name   seed + descendants, plus ALL ancestors of that closure
    a,b     intersection; list elements union; --exclude subtracts

No Spark needed — pure graph logic, so the family is cheap to grow.
Fixed seeds; family base 190k rotated by DBT_SPARK_FUZZ_OFFSET.
"""

from __future__ import annotations

import os
import random

import pytest

from dbt_spark.plans.graph import Linker, select_nodes
from dbt_spark.plans.manifest import Manifest, ManifestNode, NodeType

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 190_000

TAGS = ["hot", "daily"]
N = 12


def _gen_world(rng):
    """(manifest, edges, tags) — random DAG over m0..m11 (edges low->high)."""
    man = Manifest(project_name="self")
    edges: list[tuple[str, str]] = []
    tags: dict[str, set] = {}
    for i in range(N):
        uid = f"model.self.m{i}"
        node = ManifestNode(
            unique_id=uid, name=f"m{i}", package_name="self",
            path=f"models/m{i}.sql", resource_type=NodeType.Model,
            raw_code="select 1", fqn=["self", f"m{i}"],
        )
        node.config.tags = sorted(
            t for t in TAGS if rng.random() < 0.35)
        tags[uid] = set(node.config.tags)
        for j in range(i):
            if rng.random() < 0.22:
                dep = f"model.self.m{j}"
                node.depends_on.append(dep)
                edges.append((dep, uid))
        man.add(node)
    return man, edges, tags


def _gen_atom(rng):
    body_kind = rng.random()
    if body_kind < 0.7:
        body = f"m{rng.randrange(N)}"
    else:
        body = f"tag:{rng.choice(TAGS)}"
    if rng.random() < 0.2:
        return f"@{body}", ("@", None, body, None)
    pre = rng.choice([None, "+", "1+", "2+"])
    post = rng.choice([None, "+", "+1", "+2"])
    return (
        f"{pre or ''}{body}{post or ''}",
        (None, pre, body, post),
    )


def _ancestors(edges, uid, depth=None):
    parents: dict[str, set] = {}
    for a, b in edges:
        parents.setdefault(b, set()).add(a)
    out, frontier, d = set(), {uid}, 0
    while frontier and (depth is None or d < depth):
        frontier = set().union(*(parents.get(n, set()) for n in frontier))
        out |= frontier
        d += 1
    return out


def _descendants(edges, uid, depth=None):
    kids: dict[str, set] = {}
    for a, b in edges:
        kids.setdefault(a, set()).add(b)
    out, frontier, d = set(), {uid}, 0
    while frontier and (depth is None or d < depth):
        frontier = set().union(*(kids.get(n, set()) for n in frontier))
        out |= frontier
        d += 1
    return out


def _replay_atom(parsed, man, edges, tags):
    at, pre, body, post = parsed
    if body.startswith("tag:"):
        want = body.split(":", 1)[1]
        seed = {u for u, ts in tags.items() if want in ts}
    else:
        seed = {u for u in man.nodes if man.nodes[u].name == body}
    if at == "@":
        closure = set(seed)
        for u in seed:
            closure |= _descendants(edges, u)
        out = set(closure)
        for u in closure:
            out |= _ancestors(edges, u)
        return out
    out = set(seed)
    if pre is not None:
        depth = int(pre[:-1]) if len(pre) > 1 else None
        for u in seed:
            out |= _ancestors(edges, u, depth)
    if post is not None:
        depth = int(post[1:]) if len(post) > 1 else None
        for u in seed:
            out |= _descendants(edges, u, depth)
    return out


@pytest.mark.parametrize("seed", range(40))
def test_selector_dsl_differential(seed):
    rng = random.Random(_BASE + _OFF + seed)
    man, edges, tags = _gen_world(rng)
    graph = Linker().link_graph(man)

    select, want = [], set()
    for _ in range(rng.randrange(1, 3)):  # union of 1-2 specs
        if rng.random() < 0.3:  # comma intersection of two atoms
            (s1, p1), (s2, p2) = _gen_atom(rng), _gen_atom(rng)
            select.append(f"{s1},{s2}")
            want |= (_replay_atom(p1, man, edges, tags)
                     & _replay_atom(p2, man, edges, tags))
        else:
            s, p = _gen_atom(rng)
            select.append(s)
            want |= _replay_atom(p, man, edges, tags)
    exclude = []
    if rng.random() < 0.4:
        s, p = _gen_atom(rng)
        exclude.append(s)
        want -= _replay_atom(p, man, edges, tags)

    got = select_nodes(man, graph, select=select, exclude=exclude)
    assert got == want, (
        f"seed={seed} select={select} exclude={exclude} "
        f"edges={sorted(edges)}"
    )


def _gen_defn(rng, depth=0):
    """(yaml-selector-definition, replay-closure) — random union/intersection
    trees with nested excludes and method leaves carrying parents/children/
    childrens_parents knobs (core/dbt/config/selectors.py shapes)."""
    def leaf():
        if rng.random() < 0.6:
            method, value = "fqn", f"m{rng.randrange(N)}"
        else:
            method, value = "tag", rng.choice(TAGS)
        d = {"method": method, "value": value}
        kind = rng.random()
        if kind < 0.2:
            d["childrens_parents"] = True
            parsed = ("@", None,
                      value if method == "fqn" else f"tag:{value}", None)
        else:
            pre = post = None
            if kind < 0.5:
                d["parents"] = True
                dep = rng.choice([None, 1, 2])
                if dep:
                    d["parents_depth"] = dep
                pre = f"{dep}+" if dep else "+"
            if rng.random() < 0.4:
                d["children"] = True
                dep = rng.choice([None, 1])
                if dep:
                    d["children_depth"] = dep
                post = f"+{dep}" if dep else "+"
            parsed = (None, pre,
                      value if method == "fqn" else f"tag:{value}", post)
        return d, parsed

    if depth >= 1 or rng.random() < 0.4:
        d, parsed = leaf()
        return d, ("leaf", parsed)
    op = rng.choice(["union", "intersection"])
    children, closures = [], []
    for _ in range(rng.randrange(2, 4)):
        c, cl = _gen_defn(rng, depth + 1)
        children.append(c)
        closures.append(cl)
    excl = None
    if rng.random() < 0.4:
        e, ecl = leaf()
        children.append({"exclude": [e]})
        excl = ("leaf", ecl)
    return {op: children}, (op, closures, excl)


def _replay_defn(closure, man, edges, tags):
    kind = closure[0]
    if kind == "leaf":
        return _replay_atom(closure[1], man, edges, tags)
    op, closures, excl = closure
    result = None
    for cl in closures:
        part = _replay_defn(cl, man, edges, tags)
        if result is None:
            result = part
        elif op == "union":
            result |= part
        else:
            result &= part
    result = result or set()
    if excl is not None:
        result -= _replay_defn(excl, man, edges, tags)
    return result


@pytest.mark.parametrize("seed", range(24))
def test_selector_definition_tree_differential(seed):
    """YAML selector definitions: union/intersection trees, nested
    excludes, and method leaves with parents/children(_depth)/
    childrens_parents — vs the same BFS replay."""
    rng = random.Random(_BASE + _OFF + 7000 + seed)
    man, edges, tags = _gen_world(rng)
    graph = Linker().link_graph(man)
    defn, closure = _gen_defn(rng)
    got = select_nodes(man, graph, selector_def=defn)
    want = _replay_defn(closure, man, edges, tags)
    assert got == want, f"seed={seed} defn={defn}"


def _state_entry(node, body_changed, cfg_changed):
    """Old-manifest artifact dict the way runner.py loads --state entries."""
    cfg = {k: v for k, v in node.config.__dict__.items()
           if v not in (None, [], {})}
    if cfg_changed:
        cfg = dict(cfg)
        cfg["materialized"] = "table" if cfg.get(
            "materialized") != "table" else "view"
    return {
        "checksum": ("0" * 32) if body_changed else node.checksum(),
        "config": cfg,
    }


@pytest.mark.parametrize("seed", range(24))
def test_state_modified_differential(seed):
    """state:new / state:modified[.body/.configs] against a randomized old
    manifest (nodes absent / identical / body-edited / config-edited), incl.
    graph expansion (+state:modified) — vs a direct replay of the reference
    comparison semantics (selector_methods.py:610-700)."""
    rng = random.Random(_BASE + _OFF + 9000 + seed)
    man, edges, tags = _gen_world(rng)
    graph = Linker().link_graph(man)

    state, kinds = {}, {}
    for uid, node in man.nodes.items():
        r = rng.random()
        if r < 0.2:
            kinds[uid] = "new"          # absent from old manifest
            continue
        if r < 0.45:
            kinds[uid] = "body"
            state[uid] = _state_entry(node, True, False)
        elif r < 0.65:
            kinds[uid] = "config"
            state[uid] = _state_entry(node, False, True)
        else:
            kinds[uid] = "same"
            state[uid] = _state_entry(node, False, False)

    def expect(value):
        out = set()
        for uid, kind in kinds.items():
            if value == "new":
                hit = kind == "new"
            elif value == "modified":
                hit = kind != "same"
            elif value == "modified.body":
                hit = kind in ("new", "body")
            else:  # modified.configs
                hit = kind in ("new", "config")
            if hit:
                out.add(uid)
        return out

    for value in ("new", "modified", "modified.body", "modified.configs"):
        got = select_nodes(man, graph, select=[f"state:{value}"],
                           state=dict(state))
        assert got == expect(value), f"seed={seed} state:{value}"

    # graph expansion composes: children of modified nodes
    got = select_nodes(man, graph, select=["state:modified+"],
                       state=dict(state))
    want = set(expect("modified"))
    for uid in expect("modified"):
        want |= _descendants(edges, uid)
    assert got == want, f"seed={seed} state:modified+"
