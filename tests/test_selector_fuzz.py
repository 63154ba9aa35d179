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
