"""Differential fuzzing for the GraphQueue scheduler.

Random DAGs drained by a randomized multi-worker simulation (workers pull,
hold work for random interleavings, randomly fail nodes) with legality
invariants checked against an independent edge list:

- a node is handed out only after ALL its parents completed successfully
- every node is handed out exactly once
- after a failure, none of its transitive descendants is ever handed out
- the drain terminates with handed-out ∪ failed-skipped == selected set

Spark-free; family base 210k rotated by DBT_SPARK_FUZZ_OFFSET.
"""

from __future__ import annotations

import os
import random

import networkx as nx
import pytest

from dbt_spark.plans.graph import GraphQueue

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 210_000

N = 14


def _gen_graph(rng):
    g = nx.DiGraph()
    edges = []
    for i in range(N):
        g.add_node(f"n{i}")
        for j in range(i):
            if rng.random() < 0.2:
                g.add_edge(f"n{j}", f"n{i}")
                edges.append((f"n{j}", f"n{i}"))
    return g, edges


def _ancestors(edges, uid):
    parents: dict[str, set] = {}
    for a, b in edges:
        parents.setdefault(b, set()).add(a)
    out, frontier = set(), {uid}
    while frontier:
        frontier = set().union(*(parents.get(n, set()) for n in frontier)) - out
        out |= frontier
    return out


def _descendants(edges, uid):
    kids: dict[str, set] = {}
    for a, b in edges:
        kids.setdefault(a, set()).add(b)
    out, frontier = set(), {uid}
    while frontier:
        frontier = set().union(*(kids.get(n, set()) for n in frontier)) - out
        out |= frontier
    return out


@pytest.mark.parametrize("seed", range(30))
def test_graph_queue_legality(seed):
    rng = random.Random(_BASE + _OFF + seed)
    g, edges = _gen_graph(rng)
    selected = set(g.nodes)
    q = GraphQueue(g, selected)

    in_flight: list[str] = []
    handed: list[str] = []
    completed: set[str] = set()
    failed: set[str] = set()
    skipped: set[str] = set()

    while not q.empty() or in_flight:
        # randomly: pull more work (if any) or finish something in flight
        node = q.get() if rng.random() < 0.7 or not in_flight else None
        if node is not None:
            # invariant: parents all completed successfully, never failed
            direct_parents = {a for a, b in edges if b == node}
            assert direct_parents <= completed, (
                f"seed={seed}: {node} handed out before parents "
                f"{direct_parents - completed}")
            assert node not in handed, f"seed={seed}: {node} handed twice"
            assert not (_ancestors(edges, node) & failed), (
                f"seed={seed}: {node} handed out under a failed ancestor")
            handed.append(node)
            in_flight.append(node)
            continue
        if not in_flight:
            break
        idx = rng.randrange(len(in_flight))
        node = in_flight.pop(idx)
        if rng.random() < 0.15:
            failed.add(node)
            skipped |= q.mark_failed(node)
        else:
            completed.add(node)
            q.mark_done(node)

    # every selected node either ran (handed) or was skipped under a failure
    assert set(handed) | skipped == selected, (
        f"seed={seed}: unaccounted nodes "
        f"{selected - set(handed) - skipped}")
    # nothing skipped was ever handed out, and skips are exactly the
    # failure-descendant closure (descendants can never start before their
    # failed ancestor completed, so the sets are disjoint by construction)
    assert not (skipped & set(handed)), f"seed={seed}"
    want_skipped = set()
    for f in failed:
        want_skipped |= _descendants(edges, f)
    assert skipped == want_skipped, (
        f"seed={seed}: skipped={skipped} want={want_skipped}")
