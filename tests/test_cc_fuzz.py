"""Differential fuzzing for connected components (functions/dedup.py).

REPLAY family #13: random undirected graphs (plus diameter-adversarial
paths, bridged stars, self-loops, duplicate edges) through BOTH engine
implementations — min-label propagation (`connected_components`) and the
Kiveris 2014 alternating large-star/small-star (`connected_components_star`,
the O(log n)-round scale path) — vs a pure-python union-find oracle.
Family base 240k rotated by DBT_SPARK_FUZZ_OFFSET.
"""

from __future__ import annotations

import os
import random

import pytest

from dbt_spark.functions.dedup import (
    connected_components,
    connected_components_star,
)

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 240_000


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Oracle: union-find; component label = min vertex id."""
    real = [e for e in edges if e[0] != e[1]]
    nodes = sorted(set(v for e in real for v in e))
    parent = {x: x for x in nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in real:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups: dict[int, list[int]] = {}
    for x in nodes:
        groups.setdefault(find(x), []).append(x)
    comp = {}
    for xs in groups.values():
        m = min(xs)
        for x in xs:
            comp[x] = m
    return comp


def _run(spark, algo, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["id"]: r["component"] for r in algo(df).collect()}


def _gen_edges(rng: random.Random) -> list[tuple[int, int]]:
    n = rng.randrange(6, 50)
    m = rng.randrange(3, 2 * n)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    if rng.random() < 0.4:  # splice in a path segment (diameter pressure)
        base = rng.randrange(100, 200)
        edges += [(base + i, base + i + 1) for i in range(rng.randrange(5, 25))]
    if rng.random() < 0.3:  # duplicate + reversed edges
        edges += [(b, a) for a, b in rng.sample(edges, min(3, len(edges)))]
    return edges


@pytest.mark.parametrize("seed", [_BASE + _OFF + i for i in range(8)])
def test_cc_star_fuzz(spark, seed):
    rng = random.Random(seed)
    edges = _gen_edges(rng)
    want = _uf_components(edges)
    got = _run(spark, connected_components_star, edges)
    assert got == want, {k: (got.get(k), want.get(k))
                         for k in set(got) | set(want)
                         if got.get(k) != want.get(k)}


@pytest.mark.parametrize("seed", [_BASE + _OFF + 100 + i for i in range(3)])
def test_cc_propagation_fuzz(seed, spark):
    rng = random.Random(seed)
    edges = _gen_edges(rng)
    want = _uf_components(edges)
    got = _run(spark, connected_components, edges)
    # propagation's vertex set comes from edge endpoints incl. self-loops
    got = {k: v for k, v in got.items() if k in want}
    assert got == want


def test_cc_star_long_path_beats_diameter(spark):
    """A 64-node path converges in O(log n) alternations (the max_iter=20
    default would be exceeded by diameter-bound propagation at this size —
    the reason the star variant is the 100 TB default for chain-heavy
    duplicate graphs)."""
    edges = [(i, i + 1) for i in range(64)]
    got = _run(spark, connected_components_star, edges)
    assert got == {i: 0 for i in range(65)}


def test_cc_star_structure_cases(spark):
    # bridged stars + isolated pair
    edges = (
        [(0, i) for i in range(1, 15)]
        + [(100, 100 + i) for i in range(1, 15)]
        + [(14, 114), (200, 201)]
    )
    got = _run(spark, connected_components_star, edges)
    want = _uf_components(edges)
    assert got == want
    # self-loops only contribute no vertices; duplicates collapse
    got2 = _run(spark, connected_components_star, [(5, 5), (1, 2), (2, 1)])
    assert got2 == {1: 1, 2: 1}
