"""Fuzz family for the deps resolver (plans/deps.py) — seed block 320k.

Three layers, no Spark:

1. SemVer total-order properties + the pinned semver.org §11 chain
   (prereleases sort before release; dotted prerelease ids compare
   numerically when numeric).
2. Range-clause differential: _match_one vs an independent evaluator
   that maps every operator onto the ordering key.
3. resolve_registry invariants over random on-disk registry mirrors
   with transitive (DAG) package requirements: consistency (every
   chosen version satisfies every accumulated spec), maximality (no
   higher stable-preferred version also satisfies), completeness
   (every transitively required package installed), determinism, and
   conflict worlds raising DepsError.
"""

from __future__ import annotations

import itertools
import os
import random

import pytest
import yaml

from dbt_spark.plans.deps import (
    DepsError,
    SemVer,
    resolve_registry,
    satisfies,
)

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 320_000


# --------------------------------------------------------------- ordering

SEMVER_ORG_CHAIN = [
    "1.0.0-alpha", "1.0.0-alpha.1", "1.0.0-alpha.beta", "1.0.0-beta",
    "1.0.0-beta.2", "1.0.0-beta.11", "1.0.0-rc.1", "1.0.0",
]


def test_semver_org_rule11_chain():
    parsed = [SemVer.parse(s) for s in SEMVER_ORG_CHAIN]
    for a, b in zip(parsed, parsed[1:]):
        assert a < b, f"{a} !< {b}"


def _rand_ver(rng: random.Random) -> SemVer:
    pre = None
    if rng.random() < 0.4:
        pre = ".".join(
            rng.choice(["alpha", "beta", "rc", str(rng.randint(0, 12))])
            for _ in range(rng.randint(1, 2))
        )
    return SemVer(rng.randint(0, 3), rng.randint(0, 4), rng.randint(0, 4), pre)


@pytest.mark.parametrize("seed", [_BASE + _OFF + i for i in range(4)])
def test_semver_total_order_properties(seed):
    rng = random.Random(seed)
    vs = [_rand_ver(rng) for _ in range(12)]
    for a, b, c in itertools.product(vs, repeat=3):
        # antisymmetry via the key; transitivity
        if a < b and b < c:
            assert a < c
        assert not (a < b and b < a)
    # round-trip: str -> parse preserves order
    for a, b in itertools.combinations(vs, 2):
        a2, b2 = SemVer.parse(str(a)), SemVer.parse(str(b))
        assert (a < b) == (a2 < b2)


# ----------------------------------------------------------- clause algebra

def _indep_match(cand: SemVer, clause: str) -> bool:
    """Independent range evaluation: resolve each operator through sorted
    position among {candidate, bound} rather than operator branching."""
    clause = clause.strip()
    for op in (">=", "<=", "==", "~>", ">", "<", "="):
        if clause.startswith(op):
            bound = SemVer.parse(clause[len(op):])
            break
    else:
        op, bound = "==", SemVer.parse(clause)
    lt, gt = cand < bound, bound < cand
    eq = not lt and not gt
    if op in ("==", "="):
        return eq
    if op == ">=":
        return eq or gt
    if op == "<=":
        return eq or lt
    if op == ">":
        return gt
    if op == "<":
        return lt
    # pessimistic ~>: same major, minor floor, any higher patch/pre-release
    upper = SemVer(bound.major, bound.minor + 1, 0)
    return (eq or gt) and cand < upper


@pytest.mark.parametrize("seed", [_BASE + _OFF + 100 + i for i in range(6)])
def test_clause_differential(seed):
    rng = random.Random(seed)
    for _ in range(300):
        cand = _rand_ver(rng)
        op = rng.choice([">=", "<=", "==", ">", "<", "=", "~>", ""])
        bound = _rand_ver(rng)
        clause = f"{op}{bound}"
        assert satisfies(cand, [clause]) == _indep_match(cand, clause), (
            f"cand={cand} clause={clause!r}"
        )


# -------------------------------------------------------- resolver worlds

def _write_world(tmp_path, rng: random.Random):
    """Random DAG package universe on disk; returns (mirror_root, root_reqs,
    universe) where universe[pkg] = {version_str: [dep_specs]}."""
    npkg = rng.randint(2, 4)
    names = [f"org/p{i}" for i in range(npkg)]
    universe: dict[str, dict[str, list[tuple[str, str]]]] = {}
    mirror = tmp_path / "mirror"
    for i, name in enumerate(names):
        nver = rng.randint(2, 5)
        vers = sorted({f"{rng.randint(0,2)}.{rng.randint(0,4)}.{rng.randint(0,4)}"
                       for _ in range(nver)})
        universe[name] = {}
        for v in vers:
            deps = []
            # DAG: only depend on later-indexed packages
            for j in range(i + 1, npkg):
                if rng.random() < 0.4:
                    dep = names[j]
                    spec = rng.choice([
                        f">={rng.randint(0,1)}.{rng.randint(0,3)}.0",
                        f"<{rng.randint(1,3)}.0.0",
                        f"~>{rng.randint(0,2)}.{rng.randint(0,3)}.0",
                    ])
                    deps.append((dep, spec))
            universe[name][v] = deps
            d = mirror / name / v
            d.mkdir(parents=True)
            (d / "dbt_project.yml").write_text(f"name: {name.split('/')[1]}\n")
            if deps:
                (d / "packages.yml").write_text(yaml.safe_dump({
                    "packages": [{"package": p, "version": [s]}
                                 for p, s in deps]}))
    root_reqs = []
    for name in names[: rng.randint(1, npkg)]:
        if rng.random() < 0.6:
            root_reqs.append({"package": name})
        else:
            root_reqs.append({"package": name,
                              "version": [f">=0.0.0"]})
    return str(mirror), root_reqs, universe


@pytest.mark.parametrize("seed", [_BASE + _OFF + 200 + i for i in range(10)])
def test_resolver_invariants(seed, tmp_path):
    rng = random.Random(seed)
    mirror, root_reqs, universe = _write_world(tmp_path, rng)
    install = tmp_path / "install"
    try:
        got = resolve_registry(root_reqs, mirror, str(install))
    except DepsError:
        return  # conflict worlds are legal; the error path is exercised
    chosen = {p: v for p, v, _ in got}
    # accumulated specs per package: root + every CHOSEN requester version
    specs: dict[str, list[str]] = {}
    for r in root_reqs:
        specs.setdefault(r["package"], []).extend(r.get("version") or [])
    for p, v in chosen.items():
        for dep, spec in universe[p][v]:
            specs.setdefault(dep, []).append(spec)
    # completeness: everything required is installed
    assert set(specs) <= set(chosen), (specs, chosen)
    for p, v in chosen.items():
        req = specs.get(p, [])
        assert satisfies(SemVer.parse(v), req), (p, v, req)
        # maximality among stable versions satisfying the same specs
        better = [w for w in universe[p]
                  if satisfies(SemVer.parse(w), req)
                  and SemVer.parse(v) < SemVer.parse(w)]
        assert not better, (p, v, better, req)
    # determinism
    install2 = tmp_path / "install2"
    got2 = resolve_registry(root_reqs, mirror, str(install2))
    assert {(p, v) for p, v, _ in got2} == {(p, v) for p, v, _ in got}


def test_resolver_conflict_raises(tmp_path):
    mirror = tmp_path / "mirror"
    d = mirror / "org" / "p0" / "1.0.0"
    d.mkdir(parents=True)
    (d / "dbt_project.yml").write_text("name: p0\n")
    with pytest.raises(DepsError, match="conflict|satisfies"):
        resolve_registry(
            [{"package": "org/p0", "version": [">=2.0.0"]}],
            str(mirror), str(tmp_path / "install"))
