"""Differential fuzzing for the dbt unit-test machinery (operators/unit.py).

REPLAY family #17: random single-model transforms (filter + group-by
aggregate over a ref'd input) × random dict fixtures through the REAL
engine unit-test runner, in BOTH directions:

- the expected rows computed by an independent pandas replay → the unit
  test must PASS;
- one expected cell perturbed (value nudged / row dropped / row added) →
  the unit test must FAIL (the fixture-diff must not silently accept
  wrong expectations — the direction a buggy multiset diff gets wrong).

Family base 290k rotated by DBT_SPARK_FUZZ_OFFSET.
"""

from __future__ import annotations

import os
import random

import pytest

from dbt_spark.runner import Engine

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 290_000


def _gen_world(rng: random.Random):
    rows = [
        {"k": rng.randrange(3), "v": rng.randrange(-20, 100)}
        for _ in range(rng.randrange(2, 12))
    ]
    lo = rng.randrange(-10, 40)
    agg = rng.choice(["sum", "count", "min", "max"])
    model_sql = (
        "select k, {agg_expr} as s from {{{{ ref('base') }}}} "
        "where v >= {lo} group by k"
    ).format(agg_expr={"sum": "sum(v)", "count": "count(*)",
                       "min": "min(v)", "max": "max(v)"}[agg], lo=lo)
    kept = [r for r in rows if r["v"] >= lo]
    groups: dict[int, list[int]] = {}
    for r in kept:
        groups.setdefault(r["k"], []).append(r["v"])
    fn = {"sum": sum, "count": len, "min": min, "max": max}[agg]
    expect = [{"k": k, "s": fn(vs)} for k, vs in sorted(groups.items())]
    return rows, model_sql, expect


def _perturb(rng: random.Random, expect: list[dict]) -> list[dict]:
    out = [dict(r) for r in expect]
    if not out or rng.random() < 0.3:
        out.append({"k": 97, "s": 1})  # extra unexpected row
    elif rng.random() < 0.5:
        out[rng.randrange(len(out))]["s"] += rng.choice([-3, 1, 7])
    else:
        out.pop(rng.randrange(len(out)))
    return out


def _yaml_rows(rows: list[dict]) -> str:
    if not rows:
        return "          []\n"
    return "".join(
        "          - {" + ", ".join(f"{k}: {v}" for k, v in r.items()) + "}\n"
        for r in rows
    )


@pytest.mark.parametrize("seed", [_BASE + _OFF + i for i in range(8)])
def test_unit_test_fixture_diff_fuzz(seed, spark, project_dir):
    rng = random.Random(seed)
    rows, model_sql, expect = _gen_world(rng)
    wrong = _perturb(rng, expect)
    files = {
        "dbt_project.yml": "name: utf\n",
        "models/base.sql": "select 1 as k, 1 as v",  # replaced by fixture
        "models/m.sql": model_sql,
        "models/schema.yml": (
            "unit_tests:\n"
            "  - name: ut_ok\n"
            "    model: m\n"
            "    given:\n"
            "      - input: ref('base')\n"
            "        rows:\n" + _yaml_rows(rows) +
            "    expect:\n"
            "      rows:\n" + _yaml_rows(expect) +
            "  - name: ut_bad\n"
            "    model: m\n"
            "    given:\n"
            "      - input: ref('base')\n"
            "        rows:\n" + _yaml_rows(rows) +
            "    expect:\n"
            "      rows:\n" + _yaml_rows(wrong)
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    r_ok = eng.invoke(["test", "--select", "ut_ok"])
    assert r_ok.success and r_ok.results[0].status == "pass", (
        seed, model_sql, rows, expect, r_ok.results[0].message)
    r_bad = eng.invoke(["test", "--select", "ut_bad"])
    assert not r_bad.success and r_bad.results[0].status == "fail", (
        seed, model_sql, rows, expect, wrong)
