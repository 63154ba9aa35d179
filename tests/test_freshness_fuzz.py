"""Differential fuzzing for source freshness (sources/freshness.py).

REPLAY family #16: random source tables (timestamps, a partition column)
× random freshness specs (warn_after/error_after present/absent at mixed
periods, `filter` predicates incl. filter-to-empty, loaded_at_field vs
custom loaded_at_query) × random `now` offsets — the REAL engine path
(YAML sources parsed by the project loader, check_freshness over a
registered parquet location) vs a pure-pandas replay of the reference
semantics (core/dbt/task/freshness.py:111-181: field path applies the
filter; thresholds v1/components.py:117-145; empty/NULL max = runtime
error). Family base 280k rotated by DBT_SPARK_FUZZ_OFFSET.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import pytest

from dbt_spark.operators.materialize import ExecutionContext
from dbt_spark.runner import Engine
from dbt_spark.sources.freshness import check_freshness

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 280_000

PERIODS = {"minute": 60, "hour": 3600, "day": 86400}
BASE_TS = datetime(2026, 3, 1, 12, 0, 0)


def _gen_case(rng: random.Random) -> dict:
    rows = [
        (
            BASE_TS + timedelta(minutes=rng.randrange(-50_000, 0)),
            rng.choice(["a", "b"]),
            rng.randrange(100),
        )
        for _ in range(rng.randrange(3, 30))
    ]
    spec = {}
    for key in ("warn_after", "error_after"):
        if rng.random() < 0.75:
            spec[key] = {
                "count": rng.randrange(1, 40),
                "period": rng.choice(list(PERIODS)),
            }
    filt = rng.choice([None, None, "part = 'a'", "v >= 50", "v >= 1000"])
    use_query = rng.random() < 0.25
    now = BASE_TS + timedelta(minutes=rng.randrange(0, 60_000))
    return {"rows": rows, "spec": spec, "filter": filt,
            "use_query": use_query, "now": now}


def _replay(case: dict) -> tuple:
    """Pure-python reference semantics."""
    rows = case["rows"]
    if case["filter"] and not case["use_query"]:
        if case["filter"] == "part = 'a'":
            rows = [r for r in rows if r[1] == "a"]
        elif case["filter"] == "v >= 50":
            rows = [r for r in rows if r[2] >= 50]
        elif case["filter"] == "v >= 1000":
            rows = [r for r in rows if r[2] >= 1000]
    if not rows:
        return (None, "runtime error")
    mx = max(r[0] for r in rows)
    age = (case["now"] - mx).total_seconds()
    spec = case["spec"]
    err = spec.get("error_after")
    warn = spec.get("warn_after")
    if err and age > err["count"] * PERIODS[err["period"]]:
        status = "error"
    elif warn and age > warn["count"] * PERIODS[warn["period"]]:
        status = "warn"
    else:
        status = "pass"
    return (mx, status)


def _yaml_spec(spec: dict, filt, use_query: bool, loc: str) -> str:
    fr = ""
    if spec or filt:
        fr = "        freshness:\n"
        for key in ("warn_after", "error_after"):
            if key in spec:
                fr += (f"          {key}: {{count: {spec[key]['count']}, "
                       f"period: {spec[key]['period']}}}\n")
        if filt and not use_query:
            fr += f"          filter: \"{filt}\"\n"
    loaded = (
        "        loaded_at_query: \"select max(ts) from {{ this }}\"\n"
        if use_query else "        loaded_at_field: ts\n"
    )
    return (
        "sources:\n"
        "  - name: fz\n"
        "    tables:\n"
        "      - name: t\n"
        + loaded + fr +
        f"        meta: {{location: \"{loc}\"}}\n"
    )


@pytest.mark.parametrize("seed", [_BASE + _OFF + i for i in range(10)])
def test_freshness_matches_replay(seed, spark, project_dir, tmp_path):
    rng = random.Random(seed)
    case = _gen_case(rng)
    loc = str(tmp_path / "src_t.parquet")
    spark.createDataFrame(
        case["rows"], "ts timestamp, part string, v long"
    ).write.mode("overwrite").parquet(loc)
    root = project_dir({
        "dbt_project.yml": "name: fzfresh\n",
        "models/sources.yml": _yaml_spec(
            case["spec"], case["filter"], case["use_query"], loc),
    })
    eng = Engine(root, spark=spark)
    manifest = eng.parse()
    node = manifest.sources["source.fzfresh.fz.t"]
    ctx = ExecutionContext(
        spark=spark, store=eng.store, manifest=manifest, project=eng.project)
    res = check_freshness(ctx, node, now=case["now"])
    want_mx, want_status = _replay(case)
    assert res.status == want_status, (
        seed, case["spec"], case["filter"], case["use_query"],
        res.status, want_status, res.age_seconds)
    if want_mx is not None:
        assert res.max_loaded_at == want_mx, (seed, res.max_loaded_at, want_mx)
