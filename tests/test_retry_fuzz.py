"""Differential fuzzing for `dbt retry` semantics.

Random DAGs with a random failure set injected via var()-gated compiler
errors: the first `build` must mark the failing nodes error and their
transitive descendants skipped; after the failure clears, `retry` must
re-run EXACTLY the failed+skipped set (reference core/dbt/task/retry.py:
45-121 — retryable statuses error/fail/skipped, previous command and
selection replayed) and everything must succeed. The expected sets come
from an independent BFS replay.

Fixed seeds; family base 200k rotated by DBT_SPARK_FUZZ_OFFSET.
"""

from __future__ import annotations

import os
import random

import pytest

from dbt_spark.runner import Engine

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 200_000

N = 10


def _gen_world(rng):
    """(files, edges) — random model DAG; each model carries a var()-gated
    failure hook."""
    files = {"dbt_project.yml": "name: retryfuzz\n"}
    edges = []
    for i in range(N):
        parents = [j for j in range(i) if rng.random() < 0.25]
        refs = " ".join(f"{{{{ ref('m{j}') }}}}" for j in parents)
        edges.extend((f"m{j}", f"m{i}") for j in parents)
        files[f"models/m{i}.sql"] = (
            f"{{% if execute and var('fail_m{i}', false) %}}"
            f"{{{{ exceptions.raise_compiler_error('boom m{i}') }}}}"
            f"{{% endif %}}\n"
            f"select {i} as v\n-- deps: {refs}\n"
        )
    return files, edges


def _descendants(edges, seeds):
    kids: dict[str, set] = {}
    for a, b in edges:
        kids.setdefault(a, set()).add(b)
    out, frontier = set(), set(seeds)
    while frontier:
        frontier = set().union(*(kids.get(n, set()) for n in frontier)) - out
        out |= frontier
    return out


@pytest.mark.parametrize("seed", range(10))
def test_retry_reruns_exactly_failed_and_skipped(project_dir, spark, seed):
    rng = random.Random(_BASE + _OFF + seed)
    files, edges = _gen_world(rng)
    fail = sorted(rng.sample(range(N), rng.randrange(1, 4)))
    root = project_dir(files)

    eng = Engine(root, spark=spark,
                 vars={f"fail_m{i}": True for i in fail})
    r1 = eng.invoke(["build"])
    assert not r1.success
    st = {x.unique_id.split(".")[-1]: x.status for x in r1.results}
    injected = {f"m{i}" for i in fail}
    downstream = _descendants(edges, injected)
    # an injected failure downstream of ANOTHER failure never executes —
    # it reports skipped, not error
    want_failed = injected - downstream
    want_skipped = downstream
    got_failed = {n for n, s in st.items() if s in ("error", "fail")}
    got_skipped = {n for n, s in st.items() if s == "skipped"}
    assert got_failed == want_failed, f"seed={seed} {st}"
    assert got_skipped == want_skipped, f"seed={seed} {st}"
    assert all(s == "success" for n, s in st.items()
               if n not in want_failed | want_skipped), f"seed={seed} {st}"

    # failure clears; retry replays exactly the retryable set
    eng2 = Engine(root, spark=spark, vars={})
    r2 = eng2.invoke(["retry"])
    assert r2.success, [getattr(x, "message", None) for x in r2.results]
    reran = {x.unique_id.split(".")[-1] for x in r2.results}
    assert reran == want_failed | want_skipped, f"seed={seed} reran={reran}"
    assert all(x.status == "success" for x in r2.results), f"seed={seed}"
