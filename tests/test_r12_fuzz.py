"""Round-12 differential fuzz families.

1. chunk_text knob: random content (empty / shorter-than-window /
   straddling lengths, random window/stride) through the REAL
   materializer vs a pure-python sliding-window replay.
2. split_dml_statements: random statement lists with adversarial
   literals/comments re-joined by ';' must round-trip through the
   quote-aware splitter.
3. filter_funnel_report gate semantics: adversarial docs (empty text,
   symbol floods, exact duplicates, eval-id collisions) vs a
   pure-python replay of the gate cascade.

Same discipline as tests/test_differential_fuzz.py: fixed seeds, family
base rotated by DBT_SPARK_FUZZ_OFFSET. Family base 360k.
"""

from __future__ import annotations

import os
import random

import pytest

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 360_000


# ---- 1. chunk_text knob vs python replay -------------------------------

def _py_chunks(body: str, w: int, s: int) -> list[tuple[int, int, str]]:
    if len(body) < 1:
        return []
    out = []
    idx = 0
    start = 0
    while start <= len(body) - 1:
        out.append((idx, start, body[start:start + w]))
        idx += 1
        start += s
    return out


@pytest.mark.parametrize("seed", range(8))
def test_chunk_text_knob_differential(project_dir, spark, seed):
    from dbt_spark.runner import Engine

    rng = random.Random(_BASE + _OFF + seed)
    w = rng.randrange(3, 20)
    s = rng.randrange(1, w + 1)
    alphabet = "abcdef gh"
    rows = []
    for i in range(rng.randrange(3, 9)):
        n = rng.choice([0, 1, rng.randrange(2, 3 * w)])
        rows.append((i, "".join(rng.choice(alphabet) for _ in range(n))))
    values = ", ".join(
        "({}, '{}')".format(i, b.replace("'", "")) for i, b in rows)
    files = {
        "dbt_project.yml": f"name: ckf{seed}\n",
        "models/chunked.sql": (
            "{{ config(materialized='table', "
            f"chunk_text={{'content': 'body', 'window': {w}, "
            f"'stride': {s}}}) }}}}"
            f"select * from (values {values}) as t(id, body)"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    got = sorted(
        (x["id"], x["chunk_idx"], x["chunk_start"], x["body"])
        for x in eng.store.read("main", "chunked").collect())
    want = sorted(
        (i, idx, start, piece)
        for i, b in rows
        for idx, start, piece in _py_chunks(b.replace("'", ""), w, s))
    assert got == want, f"seed={seed} w={w} s={s}"


# ---- 2. split_dml_statements round-trip --------------------------------

_FRAGS = [
    "select 1", "insert into t values (1)", "x = 'a;b'",
    "y = 'it''s'", 'z = "q;q"', "n = `c;1`", "-- c;mt\n cont",
    "/* b;lock */ v", r"esc = 'a\';b'", "plain words",
]


@pytest.mark.parametrize("seed", range(10))
def test_split_dml_roundtrip_fuzz(seed):
    from dbt_spark.operators.incremental import split_dml_statements

    rng = random.Random(_BASE + _OFF + 1000 + seed)
    stmts = []
    for _ in range(rng.randrange(1, 6)):
        parts = [rng.choice(_FRAGS) for _ in range(rng.randrange(1, 4))]
        stmt = " ".join(parts)
        # a '--' comment swallows the rest of the LINE: keep fragments
        # after a line comment only if a newline already terminated it
        stmts.append(stmt)
    joined = ";".join(stmts) + (";" if rng.random() < 0.5 else "")
    got = split_dml_statements(joined)
    want = [s.strip() for s in stmts if s.strip()]
    # a trailing line-comment without newline swallows the following ';'
    # making two statements one — detect and merge in the expectation
    merged: list[str] = []
    for s in want:
        prev_open = False
        if merged:
            p = merged[-1]
            # open line comment: '--' after the last newline
            tail = p.rsplit("\n", 1)[-1]
            prev_open = "--" in _strip_quoted(tail)
        if prev_open:
            merged[-1] = merged[-1] + ";" + s
        else:
            merged.append(s)
    assert got == merged, f"seed={seed} joined={joined!r}"


def _strip_quoted(s: str) -> str:
    """Remove quoted spans so '--' detection ignores quoted dashes."""
    out = []
    mode = None
    i = 0
    while i < len(s):
        ch = s[i]
        if mode is None:
            if ch in ("'", '"', "`"):
                mode = ch
            else:
                out.append(ch)
        elif ch == "\\":
            i += 1
        elif ch == mode:
            mode = None
        i += 1
    return "".join(out)


# ---- 3. funnel gate cascade vs python replay ---------------------------

def _py_funnel_depth(doc_id: int, text: str, first_ids: dict) -> int:
    import re

    toks = re.split(r"\s+", text.strip()) if True else []
    n_tokens = len(toks)
    token_chars = sum(len(t) for t in toks)
    n_chars = len(text)
    n_symbols = sum(text.count(c) for c in ".,!?;:#{}[]|")
    stop = {"the", "a", "an", "and", "of", "to", "in", "is", "it", "for"}
    stop_hits = sum(
        1 for t in re.split(r"\s+", text.strip().lower()) if t in stop)
    gates = [
        20 <= n_tokens <= 100000,
        (n_tokens > 0 and 3.0 <= token_chars / n_tokens <= 10.0),
        stop_hits >= 2,
        (n_chars > 0 and n_symbols / n_chars <= 0.1),
        first_ids.get(text) == doc_id,
        doc_id % 97 != 0,
    ]
    depth = 0
    for g in gates:
        if not g:
            break
        depth += 1
    return depth


@pytest.mark.parametrize("seed", range(6))
def test_funnel_gate_cascade_differential(spark, seed):
    """Adversarial docs through the REAL funnel plan vs the python gate
    replay — per-(lang, stage) n_in/n_out must match exactly."""
    from collections import defaultdict

    from dbt_spark.queries import hygiene as H

    rng = random.Random(_BASE + _OFF + 2000 + seed)
    stopish = ["the", "and", "for", "it"]
    fillers = ["alpha", "beta", "gamma", "xx", "longwordtoken", "zz"]
    docs = []
    for i in range(rng.randrange(20, 40)):
        kind = rng.randrange(6)
        if kind == 0:
            text = ""                      # empty
        elif kind == 1:
            text = "a b"                   # too short
        elif kind == 2:                    # symbol flood
            text = " ".join(["#{}[]|" for _ in range(30)])
        elif kind == 3 and docs:           # exact duplicate of a prior doc
            text = rng.choice(docs)[1]
        else:
            n = rng.randrange(20, 60)
            words = [rng.choice(stopish if rng.random() < 0.3 else fillers)
                     for _ in range(n)]
            text = " ".join(words)
        docs.append((i, text))
    lang = "xx"
    first_ids: dict = {}
    for i, t in docs:
        first_ids.setdefault(t, i)
    want = defaultdict(lambda: [0, 0])  # stage -> [n_in, n_out]
    for i, t in docs:
        d = _py_funnel_depth(i, t, first_ids)
        for stage in range(1, 7):
            if d >= stage - 1:
                want[stage][0] += 1
            if d >= stage:
                want[stage][1] += 1
    import pandas as pd

    pdf = pd.DataFrame(
        [{"doc_id": i, "lang": lang, "text": t} for i, t in docs])
    sdf = spark.createDataFrame(pdf)
    orig = H._docs
    H._docs = lambda _s, _d: sdf
    try:
        rows = H.filter_funnel_report(spark, "ignored").collect()
    finally:
        H._docs = orig
    got = {r["stage_idx"]: (r["n_in"], r["n_out"]) for r in rows}
    assert got == {k: tuple(v) for k, v in want.items()}, f"seed={seed}"
