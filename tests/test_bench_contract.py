"""Bench stdout contract (VERDICT r13 directive #7).

The round driver captures only the last 2,000 chars of bench.py's stdout
and parses the final JSON line; rounds 9-12 lost their round-over-round
perf comparison because the line outgrew the capture. Guard the contract
against registry growth: with every current HEADLINE key at worst-case
numeric width, the compact line must stay under 1,950 chars and
round-trip as JSON.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _build(times: dict[str, float]) -> str:
    return bench.compact_line(
        total=round(sum(times.values()), 3),
        reps=3,
        times=times,
        sf=0.1,
        parse2k={"cold_sec": 143.999, "warm_partial_sec": 99.999},
        run2k={"run_sec": 999.999},
    )


def test_compact_line_fits_driver_capture_at_worst_case_widths():
    # every headline entry at maximal realistic width (xxx.xxx)
    times = {k: 999.999 for k in bench.HEADLINE}
    line = _build(times)
    assert len(line) <= 1950, f"compact line {len(line)} chars"
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_query_wall_sec"
    assert parsed["sf"] == 0.1 and parsed["run2k"] == 999.999


def test_compact_line_truncates_rather_than_overflow():
    # simulate a registry far past the cap: the line must self-truncate to
    # the slowest 40 queries and still parse
    times = {f"q_{i:03d}_{'x' * 20}": 999.999 for i in range(200)}
    line = _build(times)
    assert len(line) <= 1950
    parsed = json.loads(line)
    assert len(parsed["queries"]) == 40


def test_headline_set_unchanged_from_round_1():
    # the driver compares `value` across rounds: the headline set
    # must never shrink or rename (adding keys would also skew the total)
    assert len(bench.HEADLINE) == 47
    assert bench.HEADLINE[0] == "pricing_summary"
    assert bench.HEADLINE[-1] == "ann_topk_bruteforce"
