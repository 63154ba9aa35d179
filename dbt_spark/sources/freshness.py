"""Source freshness: age of max(loaded_at_field) vs warn/error thresholds.

Reference: core/dbt/task/freshness.py:111-181 (loaded_at_field path :134-141;
file-metadata fallback :142-160), thresholds v1/components.py:117-145.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Optional

from pyspark.sql import functions as F

from dbt_spark.plans.manifest import ManifestNode

PERIOD_SECONDS = {"minute": 60, "hour": 3600, "day": 86400}


@dataclass
class FreshnessResult:
    unique_id: str
    max_loaded_at: Optional[datetime]
    age_seconds: float
    status: str  # pass|warn|error|runtime error


def _threshold_seconds(spec: Optional[dict]) -> Optional[float]:
    """Seconds for a {count, period} threshold, or None for no threshold.

    A spec missing ``count`` or ``period`` is NO threshold rather than an
    error: the reference's Time.exceeded returns False when either is None
    (core/dbt/artifacts/resources/v1/components.py:117-129; validation
    deliberately loosened for previously-wrong-but-harmless configs,
    .changes/unreleased/Fixes-20250128-135509.yaml). An unknown period
    string still raises — that shape never parsed in any version.
    """
    if not spec or not isinstance(spec, dict):
        return None
    count, period = spec.get("count"), spec.get("period")
    if count is None or period is None:
        return None
    return count * PERIOD_SECONDS[period]


def check_freshness(ctx, node: ManifestNode, now: Optional[datetime] = None) -> FreshnessResult:
    now = now or datetime.now(timezone.utc).replace(tzinfo=None)
    freshness = node.freshness or {}
    if node.loaded_at_query:
        # custom freshness SQL, highest precedence (task/freshness.py:119-133);
        # the query may reference the source's own columns — run it against a
        # temp view registered over the source location
        ident = ctx.resolve_source(node)
        sql = node.loaded_at_query.replace("{{ this }}", ident).replace(
            "{{this}}", ident
        )
        row = ctx.spark.sql(sql).collect()
        if not row or len(row[0]) != 1:
            return FreshnessResult(node.unique_id, None, float("inf"), "runtime error")
        max_loaded_at = row[0][0]
    elif node.loaded_at_field:
        df = ctx.source_df(node)
        # freshness `filter` bounds the scanned slice (reference passes it
        # into calculate_freshness, task/freshness.py:136-140; threshold
        # field v1/components.py:136) — predicate pushdown makes this the
        # partition-pruning knob for huge sources
        if freshness.get("filter"):
            df = df.filter(F.expr(freshness["filter"]))
        row = df.agg(F.max(F.col(node.loaded_at_field)).alias("m")).collect()[0]
        max_loaded_at = row["m"]
    else:
        # a filter cannot apply to a metadata (mtime) check — reference
        # fires a WARN note and proceeds (task/freshness.py:144-150)
        if freshness.get("filter") and getattr(ctx, "events", None) is not None:
            ctx.events.warn_or_error(
                "FreshnessFilterIgnored", warn_error=False,
                msg=(f"A filter cannot be applied to a metadata freshness "
                     f"check on source '{node.name}'."),
            )
        # metadata fallback: file mtime of the source location
        location = node.config.meta.get("location")
        mtime = max(
            (os.path.getmtime(os.path.join(dp, f)) for dp, _, fs in os.walk(location)
             for f in fs),
            default=os.path.getmtime(location),
        ) if os.path.isdir(location) else os.path.getmtime(location)
        max_loaded_at = datetime.fromtimestamp(mtime, tz=timezone.utc).replace(tzinfo=None)
    if max_loaded_at is None:
        return FreshnessResult(node.unique_id, None, float("inf"), "runtime error")
    age = (now - max_loaded_at).total_seconds()
    warn_after = _threshold_seconds(freshness.get("warn_after"))
    error_after = _threshold_seconds(freshness.get("error_after"))
    if error_after is not None and age > error_after:
        status = "error"
    elif warn_after is not None and age > warn_after:
        status = "warn"
    else:
        status = "pass"
    return FreshnessResult(node.unique_id, max_loaded_at, age, status)
