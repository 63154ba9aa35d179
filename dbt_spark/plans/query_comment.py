"""query-comment rendering: warehouse-side audit attribution.

Reference: the `query-comment:` project config
(core/dbt/config/project.py:208 _query_comment_from_cfg) renders a
comment — by default a JSON header naming the app/version/target/node —
onto every statement the adapter executes
(core/dbt/context/query_header.py + adapters' MacroQueryStringSetter:
prepend `/* ... */\n` or, with `append: true`, a trailing comment).

Spark-first mapping: the same comment text is (a) attached to the
executed SQL — it survives into the Spark UI's SQL tab and any query-log
collector — and (b) set as the Spark job description
(`sparkContext.setJobDescription`), which is the Spark UI's first-class
attribution field (the `job-label` analog: BigQuery job labels there,
job descriptions here).
"""

from __future__ import annotations

import json
from types import SimpleNamespace
from typing import Any, Optional


def render_comment(project: Any, node: Any = None) -> Optional[str]:
    """Rendered comment text for one executed statement, or None when the
    project disables query comments. `comment: None` means dbt's default
    JSON header; a string template is jinja-rendered with a node-aware
    context (node/target/dbt_version/invocation_id/connection_name)."""
    cfg = getattr(project, "query_comment", None) or {}
    if not cfg.get("enabled", False):
        return None
    from dbt_spark.plans.compile import DBT_VERSION, _INVOCATION_ID

    template = cfg.get("comment")
    profile = getattr(project, "profile", {}) or {}
    if template is None:
        payload = {
            "app": "dbt",
            "dbt_version": DBT_VERSION,
            "profile_name": profile.get("profile_name") or project.name,
            "target_name": profile.get("target_name", "spark"),
        }
        if node is not None:
            payload["node_id"] = node.unique_id
        text = json.dumps(payload)
    else:
        import threading

        from dbt_spark.plans.compile import _ENV

        ctx = {
            "dbt_version": DBT_VERSION,
            "invocation_id": _INVOCATION_ID,
            "connection_name": threading.current_thread().name,
            "target": SimpleNamespace(
                name=profile.get("target_name", "spark"),
                schema=profile.get("schema", "main"),
                type="spark",
                profile_name=profile.get("profile_name") or project.name,
            ),
            "node": None if node is None else SimpleNamespace(
                unique_id=node.unique_id,
                name=node.name,
                package_name=node.package_name,
                resource_type=getattr(
                    node.resource_type, "value", str(node.resource_type)),
            ),
        }
        text = _ENV.from_string(template).render(**ctx)
    # a comment body must not terminate the block comment early
    return text.replace("*/", "* /").strip()


def attach_comment(sql: str, comment: Optional[str], append: bool = False) -> str:
    """`/* comment */\\n<sql>` (default) or `<sql>\\n/* comment */`
    (append: true) — MacroQueryStringSetter.add semantics."""
    if not comment:
        return sql
    if append:
        return f"{sql.rstrip().rstrip(';')}\n/* {comment} */"
    return f"/* {comment} */\n{sql}"


def job_description(project: Any, node: Any, comment: Optional[str]) -> str:
    """Spark UI attribution string: `dbt: <node_id>`, extended with the
    rendered comment under `job-label: true` (the BigQuery job-label
    analog)."""
    base = f"dbt: {node.unique_id}" if node is not None else "dbt"
    cfg = getattr(project, "query_comment", None) or {}
    if comment and cfg.get("job_label"):
        return f"{base} {comment}"
    return base
