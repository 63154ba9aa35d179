"""Custom ``{% materialization %}`` execution (the reference's #1
extension point).

Reference: a materialization is a Jinja macro that receives the model's
compiled SELECT, issues DDL/DML through ``{% call statement('main')
%}``, and returns ``{'relations': [...]}``
(core/dbt/task/run.py:305-334 ModelRunner.execute;
core/dbt/clients/jinja.py:212-260 materialization template semantics;
dispatch specificity core/dbt/contracts/graph/manifest.py:1005-1046).

Spark mapping: the context's relation objects carry a ``location``
under the engine warehouse, and the shipped ``create_table_as`` /
``create_view_as`` pack macros emit ``CREATE TABLE … USING PARQUET
LOCATION`` DDL — so the macro's own statements write the files exactly
where RelationStore tables live. After the macro returns, the engine
adopts those files as the node's relation (no copy) and drops the
transient session-catalog entry (external tables keep their files).

Supported context surface (the subset real custom materializations
use): model / sql / compiled_code / this / target / statement
call-blocks (with fetch_result -> load_result) / make_temp_relation /
run_hooks (inert: the engine runs hooks itself) / should_full_refresh /
config / adapter (RuntimeAdapter) / return(). ``adapter.
rename_relation`` is intentionally a named NotImplementedError: the
direct-create contract makes the stage-and-swap dance unnecessary here
(the store's overwrite is already atomic).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

from dbt_spark.catalog import Relation
from dbt_spark.operators.materialize import (
    ExecutionContext,
    compile_sql,
)
from dbt_spark.plans.manifest import ManifestNode, NodeType


class MatRelation:
    """Relation object handed to materialization macros: stringifies to
    the session-catalog identifier; carries the warehouse location the
    pack's create_table_as writes to."""

    def __init__(self, schema: str, name: str, location: str) -> None:
        self.schema = schema
        self.identifier = name
        self.name = name
        self.database = None
        self.location = location
        self.ident = f"{schema}__{name}"

    def include(self, **kwargs: Any) -> "MatRelation":
        return self

    def render(self) -> str:
        return self.ident

    def __str__(self) -> str:
        return self.ident

    def __repr__(self) -> str:
        return self.ident


def resolve_custom_materialization(
    manifest, mat: str, project_flags: Optional[dict] = None,
    builtin_names=(),
) -> Optional[str]:
    """Body of the winning {% materialization %} candidate for ``mat``,
    or None. Specificity: adapter ('spark') beats 'default'
    (manifest.py:1013-1018). Locality gate: a PACKAGE-defined
    materialization may not override a builtin name unless
    require_explicit_package_overrides_for_builtin_materializations is
    explicitly disabled (default True — manifest.py:1026-1044); the root
    project may always override."""
    candidates = manifest.materialization_macros.get(mat)
    if not candidates:
        return None
    picked = candidates.get("spark") or candidates.get("default")
    if picked is None:
        return None
    body, owner, is_root = picked
    if mat in builtin_names and not is_root:
        flags = project_flags or {}
        allow_legacy = (
            flags.get(
                "require_explicit_package_overrides_for_builtin_materializations",
                True,
            )
            is False
        )
        if not allow_legacy:
            return None
    return body


def run_custom_materialization(
    ctx: ExecutionContext, node: ManifestNode, body: str
) -> Relation:
    from dbt_spark.plans.compile import runtime_render
    from dbt_spark.plans.macros import (
        MacroReturn,
        QueryResult,
        RuntimeAdapter,
        _macro_return,
    )

    ctx.ensure_upstream_registered(node)
    sql = compile_sql(ctx, node)
    node.compiled_code = sql
    schema = ctx.schema_for(node)
    name = ctx.name_for(node)
    path = ctx.store.path_for(schema, name)
    target = MatRelation(schema, name, path)
    results: dict[str, Any] = {}
    issued: list[str] = []

    def statement(label: Optional[str] = None, fetch_result: bool = False,
                  language: str = "sql", caller: Any = None) -> str:
        text = str(caller() if caller is not None else "").strip()
        if not text:
            return ""
        issued.append(text)
        df = ctx.execute_sql(text, node=node, artifact=False)
        if fetch_result:
            results[label or "main"] = QueryResult(
                list(df.columns),
                [tuple(r) for r in df.limit(10000).collect()],
            )
        return ""

    def make_temp_relation(base: Any, suffix: str = "__dbt_tmp") -> MatRelation:
        b = getattr(base, "name", str(base))
        return MatRelation(schema, f"{b}{suffix}",
                           ctx.store.path_for(schema, f"{b}{suffix}"))

    mat_node = ManifestNode(
        unique_id=f"materialization.{node.unique_id}",
        name=node.name,
        package_name=node.package_name,
        path="",
        resource_type=NodeType.Operation,
        raw_code=body,
        config=node.config,
    )
    returned: Any = None
    # pre-clear: the macro's CREATE TABLE ... LOCATION must not collide
    # with stale files or a stale session-catalog entry from a prior run
    ctx.spark.sql(f"DROP TABLE IF EXISTS {target.ident}")
    ctx.spark.sql(f"DROP VIEW IF EXISTS {target.ident}")
    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    try:
        runtime_render(
            mat_node, ctx.manifest,
            resolve_ref=ctx.resolve_ref, resolve_source=ctx.resolve_source,
            this_name=target.ident, is_incremental=False,
            full_refresh=ctx.full_refresh,
            var_overrides=dict(ctx.vars),
            target=dict(ctx.project.profile),
            run_query=ctx.run_query,
            extra={
                "adapter": RuntimeAdapter(ctx),
                "model": {
                    "name": node.name,
                    "alias": name,
                    "schema": schema,
                    "unique_id": node.unique_id,
                    "compiled_code": sql,
                },
                "sql": sql,
                "compiled_code": sql,
                "this": target,
                "target_relation": target,
                "statement": statement,
                "load_result": results.get,
                "make_temp_relation": make_temp_relation,
                "run_hooks": lambda hooks=None, inside_transaction=None: "",
                "return": _macro_return,
                "project_flags": getattr(ctx.project, "flags", None) or {},
            },
        )
    except MacroReturn as r:
        returned = r.value
    if not issued:
        raise ValueError(
            f"{node.unique_id}: custom materialization executed no "
            "statements (a materialization must issue its DDL through "
            "{% call statement('main') %})"
        )
    # adopt the files the macro's DDL wrote; drop the transient catalog
    # entry (external table: files stay)
    ctx.spark.sql(f"DROP TABLE IF EXISTS {target.ident}")
    if not os.path.isdir(path):
        raise ValueError(
            f"{node.unique_id}: custom materialization left no files at "
            f"{path} — use create_table_as(...) (writes USING PARQUET "
            "LOCATION under the warehouse) for the main statement"
        )
    rel = ctx.store.adopt_table(schema, name, path,
                                custom_materialization=True)
    # surface the macro's returned relations count for artifacts/debugging
    if isinstance(returned, dict) and "relations" in returned:
        rel.meta["returned_relations"] = len(returned["relations"])
    return rel
