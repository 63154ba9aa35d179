"""Snapshot materialization: SCD Type-2 history (SURVEY §2A snapshot row).

Semantics from core/dbt/artifacts/resources/v1/snapshot.py:11-72 (strategies +
validation), meta column names :35-42, runner core/dbt/task/snapshot.py:16-57:

- ``timestamp`` strategy: a source row is a new version when its ``updated_at``
  is strictly newer than the tracked current version's.
- ``check`` strategy: new version when any ``check_cols`` value differs
  (null-safe); ``check_cols: all`` compares every non-key column.
- any OTHER strategy name is a CUSTOM strategy (v1/snapshot.py:68-69):
  it dispatches to a user macro ``snapshot_<name>_strategy`` whose
  returned dict supplies updated_at / row_changed (+ optional scd_id)
  SQL expressions, applied here via F.expr over frames aliased
  ``source_data`` / ``snapshotted_data`` (the reference's alias names).
- meta columns: dbt_scd_id (md5 of key + version timestamp), dbt_valid_from,
  dbt_valid_to (NULL for current), dbt_updated_at, dbt_is_deleted (when
  hard_deletes='new_record').
- hard_deletes: ignore | invalidate (close vanished keys) | new_record
  (close + insert a deletion marker row).

Implemented as DataFrame joins + an atomic table swap; on Delta/Iceberg the
same plan becomes a single MERGE (documented upgrade path). The join is on the
snapshot's unique_key — current rows vs source shuffle once on that key.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_spark.catalog import Relation
from dbt_spark.operators.materialize import ExecutionContext, run_model_df
from dbt_spark.plans.manifest import ManifestNode

META_COLS = ["dbt_scd_id", "dbt_updated_at", "dbt_valid_from", "dbt_valid_to"]


def _meta_renames(node: ManifestNode) -> dict[str, str]:
    """snapshot_meta_column_names (v1/snapshot.py:35-42): internal name →
    user-facing name. Internal computation always uses dbt_* names; the
    mapping is applied at the write boundary and reversed at read."""
    custom = node.config.meta.get("snapshot_meta_column_names") or {}
    return {k: v for k, v in custom.items()
            if k in META_COLS + ["dbt_is_deleted"] and v}


def _to_external(df: DataFrame, node: ManifestNode) -> DataFrame:
    # dbt_valid_to_current (v1/snapshot.py): a sentinel expression (e.g.
    # date'9999-12-31') instead of NULL for current rows — keeps BETWEEN
    # range predicates sargable on the history table
    sentinel = node.config.meta.get("dbt_valid_to_current")
    if sentinel and "dbt_valid_to" in df.columns:
        df = df.withColumn(
            "dbt_valid_to",
            F.coalesce(F.col("dbt_valid_to"), F.expr(sentinel).cast("timestamp")),
        )
    for internal, external in _meta_renames(node).items():
        if internal in df.columns:
            df = df.withColumnRenamed(internal, external)
    return df


def _to_internal(df: DataFrame, node: ManifestNode) -> DataFrame:
    for internal, external in _meta_renames(node).items():
        if external in df.columns:
            df = df.withColumnRenamed(external, internal)
    sentinel = node.config.meta.get("dbt_valid_to_current")
    if sentinel and "dbt_valid_to" in df.columns:
        df = df.withColumn(
            "dbt_valid_to",
            F.when(
                F.col("dbt_valid_to") == F.expr(sentinel).cast("timestamp"),
                F.lit(None).cast("timestamp"),
            ).otherwise(F.col("dbt_valid_to")),
        )
    return df


def _keys(node: ManifestNode) -> list[str]:
    uk = node.config.unique_key
    return [uk] if isinstance(uk, str) else list(uk)


def _scd_id(keys: list[str], version_ts_col: str) -> F.Column:
    parts = [F.col(k).cast("string") for k in keys]
    parts.append(F.date_format(F.col(version_ts_col), "yyyy-MM-dd HH:mm:ss"))
    return F.md5(F.concat_ws("|", *parts))


_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def _strat_key_plan(node: ManifestNode, strat: dict | None):
    """Join-key plan honoring a custom strategy's ``unique_key`` contract.

    The reference materialization drives the merge key off the strategy
    dict (``strategy.unique_key``), not the node config — a custom macro
    may return a transformed or composite key. Returns ``(keys, derived)``
    where ``derived`` maps a generated column name -> SQL expression to
    evaluate on BOTH sides before the join (for non-identifier key
    expressions); plain column names pass straight through as keys."""
    if strat is None or not strat.get("unique_key"):
        return _keys(node), {}
    uk = strat["unique_key"]
    uks = [uk] if isinstance(uk, str) else list(uk)
    keys: list[str] = []
    derived: dict[str, str] = {}
    for i, u in enumerate(uks):
        u = str(u).strip()
        if _IDENT.fullmatch(u):
            keys.append(u)
        else:
            name = f"__sg_strat_key_{i}"
            derived[name] = u
            keys.append(name)
    return keys, derived


def _custom_strategy(ctx: ExecutionContext, node: ManifestNode,
                     target_exists: bool) -> dict:
    """Resolve and call a user-defined ``snapshot_<strategy>_strategy``
    macro for a non-builtin strategy name.

    Reference: core treats any strategy that isn't 'check'/'timestamp' as
    custom and passes it through parse validation
    (core/dbt/artifacts/resources/v1/snapshot.py:68-69 comment); the
    adapters-side snapshot materialization dispatches
    ``snapshot_{name}_strategy(node, snapshotted_rel, current_rel,
    model_config, target_exists)`` and expects a dict with SQL-expression
    entries ``unique_key`` / ``updated_at`` / ``row_changed`` (+ optional
    ``scd_id``). Here the returned expressions are applied via F.expr on
    DataFrames aliased ``source_data`` / ``snapshotted_data`` — the same
    names the reference hands the macro, so qualified expressions work
    verbatim."""
    from dbt_spark.plans.compile import CompilationError, runtime_render
    from dbt_spark.plans.macros import MacroReturn, _macro_return
    from dbt_spark.plans.manifest import NodeType

    mname = f"snapshot_{node.config.strategy}_strategy"
    # detect the missing macro up front from the parsed macro registry —
    # substring-matching render exceptions would misreport a genuine bug
    # inside an existing strategy macro as "macro not found"
    if mname not in ctx.manifest.macros:
        raise CompilationError(
            f"snapshot {node.name}: strategy "
            f"{node.config.strategy!r} requires a macro named "
            f"'{mname}' (custom snapshot strategy dispatch)"
        )
    cfg = {
        k: getattr(node.config, k, None)
        for k in ("strategy", "unique_key", "updated_at", "check_cols",
                  "hard_deletes")
    }
    cfg["meta"] = dict(node.config.meta or {})
    driver = (
        "{{ return(" + mname
        + "(node, 'snapshotted_data', 'source_data', config_dict,"
          " target_exists)) }}"
    )
    drv = ManifestNode(
        unique_id=f"operation.{node.unique_id}.strategy",
        name=node.name,
        package_name=node.package_name,
        path="",
        resource_type=NodeType.Operation,
        raw_code=driver,
        config=node.config,
    )
    try:
        runtime_render(
            drv, ctx.manifest,
            resolve_ref=ctx.resolve_ref, resolve_source=ctx.resolve_source,
            this_name=ctx.name_for(node), is_incremental=False,
            full_refresh=ctx.full_refresh,
            var_overrides=dict(ctx.vars),
            target=dict(ctx.project.profile),
            run_query=ctx.run_query,
            extra={
                "node": node,
                "config_dict": cfg,
                "target_exists": target_exists,
                "return": _macro_return,
            },
        )
    except MacroReturn as r:
        strat = r.value
        if not isinstance(strat, dict) or "row_changed" not in strat:
            raise CompilationError(
                f"snapshot {node.name}: custom strategy macro {mname} must "
                "return a dict with at least a 'row_changed' expression"
            )
        return strat
    raise CompilationError(
        f"snapshot {node.name}: custom strategy macro {mname} did not "
        "return() a strategy dict"
    )


def _with_meta(df: DataFrame, node: ManifestNode, run_ts: str,
               strat: dict | None = None,
               keys: list[str] | None = None) -> DataFrame:
    """Append meta columns to fresh source rows (first version)."""
    if strat is not None:
        df = df.alias("source_data").withColumn(
            "dbt_updated_at",
            F.expr(str(strat["updated_at"])).cast("timestamp")
            if strat.get("updated_at") else F.lit(run_ts).cast("timestamp"),
        )
    elif node.config.strategy == "timestamp":
        version_col = node.config.updated_at
        df = df.withColumn("dbt_updated_at", F.col(version_col))
    else:
        df = df.withColumn("dbt_updated_at", F.lit(run_ts).cast("timestamp"))
    scd = (
        F.expr(str(strat["scd_id"]))
        if strat is not None and strat.get("scd_id")
        else _scd_id(keys or _keys(node), "dbt_updated_at")
    )
    df = (
        df.withColumn("dbt_valid_from", F.col("dbt_updated_at"))
        .withColumn("dbt_valid_to", F.lit(None).cast("timestamp"))
        .withColumn("dbt_scd_id", scd)
    )
    if node.config.hard_deletes == "new_record":
        df = df.withColumn("dbt_is_deleted", F.lit(False))
    return df


def _changed_predicate(node: ManifestNode, src: DataFrame, cur: DataFrame,
                       strat: dict | None = None) -> F.Column:
    if strat is not None:
        # evaluated in the joined scope where src is aliased source_data
        # and cur snapshotted_data — qualified refs resolve verbatim
        return F.expr(str(strat["row_changed"]))
    if node.config.strategy == "timestamp":
        ua = node.config.updated_at
        return src[ua] > cur["dbt_updated_at"]
    check_cols = node.config.check_cols
    if check_cols == "all" or check_cols == ["all"]:
        check_cols = [
            c for c in src.columns if c not in _keys(node) and c not in META_COLS
        ]
    pred = F.lit(False)
    for c in check_cols:
        pred = pred | ~src[c].eqNullSafe(cur[c])
    return pred


def materialize_snapshot(ctx: ExecutionContext, node: ManifestNode) -> Relation:
    schema = ctx.schema_for(node)
    run_ts = ctx.snapshot_ts or datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")

    source = run_model_df(ctx, node)

    exists = ctx.store.exists(schema, ctx.name_for(node))
    strat = (
        None
        if node.config.strategy in ("timestamp", "check")
        else _custom_strategy(ctx, node, exists)
    )
    # join keys come from the strategy dict when a custom strategy
    # returned one (reference contract); composite/expression keys become
    # derived columns evaluated identically on both sides
    keys, derived = _strat_key_plan(node, strat)
    for dname, dexpr in derived.items():
        source = source.withColumn(dname, F.expr(dexpr))

    if not exists:
        from dbt_spark.operators.materialize import storage_options

        first = _with_meta(source, node, run_ts, strat, keys)
        if derived:
            first = first.drop(*derived)
        return ctx.store.write_table(schema, ctx.name_for(node),
                                     _to_external(first, node),
                                     kind="snapshot", **storage_options(node))

    snap = _to_internal(ctx.store.read(schema, ctx.name_for(node)), node)
    for dname, dexpr in derived.items():
        snap = snap.withColumn(dname, F.expr(dexpr))
    has_deleted_col = "dbt_is_deleted" in snap.columns
    history = snap.filter(F.col("dbt_valid_to").isNotNull())
    current = snap.filter(F.col("dbt_valid_to").isNull())

    # alias names match what the reference hands strategy macros, so a
    # custom strategy's qualified row_changed/updated_at exprs resolve
    src = source.alias("source_data")
    cur = current.alias("snapshotted_data")
    on = [src[k].eqNullSafe(cur[k]) for k in keys]
    joined = src.join(cur, on, "full_outer")

    src_key = src[keys[0]]
    cur_key = cur[keys[0]]
    changed = _changed_predicate(node, src, cur, strat)
    if strat is not None:
        version_ts = (
            F.expr(str(strat["updated_at"])).cast("timestamp")
            if strat.get("updated_at")
            else F.lit(run_ts).cast("timestamp")
        )
    else:
        version_ts = (
            src[node.config.updated_at]
            if node.config.strategy == "timestamp"
            else F.lit(run_ts).cast("timestamp")
        )

    cur_cols = [cur[c].alias(c) for c in current.columns]
    src_data_cols = [src[c].alias(c) for c in source.columns]

    # 1. unchanged current rows pass through
    unchanged = joined.filter(
        src_key.isNotNull() & cur_key.isNotNull() & ~changed
    ).select(*cur_cols)

    # 2. matched + changed: close the old version at the new version's timestamp
    closed = joined.filter(src_key.isNotNull() & cur_key.isNotNull() & changed).select(
        *[cur[c].alias(c) for c in current.columns if c != "dbt_valid_to"],
        version_ts.alias("dbt_valid_to"),
    ).select(*[F.col(c) for c in current.columns])

    # 3. matched + changed, and brand-new keys: insert fresh current versions
    fresh_src = joined.filter(
        src_key.isNotNull() & (cur_key.isNull() | changed)
    ).select(*src_data_cols)
    inserts = _with_meta(fresh_src, node, run_ts, strat, keys)

    # 4. hard deletes
    vanished = joined.filter(src_key.isNull() & cur_key.isNotNull())
    if node.config.hard_deletes in ("invalidate", "new_record"):
        deleted_closed = vanished.select(
            *[cur[c].alias(c) for c in current.columns if c != "dbt_valid_to"],
            F.lit(run_ts).cast("timestamp").alias("dbt_valid_to"),
        ).select(*[F.col(c) for c in current.columns])
    else:
        deleted_closed = vanished.select(*cur_cols)  # keep them current untouched
        deleted_closed = deleted_closed.withColumn(
            "dbt_valid_to", F.lit(None).cast("timestamp")
        )

    new_snap = history.unionByName(unchanged, allowMissingColumns=True)
    new_snap = new_snap.unionByName(closed, allowMissingColumns=True)
    new_snap = new_snap.unionByName(inserts, allowMissingColumns=True)
    new_snap = new_snap.unionByName(deleted_closed, allowMissingColumns=True)

    if node.config.hard_deletes == "new_record":
        # deletion marker: a new current row flagged dbt_is_deleted
        markers = vanished.select(
            *[cur[c].alias(c) for c in current.columns
              if c not in ("dbt_valid_from", "dbt_valid_to", "dbt_updated_at",
                           "dbt_scd_id", "dbt_is_deleted")],
            F.lit(run_ts).cast("timestamp").alias("dbt_updated_at"),
            F.lit(run_ts).cast("timestamp").alias("dbt_valid_from"),
            F.lit(None).cast("timestamp").alias("dbt_valid_to"),
        )
        markers = markers.withColumn("dbt_scd_id", _scd_id(keys, "dbt_updated_at"))
        markers = markers.withColumn("dbt_is_deleted", F.lit(True))
        if not has_deleted_col:
            new_snap = new_snap.withColumn("dbt_is_deleted", F.lit(False))
        new_snap = new_snap.unionByName(markers, allowMissingColumns=True)
        new_snap = new_snap.fillna(False, subset=["dbt_is_deleted"])

    if derived:
        new_snap = new_snap.drop(*derived)

    from dbt_spark.operators.materialize import storage_options

    return ctx.store.write_table(
        schema, ctx.name_for(node), _to_external(new_snap, node),
        kind="snapshot", **storage_options(node)
    )
