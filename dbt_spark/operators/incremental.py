"""Incremental materialization: append / merge / delete+insert /
insert_overwrite / microbatch (SURVEY §2A incremental rows).

Relation-exists gating mirrors core/dbt/task/run.py:667-684 (`_is_incremental`);
strategy semantics mirror the adapter strategies the reference dispatches to.

Scale design:
- merge / delete+insert: when ``partition_by`` is configured, only the
  partitions containing touched keys are read + rewritten (partition-pruned
  read, dynamic partition overwrite) — the parquet analog of Delta MERGE.
  Unpartitioned tables fall back to full rewrite with atomic swap.
- insert_overwrite / microbatch: dynamic partition overwrite only — never a
  full-table rewrite.
- on_schema_change: ignore | append_new_columns | sync_all_columns | fail
  (v1/config.py on_schema_change).
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_spark.catalog import Relation
from dbt_spark.operators.materialize import ExecutionContext, run_model_df
from dbt_spark.operators.microbatch import run_microbatch
from dbt_spark.plans.manifest import ManifestNode


class IncrementalError(Exception):
    pass


#: builtin strategy names — any OTHER configured name dispatches to a
#: user macro ``get_incremental_<name>_sql`` (reference:
#: adapter.get_incremental_strategy_macro, exercised by
#: tests/functional/materializations/test_incremental.py:33-53; the
#: microbatch compiled-patch lookup resolves the same naming scheme at
#: core/dbt/contracts/graph/manifest.py:1763)
BUILTIN_STRATEGIES = ("append", "merge", "delete+insert",
                      "insert_overwrite", "microbatch")


def split_dml_statements(sql: str) -> list[str]:
    """Split a multi-statement DML string on ';' — quote- and comment-aware
    (ADVICE r11: a naive split breaks on semicolons inside string literals).

    Handles single-quoted literals (with '' and backslash escapes),
    double-quoted literals/identifiers, backtick identifiers, ``--`` line
    comments, and ``/* */`` block comments — the lexical classes Spark SQL
    accepts.  Block comments NEST (Spark 3.0+ accepts
    ``/* a /* b */ still comment */``), so a depth counter tracks them
    (ADVICE r12).  Statements are returned stripped and non-empty."""
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(sql)
    mode: Optional[str] = None  # "'", '"', '`', '--', '/*'
    depth = 0  # block-comment nesting depth while mode == "/*"
    while i < n:
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < n else ""
        if mode is None:
            if ch == ";":
                stmts.append("".join(buf))
                buf = []
                i += 1
                continue
            if ch in ("'", '"', "`"):
                mode = ch
            elif ch == "-" and nxt == "-":
                mode = "--"
            elif ch == "/" and nxt == "*":
                mode = "/*"
                depth = 1
                buf.append(ch)
                buf.append(nxt)
                i += 2
                continue
        elif mode in ("'", '"'):
            if ch == "\\":
                buf.append(ch)
                if nxt:
                    buf.append(nxt)
                i += 2
                continue
            if ch == mode:
                if nxt == mode:  # doubled-quote escape ('' or "")
                    buf.append(ch)
                    buf.append(nxt)
                    i += 2
                    continue
                mode = None
        elif mode == "`":
            if ch == "`":
                mode = None
        elif mode == "--":
            if ch == "\n":
                mode = None
        elif mode == "/*":
            if ch == "/" and nxt == "*":
                depth += 1
                buf.append(ch)
                buf.append(nxt)
                i += 2
                continue
            if ch == "*" and nxt == "/":
                buf.append(ch)
                buf.append(nxt)
                i += 2
                depth -= 1
                if depth == 0:
                    mode = None
                continue
        buf.append(ch)
        i += 1
    stmts.append("".join(buf))
    return [s for s in (x.strip() for x in stmts) if s]


def strategy_macro_name(strategy: str) -> str:
    """``delete+insert`` → ``get_incremental_delete_insert_sql`` — the
    reference normalizes ``+``/spaces to ``_`` before the macro lookup."""
    return "get_incremental_" + re.sub(r"[+\s-]+", "_", strategy) + "_sql"


def _run_custom_strategy(
    ctx: ExecutionContext, node: ManifestNode, strategy: str,
    new: DataFrame, parts: list[str], storage: dict,
) -> Relation:
    """Execute a user-defined incremental strategy macro.

    Contract (mirrors the reference's incremental materialization): the
    macro ``get_incremental_<name>_sql(arg_dict)`` receives a dict with
    ``target_relation`` / ``temp_relation`` / ``unique_key`` /
    ``dest_columns`` / ``incremental_predicates`` and returns the DML to
    run. Here the new batch is registered as the temp relation and the
    target is exposed as a session-catalog EXTERNAL parquet table over
    the store path, so returned ``INSERT INTO`` / ``INSERT OVERWRITE
    TABLE`` statements land files exactly where the relation lives; the
    engine then re-adopts the path. Parquet-only: txparquet/delta route
    DML through their own commit protocols and must not be written
    around.

    Caveats owned by the macro author (same as any warehouse DML the
    reference executes): multi-statement returns are NOT one transaction
    — a failure between statements leaves earlier appends in place; and
    ``INSERT OVERWRITE`` of the target while the model SQL reads
    ``{{ this }}`` is a self-overwrite (Spark rejects it through the
    catalog table; a path-level read may not be detected). ``INSERT
    INTO`` with a self-read is safe and verified."""
    from dbt_spark.plans.compile import runtime_render
    from dbt_spark.plans.macros import (
        ColumnInfo,
        MacroReturn,
        RelationProxy,
        RuntimeAdapter,
        _macro_return,
    )
    from dbt_spark.plans.manifest import NodeType

    mname = strategy_macro_name(strategy)
    if (storage.get("file_format") or "parquet") != "parquet":
        raise IncrementalError(
            f"{node.unique_id}: custom incremental strategy "
            f"{strategy!r} is parquet-only (file_format="
            f"{storage['file_format']!r} commits through its own protocol)")
    if parts:
        raise IncrementalError(
            f"{node.unique_id}: custom incremental strategy {strategy!r} "
            "does not support partition_by (the transient DML table has "
            "no partition spec; use a builtin partitioned strategy)")

    schema = ctx.schema_for(node)
    name = ctx.name_for(node)
    rel = ctx.store.get(schema, name)
    existing = ctx.store.read(schema, name)

    ident = rel.identifier
    tmp_ident = f"{ident}__dbt_tmp"
    new.createOrReplaceTempView(tmp_ident)

    target = RelationProxy(ident, schema, name)
    temp = RelationProxy(tmp_ident, schema, tmp_ident)
    arg_dict = {
        "target_relation": target,
        "temp_relation": temp,
        "unique_key": node.config.unique_key,
        "dest_columns": [
            ColumnInfo(f.name, f.dataType.simpleString())
            for f in existing.schema.fields
        ],
        "incremental_predicates":
            node.config.meta.get("incremental_predicates"),
    }
    drv = ManifestNode(
        unique_id=f"operation.{node.unique_id}.incremental_strategy",
        name=node.name,
        package_name=node.package_name,
        path="",
        resource_type=NodeType.Operation,
        raw_code="{{ return(" + mname + "(arg_dict)) }}",
        config=node.config,
    )

    try:
        # the temp view registered for {{ this }} would shadow the catalog
        # table of the same name — swap it out for the DML's duration
        # (inside the try so ANY failure restores the view in finally)
        ctx.spark.catalog.dropTempView(ident)
        ctx.spark.sql(f"DROP TABLE IF EXISTS {ident}")
        ctx.spark.sql(
            f"CREATE TABLE {ident} USING parquet LOCATION '{rel.path}'")
        build_sql = None
        try:
            runtime_render(
                drv, ctx.manifest,
                resolve_ref=ctx.resolve_ref,
                resolve_source=ctx.resolve_source,
                this_name=ident, is_incremental=True,
                full_refresh=ctx.full_refresh,
                var_overrides=dict(ctx.vars),
                target=dict(ctx.project.profile),
                run_query=ctx.run_query,
                extra={
                    "arg_dict": arg_dict,
                    "adapter": RuntimeAdapter(ctx),
                    "this": target,
                    "temp_relation": temp,
                    "return": _macro_return,
                },
            )
        except MacroReturn as r:
            build_sql = r.value
        if not isinstance(build_sql, str) or not build_sql.strip():
            raise IncrementalError(
                f"{node.unique_id}: {mname} must return() the SQL to "
                "execute (got "
                f"{type(build_sql).__name__})")
        for stmt in split_dml_statements(build_sql):
            ctx.execute_sql(stmt, node=node)
    finally:
        # external table: dropping the catalog entry keeps the files;
        # re-register adopts whatever the DML wrote
        ctx.spark.sql(f"DROP TABLE IF EXISTS {ident}")
        ctx.spark.catalog.dropTempView(tmp_ident)
        ctx.store.invalidate(rel)
        ctx.store.register(rel)
    return rel


def _unique_keys(node: ManifestNode) -> list[str]:
    uk = node.config.unique_key
    if uk is None:
        raise IncrementalError(f"{node.unique_id}: strategy requires unique_key")
    return [uk] if isinstance(uk, str) else list(uk)


def _partition_cols(node: ManifestNode) -> list[str]:
    pb = node.config.partition_by
    if pb is None:
        return []
    return [pb] if isinstance(pb, str) else list(pb)


def apply_schema_change(
    existing: DataFrame, new: DataFrame, policy: str, node_id: str
) -> tuple[DataFrame, DataFrame]:
    """Align schemas per on_schema_change before combining."""
    old_cols, new_cols = set(existing.columns), set(new.columns)
    if old_cols == new_cols:
        return existing, new
    if policy == "fail":
        raise IncrementalError(
            f"{node_id}: schema changed (added={sorted(new_cols - old_cols)}, "
            f"removed={sorted(old_cols - new_cols)}) and on_schema_change=fail"
        )
    if policy == "ignore":
        # keep target schema; new batch must supply the target columns
        missing = old_cols - new_cols
        if missing:
            raise IncrementalError(
                f"{node_id}: new batch is missing target columns {sorted(missing)}"
            )
        return existing, new.select(*existing.columns)
    if policy == "append_new_columns":
        for c in sorted(new_cols - old_cols):
            existing = existing.withColumn(c, F.lit(None).cast(new.schema[c].dataType))
        return existing, new.select(*existing.columns) if set(existing.columns) <= new_cols else (
            existing,
            new,
        )
    if policy == "sync_all_columns":
        for c in sorted(new_cols - old_cols):
            existing = existing.withColumn(c, F.lit(None).cast(new.schema[c].dataType))
        existing = existing.select(*new.columns)
        return existing, new
    raise IncrementalError(f"{node_id}: unknown on_schema_change {policy!r}")


def merge_upsert(
    existing: DataFrame, new: DataFrame, keys: list[str],
    update_columns: Optional[list[str]] = None,
    exclude_columns: Optional[list[str]] = None,
) -> DataFrame:
    """MERGE semantics: matched target rows replaced, unmatched inserted.

    Implemented as target-anti-join-keys ∪ new — one shuffle on the key, and
    AQE converts to broadcast when the new batch is small (the common case).

    ``merge_update_columns`` / ``merge_exclude_columns`` (reference
    v1/config.py:106-109, mutually exclusive): when set, a matched row takes
    ONLY the listed (resp. all-but-excluded) columns from the source and
    keeps the rest from the target; inserts always take the full source row.
    That partial-update shape needs the matched target rows, so it joins
    instead of anti-joining — still one shuffle on the key."""
    if update_columns and exclude_columns:
        raise IncrementalError(
            "merge_update_columns and merge_exclude_columns are mutually "
            "exclusive (v1/config.py MergeConfig)")
    if not update_columns and not exclude_columns:
        new_keys = new.select(*keys).distinct()
        kept = existing.join(F.broadcast(new_keys), on=keys, how="left_anti")
        return kept.unionByName(new)

    non_keys = [c for c in existing.columns if c not in keys]
    upd = (list(update_columns) if update_columns
           else [c for c in non_keys if c not in set(exclude_columns)])
    unknown = set(upd) - set(non_keys)
    if unknown:
        raise IncrementalError(
            f"merge update columns not in target schema: {sorted(unknown)}")
    t, s = existing.alias("t"), new.alias("s")
    matched = t.join(s, on=keys, how="inner").select(
        *keys,
        *[(F.col(f"s.{c}") if c in upd else F.col(f"t.{c}")).alias(c)
          for c in non_keys],
    )
    new_keys = new.select(*keys).distinct()
    unmatched_target = existing.join(F.broadcast(new_keys), on=keys, how="left_anti")
    inserts = new.join(existing.select(*keys).distinct(), on=keys, how="left_anti")
    return unmatched_target.unionByName(matched.select(*existing.columns)).unionByName(
        inserts.select(*existing.columns)
    )


def delete_insert(existing: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """DELETE keys present in batch, then INSERT batch (strategy delete+insert).
    Final state equals merge for whole-row batches; kept as a distinct code
    path because dbt treats it as a distinct strategy."""
    new_keys = new.select(*keys).distinct()
    deleted = existing.join(F.broadcast(new_keys), on=keys, how="left_anti")
    return deleted.unionByName(new)


def _scoped_rewrite(
    ctx: ExecutionContext,
    node: ManifestNode,
    new: DataFrame,
    combine,
    keys: list[str],
) -> Relation:
    """Partition-pruned merge when partitioned; full swap otherwise."""
    schema = ctx.schema_for(node)
    parts = _partition_cols(node)
    existing = ctx.store.read(schema, ctx.name_for(node))
    existing, new = apply_schema_change(
        existing, new, node.config.on_schema_change, node.unique_id
    )
    # incremental_predicates: extra SQL predicates bounding which target rows
    # are even considered for matching (v1/config.py incremental_predicates —
    # the standard trick to keep a 100 TB merge from scanning history).
    # Rows excluded by a predicate are passed through unchanged.
    predicates = node.config.meta.get("incremental_predicates") or []
    untouched = None
    if predicates:
        pred_expr = " AND ".join(f"({p})" for p in predicates)
        untouched = existing.filter(f"NOT ({pred_expr})")
        existing = existing.filter(pred_expr)

    if parts:
        # 1. find touched partitions from the new batch (small: distinct on
        #    partition cols); 2. read ONLY those partitions from the target
        #    (partition pruning via filter on partition columns); 3. combine;
        #    4. dynamic partition overwrite writes only those partitions back.
        touched = [tuple(r) for r in new.select(*parts).distinct().collect()]
        if not touched:
            return ctx.store.get(schema, ctx.name_for(node))
        pred = None
        for combo in touched:
            clause = None
            for col, val in zip(parts, combo):
                c = F.col(col) == F.lit(val)
                clause = c if clause is None else (clause & c)
            pred = clause if pred is None else (pred | clause)
        scoped_existing = existing.filter(pred)
        combined = combine(scoped_existing, new, keys)
        if untouched is not None:
            # predicate-excluded rows living in TOUCHED partitions must ride
            # along (dynamic overwrite rewrites whole partitions)
            combined = combined.unionByName(untouched.filter(pred))
        return ctx.store.overwrite_partitions(schema, ctx.name_for(node), combined, parts)
    combined = combine(existing, new, keys)
    if untouched is not None:
        combined = combined.unionByName(untouched)
    from dbt_spark.operators.materialize import storage_options

    return ctx.store.write_table(
        schema, ctx.name_for(node), combined, kind="incremental", **storage_options(node)
    )


def _incremental_bucketed(
    ctx: ExecutionContext,
    node: ManifestNode,
    strategy: str,
    new: DataFrame,
    is_incremental: bool,
) -> Relation:
    """Incremental strategies over a hash-bucketed target (config(bucket_by=,
    buckets=) + materialized='incremental') — the nightly co-bucketed fact
    pattern: the merged table KEEPS its bucket layout, so downstream
    co-bucketed joins stay shuffle-free run after run.

    - append: new files written through the same bucket hash (each file
      per-bucket sorted; reads stay shuffle-elided).
    - merge / delete+insert: combine + bucketed rewrite. The combine itself
      shuffles on unique_key; when unique_key == bucket key, both sides'
      scans are already hash-partitioned on it, so the anti-join is local.
    partition_by + bucket_by together is rejected (one physical layout per
    relation here)."""
    schema = ctx.schema_for(node)
    if _partition_cols(node):
        raise IncrementalError(
            f"{node.unique_id}: bucket_by and partition_by cannot be combined")
    if (node.config.meta.get("file_format") or "parquet") != "parquet":
        raise IncrementalError(
            f"{node.unique_id}: bucketed incremental targets are parquet only")
    bucket_by = node.config.meta.get("bucket_by")
    bucket_by = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    buckets = int(node.config.meta.get("buckets", 32))
    sort_by = node.config.meta.get("sort_by")
    sort_by = [sort_by] if isinstance(sort_by, str) else sort_by

    def _write(df: DataFrame, mode: str = "overwrite") -> Relation:
        return ctx.store.write_bucketed(
            schema, ctx.name_for(node), df, bucket_by=bucket_by, buckets=buckets,
            sort_by=sort_by, mode=mode,
        )

    if not is_incremental:
        return _write(new)
    existing_raw = ctx.store.read(schema, ctx.name_for(node))
    existing, new = apply_schema_change(
        existing_raw, new, node.config.on_schema_change, node.unique_id)
    if strategy == "append":
        if existing.columns != existing_raw.columns:
            # schema evolution reshapes the target (see the plain append
            # path) — staged bucketed rewrite instead of a fast append
            return ctx.store.rewrite_bucketed(
                schema, ctx.name_for(node), existing.unionByName(new),
                bucket_by=bucket_by, buckets=buckets, sort_by=sort_by,
            )
        return _write(new, mode="append")
    if strategy == "merge":
        combined = merge_upsert(
            existing, new, _unique_keys(node),
            update_columns=node.config.meta.get("merge_update_columns"),
            exclude_columns=node.config.meta.get("merge_exclude_columns"),
        )
    elif strategy == "delete+insert":
        combined = delete_insert(existing, new, _unique_keys(node))
    else:
        raise IncrementalError(
            f"{node.unique_id}: strategy {strategy!r} is not supported on "
            "bucketed targets (use append, merge, or delete+insert)")
    # the combine READS the path being replaced — staged rewrite (write
    # beside, swap dirs, recreate catalog entry), never materializing the
    # combined frame in memory
    return ctx.store.rewrite_bucketed(
        schema, ctx.name_for(node), combined, bucket_by=bucket_by, buckets=buckets,
        sort_by=sort_by,
    )


def _native_merge(ctx: ExecutionContext, node: ManifestNode, new: DataFrame,
                  keys: list[str], upd, exc) -> Optional[Relation]:
    """Route a plain merge to the target format's NATIVE transactional
    MERGE (``supports_native_merge`` formats — formats.py
    TxParquetFormat.merge_into; Delta/Iceberg MERGE where their runtimes
    exist): one optimistic-concurrency commit, file-pruned rewrite, no
    staged swap. Returns None (→ generic read-combine-rewrite) for
    partitioned targets, incremental_predicates, or batches that evolve
    the target schema — the cases a full rewrite genuinely handles."""
    from dbt_spark.formats import table_format
    from dbt_spark.operators.materialize import storage_options

    storage = storage_options(node)
    fmt_obj = table_format(storage.get("file_format"))
    if (not fmt_obj.supports_native_merge
            or not fmt_obj.available(ctx.spark)
            or not hasattr(fmt_obj, "merge_into")
            or _partition_cols(node)
            or node.config.meta.get("incremental_predicates")):
        return None
    schema = ctx.schema_for(node)
    name = ctx.name_for(node)
    rel = ctx.store.get(schema, name)
    if rel is None or not rel.path:
        return None
    existing = ctx.store.read(schema, name)
    aligned_existing, aligned_new = apply_schema_change(
        existing, new, node.config.on_schema_change, node.unique_id)
    if aligned_existing.schema != existing.schema:
        return None  # schema evolution → full-rewrite path
    fmt_obj.merge_into(ctx.spark, rel.path, aligned_new, keys,
                       update_columns=upd, exclude_columns=exc)
    ctx.store.invalidate(rel)
    ctx.store.register(rel)
    return rel


def materialize_incremental(ctx: ExecutionContext, node: ManifestNode) -> Optional[Relation]:
    schema = ctx.schema_for(node)
    strategy = node.config.incremental_strategy or "append"
    parts = _partition_cols(node)

    if strategy == "microbatch":
        if (node.config.meta.get("file_format") or "parquet") != "parquet":
            raise IncrementalError(
                f"{node.unique_id}: file_format="
                f"{node.config.meta['file_format']!r} is not supported with "
                "microbatch (batch replaceWhere rewrites are parquet only)")
        return run_microbatch(ctx, node)

    exists = ctx.store.exists(schema, ctx.name_for(node))
    full_refresh = ctx.full_refresh or bool(node.config.full_refresh)
    is_incremental = exists and not full_refresh

    if is_incremental:
        # `{{ this }}` must be addressable inside the model SQL
        ctx.store.register(ctx.store.get(schema, ctx.name_for(node)))

    new = run_model_df(ctx, node, is_incremental=is_incremental)
    from dbt_spark.operators.contracts import enforce_contract

    enforce_contract(node, new)

    from dbt_spark.operators.materialize import storage_options

    storage = storage_options(node)
    bucket_by = node.config.meta.get("bucket_by")
    if bucket_by:
        return _incremental_bucketed(ctx, node, strategy, new, is_incremental)
    if storage.get("file_format") not in (None, "parquet") and parts:
        # every partitioned incremental rewrite path goes through dynamic
        # partition overwrite, which is parquet-only here — fail loudly
        # rather than silently mixing formats under one relation
        raise IncrementalError(
            f"{node.unique_id}: file_format={storage['file_format']!r} is not "
            "supported with partitioned incremental rewrites (parquet only)")

    if not is_incremental:
        return ctx.store.write_table(
            schema, ctx.name_for(node), new, kind="incremental", partition_by=parts,
            **storage,
        )

    if strategy == "append":
        existing = ctx.store.read(schema, ctx.name_for(node))
        aligned, new = apply_schema_change(
            existing, new, node.config.on_schema_change, node.unique_id)
        if aligned.columns != existing.columns:
            # schema evolution must reshape the TARGET too (the warehouse
            # ALTER TABLE analog: append_new_columns null-fills old rows,
            # sync_all_columns also drops removed columns) — one staged
            # full rewrite; the plain fast-append below never pays this
            return ctx.store.write_table(
                schema, ctx.name_for(node), aligned.unionByName(new),
                kind="incremental", partition_by=parts, **storage,
            )
        return ctx.store.write_table(
            schema, ctx.name_for(node), new, kind="incremental", partition_by=parts,
            mode="append", **storage,
        )
    if strategy == "merge":
        upd = node.config.meta.get("merge_update_columns")
        exc = node.config.meta.get("merge_exclude_columns")
        native = _native_merge(ctx, node, new, _unique_keys(node), upd, exc)
        if native is not None:
            return native

        def combine(existing, batch, keys):
            return merge_upsert(
                existing, batch, keys,
                update_columns=upd, exclude_columns=exc,
            )

        return _scoped_rewrite(ctx, node, new, combine, _unique_keys(node))
    if strategy == "delete+insert":
        return _scoped_rewrite(ctx, node, new, delete_insert, _unique_keys(node))
    if strategy == "insert_overwrite":
        if not parts:
            raise IncrementalError(
                f"{node.unique_id}: insert_overwrite requires partition_by"
            )
        existing = ctx.store.read(schema, ctx.name_for(node))
        aligned, new = apply_schema_change(
            existing, new, node.config.on_schema_change, node.unique_id)
        if aligned.columns != existing.columns:
            # schema evolution reshapes the WHOLE target (dynamic partition
            # overwrite would otherwise leave untouched partitions on the
            # old schema — a mixed-schema table): keep untouched partitions'
            # rows from the realigned frame, replace touched ones, one
            # staged full rewrite
            touched = [
                tuple(r) for r in new.select(*parts).distinct().collect()
            ]
            pred = F.lit(False)
            for combo in touched:
                clause = F.lit(True)
                for col, val in zip(parts, combo):
                    clause = clause & (F.col(col) == F.lit(val))
                pred = pred | clause
            combined = aligned.filter(~pred).unionByName(new)
            return ctx.store.write_table(
                schema, ctx.name_for(node), combined, kind="incremental",
                partition_by=parts, **storage,
            )
        return ctx.store.overwrite_partitions(schema, ctx.name_for(node), new, parts)
    if strategy_macro_name(strategy) in ctx.manifest.macros:
        return _run_custom_strategy(ctx, node, strategy, new, parts, storage)
    raise IncrementalError(
        f"{node.unique_id}: unknown incremental_strategy {strategy!r} — "
        "dbt could not find an incremental strategy macro with the name "
        f"'{strategy_macro_name(strategy)}' (built-ins: "
        + ", ".join(BUILTIN_STRATEGIES) + ")")
