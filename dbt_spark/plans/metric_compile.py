"""Metric/saved-query compilation: semantic models + metrics → one SQL query.

The reference delegates metric query generation to MetricFlow (dbt-labs'
public metricflow package; core only parses the YAML —
core/dbt/parser/schema_yaml_readers.py:189,511,739 — and NoOps the nodes).
This module implements the generation step Spark-first so saved queries are
actually runnable here:

- every metric resolves through its measure to ONE semantic model and that
  model's base table; all metrics over the same semantic model compile into a
  SINGLE aggregate over a single scan (map-side partials, one shuffle);
- metrics spanning different semantic models aggregate independently (each
  its own scan+shuffle, dimensionally grouped) and FULL OUTER join on the
  group-by keys — group-by cardinality join, never a fact-fact join;
- measure- and metric-level ``filter:`` clauses become CASE WHEN guards
  inside the aggregate (no pre-shuffle row explosion, pushdown-friendly);
- ``metric_time`` resolves to the model's ``defaults.agg_time_dimension``;
  a ``__grain`` suffix on a time dimension becomes ``date_trunc``;
- metric types: simple, ratio (num/den with NULLIF), derived (expr over
  input metric aliases), conversion (entity-keyed base→conversion semi-join
  within an optional window; conversions | conversion_rate calculations),
  derived offset_window inputs (period-over-period: the input re-aggregates
  into time buckets shifted forward by the offset),
  cumulative with grain_to_date resets (MTD/YTD) (post-aggregate running window over the
  time grain — requires metric_time in the group-by).

Supported agg types mirror the reference's AggregationType enum
(core/dbt/artifacts/resources/types.py): sum, min, max, avg, count,
count_distinct, sum_boolean, median, percentile.
"""

from __future__ import annotations

import re
from typing import Any, Optional

from dbt_spark.plans.semantic import SemanticValidationError

_GRAINS = {"day", "week", "month", "quarter", "year"}

_AGG_SQL = {
    "sum": "SUM({e})",
    "min": "MIN({e})",
    "max": "MAX({e})",
    "avg": "AVG({e})",
    "count": "COUNT({e})",
    "count_distinct": "COUNT(DISTINCT {e})",
    "sum_boolean": "SUM(CASE WHEN ({e}) THEN 1 ELSE 0 END)",
    "median": "MEDIAN({e})",
}


class MetricQueryError(SemanticValidationError):
    pass


def _meta(entry: Any) -> dict:
    """Accept raw YAML dicts or ManifestNodes (entry data in config.meta)."""
    if isinstance(entry, dict):
        return entry
    out = dict(entry.config.meta)
    out.setdefault("name", entry.name)
    return out


class _Model:
    def __init__(self, entry: dict) -> None:
        self.name = entry["name"]
        self.model_ref = entry.get("model", "")
        defaults = entry.get("defaults") or {}
        self.agg_time_dimension = defaults.get("agg_time_dimension")
        self.dimensions = {d["name"]: d for d in entry.get("dimensions", [])}
        self.entities = {e["name"]: e for e in entry.get("entities", [])}
        self.measures = {m["name"]: m for m in entry.get("measures", [])}
        self.primary_entity = entry.get("primary_entity") or next(
            (e["name"] for e in entry.get("entities", [])
             if e.get("type") == "primary"), None)

    def ref_name(self) -> str:
        m = re.search(r"ref\(\s*['\"]([^'\"]+)['\"]\s*\)", self.model_ref)
        return m.group(1) if m else self.model_ref

    def resolve_group_by(self, item: str) -> tuple[str, str]:
        """Group-by item → (sql_expr, output_alias).

        Accepted shapes (MetricFlow's dunder grammar): ``status``,
        ``customer__region`` (entity-prefixed), ``order_date__month`` /
        ``metric_time__month`` (time grain), ``metric_time``.
        """
        alias = item
        grain = None
        name = item
        parts = item.split("__")
        if len(parts) > 1 and parts[-1] in _GRAINS:
            grain = parts[-1]
            name = "__".join(parts[:-1])
        # strip an entity prefix if what remains resolves to a dimension
        base = name.split("__")[-1]
        if name == "metric_time" or base == "metric_time":
            if not self.agg_time_dimension:
                raise MetricQueryError(
                    f"semantic model {self.name}: metric_time requested but "
                    "defaults.agg_time_dimension is not set")
            base = self.agg_time_dimension
        dim = self.dimensions.get(name) or self.dimensions.get(base)
        if dim is not None:
            expr = dim.get("expr") or dim["name"]
            if dim.get("type") == "time":
                native = (dim.get("type_params") or {}).get("time_granularity")
                if grain and grain != native:
                    # Spark's date_trunc yields TIMESTAMP; a truncated grain
                    # is semantically a DATE (and DuckDB agrees on the cast)
                    expr = f"CAST(DATE_TRUNC('{grain.upper()}', {expr}) AS DATE)"
                elif grain:
                    expr = f"CAST({expr} AS DATE)" if grain == "day" else expr
            elif grain:
                raise MetricQueryError(
                    f"{self.name}.{name}: grain '{grain}' on a "
                    "non-time dimension")
            return expr, alias
        ent = self.entities.get(name) or self.entities.get(base)
        if ent is not None:
            return (ent.get("expr") or ent["name"]), alias
        raise MetricQueryError(
            f"semantic model {self.name}: no dimension or entity for "
            f"group-by item {item!r} (have {sorted(self.dimensions)} / "
            f"{sorted(self.entities)})")

    def is_time_item(self, item: str) -> bool:
        """True when a group-by item resolves to a time dimension (or
        metric_time) — the keys an offset_window instance must shift."""
        parts = item.split("__")
        name = item
        if len(parts) > 1 and parts[-1] in _GRAINS:
            name = "__".join(parts[:-1])
        base = name.split("__")[-1]
        if name == "metric_time" or base == "metric_time":
            return True
        dim = self.dimensions.get(name) or self.dimensions.get(base)
        return bool(dim is not None and dim.get("type") == "time")


def _render_filter(filt: str, model: _Model) -> str:
    """Render {{ Dimension('entity__dim') }} / {{ Entity('e') }} /
    {{ TimeDimension('d', 'grain') }} templates into SQL exprs."""

    def _dim(m: re.Match) -> str:
        arg = m.group(1)
        expr, _ = model.resolve_group_by(arg)
        return expr

    def _tdim(m: re.Match) -> str:
        expr, _ = model.resolve_group_by(f"{m.group(1)}__{m.group(2)}")
        return expr

    out = re.sub(r"\{\{\s*Dimension\(\s*['\"]([^'\"]+)['\"]\s*\)\s*\}\}",
                 _dim, filt)
    out = re.sub(
        r"\{\{\s*TimeDimension\(\s*['\"]([^'\"]+)['\"]\s*,\s*['\"]([^'\"]+)['\"]\s*\)\s*\}\}",
        _tdim, out)
    out = re.sub(r"\{\{\s*Entity\(\s*['\"]([^'\"]+)['\"]\s*\)\s*\}\}",
                 _dim, out)
    return out


def _measure_agg_sql(model: _Model, measure_name: str,
                     extra_filter: Optional[str]) -> str:
    measure = model.measures.get(measure_name)
    if measure is None:
        raise MetricQueryError(
            f"measure {measure_name!r} not in semantic model {model.name}")
    agg = measure.get("agg", "sum")
    expr = str(measure.get("expr") or measure["name"])
    conds = []
    if measure.get("filter"):
        conds.append(_render_filter(str(measure["filter"]), model))
    if extra_filter:
        conds.append(_render_filter(extra_filter, model))
    if agg == "percentile":
        p = (measure.get("agg_params") or {}).get("percentile", 0.5)
        guarded = (f"CASE WHEN {' AND '.join(conds)} THEN {expr} END"
                   if conds else expr)
        return f"PERCENTILE({guarded}, {p})"
    if agg not in _AGG_SQL:
        raise MetricQueryError(
            f"measure {measure_name}: unsupported agg {agg!r}")
    if conds:
        cond = " AND ".join(f"({c})" for c in conds)
        if agg == "sum_boolean":
            return f"SUM(CASE WHEN ({cond}) AND ({expr}) THEN 1 ELSE 0 END)"
        if agg == "count":
            return f"COUNT(CASE WHEN {cond} THEN 1 END)"
        if agg == "count_distinct":
            return f"COUNT(DISTINCT CASE WHEN {cond} THEN {expr} END)"
        return _AGG_SQL[agg].format(e=f"CASE WHEN {cond} THEN {expr} END")
    return _AGG_SQL[agg].format(e=expr)


def _measure_name(spec: Any) -> tuple[str, Optional[str]]:
    """type_params.measure is a string or {name, filter?}."""
    if isinstance(spec, dict):
        return spec["name"], spec.get("filter")
    return str(spec), None


def _sanitize(name: str) -> str:
    """Metric name → identifier-safe CTE suffix."""
    return re.sub(r"[^A-Za-z0-9_]", "_", str(name))


def compile_metrics_sql(
    metric_names: list[str],
    metrics: list[Any],
    semantic_models: list[Any],
    table_for_model: dict[str, str],
    group_by: Optional[list[str]] = None,
    where: Optional[str] = None,
    order_by: Optional[list[str]] = None,
    limit: Optional[int] = None,
) -> str:
    """Compile the requested metrics into one SQL statement.

    ``table_for_model`` maps a semantic model's underlying model name (the
    ``ref()`` target) to a SQL identifier registered in the session.
    """
    group_by = list(group_by or [])
    metric_index = {_meta(m)["name"]: _meta(m) for m in metrics}
    models = [_Model(_meta(sm)) for sm in semantic_models]
    measure_owner: dict[str, _Model] = {}
    for sm in models:
        for mname in sm.measures:
            measure_owner[mname] = sm

    # resolve each requested metric into leaf (measure-level) requirements
    # plus a final value expression
    leaf_cols: dict[str, dict[str, tuple[str, Optional[str]]]] = {}
    # model-instance key -> {col_alias: (measure, extra_filter)}; an
    # instance is the model itself or an offset copy of it (offset_window
    # inputs aggregate the same table into time buckets shifted FORWARD by
    # the offset, so "revenue 1 month ago" lands on the current row's key)
    inst_meta: dict[str, tuple[str, Optional[str]]] = {}
    # instance -> (model_name, offset like "1 month" or None)
    final_exprs: list[tuple[str, str]] = []  # (sql_expr_over_leafs, alias)
    cumulative: dict[str, dict] = {}  # alias -> window spec
    conversions: dict[str, dict] = {}  # metric name -> conversion spec

    def _leaf(measure_spec: Any, metric_filter: Optional[str],
              offset: Optional[str] = None) -> str:
        mname, mfilter = _measure_name(measure_spec)
        owner = measure_owner.get(mname)
        if owner is None:
            raise MetricQueryError(f"measure {mname!r} has no semantic model")
        filt = " AND ".join(
            f"({f})" for f in (mfilter, metric_filter) if f) or None
        # md5, not hash(): Python's str hash is randomized per process, which
        # would make the compiled SQL text differ run-to-run
        alias = f"__m_{mname}" + (
            f"_off_{_sanitize(offset)}" if offset else "") + (
            f"_{__import__('hashlib').md5(filt.encode()).hexdigest()[:8]}"
            if filt else "")
        inst = owner.name + (f"__off_{_sanitize(offset)}" if offset else "")
        inst_meta[inst] = (owner.name, offset)
        leaf_cols.setdefault(inst, {})[alias] = (mname, filt)
        return alias

    def _expand(name: str) -> str:
        metric = metric_index.get(name)
        if metric is None:
            raise MetricQueryError(f"metric {name!r} is not defined")
        mtype = metric.get("type", "simple")
        tp = metric.get("type_params") or {}
        mfilter = metric.get("filter")
        if mtype in ("simple", "cumulative"):
            alias = _leaf(tp.get("measure"), mfilter)
            if mtype == "cumulative":
                ctp2 = tp.get("cumulative_type_params") or {}
                cumulative[name] = {
                    "window": tp.get("window") or ctp2.get("window"),
                    "grain_to_date": (tp.get("grain_to_date")
                                      or ctp2.get("grain_to_date")),
                    "leaf": alias,
                }
            return alias
        if mtype == "ratio":
            num = _leaf(tp["numerator"], mfilter)
            den = _leaf(tp["denominator"], mfilter)
            return f"CAST({num} AS DOUBLE) / NULLIF(CAST({den} AS DOUBLE), 0)"
        if mtype == "derived":
            expr = str(tp.get("expr", ""))
            for inp in tp.get("metrics", []):
                if isinstance(inp, dict):
                    iname, ialias = inp["name"], inp.get("alias") or inp["name"]
                    offset = inp.get("offset_window")
                else:
                    iname, ialias, offset = str(inp), str(inp), None
                if offset:
                    # period-over-period input: the referenced metric's
                    # measure re-aggregates into offset-shifted time buckets
                    # (MetricFlow offset_window, v1/metric.py MetricInput)
                    target = metric_index.get(iname)
                    if target is None:
                        raise MetricQueryError(
                            f"metric {iname!r} is not defined")
                    if target.get("type", "simple") != "simple":
                        raise MetricQueryError(
                            f"derived metric {name}: offset_window input "
                            f"{iname!r} must be a simple metric")
                    sub = _leaf(
                        (target.get("type_params") or {}).get("measure"),
                        target.get("filter"), offset=str(offset))
                else:
                    sub = _expand(iname)
                expr = re.sub(rf"\b{re.escape(ialias)}\b", f"({sub})", expr)
            return expr
        if mtype == "conversion":
            ctp = tp.get("conversion_type_params") or {}
            conversions[name] = {"ctp": ctp, "metric_filter": mfilter}
            return f"__cvv_{_sanitize(name)}"
        raise MetricQueryError(f"metric {name}: unsupported type {mtype!r}")

    for name in metric_names:
        final_exprs.append((_expand(name), name))

    if not leaf_cols and not conversions:
        raise MetricQueryError("no measures resolved for requested metrics")

    # one aggregate CTE per participating model instance (an offset input
    # is its own instance over the same table, shifted time keys)
    ctes: list[tuple[str, str]] = []
    model_by_name = {m.name: m for m in models}
    key_aliases = []
    for inst, cols in leaf_cols.items():
        model_name, offset = inst_meta[inst]
        sm = model_by_name[model_name]
        table = table_for_model.get(sm.ref_name())
        if table is None:
            raise MetricQueryError(
                f"no table registered for model {sm.ref_name()!r}")
        selects, keys = [], []
        for item in group_by:
            expr, alias = sm.resolve_group_by(item)
            if offset and sm.is_time_item(item):
                num, unit = str(offset).split()
                expr = (f"({expr}) + INTERVAL {int(num)} "
                        f"{unit.rstrip('s').upper()}")
            selects.append(f"{expr} AS {alias}")
            keys.append(alias)
        if offset and group_by and not any(
                sm.is_time_item(i) for i in group_by):
            raise MetricQueryError(
                f"offset_window input needs a time group-by "
                f"(got {group_by!r})")
        key_aliases = keys
        for alias, (measure, filt) in sorted(cols.items()):
            selects.append(f"{_measure_agg_sql(sm, measure, filt)} AS {alias}")
        sql = f"SELECT {', '.join(selects)} FROM {table}"
        if where:
            sql += f" WHERE {_render_filter(where, sm)}"
        if keys:
            sql += f" GROUP BY {', '.join(keys)}"
        ctes.append((f"__sm_{inst}", sql))

    # conversion metrics (MetricFlow ConversionTypeParams,
    # core/dbt/artifacts/resources/v1/metric.py): base events joined to
    # conversion events of the same entity strictly later (optionally within
    # `window`). Spark-first shape: converted base events come from ONE
    # LEFT SEMI join keyed on the entity (shuffle ∝ events of that entity,
    # dedup of multiple conversions for free), then two group-by-keyed
    # aggregates — never a row_number over the global timeline.
    aux_ctes: list[tuple[str, str]] = []
    for cname, spec in conversions.items():
        ctp, mfilter = spec["ctp"], spec["metric_filter"]
        base_m, base_f = _measure_name(ctp.get("base_measure"))
        conv_m, conv_f = _measure_name(ctp.get("conversion_measure"))
        owner = measure_owner.get(base_m)
        conv_owner = measure_owner.get(conv_m)
        if owner is None or conv_owner is None:
            raise MetricQueryError(
                f"conversion metric {cname}: base/conversion measure has no "
                "semantic model")
        if conv_owner is not owner:
            raise MetricQueryError(
                f"conversion metric {cname}: base and conversion measures "
                "must live on the same semantic model (cross-model "
                "conversion requires entity resolution across models)")
        for mm in (base_m, conv_m):
            if owner.measures[mm].get("agg", "sum") != "count":
                raise MetricQueryError(
                    f"conversion metric {cname}: measure {mm!r} must use "
                    "agg: count (conversion counts base events)")
        table = table_for_model.get(owner.ref_name())
        if table is None:
            raise MetricQueryError(
                f"no table registered for model {owner.ref_name()!r}")
        ent_name = ctp.get("entity") or owner.primary_entity
        ent = owner.entities.get(ent_name) if ent_name else None
        if ent is None:
            raise MetricQueryError(
                f"conversion metric {cname}: entity {ent_name!r} not found "
                f"on semantic model {owner.name}")
        ent_expr = ent.get("expr") or ent["name"]

        def _time_expr(measure_name: str) -> str:
            meas = owner.measures[measure_name]
            td = meas.get("agg_time_dimension") or owner.agg_time_dimension
            if not td:
                raise MetricQueryError(
                    f"conversion metric {cname}: measure {measure_name!r} "
                    "has no agg_time_dimension")
            dim = owner.dimensions.get(td)
            return (dim.get("expr") or td) if dim else td

        def _row_conds(measure_name: str, extra: Optional[str],
                       with_metric_filter: bool) -> list[str]:
            meas = owner.measures[measure_name]
            conds = []
            if meas.get("filter"):
                conds.append(_render_filter(str(meas["filter"]), owner))
            if extra:
                conds.append(_render_filter(str(extra), owner))
            if with_metric_filter and mfilter:
                conds.append(_render_filter(str(mfilter), owner))
            if where:
                conds.append(_render_filter(where, owner))
            return conds

        keys_sel, keys = [], []
        for item in group_by:
            expr, alias = owner.resolve_group_by(item)
            keys_sel.append(f"{expr} AS {alias}")
            keys.append(alias)
        if not key_aliases:
            key_aliases = keys
        s = _sanitize(cname)
        base_conds = _row_conds(base_m, base_f, with_metric_filter=True)
        conv_conds = _row_conds(conv_m, conv_f, with_metric_filter=False)
        bw = " AND ".join(f"({c})" for c in base_conds)
        cw = " AND ".join(f"({c})" for c in conv_conds)
        win_pred = ""
        if ctp.get("window"):
            num, unit = str(ctp["window"]).split()
            win_pred = (f" AND c.__t <= b.__t + INTERVAL {int(num)} "
                        f"{unit.rstrip('s').upper()}")
        cols_b = keys_sel + [f"{ent_expr} AS __e", f"{_time_expr(base_m)} AS __t"]
        aux_ctes.append((
            f"__cvb_{s}",
            f"SELECT {', '.join(cols_b)} FROM {table}"
            + (f" WHERE {bw}" if bw else ""),
        ))
        aux_ctes.append((
            f"__cvc_{s}",
            f"SELECT {ent_expr} AS __e, {_time_expr(conv_m)} AS __t "
            f"FROM {table}" + (f" WHERE {cw}" if cw else ""),
        ))
        aux_ctes.append((
            f"__cvs_{s}",
            f"SELECT b.* FROM __cvb_{s} b LEFT SEMI JOIN __cvc_{s} c "
            f"ON b.__e = c.__e AND c.__t > b.__t{win_pred}",
        ))
        grp = f" GROUP BY {', '.join(keys)}" if keys else ""
        klist = (", ".join(keys) + ", ") if keys else ""
        aux_ctes.append((
            f"__cvg1_{s}", f"SELECT {klist}COUNT(*) AS __bn FROM __cvb_{s}{grp}"
        ))
        aux_ctes.append((
            f"__cvg2_{s}", f"SELECT {klist}COUNT(*) AS __cn FROM __cvs_{s}{grp}"
        ))
        calc = str(ctp.get("calculation") or "conversion_rate").lower()
        if calc == "conversions":
            val = "CAST(COALESCE(g2.__cn, 0) AS BIGINT)"
        else:
            val = ("CAST(COALESCE(g2.__cn, 0) AS DOUBLE) "
                   "/ CAST(g1.__bn AS DOUBLE)")
        on = " AND ".join(f"g1.{k} <=> g2.{k}" for k in keys) or "TRUE"
        sel = (", ".join(f"g1.{k} AS {k}" for k in keys) + ", ") if keys else ""
        ctes.append((
            f"__cv_{s}",
            f"SELECT {sel}{val} AS __cvv_{s} "
            f"FROM __cvg1_{s} g1 LEFT JOIN __cvg2_{s} g2 ON {on}",
        ))

    # join the per-model aggregates on the group-by keys (full outer,
    # null-safe) — the join input is group-by cardinality, not fact rows
    base_name, base_sql = ctes[0]
    with_parts = [f"{n} AS ({s})" for n, s in aux_ctes + ctes]
    joined = base_name
    select_keys = [f"{base_name}.{k}" for k in key_aliases]
    for n, _ in ctes[1:]:
        on = " AND ".join(
            f"{joined_key} <=> {n}.{k}"
            for joined_key, k in zip(select_keys, key_aliases)
        ) or "TRUE"
        select_keys = [
            f"COALESCE({jk}, {n}.{k})"
            for jk, k in zip(select_keys, key_aliases)
        ]
        joined += f" FULL OUTER JOIN {n} ON {on}"

    out_cols = [f"{sk} AS {k}" for sk, k in zip(select_keys, key_aliases)]
    for expr, alias in final_exprs:
        win = cumulative.get(alias)
        if win is not None:
            time_keys = [k for k in key_aliases
                         if "metric_time" in k or "__" in k]
            if not time_keys:
                time_keys = key_aliases
            if not time_keys:
                raise MetricQueryError(
                    f"cumulative metric {alias} needs a time group-by")
            order_col = time_keys[0]
            frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
            if win.get("window"):
                num, unit = str(win["window"]).split()
                unit = unit.rstrip("s")
                frame = (f"RANGE BETWEEN INTERVAL {num} {unit.upper()} "
                         "PRECEDING AND CURRENT ROW")
            part_keys = [k for k in key_aliases if k != order_col]
            if win.get("grain_to_date"):
                # MTD/YTD semantics: the running total RESETS at each
                # grain_to_date boundary — partition by the truncated grain
                # (MetricFlow CumulativeTypeParams.grain_to_date)
                g = str(win["grain_to_date"]).upper()
                part_keys = part_keys + [
                    f"DATE_TRUNC('{g}', {order_col})"]
            part = f"PARTITION BY {', '.join(part_keys)} " if part_keys else ""
            out_cols.append(
                f"SUM({expr}) OVER ({part}ORDER BY {order_col} {frame}) "
                f"AS {alias}")
        else:
            out_cols.append(f"{expr} AS {alias}")

    sql = (f"WITH {', '.join(with_parts)} "
           f"SELECT {', '.join(out_cols)} FROM {joined}")
    if order_by:
        sql += f" ORDER BY {', '.join(order_by)}"
    if limit:
        sql += f" LIMIT {int(limit)}"
    return sql


def compile_saved_query(
    saved_query: Any,
    metrics: list[Any],
    semantic_models: list[Any],
    table_for_model: dict[str, str],
) -> str:
    """Compile a saved_query entry's query_params into SQL
    (schema_yaml_readers.py:739 parse; execution is the MetricFlow side)."""
    entry = _meta(saved_query)
    qp = entry.get("query_params") or {}
    group_by = []
    for item in qp.get("group_by", []) or []:
        # MetricFlow object syntax: "Dimension('order_id__status')" or
        # "TimeDimension('metric_time', 'month')"
        m = re.match(r"\s*TimeDimension\(\s*['\"]([^'\"]+)['\"]\s*,\s*['\"]([^'\"]+)['\"]\s*\)", str(item))
        if m:
            group_by.append(f"{m.group(1)}__{m.group(2)}")
            continue
        m = re.match(r"\s*(?:Dimension|Entity)\(\s*['\"]([^'\"]+)['\"]\s*\)",
                     str(item))
        group_by.append(m.group(1) if m else str(item))
    where = qp.get("where")
    if isinstance(where, list):
        where = " AND ".join(f"({w})" for w in where) or None
    return compile_metrics_sql(
        metric_names=list(qp.get("metrics", []) or []),
        metrics=metrics,
        semantic_models=semantic_models,
        table_for_model=table_for_model,
        group_by=group_by,
        where=where,
        order_by=qp.get("order_by"),
        limit=qp.get("limit"),
    )
