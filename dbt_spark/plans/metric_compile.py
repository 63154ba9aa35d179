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
  within an optional window; conversions | conversion_rate calculations;
  DOCUMENTED DIVERGENCE, now with a fidelity mode: by default the
  conversion must be STRICTLY later than its base event (c.__t > b.__t)
  where MetricFlow's join is inclusive (base.ts <= conv.ts) — the strict
  form avoids counting an event as its own conversion when base and
  conversion share a table and timestamp, and has been pinned by this
  engine's oracles since round 4; declaring
  ``conversion_type_params.fidelity: inclusive`` compiles the
  MetricFlow-exact bound (c.__t >= b.__t) for users porting MetricFlow
  results that must match on same-timestamp events;
  base and conversion measures may live on DIFFERENT semantic models that
  share the entity — each side resolves its own entity/time exprs),
  derived offset_window inputs (period-over-period: the input re-aggregates
  into time buckets shifted forward by the offset) and offset_to_grain
  inputs (grain-anchored: each output period LEFT-joins the input's value
  at the start of its containing grain via a DATE_TRUNC key mapping),
  conversion constant_properties (extra base↔conversion equalities riding
  the same entity semi-join),
  cumulative with grain_to_date resets (MTD/YTD) (post-aggregate running window over the
  time grain — requires metric_time in the group-by);
- entity-linked cross-model dimensions: ``customer__region``-style group-by
  and filter items whose dimension lives on ANOTHER semantic model reached
  through a shared entity (semantic_model.py:201-206 entity links) compile
  to one broadcastable LEFT JOIN per hop against a key+dims projection of
  the dimension model (see ``_LinkedModel``);
- ``join_to_timespine`` / ``fill_nulls_with`` on a metric's input measure
  (v1/metric.py:36-37): the result LEFT JOINs onto a generated date spine
  at the requested grain (sequence() over min/max scalar subqueries) so
  empty periods appear, optionally zero-filled; non-time group-bys are
  crossed with the spine for panel-shaped output.

Supported agg types mirror the reference's AggregationType enum
(core/dbt/artifacts/resources/types.py): sum, min, max, avg, count,
count_distinct, sum_boolean, median, percentile.
"""

from __future__ import annotations

import re
from typing import Any, Optional

from dbt_spark.plans.semantic import SemanticValidationError

_GRAINS = {"day", "week", "month", "quarter", "year"}
# fineness order for picking a declared spine: a spine can serve any grain
# at or coarser than its own standard granularity
_GRAIN_ORDER = {"day": 0, "week": 1, "month": 2, "quarter": 3, "year": 4}

_UNIT_DAYS = {"day": 1, "week": 7}
_UNIT_MONTHS = {"month": 1, "quarter": 3, "year": 12}


def _interval_sql(count: int, unit: str) -> str:
    """'<count> <unit>' → a Spark-valid interval expression. Spark interval
    literals have NO QUARTER unit (valid: YEAR/MONTH/WEEK/DAY/...), so
    quarters rewrite to 3n MONTH."""
    u = str(unit).rstrip("s").lower()
    if u == "quarter":
        return f"INTERVAL {int(count) * 3} MONTH"
    return f"INTERVAL {int(count)} {u.upper()}"


def _window_in_grain(count: int, unit: str, grain: str) -> Optional[int]:
    """A '<count> <unit>' window as a whole number of <grain> periods, when
    the conversion is calendar-exact (day/week are day-based; month/quarter/
    year are month-based — the two families never mix exactly). None when
    not exactly convertible."""
    u = str(unit).rstrip("s").lower()
    g = str(grain).rstrip("s").lower()
    if u in _UNIT_DAYS and g in _UNIT_DAYS:
        n = int(count) * _UNIT_DAYS[u]
        return n // _UNIT_DAYS[g] if n % _UNIT_DAYS[g] == 0 else None
    if u in _UNIT_MONTHS and g in _UNIT_MONTHS:
        n = int(count) * _UNIT_MONTHS[u]
        return n // _UNIT_MONTHS[g] if n % _UNIT_MONTHS[g] == 0 else None
    return None

_AGG_SQL = {
    "sum": "SUM({e})",
    "min": "MIN({e})",
    "max": "MAX({e})",
    # the reference's AggregationType enum spells it "average"
    # (core/dbt/artifacts/resources/types.py); "avg" kept as an alias
    "average": "AVG({e})",
    "avg": "AVG({e})",
    "count": "COUNT({e})",
    "count_distinct": "COUNT(DISTINCT {e})",
    "sum_boolean": "SUM(CASE WHEN ({e}) THEN 1 ELSE 0 END)",
    "median": "MEDIAN({e})",
}


def _filt(value: Any) -> Optional[str]:
    """Normalize a filter value: the reference's WhereFilterIntersection
    (v1/metric.py MetricInputMeasure.filter / Metric.filter) accepts a single
    SQL string or a LIST of strings that must all hold — a list becomes one
    AND-joined predicate."""
    if value is None:
        return None
    if isinstance(value, (list, tuple)):
        parts = [str(v) for v in value if v]
        return " AND ".join(f"({p})" for p in parts) or None
    return str(value)


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

    def _time_parts(self, item: str):
        """(raw_expr, effective_grain) of a time group-by item: the
        un-truncated dimension expression plus the grain the item is
        queried at (its __grain suffix, else the dimension's native
        time_granularity, else day)."""
        parts = item.split("__")
        grain = None
        name = item
        if len(parts) > 1 and parts[-1] in _GRAINS:
            grain = parts[-1]
            name = "__".join(parts[:-1])
        base = name.split("__")[-1]
        if name == "metric_time" or base == "metric_time":
            if not self.agg_time_dimension:
                raise MetricQueryError(
                    f"semantic model {self.name}: metric_time requested but "
                    "defaults.agg_time_dimension is not set")
            base = self.agg_time_dimension
            name = base
        dim = self.dimensions.get(name) or self.dimensions.get(base)
        if dim is None or dim.get("type") != "time":
            raise MetricQueryError(
                f"semantic model {self.name}: {item!r} is not a time "
                "dimension")
        raw = dim.get("expr") or dim["name"]
        native = (dim.get("type_params") or {}).get("time_granularity")
        return raw, (grain or native or "day")

    def item_grain(self, item: str) -> str:
        """Effective grain a time item is queried at."""
        return self._time_parts(item)[1]

    def resolve_group_by_shifted(self, item: str, count: int,
                                 unit: str) -> str:
        """Time group-by expr with the RAW time value shifted BEFORE grain
        truncation (offset_window semantics): a row at Jan-28 shifted
        +7 days belongs to FEBRUARY at month grain. Shifting the truncated
        key instead would yield off-grain keys (month-start + 7 days) that
        can never match the anchor leg's keys."""
        raw, grain = self._time_parts(item)
        shifted = f"({raw}) + {_interval_sql(count, unit)}"
        if grain == "day":
            return f"CAST({shifted} AS DATE)"
        return f"CAST(DATE_TRUNC('{grain.upper()}', {shifted}) AS DATE)"


class _LinkedModel:
    """Entity-link resolver: wraps an owning ``_Model`` and resolves
    ``entity__dimension[__grain]`` group-by items whose dimension lives on a
    DIFFERENT semantic model, reached through a shared entity (the reference
    parses entity links on semantic models —
    core/dbt/artifacts/resources/v1/semantic_model.py:201-206 — and hands
    query-time resolution to MetricFlow; this is that resolution step,
    Spark-first).

    Resolution order: the owning model first (its own dimensions/entities,
    including the existing entity-prefix-strip fallback), then entity hops:
    the prefix must name an entity on the owning model, and the remainder
    must resolve — on exactly one other semantic model where that entity is
    ``primary``/``unique`` (the one-row-per-key side, so the join can never
    fan out fact rows) — either locally OR through a FURTHER entity hop
    (``order__customer__region``-style multi-hop chains, each hop
    primary/unique-guarded the same way). Ambiguity — two eligible models
    exposing the same (entity, remainder) — is an error at every hop,
    mirroring MetricFlow's ambiguous-linkable-element diagnostics; cycles
    (model A linking back into an already-visited model) are cut by a
    visited set, so a self-referential entity graph diagnoses as
    unresolvable instead of recursing forever.

    Scale: each hop compiles to ONE broadcast-friendly LEFT JOIN against a
    two-ish-column projection of the dimension table (``__ek`` + the
    requested dims); a multi-hop chain nests the next hop's LEFT JOIN
    INSIDE that projection subquery, so the chain materializes as
    dim⋈dim joins at dimension cardinality — Catalyst column-prunes every
    dim scan and AQE broadcasts them; the fact table never re-shuffles."""

    def __init__(self, owner: _Model, models: list[_Model],
                 table_for_model: dict[str, str],
                 visited: Optional[frozenset[str]] = None,
                 spines: Optional[list[dict]] = None) -> None:
        self.owner = owner
        self._models = models
        self._tables = table_for_model
        self._visited = (visited or frozenset()) | {owner.name}
        self._spines = spines or []
        # (entity, target model) -> {"alias", "model", "cols": {col: item}}
        # spine joins use ("__ts__", spine model, fact key expr) keys and
        # carry {"spine", "on_left"} instead of {"model", "entity"}
        self.joins: dict[tuple, dict] = {}

    def __getattr__(self, name: str):  # delegate .measures/.name/... to owner
        return getattr(self.owner, name)

    def resolve_group_by(self, item: str) -> tuple[str, str]:
        try:
            return self.owner.resolve_group_by(item)
        except MetricQueryError as local_err:
            linked = self._resolve_linked(item)
            if linked is not None:
                return linked
            custom = self._resolve_custom_grain(item)
            if custom is not None:
                return custom
            raise local_err

    def is_time_item(self, item: str) -> bool:
        if self.owner.is_time_item(item):
            return True
        hop = self._find_target(item)
        if hop is None:
            return False
        target, rest = hop
        return self._hop_resolver(target).is_time_item(rest)

    def _hop_resolver(self, target: _Model) -> "_LinkedModel":
        """Resolver for the NEXT hop: same model universe and spine
        registry, this chain's visited set carried forward (cycle cut)."""
        return _LinkedModel(target, self._models, self._tables,
                            visited=self._visited, spines=self._spines)

    def _hop_resolves(self, m: _Model, rest: str) -> bool:
        """Does ``rest`` resolve on ``m`` — locally, via further hops, or
        as a custom-granularity item? Probes on a throwaway resolver so no
        joins leak; ambiguity / fan-out diagnostics raised by inner hops
        propagate (they are genuine errors for this chain, not resolution
        misses)."""
        try:
            m.resolve_group_by(rest)
            return True
        except MetricQueryError:
            pass
        probe = self._hop_resolver(m)
        if probe._resolve_linked(rest) is not None:
            return True
        try:
            return probe._resolve_custom_grain(rest) is not None
        except MetricQueryError:
            return False

    def _find_target(self, item: str) -> Optional[tuple[_Model, str]]:
        """``entity__rest`` → (target model, rest) or None; raises on
        ambiguity or a non-unique entity on every candidate. ``rest`` may
        itself be an entity chain (multi-hop) resolved recursively."""
        parts = item.split("__")
        if len(parts) < 2:
            return None
        ent_name, rest = parts[0], "__".join(parts[1:])
        if ent_name not in self.owner.entities:
            return None
        candidates, non_unique = [], []
        for m in self._models:
            if (m is self.owner or m.name in self._visited
                    or ent_name not in m.entities):
                continue
            if not self._hop_resolves(m, rest):
                continue
            if m.entities[ent_name].get("type") in ("primary", "unique"):
                candidates.append(m)
            else:
                non_unique.append(m)
        if not candidates:
            if non_unique:
                raise MetricQueryError(
                    f"entity link {item!r}: dimension {rest!r} found via "
                    f"entity {ent_name!r} only on model(s) "
                    f"{sorted(m.name for m in non_unique)} where the entity "
                    "is not primary/unique — joining would fan out fact "
                    "rows; mark the entity primary/unique on the dimension "
                    "model")
            return None
        if len(candidates) > 1:
            raise MetricQueryError(
                f"ambiguous entity link {item!r}: entity {ent_name!r} with "
                f"dimension {rest!r} resolves on multiple semantic models "
                f"{sorted(m.name for m in candidates)}")
        return candidates[0], rest

    def _resolve_linked(self, item: str) -> Optional[tuple[str, str]]:
        hop = self._find_target(item)
        if hop is None:
            return None
        target, rest = hop
        ent_name = item.split("__")[0]
        key = (ent_name, target.name)
        join = self.joins.setdefault(key, {
            "alias": f"__j_{_sanitize(ent_name)}_{_sanitize(target.name)}",
            "entity": ent_name,
            "model": target,
            "cols": {},
        })
        col = f"__d_{_sanitize(item)}"
        join["cols"][col] = rest
        return f"{join['alias']}.{col}", item

    # -- declared time-spine custom granularities ---------------------------

    def custom_grain_of(self, item: str) -> Optional[dict]:
        """The declared spine serving ``item``'s trailing custom-granularity
        name, or None. Raises if two spine models declare the same name
        (ambiguous, mirroring the reference's unique-granularity-name rule,
        core/dbt/parser/manifest.py custom-granularity validation)."""
        parts = item.split("__")
        if len(parts) < 2 or not self._spines:
            return None
        gname = parts[-1]
        if gname in _GRAINS:
            return None
        hits = [sp for sp in self._spines
                if any(cg.get("name") == gname
                       for cg in sp.get("custom_granularities") or [])]
        if not hits:
            return None
        if len(hits) > 1:
            raise MetricQueryError(
                f"custom granularity {gname!r} is declared by multiple "
                f"time-spine models {sorted(sp['model'] for sp in hits)}")
        return hits[0]

    @staticmethod
    def _spine_key_expr(sp: dict) -> str:
        """The spine table's standard-granularity column as a DATE key at
        its own grain — the join key the fact side truncates to."""
        std = sp["standard_granularity_column"]
        g = str(sp.get("granularity") or "day")
        if g == "day":
            return f"CAST({std} AS DATE)"
        return f"CAST(DATE_TRUNC('{g.upper()}', {std}) AS DATE)"

    def _resolve_custom_grain(self, item: str) -> Optional[tuple[str, str]]:
        """``<time_item>__<custom_granularity>`` → spine-joined expr.

        The reference's model-level ``time_spine:`` config
        (core/dbt/artifacts/resources/v1/model.py:26-35 TimeSpine /
        CustomGranularity, parsed core/dbt/parser/schemas.py:730-744)
        declares a calendar table: one row per standard-granularity period
        plus columns for user-defined calendars (fiscal quarters, 4-4-5
        weeks). A group-by at a custom granularity joins the fact's time
        dimension — truncated to the spine's standard grain — onto that
        one-row-per-period table and groups by the custom column.

        Scale: the spine is O(periods) rows (years of days ≈ thousands);
        the LEFT JOIN broadcasts and can never fan out fact rows because
        the spine is unique per standard-grain value by construction."""
        sp = self.custom_grain_of(item)
        if sp is None:
            return None
        parts = item.split("__")
        gname, base = parts[-1], "__".join(parts[:-1])
        sgran = str(sp.get("granularity") or "day")
        try:
            key_expr, _ = self.resolve_group_by(f"{base}__{sgran}")
        except MetricQueryError as exc:
            raise MetricQueryError(
                f"custom granularity {gname!r} in {item!r}: the base item "
                f"{base!r} must resolve as a time dimension at the spine "
                f"model {sp['model']!r}'s {sgran} grain") from exc
        cgs = {cg["name"]: (cg.get("column_name") or cg["name"])
               for cg in sp.get("custom_granularities") or []}
        key = ("__ts__", sp["model"], key_expr)
        join = self.joins.setdefault(key, {
            "alias": f"__ts_{_sanitize(sp['model'])}_{len(self.joins)}",
            "spine": sp,
            "on_left": key_expr,
            "cols": {},
        })
        col = f"__g_{_sanitize(item)}"
        join["cols"][col] = cgs[gname]
        return f"{join['alias']}.{col}", item

    def joined_from(self, table: str) -> str:
        """FROM clause: the base table plus one LEFT JOIN per entity hop,
        each against a pre-projected (key, dims…) subquery so the only
        columns the dim side exposes are ``__ek`` and ``__d_*`` — no
        name collisions with base-table measure exprs. A multi-hop chain
        resolves the remainder on the hop target's OWN resolver, so the
        next hop's LEFT JOIN nests inside this projection subquery."""
        sql = table
        for join in self.joins.values():
            if "spine" in join:
                sp = join["spine"]
                t_table = self._tables.get(sp["model"])
                if t_table is None:
                    raise MetricQueryError(
                        f"no table registered for time-spine model "
                        f"{sp['model']!r}")
                cols = ", ".join(f"{src} AS {col}" for col, src
                                 in sorted(join["cols"].items()))
                sub = (f"(SELECT {self._spine_key_expr(sp)} AS __sk, {cols} "
                       f"FROM {t_table}) {join['alias']}")
                sql += (f" LEFT JOIN {sub} ON {join['on_left']} "
                        f"= {join['alias']}.__sk")
                continue
            target, ent_name = join["model"], join["entity"]
            t_table = self._tables.get(target.ref_name())
            if t_table is None:
                raise MetricQueryError(
                    f"no table registered for model {target.ref_name()!r} "
                    f"(entity link via {ent_name!r})")
            t_ent = target.entities[ent_name]
            o_ent = self.owner.entities[ent_name]
            lm_t = self._hop_resolver(target)
            cols = ", ".join(
                f"{lm_t.resolve_group_by(rest)[0]} AS {col}"
                for col, rest in sorted(join["cols"].items()))
            sub = (f"(SELECT {t_ent.get('expr') or ent_name} AS __ek, {cols} "
                   f"FROM {lm_t.joined_from(t_table)}) {join['alias']}")
            sql += (f" LEFT JOIN {sub} ON {o_ent.get('expr') or ent_name} "
                    f"= {join['alias']}.__ek")
        return sql


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

    def _dim_grain(m: re.Match) -> str:
        expr, _ = model.resolve_group_by(f"{m.group(1)}__{m.group(2)}")
        return expr

    # the chained ".grain('month')" form first — the bare-Dimension regex
    # would otherwise leave the suffix behind as raw SQL
    out = re.sub(
        r"\{\{\s*Dimension\(\s*['\"]([^'\"]+)['\"]\s*\)\s*\.\s*grain\(\s*"
        r"['\"]([^'\"]+)['\"]\s*\)\s*\}\}", _dim_grain, filt)
    out = re.sub(r"\{\{\s*Dimension\(\s*['\"]([^'\"]+)['\"]\s*\)\s*\}\}",
                 _dim, out)
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
    agg = str(measure.get("agg", "sum")).lower()
    expr = str(measure.get("expr") or measure["name"])
    conds = []
    # normalize FIRST: a filter list of all-falsy entries ([""] / [null])
    # must behave like no filter, not crash _render_filter on None
    mf = _filt(measure.get("filter"))
    if mf:
        conds.append(_render_filter(mf, model))
    if extra_filter:
        conds.append(_render_filter(extra_filter, model))
    if agg == "percentile":
        # MeasureAggregationParameters (v1/semantic_model.py:136-140):
        # percentile value plus discrete/approximate flavor flags.
        # continuous (default) = interpolated PERCENTILE; discrete =
        # PERCENTILE_DISC (an actual data value); approximate = t-digest
        # APPROX_PERCENTILE (one pass, mergeable sketches — the 100 TB path)
        ap = measure.get("agg_params") or {}
        p = ap.get("percentile", 0.5)
        guarded = (f"CASE WHEN {' AND '.join(conds)} THEN {expr} END"
                   if conds else expr)
        if ap.get("use_approximate_percentile"):
            return f"APPROX_PERCENTILE({guarded}, {p})"
        if ap.get("use_discrete_percentile"):
            return f"PERCENTILE_DISC({p}) WITHIN GROUP (ORDER BY {guarded})"
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
        return spec["name"], _filt(spec.get("filter"))
    return str(spec), None


def _sanitize(name: str) -> str:
    """Metric name → identifier-safe CTE suffix."""
    return re.sub(r"[^A-Za-z0-9_]", "_", str(name))


def _nad_from(sm: _Model, nad: dict, table: str,
              group_by: list[str],
              lm: Optional["_LinkedModel"] = None) -> str:
    """Semi-additive pre-filter (Measure.non_additive_dimension,
    core/dbt/artifacts/resources/v1/semantic_model.py:143-147
    NonAdditiveDimension + :158): keep only the fact rows at the
    ``window_choice`` (MIN/MAX) value of the named time dimension, computed
    per ``window_groupings`` entity group and per queried time bucket — the
    bank-balance semantics: SUM over accounts is additive, SUM over days is
    not, so a month-grain query sums each account's balance at its first or
    last snapshot date inside the month.

    Spark-first shape: a GROUP BY aggregate of (groupings × time buckets →
    window value) — map-side partial, group-cardinality output — joined
    back to the fact on the grouping keys plus equality with the window
    value. Deliberately NOT a ``MIN(..) OVER ()`` window: with no
    groupings that window is unpartitioned (single-task sort at scale),
    while this aggregate stays distributed and AQE broadcasts the small
    window-value side."""
    name = str(nad.get("name") or "")
    choice = str(nad.get("window_choice") or "min").lower()
    if choice not in ("min", "max"):
        raise MetricQueryError(
            f"non_additive_dimension {name!r}: window_choice must be min "
            f"or max, got {choice!r}")
    dim = sm.dimensions.get(name)
    if dim is None or dim.get("type") != "time":
        raise MetricQueryError(
            f"non_additive_dimension {name!r} must name a time dimension "
            f"on semantic model {sm.name} (have "
            f"{sorted(d for d, v in sm.dimensions.items() if v.get('type') == 'time')})")
    nad_expr = dim.get("expr") or dim["name"]
    parts: list[str] = []
    for g in nad.get("window_groupings") or []:
        ent = sm.entities.get(str(g))
        if ent is not None:
            parts.append(ent.get("expr") or ent["name"])
            continue
        expr, _ = sm.resolve_group_by(str(g))
        parts.append(expr)
    for item in group_by:
        # queried time buckets scope the window: balance-at-month-end per
        # month, not one global snapshot — resolved on the OWNER model
        # (the window runs before entity-hop joins exist). A CUSTOM-grain
        # bucket would need the spine join inside the pre-hop window —
        # silently leaving it out would compute one GLOBAL snapshot and
        # blank every other period, so it is an explicit error instead
        if lm is not None and lm.custom_grain_of(item):
            raise MetricQueryError(
                f"non_additive_dimension measures cannot be queried at the "
                f"custom granularity {item!r} (the semi-additive window is "
                "computed before the time-spine join); use a standard "
                "grain")
        if sm.is_time_item(item):
            expr, _ = sm.resolve_group_by(item)
            parts.append(expr)
    if parts:
        nk = [f"{e} AS __nk{i}" for i, e in enumerate(parts)]
        on = " AND ".join(
            [f"({e}) <=> __nw.__nk{i}" for i, e in enumerate(parts)]
            + [f"({nad_expr}) = __nw.__nad_w"])
        agg_sql = (f"SELECT {', '.join(nk)}, {choice.upper()}({nad_expr}) "
                   f"AS __nad_w FROM {table} GROUP BY "
                   f"{', '.join(str(i + 1) for i in range(len(parts)))}")
    else:
        on = f"({nad_expr}) = __nw.__nad_w"
        agg_sql = (f"SELECT {choice.upper()}({nad_expr}) AS __nad_w "
                   f"FROM {table}")
    return (f"(SELECT __nf.* FROM {table} __nf JOIN ({agg_sql}) __nw "
            f"ON {on}) __nadbase")


def compile_metrics_sql(
    metric_names: list[str],
    metrics: list[Any],
    semantic_models: list[Any],
    table_for_model: dict[str, str],
    group_by: Optional[list[str]] = None,
    where: Optional[str] = None,
    order_by: Optional[list[str]] = None,
    limit: Optional[int] = None,
    time_spines: Optional[list[dict]] = None,
) -> str:
    """Compile the requested metrics into one SQL statement.

    ``table_for_model`` maps a semantic model's underlying model name (the
    ``ref()`` target) to a SQL identifier registered in the session.

    ``time_spines`` carries user-declared time-spine models (the
    reference's model-level ``time_spine:`` config —
    core/dbt/artifacts/resources/v1/model.py:26-35 TimeSpine, parsed at
    core/dbt/parser/schemas.py:730-744): each entry is
    ``{"model": <ref name, also a table_for_model key>,
    "standard_granularity_column": <col>, "granularity": <grain of that
    column, from the column-level granularity: key; default day>,
    "custom_granularities": [{"name", "column_name"?}, ...]}``.
    When declared, ``join_to_timespine`` joins the spine MODEL instead of
    generating a sequence() spine, and group-by grains may name a custom
    granularity column (fiscal calendars)."""
    group_by = list(group_by or [])
    time_spines = list(time_spines or [])
    metric_index = {_meta(m)["name"]: _meta(m) for m in metrics}
    # metric-level time_granularity (Metric.time_granularity,
    # v1/metric.py:133): a BARE metric_time group-by defaults to the
    # requested metrics' declared grain — the COARSEST among them, since a
    # finer bucket would misstate the coarser metric (MetricFlow's
    # common-grain rule). The output column is named at the applied grain,
    # exactly as MetricFlow names it.
    declared = [
        str(metric_index[n].get("time_granularity"))
        for n in metric_names
        if metric_index.get(n, {}).get("time_granularity")
    ]
    if declared and any(g not in _GRAINS for g in declared):
        bad = sorted(set(g for g in declared if g not in _GRAINS))
        raise MetricQueryError(
            f"metric time_granularity must be a standard grain, got {bad}")
    if declared:
        coarsest = max(declared, key=lambda g: _GRAIN_ORDER[g])
        group_by = [
            f"metric_time__{coarsest}" if item == "metric_time" else item
            for item in group_by
        ]
        if order_by:
            # the rewrite renames the OUTPUT column — an order_by naming
            # bare metric_time must follow or ORDER BY fails to resolve
            order_by = [
                re.sub(r"^metric_time\b", f"metric_time__{coarsest}",
                       str(item).strip())
                for item in order_by
            ]
    models = [_Model(_meta(sm)) for sm in semantic_models]
    measure_owner: dict[str, _Model] = {}
    for sm in models:
        for mname in sm.measures:
            measure_owner[mname] = sm

    # create_metric: true (Measure.create_metric,
    # v1/semantic_model.py:154) — the measure auto-exposes a proxy: a
    # simple metric named after itself, unless a declared metric already
    # claims the name
    for sm in models:
        for mname, meas in sm.measures.items():
            if meas.get("create_metric") and mname not in metric_index:
                metric_index[mname] = {
                    "name": mname, "type": "simple",
                    "type_params": {"measure": mname}}

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
    spine_cfg: dict[str, dict] = {}  # metric name -> timespine/fill spec

    def _leaf(measure_spec: Any, metric_filter: Optional[str],
              offset: Optional[str] = None,
              offset_grain: Optional[str] = None) -> str:
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
            f"_otg_{_sanitize(offset_grain)}" if offset_grain else "") + (
            f"_{__import__('hashlib').md5(filt.encode()).hexdigest()[:8]}"
            if filt else "")
        inst = owner.name + (
            f"__off_{_sanitize(offset)}" if offset else "") + (
            f"__otg_{_sanitize(offset_grain)}" if offset_grain else "")
        nad = owner.measures[mname].get("non_additive_dimension")
        if nad:
            if offset or offset_grain:
                raise MetricQueryError(
                    f"measure {mname!r}: offset inputs over a "
                    "non_additive_dimension measure are not supported")
            # a semi-additive measure aggregates over a PRE-FILTERED fact
            # (rows at the window_choice value of the NAD), so it gets its
            # own model instance — other measures keep the plain scan
            inst += f"__nad_{_sanitize(mname)}"
        inst_meta[inst] = (owner.name, offset, offset_grain, nad)
        leaf_cols.setdefault(inst, {})[alias] = (mname, filt)
        return alias

    def _offset_leaf(name: str, in_filter: Optional[str],
                     offset: Optional[str], offset_grain: Optional[str],
                     what: str) -> str:
        """A metric input carrying offset_window / offset_to_grain: the
        target must be a simple metric; its measure re-aggregates as an
        offset instance with the target's own filter AND the input-level
        filter applied (MetricInput.filter, v1/metric.py:64)."""
        target = metric_index.get(name)
        if target is None:
            raise MetricQueryError(f"metric {name!r} is not defined")
        if target.get("type", "simple") != "simple":
            raise MetricQueryError(
                f"{what}: offset input {name!r} must be a simple metric")
        if offset_grain and str(offset_grain) not in _GRAINS:
            raise MetricQueryError(
                f"{what}: offset_to_grain {offset_grain!r} is not a "
                "standard grain")
        combined = " AND ".join(
            f"({f})" for f in (_filt(target.get("filter")), in_filter)
            if f) or None
        return _leaf((target.get("type_params") or {}).get("measure"),
                     combined,
                     offset=str(offset) if offset else None,
                     offset_grain=str(offset_grain) if offset_grain else None)

    def _metric_input(spec: Any, outer_filter: Optional[str],
                      what: str) -> str:
        """Resolve a ratio numerator/denominator as a MetricInput
        (v1/metric.py:62-73: a METRIC reference with optional input-level
        filter and offset_window/offset_to_grain), falling back to the
        legacy measure shorthand when the name is a measure, not a metric."""
        name = spec["name"] if isinstance(spec, dict) else str(spec)
        in_filter = _filt(spec.get("filter")) if isinstance(spec, dict) else None
        offset = spec.get("offset_window") if isinstance(spec, dict) else None
        offset_grain = (spec.get("offset_to_grain")
                        if isinstance(spec, dict) else None)
        target = metric_index.get(name)
        if target is None:
            # measure shorthand: offsets are a MetricInput-only concept
            if offset or offset_grain:
                raise MetricQueryError(
                    f"{what}: {name!r} is not a metric — offset_window/"
                    "offset_to_grain need a metric input")
            if name not in measure_owner:
                raise MetricQueryError(
                    f"{what}: {name!r} is neither a metric nor a measure")
            combined = " AND ".join(
                f"({f})" for f in (in_filter, outer_filter) if f) or None
            return _leaf(name, combined)
        if offset or offset_grain:
            if offset and offset_grain:
                raise MetricQueryError(
                    f"{what}: input {name!r} cannot set both offset_window "
                    "and offset_to_grain")
            combined = " AND ".join(
                f"({f})" for f in (in_filter, outer_filter) if f) or None
            return _offset_leaf(name, combined, offset, offset_grain, what)
        if target.get("type", "simple") == "simple":
            combined = " AND ".join(
                f"({f})" for f in (_filt(target.get("filter")), in_filter,
                                   outer_filter) if f) or None
            return _leaf((target.get("type_params") or {}).get("measure"),
                         combined)
        if in_filter or outer_filter:
            raise MetricQueryError(
                f"{what}: a filter on input {name!r} needs a simple input "
                f"metric (got type {target.get('type')!r} — filters cannot "
                "push inside an already-composed metric)")
        return _expand(name)

    def _expand(name: str, top: bool = False) -> str:
        metric = metric_index.get(name)
        if metric is None:
            raise MetricQueryError(f"metric {name!r} is not defined")
        mtype = metric.get("type", "simple")
        tp = metric.get("type_params") or {}
        mfilter = _filt(metric.get("filter"))
        if mtype == "cumulative" and not top:
            # the running window applies AFTER the group-by joins, only to
            # requested metrics — expanding a cumulative metric inside a
            # derived/ratio expression would silently substitute its
            # per-period leaf for the running total
            raise MetricQueryError(
                f"cumulative metric {name!r} cannot be used as a "
                "derived/ratio input (its running window applies at the "
                "query level); reference the cumulative metric directly")
        if mtype in ("simple", "cumulative"):
            alias = _leaf(tp.get("measure"), mfilter)
            # join_to_timespine / fill_nulls_with live on the measure input
            # (core/dbt/artifacts/resources/v1/metric.py:36-37,
            # MetricInputMeasure): zero/NULL-fill periods the data skips
            spec = tp.get("measure")
            sflags = spec if isinstance(spec, dict) else {}
            fill = sflags.get("fill_nulls_with") if isinstance(spec, dict) \
                else None
            if top and (sflags.get("join_to_timespine")
                        or fill is not None):
                spine_cfg[name] = {
                    "spine": bool(sflags.get("join_to_timespine")),
                    "fill": fill,
                    "owner": measure_owner.get(_measure_name(spec)[0]),
                }
            elif not top and fill is not None:
                # nested use: the fill applies VALUE-level inside the
                # consuming expression (a panel spine is the requested
                # metric's concern, not the input's)
                return f"COALESCE({alias}, {fill})"
            if mtype == "cumulative":
                ctp2 = tp.get("cumulative_type_params") or {}
                period_agg = str(ctp2.get("period_agg") or "first").lower()
                if period_agg not in ("first", "last", "average"):
                    raise MetricQueryError(
                        f"cumulative metric {name}: period_agg "
                        f"{period_agg!r} must be first | last | average")
                cumulative[name] = {
                    "window": tp.get("window") or ctp2.get("window"),
                    "grain_to_date": (tp.get("grain_to_date")
                                      or ctp2.get("grain_to_date")),
                    "leaf": alias,
                    "period_agg": period_agg,
                    "measure": tp.get("measure"),
                    "mfilter": mfilter,
                    "owner": measure_owner.get(
                        _measure_name(tp.get("measure"))[0]),
                }
            return alias
        if mtype == "ratio":
            # numerator/denominator are MetricInput refs (v1/metric.py:100-103
            # MetricTypeParams.numerator: MetricInput) — metric names with
            # optional input filter/offset; bare measure names still accepted
            # as the legacy shorthand
            num = _metric_input(tp["numerator"], mfilter,
                                f"ratio metric {name}: numerator")
            den = _metric_input(tp["denominator"], mfilter,
                                f"ratio metric {name}: denominator")
            return f"CAST({num} AS DOUBLE) / NULLIF(CAST({den} AS DOUBLE), 0)"
        if mtype == "derived":
            expr = str(tp.get("expr", ""))
            for inp in tp.get("metrics", []):
                if isinstance(inp, dict):
                    iname, ialias = inp["name"], inp.get("alias") or inp["name"]
                    offset = inp.get("offset_window")
                    offset_grain = inp.get("offset_to_grain")
                    in_filter = _filt(inp.get("filter"))
                else:
                    iname, ialias = str(inp), str(inp)
                    offset = offset_grain = in_filter = None
                if offset and offset_grain:
                    raise MetricQueryError(
                        f"derived metric {name}: input {iname!r} cannot set "
                        "both offset_window and offset_to_grain")
                if offset or offset_grain:
                    # offset_window: period-over-period — the input
                    # re-aggregates into time buckets shifted FORWARD by the
                    # offset. offset_to_grain: grain-anchored — every output
                    # period reads the input's value at the START of its
                    # containing grain (v1/metric.py MetricInput
                    # offset_window/offset_to_grain)
                    sub = _offset_leaf(iname, in_filter, offset, offset_grain,
                                       f"derived metric {name}")
                elif in_filter:
                    # input-level filter (MetricInput.filter, v1/metric.py:64):
                    # resolved exactly like a ratio MetricInput — except a
                    # derived input must name a METRIC, never a bare measure
                    if iname not in metric_index:
                        raise MetricQueryError(
                            f"metric {iname!r} is not defined")
                    sub = _metric_input(inp, None, f"derived metric {name}")
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
        final_exprs.append((_expand(name, top=True), name))

    if not leaf_cols and not conversions:
        raise MetricQueryError("no measures resolved for requested metrics")

    # one aggregate CTE per participating model instance (an offset input
    # is its own instance over the same table: offset_window shifts time
    # keys forward; offset_to_grain keeps natural keys and LEFT-joins via a
    # grain-truncated key mapping — entries carry (name, sql, jspec))
    ctes: list[tuple] = []
    model_by_name = {m.name: m for m in models}
    key_aliases = []
    for inst, cols in leaf_cols.items():
        model_name, offset, offset_grain, nad = inst_meta[inst]
        sm = model_by_name[model_name]
        lm = _LinkedModel(sm, models, table_for_model,
                          spines=time_spines)
        table = table_for_model.get(sm.ref_name())
        if table is None:
            raise MetricQueryError(
                f"no table registered for model {sm.ref_name()!r}")
        if nad:
            table = _nad_from(sm, nad, table, group_by, lm=lm)
        selects, keys, time_keys = [], [], []
        for item in group_by:
            expr, alias = lm.resolve_group_by(item)
            if lm.is_time_item(item):
                time_keys.append(alias)
                if offset:
                    # shift the RAW time BEFORE truncating to the item's
                    # grain: a Jan-28 row + 7 days belongs to FEBRUARY at
                    # month grain; shifting the truncated key would emit
                    # off-grain keys that never match the anchor leg.
                    # Resolved on the OWNER model — an offset time item
                    # reached through an entity hop is not supported
                    num, unit = str(offset).split()
                    expr = sm.resolve_group_by_shifted(item, int(num), unit)
            selects.append(f"{expr} AS {alias}")
            keys.append(alias)
        if (offset or offset_grain) and not time_keys:
            raise MetricQueryError(
                f"offset_window/offset_to_grain input needs a time "
                f"group-by (got {group_by!r})")
        key_aliases = keys
        for alias, (measure, filt) in sorted(cols.items()):
            selects.append(f"{_measure_agg_sql(lm, measure, filt)} AS {alias}")
        where_sql = f" WHERE {_render_filter(where, lm)}" if where else ""
        # joined_from LAST: group-by/filter/measure resolution above may
        # have accumulated entity-hop joins
        sql = f"SELECT {', '.join(selects)} FROM {lm.joined_from(table)}"
        sql += where_sql
        if keys:
            sql += f" GROUP BY {', '.join(keys)}"
        jspec = ({"grain": offset_grain, "time_keys": set(time_keys)}
                 if offset_grain else None)
        ctes.append((f"__sm_{inst}", sql, jspec))

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
        for side_owner, mm in ((owner, base_m), (conv_owner, conv_m)):
            if side_owner.measures[mm].get("agg", "sum") != "count":
                raise MetricQueryError(
                    f"conversion metric {cname}: measure {mm!r} must use "
                    "agg: count (conversion counts base events)")
        table = table_for_model.get(owner.ref_name())
        conv_table = table_for_model.get(conv_owner.ref_name())
        if table is None or conv_table is None:
            raise MetricQueryError(
                f"no table registered for model {owner.ref_name()!r} / "
                f"{conv_owner.ref_name()!r}")
        # the conversion entity must exist on BOTH sides (cross-model
        # conversion resolves it per model — each side joins through its own
        # entity expr, MetricFlow's entity-equality semantics)
        ent_name = ctp.get("entity") or owner.primary_entity
        ent = owner.entities.get(ent_name) if ent_name else None
        conv_ent = conv_owner.entities.get(ent_name) if ent_name else None
        if ent is None or conv_ent is None:
            raise MetricQueryError(
                f"conversion metric {cname}: entity {ent_name!r} not found "
                f"on semantic model(s) "
                f"{owner.name if ent is None else ''}"
                f"{' / ' if ent is None and conv_ent is None else ''}"
                f"{conv_owner.name if conv_ent is None else ''}")
        ent_expr = ent.get("expr") or ent["name"]
        conv_ent_expr = conv_ent.get("expr") or conv_ent["name"]
        lmc = _LinkedModel(owner, models, table_for_model,
                           spines=time_spines)
        lmc_conv = (lmc if conv_owner is owner
                    else _LinkedModel(conv_owner, models, table_for_model,
                                      spines=time_spines))

        def _time_expr(side_owner: _Model, measure_name: str) -> str:
            meas = side_owner.measures[measure_name]
            td = (meas.get("agg_time_dimension")
                  or side_owner.agg_time_dimension)
            if not td:
                raise MetricQueryError(
                    f"conversion metric {cname}: measure {measure_name!r} "
                    "has no agg_time_dimension")
            dim = side_owner.dimensions.get(td)
            return (dim.get("expr") or td) if dim else td

        def _row_conds(side_owner: _Model, resolver: Any,
                       measure_name: str, extra: Optional[str],
                       with_metric_filter: bool,
                       with_where: bool) -> list[str]:
            meas = side_owner.measures[measure_name]
            conds = []
            mf = _filt(meas.get("filter"))
            if mf:
                conds.append(_render_filter(mf, resolver))
            if extra:
                conds.append(_render_filter(str(extra), resolver))
            if with_metric_filter and mfilter:
                conds.append(_render_filter(str(mfilter), resolver))
            if with_where and where:
                conds.append(_render_filter(where, resolver))
            return conds

        keys_sel, keys = [], []
        for item in group_by:
            expr, alias = lmc.resolve_group_by(item)
            keys_sel.append(f"{expr} AS {alias}")
            keys.append(alias)
        if not key_aliases:
            key_aliases = keys
        s = _sanitize(cname)
        base_conds = _row_conds(owner, lmc, base_m, base_f,
                                with_metric_filter=True, with_where=True)
        # the query-level `where` references the BASE model's dims; apply it
        # on the conversion side only when both measures share the model
        conv_conds = _row_conds(conv_owner, lmc_conv, conv_m, conv_f,
                                with_metric_filter=False,
                                with_where=conv_owner is owner)
        bw = " AND ".join(f"({c})" for c in base_conds)
        cw = " AND ".join(f"({c})" for c in conv_conds)
        # fidelity (engine extension on ConversionTypeParams): 'strict'
        # (default, c.__t > b.__t — this engine's oracle-pinned semantics
        # since round 4) or 'inclusive' (c.__t >= b.__t — MetricFlow's
        # join bound; base.ts <= conv.ts in its generated SQL). Inclusive
        # mode counts a conversion sharing the base event's timestamp —
        # including the base event itself when both measures read the same
        # table — exactly as MetricFlow does; opt in per metric when
        # porting MetricFlow results that must match to the row.
        fidelity = str(ctp.get("fidelity") or "strict").lower()
        if fidelity not in ("strict", "inclusive"):
            raise MetricQueryError(
                f"conversion metric {cname}: fidelity must be 'strict' or "
                f"'inclusive', got {fidelity!r}")
        cmp_op = ">=" if fidelity == "inclusive" else ">"
        win_pred = ""
        if ctp.get("window"):
            num, unit = str(ctp["window"]).split()
            win_pred = (f" AND c.__t <= b.__t "
                        f"+ {_interval_sql(int(num), unit)}")
        # constant_properties (ConversionTypeParams.constant_properties,
        # v1/metric.py:86-87): extra equalities the conversion row must
        # share with its base row (same session, same campaign, ...) —
        # each property resolves on ITS OWN side's model and becomes one
        # more equi-key of the semi-join (still one keyed shuffle)
        cp_b, cp_c, cp_pred = [], [], ""
        for i, cp in enumerate(ctp.get("constant_properties") or []):
            bexpr, _ = lmc.resolve_group_by(str(cp["base_property"]))
            cexpr, _ = lmc_conv.resolve_group_by(
                str(cp["conversion_property"]))
            cp_b.append(f"{bexpr} AS __cp{i}")
            cp_c.append(f"{cexpr} AS __cp{i}")
            cp_pred += f" AND b.__cp{i} <=> c.__cp{i}"
        cols_b = keys_sel + [
            f"{ent_expr} AS __e", f"{_time_expr(owner, base_m)} AS __t",
        ] + cp_b
        from_b = lmc.joined_from(table)
        from_c = (from_b if conv_owner is owner
                  else lmc_conv.joined_from(conv_table))
        aux_ctes.append((
            f"__cvb_{s}",
            f"SELECT {', '.join(cols_b)} FROM {from_b}"
            + (f" WHERE {bw}" if bw else ""),
        ))
        aux_ctes.append((
            f"__cvc_{s}",
            f"SELECT {conv_ent_expr} AS __e, "
            f"{_time_expr(conv_owner, conv_m)} AS __t"
            + ("".join(f", {c}" for c in cp_c))
            + f" FROM {from_c}" + (f" WHERE {cw}" if cw else ""),
        ))
        aux_ctes.append((
            f"__cvs_{s}",
            f"SELECT b.* FROM __cvb_{s} b LEFT SEMI JOIN __cvc_{s} c "
            f"ON b.__e = c.__e AND c.__t {cmp_op} b.__t{win_pred}{cp_pred}",
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

    # cumulative metrics queried at a CUSTOM granularity roll up the
    # spine-grain running total per custom period with period_agg
    # (CumulativeTypeParams.period_agg, v1/metric.py:90-94 — first | last |
    # average; MetricFlow applies it exactly when the query grain is a
    # custom calendar). Pipeline per metric: (1) one keyed aggregate of the
    # measure at the spine's standard grain, (2) running window at that
    # grain (group-by cardinality rows), (3) broadcast join onto the
    # O(periods) spine's custom column, (4) MIN_BY/MAX_BY/AVG per
    # (dims × custom period).
    for idx, (_expr0, alias) in enumerate(list(final_exprs)):
        win = cumulative.get(alias)
        if win is None or win.get("owner") is None:
            continue
        owner = win["owner"]
        lm = _LinkedModel(owner, models, table_for_model, spines=time_spines)
        cg_items = [(i, a) for i, a in zip(group_by, key_aliases)
                    if lm.custom_grain_of(i)]
        if not cg_items:
            continue
        if len(cg_items) > 1 or any(lm.is_time_item(i) for i in group_by):
            raise MetricQueryError(
                f"cumulative metric {alias}: combine at most ONE custom "
                "granularity with non-time dimensions (mixing custom and "
                "standard time grains is not supported)")
        item, calias = cg_items[0]
        sp = lm.custom_grain_of(item)
        gname, base_item = item.split("__")[-1], "__".join(
            item.split("__")[:-1])
        sgran = str(sp.get("granularity") or "day")
        base_expr, _ = lm.resolve_group_by(f"{base_item}__{sgran}")
        other = [(i, a) for i, a in zip(group_by, key_aliases)
                 if a != calias]
        table = table_for_model.get(owner.ref_name())
        sp_table = table_for_model.get(sp["model"])
        if table is None or sp_table is None:
            raise MetricQueryError(
                f"no table registered for {owner.ref_name()!r} / "
                f"time-spine model {sp['model']!r}")
        meas = _measure_agg_sql(
            lm, _measure_name(win["measure"])[0], win.get("mfilter"))
        where_sql = f" WHERE {_render_filter(where, lm)}" if where else ""
        s2 = _sanitize(alias)
        sel = ([f"{lm.resolve_group_by(i)[0]} AS {a}" for i, a in other]
               + [f"{base_expr} AS __d", f"{meas} AS __v"])
        grp_cols = [a for _, a in other] + ["__d"]
        aux_ctes.append((
            f"__cgd_{s2}",
            f"SELECT {', '.join(sel)} FROM {lm.joined_from(table)}"
            f"{where_sql} GROUP BY {', '.join(grp_cols)}"))
        part_keys = [a for _, a in other]
        if win.get("grain_to_date"):
            part_keys = part_keys + [
                f"DATE_TRUNC('{str(win['grain_to_date']).upper()}', __d)"]
        part = (f"PARTITION BY {', '.join(part_keys)} " if part_keys else "")
        frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        if win.get("window"):
            # strict lower bound (MetricFlow: event_time > t - window) over
            # spine-grain keys: a trailing window of W = k periods covers
            # keys [t-(k-1)·grain, t] — an INTERVAL W PRECEDING frame would
            # include the t-W boundary key, one period too many
            num, unit = str(win["window"]).split()
            kk = _window_in_grain(int(num), unit, sgran)
            if kk is None or kk < 1:
                raise MetricQueryError(
                    f"cumulative metric {alias}: window {win['window']!r} "
                    f"is not a whole number of the spine's {sgran!r} "
                    "periods")
            frame = (f"RANGE BETWEEN {_interval_sql(kk - 1, sgran)} "
                     "PRECEDING AND CURRENT ROW")
        aux_ctes.append((
            f"__cgc_{s2}",
            f"SELECT *, SUM(__v) OVER ({part}ORDER BY __d {frame}) AS __c "
            f"FROM __cgd_{s2}"))
        cgs = {cg["name"]: (cg.get("column_name") or cg["name"])
               for cg in sp.get("custom_granularities") or []}
        agg = {"first": "MIN_BY(c.__c, c.__d)",
               "last": "MAX_BY(c.__c, c.__d)",
               "average": "AVG(c.__c)"}[win.get("period_agg") or "first"]
        klist = ", ".join(
            [f"c.{a}" for _, a in other] + [f"sp.__g AS {calias}"])
        grp2 = ", ".join([f"c.{a}" for _, a in other] + ["sp.__g"])
        ctes.append((
            f"__cg_{s2}",
            f"SELECT {klist}, {agg} AS __cgv_{s2} FROM __cgc_{s2} c "
            f"JOIN (SELECT {_LinkedModel._spine_key_expr(sp)} AS __sk, "
            f"{cgs[gname]} AS __g FROM {sp_table}) sp ON c.__d = sp.__sk "
            f"GROUP BY {grp2}",
            None,
        ))
        final_exprs[idx] = (f"__cgv_{s2}", alias)
        del cumulative[alias]

    # join the per-model aggregates on the group-by keys — FULL OUTER and
    # null-safe for plain/offset_window instances (the union of both legs'
    # key combos survives), LEFT JOIN through a DATE_TRUNC key mapping for
    # offset_to_grain instances (each output period reads the input's
    # value at its grain start; the anchor leg owns the output periods).
    # Join input is group-by cardinality either way, never fact rows.
    plain = [c for c in ctes if (c[2] if len(c) > 2 else None) is None]
    special = [c for c in ctes if (c[2] if len(c) > 2 else None) is not None]
    if not plain:
        raise MetricQueryError(
            "offset_to_grain inputs need at least one non-offset metric "
            "leg to anchor the output periods")
    ordered = plain + special
    base_name = ordered[0][0]
    with_parts = [f"{c[0]} AS ({c[1]})" for c in aux_ctes + ctes]
    joined = base_name
    select_keys = [f"{base_name}.{k}" for k in key_aliases]
    for entry in ordered[1:]:
        n = entry[0]
        jspec = entry[2] if len(entry) > 2 else None
        if jspec is not None:
            g = str(jspec["grain"]).upper()
            on = " AND ".join(
                (f"CAST(DATE_TRUNC('{g}', {jk}) AS DATE) = {n}.{k}"
                 if k in jspec["time_keys"] else f"{jk} <=> {n}.{k}")
                for jk, k in zip(select_keys, key_aliases)
            ) or "TRUE"
            joined += f" LEFT JOIN {n} ON {on}"
            continue  # LEFT JOIN adds no key combos: select_keys unchanged
        on = " AND ".join(
            f"{joined_key} <=> {n}.{k}"
            for joined_key, k in zip(select_keys, key_aliases)
        ) or "TRUE"
        select_keys = [
            f"COALESCE({jk}, {n}.{k})"
            for jk, k in zip(select_keys, key_aliases)
        ]
        joined += f" FULL OUTER JOIN {n} ON {on}"

    requested = {alias for _, alias in final_exprs}
    spined = {a: c for a, c in spine_cfg.items()
              if a in requested and c["spine"]}

    out_cols = [f"{sk} AS {k}" for sk, k in zip(select_keys, key_aliases)]
    for expr, alias in final_exprs:
        win = cumulative.get(alias)
        if win is not None:
            # the running window's ORDER BY must be a genuine TIME item of
            # the owner model — matching on name shape ("__" in the alias)
            # would mistake entity-linked dimensions for the time axis and
            # silently order the running total across a categorical key
            owner = win.get("owner")
            owner_lm = (_LinkedModel(owner, models, table_for_model,
                                     spines=time_spines)
                        if owner is not None else None)
            time_pairs = [(i, a) for i, a in zip(group_by, key_aliases)
                          if owner_lm is not None
                          and owner_lm.is_time_item(i)]
            if not time_pairs:
                raise MetricQueryError(
                    f"cumulative metric {alias} needs a time group-by "
                    f"(got {group_by!r})")
            order_item, order_col = time_pairs[0]
            frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
            if win.get("window"):
                # strict lower bound (MetricFlow: event_time > t - window):
                # keys sit at the queried grain, so a W = k-period trailing
                # window is the frame [t-(k-1)·grain, t]; INTERVAL W
                # PRECEDING would include the t-W key — one period extra
                num, unit = str(win["window"]).split()
                grain = owner.item_grain(order_item)
                kk = _window_in_grain(int(num), unit, grain)
                if kk is None or kk < 1:
                    raise MetricQueryError(
                        f"cumulative metric {alias}: window "
                        f"{win['window']!r} is not a whole number of "
                        f"{grain!r} periods (query at a grain the window "
                        "converts to exactly)")
                frame = (f"RANGE BETWEEN {_interval_sql(kk - 1, grain)} "
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
            cfg = spine_cfg.get(alias)
            if cfg and cfg["fill"] is not None and alias not in spined:
                # fill_nulls_with WITHOUT a timespine: coalesce the value
                # (e.g. a full-outer-joined multi-model miss) in place
                expr = f"COALESCE({expr}, {cfg['fill']})"
            out_cols.append(f"{expr} AS {alias}")

    if spined:
        # join_to_timespine: LEFT JOIN the metric result onto a generated
        # date spine at the requested grain so periods with no rows appear
        # (NULL or fill_nulls_with). MetricFlow reads the spine from a
        # time_spine model; here the spine is generated from the measure
        # owner's own time range — sequence() over (SELECT MIN/MAX),
        # a 2-row scalar-subquery scan, then an O(periods)-row explode.
        # Non-time group-bys are crossed with the spine (DISTINCT over the
        # already-aggregated result, group-by cardinality) so every
        # (dims × period) cell exists — panel-shaped zero-fill.
        # every spined metric's measure owner contributes to the spine range:
        # the spine spans the UNION of owners' time ranges (MIN of MINs /
        # MAX of MAXes), so a second spined metric on another model is never
        # truncated to the first owner's range
        owners: list[_Model] = []
        for c in spined.values():
            o = c["owner"]
            if o is not None and all(o.name != p.name for p in owners):
                owners.append(o)
        # a group-by item counts as the time item if ANY spined owner sees
        # it as one (the per-owner bounds loop below still errors if some
        # owner cannot resolve it — that is the real constraint)
        resolvers = [_LinkedModel(o, models, table_for_model,
                                  spines=time_spines) for o in owners]
        time_pairs = []
        for item, alias in zip(group_by, key_aliases):
            if any(lm.is_time_item(item) or lm.custom_grain_of(item)
                   for lm in resolvers):
                time_pairs.append((item, alias))
        if not time_pairs:
            raise MetricQueryError(
                "join_to_timespine requires a time-dimension (or "
                f"metric_time) group-by item (got {group_by!r})")
        time_item, tk = time_pairs[0]
        parts = time_item.split("__")
        custom_sp = resolvers[0].custom_grain_of(time_item)
        if custom_sp is not None:
            # custom granularity: the declared spine IS the period
            # enumeration — its distinct custom-column values (O(periods))
            cgs = {cg["name"]: (cg.get("column_name") or cg["name"])
                   for cg in custom_sp.get("custom_granularities") or []}
            sp_table = table_for_model.get(custom_sp["model"])
            if sp_table is None:
                raise MetricQueryError(
                    f"no table registered for time-spine model "
                    f"{custom_sp['model']!r}")
            spine_sql = (f"SELECT DISTINCT {cgs[parts[-1]]} AS {tk} "
                         f"FROM {sp_table}")
        elif time_spines:
            # declared time-spine model(s): pick the COARSEST spine still
            # fine enough for the requested grain (smallest scan that can
            # serve it — MetricFlow's spine-selection rule); truncate its
            # standard column and dedup, O(periods) rows
            grain = parts[-1] if parts[-1] in _GRAINS else "day"
            eligible = [sp for sp in time_spines
                        if _GRAIN_ORDER.get(
                            str(sp.get("granularity") or "day"), 0)
                        <= _GRAIN_ORDER[grain]]
            if not eligible:
                raise MetricQueryError(
                    f"join_to_timespine at {grain!r} grain: no declared "
                    "time-spine model is fine enough (have "
                    f"{[(sp['model'], sp.get('granularity') or 'day') for sp in time_spines]})")
            sp = max(eligible, key=lambda s: _GRAIN_ORDER.get(
                str(s.get("granularity") or "day"), 0))
            std = sp["standard_granularity_column"]
            sgran = str(sp.get("granularity") or "day")
            if grain == sgran:
                kexpr = f"CAST({std} AS DATE)"
            else:
                kexpr = f"CAST(DATE_TRUNC('{grain.upper()}', {std}) AS DATE)"
            sp_table = table_for_model.get(sp["model"])
            if sp_table is None:
                raise MetricQueryError(
                    f"no table registered for time-spine model "
                    f"{sp['model']!r}")
            spine_sql = (f"SELECT DISTINCT {kexpr} AS {tk} "
                         f"FROM {sp_table}")
        else:
            # no declared spine: generate one from the UNION of the spined
            # owners' own time ranges — sequence() over min/max scalar
            # subqueries, a 2-row scan then an O(periods)-row explode
            bounds = []
            for o in owners:
                try:
                    kexpr, _ = o.resolve_group_by(time_item)
                except MetricQueryError as exc:
                    raise MetricQueryError(
                        "join_to_timespine: the time group-by must resolve "
                        "on every spined measure's own semantic model "
                        f"(failed on {o.name})") from exc
                bounds.append((kexpr, table_for_model[o.ref_name()]))
            grain = parts[-1] if parts[-1] in _GRAINS else "day"
            step = ("INTERVAL 7 DAY" if grain == "week"
                    else f"INTERVAL 1 {grain.upper()}")
            lo = ", ".join(f"(SELECT MIN({e}) FROM {t})" for e, t in bounds)
            hi = ", ".join(f"(SELECT MAX({e}) FROM {t})" for e, t in bounds)
            if len(bounds) > 1:
                lo, hi = f"LEAST({lo})", f"GREATEST({hi})"
            spine_sql = (f"SELECT explode(sequence({lo}, {hi}, {step})) "
                         f"AS {tk}")
        with_parts.append(
            f"__res AS (SELECT {', '.join(out_cols)} FROM {joined})")
        with_parts.append(f"__spine AS ({spine_sql})")
        others = [k for k in key_aliases if k != tk]
        if others:
            with_parts.append(
                f"__grid AS (SELECT s.{tk}, {', '.join(f'd.{k}' for k in others)} "
                f"FROM __spine s CROSS JOIN "
                f"(SELECT DISTINCT {', '.join(others)} FROM __res) d)")
            grid = "__grid"
        else:
            grid = "__spine"
        on = " AND ".join(f"g.{k} <=> __res.{k}" for k in key_aliases)
        sel = [f"g.{k} AS {k}" for k in key_aliases]
        for _, alias in final_exprs:
            cfg = spine_cfg.get(alias)
            if cfg and cfg["fill"] is not None:
                sel.append(f"COALESCE(__res.{alias}, {cfg['fill']}) AS {alias}")
            else:
                sel.append(f"__res.{alias} AS {alias}")
        sql = (f"WITH {', '.join(with_parts)} SELECT {', '.join(sel)} "
               f"FROM {grid} g LEFT JOIN __res ON {on}")
    else:
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
    time_spines: Optional[list[dict]] = None,
) -> str:
    """Compile a saved_query entry's query_params into SQL
    (schema_yaml_readers.py:739 parse; execution is the MetricFlow side)."""
    entry = _meta(saved_query)
    qp = entry.get("query_params") or {}

    def _object_item(item: str) -> str:
        # MetricFlow object syntax: "Dimension('order_id__status')",
        # "TimeDimension('metric_time', 'month')", "Entity('e')", plus the
        # ".grain('month')" chained form — which must NOT silently
        # truncate to the bare (native-grain) dimension
        s = str(item)
        m = re.match(
            r"\s*TimeDimension\(\s*['\"]([^'\"]+)['\"]\s*,\s*"
            r"['\"]([^'\"]+)['\"]\s*\)", s)
        if m:
            return f"{m.group(1)}__{m.group(2)}"
        m = re.match(
            r"\s*(?:Dimension|Entity)\(\s*['\"]([^'\"]+)['\"]\s*\)"
            r"(?:\s*\.\s*grain\(\s*['\"]([^'\"]+)['\"]\s*\))?", s)
        if m:
            return (f"{m.group(1)}__{m.group(2)}" if m.group(2)
                    else m.group(1))
        return s

    group_by = [_object_item(i) for i in qp.get("group_by", []) or []]
    # order_by accepts the same object syntax with an optional leading '-'
    # for descending (MetricFlow's order-by spelling)
    order_by = []
    for item in qp.get("order_by", []) or []:
        s = str(item).strip()
        desc = s.startswith("-")
        resolved = _object_item(s[1:] if desc else s)
        order_by.append(f"{resolved} DESC" if desc else resolved)
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
        order_by=order_by or None,
        limit=qp.get("limit"),
        time_spines=time_spines,
    )
