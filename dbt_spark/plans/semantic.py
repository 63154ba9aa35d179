"""Typed semantic-layer parsing/validation: exposures, metrics, semantic
models, saved queries, groups.

Mirrors the reference's YAML-reader validation semantics
(core/dbt/parser/schema_yaml_readers.py:85 exposures, :189 metrics, :511
semantic models, :739 saved queries, :476 groups; unparsed schemas in
core/dbt/contracts/graph/unparsed.py — UnparsedExposure.validate,
UnparsedMetric.validate, UnparsedGroup.validate) and the semantic-manifest
cross-checks (core/dbt/parser/manifest.py:480-482): required fields, enum
membership, name shape, and dangling references are errors at parse time,
not at query time.

Node storage stays the engine's generic ManifestNode (these are metadata-only
DAG leaves — they never execute), but every entry passes through the typed
validator below before a node is created, and `link_semantic_graph` resolves
metric→measure→semantic-model and saved-query→metric references into real
DAG edges after refs are resolved.
"""

from __future__ import annotations

import re
from typing import Any

from dbt_spark.plans.compile import CompilationError


class SemanticValidationError(CompilationError):
    """Parse-time semantic-layer validation failure (the reference surfaces
    these as ValidationError/ParsingError from the YAML readers, and as
    SemanticValidationFailure events from semantic-manifest validation)."""


# enums mirrored from the reference (artifacts/resources/v1/exposure.py:13,21;
# dbt_semantic_interfaces.type_enums via schema_yaml_readers.py imports)
EXPOSURE_TYPES = {"dashboard", "notebook", "analysis", "ml", "application"}
MATURITY_TYPES = {"low", "medium", "high"}
METRIC_TYPES = {"simple", "ratio", "cumulative", "derived", "conversion"}
ENTITY_TYPES = {"primary", "foreign", "unique", "natural"}
DIMENSION_TYPES = {"categorical", "time"}
AGGREGATION_TYPES = {
    "sum", "min", "max", "count_distinct", "sum_boolean", "average",
    "percentile", "median", "count",
}
TIME_GRANULARITIES = {
    "nanosecond", "microsecond", "millisecond", "second", "minute", "hour",
    "day", "week", "month", "quarter", "year",
}
EXPORT_AS_TYPES = {"table", "view"}
CONVERSION_CALC_TYPES = {"conversions", "conversion_rate"}
PERIOD_AGGS = {"first", "last", "average"}


def _err(kind: str, name: Any, msg: str) -> SemanticValidationError:
    return SemanticValidationError(f"{kind} '{name}': {msg}")


def _require(entry: dict, kind: str, *fields: str) -> None:
    name = entry.get("name", "<unnamed>")
    for f in fields:
        if entry.get(f) in (None, "", [], {}):
            raise _err(kind, name, f"required field '{f}' is missing")


def _check_owner(entry: dict, kind: str) -> None:
    """Owner must carry at least one of name/email
    (unparsed.py UnparsedExposure.validate / UnparsedGroup.validate)."""
    owner = entry.get("owner")
    if not isinstance(owner, dict) or (
        owner.get("name") is None and owner.get("email") is None
    ):
        raise _err(
            kind, entry.get("name", "<unnamed>"),
            "owner must have at least one of 'name' or 'email'",
        )


def _check_metric_name(name: str) -> None:
    """UnparsedMetric.validate's four name rules (unparsed.py)."""
    errors = []
    if " " in name:
        errors.append("cannot contain spaces")
    if len(name) > 250:
        errors.append("cannot contain more than 250 characters")
    if not re.match(r"^[A-Za-z]", name):
        errors.append("must begin with a letter")
    if not re.match(r"[\w-]+$", name):
        errors.append("must contain only letters, numbers and underscores")
    if errors:
        raise SemanticValidationError(
            f"The metric name '{name}' is invalid.  It {', '.join(errors)}"
        )


def _check_window(window: Any, owner_kind: str, owner_name: str) -> None:
    """MetricTimeWindow.parse semantics: '<count> <granularity>' with an
    integer count and a known granularity (plural accepted)."""
    if window is None:
        return
    parts = str(window).split()
    ok = (
        len(parts) == 2
        and parts[0].isdigit()
        and parts[1].lower().rstrip("s") in TIME_GRANULARITIES
    )
    if not ok:
        raise _err(
            owner_kind, owner_name,
            f"invalid window '{window}' — expected '<count> <granularity>' "
            f"like '14 days'",
        )


def _input_names(value: Any) -> list[str]:
    """Metric inputs appear as plain strings or {name: ...} dicts
    (UnparsedMetricInput / UnparsedMetricInputMeasure)."""
    if value is None:
        return []
    items = value if isinstance(value, list) else [value]
    out = []
    for item in items:
        if isinstance(item, dict):
            if item.get("name"):
                out.append(str(item["name"]))
        elif item:
            out.append(str(item))
    return out


# --------------------------------------------------------------------------
# per-entry validation (called from the YAML parse loop)
# --------------------------------------------------------------------------

def validate_exposure(entry: dict) -> None:
    _require(entry, "exposure", "name", "type", "owner")
    name, etype = entry["name"], str(entry["type"]).lower()
    if etype not in EXPOSURE_TYPES:
        raise _err(
            "exposure", name,
            f"invalid type '{entry['type']}' (expected one of {sorted(EXPOSURE_TYPES)})",
        )
    _check_owner(entry, "exposure")
    maturity = entry.get("maturity")
    if maturity is not None and str(maturity).lower() not in MATURITY_TYPES:
        raise _err(
            "exposure", name,
            f"invalid maturity '{maturity}' (expected one of {sorted(MATURITY_TYPES)})",
        )


def validate_metric(entry: dict) -> None:
    _require(entry, "metric", "name", "label", "type", "type_params")
    name, mtype = entry["name"], str(entry["type"]).lower()
    _check_metric_name(name)
    if mtype not in METRIC_TYPES:
        raise _err(
            "metric", name,
            f"invalid type '{entry['type']}' (expected one of {sorted(METRIC_TYPES)})",
        )
    tp = entry.get("type_params") or {}
    if not isinstance(tp, dict):
        raise _err("metric", name, "type_params must be a mapping")
    # per-type required params (schema_yaml_readers.py _get_metric_type_params
    # + TestInvalidDerivedMetrics / TestInvalidMetricMissingExpression shapes)
    if mtype == "simple" and not tp.get("measure"):
        raise _err("metric", name, "simple metrics require type_params.measure")
    if mtype == "ratio" and not (tp.get("numerator") and tp.get("denominator")):
        raise _err(
            "metric", name,
            "ratio metrics require type_params.numerator and type_params.denominator",
        )
    if mtype == "derived":
        if not tp.get("expr"):
            raise _err("metric", name, "derived metrics require type_params.expr")
        if not tp.get("metrics"):
            raise _err("metric", name, "derived metrics require type_params.metrics")
    if mtype == "conversion":
        ctp = tp.get("conversion_type_params")
        if not isinstance(ctp, dict):
            raise _err(
                "metric", name,
                "conversion metrics require type_params.conversion_type_params",
            )
        if not (ctp.get("base_measure") and ctp.get("conversion_measure")):
            raise _err(
                "metric", name,
                "conversion_type_params require base_measure and conversion_measure",
            )
        calc = ctp.get("calculation")
        if calc is not None and str(calc).lower() not in CONVERSION_CALC_TYPES:
            raise _err(
                "metric", name,
                f"invalid conversion calculation '{calc}' "
                f"(expected one of {sorted(CONVERSION_CALC_TYPES)})",
            )
        _check_window(ctp.get("window"), "metric", name)
        for cp in ctp.get("constant_properties") or []:
            if not (isinstance(cp, dict) and cp.get("base_property")
                    and cp.get("conversion_property")):
                raise _err(
                    "metric", name,
                    "constant_properties entries need base_property and "
                    "conversion_property (ConstantPropertyInput, "
                    "v1/metric.py:76-78)",
                )
    if mtype == "cumulative":
        ctp = tp.get("cumulative_type_params") or {}
        _check_window(tp.get("window") or ctp.get("window"), "metric", name)
        grain = tp.get("grain_to_date") or ctp.get("grain_to_date")
        if grain is not None and str(grain).lower() not in TIME_GRANULARITIES:
            raise _err(
                "metric", name,
                f"invalid grain_to_date '{grain}' "
                f"(expected one of {sorted(TIME_GRANULARITIES)})",
            )
        pa = ctp.get("period_agg")
        if pa is not None and str(pa).lower() not in PERIOD_AGGS:
            raise _err(
                "metric", name,
                f"invalid period_agg '{pa}' (expected one of {sorted(PERIOD_AGGS)})",
            )
    for inp in _iter_input_dicts(tp):
        _check_window(inp.get("offset_window"), "metric", name)
        otg = inp.get("offset_to_grain")
        if otg is not None and str(otg).lower() not in TIME_GRANULARITIES:
            raise _err(
                "metric", name,
                f"invalid offset_to_grain '{otg}' "
                f"(expected one of {sorted(TIME_GRANULARITIES)})",
            )
    mg = entry.get("time_granularity")
    if mg is not None and str(mg).lower() not in TIME_GRANULARITIES:
        raise _err(
            "metric", name,
            f"invalid time_granularity '{mg}' "
            f"(expected one of {sorted(TIME_GRANULARITIES)})",
        )


def _iter_input_dicts(tp: dict):
    for key in ("measure", "numerator", "denominator"):
        if isinstance(tp.get(key), dict):
            yield tp[key]
    for item in tp.get("metrics") or []:
        if isinstance(item, dict):
            yield item


def validate_semantic_model(entry: dict) -> None:
    _require(entry, "semantic model", "name", "model")
    name = entry["name"]
    model = str(entry["model"])
    if "ref(" not in model:
        raise _err(
            "semantic model", name,
            f"'model' must be a ref() expression, got {model!r}",
        )
    for ent in entry.get("entities") or []:
        _require(ent, "entity", "name", "type")
        if str(ent["type"]).lower() not in ENTITY_TYPES:
            raise _err(
                "semantic model", name,
                f"entity '{ent['name']}' has invalid type '{ent['type']}' "
                f"(expected one of {sorted(ENTITY_TYPES)})",
            )
    for dim in entry.get("dimensions") or []:
        _require(dim, "dimension", "name", "type")
        dtype = str(dim["type"]).lower()
        if dtype not in DIMENSION_TYPES:
            raise _err(
                "semantic model", name,
                f"dimension '{dim['name']}' has invalid type '{dim['type']}' "
                f"(expected one of {sorted(DIMENSION_TYPES)})",
            )
        if dtype == "time":
            tp = dim.get("type_params") or {}
            gran = tp.get("time_granularity")
            if gran is None:
                raise _err(
                    "semantic model", name,
                    f"time dimension '{dim['name']}' requires "
                    "type_params.time_granularity",
                )
            if str(gran).lower() not in TIME_GRANULARITIES:
                raise _err(
                    "semantic model", name,
                    f"time dimension '{dim['name']}' has invalid granularity "
                    f"'{gran}' (expected one of {sorted(TIME_GRANULARITIES)})",
                )
    for meas in entry.get("measures") or []:
        _require(meas, "measure", "name", "agg")
        agg = str(meas["agg"]).lower()
        if agg not in AGGREGATION_TYPES:
            raise _err(
                "semantic model", name,
                f"measure '{meas['name']}' has invalid agg '{meas['agg']}' "
                f"(expected one of {sorted(AGGREGATION_TYPES)})",
            )
        if agg == "percentile":
            ap = meas.get("agg_params") or {}
            if ap.get("percentile") is None:
                raise _err(
                    "semantic model", name,
                    f"measure '{meas['name']}' uses percentile aggregation, "
                    "which requires agg_params.percentile",
                )
        if agg == "count" and not meas.get("expr"):
            raise _err(
                "semantic model", name,
                f"measure '{meas['name']}' uses a count aggregation, which "
                "requires an expr",
            )
        nad = meas.get("non_additive_dimension")
        if nad is not None:
            # NonAdditiveDimension (v1/semantic_model.py:143-147): name +
            # window_choice + window_groupings; only MIN/MAX pick a
            # meaningful snapshot row
            if not isinstance(nad, dict) or not nad.get("name"):
                raise _err(
                    "semantic model", name,
                    f"measure '{meas['name']}': non_additive_dimension "
                    "must be a mapping with a 'name'",
                )
            wc = str(nad.get("window_choice", "min")).lower()
            if wc not in ("min", "max"):
                raise _err(
                    "semantic model", name,
                    f"measure '{meas['name']}': non_additive_dimension "
                    f"window_choice must be min or max, got '{wc}'",
                )
            wg = nad.get("window_groupings")
            if wg is not None and not isinstance(wg, list):
                raise _err(
                    "semantic model", name,
                    f"measure '{meas['name']}': window_groupings must be "
                    "a list of entity names",
                )


def validate_saved_query(entry: dict) -> None:
    _require(entry, "saved query", "name", "query_params")
    name = entry["name"]
    qp = entry.get("query_params")
    if not isinstance(qp, dict):
        raise _err("saved query", name, "query_params must be a mapping")
    if not qp.get("metrics"):
        raise _err("saved query", name, "query_params.metrics must be non-empty")
    # saved-query-level config (SavedQueryConfig, v1/saved_query.py:59-79):
    # export_as default + cache.enabled flag
    sq_cfg = entry.get("config")
    if sq_cfg is not None:
        if not isinstance(sq_cfg, dict):
            raise _err("saved query", name, "config must be a mapping")
        export_as = sq_cfg.get("export_as")
        if export_as is not None and str(export_as).lower() not in EXPORT_AS_TYPES:
            raise _err(
                "saved query", name,
                f"config.export_as '{export_as}' is invalid "
                f"(expected one of {sorted(EXPORT_AS_TYPES)})",
            )
        cache = sq_cfg.get("cache")
        if cache is not None and not isinstance(cache, dict):
            raise _err(
                "saved query", name,
                "config.cache must be a mapping (SavedQueryCache, "
                "v1/saved_query.py:54-56)",
            )
    for exp in entry.get("exports") or []:
        _require(exp, "export", "name")
        cfg = exp.get("config") or {}
        export_as = cfg.get("export_as")
        if export_as is not None and str(export_as).lower() not in EXPORT_AS_TYPES:
            raise _err(
                "saved query", name,
                f"export '{exp['name']}' has invalid export_as '{export_as}' "
                f"(expected one of {sorted(EXPORT_AS_TYPES)})",
            )


def validate_group(entry: dict) -> None:
    _require(entry, "group", "name", "owner")
    _check_owner(entry, "group")


VALIDATORS = {
    "exposures": validate_exposure,
    "metrics": validate_metric,
    "semantic_models": validate_semantic_model,
    "saved_queries": validate_saved_query,
    "groups": validate_group,
}


def validate_entry(section: str, entry: dict) -> None:
    """Entry point for the YAML parse loop — raises SemanticValidationError."""
    validator = VALIDATORS.get(section)
    if validator is not None:
        if not isinstance(entry, dict):
            raise SemanticValidationError(
                f"{section} entries must be mappings, got {type(entry).__name__}"
            )
        validator(entry)


# --------------------------------------------------------------------------
# cross-node semantic graph validation + DAG edge resolution
# --------------------------------------------------------------------------

def link_semantic_graph(manifest) -> None:
    """Resolve metric→measure→semantic-model, derived-metric→metric, and
    saved-query→metric references into DAG edges; dangling references are
    errors (semantic-manifest validation, core/dbt/parser/manifest.py:480-482;
    metric graph edges: TestMetricDependsOn in tests/functional/metrics).
    """
    from dbt_spark.plans.manifest import NodeType  # local import avoids a cycle

    semantic_models = [
        n for n in manifest.nodes.values()
        if n.resource_type == NodeType.SemanticModel
    ]
    metrics = {
        n.name: n for n in manifest.nodes.values()
        if n.resource_type == NodeType.Metric
    }

    # measure name -> owning semantic model (measure names are globally unique
    # in the reference's semantic manifest)
    measure_owner: dict[str, Any] = {}
    for sm in semantic_models:
        for meas in sm.config.meta.get("measures") or []:
            mname = meas.get("name") if isinstance(meas, dict) else str(meas)
            if not mname:
                continue
            if mname in measure_owner:
                raise SemanticValidationError(
                    f"measure '{mname}' is defined in both "
                    f"'{measure_owner[mname].name}' and '{sm.name}' — measure "
                    "names must be unique across semantic models"
                )
            measure_owner[mname] = sm

    # measures with create_metric: true expose a same-named proxy metric
    # (Measure.create_metric, v1/semantic_model.py:154) — resolvable by
    # saved queries and derived inputs without a declared metric entry
    proxy_owner = {
        (meas.get("name") if isinstance(meas, dict) else str(meas)): sm
        for sm in semantic_models
        for meas in sm.config.meta.get("measures") or []
        if isinstance(meas, dict) and meas.get("create_metric")
    }

    def _resolve_metric_dep(node, mname: str, what: str) -> None:
        dep = metrics.get(mname)
        if dep is None:
            owner = proxy_owner.get(mname)
            if owner is None:
                raise SemanticValidationError(
                    f"{what} '{node.name}': metric '{mname}' does not exist")
            dep = owner
        if dep.unique_id not in node.depends_on:
            node.depends_on.append(dep.unique_id)

    def _link_measure(metric, measure_ref, what: str) -> None:
        for mname in _input_names(measure_ref):
            owner = measure_owner.get(mname)
            if owner is None:
                raise SemanticValidationError(
                    f"metric '{metric.name}': {what} references measure "
                    f"'{mname}', which is not defined by any semantic model"
                )
            if owner.unique_id not in metric.depends_on:
                metric.depends_on.append(owner.unique_id)

    for metric in metrics.values():
        tp = metric.config.meta.get("type_params") or {}
        mtype = str(metric.config.meta.get("type", "")).lower()
        if mtype in ("simple", "cumulative"):
            _link_measure(metric, tp.get("measure"), "type_params.measure")
        if mtype == "ratio":
            for key in ("numerator", "denominator"):
                ref = tp.get(key)
                names = _input_names(ref)
                # ratio inputs are METRIC references; fall back to measures
                # for the measure-shorthand form
                for n in names:
                    if n in metrics:
                        dep = metrics[n]
                        if dep.unique_id not in metric.depends_on:
                            metric.depends_on.append(dep.unique_id)
                    else:
                        _link_measure(metric, n, f"type_params.{key}")
        if mtype == "conversion":
            ctp = tp.get("conversion_type_params") or {}
            _link_measure(metric, ctp.get("base_measure"), "base_measure")
            _link_measure(metric, ctp.get("conversion_measure"), "conversion_measure")
        if mtype == "derived":
            for mname in _input_names(tp.get("metrics")):
                if mname not in metrics and mname in proxy_owner:
                    _resolve_metric_dep(metric, mname, "metric")
                    continue
                dep = metrics.get(mname)
                if dep is None:
                    raise SemanticValidationError(
                        f"metric '{metric.name}': derived input metric "
                        f"'{mname}' does not exist"
                    )
                if dep.unique_id not in metric.depends_on:
                    metric.depends_on.append(dep.unique_id)

    for node in manifest.nodes.values():
        if node.resource_type != NodeType.SavedQuery:
            continue
        qp = node.config.meta.get("query_params") or {}
        for mname in _input_names(qp.get("metrics")):
            _resolve_metric_dep(node, mname, "saved query")
