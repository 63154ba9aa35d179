"""dbt-native unit tests: fixture-driven single-model tests.

Reference: given/expect fixtures become ephemeral input overrides for one
model run, then actual vs expected rows are diffed
(core/dbt/parser/unit_tests.py:60-198 — fixtures become ephemeral ModelNodes
:134-160; execution + daff diff core/dbt/task/test.py:205-283; fixture formats
dict/csv core/dbt/artifacts/resources/v1/unit_test_definition.py:26-57).

Spark-first: each ``given`` becomes ``spark.createDataFrame(rows)`` registered
as a temp view; the tested model's SQL runs with ref/source resolution
redirected to those views; the diff is a full-outer anti-compare on the
expected columns (order-insensitive, like the reference's sorted daff diff).
"""

from __future__ import annotations

import csv as csv_mod
import io
import os
from typing import Any, Optional

from pyspark.sql import DataFrame

from dbt_spark.operators.materialize import ExecutionContext, run_model_df
from dbt_spark.plans.compile import parse_render
from dbt_spark.plans.manifest import ManifestNode


class UnitTestError(Exception):
    pass


def _rows_from_fixture(fixture: dict) -> list[dict]:
    """rows may be list-of-dicts (format: dict, default) or a CSV string."""
    rows = fixture.get("rows")
    if isinstance(rows, str):  # format: csv
        reader = csv_mod.DictReader(io.StringIO(rows.strip()))
        out = []
        for r in reader:
            out.append({k: (None if v == "" else _coerce(v)) for k, v in r.items()})
        return out
    return list(rows or [])


def _coerce(v: str) -> Any:
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            continue
    return v


def _coerce_to(v: Any, data_type) -> Any:
    """YAML scalar → the python value Spark expects for ``data_type``
    (fixture values are untyped; the reference casts via fixture SQL)."""
    if v is None:
        return None
    from datetime import date, datetime
    from decimal import Decimal

    from pyspark.sql import types as T

    try:
        if isinstance(data_type, (T.DoubleType, T.FloatType)):
            return float(v)
        if isinstance(data_type, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            return int(v)
        if isinstance(data_type, T.DecimalType):
            return Decimal(str(v))
        if isinstance(data_type, T.StringType):
            return str(v)
        if isinstance(data_type, T.BooleanType):
            return v if isinstance(v, bool) else str(v).lower() in ("true", "1")
        if isinstance(data_type, T.DateType) and isinstance(v, str):
            return date.fromisoformat(v)
        if isinstance(data_type, T.TimestampType) and isinstance(v, str):
            return datetime.fromisoformat(v)
    except (ValueError, ArithmeticError):
        return v
    return v


def _input_target(ctx: ExecutionContext, input_str: str) -> ManifestNode:
    """Resolve a given.input string — \"ref('x')\" or \"source('a','b')\" —
    to the manifest node it overrides."""
    _, refs, sources, _ = parse_render("{{ " + input_str.strip(" {}") + " }}", "unit_input")
    if refs:
        found = ctx.manifest.ref_lookup(refs[0][1], refs[0][0])
    elif sources:
        found = ctx.manifest.source_lookup(*sources[0])
    else:
        raise UnitTestError(f"cannot parse unit-test input {input_str!r}")
    if found is None:
        raise UnitTestError(f"unit-test input {input_str!r} does not exist")
    return found


def _sql_fixture_df(ctx: ExecutionContext, fixture: dict) -> DataFrame:
    """``format: sql`` fixture — rows holds a SELECT producing the fixture
    relation (UnitTestFormat.SQL, v1/unit_test_definition.py:26-57)."""
    sql = str(fixture.get("rows") or fixture.get("fixture"))
    ctx.store.ensure_registered_for(sql)
    return ctx.spark.sql(sql)


def _fixture_df(ctx: ExecutionContext, target: ManifestNode, rows: list[dict]) -> DataFrame:
    """Fixture rows → DataFrame, null-padding unspecified columns with the
    REAL input schema when obtainable (parity with reference fixture SQL,
    which selects all input columns: get_fixture_sql, unit_tests.py:189-198)."""
    real_schema = None
    try:
        if target.unique_id in ctx.manifest.sources:
            real_schema = ctx.source_df(target).schema
        else:
            rel = ctx.store.get(ctx.schema_for(target), target.name)
            if rel is not None:
                real_schema = ctx.store.read(rel.schema, rel.name).schema
    except Exception:  # noqa: BLE001
        real_schema = None

    if real_schema is not None:
        from pyspark.sql import functions as F

        given_cols = set()
        for r in rows:
            given_cols.update(r.keys())
        fields = [f for f in real_schema.fields if f.name in given_cols]
        base = ctx.spark.createDataFrame(
            [tuple(_coerce_to(r.get(f.name), f.dataType) for f in fields)
             for r in rows],
            schema="struct<" + ",".join(
                f"{f.name}:{f.dataType.simpleString()}" for f in fields) + ">",
        )
        for f in real_schema.fields:
            if f.name not in given_cols:
                base = base.withColumn(f.name, F.lit(None).cast(f.dataType))
        return base.select(*[f.name for f in real_schema.fields])
    if not rows:
        raise UnitTestError("empty fixture with no derivable input schema")
    return ctx.spark.createDataFrame(rows)  # type: ignore[arg-type]


def run_unit_test(ctx: ExecutionContext, node: ManifestNode) -> tuple[str, str]:
    """Execute one unit test; returns (status, message)."""
    meta = node.test_metadata
    tested = ctx.manifest.ref_lookup(meta["model"])
    if tested is None:
        raise UnitTestError(f"unit test {node.name}: model {meta['model']} not found")

    overrides: dict[str, str] = {}
    for fixture in meta.get("given", []):
        target = _input_target(ctx, fixture["input"])
        ident = f"__unit__{node.name}__{target.name}"
        if fixture.get("format") == "sql":
            df = _sql_fixture_df(ctx, fixture)
        else:
            df = _fixture_df(ctx, target, _rows_from_fixture(fixture))
        df.createOrReplaceTempView(ident)
        overrides[target.unique_id] = ident

    # per-test shallow context copy — unit tests run concurrently on worker
    # threads, so never mutate the shared ctx
    import copy

    test_ctx = copy.copy(ctx)
    orig_ref, orig_source = ctx.resolve_ref, ctx.resolve_source

    def resolve_ref(n: ManifestNode) -> str:
        return overrides.get(n.unique_id) or orig_ref(n)

    def resolve_source(n: ManifestNode) -> str:
        return overrides.get(n.unique_id) or orig_source(n)

    test_ctx.resolve_ref = resolve_ref  # type: ignore[method-assign]
    test_ctx.resolve_source = resolve_source  # type: ignore[method-assign]

    # overrides: {vars, env_vars, macros} (UnitTestOverrides,
    # v1/unit_test_definition.py:60-77). vars merge into the render scope;
    # env_vars patch the process env for the render; macros (project-macro
    # subset) are replaced with constant-returning bodies.
    test_overrides = meta.get("overrides") or {}
    if test_overrides.get("vars"):
        test_ctx.vars = {**ctx.vars, **test_overrides["vars"]}
    if test_overrides.get("macros"):
        new_macros = dict(ctx.manifest.macros)
        for mname, mval in test_overrides["macros"].items():
            # referencing varargs/kwargs makes the jinja macro swallow the
            # original call signature's arguments
            new_macros[mname] = (
                f"{{% macro {mname}() %}}"
                f"{{% if false %}}{{{{ varargs }}}}{{{{ kwargs }}}}{{% endif %}}"
                f"{mval}{{% endmacro %}}"
            )
        test_ctx.manifest = copy.copy(ctx.manifest)
        test_ctx.manifest.macros = new_macros
    env_patch = test_overrides.get("env_vars") or {}
    saved_env = {k: os.environ.get(k) for k in env_patch}
    os.environ.update({k: str(v) for k, v in env_patch.items()})
    try:
        actual = run_model_df(test_ctx, tested)
    finally:
        for k, v in saved_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    expect = meta.get("expect", {})
    if expect.get("format") == "sql":
        sql_expected = _sql_fixture_df(ctx, expect)
        expect_cols = sql_expected.columns
        missing = [c for c in expect_cols if c not in actual.columns]
        if missing:
            return "fail", (
                f"expected columns {missing} not in model output {actual.columns}"
            )
        actual_sel = actual.select(*expect_cols)
        expected_df = sql_expected.select(*expect_cols)
        n_expect = expected_df.count()
    else:
        expect_rows = _rows_from_fixture(expect)
        if not expect_rows:
            if expect.get("rows") is None:
                raise UnitTestError(
                    f"unit test {node.name}: expect.rows is required")
            # `rows: []` is legal and asserts the model outputs NOTHING
            # (reference fixtures use it: tests/functional/unit_testing/
            # fixtures.py:85-91 — e.g. testing a filter that drops all rows)
            n_actual = actual.count()
            if n_actual:
                sample = actual.limit(3).collect()
                return (
                    "fail",
                    f"{n_actual} unexpected row(s), 0 missing row(s); "
                    f"diff sample: {sample}",
                )
            return "pass", "matched 0 expected row(s)"
        expect_cols = list(expect_rows[0].keys())
        missing = [c for c in expect_cols if c not in actual.columns]
        if missing:
            return "fail", (
                f"expected columns {missing} not in model output {actual.columns}"
            )
        actual_sel = actual.select(*expect_cols)
        out_types = {f.name: f.dataType for f in actual_sel.schema.fields}
        expected_df = ctx.spark.createDataFrame(
            [tuple(_coerce_to(r.get(c), out_types[c]) for c in expect_cols)
             for r in expect_rows],
            schema=actual_sel.schema,
        )
        n_expect = len(expect_rows)
    # order-insensitive multiset diff, DRIVER-side like the reference (it
    # collects and sorts rows, then daff-diffs: task/test.py:441
    # list_rows_from_table(sort=True) → :205-283). Unit-test relations are
    # fixture-sized by definition, so collecting is bounded — and it replaces
    # four distributed exceptAll/count jobs with two collect jobs.
    from collections import Counter

    _NAN = object()  # dedicated sentinel — a genuine string cell 'NaN' must not collide

    def _canon(v):
        if isinstance(v, float) and v != v:  # NaN: make it self-equal
            return _NAN
        # Row values for array/map columns arrive as Python lists/dicts —
        # unhashable inside a Counter key; canonicalize recursively.
        if isinstance(v, (list, tuple)):
            return tuple(_canon(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, _canon(x)) for k, x in v.items()))
        if hasattr(v, "asDict"):  # nested Row (struct column)
            return tuple(sorted((k, _canon(x)) for k, x in v.asDict().items()))
        return v

    act = Counter(tuple(_canon(v) for v in r) for r in actual_sel.collect())
    exp = Counter(tuple(_canon(v) for v in r) for r in expected_df.collect())
    extra, absent = act - exp, exp - act
    n_extra, n_absent = sum(extra.values()), sum(absent.values())
    if n_extra or n_absent:
        sample = list(extra.elements())[:3] + list(absent.elements())[:3]
        return (
            "fail",
            f"{n_extra} unexpected row(s), {n_absent} missing row(s); diff sample: {sample}",
        )
    return "pass", f"matched {n_expect} expected row(s)"
