"""Model contracts: enforce declared column names + data types.

Reference: ``contract: {enforced: true}`` makes declared ``columns:`` +
``data_type`` enforceable (core/dbt/artifacts/resources/v1/config.py:33-36,
124-127); column types are opaque strings interpreted by the warehouse
(v1/components.py:73-88) — here parsed with Spark's DDL parser and compared
structurally, so ``bigint`` == ``long`` and case never matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import DataType, StructType

from dbt_spark.plans.manifest import ManifestNode


class ContractError(Exception):
    pass


def _parse_type(type_str: str) -> DataType:
    return StructType.fromDDL(f"__c {type_str}")[0].dataType


def enforce_contract(node: ManifestNode, df: DataFrame) -> None:
    """Raise ContractError unless df's schema matches the declared columns
    exactly (same names, same parsed types, no extras, no missing)."""
    if not node.config.contract.get("enforced"):
        return
    declared = {
        name: spec.get("data_type")
        for name, spec in node.columns.items()
    }
    problems: list[str] = []
    actual = {f.name: f.dataType for f in df.schema.fields}
    for name, type_str in declared.items():
        if name not in actual:
            problems.append(f"missing column {name!r}")
            continue
        if type_str is None:
            continue
        try:
            want = _parse_type(type_str)
        except Exception as e:  # noqa: BLE001
            problems.append(f"column {name!r}: unparseable data_type {type_str!r} ({e})")
            continue
        if actual[name] != want:
            problems.append(
                f"column {name!r}: expected {want.simpleString()}, "
                f"got {actual[name].simpleString()}"
            )
    extras = [c for c in actual if c not in declared]
    if extras:
        problems.append(f"undeclared column(s) {extras}")
    if problems:
        raise ContractError(
            f"{node.unique_id}: contract violated — " + "; ".join(problems)
        )


def enforce_constraints(node: ManifestNode, df: DataFrame) -> None:
    """Enforce column-level constraints declared in the model YAML.

    Reference: ColumnLevelConstraint/ModelLevelConstraint
    (core/dbt/artifacts/resources/v1/components.py:10, model.py:60). Like most
    dbt adapters, ``not_null`` and ``check`` are enforced; primary/foreign key
    and unique are metadata-only. Enforcement is one distributed aggregate over
    the result (a 1-row fetch — the data never reaches the driver), with SQL
    CHECK semantics: a NULL check expression passes.
    """
    from pyspark.sql import functions as F

    conds: list[tuple[str, str]] = []  # (violation label, SQL condition that must hold)
    for name, spec in node.columns.items():
        for c in spec.get("constraints", []) or []:
            ctype = (c.get("type") or "").lower() if isinstance(c, dict) else str(c)
            if ctype == "not_null":
                conds.append((f"not_null({name})", f"{name} IS NOT NULL"))
            elif ctype == "check" and isinstance(c, dict) and c.get("expression"):
                conds.append((f"check({c['expression']})", c["expression"]))
            # primary_key / foreign_key / unique: metadata-only (adapter parity)
    if not conds:
        return
    aggs = [
        F.sum(F.when(~F.expr(cond), 1).otherwise(0)).alias(f"__v{i}")
        for i, (_, cond) in enumerate(conds)
    ]
    row = df.agg(*aggs).collect()[0]
    violations = [
        f"{label}: {row[i]} violating row(s)"
        for i, (label, _) in enumerate(conds)
        if (row[i] or 0) > 0
    ]
    if violations:
        raise ContractError(
            f"{node.unique_id}: constraint(s) violated — " + "; ".join(violations)
        )
