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
