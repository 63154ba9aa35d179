"""Driver-canonicalizer schema guard (VERDICT r11 directive #1).

The round-11 driver crashed on ``multimodal_resize_embed`` because its
rows-only canonicalizer does a pandas ``sort_values`` over every output
column and cannot hash Python lists — so a top-level ``array<float>``
column is un-checkable by the harness even when the query is correct.

This guard builds EVERY registered query's DataFrame at sf0.001 and
asserts no top-level column is array/map/struct-typed.  Queries that
need vector/struct outputs must fold them to scalars (md5 digest,
rounded component stats) in the registry entry and keep the raw form in
their unit tests — see ``multimodal_resize_embed``
(dbt_spark/queries/llmops.py) for the canonical reshaping.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR  # noqa: E402

COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def _registry():
    from dbt_spark.queries import QUERIES

    return QUERIES


def test_no_registered_query_emits_complex_toplevel_column(spark):
    """Build (lazily — no execution) each registry query and inspect its
    analyzed schema.  Plan analysis is enough to resolve output types; the
    few queries that run eager driver-side setup (ANN codebooks, streaming
    replays) still only pay sf0.001 cost."""
    offenders: list[str] = []
    errors: list[str] = []
    for name, fn in _registry().items():
        try:
            df = fn(spark, SF_DIR)
        except Exception as exc:  # pragma: no cover - diagnostic path
            errors.append(f"{name}: {type(exc).__name__}: {exc}")
            continue
        for field in df.schema.fields:
            if isinstance(field.dataType, COMPLEX):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not errors, "registry queries failed to build:\n" + "\n".join(errors)
    assert not offenders, (
        "driver-uncanonicalizable top-level columns (fold to scalar digests, "
        "keep the raw form in unit tests):\n" + "\n".join(offenders)
    )
