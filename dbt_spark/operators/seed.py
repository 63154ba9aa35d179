"""Seed materialization: CSV → table (SURVEY §2A seed row).

Reference: core/dbt/parser/seeds.py:8-33, SeedConfig v1/seed.py:15-24, runner
core/dbt/task/seed.py:19-60. Type inference delegated to Spark's CSV reader
(the agate-inference analog); ``column_types`` pins explicit casts. The ≤1 MB
spec bound (core/dbt/constants.py:7) means the driver-side path is exempt from
the no-collect scale rule.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dbt_spark.catalog import Relation
from dbt_spark.operators.materialize import ExecutionContext
from dbt_spark.plans.manifest import ManifestNode

MAXIMUM_SEED_SIZE = 1 * 1024 * 1024  # core/dbt/constants.py:7


def materialize_seed(ctx: ExecutionContext, node: ManifestNode) -> Relation:
    path = os.path.join(ctx.project.root, node.path)
    size = os.path.getsize(path)
    if size > MAXIMUM_SEED_SIZE:
        raise ValueError(
            f"seed {node.name} is {size} bytes; seeds are capped at {MAXIMUM_SEED_SIZE} "
            "(load large data as a source instead)"
        )
    df = (
        ctx.spark.read.option("header", "true")
        .option("inferSchema", "true")
        .option("delimiter", node.config.delimiter)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        # RFC-4180 fidelity (the reference's agate reader): quoted fields
        # may embed newlines/delimiters, and quotes escape by doubling —
        # Spark defaults (multiLine=false, escape=backslash) silently split
        # such rows (caught by tests/test_seed_fuzz.py)
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )
    for col, dtype in (node.config.column_types or {}).items():
        if col in df.columns:
            df = df.withColumn(col, F.col(col).cast(dtype))
    return ctx.store.write_table(ctx.schema_for(node), ctx.name_for(node), df, kind="seed")
