"""Materialization operators (SURVEY.md §2A).

The reference dispatches materializations as Jinja macros emitting warehouse
SQL (core/dbt/task/run.py:305-334); here each is a Python function operating on
DataFrames + the RelationStore. ``MATERIALIZATIONS`` is the dispatch table
(the analog of manifest.find_materialization_macro_by_name,
core/dbt/contracts/graph/manifest.py:1005-1040).
"""

from dbt_spark.operators.materialize import (  # noqa: F401
    ExecutionContext,
    materialize_ephemeral,
    materialize_materialized_view,
    materialize_table,
    materialize_view,
)
from dbt_spark.operators.incremental import materialize_incremental  # noqa: F401
from dbt_spark.operators.seed import materialize_seed  # noqa: F401
from dbt_spark.operators.snapshot import materialize_snapshot  # noqa: F401

def _materialize_streaming(ctx, node):
    from dbt_spark.streaming.stream import materialize_streaming

    return materialize_streaming(ctx, node)


MATERIALIZATIONS = {
    "view": materialize_view,
    "table": materialize_table,
    "ephemeral": materialize_ephemeral,
    "incremental": materialize_incremental,
    "seed": materialize_seed,
    "snapshot": materialize_snapshot,
    "materialized_view": materialize_materialized_view,
    "streaming_table": _materialize_streaming,
}
