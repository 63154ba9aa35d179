"""Declared operator inventory: name -> (spark, sf_dir) -> DataFrame, plus
DuckDB oracle SQL. Assembled from submodules as they come online."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}

from dbt_spark.queries import curation  # noqa: E402
from dbt_spark.queries import hygiene  # noqa: E402
from dbt_spark.queries import extended  # noqa: E402
from dbt_spark.queries import relational  # noqa: E402
from dbt_spark.queries import tpch_rest  # noqa: E402
from dbt_spark.queries import llmops  # noqa: E402
from dbt_spark.queries import materializations  # noqa: E402
from dbt_spark.queries import sft  # noqa: E402
from dbt_spark.queries import streaming_q  # noqa: E402

QUERIES.update(relational.QUERIES)
ORACLES.update(relational.ORACLES)
QUERIES.update(tpch_rest.QUERIES)
ORACLES.update(tpch_rest.ORACLES)
QUERIES.update(llmops.QUERIES)
ORACLES.update(llmops.ORACLES)
QUERIES.update(materializations.QUERIES)
ORACLES.update(materializations.ORACLES)
QUERIES.update(streaming_q.QUERIES)
ORACLES.update(streaming_q.ORACLES)
QUERIES.update(extended.QUERIES)
ORACLES.update(extended.ORACLES)
QUERIES.update(curation.QUERIES)
ORACLES.update(curation.ORACLES)
QUERIES.update(hygiene.QUERIES)
ORACLES.update(hygiene.ORACLES)
QUERIES.update(sft.QUERIES)
ORACLES.update(sft.ORACLES)
