"""dbt_spark — a PySpark-native analytics engine with the capabilities of dbt.

dbt (the reference, /root/reference) is a SQL compilation + DAG orchestration
engine: it parses Jinja-templated SELECT statements into a manifest, links them
into a DAG, and wraps each model's SELECT in materialization DDL/DML shipped to
a warehouse. Here **Spark SQL is the warehouse**: materializations operate on
DataFrames and the Spark catalog directly, and Catalyst supplies the relational
operator surface (scan/filter/join/agg/window) natively.

Layout:
  plans/       manifest, Jinja compile, DAG, selectors, scheduler
  operators/   materializations: view/table/incremental/microbatch/snapshot/seed/tests
  sources/     source registry, readers, freshness
  functions/   text analysis, dedup, similarity, multimodal (LLM-pipeline ops)
  streaming/   structured-streaming equivalents of microbatch
  queries/     the declared operator inventory exercised against a DuckDB oracle
"""

__version__ = "0.1.0"
# dbt-core compatibility version: what require-dbt-version ranges, manifest
# metadata.dbt_version, and {{ dbt_version }} report (reference 1.10.x line)
__dbt_compat_version__ = "1.10.0"

from dbt_spark.session import get_spark  # noqa: F401
