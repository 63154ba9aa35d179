"""TableFormat: the storage-format seam under RelationStore.

The reference maps materialization semantics onto whatever table format the
warehouse adapter speaks (dbt-spark's ``file_format`` config: parquet | orc |
csv | json | delta | iceberg | hudi); merge/clone map to Delta ``MERGE`` /
``SHALLOW CLONE`` where available. This module is that seam for the Spark
engine: a ``TableFormat`` owns how a relation's bytes are written, replaced
and read, so RelationStore's operator-facing API (write_table /
overwrite_partitions / read) stays format-agnostic.

Concurrent-writer semantics, per format:

- ``SwapFileFormat`` (parquet default, orc, json, csv): plain files plus an
  atomic staging-dir swap (write to ``<path>.__staging__<ts>``, rename into
  place). SINGLE-WRITER atomicity: a reader never sees a half-written
  directory and a crashed writer never corrupts the live copy, but two
  concurrent writers race on the final rename (last completed swap wins,
  the loser's output is discarded) and there is no snapshot isolation for
  in-flight readers across a swap. That is exactly the dbt execution model
  (one scheduler owns a relation at a time), and it is honest about what
  plain files can give you. No time travel.
- ``DeltaFormat`` / ``IcebergFormat``: ACID table formats — per-statement
  transactions via an optimistic-concurrency commit log, safe concurrent
  writers (conflicting commits retry or fail cleanly, never corrupt),
  snapshot-isolated readers, native ``MERGE``, time travel. The classes are
  import-gated: this container ships no Delta/Iceberg jars, so selecting
  them raises a clear error at write time instead of failing deep inside a
  Spark job. When the jars ARE on the cluster, ``write_overwrite`` /
  ``write_append`` route through ``df.write.format(name).saveAsTable``-style
  transactional paths and the staged-swap machinery is bypassed entirely
  (the commit log provides the atomicity the swap emulates).
"""

from __future__ import annotations

import os
import time
from typing import TYPE_CHECKING, Optional

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:  # pragma: no cover
    from dbt_spark.catalog import Relation


class SwapFileFormat:
    """Plain-file format with staged-swap atomicity (see module docstring).

    ``acid`` / ``supports_native_merge`` are the capability flags operators
    may consult: merge/SCD2 on a non-ACID format run as read-modify-swap
    (correct single-writer, full- or partition-scoped rewrite), where an
    ACID format would issue one transactional MERGE.
    """

    acid = False
    supports_native_merge = False

    def __init__(self, name: str) -> None:
        self.name = name

    # -- capability ---------------------------------------------------------

    def available(self, spark: SparkSession) -> bool:
        return True

    def require(self, spark: SparkSession) -> None:
        return None

    # -- io -----------------------------------------------------------------

    def _configure_writer(self, writer, partition_by: Optional[list[str]]):
        writer = writer.format(self.name)
        if self.name == "csv":
            writer = writer.option("header", True)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        return writer

    def write_overwrite(
        self,
        df: DataFrame,
        path: str,
        partition_by: Optional[list[str]] = None,
        swap=None,
    ) -> None:
        """Atomic replace: stage beside the target, then ``swap`` (supplied
        by RelationStore so its lock + orphan sweep apply) renames it in."""
        staging = f"{path}.__staging__{int(time.time() * 1000)}"
        self._configure_writer(df.write.mode("overwrite"), partition_by).save(staging)
        if swap is not None:
            swap(path, staging)
        else:
            # standalone use (no RelationStore swap): os.replace refuses a
            # non-empty target directory, so retire the old copy first —
            # same move-aside RelationStore._swap performs under its lock
            if os.path.exists(path):
                retired = f"{path}.__retired__{int(time.time() * 1000)}"
                os.replace(path, retired)
                os.replace(staging, path)
                import shutil

                shutil.rmtree(retired, ignore_errors=True)
            else:
                os.replace(staging, path)

    def write_append(
        self,
        df: DataFrame,
        path: str,
        partition_by: Optional[list[str]] = None,
    ) -> None:
        self._configure_writer(df.write.mode("append"), partition_by).save(path)

    def read(self, spark: SparkSession, rel: "Relation") -> DataFrame:
        reader = spark.read.format(self.name)
        schema_json = rel.meta.get("schema_json")
        if schema_json:
            import json

            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(json.loads(schema_json)))
        if self.name == "csv":
            reader = reader.option("header", True)
        return reader.load(rel.path)


class _AcidFormat(SwapFileFormat):
    """Shared shell for ACID table formats (Delta / Iceberg). Selecting one
    without the jars on the classpath raises a clear, early error; with the
    jars present the transactional write path replaces the staged swap."""

    acid = True
    supports_native_merge = True
    _probe_class: str = ""
    _install_hint: str = ""

    def available(self, spark: SparkSession) -> bool:
        try:
            getattr(spark._jvm, "java").lang.Class.forName(self._probe_class)
            return True
        except Exception:
            return False

    def require(self, spark: SparkSession) -> None:
        if not self.available(spark):
            raise RuntimeError(
                f"file_format={self.name!r} requires the {self.name} Spark "
                f"runtime on the classpath ({self._install_hint}); this "
                "session does not have it. Use parquet (default) or add the "
                "jars + session extensions."
            )

    def write_overwrite(self, df, path, partition_by=None, swap=None) -> None:
        # transactional replace: the commit log makes the overwrite atomic
        # and snapshot-isolated — no staging swap needed
        writer = df.write.format(self.name).mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.option("overwriteSchema", "true").save(path)

    def write_append(self, df, path, partition_by=None) -> None:
        writer = df.write.format(self.name).mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(path)

    def read(self, spark: SparkSession, rel: "Relation") -> DataFrame:
        return spark.read.format(self.name).load(rel.path)


class DeltaFormat(_AcidFormat):
    _probe_class = "org.apache.spark.sql.delta.DeltaLog"
    _install_hint = "delta-spark package + DeltaSparkSessionExtension"

    def __init__(self) -> None:
        super().__init__("delta")


class IcebergFormat(_AcidFormat):
    _probe_class = "org.apache.iceberg.spark.SparkCatalog"
    _install_hint = "iceberg-spark-runtime jar + a Spark catalog config"

    def __init__(self) -> None:
        super().__init__("iceberg")


TABLE_FORMATS: dict[str, SwapFileFormat] = {
    "parquet": SwapFileFormat("parquet"),
    "orc": SwapFileFormat("orc"),
    "json": SwapFileFormat("json"),
    "csv": SwapFileFormat("csv"),
    "delta": DeltaFormat(),
    "iceberg": IcebergFormat(),
}


def table_format(name: Optional[str]) -> SwapFileFormat:
    fmt = TABLE_FORMATS.get((name or "parquet").lower())
    if fmt is None:
        raise ValueError(
            f"unknown file_format {name!r} (have {sorted(TABLE_FORMATS)})")
    return fmt
