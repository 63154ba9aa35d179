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
        if swap is None:
            # standalone use (no RelationStore lock/sweep): recover from a
            # previous crashed retire-then-replace BEFORE staging new data —
            # a crash between the two os.replace calls below leaves the
            # target missing with its data stranded in
            # <path>.__retired__<ts>; restore the newest such copy, then
            # clear every leftover __retired__/__staging__ sibling
            self._recover_standalone(path)
        self._configure_writer(df.write.mode("overwrite"), partition_by).save(staging)
        if swap is not None:
            swap(path, staging)
        else:
            # os.replace refuses a non-empty target directory, so retire the
            # old copy first — same move-aside RelationStore._swap performs
            # under its lock
            import shutil

            if os.path.exists(path):
                retired = f"{path}.__retired__{int(time.time() * 1000)}"
                os.replace(path, retired)
                os.replace(staging, path)
                shutil.rmtree(retired, ignore_errors=True)
            else:
                os.replace(staging, path)

    @staticmethod
    def _recover_standalone(path: str) -> None:
        """Crash recovery for standalone ``write_overwrite`` (no
        RelationStore): if the target is missing but a ``__retired__`` copy
        exists (crash landed between retire and swap-in), restore the
        newest copy so readers between the crash and the next write see the
        pre-crash table; then sweep all remaining ``__retired__`` and
        ``__staging__`` leftovers. Standalone use is single-writer by
        contract (RelationStore is the concurrent path), so sweeping
        sibling staging dirs here cannot race a live writer."""
        import shutil

        parent = os.path.dirname(path) or "."
        base = os.path.basename(path)
        try:
            entries = os.listdir(parent)
        except OSError:
            return
        retired = sorted(e for e in entries
                         if e.startswith(f"{base}.__retired__"))
        if retired and not os.path.exists(path):
            try:
                os.replace(os.path.join(parent, retired[-1]), path)
                retired = retired[:-1]
            except OSError:
                pass
        staged = [e for e in entries if e.startswith(f"{base}.__staging__")]
        for entry in retired + staged:
            shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)

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


class TxParquetFormat(SwapFileFormat):
    """Transactional parquet: plain parquet files under an optimistic-
    concurrency commit log — the Delta commit protocol re-expressed with
    nothing but parquet + POSIX atomic file creation, so the ACID
    ``TableFormat`` contract is a real, executable write path in ANY
    environment (no jars). It is the in-repo proof of the seam the
    jar-gated ``DeltaFormat``/``IcebergFormat`` plug into.

    Layout::

        <path>/data/<uuid>-part-*.parquet   immutable data files
        <path>/_commits/<version>.json      {"version", "files", "schema"}

    Protocol (mirrors Delta's log semantics):

    - a table's state is the file list of the HIGHEST committed version;
      data files are immutable and content-addressed-ish (uuid-prefixed),
      so a commit is a metadata operation;
    - writers prepare data files, then commit with ``O_CREAT|O_EXCL`` on
      ``<v+1>.json`` — exactly-one-winner per version. A loser re-reads the
      new latest state, rebases its file list, and retries (optimistic
      concurrency); after ``_COMMIT_RETRIES`` conflicts it fails CLEANLY,
      never corrupting the table;
    - readers are snapshot-isolated for free: a plan captured against
      version N keeps reading N's files even while N+1 commits (old files
      are retained; ``vacuum`` is the user's retention call, as in Delta);
    - time travel: ``read_version(spark, path, n)``;
    - native MERGE (``merge_into``): file-pruned — only data files that
      actually contain matched keys are rewritten; untouched files are
      re-referenced in the new commit verbatim. At 100 TB this is the
      difference between rewriting a table and rewriting the handful of
      files a batch touches.

    Scope: the commit's atomicity primitive is ``O_EXCL`` file creation,
    which is atomic on POSIX filesystems (local disk, NFSv4+). On object
    stores (S3) Delta needs a coordination service for the same guarantee —
    use the real Delta/Iceberg runtimes there; this format is for local
    warehouses, CI, and proving operator semantics against an ACID target.

    Partitioning note: partition columns stay REGULAR columns in the data
    files (logical partitioning); dynamic-partition-overwrite strategies
    remain parquet-only in the engine and are rejected upstream
    (operators/incremental.py), matching how the reference's adapters gate
    strategy × file_format combinations.
    """

    acid = True
    supports_native_merge = True
    _COMMIT_RETRIES = 8

    def __init__(self) -> None:
        super().__init__("txparquet")

    # -- commit log ----------------------------------------------------------

    @staticmethod
    def _commits_dir(path: str) -> str:
        return os.path.join(path, "_commits")

    def latest_version(self, path: str) -> int:
        try:
            entries = [e for e in os.listdir(self._commits_dir(path))
                       if e.endswith(".json")]
        except OSError:
            return 0
        return max((int(e.split(".")[0]) for e in entries), default=0)

    def _load_commit(self, path: str, version: int) -> Optional[dict]:
        import json

        if version <= 0:
            return None
        with open(os.path.join(self._commits_dir(path),
                               f"{version:010d}.json")) as f:
            return json.load(f)

    def _try_commit(self, path: str, version: int, payload: dict) -> bool:
        """Atomically claim <version>.json; False if another writer won."""
        import json

        cdir = self._commits_dir(path)
        os.makedirs(cdir, exist_ok=True)
        target = os.path.join(cdir, f"{version:010d}.json")
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        return True

    def _commit_retry(self, path: str, build) -> None:
        """``build(prev_commit_or_None) -> (files, schema_json)`` is re-run
        against the NEW latest state after every lost race (rebase)."""
        for _ in range(self._COMMIT_RETRIES):
            v = self.latest_version(path)
            files, schema_json = build(self._load_commit(path, v))
            if self._try_commit(path, v + 1, {
                    "version": v + 1, "files": files, "schema": schema_json}):
                return
        raise RuntimeError(
            f"txparquet: {self._COMMIT_RETRIES} consecutive commit conflicts "
            f"on {path!r} — giving up cleanly (table state is untouched)")

    # -- data files ----------------------------------------------------------

    def _stage_data(self, df: DataFrame, path: str) -> list[str]:
        """Write df's parquet files into <path>/data under fresh unique
        names; returns their table-relative paths. No commit yet."""
        import shutil
        import uuid

        staging = os.path.join(path, f"_tx_staging_{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        data_dir = os.path.join(path, "data")
        os.makedirs(data_dir, exist_ok=True)
        files = []
        for fn in sorted(os.listdir(staging)):
            if fn.endswith(".parquet"):
                rel = f"data/{uuid.uuid4().hex[:12]}-{fn}"
                os.rename(os.path.join(staging, fn), os.path.join(path, rel))
                files.append(rel)
        shutil.rmtree(staging, ignore_errors=True)
        return files

    def _df_for(self, spark: SparkSession, path: str,
                commit: Optional[dict]) -> DataFrame:
        import json

        from pyspark.sql.types import StructType

        if commit is None:
            raise FileNotFoundError(f"txparquet table at {path!r} has no commits")
        if not commit["files"]:
            return spark.createDataFrame(
                [], StructType.fromJson(json.loads(commit["schema"])))
        return spark.read.parquet(
            *[os.path.join(path, f) for f in commit["files"]])

    # -- TableFormat API -----------------------------------------------------

    def write_overwrite(self, df, path, partition_by=None, swap=None) -> None:
        # transactional replace: stage immutable data files, then one
        # atomic commit — the staged-swap machinery (swap arg) is bypassed,
        # exactly like the jar-backed ACID formats
        os.makedirs(path, exist_ok=True)
        files = self._stage_data(df, path)
        schema_json = df.schema.json()
        self._commit_retry(path, lambda prev: (files, schema_json))

    def write_append(self, df, path, partition_by=None) -> None:
        os.makedirs(path, exist_ok=True)
        new_files = self._stage_data(df, path)
        schema_json = df.schema.json()
        self._commit_retry(
            path,
            lambda prev: (list((prev or {}).get("files", [])) + new_files,
                          schema_json))

    def read(self, spark: SparkSession, rel: "Relation") -> DataFrame:
        path = rel.path
        return self._df_for(spark, path,
                            self._load_commit(path, self.latest_version(path)))

    def read_version(self, spark: SparkSession, path: str,
                     version: int) -> DataFrame:
        """Time travel: the table as of a committed version."""
        return self._df_for(spark, path, self._load_commit(path, version))

    def merge_into(self, spark: SparkSession, path: str, batch: DataFrame,
                   keys: list[str],
                   update_columns: Optional[list[str]] = None,
                   exclude_columns: Optional[list[str]] = None) -> None:
        """Native transactional MERGE, file-pruned: rewrite ONLY the data
        files that contain matched keys; untouched files are re-referenced
        verbatim in the new commit. The touched-file probe is one semi-join
        over ``input_file_name()`` collecting a file list (O(files), the
        same bounded class as touched-partition enumeration)."""
        from pyspark.sql import functions as F

        from dbt_spark.operators.incremental import merge_upsert

        v = self.latest_version(path)
        commit = self._load_commit(path, v)
        if commit is None:
            raise FileNotFoundError(
                f"txparquet: merge_into target {path!r} has no commits")
        current = self._df_for(spark, path, commit)
        by_base = {os.path.basename(f): f for f in commit["files"]}
        if commit["files"]:
            touched_names = [
                os.path.basename(r["__f"]) for r in
                current.withColumn("__f", F.input_file_name())
                .join(F.broadcast(batch.select(*keys).distinct()),
                      on=keys, how="left_semi")
                .select("__f").distinct().collect()
            ]
        else:
            touched_names = []
        touched = sorted(by_base[b] for b in touched_names)
        untouched = [f for f in commit["files"] if f not in set(touched)]
        if touched:
            touched_df = spark.read.parquet(
                *[os.path.join(path, f) for f in touched])
        else:
            touched_df = current.limit(0)
        merged = merge_upsert(touched_df, batch.select(*current.columns),
                              keys, update_columns, exclude_columns)
        new_files = self._stage_data(merged, path)
        schema_json = current.schema.json()

        def _build(prev: Optional[dict]):
            if prev is not None and prev["version"] != commit["version"]:
                # a concurrent commit changed the state under us: the
                # file-level rebase would need re-probing — fail cleanly
                # (Delta raises ConcurrentAppendException the same way)
                raise RuntimeError(
                    f"txparquet: concurrent commit {prev['version']} "
                    f"invalidated merge based on {commit['version']}")
            return untouched + new_files, schema_json

        self._commit_retry(path, _build)

    def vacuum(self, path: str) -> int:
        """Drop data files unreferenced by the LATEST commit and commit
        logs older than it (retention = latest-only; returns files
        removed). The maintenance call of the protocol — snapshot isolation
        retains superseded files until the user vacuums, as in Delta."""
        v = self.latest_version(path)
        commit = self._load_commit(path, v)
        if commit is None:
            return 0
        live = set(commit["files"])
        removed = 0
        data_dir = os.path.join(path, "data")
        for fn in os.listdir(data_dir) if os.path.isdir(data_dir) else []:
            rel = f"data/{fn}"
            if rel not in live:
                os.remove(os.path.join(data_dir, fn))
                removed += 1
        for e in os.listdir(self._commits_dir(path)):
            if e.endswith(".json") and int(e.split(".")[0]) < v:
                os.remove(os.path.join(self._commits_dir(path), e))
        return removed


class DeltaFormat(_AcidFormat):
    _probe_class = "org.apache.spark.sql.delta.DeltaLog"
    _install_hint = "delta-spark package + DeltaSparkSessionExtension"

    def __init__(self) -> None:
        super().__init__("delta")

    def merge_into(self, spark: SparkSession, path: str, batch: DataFrame,
                   keys: list, update_columns=None, exclude_columns=None) -> None:
        """Native Delta ``MERGE INTO`` over the path-addressed table
        (``delta.`<path>```) — the same statement dbt-spark's merge strategy
        compiles to. Jar-gated: only reached when ``available()`` is true
        (operators/incremental.py:_native_merge checks), so in-container it
        is never executed; the contract itself is exercised by
        TxParquetFormat.merge_into's tests."""
        self.require(spark)
        import uuid

        tmp = f"__dbt_spark_merge_src_{uuid.uuid4().hex[:8]}"
        batch.createOrReplaceTempView(tmp)
        try:
            cols = batch.columns
            non_keys = [c for c in cols if c not in keys]
            upd = (list(update_columns) if update_columns
                   else [c for c in non_keys
                         if c not in set(exclude_columns or [])])
            on = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
            set_clause = ", ".join(f"t.`{c}` = s.`{c}`" for c in upd)
            ins_cols = ", ".join(f"`{c}`" for c in cols)
            ins_vals = ", ".join(f"s.`{c}`" for c in cols)
            spark.sql(
                f"MERGE INTO {self.name}.`{path}` t USING {tmp} s ON {on} "
                + (f"WHEN MATCHED THEN UPDATE SET {set_clause} " if upd else "")
                + f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) "
                  f"VALUES ({ins_vals})")
        finally:
            spark.catalog.dropTempView(tmp)


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
    "txparquet": TxParquetFormat(),
}


def table_format(name: Optional[str]) -> SwapFileFormat:
    fmt = TABLE_FORMATS.get((name or "parquet").lower())
    if fmt is None:
        raise ValueError(
            f"unknown file_format {name!r} (have {sorted(TABLE_FORMATS)})")
    return fmt
