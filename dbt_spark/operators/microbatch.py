"""Microbatch incremental strategy.

Semantics from core/dbt/materializations/incremental/microbatch.py:12-223
(MicrobatchBuilder: build_batches :81-101, offset_timestamp :123-162,
truncate_timestamp :164-193) and batch orchestration core/dbt/task/run.py:744-867:

- the [begin → now] range is split into hour/day/month/year batches;
- on incremental runs only the last ``lookback + 1`` grains are reprocessed
  (dbt's late-data handling — the batch analog of a watermark);
- every ref/source with an ``event_time`` gets the batch window pushed into its
  scan (providers.py:245-304) — here via ExecutionContext.event_time_filters,
  which Catalyst turns into partition/row-group pruning;
- each batch writes via dynamic partition overwrite when the model is
  partitioned (only that batch's partitions rewritten — the 100 TB path),
  else via ranged delete+insert;
- failed batches don't abort the run; they are recorded for retry
  (task/run.py:578-592).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from typing import Optional

from pyspark.sql import functions as F

from dbt_spark.catalog import Relation
from dbt_spark.plans.manifest import ManifestNode

GRAINS = ("hour", "day", "month", "year")


def truncate_timestamp(ts: datetime, grain: str) -> datetime:
    if grain == "hour":
        return ts.replace(minute=0, second=0, microsecond=0)
    if grain == "day":
        return ts.replace(hour=0, minute=0, second=0, microsecond=0)
    if grain == "month":
        return ts.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if grain == "year":
        return ts.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    raise ValueError(f"unknown batch_size grain {grain!r}")


def offset_timestamp(ts: datetime, grain: str, offset: int) -> datetime:
    """Offset a grain-aligned timestamp by N grains (calendar-aware for
    month/year, like MicrobatchBuilder.offset_timestamp)."""
    if grain == "hour":
        return ts + timedelta(hours=offset)
    if grain == "day":
        return ts + timedelta(days=offset)
    if grain == "month":
        month0 = ts.year * 12 + (ts.month - 1) + offset
        return ts.replace(year=month0 // 12, month=month0 % 12 + 1)
    if grain == "year":
        return ts.replace(year=ts.year + offset)
    raise ValueError(f"unknown batch_size grain {grain!r}")


@dataclass
class Batch:
    start: datetime
    end: datetime

    @property
    def batch_id(self) -> str:
        return self.start.strftime("%Y%m%dT%H%M%S")


@dataclass
class BatchContext:
    """The per-batch object user SQL sees as ``{{ model.batch }}`` during a
    microbatch run — id / event_time_start / event_time_end, mirroring the
    reference's BatchContext (core/dbt/contracts/graph/nodes.py:448-470,
    populated at core/dbt/task/run.py:354)."""

    id: str
    event_time_start: datetime
    event_time_end: datetime


class MicrobatchBuilder:
    """Batch-grid math; same contract as the reference class, reimplemented."""

    def __init__(
        self,
        event_time: str,
        begin: datetime,
        batch_size: str,
        lookback: int = 1,
        now: Optional[datetime] = None,
    ) -> None:
        if batch_size not in GRAINS:
            raise ValueError(f"batch_size must be one of {GRAINS}, got {batch_size!r}")
        self.event_time = event_time
        self.begin = begin
        self.batch_size = batch_size
        self.lookback = lookback
        self.now = now or datetime.now(timezone.utc).replace(tzinfo=None)

    def build_start_time(self, is_incremental: bool) -> datetime:
        """Full build: begin. Incremental: now - lookback grains (reprocess the
        trailing window for late data) — microbatch.py:46-79."""
        if not is_incremental:
            return truncate_timestamp(self.begin, self.batch_size)
        checkpoint = truncate_timestamp(self.now, self.batch_size)
        return offset_timestamp(checkpoint, self.batch_size, -self.lookback)

    def build_end_time(self) -> datetime:
        return offset_timestamp(
            truncate_timestamp(self.now, self.batch_size), self.batch_size, 1
        )

    def build_batches(self, is_incremental: bool) -> list[Batch]:
        start = self.build_start_time(is_incremental)
        end = self.build_end_time()
        batches: list[Batch] = []
        cur = start
        while cur < end:
            nxt = offset_timestamp(cur, self.batch_size, 1)
            batches.append(Batch(cur, min(nxt, end)))
            cur = nxt
        return batches


class MicrobatchPartialFailure(RuntimeError):
    """Some batches failed; the rest were written. Carries structured batch
    results so the runner can record them in run_results.json and `dbt retry`
    can replay ONLY the failed batches (core/dbt/task/run.py:578-592
    previous_batch_results + task/retry.py batch-aware re-run)."""

    def __init__(self, message: str, batch_results: dict):
        super().__init__(message)
        self.batch_results = batch_results


def run_microbatch(ctx, node: ManifestNode, now: Optional[datetime] = None) -> Relation:
    from dbt_spark.operators.materialize import run_model_df

    now = now or ctx.now
    cfg = node.config
    if not cfg.event_time or not cfg.batch_size or not cfg.begin:
        raise ValueError(
            f"{node.unique_id}: microbatch requires event_time, batch_size, begin "
            "(validated like core/dbt/parser/manifest.py:1417-1477)"
        )
    begin = datetime.fromisoformat(str(cfg.begin))
    schema = ctx.schema_for(node)
    exists = ctx.store.exists(schema, ctx.name_for(node))
    is_incremental = exists and not ctx.full_refresh

    builder = MicrobatchBuilder(
        event_time=cfg.event_time,
        begin=begin,
        batch_size=cfg.batch_size,
        lookback=cfg.lookback,
        now=now,
    )
    et_start = getattr(ctx, "event_time_start", None)
    et_end = getattr(ctx, "event_time_end", None)
    if et_start or et_end:
        # --event-time-start/--event-time-end: explicit backfill window
        # (reference flags; build_batches over the pinned range, checkpoint
        # and lookback logic bypassed). The end bound CLAMPS the final batch
        # mid-grain so rows at/after the requested cutoff are untouched.
        builder.begin = truncate_timestamp(et_start or begin, cfg.batch_size)
        builder.now = et_end or now
        batches = builder.build_batches(is_incremental=False)
        if et_end:
            batches = [
                Batch(b.start, min(b.end, et_end))
                for b in batches if b.start < et_end
            ]
    else:
        batches = builder.build_batches(is_incremental)
    only = getattr(ctx, "retry_batches", {}).get(node.unique_id)
    if only:
        # dbt retry replay path: regenerate the FULL grid from `begin` (the
        # failed batch may be older than the incremental lookback window) and
        # keep only the previously-failed batch ids. An id the grid can't
        # reproduce (begin/grain changed since the failure) is an error, not
        # a silent rerun of the wrong windows. Recorded windows (failed
        # batches of a clamped --event-time-end backfill) re-clamp the
        # replayed batch so retry never widens the user's cutoff.
        if isinstance(only, dict):
            wanted = set(only.get("failed", []))
            rec_windows = only.get("failed_windows", {})
        else:  # legacy list-of-ids form
            wanted = set(only)
            rec_windows = {}
        full_grid = builder.build_batches(is_incremental=False)
        batches = []
        for b in full_grid:
            if b.batch_id not in wanted:
                continue
            rec = rec_windows.get(b.batch_id)
            if rec:
                b = Batch(b.start, min(b.end, datetime.fromisoformat(rec[1])))
            batches.append(b)
        missing = wanted - {b.batch_id for b in batches}
        if missing:
            raise ValueError(
                f"{node.unique_id}: retry batches {sorted(missing)} not in the "
                f"current batch grid (begin/batch_size changed since the "
                "failed run?)"
            )
    parts = cfg.partition_by
    parts = [parts] if isinstance(parts, str) else list(parts or [])

    def run_one(batch: Batch, idx: int) -> Relation:
        """One batch end-to-end on a private context copy (parallel-safe)."""
        import copy as _copy

        bctx = _copy.copy(ctx)
        bctx.event_time_filters = {
            "*": (batch.start.isoformat(sep=" "), batch.end.isoformat(sep=" "))
        }
        # {{ model.batch.id / .event_time_start / .event_time_end }} for
        # this batch's compile (compile_sql passes it into runtime_render)
        bctx.current_batch = BatchContext(
            id=batch.batch_id,
            event_time_start=batch.start,
            event_time_end=batch.end,
        )
        window = bctx.event_time_filters["*"]
        df = run_model_df(bctx, node, is_incremental=is_incremental or idx > 0)
        # defensive scope: the model output itself is clamped to the batch
        df = df.filter(
            (F.col(cfg.event_time) >= F.lit(window[0]).cast("timestamp"))
            & (F.col(cfg.event_time) < F.lit(window[1]).cast("timestamp"))
        )
        first_write = not ctx.store.exists(schema, ctx.name_for(node))
        grain_end = offset_timestamp(
            truncate_timestamp(batch.start, cfg.batch_size), cfg.batch_size, 1
        )
        full_grain = batch.end >= grain_end
        if parts and not first_write and full_grain:
            return ctx.store.overwrite_partitions(schema, ctx.name_for(node), df, parts)
        if parts and not first_write:
            # clamped (mid-grain) window on a partitioned table: dynamic
            # partition overwrite would replace the WHOLE partition and
            # delete rows at/after the cutoff — use the ranged
            # delete+insert path, which touches exactly [start, end)
            existing = ctx.store.read(schema, ctx.name_for(node))
            outside = existing.filter(
                (F.col(cfg.event_time) < F.lit(window[0]).cast("timestamp"))
                | (F.col(cfg.event_time) >= F.lit(window[1]).cast("timestamp"))
            )
            return ctx.store.write_table(
                schema, ctx.name_for(node), outside.unionByName(df),
                kind="incremental", partition_by=parts,
            )
        if first_write:
            return ctx.store.write_table(
                schema, ctx.name_for(node), df, kind="incremental", partition_by=parts
            )
        # unpartitioned: ranged delete+insert for this batch window
        existing = ctx.store.read(schema, ctx.name_for(node))
        outside = existing.filter(
            (F.col(cfg.event_time) < F.lit(window[0]).cast("timestamp"))
            | (F.col(cfg.event_time) >= F.lit(window[1]).cast("timestamp"))
        )
        return ctx.store.write_table(
            schema, ctx.name_for(node), outside.unionByName(df), kind="incremental"
        )

    # Parallel middle batches iff: opted in (default true), the table is
    # partitioned (disjoint dynamic-overwrite writes; each Spark write job
    # stages under its own .spark-staging-<jobId>), and the model doesn't
    # read `this` (task/run.py:651-665 should_run_in_parallel). First and
    # last batch always sequential (:762-808).
    concurrent_ok = (
        bool(parts)
        and cfg.meta.get("concurrent_batches", True)
        and "{{ this }}" not in (node.raw_code or "")
        and "{{this}}" not in (node.raw_code or "").replace(" ", "")
    )

    failed: list[Batch] = []
    succeeded: list[Batch] = []
    rel: Optional[Relation] = None

    # pre_hook runs ONLY with the first batch, post_hook ONLY with the last
    # (core/dbt/task/run.py:829-833 blanks the other batches' hook lists).
    # The runner hands per-node hook executors via ctx.microbatch_hooks and
    # skips its own once-per-node loops for microbatch models.
    hooks = getattr(ctx, "microbatch_hooks", None) or {}

    def _bc(batch: Batch) -> BatchContext:
        return BatchContext(id=batch.batch_id, event_time_start=batch.start,
                            event_time_end=batch.end)

    # per-batch structured events (reference Q044/Q045/Q046 —
    # events/types.py:1723-1773, Fixes-20241209-150711 debug info)
    ev = getattr(ctx, "events", None)

    def safe(batch: Batch, idx: int) -> Optional[Relation]:
        import time as _time

        desc = f"batch {batch.batch_id} of {node.unique_id}"
        if ev:
            ev.fire("LogStartBatch", description=desc, batch_index=idx + 1,
                    total_batches=len(batches))
        if idx == 0 and hooks.get("pre"):
            hooks["pre"](_bc(batch))
        t0 = _time.time()
        status = "success"
        try:
            r = run_one(batch, idx)
            succeeded.append(batch)
            return r
        except Exception as e:  # noqa: BLE001
            status = "error"
            if ev:
                ev.fire("MicrobatchExecutionDebug",
                        msg=f"{desc} failed: {e} (window "
                            f"[{batch.start.isoformat()}, "
                            f"{batch.end.isoformat()}))")
            failed.append(batch)
            return None
        finally:
            if ev:
                ev.fire("LogBatchResult", status=status, description=desc,
                        batch_index=idx + 1, total_batches=len(batches),
                        execution_time=round(_time.time() - t0, 2))
            if idx == len(batches) - 1 and hooks.get("post"):
                hooks["post"](_bc(batch))

    if len(batches) > 2 and concurrent_ok:
        from concurrent.futures import ThreadPoolExecutor

        rel = safe(batches[0], 0) or rel
        with ThreadPoolExecutor(max_workers=4) as pool:
            for r in pool.map(
                lambda ib: safe(ib[1], ib[0]),
                list(enumerate(batches))[1:-1],
            ):
                rel = r or rel
        last = len(batches) - 1
        rel = safe(batches[last], last) or rel
    else:
        for i, batch in enumerate(batches):
            rel = safe(batch, i) or rel
    if failed:
        ids = sorted(b.batch_id for b in failed)
        raise MicrobatchPartialFailure(
            f"{node.unique_id}: {len(failed)}/{len(batches)} batch(es) failed: {ids}",
            batch_results={
                "successful": sorted(b.batch_id for b in succeeded),
                "failed": ids,
                # exact windows, so retry re-clamps --event-time-end backfills
                "failed_windows": {
                    b.batch_id: [b.start.isoformat(), b.end.isoformat()]
                    for b in failed
                },
            },
        )
    return rel
