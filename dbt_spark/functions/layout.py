"""Physical-layout helpers: multi-dimensional z-order clustering.

Z-ordering (Morton 1966; the public analog is Delta/Databricks
``OPTIMIZE ... ZORDER BY``) interleaves the bits of several normalized sort
keys into one linear key, so range-partitioning + in-file sorting on that key
co-locates rows that are close in EVERY keyed dimension. Parquet row-group
min/max statistics then prune selective predicates on ANY of the z-ordered
columns — a lexicographic ``sort_by(a, b)`` only prunes on ``a``.

All math is codegen'd column expressions; the only driver traffic is a
1-row min/max aggregate per keyed column (bounded at any scale) and the
range partitioner's standard sampling pass."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_layout(
    df: DataFrame,
    cols: "list[str]",
    bits: int = 16,
    out_partitions: "int | None" = None,
) -> DataFrame:
    """Return ``df`` re-laid-out in z-order over ``cols`` (2-4 numeric /
    timestamp columns).

    - normalize each column to a ``bits``-bit integer rank over its min/max
      span (linear binning; quantile binning is the upgrade for extreme
      skew),
    - interleave bits (bit j of column i lands at position j*k + i),
    - repartitionByRange + sortWithinPartitions on the interleaved key so
      both file boundaries and row groups cluster in every dimension.
    """
    k = len(cols)
    if not 2 <= k <= 4:
        raise ValueError("zorder_by expects 2-4 columns")
    if bits * k > 63:
        bits = 63 // k

    aggs = []
    for i, c in enumerate(cols):
        num = F.col(c).cast("double")
        aggs += [F.min(num).alias(f"mn{i}"), F.max(num).alias(f"mx{i}")]
    stats = df.agg(*aggs).collect()[0]  # 1 row: bounded driver traffic

    top = (1 << bits) - 1
    keys = []
    for i, c in enumerate(cols):
        mn, mx = stats[f"mn{i}"], stats[f"mx{i}"]
        if mn is None or mx is None:
            keys.append(F.lit(0).cast("bigint"))
            continue
        span = (mx - mn) or 1.0
        scaled = ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span)) * top
        keys.append(
            F.least(F.lit(top).cast("bigint"),
                    F.greatest(F.lit(0).cast("bigint"),
                               scaled.cast("bigint")))
        )

    morton = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, key in enumerate(keys):
            bit = F.shiftright(key, b).bitwiseAND(F.lit(1))
            morton = morton.bitwiseOR(F.shiftleft(bit, b * k + i))

    n = out_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return (
        df.withColumn("__zorder__", morton)
        .repartitionByRange(n, "__zorder__")
        .sortWithinPartitions("__zorder__")
        .drop("__zorder__")
    )
