"""Scale probe: replicate the sf0.1 tables Nx into /tmp and time headline
queries at both scales.

Evidence for SCALE.md: a plan that survives scale-up shows sublinear-to-
linear wall-clock growth (shuffle volume ∝ data, fixed overheads amortized);
a plan with a hidden quadratic candidate blow-up or driver bottleneck shows
superlinear growth. Run: python tools/scale_probe.py [--mult 10] [--queries a,b].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_QUERIES = [
    "pricing_summary",            # scan+agg
    "join_inner",                 # fact-dim join
    "tpch_q3_shipping_priority",  # 3-way join+agg+topn
    "tpch_q18_large_orders",      # agg + semi-join back
    "window_running_sum",         # window over fact
    "join_asof",                  # custom as-of
    "dedup_exact",                # hash dedup
    "training_data_pipeline",     # text pipeline
    "dedup_minhash_lsh",          # LSH candidates
    "sequence_packing",           # window packing
    "semantic_metric_query",      # compiled semantic-layer metric
    "ann_topk_ivf",               # IVF probe (trained-centroid cache)
    "event_funnel",               # sequential conditional-min chain
    "retention_cohorts",          # cohort x week rollup
    "tfidf_top_terms",            # checkpointed tf fan-out
    "ngram_novelty_rate",         # gram-keyed first-occurrence join
    "dsir_importance_select",     # bucket-stat broadcast + doc-keyed score
    "ngram_lm_quality_score",     # gram-keyed LM-count joins + doc rollup
    "semantic_semi_additive_metric",  # NAD window-value agg + join-back
    "ann_topk_pq",                # PQ/ADC codes scan + shortlist re-rank
    "suffix_repeat_stats",        # prefix-doubling suffix array + LCP lifting
    "dedup_cc_star_chain",        # alternating large/small-star CC
    "heavy_hitters_mg",           # MG candidate pass + exact verify
    "decontam_bloom_prefilter",   # Bloom literal prefilter + exact join
    "moore_lewis_select",         # two-LM gram-keyed scoring joins
    "copurchase_triangle_stats",  # degree-ordered triangle counting
    "copurchase_pagerank",        # 4 power iterations (join + sum shuffle)
    "pii_redact_stats",           # chained regex redaction, scan-stage
    "boilerplate_segment_dedup",  # segment DF + broadcast removal join
    "holdout_split_grouped",      # md5-bucket grouped split
    "source_gini_inequality",     # partitioned rank window + decimal sums
    "weighted_sample_topk",       # A-ES race, TakeOrderedAndProject
    "decontam_exact_substring_cover",  # broadcast W-gram hash join
    "hll_token_cardinality",      # explicit HLL registers
    "cms_token_freq",             # CMS counters + probe join
    "event_transition_matrix",    # user-partitioned LAG + pair groupBy
]


def replicate(spark, src_dir: str, dst_dir: str, mult: int) -> None:
    """Write mult copies of each table with shifted ids (keeps keys unique and
    join fan-outs realistic; dimension tables are NOT replicated — at scale
    facts grow, dims don't)."""
    from pyspark.sql import functions as F

    from dbt_spark.session import read_parquet

    facts = {
        "lineitem": "l_orderkey",
        "orders": "o_orderkey",
        "events": "event_id",
        "documents": "doc_id",
        "embeddings": "vec_id",
    }
    dims = ["region", "nation", "customer", "supplier", "part"]
    os.makedirs(dst_dir, exist_ok=True)
    for t in dims:
        read_parquet(spark, os.path.join(src_dir, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(dst_dir, f"{t}.parquet"))
    for t, key in facts.items():
        df = read_parquet(spark, os.path.join(src_dir, f"{t}.parquet"))
        span = df.agg(F.max(key)).collect()[0][0] + 1
        copies = [
            df.withColumn(key, F.col(key) + F.lit(i * span)) for i in range(mult)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(dst_dir, f"{t}.parquet"))


def time_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    from dbt_spark.queries import QUERIES

    out = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        best = None
        for _ in range(2):  # min-of-2: isolate plan cost from first-touch
            t0 = time.time()  # (broadcast build, codegen JIT, footer reads)
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    from dbt_spark.session import get_spark

    names = args.queries.split(",") if args.queries else PROBE_QUERIES
    spark = get_spark("scale_probe")
    dst = os.path.join(tempfile.gettempdir(), f"scale_probe_x{args.mult}")
    if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
        replicate(spark, args.src, dst, args.mult)

    # warm pass at base scale (codegen/JIT), then measure both scales
    time_queries(spark, args.src, names)
    base = time_queries(spark, args.src, names)
    big = time_queries(spark, dst, names)
    report = {
        name: {
            "base_s": base[name],
            f"x{args.mult}_s": big[name],
            "growth": round(big[name] / base[name], 2) if base[name] else None,
        }
        for name in base
    }
    print(json.dumps({"mult": args.mult, "queries": report}, indent=2))


if __name__ == "__main__":
    sys.exit(main() or 0)
