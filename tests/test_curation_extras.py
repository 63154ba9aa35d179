"""source_gini_inequality + weighted_sample_topk (queries/curation.py)
vs independent pure-python computations on the same parquet."""

from __future__ import annotations

import math

import pandas as pd

_SF = "/root/testdata/sf0.001"


def _docs_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{_SF}/documents.parquet")


def test_gini_vs_python(spark):
    from dbt_spark.queries.curation import source_gini_inequality

    got = {r["lang"]: r for r in source_gini_inequality(spark, _SF).collect()}
    pdf = _docs_pdf()
    for lang, grp in pdf.groupby("lang"):
        xs = grp.sort_values(["n_chars", "doc_id"])["n_chars"].tolist()
        n = len(xs)
        s1 = sum((i + 1) * x for i, x in enumerate(xs))
        want = (2 * s1 - (n + 1) * sum(xs)) / (n * sum(xs))
        g = got[lang]
        assert g["n_docs"] == n and g["sum_chars"] == sum(xs)
        assert abs(g["gini"] - want) < 1e-12, lang
        assert 0.0 <= g["gini"] < 1.0


def test_weighted_sample_vs_python(spark):
    from dbt_spark.queries.curation import weighted_sample_topk

    got = weighted_sample_topk(spark, _SF).collect()
    assert len(got) == 20
    pdf = _docs_pdf()

    def key(doc_id: int, w: int) -> float:
        import hashlib

        hx = hashlib.md5(str(doc_id).encode()).hexdigest()[:6]
        u = (int(hx, 16) + 0.5) / 16**6
        return -math.log(u) / w

    pdf["k"] = [key(d, w) for d, w in zip(pdf["doc_id"], pdf["n_chars"])]
    want = pdf.sort_values(["k", "doc_id"]).head(20)
    assert [r["doc_id"] for r in got] == want["doc_id"].tolist()
    for r, (_, w) in zip(got, want.iterrows()):
        assert abs(r["race_key_r6"] - round(w["k"], 6)) <= 1e-6
    # weight bias: the size-weighted sample skews long
    assert want["n_chars"].mean() > pdf["n_chars"].mean()


def test_moments_quantile_sketch_calibration(spark):
    from dbt_spark.queries.curation import moments_quantile_sketch

    rows = moments_quantile_sketch(spark, _SF).collect()
    assert len(rows) == 5
    for r in rows:
        # CF estimates track the exact interpolated percentiles: generous
        # bands (CF is an asymptotic expansion, not a guarantee), but the
        # p50 estimate must beat a mean-only guess at p90/p99
        assert abs(r["p50_cf_r6"] - r["p50_exact_r6"]) < 0.15 * r["p50_exact_r6"]
        assert abs(r["p90_cf_r6"] - r["p90_exact_r6"]) < 0.15 * r["p90_exact_r6"]
        assert abs(r["p99_cf_r6"] - r["p99_exact_r6"]) < 0.25 * r["p99_exact_r6"]
        # monotone in p
        assert r["p50_cf_r6"] < r["p90_cf_r6"] < r["p99_cf_r6"]
