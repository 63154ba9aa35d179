"""Round-13 ADVICE regression tests (one per r12 advisory):

1. split_dml_statements handles NESTED block comments (Spark 3.0+
   accepts them; a flat scanner exits at the first '*/' and splits on a
   ';' still inside the outer comment).
2. chunk_text knob raises a clear ValueError when the model output
   already carries 'chunk_idx'/'chunk_start' (instead of an opaque
   ambiguous-column AnalysisException later), and NULL content rows are
   dropped like empty strings.
3. embedding_quality_audit buckets NaN/Inf vectors deterministically in
   BOTH engines (norm2 over finite components only) instead of nulling
   in Spark and erroring in DuckDB.
4. rag_retrieval_eval keeps zero-recall queries (gold_rank NULL /
   hit_at_k false) instead of dropping them from the recall report.
5. dp_laplace_release noise stays finite even when the 60-bit cell hash
   is 0 (u clamped inside the open interval (-0.5, 0.5)).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest
from pyspark.sql import Row, functions as F


# ---- 1. nested block comments ------------------------------------------

def test_split_dml_nested_block_comments():
    from dbt_spark.operators.incremental import split_dml_statements as split

    got = split("/* a /* b */ still comment; */ INSERT INTO t VALUES (1); "
                "DELETE FROM t")
    assert got == ["/* a /* b */ still comment; */ INSERT INTO t VALUES (1)",
                   "DELETE FROM t"]
    # three levels deep, semicolons at every depth
    got = split("/*/* d2 /* d3 ; */ ; */ ; */ SELECT 1; SELECT 2")
    assert got == ["/*/* d2 /* d3 ; */ ; */ ; */ SELECT 1", "SELECT 2"]
    # unterminated nested comment swallows the rest (no bogus split)
    got = split("/* open /* inner */ still open; SELECT 1")
    assert got == ["/* open /* inner */ still open; SELECT 1"]
    # '/*' inside a string literal is NOT a comment opener
    got = split("INSERT INTO t VALUES ('/*'); SELECT '*/'")
    assert got == ["INSERT INTO t VALUES ('/*')", "SELECT '*/'"]


# ---- 2. chunk_text clash + NULL content --------------------------------

def test_chunk_text_injected_column_clash_raises(project_dir, spark):
    from dbt_spark.runner import Engine

    files = {
        "dbt_project.yml": "name: clash13\n",
        "models/chunked.sql": (
            "{{ config(materialized='table', "
            "chunk_text={'content': 'body', 'window': 5, 'stride': 3}) }}"
            "select 1 as id, 'abcdefgh' as body, 0 as chunk_idx"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    r = eng.invoke(["run"])
    assert not r.success
    msgs = " ".join(str(x.message) for x in r.results)
    assert "chunk_text injects columns" in msgs and "chunk_idx" in msgs


def test_chunk_text_null_content_dropped(project_dir, spark):
    from dbt_spark.runner import Engine

    files = {
        "dbt_project.yml": "name: nullck13\n",
        "models/chunked.sql": (
            "{{ config(materialized='table', "
            "chunk_text={'content': 'body', 'window': 4, 'stride': 2}) }}"
            "select * from (values (1, 'abcdef'), (2, cast(null as string)),"
            " (3, '')) as t(id, body)"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    rows = sorted(
        (x["id"], x["chunk_idx"], x["body"])
        for x in eng.store.read("main", "chunked").collect())
    # id=2 (NULL) and id=3 (empty) contribute no chunks
    assert {i for i, _, _ in rows} == {1}
    assert rows == [(1, 0, "abcd"), (1, 1, "cdef"), (1, 2, "ef")]


# ---- 3. embedding_quality_audit non-finite pairing ---------------------

def _write_dirty_embeddings(tmp_path):
    con = duckdb.connect()
    con.sql("""
        CREATE TABLE embeddings AS
        SELECT * FROM (VALUES
            (0, [0.6, 0.8]::FLOAT[], 0),
            (1, ['nan'::FLOAT, 1.0::FLOAT], 0),
            (2, ['inf'::FLOAT, 2.0::FLOAT], 1),
            (3, [0.0::FLOAT, 0.0::FLOAT], 1),
            (4, [NULL::FLOAT, 3.0::FLOAT], 1),
            (5, [1.0::FLOAT, 0.0::FLOAT], 0)
        ) AS t(vec_id, embedding, label)
    """)
    path = os.path.join(str(tmp_path), "embeddings.parquet")
    con.sql(f"COPY embeddings TO '{path}' (FORMAT PARQUET)")
    return str(tmp_path), path


def test_embedding_quality_audit_nonfinite_pairs(spark, tmp_path):
    from dbt_spark.queries.llmops import ORACLES, embedding_quality_audit

    sf_dir, path = _write_dirty_embeddings(tmp_path)
    got = embedding_quality_audit(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
    want = con.sql(ORACLES["embedding_quality_audit"]).df()

    def canon(df):
        cols = sorted(df.columns)
        out = []
        for row in df[cols].itertuples(index=False):
            out.append(tuple(
                "NULL" if v is None
                or (isinstance(v, float) and math.isnan(v))
                else (round(v, 6) if isinstance(v, float) else v)
                for v in row))
        return sorted(out)

    assert canon(got) == canon(want)
    # every one of the 6 vectors buckets somewhere (none vanish into a
    # NULL-norm bucket) and the three bad ones are counted
    assert int(got["n_vectors"].sum()) == 6
    assert int(got["n_nonfinite"].sum()) == 3


# ---- 4. rag zero-recall queries retained -------------------------------

def test_rag_retrieval_eval_keeps_zero_recall_queries(spark, tmp_path):
    """A query doc whose window text shares no 3-gram with any chunk must
    appear with hit_at_k=false, not vanish from the recall report."""
    from dbt_spark.queries import llmops as L

    q_mod, q_off, q_len = L._RAG_Q_MOD, L._RAG_Q_OFF, L._RAG_Q_LEN
    con = duckdb.connect()
    # doc 0 is the only query candidate (doc_id % mod == 0). Its text —
    # and therefore its query window — is one repeated token, so its sole
    # 3-gram 'x x x' is hot in > _RAG_DF_CAP chunks (every planted doc
    # opens with an x-run) and gets DF-pruned from BOTH gram sets. Result:
    # the query retrieves nothing and must still appear as a miss.
    filler = "the quick brown fox jumps over the lazy dog " * 40
    rows = []
    hot = "x " * (q_off + q_len + 40)
    rows.append((0, hot, "en", "web", len(hot)))
    for i in range(1, 1 + L._RAG_DF_CAP + 5):
        body = ("x " * 200) + filler
        rows.append((i * q_mod + 1, body, "en", "web", len(body)))
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
            "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)
    path = os.path.join(str(tmp_path), "documents.parquet")
    con.sql(f"COPY documents TO '{path}' (FORMAT PARQUET)")

    got = L.rag_retrieval_eval(spark, str(tmp_path)).toPandas()
    # doc 0 qualifies as a query; its only gram 'x x x' is df-capped away
    # -> zero retrieved chunks -> must still be present, miss, 0 grams
    assert 0 in set(got["qid"]), got
    r0 = got[got["qid"] == 0].iloc[0]
    assert int(r0["n_query_grams"]) == 0
    assert not bool(r0["hit_at_k"])
    assert r0["gold_rank"] is None or (
        isinstance(r0["gold_rank"], float) and math.isnan(r0["gold_rank"]))
    # oracle agrees
    con2 = duckdb.connect()
    con2.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    want = con2.sql(L.ORACLES["rag_retrieval_eval"]).df()
    assert sorted(want["qid"]) == sorted(got["qid"])


# ---- 5. dp noise finite at the hash floor ------------------------------

def test_dp_laplace_u_stays_inside_open_interval(spark):
    """The portable-draw formula must be finite for EVERY 60-bit hash
    value, including h=0 and h=2^60-1 (the endpoints that previously
    produced ln(0) = -inf)."""
    from dbt_spark.queries.hygiene import _DP_U_MAX

    def h2u(h):
        u0 = h / float(1 << 60) - 0.5
        return math.copysign(min(abs(u0), _DP_U_MAX), u0)

    for h in (0, 1, (1 << 60) - 1, 1 << 59):
        u = h2u(h)
        assert -0.5 < u < 0.5
        noise = -1.0 * math.copysign(1.0, u) * math.log(1.0 - 2.0 * abs(u))
        assert math.isfinite(noise), (h, u, noise)
    # and the registered query itself emits only finite noisy counts
    from dbt_spark.queries.hygiene import dp_laplace_release

    df = dp_laplace_release(spark, "/root/testdata/sf0.001").toPandas()
    assert len(df) > 0
    assert all(math.isfinite(v) for v in df["noisy_n_r4"])
