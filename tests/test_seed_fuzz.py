"""Differential fuzzing for seed CSV loading.

Random CSVs (delimiters, quoted fields with embedded delimiters/newlines,
unicode, NULL-as-empty cells, column_types casts) loaded through the REAL
seed materializer (operators/seed.py — Spark CSV reader + pinned casts,
the agate-inference analog) and compared against pandas read_csv as the
independent oracle (reference: core/dbt/parser/seeds.py + SeedConfig
delimiter/column_types knobs).

Fixed seeds; family base 220k rotated by DBT_SPARK_FUZZ_OFFSET.
"""

from __future__ import annotations

import io
import os
import random
import tempfile

import pandas as pd
import pytest

from dbt_spark.catalog import RelationStore
from dbt_spark.operators.materialize import ExecutionContext
from dbt_spark.operators.seed import materialize_seed
from dbt_spark.plans.manifest import Manifest, ManifestNode, NodeConfig, NodeType
from dbt_spark.project import Project

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 220_000

WORDS = ["plain", "unié", "sp ace", "q\"uote", "comm,a", "semi;colon",
         "new\nline", "zz"]


def _gen_csv(rng, delim):
    """(csv_text, frame) — frame holds the expected typed values."""
    n = rng.randrange(3, 9)
    rows = []
    for i in range(n):
        rows.append({
            "id": i + 1,
            "num": rng.randrange(-50, 500),
            "amt": round(rng.uniform(-5, 5), 3),
            "word": rng.choice(WORDS) if rng.random() > 0.15 else None,
        })
    frame = pd.DataFrame(rows)
    buf = io.StringIO()
    frame.to_csv(buf, index=False, sep=delim)
    return buf.getvalue(), frame


@pytest.mark.parametrize("seed", range(14))
def test_seed_csv_differential(spark, seed):
    rng = random.Random(_BASE + _OFF + seed)
    delim = rng.choice([",", ";", "|"])
    column_types = rng.choice([
        None,
        {"num": "bigint", "amt": "double"},
        {"num": "double"},
        {"amt": "decimal(10,3)"},
    ])
    csv_text, frame = _gen_csv(rng, delim)

    tmp = tempfile.mkdtemp(prefix="dbt_spark_seedfuzz_")
    os.makedirs(os.path.join(tmp, "seeds"), exist_ok=True)
    with open(os.path.join(tmp, "seeds", "s.csv"), "w") as f:
        f.write(csv_text)
    project = Project(
        name="seedfuzz", root=tmp,
        profile={"warehouse": os.path.join(tmp, "wh"), "schema": "main",
                 "threads": 2},
    )
    ctx = ExecutionContext(
        spark=spark, store=RelationStore(spark, project.profile["warehouse"]),
        manifest=Manifest(project_name="seedfuzz"), project=project,
    )
    cfg = {"materialized": "seed", "delimiter": delim}
    if column_types:
        cfg["column_types"] = column_types
    node = ManifestNode(
        unique_id="seed.seedfuzz.s", name="s", package_name="seedfuzz",
        path="seeds/s.csv", resource_type=NodeType.Seed,
        config=NodeConfig().merged(**cfg),
    )
    materialize_seed(ctx, node)
    got = ctx.store.read("main", "s").toPandas()

    assert list(got.columns) == ["id", "num", "amt", "word"]
    assert len(got) == len(frame)
    got = got.sort_values("id").reset_index(drop=True)
    want = frame.sort_values("id").reset_index(drop=True)
    for i in range(len(want)):
        assert int(got.loc[i, "id"]) == int(want.loc[i, "id"])
        assert float(got.loc[i, "num"]) == float(want.loc[i, "num"]), (
            f"seed={seed} row={i} num")
        assert abs(float(got.loc[i, "amt"]) - float(want.loc[i, "amt"])) \
            < 1e-9, f"seed={seed} row={i} amt"
        w_got, w_want = got.loc[i, "word"], want.loc[i, "word"]
        if w_want is None or (isinstance(w_want, float) and pd.isna(w_want)):
            assert w_got is None or pd.isna(w_got), f"seed={seed} row={i}"
        else:
            assert w_got == w_want, f"seed={seed} row={i} {w_got!r}"
