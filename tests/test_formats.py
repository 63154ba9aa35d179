"""TableFormat seam (dbt_spark/formats.py): format routing under
RelationStore, capability flags, and the jar-gated ACID formats' clean
in-container failure mode."""

import os

import pytest

from dbt_spark.catalog import RelationStore
from dbt_spark.formats import TABLE_FORMATS, table_format


def test_registry_and_lookup():
    assert set(TABLE_FORMATS) == {"parquet", "orc", "json", "csv",
                                  "delta", "iceberg"}
    assert table_format(None).name == "parquet"
    assert table_format("CSV").name == "csv"
    with pytest.raises(ValueError, match="unknown file_format"):
        table_format("hudi")


def test_capability_flags():
    assert not table_format("parquet").acid
    assert not table_format("csv").supports_native_merge
    assert table_format("delta").acid
    assert table_format("iceberg").supports_native_merge


def test_acid_formats_gated_in_container(spark):
    # no delta/iceberg jars here: selecting them must fail EARLY with a
    # clear message, not deep inside a Spark job
    for name in ("delta", "iceberg"):
        fmt = table_format(name)
        assert not fmt.available(spark)
        with pytest.raises(RuntimeError, match=f"file_format='{name}'"):
            fmt.require(spark)


def test_write_table_rejects_gated_format(spark, tmp_path):
    store = RelationStore(spark, str(tmp_path / "wh"))
    df = spark.range(3).selectExpr("id", "id * 2 AS v")
    with pytest.raises(RuntimeError, match="delta"):
        store.write_table("main", "t_delta", df, file_format="delta")
    # nothing half-written
    assert store.get("main", "t_delta") is None
    assert not os.path.exists(store.path_for("main", "t_delta"))


def test_swap_formats_roundtrip_through_store(spark, tmp_path):
    store = RelationStore(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id int, s string, v double")
    for fmt in ("parquet", "orc", "json", "csv"):
        rel = store.write_table("main", f"t_{fmt}", df, file_format=fmt)
        got = sorted((r.id, r.s, float(r.v))
                     for r in store.read("main", f"t_{fmt}").collect())
        assert got == [(1, "a", 1.5), (2, "b", 2.5)], fmt
        # exact types survive the round trip (schema_json for schema-light)
        assert store.read("main", f"t_{fmt}").schema == df.schema, fmt
        if fmt == "parquet":
            assert "file_format" not in rel.meta
        else:
            assert rel.meta["file_format"] == fmt


def test_overwrite_swap_is_atomic_per_format(spark, tmp_path):
    # second overwrite fully replaces the first; no leftover staging dirs
    store = RelationStore(spark, str(tmp_path / "wh"))
    d1 = spark.range(5).selectExpr("id")
    d2 = spark.range(2).selectExpr("id + 100 AS id")
    for fmt in ("parquet", "json"):
        store.write_table("main", f"a_{fmt}", d1, file_format=fmt)
        store.write_table("main", f"a_{fmt}", d2, file_format=fmt)
        got = sorted(r.id for r in store.read("main", f"a_{fmt}").collect())
        assert got == [100, 101], fmt
        parent = os.path.dirname(store.path_for("main", f"a_{fmt}"))
        assert not [e for e in os.listdir(parent) if "__staging__" in e]


def test_standalone_overwrite_replaces_existing_dir(spark, tmp_path):
    """write_overwrite without a RelationStore swap callable (standalone
    use) must still replace an existing non-empty target directory —
    os.replace alone refuses that, so the old copy is retired first."""
    fmt = table_format("parquet")
    path = str(tmp_path / "standalone_tbl")
    fmt.write_overwrite(spark.range(4).selectExpr("id"), path)
    fmt.write_overwrite(spark.range(2).selectExpr("id + 50 AS id"), path)
    got = sorted(r.id for r in spark.read.parquet(path).collect())
    assert got == [50, 51]
    parent = os.path.dirname(path)
    leftovers = [e for e in os.listdir(parent)
                 if "__staging__" in e or "__retired__" in e]
    assert not leftovers
