"""Format-preset roundtrips: every format the generic reader/writer claims
is proven by write→read-back equality against the parquet source of truth.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from amazon_sales_data_engineering_spark.sources.formats import (
    read_table,
    write_table,
)

from .conftest import SF_DIR


def _nation(spark):
    return spark.read.parquet(f"{SF_DIR}/nation.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, tmp_path, fmt):
    src = _nation(spark)
    path = str(tmp_path / f"nation_{fmt}")
    write_table(src, path, fmt=fmt)
    # CSV/JSON lose types; read back with the source schema so the
    # comparison is value-level, as the reference's FILE FORMAT loads do.
    schema = src.schema if fmt in ("csv", "json") else None
    got = read_table(spark, path, fmt=fmt, schema=schema)
    assert _rows(got.select(*src.columns)) == _rows(src)


def test_partitioned_write_prunes(spark, tmp_path):
    """Hive-style partitionBy on write → partition pruning on read."""
    src = _nation(spark)
    path = str(tmp_path / "nation_part")
    write_table(src, path, fmt="parquet", partition_by=["n_regionkey"])
    got = read_table(spark, path, fmt="parquet").filter(F.col("n_regionkey") == 1)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(n_regionkey" in plan or "n_regionkey" in plan
    assert _rows(got.select(*src.columns)) == _rows(
        src.filter(F.col("n_regionkey") == 1)
    )


def test_text_line_reader(spark, tmp_path):
    """text format: one row per line in `value` — the raw-corpus edge."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        # newline-free by construction (synthetic single-line docs)
        F.regexp_replace("text", "\n", " ").alias("value")
    )
    path = str(tmp_path / "corpus_txt")
    write_table(docs, path, fmt="text")
    got = read_table(spark, path, fmt="text")
    assert got.columns == ["value"]
    assert got.count() == docs.count()


def test_avro_probe_message(spark, tmp_path):
    """Without the spark-avro jar the error must be actionable, not a
    ClassNotFoundException; with the jar present the roundtrip must work."""
    src = _nation(spark)
    path = str(tmp_path / "nation_avro")
    try:
        write_table(src, path, fmt="avro")
    except RuntimeError as exc:
        assert "spark-avro" in str(exc)
        return
    got = read_table(spark, path, fmt="avro")
    assert _rows(got.select(*src.columns)) == _rows(src)


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, "/tmp/x", fmt="xml")


def test_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution across parquet batches: a later batch adds a
    column; mergeSchema reads the union schema and back-fills NULLs for
    old files — the append-only evolution pattern a long-lived table
    needs (new pipeline version adds a field without rewriting history)."""
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    v1.write.parquet(path + "/batch=1")
    v2 = spark.createDataFrame(
        [(3, "c", 9.5)], "id long, name string, score double"
    )
    v2.write.parquet(path + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert sorted(merged.columns) == ["batch", "id", "name", "score"]
    rows = {r.id: (r.name, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 9.5)}

    # Without mergeSchema the footer of one file wins: reading must not
    # be relied on for evolved history (documents why the option exists).
    plain = spark.read.parquet(path)
    assert set(plain.columns) <= {"batch", "id", "name", "score"}
