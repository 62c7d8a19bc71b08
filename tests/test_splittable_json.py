"""Splittable multiLine-JSON ingest (sources/splittable_json): the
two-pass state-transfer element splitter must reproduce Spark's own
multiLine (outer-array) reader EXACTLY — on the real FR fixtures
(pretty-printed, \\u escapes, null fields, embedded-newline addresses)
and on an adversarial synthetic file swept across split sizes so every
byte position — including mid-escape-sequence — serves as a chunk
boundary at least once."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import types as T

from amazon_sales_data_engineering_spark.sources.readers import _json_schema
from amazon_sales_data_engineering_spark.sources.splittable_json import (
    read_json_splittable,
)

FR_GLOB = (
    "/root/reference/amazon-sales-data/sales/source=FR/format=json/"
    "date=*/*.json"
)


def _rows(df, cols):
    return sorted(
        (tuple(r[c] for c in cols) for r in df.select(*cols).collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


@pytest.mark.skipif(
    not glob.glob(FR_GLOB), reason="reference FR fixtures not present"
)
@pytest.mark.parametrize("split_bytes", [64, 4096])
def test_matches_multiline_reader_on_real_fr_fixtures(spark, split_bytes):
    schema = _json_schema()
    cols = [f.name for f in schema.fields]
    native = (
        spark.read.schema(schema)
        .options(multiLine=True, mode="PERMISSIVE")
        .json(FR_GLOB)
    )
    split = read_json_splittable(
        spark, FR_GLOB, schema, split_bytes=split_bytes
    )
    assert _rows(split, cols) == _rows(native, cols)
    # small splits genuinely exercise multi-chunk files
    total = sum(os.path.getsize(p) for p in glob.glob(FR_GLOB))
    assert total > split_bytes


def test_adversarial_escapes_across_every_split_size(spark, tmp_path):
    """Escaped quotes, backslash RUNS (even/odd — the state the CSV
    scheme can't express), embedded newlines inside and between
    elements, \\u escapes, nested objects/arrays, braces inside
    strings — swept over split sizes 1..60 so every byte (including
    the middle of every escape sequence) is a chunk boundary."""
    body = (
        '[\n'
        '  {"a": "x", "b": 1},\n'
        '  {"a": "he said \\"hi\\"", "b": 2},\n'
        '  {"a": "backslash \\\\", "b": 3},\n'
        '  {"a": "run \\\\\\" mix", "b": 4},\n'
        '  {"a": "line\\nbreak", "b": 5},\n'
        '  {"a": "unicode \\u00e9\\u0022", "b": 6},\n'
        '  {"a": "braces {not [real] ones}", "b": 7},\n'
        '  {"a": null, "b": 8},\n'
        '  {"a": "nested", "b": 9, "c": {"d": [1, 2, {"e": "}"}]}}\n'
        ']\n'
    )
    p = tmp_path / "nasty.json"
    p.write_text(body)
    schema = T.StructType(
        [
            T.StructField("a", T.StringType()),
            T.StructField("b", T.LongType()),
        ]
    )
    native = (
        spark.read.schema(schema)
        .options(multiLine=True, mode="PERMISSIVE")
        .json(str(p))
    )
    want = _rows(native, ["a", "b"])
    assert len(want) == 9
    for sb in range(1, 61):
        got = _rows(
            read_json_splittable(spark, str(p), schema, split_bytes=sb),
            ["a", "b"],
        )
        assert got == want, f"split_bytes={sb}: {got} != {want}"


def test_rejects_ndjson_files(spark, tmp_path):
    """NDJSON is not a supported shape (it is natively splittable —
    no reason to route it here). Round-9: '{' now means wrapper-object,
    so the rejection moved from the head-byte check to (a) the driver
    fold when the values straddle chunks, (b) the per-chunk scan
    otherwise."""
    p = tmp_path / "lines.json"
    p.write_text('{"a": 1}\n{"a": 2}\n')
    schema = T.StructType([T.StructField("a", T.LongType())])
    # (a) 8-byte chunks: value 2 starts in a later chunk after the fold
    # saw depth return to 0 -> plan-time ValueError
    with pytest.raises(ValueError, match="top-level"):
        read_json_splittable(spark, str(p), schema, split_bytes=8)
    # (b) whole file in one chunk -> the extract task raises at scan time
    with pytest.raises(Exception, match="top-level"):
        read_json_splittable(spark, str(p), schema).collect()


def test_rejects_non_json_head(spark, tmp_path):
    p = tmp_path / "scalar.json"
    p.write_text("42\n")
    schema = T.StructType([T.StructField("a", T.LongType())])
    with pytest.raises(ValueError, match="neither"):
        read_json_splittable(spark, str(p), schema)


def test_rejects_scalar_and_array_elements(spark, tmp_path):
    """Round-9 error-path gate: non-object values at the element depth
    RAISE with a byte offset — never silently dropped."""
    schema = T.StructType([T.StructField("a", T.LongType())])
    for name, body in [
        ("nums.json", "[1, 2, 3]"),
        ("strs.json", '["x", "y"]'),
        ("arrs.json", "[[1], [2]]"),
        ("mixed.json", '[{"a": 1}, 5]'),
        ("wrapped_nums.json", '{"rows": [1, 2]}'),
    ]:
        p = tmp_path / name
        p.write_text(body)
        with pytest.raises(Exception, match="non-object element"):
            read_json_splittable(spark, str(p), schema).collect()


def test_wrapper_rejects_object_valued_keys(spark, tmp_path):
    p = tmp_path / "meta.json"
    p.write_text('{"meta": {"x": 1}, "rows": [{"a": 1}]}')
    schema = T.StructType([T.StructField("a", T.LongType())])
    with pytest.raises(Exception, match="wrapper key"):
        read_json_splittable(spark, str(p), schema).collect()


def test_wrapper_rejects_second_array_in_chunk(spark, tmp_path):
    p = tmp_path / "two.json"
    p.write_text('{"rows": [{"a": 1}], "more": [{"a": 2}]}')
    schema = T.StructType([T.StructField("a", T.LongType())])
    with pytest.raises(Exception, match="SECOND depth-1 array"):
        read_json_splittable(spark, str(p), schema).collect()


def test_rejects_mixed_shape_glob(spark, tmp_path):
    (tmp_path / "a.json").write_text('[{"a": 1}]')
    (tmp_path / "b.json").write_text('{"rows": [{"a": 2}]}')
    schema = T.StructType([T.StructField("a", T.LongType())])
    with pytest.raises(ValueError, match="mixed shapes"):
        read_json_splittable(spark, str(tmp_path / "*.json"), schema)


def test_wrapper_object_matches_native_explode_every_split_size(
    spark, tmp_path
):
    """Round-9 verdict #3: the wrapper-object shape ({scalar metadata
    keys + ONE element array}) must byte-match the native multiLine
    reader + explode across split sizes 1..60 — same adversarial
    payloads as the bare-array sweep, plus metadata keys BEFORE and
    AFTER the array (string with escaped braces, numbers, null)."""
    body = (
        '{"status": "ok [not] {an array}", "count": 9,\n'
        ' "rows": [\n'
        '  {"a": "x", "b": 1},\n'
        '  {"a": "he said \\"hi\\"", "b": 2},\n'
        '  {"a": "backslash \\\\", "b": 3},\n'
        '  {"a": "run \\\\\\" mix", "b": 4},\n'
        '  {"a": "line\\nbreak", "b": 5},\n'
        '  {"a": "unicode \\u00e9\\u0022", "b": 6},\n'
        '  {"a": "braces {not [real] ones}", "b": 7},\n'
        '  {"a": null, "b": 8},\n'
        '  {"a": "nested", "b": 9, "c": {"d": [1, 2, {"e": "}"}]}}\n'
        ' ],\n'
        ' "version": 2, "note": null}\n'
    )
    p = tmp_path / "wrapped.json"
    p.write_text(body)
    elem = T.StructType(
        [
            T.StructField("a", T.StringType()),
            T.StructField("b", T.LongType()),
        ]
    )
    native_schema = T.StructType(
        [T.StructField("rows", T.ArrayType(elem))]
    )
    from pyspark.sql import functions as F

    native = (
        spark.read.schema(native_schema)
        .options(multiLine=True, mode="PERMISSIVE")
        .json(str(p))
        .select(F.explode("rows").alias("r"))
        .select("r.a", "r.b")
    )
    want = _rows(native, ["a", "b"])
    assert len(want) == 9
    for sb in range(1, 61):
        got = _rows(
            read_json_splittable(spark, str(p), elem, split_bytes=sb),
            ["a", "b"],
        )
        assert got == want, f"split_bytes={sb}: {got} != {want}"


def test_rejects_malformed_fold(spark, tmp_path):
    p = tmp_path / "trunc.json"
    p.write_text('[\n  {"a": "unterminated string}\n]')  # quote never closes
    schema = T.StructType([T.StructField("a", T.StringType())])
    with pytest.raises(ValueError, match="fold"):
        read_json_splittable(spark, str(p), schema)


def test_manifest_skips_transfer_pass(spark, tmp_path, monkeypatch):
    """Same one-pass re-ingest contract as the CSV splitter: a manifest
    hit must not re-run the transfer pass; a rewritten file must."""
    import amazon_sales_data_engineering_spark.sources.splittable_json as sj

    body = '[{"a": "x\\n\\"y\\"", "b": 1}, {"a": null, "b": 2}]'
    p = tmp_path / "m.json"
    p.write_text(body)
    schema = T.StructType(
        [T.StructField("a", T.StringType()), T.StructField("b", T.LongType())]
    )
    mdir = str(tmp_path / "manifest")
    want = _rows(
        read_json_splittable(
            spark, str(p), schema, split_bytes=8, manifest_dir=mdir
        ),
        ["a", "b"],
    )
    assert len(want) == 2

    def boom(_batches):
        raise RuntimeError("transfer pass must not run on a manifest hit")

    monkeypatch.setattr(sj, "_transfer_pass", boom)
    got = _rows(
        read_json_splittable(
            spark, str(p), schema, split_bytes=8, manifest_dir=mdir
        ),
        ["a", "b"],
    )
    assert got == want

    p.write_text(body.replace('"x', '"xx'))
    with pytest.raises(Exception, match="transfer pass must not run"):
        read_json_splittable(
            spark, str(p), schema, split_bytes=8, manifest_dir=mdir
        ).collect()
