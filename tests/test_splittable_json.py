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


def test_rejects_non_array_files(spark, tmp_path):
    p = tmp_path / "lines.json"
    p.write_text('{"a": 1}\n{"a": 2}\n')
    schema = T.StructType([T.StructField("a", T.LongType())])
    with pytest.raises(ValueError, match="top-level-array"):
        read_json_splittable(spark, str(p), schema)


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
