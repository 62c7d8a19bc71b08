"""Driver-style differential comparison: Spark DataFrame vs DuckDB SQL.

Mirrors the correctness gate: row count, column-name set, and an
order-insensitive comparison of canonicalized values (columns sorted by
name, rows compared as multisets). Floats are compared EXACTLY — the query
plans are responsible for determinism (see plans.registry docstring).
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any


def canon_cell(value: Any) -> Any:
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if value == int(value) and abs(value) < 2**53:
            return ("num", int(value))
        return ("float", repr(value))
    if isinstance(value, bool):
        return ("bool", value)
    if isinstance(value, int):
        return ("num", value)
    if isinstance(value, decimal.Decimal):
        d = value.normalize()
        if d == d.to_integral_value():
            return ("num", int(d))
        return ("dec", str(d))
    if isinstance(value, datetime.datetime):
        return ("ts", value.replace(tzinfo=None).isoformat())
    if isinstance(value, datetime.date):
        return ("date", value.isoformat())
    if isinstance(value, (bytes, bytearray)):
        return ("bytes", bytes(value).hex())
    if isinstance(value, list):
        return ("list", tuple(canon_cell(v) for v in value))
    return value


def _canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon_cell(row[i]) for i in order) for row in rows]
    return sorted(out, key=repr)


#: DuckDB declared result type -> acceptable Spark simpleString dtypes.
#: Spark `timestamp` (LTZ) and `timestamp_ntz` both collect to naive
#: datetimes, matching DuckDB TIMESTAMP; everything else is exact.
_DUCK_TO_SPARK = {
    "BOOLEAN": {"boolean"},
    "TINYINT": {"tinyint"},
    "SMALLINT": {"smallint"},
    "INTEGER": {"int"},
    "BIGINT": {"bigint"},
    "FLOAT": {"float"},
    "DOUBLE": {"double"},
    "VARCHAR": {"string"},
    "DATE": {"date"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp"},
    "BLOB": {"binary"},
}


def duck_expected_spark_types(duck_type: str) -> set[str] | None:
    """Spark dtypes that are hash-equivalent to a DuckDB result type.

    Returns None for types with no safe Spark analogue (HUGEINT & friends
    — pandas/Arrow conversion turns them into float64/object, so a typed
    hasher diverges even when Python ints compare equal).
    """
    t = str(duck_type).strip().upper()
    if t.endswith("[]"):
        inner = duck_expected_spark_types(t[:-2])
        if inner is None:
            return None
        return {f"array<{s}>" for s in inner}
    if t.startswith("DECIMAL"):
        return {t.lower().replace(" ", "")}
    return _DUCK_TO_SPARK.get(t)


def check_types(spark_df, duck_con, oracle_sql: str) -> None:
    """Assert declared-result-type parity between the Spark plan and the
    DuckDB oracle — the class of bug a type-sensitive hasher catches but
    a canonicalizing value comparison does not (HUGEINT-vs-BIGINT,
    decimal-scale skew, varchar-vs-numeric)."""
    rel = duck_con.sql(oracle_sql)
    d_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
    for col, sp_type in spark_df.dtypes:
        d_type = d_types.get(col)
        if d_type is None:
            continue  # column-set mismatch is reported by compare()
        allowed = duck_expected_spark_types(d_type)
        assert allowed is not None, (
            f"type skew on {col!r}: oracle returns {d_type} which has no "
            f"hash-stable Spark analogue — CAST it in the oracle SQL"
        )
        assert sp_type in allowed, (
            f"type skew on {col!r}: spark={sp_type} oracle={d_type} "
            f"(expected one of {sorted(allowed)})"
        )


def compare(spark_df, duck_con, oracle_sql: str) -> None:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    cur = duck_con.execute(oracle_sql)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    check_types(spark_df, duck_con, oracle_sql)
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )

    sc = _canon_rows(s_cols, s_rows)
    dc = _canon_rows(d_cols, d_rows)
    if sc != dc:
        diff_s = [r for r in sc if r not in dc][:5]
        diff_d = [r for r in dc if r not in sc][:5]
        raise AssertionError(
            f"value mismatch ({len(diff_s)}+ rows differ)\n"
            f"spark-only: {diff_s}\nduckdb-only: {diff_d}"
        )
