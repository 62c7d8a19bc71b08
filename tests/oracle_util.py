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


#: Column types eligible for the vectorized fast path. Restricted to
#: types whose DuckDB equality is bit-exactly the same relation as
#: canon_cell equality WITHIN one column (check_types has already pinned
#: the two sides to the same logical type, so canon_cell's cross-type
#: equivalences — int vs whole float — can never apply):
#: integrals/strings/dates/booleans/decimals compare exactly; floats are
#: normalized with ``+ 0.0`` (collapses -0.0 to 0.0, exactly canon's
#: ("num", 0)) and DuckDB's total order already treats every NaN as
#: equal (canon's "NaN" sentinel). Timestamps (tz plumbing), binary,
#: and nested types stay on the exact Python path.
_FAST_EXACT = {"tinyint", "smallint", "int", "bigint", "string", "date",
               "boolean"}
def _fast_select(spark_df) -> str | None:
    """The canonicalizing SELECT list for the fast path (columns sorted
    by name, floats normalized), or None when any column type is outside
    the provably-equivalent set."""
    dtypes = dict(spark_df.dtypes)
    exprs = []
    for c in sorted(spark_df.columns):
        t = dtypes[c]
        if t in _FAST_EXACT or t.startswith("decimal"):
            exprs.append(f'"{c}"')
        elif t in ("float", "double"):
            exprs.append(f'("{c}" + 0.0) AS "{c}"')
        else:
            return None
    return ", ".join(exprs)


def _fast_multiset_equal(duck_con, s_tbl, d_tbl, sel: str) -> bool:
    """Vectorized order-insensitive multiset compare of two Arrow tables
    via symmetric EXCEPT ALL inside DuckDB (C++ hash tables instead of
    per-cell Python)."""
    duck_con.register("__cmp_spark", s_tbl)
    duck_con.register("__cmp_duck", d_tbl)
    try:
        n = duck_con.sql(
            f"SELECT count(*) FROM ("
            f"  (SELECT {sel} FROM __cmp_spark"
            f"   EXCEPT ALL SELECT {sel} FROM __cmp_duck)"
            f"  UNION ALL"
            f"  (SELECT {sel} FROM __cmp_duck"
            f"   EXCEPT ALL SELECT {sel} FROM __cmp_spark))"
        ).fetchone()[0]
    finally:
        duck_con.unregister("__cmp_spark")
        duck_con.unregister("__cmp_duck")
    return n == 0


def _rows_from_arrow(tbl, cols: list[str]) -> list[tuple]:
    data = {c: tbl.column(c).to_pylist() for c in tbl.column_names}
    return list(zip(*[data[c] for c in cols]))


def compare(spark_df, duck_con, oracle_sql: str) -> None:
    s_cols = list(spark_df.columns)
    d_rel = duck_con.sql(oracle_sql)
    d_cols = list(d_rel.columns)

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    check_types(spark_df, duck_con, oracle_sql)

    # Simple-typed results go through the vectorized path: ONE Spark
    # execution (Arrow transfer), ONE oracle execution (Arrow), multiset
    # equality inside DuckDB. The exact Python path canonicalizes per
    # cell and dominated the sf1 sweep's wall for 6M-row projections
    # (~150s where the oracle itself costs ~12s). A fast-path mismatch
    # falls through to the authoritative exact comparison — built from
    # the SAME Arrow tables, no re-execution — for diagnostics.
    sel = _fast_select(spark_df)
    if sel is not None:
        try:
            s_tbl = spark_df.toArrow()
        except Exception:
            s_tbl = None
        if s_tbl is not None:
            d_tbl = d_rel.arrow()
            assert s_tbl.num_rows == d_tbl.num_rows, (
                f"row count mismatch: spark={s_tbl.num_rows} "
                f"duckdb={d_tbl.num_rows}"
            )
            if _fast_multiset_equal(duck_con, s_tbl, d_tbl, sel):
                return
            s_rows = _rows_from_arrow(s_tbl, s_cols)
            d_rows = _rows_from_arrow(d_tbl, d_cols)
        else:
            s_rows = [tuple(r) for r in spark_df.collect()]
            d_rows = duck_con.execute(oracle_sql).fetchall()
    else:
        s_rows = [tuple(r) for r in spark_df.collect()]
        d_rows = duck_con.execute(oracle_sql).fetchall()

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
