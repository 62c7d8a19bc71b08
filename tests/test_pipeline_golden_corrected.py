"""Golden end-to-end test for the CORRECTED pipeline profile (round-4
verdict stretch item): one-shot ``run_pipeline(faithful=False)`` over the
reference's own sample data, every layer's expected numbers computed
INDEPENDENTLY by DuckDB from the raw files.

The corrected profile fixes the reference's observable quirks
(SURVEY §2.11 / pipeline/config.py): LEFT forex join instead of
full-outer, row_number dedup per order instead of tie-keeping rank,
UNION ALL consumption instead of deduplicating union, and — the
numerically visible one — the `$4` forex-column bug fixed, so INR/EUR
conversions use the RIGHT rate (the faithful profile divides by the CAD
rate for usd2uk/usd2inr/usd2jp, replaying
/root/reference/Snowflake Worksheets/5. Forex Exchange Rate.sql:23-25).
"""

from __future__ import annotations

from decimal import Decimal

import duckdb
import pytest

from amazon_sales_data_engineering_spark.pipeline.run import run_pipeline

from .test_pipeline_incremental import ALL_TABLES

DATA = "/root/reference/amazon-sales-data"

_RAW_SQL = {
    "in": f"SELECT * FROM read_csv('{DATA}/sales/source=IN/format=csv/date=*/*.csv', header=true, all_varchar=true)",
    "us": f"SELECT * FROM read_parquet('{DATA}/sales/source=US/format=parquet/date=*/*.parquet')",
    "fr": f"SELECT * FROM read_json('{DATA}/sales/source=FR/format=json/date=*/*.json', format='array')",
}
_META = {  # country, region, CORRECT forex column (the $4 fix under test)
    "in": ("IN", "APAC", "usd2inr"),
    "us": ("US", "AMER", "usd2usd"),
    "fr": ("FR", "EU", "usd2eu"),
}


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW forex AS SELECT CAST(date AS DATE) AS fx_date, * "
        f"FROM read_csv('{DATA}/exchange-rate-data.csv', header=true)"
    )
    for cc, sql in _RAW_SQL.items():
        country, region, fxcol = _META[cc]
        con.execute(f"CREATE VIEW raw_{cc} AS {sql}")
        con.execute(
            f"""
            CREATE VIEW cur_{cc} AS
            SELECT s.*, '{country}' AS country, '{region}' AS region,
                   CAST(f.{fxcol} AS DECIMAL(10,7)) AS fx_rate
            FROM raw_{cc} s
            LEFT JOIN forex f ON CAST(s."Order Date" AS DATE) = f.fx_date
            WHERE s."Payment Status" = 'Paid' AND s."Shipping Status" = 'Delivered'
            """
        )
    con.execute(
        "CREATE VIEW cur_all AS "
        + " UNION ALL ".join(
            f"SELECT \"Customer Name\" AS customer_name, "
            f"\"Mobile Model\" AS mobile_key, "
            f"\"Promotion Code\" AS promotion_code, "
            f"\"Payment Method\" AS payment_method, "
            f"\"Payment Provider\" AS payment_provider, "
            f"CAST(\"Order Date\" AS DATE) AS order_dt, "
            f"country, region FROM cur_{cc}"
            for cc in _RAW_SQL
        )
    )
    yield con
    con.close()


def _drop_all(spark):
    for t in ALL_TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.fixture(scope="module")
def pipeline(spark):
    # fresh catalog: the faithful golden module (and anything else) may
    # have left pipeline tables + the load ledger behind
    _drop_all(spark)
    loaded = run_pipeline(spark, DATA, faithful=False)
    yield loaded
    _drop_all(spark)


def test_corrected_layer_counts(spark, pipeline, oracle):
    assert pipeline == {"in": 2, "us": 2, "fr": 2}
    for cc in ("in", "us", "fr"):
        # LEFT forex join preserves exactly the filtered rows (no
        # forex-date row inflation to clean up), and the corrected
        # row_number dedup keeps one row per order id.
        expected = oracle.execute(
            f'SELECT count(DISTINCT "Order ID") FROM cur_{cc}'
        ).fetchone()[0]
        got = spark.table(f"curated.{cc}_sales_order").count()
        assert got == expected, (cc, got, expected)


def test_corrected_forex_columns_are_right(spark, pipeline, oracle):
    """The $4-bug fix, value-level: every curated (order_dt,
    exhchange_rate) pair must equal the CORRECT forex column for that
    date — exact decimal compare, no tolerance. Under the faithful bug
    IN/FR would carry the CAD rate instead."""
    for cc in ("in", "fr", "us"):
        fxcol = _META[cc][2]
        want = {
            (r[0], Decimal(r[1]))
            for r in oracle.execute(
                f"SELECT DISTINCT CAST(\"Order Date\" AS DATE), "
                f"CAST(fx_rate AS VARCHAR) FROM cur_{cc}"
            ).fetchall()
        }
        got = {
            (r["order_dt"], Decimal(r["exhchange_rate"]))
            for r in spark.table(f"curated.{cc}_sales_order")
            .select("order_dt", "exhchange_rate")
            .distinct()
            .collect()
        }
        assert got == want, (cc, sorted(got)[:3], sorted(want)[:3])
        # and it is genuinely the $4 fix: the correct column differs
        # from the buggy CAD source on this data for IN and FR
        if fxcol != "usd2usd":
            buggy = {
                (r[0], Decimal(r[1]))
                for r in oracle.execute(
                    f"SELECT DISTINCT fx_date, "
                    f"CAST(CAST(usd2can AS DECIMAL(10,7)) AS VARCHAR) "
                    f"FROM forex WHERE fx_date IN "
                    f"(SELECT CAST(\"Order Date\" AS DATE) FROM cur_{cc})"
                ).fetchall()
            }
            assert got != buggy, (cc, "corrected profile still on $4/CAD")


def test_corrected_usd_amounts(spark, pipeline, oracle):
    """us_total_order_amt uses the corrected rate: per-country sums match
    an independent DuckDB final/rate computation (1e-2 absolute tolerance
    absorbs decimal-division rounding differences between engines)."""
    from pyspark.sql import functions as F

    amount_col = {"in": '"Order Amount"', "us": '"Order Amount"', "fr": '"Order Amount"'}
    for cc in ("in", "us", "fr"):
        want = oracle.execute(
            f"SELECT SUM(CAST({amount_col[cc]} AS DOUBLE) / CAST(fx_rate AS DOUBLE)) "
            f"FROM cur_{cc}"
        ).fetchone()[0]
        got = (
            spark.table(f"curated.{cc}_sales_order")
            .agg(F.sum(F.col("us_total_order_amt").cast("double")))
            .first()[0]
        )
        assert got == pytest.approx(want, abs=1e-2), (cc, got, want)


def test_corrected_fact_is_union_all(spark, pipeline, oracle):
    """Corrected consumption unions WITHOUT dedup: fact rows = every
    curated row fanned out by its (name, country, region) customer-dim
    multiplicity — computed independently from the raw files."""
    expected_fact = oracle.execute(
        """
        WITH cust AS (
          SELECT customer_name, country, region, count(*) AS n
          FROM (SELECT DISTINCT "Customer Name" AS customer_name, c2 AS contact,
                       "Delivery Address" AS addr, country, region
                FROM (SELECT *, COALESCE("Mobile", "Phone") AS c2 FROM (
                      SELECT *, NULL AS "Phone" FROM cur_in
                      UNION ALL BY NAME SELECT *, NULL AS "Mobile" FROM cur_us
                      UNION ALL BY NAME SELECT *, NULL AS "Mobile" FROM cur_fr)))
          GROUP BY 1, 2, 3
        )
        SELECT sum(n) FROM cur_all JOIN cust USING (customer_name, country, region)
        """
    ).fetchone()[0]
    assert spark.table("consumption.sales_fact").count() == expected_fact


def test_corrected_dims(spark, pipeline, oracle):
    q = lambda s: oracle.execute(s).fetchone()[0]  # noqa: E731
    assert spark.table("consumption.region_dim").count() == 3
    assert spark.table("consumption.product_dim").count() == q(
        "SELECT count(DISTINCT mobile_key) FROM cur_all"
    )
    assert spark.table("consumption.date_dim").count() == q(
        "SELECT date_diff('day', min(order_dt), max(order_dt)) + 1 FROM cur_all"
    )
