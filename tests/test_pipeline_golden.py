"""Golden end-to-end test: the full sales pipeline over the reference's own
sample data (/root/reference/amazon-sales-data — read-only input), with
every layer's expected numbers computed INDEPENDENTLY by DuckDB from the
raw files (SURVEY.md §5.2).
"""

from __future__ import annotations

import duckdb
import pytest

from amazon_sales_data_engineering_spark.pipeline.run import run_pipeline

DATA = "/root/reference/amazon-sales-data"

_RAW_SQL = {
    "in": f"SELECT * FROM read_csv('{DATA}/sales/source=IN/format=csv/date=*/*.csv', header=true, all_varchar=true)",
    "us": f"SELECT * FROM read_parquet('{DATA}/sales/source=US/format=parquet/date=*/*.parquet')",
    "fr": f"SELECT * FROM read_json('{DATA}/sales/source=FR/format=json/date=*/*.json', format='array')",
}
_META = {
    "in": ("IN", "APAC"),
    "us": ("US", "AMER"),
    "fr": ("FR", "EU"),
}


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for cc, sql in _RAW_SQL.items():
        country, region = _META[cc]
        con.execute(f"CREATE VIEW raw_{cc} AS {sql}")
        con.execute(
            f"""
            CREATE VIEW cur_{cc} AS
            SELECT *, '{country}' AS country, '{region}' AS region
            FROM raw_{cc}
            WHERE "Payment Status" = 'Paid' AND "Shipping Status" = 'Delivered'
            """
        )
    con.execute(
        "CREATE VIEW cur_all AS "
        + " UNION ALL ".join(f"SELECT \"Customer Name\" AS customer_name, "
                             f"\"Mobile Model\" AS mobile_key, "
                             f"\"Promotion Code\" AS promotion_code, "
                             f"\"Payment Method\" AS payment_method, "
                             f"\"Payment Provider\" AS payment_provider, "
                             f"CAST(\"Order Date\" AS DATE) AS order_dt, "
                             f"country, region FROM cur_{cc}" for cc in _RAW_SQL)
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def pipeline(spark):
    loaded = run_pipeline(spark, DATA, faithful=True)
    return loaded


def test_source_counts(spark, pipeline, oracle):
    assert pipeline == {"in": 2, "us": 2, "fr": 2}  # two date partitions each
    for cc in ("in", "us", "fr"):
        expected = oracle.execute(f"SELECT count(*) FROM raw_{cc}").fetchone()[0]
        got = spark.table(f"source.{cc}_sales_order").count()
        assert got == expected, (cc, got, expected)
    # the documented fixture sizes (SURVEY §1.4)
    assert spark.table("source.in_sales_order").count() == 1931
    assert spark.table("source.us_sales_order").count() == 1864
    assert spark.table("source.fr_sales_order").count() == 1517


def test_curated_counts(spark, pipeline, oracle):
    for cc in ("in", "us", "fr"):
        expected = oracle.execute(f"SELECT count(*) FROM cur_{cc}").fetchone()[0]
        got = spark.table(f"curated.{cc}_sales_order").count()
        assert got == expected, (cc, got, expected)


def test_dim_counts(spark, pipeline, oracle):
    q = lambda s: oracle.execute(s).fetchone()[0]
    assert spark.table("consumption.region_dim").count() == 3
    assert spark.table("consumption.product_dim").count() == q(
        "SELECT count(DISTINCT mobile_key) FROM cur_all"
    )
    assert spark.table("consumption.promo_code_dim").count() == q(
        "SELECT count(*) FROM (SELECT DISTINCT COALESCE(promotion_code,'NA'), country, region FROM cur_all)"
    )
    assert spark.table("consumption.payment_dim").count() == q(
        "SELECT count(*) FROM (SELECT DISTINCT payment_method, payment_provider, country, region FROM cur_all)"
    )
    assert spark.table("consumption.date_dim").count() == q(
        "SELECT date_diff('day', min(order_dt), max(order_dt)) + 1 FROM cur_all"
    )


def test_fact_count_and_fk_closure(spark, pipeline, oracle):
    # Customer-dim join key is (name, region, country) — same-name customers
    # fan out, exactly as in the reference (join lists at
    # /root/reference/step_5_curated_to_consumption.py:548-550).
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
    fact = spark.table("consumption.sales_fact")
    assert fact.count() == expected_fact

    # FK closure: every fk resolves in its dim.
    checks = [
        ("date_id_fk", "consumption.date_dim", "date_id_pk"),
        ("region_id_fk", "consumption.region_dim", "region_id_pk"),
        ("customer_id_fk", "consumption.customer_dim", "customer_id_pk"),
        ("payment_id_fk", "consumption.payment_dim", "payment_id_pk"),
        ("product_id_fk", "consumption.product_dim", "product_id_pk"),
        ("promo_code_id_fk", "consumption.promo_code_dim", "promo_code_id_pk"),
    ]
    for fk, dim, pk in checks:
        orphans = (
            fact.select(fact[fk].alias(pk))
            .join(spark.table(dim).select(pk), pk, "left_anti")
            .count()
        )
        assert orphans == 0, (fk, orphans)


def test_rerun_is_idempotent(spark, pipeline):
    before = {
        t: spark.table(t).count()
        for t in (
            "source.in_sales_order",
            "curated.in_sales_order",
            "consumption.sales_fact",
            "consumption.customer_dim",
        )
    }
    loaded = run_pipeline(spark, DATA, faithful=True)
    assert loaded == {"in": 0, "us": 0, "fr": 0}  # ledger: nothing new
    after = {t: spark.table(t).count() for t in before}
    assert after == before


def test_surrogate_keys_dense_and_unique(spark, pipeline):
    from pyspark.sql import functions as F

    for table, pk in [
        ("consumption.customer_dim", "customer_id_pk"),
        ("consumption.sales_fact", "order_id_pk"),
    ]:
        df = spark.table(table)
        n = df.count()
        stats = df.agg(
            F.countDistinct(pk).alias("d"), F.min(pk).alias("mn"), F.max(pk).alias("mx")
        ).first()
        assert stats["d"] == n  # unique
        assert (stats["mn"], stats["mx"]) == (1, n)  # dense from 1
