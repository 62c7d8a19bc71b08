"""Curated → consumption star schema (reference step_5 parity).

Builds six dimensions + sales_fact
(/root/reference/step_5_curated_to_consumption.py:51-591; DDL
8. Consumption Layer.sql:9-99). Spark-first deviations, same results:

- the date dim is built distributed (operators.datespine) instead of the
  reference's driver-side pandas (its create_date_dim also crashes as
  written — SURVEY §2.11.4; we implement what it *intends*, with the DDL's
  faithful column names incl. ``oder_month``/``order_quater``).
- groupBy().count() dim uniquification keeps the reference shape (A1); the
  count column is dropped by the final projection exactly as there.
- every dim delta-load is a broadcast left-anti join (J4/J5), with the
  faithful Country-only key for region_dim (§2.11.6).
- the fact assembly is a chain of BROADCAST inner joins (J6): dims are
  orders of magnitude smaller than the fact, so the fact never shuffles.
- surrogate keys: dense row_number+offset for dims (small by construction);
  the fact key is dense by default for parity but ``dense_fact_keys=False``
  switches to fully-parallel unique keys for the 100 TB profile (§7.3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.datespine import date_spine
from ..operators.delta import new_rows
from ..operators.sequences import dense_keys, next_start, unique_keys
from ..operators.setops import union_all, union_distinct
from ..operators.star import star_join
from ..sources.sinks import save_table_if_nonempty
from .config import PROFILES, curated_table

_DIM = "consumption.{}"


def _existing(spark: SparkSession, table: str, cols: list[str]) -> DataFrame | None:
    name = _DIM.format(table)
    if not spark.catalog.tableExists(name):
        return None
    return spark.table(name).select(*cols)


def _delta_then_key(
    spark: SparkSession,
    fresh: DataFrame,
    table: str,
    anti_keys: list[str],
    pk: str,
    order_cols: list[str],
) -> DataFrame:
    """Shared dim tail: left-anti against the existing dim (J4/J5), then
    sequence keys continuing from max(pk)."""
    existing = _existing(spark, table, anti_keys)
    if existing is not None:
        fresh = new_rows(fresh, existing, anti_keys)
    keyed = dense_keys(
        fresh, pk, order_by=[F.col(c) for c in order_cols],
        start=next_start(spark, _DIM.format(table), pk),
    )
    return keyed


def all_sales(spark: SparkSession, faithful: bool = True) -> DataFrame:
    """UNION of the three curated tables — deduplicating in faithful mode
    (Snowpark union semantics, U1) else UNION ALL."""
    dfs = [spark.table(curated_table(cc)) for cc in PROFILES]
    return union_distinct(*dfs) if faithful else union_all(*dfs)


def region_dim_frame(sales: DataFrame) -> DataFrame:
    return (
        sales.groupBy("country", "region")
        .count()
        .withColumn("isactive", F.lit("Y"))
    )


def create_region_dim(spark, sales: DataFrame, faithful: bool = True) -> None:
    dim = region_dim_frame(sales)
    anti = ["country"] if faithful else ["country", "region"]  # §2.11.6
    keyed = _delta_then_key(
        spark, dim, "region_dim", anti, "region_id_pk", ["country", "region"]
    )
    save_table_if_nonempty(
        keyed.select("region_id_pk", "country", "region", "isactive"),
        _DIM.format("region_dim"),
    )


def product_dim_frame(sales: DataFrame) -> DataFrame:
    key = F.split(F.col("mobile_key"), "/")
    return (
        sales.withColumns(
            {
                "brand": key.getItem(0).cast("string"),
                "model": key.getItem(1).cast("string"),
                "color": key.getItem(2).cast("string"),
                "memory": key.getItem(3).cast("string"),  # storage segment dropped
            }
        )
        .groupBy("mobile_key", "brand", "model", "color", "memory")
        .count()
        .withColumn("isactive", F.lit("Y"))
    )


def create_product_dim(spark, sales: DataFrame) -> None:
    dim = product_dim_frame(sales)
    cols = ["mobile_key", "brand", "model", "color", "memory"]
    keyed = _delta_then_key(spark, dim, "product_dim", cols, "product_id_pk", cols)
    save_table_if_nonempty(
        keyed.select("product_id_pk", *cols, "isactive"),
        _DIM.format("product_dim"),
    )


def promocode_dim_frame(sales: DataFrame) -> DataFrame:
    return (
        sales.withColumn(
            "promotion_code", F.coalesce(F.col("promotion_code"), F.lit("NA"))
        )
        .groupBy("promotion_code", "country", "region")
        .count()
        .withColumn("isactive", F.lit("Y"))
    )


def create_promocode_dim(spark, sales: DataFrame) -> None:
    dim = promocode_dim_frame(sales)
    cols = ["promotion_code", "country", "region"]
    keyed = _delta_then_key(spark, dim, "promo_code_dim", cols, "promo_code_id_pk", cols)
    save_table_if_nonempty(
        keyed.select("promo_code_id_pk", *cols, "isactive"),
        _DIM.format("promo_code_dim"),
    )


def customer_dim_frame(sales: DataFrame) -> DataFrame:
    cols = ["customer_name", "conctact_no", "shipping_address", "country", "region"]
    return sales.groupBy(*cols).count().withColumn("isactive", F.lit("Y"))


def create_customer_dim(spark, sales: DataFrame) -> None:
    cols = ["customer_name", "conctact_no", "shipping_address", "country", "region"]
    dim = customer_dim_frame(sales)
    keyed = _delta_then_key(spark, dim, "customer_dim", cols, "customer_id_pk", cols)
    save_table_if_nonempty(
        keyed.select("customer_id_pk", *cols, "isactive"),
        _DIM.format("customer_dim"),
    )


def payment_dim_frame(sales: DataFrame) -> DataFrame:
    cols = ["payment_method", "payment_provider", "country", "region"]
    return sales.groupBy(*cols).count().withColumn("isactive", F.lit("Y"))


def create_payment_dim(spark, sales: DataFrame) -> None:
    cols = ["payment_method", "payment_provider", "country", "region"]
    dim = payment_dim_frame(sales)
    keyed = _delta_then_key(spark, dim, "payment_dim", cols, "payment_id_pk", cols)
    save_table_if_nonempty(
        keyed.select("payment_id_pk", *cols, "isactive"),
        _DIM.format("payment_dim"),
    )


def create_date_dim(spark, sales: DataFrame) -> None:
    """Distributed date dim with the DDL's faithful names (typos included:
    oder_month, order_quater — 8. Consumption Layer.sql:69-70). DayOfWeek
    follows the reference's pandas semantics: Monday=0, Weekend={5,6}."""
    spine = date_spine(sales, "order_dt")
    dim = spine.select(
        F.col("order_dt"),
        F.col("order_year"),
        F.col("day_counter"),
        F.col("order_month").alias("oder_month"),  # sic
        F.col("order_quarter").alias("order_quater"),  # sic
        F.col("order_day"),
        (F.col("order_isodow") - F.lit(1)).cast("int").alias("order_dayofweek"),
        F.col("order_dayname"),
        F.col("order_day").alias("order_dayofmonth"),
        F.col("order_daytype").alias("order_weekday"),
    )
    keyed = _delta_then_key(
        spark, dim, "date_dim", ["order_dt"], "date_id_pk", ["order_dt"]
    )
    save_table_if_nonempty(
        keyed.select(
            "date_id_pk", "order_dt", "order_year", "day_counter", "oder_month",
            "order_quater", "order_day", "order_dayofweek", "order_dayname",
            "order_dayofmonth", "order_weekday",
        ),
        _DIM.format("date_dim"),
    )


def build_dims(spark, sales: DataFrame, faithful: bool = True) -> None:
    """step_5 dim phase. The reference calls create_date_dim twice
    (§2.11.5) — the second call is a no-op under the delta load, so one
    call is result-identical."""
    create_date_dim(spark, sales)
    create_region_dim(spark, sales, faithful)
    create_product_dim(spark, sales)
    create_promocode_dim(spark, sales)
    create_customer_dim(spark, sales)
    create_payment_dim(spark, sales)


_WM_TABLE = "audit.fact_load_watermark"


def _apply_fact_watermark(spark, sales: DataFrame) -> DataFrame:
    """Incremental fact loads: keep only curated rows above each country's
    recorded (country, max sales_order_key) watermark. Uses the reference's
    declared-but-unused ``audit`` schema (SURVEY §2.10 D3)."""
    if not spark.catalog.tableExists(_WM_TABLE):
        return sales
    wm = spark.table(_WM_TABLE)
    return (
        sales.join(F.broadcast(wm), "country", "left")
        .filter(
            F.col("max_key").isNull()
            | (F.col("sales_order_key") > F.col("max_key"))
        )
        .drop("max_key")
    )


def _record_fact_watermark(spark, processed: DataFrame) -> None:
    batch = processed.groupBy("country").agg(
        F.max("sales_order_key").alias("max_key")
    )
    if spark.catalog.tableExists(_WM_TABLE):
        merged = (
            spark.table(_WM_TABLE)
            .unionByName(batch)
            .groupBy("country")
            .agg(F.max("max_key").alias("max_key"))
        )
    else:
        merged = batch
    # materialize before overwriting the table the plan reads from
    rows = merged.collect()
    spark.createDataFrame(rows, merged.schema).write.mode("overwrite").saveAsTable(
        _WM_TABLE
    )


def build_fact(spark, sales: DataFrame, dense_fact_keys: bool = True) -> None:
    """Star-join fact assembly (J6) + fact sequence key."""
    dims = [
        (spark.table(_DIM.format("date_dim")).select("date_id_pk", "order_dt"), ["order_dt"]),
        (
            spark.table(_DIM.format("customer_dim")).select(
                "customer_id_pk", "customer_name", "country", "region"
            ),
            ["customer_name", "region", "country"],
        ),
        (
            spark.table(_DIM.format("payment_dim")).select(
                "payment_id_pk", "payment_method", "payment_provider", "country", "region"
            ),
            ["payment_method", "payment_provider", "country", "region"],
        ),
        (
            spark.table(_DIM.format("product_dim")).select("product_id_pk", "mobile_key"),
            ["mobile_key"],
        ),
        (
            spark.table(_DIM.format("promo_code_dim")).select(
                "promo_code_id_pk", "promotion_code", "country", "region"
            ),
            ["promotion_code", "country", "region"],
        ),
        (
            spark.table(_DIM.format("region_dim")).select("region_id_pk", "country", "region"),
            ["country", "region"],
        ),
    ]
    enriched = star_join(
        sales.withColumn(
            "promotion_code", F.coalesce(F.col("promotion_code"), F.lit("NA"))
        ),
        dims,
        how="inner",
    )
    if dense_fact_keys:
        keyed = dense_keys(
            enriched,
            "order_id_pk",
            order_by=[F.col("country"), F.col("sales_order_key")],
            start=next_start(spark, _DIM.format("sales_fact"), "order_id_pk"),
        )
    else:
        keyed = unique_keys(
            enriched,
            "order_id_pk",
            start=next_start(spark, _DIM.format("sales_fact"), "order_id_pk"),
        )
    fact = keyed.select(
        "order_id_pk",
        F.col("order_id").alias("order_code"),
        F.col("date_id_pk").alias("date_id_fk"),
        F.col("region_id_pk").alias("region_id_fk"),
        F.col("customer_id_pk").alias("customer_id_fk"),
        F.col("payment_id_pk").alias("payment_id_fk"),
        F.col("product_id_pk").alias("product_id_fk"),
        F.col("promo_code_id_pk").alias("promo_code_id_fk"),
        "order_quantity",
        "local_total_order_amt",
        "local_tax_amt",
        "exhchange_rate",
        "us_total_order_amt",
        "usd_tax_amt",
    )
    save_table_if_nonempty(fact, _DIM.format("sales_fact"))


def run_consumption(
    spark: SparkSession,
    faithful: bool = True,
    dense_fact_keys: bool = True,
    incremental: bool = False,
) -> None:
    """step_5 main(): dims then fact. Dims are always incremental (delta
    loads); ``incremental=True`` additionally guards the fact append with
    the audit watermark so re-processing curated rows can't duplicate
    fact rows."""
    sales = all_sales(spark, faithful)
    build_dims(spark, sales, faithful)
    if incremental:
        fresh = _apply_fact_watermark(spark, sales)
        build_fact(spark, fresh, dense_fact_keys)
        _record_fact_watermark(spark, fresh)
    else:
        build_fact(spark, sales, dense_fact_keys)
