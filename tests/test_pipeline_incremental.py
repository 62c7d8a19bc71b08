"""Incremental pipeline profile: files arriving across runs must converge
to the one-shot result (the reference's re-run instead DUPLICATES —
SURVEY §2.11.8; the engine's high-water-mark mode fixes it).

Comparison is surrogate-key-independent where keys legitimately depend on
batch boundaries (dim pks, fact fks): dims compare on business columns,
the fact compares denormalized through its dims. Curated tables compare
exactly — their keys are dense by (file, row) and batch-invariant.
"""

from __future__ import annotations

import shutil
from collections import Counter
from pathlib import Path

import pytest

from amazon_sales_data_engineering_spark.pipeline.run import run_pipeline

DATA = Path("/root/reference/amazon-sales-data")

PHASE1 = ["date=2020-01-01", "date=2020-01-02"]  # FR's 01-03 file arrives later

ALL_TABLES = [
    "source.in_sales_order", "source.us_sales_order", "source.fr_sales_order",
    "curated.in_sales_order", "curated.us_sales_order", "curated.fr_sales_order",
    "consumption.region_dim", "consumption.product_dim",
    "consumption.promo_code_dim", "consumption.customer_dim",
    "consumption.payment_dim", "consumption.date_dim",
    "consumption.sales_fact",
    "common.exchange_rate", "audit.load_ledger", "audit.fact_load_watermark",
]

DIM_BUSINESS = {
    "consumption.region_dim": ["country", "region", "isactive"],
    "consumption.product_dim": ["mobile_key", "brand", "model", "color", "memory"],
    "consumption.promo_code_dim": ["promotion_code", "country", "region"],
    "consumption.customer_dim": [
        "customer_name", "conctact_no", "shipping_address", "country", "region"
    ],
    "consumption.payment_dim": ["payment_method", "payment_provider", "country", "region"],
    "consumption.date_dim": ["order_dt", "order_year", "order_weekday"],
}

_FACT_DENORM = """
SELECT f.order_code, d.order_dt, c.customer_name, c.conctact_no,
       p.mobile_key, pc.promotion_code, pay.payment_method,
       pay.payment_provider, r.country, r.region,
       f.order_quantity, f.local_total_order_amt, f.us_total_order_amt
FROM consumption.sales_fact f
JOIN consumption.date_dim d ON d.date_id_pk = f.date_id_fk
JOIN consumption.customer_dim c ON c.customer_id_pk = f.customer_id_fk
JOIN consumption.product_dim p ON p.product_id_pk = f.product_id_fk
JOIN consumption.promo_code_dim pc ON pc.promo_code_id_pk = f.promo_code_id_fk
JOIN consumption.payment_dim pay ON pay.payment_id_pk = f.payment_id_fk
JOIN consumption.region_dim r ON r.region_id_pk = f.region_id_fk
"""


def _drop_all(spark):
    for t in ALL_TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _copy_tree(dst: Path, date_dirs: list[str] | None):
    """Copy the reference dataset; ``date_dirs=None`` copies everything,
    else only those sales date partitions (forex always copied)."""
    shutil.copy(DATA / "exchange-rate-data.csv", dst / "exchange-rate-data.csv")
    for src_file in DATA.glob("sales/source=*/format=*/date=*/*"):
        date_dir = src_file.parent.name
        if date_dirs is not None and date_dir not in date_dirs:
            continue
        rel = src_file.relative_to(DATA)
        out = dst / rel
        out.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(src_file, out)


def _multiset(df):
    return Counter(tuple(r) for r in df.collect())


def _snapshot(spark):
    snap = {}
    for cc in ("in", "us", "fr"):
        snap[f"curated_{cc}"] = _multiset(spark.table(f"curated.{cc}_sales_order"))
    for dim, cols in DIM_BUSINESS.items():
        snap[dim] = _multiset(spark.table(dim).select(*cols))
    snap["fact"] = _multiset(spark.sql(_FACT_DENORM))
    return snap


@pytest.fixture()
def clean_catalog(spark):
    _drop_all(spark)
    yield
    _drop_all(spark)


def test_incremental_converges_to_oneshot(spark, tmp_path, clean_catalog):
    # one-shot reference result (corrected profile)
    oneshot_root = tmp_path / "oneshot"
    oneshot_root.mkdir()
    _copy_tree(oneshot_root, None)
    run_pipeline(spark, str(oneshot_root), faithful=False)
    expected = _snapshot(spark)
    assert sum(expected["fact"].values()) > 0
    _drop_all(spark)

    # same data arriving in two phases through the incremental profile
    inc_root = tmp_path / "incremental"
    inc_root.mkdir()
    _copy_tree(inc_root, PHASE1)
    loaded1 = run_pipeline(spark, str(inc_root), faithful=False, incremental=True)
    assert loaded1 == {"in": 2, "us": 2, "fr": 1}
    mid_fact = spark.table("consumption.sales_fact").count()

    _copy_tree(inc_root, None)  # drop in the remaining FR file
    loaded2 = run_pipeline(spark, str(inc_root), faithful=False, incremental=True)
    assert loaded2 == {"in": 0, "us": 0, "fr": 1}
    assert spark.table("consumption.sales_fact").count() > mid_fact

    got = _snapshot(spark)
    for key in expected:
        assert got[key] == expected[key], f"mismatch in {key}"

    # a third run with nothing new must change nothing (idempotence)
    loaded3 = run_pipeline(spark, str(inc_root), faithful=False, incremental=True)
    assert loaded3 == {"in": 0, "us": 0, "fr": 0}
    assert _snapshot(spark) == got
