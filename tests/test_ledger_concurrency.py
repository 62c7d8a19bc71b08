"""Concurrent-writer ledger semantics (SURVEY §7.3.5, round-10 verdict
#5): the load ledger is at-least-once — two writers whose new-file
checks both ran before either commit BOTH load the same files — and
``ledger.reconcile_exactly_once`` restores exactly-once EFFECT as a pure
view. The race is reproduced deterministically through the plan/commit
split of ``pipeline.ingest`` (both plans evaluated against the
pre-commit catalog state), which is exactly the interleaving two real
processes produce.
"""

from __future__ import annotations

from collections import Counter

from amazon_sales_data_engineering_spark.pipeline.config import (
    ensure_namespaces,
    source_table,
)
from amazon_sales_data_engineering_spark.pipeline.ingest import (
    commit_ingest,
    ingest_sales,
    plan_ingest,
)
from amazon_sales_data_engineering_spark.sources.ledger import (
    LEDGER_TABLE,
    reconcile_exactly_once,
)

DATA = "/root/reference/amazon-sales-data"
CC = "in"


def _multiset(df):
    return Counter(tuple(r) for r in df.collect())


def test_raced_ingest_is_at_least_once_and_reconciles(spark):
    ensure_namespaces(spark)
    target = source_table(CC)
    spark.sql(f"DROP TABLE IF EXISTS {target}")
    spark.sql(f"DROP TABLE IF EXISTS {LEDGER_TABLE}")

    # Both writers run their read-check BEFORE either commit: each sees
    # every file as fresh and the same key high-water mark. (With no
    # ledger table yet, filter_new_files passes rows through eagerly —
    # the first-load race; for later batches the check is a lazy
    # anti-join that can self-heal at action time, but nothing orders
    # the two commits, so the class is the same.)
    fresh_a, start_a = plan_ingest(spark, DATA, CC)
    fresh_b, start_b = plan_ingest(spark, DATA, CC)
    assert start_a == start_b == 1

    n_a = commit_ingest(spark, fresh_a, start_a, CC)
    single = _multiset(spark.table(target))  # the serial single-writer state
    n_b = commit_ingest(spark, fresh_b, start_b, CC)
    assert n_a == n_b > 0  # writer B really did double-load (at-least-once)

    raced = spark.table(target)
    assert raced.count() == 2 * sum(single.values())
    # the ledger recorded each file twice — idempotency must still hold
    ledger = spark.table(LEDGER_TABLE).filter(f"target_table = '{target}'")
    per_file = Counter(r.file_path for r in ledger.collect())
    assert per_file and all(c == 2 for c in per_file.values())
    assert ingest_sales(spark, DATA, CC) == 0  # third run loads nothing

    # exactly-once EFFECT: the reconciled view is row-identical to the
    # serial single-writer table, including the surrogate keys (both
    # racers assigned keys densely from the same observed high-water
    # mark, so the min-key copies carry one consistent assignment)
    fixed = reconcile_exactly_once(spark, target)
    assert _multiset(fixed) == single
    # keys stay unique and dense after the repair
    keys = sorted(int(r.sales_order_key) for r in fixed.select("sales_order_key").collect())
    assert keys == list(range(1, len(keys) + 1))

    spark.sql(f"DROP TABLE IF EXISTS {target}")
    spark.sql(f"DROP TABLE IF EXISTS {LEDGER_TABLE}")
