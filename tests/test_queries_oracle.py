"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 — the same comparison the driver's correctness gate runs at sf0.01.
"""

from __future__ import annotations

import pytest

from amazon_sales_data_engineering_spark.plans import REGISTRY

from .conftest import SF_DIR
from .oracle_util import compare

ALL_NAMES = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    if q.oracle is None:
        df = q.spark_fn(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    oracle = q.oracle.replace("/root/testdata/sf0.01", SF_DIR)
    compare(q.spark_fn(spark, SF_DIR), duck, oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["region_name", "brand", "revenue", "n_items"]


@pytest.mark.parametrize(
    "name", ["decontaminate_ngram_overlap", "dedup_containment"]
)
def test_seeded_probes_nonempty(spark, name):
    # These two carry seeded true positives precisely so a 0=0 hash match
    # can never pass off an always-empty plan as correct.
    assert REGISTRY[name].spark_fn(spark, SF_DIR).count() > 0


def test_split_neardup_safe_nonvacuous(spark):
    # The leakage guarantee must be proven against a counterfactual: the
    # cluster-keyed split leaks exactly 0 clusters while the naive
    # id-keyed split on the SAME corpus measurably leaks (> 0) — so the
    # 0 is a structural guarantee, not an empty-pair-graph accident.
    rows = REGISTRY["split_neardup_safe"].spark_fn(spark, SF_DIR).collect()
    leaks = {r.method: r.leaked_clusters for r in rows}
    assert leaks["cluster_keyed"] == 0
    assert leaks["id_keyed"] > 0


def test_registry_contract():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25
