"""Incremental (delta) load detection — left-anti joins.

The reference detects new dimension rows with left-anti joins before every
dim append (SURVEY.md §2.3 J4/J5):
- region: ``Country`` only (a quirk — Region ignored;
  /root/reference/step_5_curated_to_consumption.py:107-111),
- product/promo/customer/payment/date: USING-style column lists
  (/root/reference/step_5_curated_to_consumption.py:169-173, 232-236,
  297-301, 356-360, 435-439).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def new_rows(incoming: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``incoming`` whose ``keys`` don't appear in ``existing``.
    ``existing`` is projected to the key columns so Spark can broadcast it
    when it is dim-sized (the common case for delta loads)."""
    probe = existing.select(*keys).dropDuplicates(keys)
    return incoming.join(F.broadcast(probe), keys, "left_anti")
