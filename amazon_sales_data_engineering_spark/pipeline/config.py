"""Pipeline configuration: namespaces, country profiles, semantic profiles.

Country details mirror /root/reference/step_4_source_to_curated.py:81-85
(table, currency, country, region, forex column) plus the per-country file
format and header quirks (FIXTURES.md §1): IN csv has ``GST``/``Mobile``
where US/FR have ``Tax``/``Phone``.

Two semantic profiles (SURVEY.md §7.1):
- ``faithful`` (default) replicates the reference's observable quirks:
  deduplicating UNION, rank-ties dedup, full-outer forex join, Country-only
  region delta, the $4 forex-column bug, and the typo'd persistent column
  names (exhchange_rate, conctact_no, order_valaue, _metadata_row_numer,
  oder_month, order_quater — SURVEY §2.11.7).
- ``corrected`` fixes them: left forex join, row_number dedup, proper forex
  columns, UNION ALL.
"""

from __future__ import annotations

from dataclasses import dataclass

NAMESPACES = ("source", "curated", "consumption", "common", "audit")


@dataclass(frozen=True)
class CountryProfile:
    code: str  # "in" | "us" | "fr"
    fmt: str  # csv | parquet | json
    country: str  # IN | US | FR
    region: str  # APAC | AMER | EU
    currency: str  # INR | USD | EUR
    forex_col: str  # usd2inr | usd2usd | usd2eu
    tax_field: str  # GST (IN csv) | Tax
    contact_field: str  # Mobile (IN) | Phone
    contact_col: str  # source-table column name: mobile | phone


PROFILES: dict[str, CountryProfile] = {
    "in": CountryProfile("in", "csv", "IN", "APAC", "INR", "usd2inr", "GST", "Mobile", "mobile"),
    "us": CountryProfile("us", "parquet", "US", "AMER", "USD", "usd2usd", "Tax", "Phone", "phone"),
    "fr": CountryProfile("fr", "json", "FR", "EU", "EUR", "usd2eu", "Tax", "Phone", "phone"),
}


def source_table(cc: str) -> str:
    return f"source.{cc}_sales_order"


def curated_table(cc: str) -> str:
    return f"curated.{cc}_sales_order"


def ensure_namespaces(spark) -> None:
    """D3 parity: the five reference schemas as Spark databases."""
    for ns in NAMESPACES:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {ns}")
