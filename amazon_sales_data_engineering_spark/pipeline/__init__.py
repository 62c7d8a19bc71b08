"""The sales ELT pipeline: raw files → source → curated → consumption
(reference steps 2-5 parity, re-expressed Spark-first)."""

from . import config, consumption, curated, ingest, run  # noqa: F401
