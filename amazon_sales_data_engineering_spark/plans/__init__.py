"""Query plans: the engine's public query surface.

Importing this package populates the registry with every implemented
operator/query (one module per theme). ``registry.REGISTRY`` is the single
source of truth consumed by ``__spark_entry__`` and ``bench.py``.
"""

from . import (  # noqa: F401  (import for registration side effects)
    analytics_ops,
    corpus_ops,
    decontam_ops,
    dedup_ops,
    events_ops,
    layout_ops,
    merge_ops,
    multimodal_ops,
    packing_ops,
    parity,
    pipeline_ops,
    pretrain_ops,
    quality_ops,
    reshape_ops,
    rules_ops,
    scalar_ops,
    similarity_ops,
    stats_ops,
    streaming_ops,
    subquery_ops,
    temporal_ops,
    text_ops,
    tpch_more,
    warehouse_ops,
    window_ops,
)
from .registry import REGISTRY, Query

__all__ = ["REGISTRY", "Query"]
