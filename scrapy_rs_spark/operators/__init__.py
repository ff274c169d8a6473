from scrapy_rs_spark.operators.scheduler import (
    FrontierScheduler,
    apply_enqueue_filters,
    effective_priority_col,
    frontier_order,
    per_host_topk,
    take_batch,
)
from scrapy_rs_spark.operators.dedup import (
    dedup_in_batch,
    anti_join_seen,
)

__all__ = [
    "FrontierScheduler",
    "apply_enqueue_filters",
    "effective_priority_col",
    "frontier_order",
    "per_host_topk",
    "take_batch",
    "dedup_in_batch",
    "anti_join_seen",
]
