from .compaction import (
    ACTION_FOLD_SENTINEL,
    compact,
    filter_events,
    filter_tables,
    latency_flag,
    reject_null_keys,
    with_rid,
)

__all__ = [
    "ACTION_FOLD_SENTINEL",
    "compact",
    "filter_events",
    "filter_tables",
    "latency_flag",
    "reject_null_keys",
    "with_rid",
]
