from .compact_stream import (
    compact_stream,
    finalize_stream_output,
    run_compaction_pipeline_dual_sink,
    run_compaction_stream,
)

__all__ = [
    "compact_stream",
    "finalize_stream_output",
    "run_compaction_pipeline_dual_sink",
    "run_compaction_stream",
]
