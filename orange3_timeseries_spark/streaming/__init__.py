"""Structured Streaming variants of the window operators (SURVEY §2.9).

The reference is batch-only; its closest streaming artifact is Time
Slice's timed playback over a sliding interval
(``widgets/owtimeslice.py:343-378``).  These are the natural continuous
analogs, built on the same aggregation registry the batch operators use:

- tumbling / sliding event-time windows  ≈  time-period blocks / moving
  transform (``F.window`` + watermark);
- stateful per-series difference  ≈  the lag family, with
  ``applyInPandasWithState`` carrying the last ``k`` values per series
  across micro-batches.
"""

from orange3_timeseries_spark.streaming.ops import (
    run_to_memory,
    stream_enrich,
    run_to_memory_isolated,
    stream_difference,
    stream_exact_dedup,
    stream_asof_join,
    stream_interval_join,
    stream_time_slice,
    stream_window_aggregation,
)

__all__ = [
    "stream_window_aggregation",
    "stream_exact_dedup",
    "stream_difference",
    "stream_asof_join",
    "stream_interval_join",
    "stream_time_slice",
    "run_to_memory",
    "stream_enrich",
    "run_to_memory_isolated",
]
