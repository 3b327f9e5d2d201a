"""Structured Streaming surface.

The reference has no streaming at all (SURVEY.md §2.9) and the north rule is a
batch job, so nothing here sits on the filter pipeline's critical path. This
subpackage exists for the two streaming shapes a production ingest of the same
tables actually needs:

  * `stream_filter` — incremental micro-batch ingest of newly-landed image
    files through the SAME scoring/decision/scrub logic as the batch job, with
    exactly-once file tracking from the Structured Streaming checkpoint.
  * `windows` — event-time windowed quality metrics with a watermark for late
    data; one plan that runs identically over a batch or a streaming frame.
  * `stateful` — cross-batch running per-group quality counters via keyed
    state (`applyInPandasWithState`), the incremental metric shape neither a
    window nor a per-batch observe can express.
"""

from data_quality_check_spark.streaming.stateful import running_group_metrics
from data_quality_check_spark.streaming.stream_filter import (
    read_image_stream,
    run_stream_filter,
)
from data_quality_check_spark.streaming.windows import windowed_quality_metrics

__all__ = [
    "read_image_stream",
    "run_stream_filter",
    "running_group_metrics",
    "windowed_quality_metrics",
]
