"""Structured Streaming analogues of the batch operators.

The reference has no streaming (SURVEY.md §2.11) — this module covers the
streaming surface a training-data/analytics pipeline needs: windowed
aggregation with watermarked late-data handling, gap-based sessionization,
and a custom stateful operator via applyInPandasWithState.
"""

from .events import (  # noqa: F401
    read_events_stream, running_user_counts, session_counts, windowed_counts,
)
