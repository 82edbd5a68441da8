"""Structured Streaming analogues of the batch operators.

The reference has no streaming (SURVEY.md §2.11) — this module covers the
streaming surface a training-data/analytics pipeline needs: windowed
aggregation with watermarked late-data handling, gap-based sessionization,
custom stateful operators via applyInPandasWithState, continuous index
ingestion with exact compaction (ingest), and online exact dedup with
first-occurrence-wins semantics (dedup).
"""

from .events import (  # noqa: F401
    read_events_stream, running_user_counts, session_counts, windowed_counts,
)
from .dedup import (  # noqa: F401
    dedup_docs_stream, dedup_stats_stream, with_content_sha,
)
