"""Streaming exact deduplication: first-occurrence-wins across
micro-batches.

The batch dedup family (textops.dedup_exact / dedup_clusters) assumes the
corpus is at rest; a 100 TB ingest pipeline also needs the ONLINE form —
suppress a document the moment it arrives if its content was already seen.
Two shapes, both keyed by the content hash so state is O(distinct
documents), never O(occurrences):

- :func:`dedup_docs_stream` — the built-in stateful operator
  (``dropDuplicates`` on the hash): emits each distinct content exactly
  once, in arrival order. Dedup state must live forever for exactness, so
  no watermark is applied here; a bounded-freshness deployment (dups only
  arrive within N days) uses ``dropDuplicatesWithinWatermark`` on an
  ingest-time column to expire state.
- :func:`dedup_stats_stream` — the custom-state twin
  (``applyInPandasWithState``): per content hash keeps (first_doc_id,
  n_seen) and emits the updated row every micro-batch the key appears in,
  the running signal a dedup monitor dashboards. ``first_doc_id`` is the
  min doc_id within the key's FIRST micro-batch (deterministic given
  batch boundaries), then frozen.

At scale both shapes shuffle once on the hash key per micro-batch and
store one state row per distinct content — the streaming analogue of
dedup_exact's hash groupBy.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def with_content_sha(docs: DataFrame) -> DataFrame:
    """Add the dedup key: sha2-256 of the exact text (same content
    contract as sources/corpus.py's sha invariant)."""
    return docs.withColumn(
        "content_sha", F.sha2(F.coalesce(F.col("text"), F.lit("")), 256))


def dedup_docs_stream(docs: DataFrame) -> DataFrame:
    """First occurrence of each distinct content passes; later copies are
    suppressed. Works identically on a batch frame (dropDuplicates is the
    same logical op either way)."""
    return with_content_sha(docs).dropDuplicates(["content_sha"])


def dedup_stats_stream(docs: DataFrame) -> DataFrame:
    """(content_sha, first_doc_id, n_seen): running occurrence counts per
    distinct content across micro-batches."""

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (sha,) = key
        is_new = not state.exists
        first_doc, n = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            # a large group arrives as MULTIPLE Arrow chunks: the first
            # batch's min must be taken across all of them, not frozen at
            # the first chunk (chunk order is partition-layout-dependent)
            if is_new:
                m = int(pdf["doc_id"].min())
                first_doc = m if first_doc is None else min(first_doc, m)
        state.update((first_doc, n))
        yield pd.DataFrame({"content_sha": [sha],
                            "first_doc_id": [first_doc],
                            "n_seen": [n]})

    return (with_content_sha(docs)
            .groupBy("content_sha")
            .applyInPandasWithState(
                update,
                outputStructType=("content_sha string, first_doc_id long,"
                                  " n_seen long"),
                stateStructType="first_doc long, n long",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
