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


DEFAULT_STREAM_BUCKET_CAP = 256  # = textops.SCALE_LSH_MAX_BUCKET


def lsh_pairs_stream(docs: DataFrame,
                     max_bucket_size: int = DEFAULT_STREAM_BUCKET_CAP,
                     ttl_ms: int | None = None,
                     time_col: str = "event_time",
                     watermark_delay: str | None = None) -> DataFrame:
    """Streaming NEAR-dup: incremental MinHash-band candidate pairs.

    The online form of ``textops.lsh_candidate_pairs_hashed``: each doc's
    stateless band signatures (``textops.doc_band_keys`` — hashed terms,
    no dictionary, so the map side streams unchanged) key an
    ``applyInPandasWithState`` bucket whose state is the member doc_id
    list. A newly arriving member emits one (doc_a, doc_b) row against
    every existing member the moment it lands — near-dups are flagged at
    ingest, across micro-batch boundaries, without rescanning the corpus.

    Semantics vs batch:
    - emitted pair SET == batch pairs on the same corpus whenever no
      bucket exceeds the cap (asserted in tests); duplicates across bands
      are possible (batch applies ``.distinct()``; a streaming consumer
      dedups downstream or feeds dedup_clusters, which unions anyway).
    - the cap is ADMISSION-based: once a bucket holds ``max_bucket_size``
      members, later arrivals join via their other bands only. Batch
      drops over-cap buckets retroactively — an online operator cannot
      un-emit, so the streaming posture is the prefix form of the same
      guard (state stays O(cap) per bucket either way).
    - within a micro-batch, arrivals are admitted in doc_id order
      (deterministic given batch boundaries).

    State TTL (round 5): the admission cap bounds each bucket, but bucket
    COUNT still grows with the corpus on an unbounded stream. With
    ``ttl_ms`` set, ``docs`` must carry an event-time column
    (``time_col``); a watermark (``watermark_delay``) is applied and each
    bucket's state expires once the watermark passes ``ttl_ms`` after the
    bucket's latest arrival (sliding TTL — an active boilerplate clique
    stays; a dormant one is reclaimed). Expiry is the standard streaming
    near-dup trade: a duplicate arriving more than the TTL after its
    bucket's last activity is no longer flagged through that bucket.
    Total state is then O(buckets active within one TTL window), not
    O(corpus) — the dedup-exactness analogue of
    ``dropDuplicatesWithinWatermark``.

    ``watermark_delay`` defaults to the TTL itself: Spark's late-row
    filter drops rows older than the watermark BEFORE the operator sees
    them, so a 0-delay watermark would silently discard every
    out-of-order document outright — a much stricter semantics than the
    TTL trade above. Delay == TTL tolerates disorder up to the same
    horizon the state is kept for (state then lives ≲ 2×TTL against the
    wall clock of the stream). Pass an explicit delay to trade state for
    disorder tolerance.
    """
    from ..textops import doc_band_keys
    if ttl_ms is not None:
        if watermark_delay is None:
            watermark_delay = f"{int(ttl_ms)} milliseconds"
        docs = docs.withWatermark(time_col, watermark_delay)
        bands = doc_band_keys(docs, carry_cols=(time_col,))
    else:
        bands = doc_band_keys(docs)

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64")})
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield empty
            return
        members: list[int] = list(state.get[0]) if state.exists else []
        seen = set(members)
        arrivals: set[int] = set()
        last_ms = 0
        for pdf in pdfs:
            arrivals.update(int(x) for x in pdf["doc_id"])
            if ttl_ms is not None and len(pdf):
                last_ms = max(last_ms,
                              int(pdf[time_col].max().value // 1_000_000))
        out_a: list[int] = []
        out_b: list[int] = []
        for d in sorted(arrivals - seen):
            if len(members) >= max_bucket_size:
                break
            for m in members:
                out_a.append(min(m, d))
                out_b.append(max(m, d))
            members.append(d)
        state.update((members,))
        if ttl_ms is not None:
            state.setTimeoutTimestamp(last_ms + ttl_ms)
        yield pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                            "doc_b": pd.Series(out_b, dtype="int64")})

    return (bands.groupBy("band", "band_key")
            .applyInPandasWithState(
                update,
                outputStructType="doc_a long, doc_b long",
                stateStructType="members array<long>",
                outputMode="append",
                timeoutConf=(GroupStateTimeout.EventTimeTimeout
                             if ttl_ms is not None
                             else GroupStateTimeout.NoTimeout)))
