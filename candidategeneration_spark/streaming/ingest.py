"""Streaming index ingestion: continuous postings ingest + batch compaction.

The reference is strictly batch (4-phase offline build, ``WWWMain.java``).
This module adds the Spark-first incremental story — the Lucene-style
segment architecture expressed in Structured Streaming:

1. **Ingest** (:func:`stream_postings` → :func:`postings_sink`): a document
   stream (file source here; Kafka at scale) flows through the SAME Arrow
   tokenize+tf kernel as the batch build (``build._explode_tf``) and
   appends raw postings ``(term, doc_id, tf, doc_len, maxtf)`` to a
   Parquet postings log. The streaming Parquet sink is exactly-once (its
   file manifest commits atomically per micro-batch), so task retries
   can't duplicate postings. No scoring happens here — scores depend on
   GLOBAL stats (df, n_docs, avgdl), which a micro-batch cannot know.

2. **Compact** (:func:`compact_index`): a batch job reads the postings log
   at any point, computes exact global stats over everything ingested so
   far, scores, and builds compressed block-max segments with the normal
   pipeline. Every compaction is EXACT — identical to a from-scratch batch
   build of the same documents (tested) — because scoring is deferred to
   the point where df/N are known. Between compactions, queries serve from
   the last compacted store: the standard freshness/exactness trade of
   log-structured search indexes (Lucene soft-commits, Elasticsearch
   refresh intervals), chosen over approximate per-batch scoring because
   BM25 idf drift would break the engine's rank-identity contract.

At 100 TB: the postings log is append-only (no shuffle on the hot path —
the only streaming-state-free shape), compaction cost is one normal build
over the log, and both sides reuse every batch kernel unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCS_SCHEMA = "doc_id long, text string"


def read_docs_stream(spark: SparkSession, path: str,
                     schema: str = DOCS_SCHEMA,
                     max_files: int = 4) -> DataFrame:
    """File-source document stream (Kafka stand-in; plans are
    source-agnostic)."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files)
            .parquet(path))


def stream_postings(docs_stream: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", stopwords=None) -> DataFrame:
    """Streaming postings: the batch Arrow kernel applied to a stream.

    ``mapInPandas`` is stateless per micro-batch, so the tokenize+tf pass
    runs identically under streaming — one code path for both modes.
    """
    from ..build import build_postings
    return build_postings(docs_stream, id_col=id_col, text_col=text_col,
                          stopwords=stopwords)


def postings_sink(postings_stream: DataFrame, log_path: str,
                  checkpoint: str, available_now: bool = True):
    """Append the postings stream to the Parquet log (exactly-once sink).

    Returns the StreamingQuery; callers ``awaitTermination`` it. With
    ``available_now`` the query drains everything currently in the source
    and stops — the test/backfill shape; omit for a continuous run.
    """
    w = (postings_stream.writeStream
         .format("parquet")
         .option("path", log_path)
         .option("checkpointLocation", checkpoint)
         .outputMode("append"))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def compact_index(spark: SparkSession, log_path: str,
                  salt_buckets: int = 0) -> tuple[DataFrame, dict]:
    """Exact segments from everything ingested so far.

    Reads the postings log, derives global stats from it (n_docs = distinct
    doc ids — each doc's postings carry its full per-doc tf set from one
    micro-batch, so distinct-count is exact), scores, builds segments with
    the normal batch pipeline. Result is identical to a batch build of the
    same corpus (asserted in tests/test_streaming_ingest.py).
    """
    from pyspark.sql import functions as F

    from ..build import (build_segments, global_stats_from_postings,
                         score_postings)
    postings = spark.read.parquet(log_path)
    n_docs = postings.select("doc_id").distinct().count()
    stats = global_stats_from_postings(postings, n_docs)
    scored = score_postings(postings, stats["n_docs"], stats["avgdl"])
    return build_segments(scored, salt_buckets=salt_buckets), stats
