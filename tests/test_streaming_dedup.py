"""Streaming exact dedup: first-occurrence-wins across micro-batches,
state keyed by content hash (test_streaming_ingest's arrival pattern:
one file per micro-batch via maxFilesPerTrigger=1)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from candidategeneration_spark.streaming import dedup, ingest  # noqa: E402


def _stage_arrivals(spark, tmp_path):
    """Three arrival files: batch0 has docs 0-3 (1 and 3 share content),
    batch1 re-sends doc 1's content as doc 10 plus new doc 11, batch2 is
    all dups."""
    rows0 = [(0, "alpha text"), (1, "dup text"), (2, "beta text"),
             (3, "dup text")]
    rows1 = [(10, "dup text"), (11, "gamma text")]
    rows2 = [(20, "alpha text"), (21, "gamma text")]
    src = str(tmp_path / "arrivals")
    for i, rows in enumerate([rows0, rows1, rows2]):
        spark.createDataFrame(rows, "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(src)
    return src


def test_dedup_stream_first_occurrence_wins(spark, tmp_path):
    src = _stage_arrivals(spark, tmp_path)
    stream = ingest.read_docs_stream(spark, src, max_files=1)
    q = (dedup.dedup_docs_stream(stream)
         .writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("SELECT doc_id, text FROM dedup_out").collect()
    texts = sorted(r["text"] for r in out)
    assert texts == ["alpha text", "beta text", "dup text", "gamma text"]
    # the dup survivors must come from the EARLIEST batch containing them
    by_text = {r["text"]: r["doc_id"] for r in out}
    assert by_text["dup text"] in (1, 3)      # batch 0, not doc 10
    assert by_text["alpha text"] == 0          # batch 0, not doc 20
    assert by_text["gamma text"] == 11         # batch 1, not doc 21


def test_dedup_stats_running_counts(spark, tmp_path):
    src = _stage_arrivals(spark, tmp_path)
    stream = ingest.read_docs_stream(spark, src, max_files=1)
    q = (dedup.dedup_stats_stream(stream)
         .writeStream.format("memory").queryName("dedup_stats")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # last update per key = final running count
    rows = spark.sql(
        "SELECT content_sha, max(n_seen) AS n, min(first_doc_id) AS fd"
        " FROM dedup_stats GROUP BY content_sha").collect()
    stats = {r["fd"]: r["n"] for r in rows}
    assert stats[1] == 3      # "dup text": docs 1, 3, 10 (first batch min=1)
    assert stats[0] == 2      # "alpha text": docs 0, 20
    assert stats[2] == 1      # "beta text"
    assert stats[11] == 2     # "gamma text": docs 11, 21
    # exactly 4 distinct contents
    assert len(stats) == 4


def test_gopher_rules_stream_batch_parity(spark, tmp_path):
    """Stateless quality ops apply to a stream unchanged (pure column
    projections): gopher_rules over a file stream must equal the batch
    result row-for-row."""
    from candidategeneration_spark.textops import gopher_rules

    src = _stage_arrivals(spark, tmp_path)
    batch = {r["doc_id"]: tuple(r)
             for r in gopher_rules(spark.read.parquet(src)).collect()}
    stream = ingest.read_docs_stream(spark, src, max_files=1)
    q = (gopher_rules(stream)
         .writeStream.format("memory").queryName("gopher_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    streamed = {r["doc_id"]: tuple(r)
                for r in spark.sql("SELECT * FROM gopher_stream").collect()}
    assert streamed == batch and len(batch) == 8
