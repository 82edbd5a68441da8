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


def _near_dup_corpus():
    """Documents with overlapping token sets so MinHash bands collide:
    0/1/2 are near-identical, 5/6 are near-identical, 3/4 are organic."""
    base = ("the quick brown fox jumps over the lazy dog while the "
            "merge sort runs in n log n time on the sorted array")
    other = ("binary heap siblings live at 2i and 2i+1 making push and "
             "pop logarithmic in the heap size for priority queues")
    return [
        [(0, base), (1, base + " extra1"), (3, "totally unrelated words "
                                               "about databases and trees")],
        [(2, base + " extra2"), (4, "another organic document with its "
                                    "own vocabulary entirely")],
        [(5, other), (6, other + " tail tweak")],
    ]


def _stage_neardup(spark, tmp_path):
    src = str(tmp_path / "nd_arrivals")
    for rows in _near_dup_corpus():
        spark.createDataFrame(rows, "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(src)
    return src


def test_lsh_pairs_stream_batch_parity(spark, tmp_path):
    """The streaming MinHash-band path must emit exactly the batch
    candidate-pair set (textops.lsh_candidate_pairs_hashed) on the same
    corpus — including pairs whose members arrived in DIFFERENT
    micro-batches (docs 0/1 in batch 0, doc 2 in batch 1)."""
    from candidategeneration_spark.textops import (
        doc_band_keys, lsh_candidate_pairs_hashed)

    src = _stage_neardup(spark, tmp_path)
    batch_docs = spark.read.parquet(src)
    # precondition: no bucket near the cap, so prefix-admission == batch
    from pyspark.sql import functions as F
    max_bucket = (doc_band_keys(batch_docs)
                  .groupBy("band", "band_key").count()
                  .agg(F.max("count")).collect()[0][0])
    assert max_bucket < 256
    want = {(r["doc_a"], r["doc_b"])
            for r in lsh_candidate_pairs_hashed(batch_docs).collect()}
    assert want, "corpus must produce at least one near-dup pair"
    # cross-batch pair must be present in the expected set
    assert any(a in (0, 1) and b == 2 for a, b in want)

    stream = ingest.read_docs_stream(spark, src, max_files=1)
    q = (dedup.lsh_pairs_stream(stream)
         .writeStream.format("memory").queryName("lsh_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["doc_a"], r["doc_b"]) for r in
           spark.sql("SELECT doc_a, doc_b FROM lsh_stream").collect()}
    assert got == want


def test_lsh_pairs_stream_bucket_cap_is_admission(spark, tmp_path):
    """Once a bucket reaches the cap, later arrivals are not admitted
    (and emit no pairs through that bucket): three identical docs with
    cap=2 pair only the first two."""
    src = str(tmp_path / "cap_arrivals")
    text = "identical boilerplate license header words everywhere"
    for i in range(3):
        spark.createDataFrame([(i, text)], "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(src)
    stream = ingest.read_docs_stream(spark, src, max_files=1)
    q = (dedup.lsh_pairs_stream(stream, max_bucket_size=2)
         .writeStream.format("memory").queryName("lsh_cap")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["doc_a"], r["doc_b"]) for r in
           spark.sql("SELECT doc_a, doc_b FROM lsh_cap").collect()}
    assert got == {(0, 1)}


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


def test_lsh_pairs_stream_state_ttl_expires_dormant_buckets(spark, tmp_path):
    """Round-5 TTL: with ttl_ms set, a bucket with no arrivals for longer
    than the TTL (by event time / watermark) is reclaimed — a duplicate
    arriving after expiry emits NO pair against the forgotten members,
    while the re-created bucket keeps working for later dups. Total state
    stays bounded by the buckets active within one TTL window."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    text_a = "identical boilerplate license header words everywhere"
    batches = [
        [(0, text_a, at(0))],                       # seeds bucket A
        [(50, "first unrelated filler words here completely", at(60))],
        [(51, "second unrelated filler words there entirely", at(120))],
        # bucket A expired during the batch above (wm=60s > 0s+5s TTL):
        # doc2 re-creates it empty -> no (0,2); doc3 pairs with doc2
        [(2, text_a, at(180)), (3, text_a, at(180))],
    ]
    schema = "doc_id long, text string, event_time timestamp"

    def run(src_name, ttl_ms):
        src = str(tmp_path / src_name)
        for rows in batches:
            spark.createDataFrame(rows, schema) \
                .coalesce(1).write.mode("append").parquet(src)
        stream = ingest.read_docs_stream(spark, src, schema=schema,
                                         max_files=1)
        q = (dedup.lsh_pairs_stream(stream, ttl_ms=ttl_ms)
             .writeStream.format("memory").queryName(f"q_{src_name}")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        pairs = {(r["doc_a"], r["doc_b"]) for r in
                 spark.sql(f"SELECT * FROM q_{src_name}").collect()}
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        return pairs, state_rows

    with_ttl, rows_ttl = run("ttl_on", ttl_ms=5_000)
    no_ttl, rows_no = run("ttl_off", ttl_ms=None)
    # contrast run: without TTL the forgotten pairs ARE emitted
    assert {(0, 2), (0, 3), (2, 3)} <= no_ttl
    # expired bucket stops emitting against forgotten members...
    assert not any(0 in p for p in with_ttl), with_ttl
    # ...but keeps working for arrivals inside the window
    assert (2, 3) in with_ttl
    # and dormant-bucket state was actually reclaimed
    assert rows_ttl < rows_no, (rows_ttl, rows_no)
