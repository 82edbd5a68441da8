"""Streaming index ingestion: postings log via Structured Streaming +
exact batch compaction — compaction output must be BYTE-IDENTICAL to a
from-scratch batch build of the same documents."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from candidategeneration_spark.build import build_index  # noqa: E402
from candidategeneration_spark.streaming import ingest  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def _seg_map(segments):
    return {r["term"]: (r["df"], bytes(r["did_blob"]), bytes(r["score_blob"]))
            for r in segments.collect()}


def test_stream_ingest_compact_equals_batch_build(spark, tmp_path):
    base = spark.read.parquet(f"{TESTDATA}/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    # token-less docs: emit NO postings but still count toward n_docs/avgdl
    # (the doc-id sidecar is what keeps compaction exact here)
    empties = spark.createDataFrame(
        [(10_000_001, ""), (10_000_002, "    ")], "doc_id long, text string")
    docs = base.unionByName(empties)
    src = str(tmp_path / "arrivals")
    log = str(tmp_path / "postings_log")
    doc_log = str(tmp_path / "doc_log")
    ckpt = str(tmp_path / "ckpt")
    dckpt = str(tmp_path / "dckpt")
    # three arrival chunks -> three micro-batches (maxFilesPerTrigger=1)
    for i in range(3):
        docs.where(docs.doc_id % 3 == i).coalesce(1) \
            .write.mode("append").parquet(src)

    stream = ingest.read_docs_stream(spark, src, max_files=1)
    q = ingest.postings_sink(ingest.stream_postings(stream), log, ckpt)
    q.awaitTermination(120)
    qd = ingest.docs_sink(ingest.read_docs_stream(spark, src, max_files=1),
                          doc_log, dckpt)
    qd.awaitTermination(120)

    seg_stream, stats_stream = ingest.compact_index(
        spark, log, doc_log_path=doc_log)
    seg_batch, stats_batch = build_index(docs, dbigram_distance=None)
    # "cached" carries the batch build's persisted-intermediate handles
    # (release_build_caches), not statistics — compare the numbers
    assert stats_stream == {k: v for k, v in stats_batch.items()
                            if k != "cached"}
    assert stats_stream["n_docs"] == base.count() + 2
    assert _seg_map(seg_stream) == _seg_map(seg_batch)

    # exactly-once: restarting against the same checkpoint with no new
    # arrivals must not grow the log
    n0 = spark.read.parquet(log).count()
    q2 = ingest.postings_sink(
        ingest.stream_postings(ingest.read_docs_stream(spark, src,
                                                       max_files=1)),
        log, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(log).count() == n0


def test_deletes_compact_equals_batch_build_of_live_docs(spark, tmp_path):
    """Tombstoned docs must vanish from stats AND scores: compaction with
    deletes is byte-identical to a from-scratch batch build of only the
    live documents (df/n_docs/avgdl all reflect the deletion)."""
    base = spark.read.parquet(f"{TESTDATA}/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    src = str(tmp_path / "arrivals")
    log = str(tmp_path / "postings_log")
    doc_log = str(tmp_path / "doc_log")
    dels = str(tmp_path / "deletes")
    base.coalesce(1).write.mode("append").parquet(src)

    q = ingest.postings_sink(
        ingest.stream_postings(ingest.read_docs_stream(spark, src)),
        log, str(tmp_path / "ck1"))
    q.awaitTermination(120)
    qd = ingest.docs_sink(ingest.read_docs_stream(spark, src),
                          doc_log, str(tmp_path / "ck2"))
    qd.awaitTermination(120)

    # tombstone every third doc via the delete stream
    dead = base.where("doc_id % 3 = 0").select("doc_id")
    del_src = str(tmp_path / "del_arrivals")
    dead.coalesce(1).write.mode("append").parquet(del_src)
    del_stream = (spark.readStream.schema("doc_id long")
                  .parquet(del_src))
    qx = ingest.deletes_sink(del_stream, dels, str(tmp_path / "ck3"))
    qx.awaitTermination(120)

    seg_del, stats_del = ingest.compact_index_with_deletes(
        spark, log, dels, doc_log_path=doc_log)
    live = base.where("doc_id % 3 != 0")
    seg_batch, stats_batch = build_index(live, dbigram_distance=None)
    assert stats_del == {k: v for k, v in stats_batch.items()
                         if k != "cached"}
    assert _seg_map(seg_del) == _seg_map(seg_batch)

    # serve-time filter over a PRE-delete store suppresses dead docs
    from candidategeneration_spark.queryengine import wand_topk
    seg_old, _ = ingest.compact_index(spark, log, doc_log_path=doc_log)
    qdf = spark.createDataFrame([(0, ["fast", "key"])],
                                "qid long, terms array<string>")
    res = ingest.filter_deleted(wand_topk(seg_old, qdf, k=50),
                                spark, dels)
    got = {r["doc_id"] for r in res.collect()}
    assert got and all(d % 3 != 0 for d in got)
