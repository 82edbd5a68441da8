"""End-to-end WARC gate (VERDICT r3 task 6): the reference's full ClueWeb
path — ReadWarcSample.java → WarcRecord framing → HtmlpageCleaner →
InvertedIndex build → query — exercised as ONE pipeline: generated
.warc.gz files → read_warc → numeric ids → build_index → Block-Max WAND,
rank-identical (ids AND quantized scores) to the brute-force OracleIndex
over the same cleaned documents."""

import gzip

import pytest
from pyspark.sql import functions as F

from candidategeneration_spark.build import build_index
from candidategeneration_spark.oracle import OracleIndex
from candidategeneration_spark.queryengine import wand_topk
from candidategeneration_spark.sources.warc import read_warc

VOCAB = ["merge", "sort", "heap", "tree", "hash", "graph", "queue",
         "stack", "trie", "array"]


def _html_doc(i: int) -> str:
    """Deterministic HTML page with a skewed term mix + strip-bait."""
    words = []
    for j, w in enumerate(VOCAB):
        words += [w] * (((i * 7 + j * 3) % 5) + (1 if (i + j) % 3 else 0))
    body = " ".join(words)
    return (f"<html><head><title>doc {i}</title>"
            f"<script>var x = 'sort sort sort';</script>"
            f"<style>.c {{ color: red }}</style></head>"
            f"<body><!-- hash hash --><p>{body}</p>"
            f"<div>&amp;extra {VOCAB[i % len(VOCAB)]}</div></body></html>")


def _warc_bytes(doc_ids_htmls) -> bytes:
    def rec(rtype, extra, body: bytes) -> bytes:
        hdr = (f"WARC/0.18\r\nWARC-Type: {rtype}\r\n"
               + "".join(f"{k}: {v}\r\n" for k, v in extra)
               + f"Content-Length: {len(body)}\r\n\r\n").encode()
        return hdr + body + b"\r\n\r\n"

    out = rec("warcinfo", [("WARC-Record-ID", "<urn:uuid:info>")],
              b"format: WARC file")
    for trec_id, html in doc_ids_htmls:
        body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + html.encode())
        out += rec("response",
                   [("WARC-TREC-ID", trec_id),
                    ("WARC-Target-URI", f"http://x.test/{trec_id}")],
                   body)
        # request noise that must be dropped
        out += rec("request", [("WARC-Record-ID", f"<urn:uuid:{trec_id}>")],
                   b"GET / HTTP/1.1")
    return out


@pytest.fixture(scope="module")
def warc_docs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("warc_e2e")
    n = 24
    pages = [(f"clueweb09-en0000-00-{i:05d}", _html_doc(i))
             for i in range(n)]
    # two .gz members like a real crawl shard layout
    for fi, chunk in enumerate((pages[:n // 2], pages[n // 2:])):
        with gzip.open(root / f"part-{fi}.warc.gz", "wb") as f:
            f.write(_warc_bytes(chunk))
    docs = read_warc(spark, str(root)) \
        .select(F.xxhash64("doc_id").alias("doc_id"), "text")
    return docs.cache(), n


def test_warc_to_wand_rank_identical(spark, warc_docs):
    docs, n = warc_docs
    rows = docs.collect()
    assert len(rows) == n  # responses only; warcinfo/request dropped
    # script/style/comment content must not leak into the index
    assert not any("var x" in r["text"] or "color" in r["text"]
                   for r in rows)
    segments, stats = build_index(docs, dbigram_distance=None)
    segments = segments.cache()
    oracle = OracleIndex([(r["doc_id"], r["text"]) for r in rows],
                         dbigram_distance=None)
    assert stats["n_docs"] == n
    queries = [(0, ["merge", "sort"]), (1, ["hash"]),
               (2, ["graph", "queue", "trie"]), (3, ["absentterm"]),
               (4, VOCAB[:5])]
    qdf = spark.createDataFrame(queries, "qid long, terms array<string>")
    got = wand_topk(segments, qdf, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(
            (r["rank"], r["doc_id"], r["score_q"]))
    for qid, terms in queries:
        want = oracle.topk(terms, k=10)
        have = sorted(by_q.get(qid, []))
        assert [(d, s) for _, d, s in have] == want, (qid, terms)


def test_warc_e2e_dbigram_build_runs(spark, warc_docs):
    """The d-bigram path over WARC-born docs: pair segments exist and the
    pair-score contract (score_q = s1 + s2 with s2 in the zigzag tf
    stream) round-trips through segment encode/decode."""
    import numpy as np

    from candidategeneration_spark.build import PAIR_SEP
    from candidategeneration_spark.indexcodec import segment_from_row
    docs, _ = warc_docs
    segments, _ = build_index(docs, dbigram_distance=2)
    pair_rows = [r for r in segments.collect() if PAIR_SEP in r["term"]]
    assert pair_rows
    seg = segment_from_row(pair_rows[0])
    dids, scores, tfz = seg.decode_all()
    s2 = (tfz >> 1) ^ -(tfz & 1)
    assert np.all(np.diff(dids) > 0)
    assert s2.shape == scores.shape
