"""End-to-end golden tests: Spark build + query vs pure-Python oracle
(SURVEY.md §5 rebuild strategy, items 2-3)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from candidategeneration_spark import build as B
from candidategeneration_spark import queryengine as Q
from candidategeneration_spark.indexcodec import segment_from_row
from candidategeneration_spark.oracle import OracleIndex

QUERIES = [
    (0, ["fast", "key"]),
    (1, ["order", "sort", "merge"]),
    (2, ["spark"]),
    (3, ["window", "hash", "join", "scan"]),
    (4, ["zzznotaterm"]),
    (5, ["stream", "zzznotaterm"]),
    (6, ["the"]),
    (7, ["batch", "batch", "dup"]),
]


@pytest.fixture(scope="module")
def corpus(docs_sf001):
    return [(int(r["doc_id"]), r["text"])
            for r in docs_sf001.select("doc_id", "text").collect()]


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex(corpus, dbigram_distance=5)


@pytest.fixture(scope="module")
def built(spark, docs_sf001):
    segs, stats = B.build_index(docs_sf001, dbigram_distance=5)
    segs = segs.cache()
    segs.count()
    return segs, stats


def test_global_stats(built, oracle):
    _, stats = built
    assert stats["n_docs"] == oracle.n_docs
    assert stats["total_tokens"] == oracle.total_tokens
    assert stats["avgdl"] == oracle.avgdl


def test_unigram_postings_match_oracle(built, oracle):
    segs, _ = built
    some_terms = ["the", "fast", "spark", "order", "dup", "window"]
    rows = {r["term"]: r for r in
            segs.where(F.col("term").isin(some_terms)).collect()}
    for t in some_terms:
        expect = oracle.postings(t)
        assert t in rows, f"term {t} missing from index"
        seg = segment_from_row(rows[t])
        d, s, tf = seg.decode_all()
        exp_d = [e[0] for e in expect]
        exp_tf = [e[1] for e in expect]
        exp_s = [e[2] for e in expect]
        assert d.tolist() == exp_d
        assert tf.tolist() == exp_tf
        assert s.tolist() == exp_s
        assert seg.df == len(expect)


def test_pair_postings_match_oracle(built, oracle):
    segs, _ = built
    # pick a few pairs that actually occur
    pairs = sorted(oracle.pair_docs)[:3] + [("batch", "batch")]
    keys = [B.PAIR_SEP.join(p) for p in pairs[:3]]
    rows = {r["term"]: r for r in
            segs.where(F.col("term").isin(keys)).collect()}
    for (t1, t2), key in zip(pairs[:3], keys):
        expect = oracle.pair_postings(t1, t2)
        seg = segment_from_row(rows[key])
        d, s, _ = seg.decode_all()
        assert d.tolist() == [e[0] for e in expect]
        assert s.tolist() == [e[1] for e in expect]


def test_pair_segment_component_streams(built, oracle):
    """X2: stored pair segments carry SEPARATE component streams — the tf
    channel holds zigzag(s2) (pair tf is meaningless), so (did, s1, s2)
    reconstructs from the store: s2 = unzigzag(tf), s1 = score - s2."""
    from candidategeneration_spark.indexcodec import zigzag_decode
    segs, _ = built
    pairs = sorted(oracle.pair_docs)[:3]
    keys = [B.PAIR_SEP.join(p) for p in pairs]
    rows = {r["term"]: r for r in
            segs.where(F.col("term").isin(keys)).collect()}
    for (t1, t2), key in zip(pairs, keys):
        seg = segment_from_row(rows[key])
        d, s, tfz = seg.decode_all()
        s2 = zigzag_decode(tfz.astype(np.uint64))
        s1 = s - s2
        for did, a, b in zip(d.tolist(), s1.tolist(), s2.tolist()):
            assert a == oracle.unigram_score(t1, did)
            assert b == oracle.unigram_score(t2, did)


def test_df_and_block_invariants(built, oracle):
    segs, _ = built
    for r in segs.collect():
        seg = segment_from_row(r)
        d, s, _ = seg.decode_all()
        assert np.all(np.diff(d) > 0), r["term"]
        assert seg.df == d.shape[0]
        off = 0
        for i in range(seg.n_blocks):
            bd, bs, _ = seg.decode_block(i)
            assert bs.max() <= seg.block_max[i]
            assert bd[-1] == seg.block_last[i]
            off += 1


def test_topk_rank_identity(spark, built, oracle):
    """Engine (WAND + exhaustive) == oracle, rank for rank, score for score."""
    segs, _ = built
    qdf = spark.createDataFrame(
        [(qid, terms) for qid, terms in QUERIES],
        "qid long, terms array<string>")
    for use_wand in (True, False):
        res = Q.wand_topk(segs, qdf, k=10, use_wand=use_wand) \
               .orderBy("qid", "rank").collect()
        got: dict[int, list] = {}
        for r in res:
            got.setdefault(r["qid"], []).append((r["doc_id"], r["score_q"]))
        for qid, terms in QUERIES:
            expect = oracle.topk(terms, k=10)
            assert got.get(qid, []) == expect, \
                f"qid={qid} wand={use_wand}: {got.get(qid)} != {expect}"


def test_fast_build_identical_to_classic(spark, docs_sf001):
    """The fused single-shuffle path must produce byte-identical segments
    to the classic df-join + applyInPandas path."""
    from candidategeneration_spark.build import (
        build_postings, build_segments, build_segments_fast, global_stats,
        global_stats_from_postings, score_postings,
    )
    stats = global_stats(docs_sf001)
    postings = build_postings(docs_sf001).persist()
    stats2 = global_stats_from_postings(postings, docs_sf001.count())
    # the postings-derived stats additionally carry the exact posting
    # count (round 4: sizes the encode shuffle); the shared keys match
    assert stats == {k: v for k, v in stats2.items() if k != "n_postings"}
    assert stats2["n_postings"] == postings.count()
    classic = {r["term"]: r for r in build_segments(
        score_postings(postings, stats["n_docs"], stats["avgdl"])).collect()}
    fast = {r["term"]: r for r in build_segments_fast(
        postings, stats["n_docs"], stats["avgdl"]).collect()}
    assert set(classic) == set(fast)
    for t in classic:
        for f in ("df", "n_blocks", "block_max", "block_last"):
            assert classic[t][f] == fast[t][f], (t, f)
        for f in ("did_blob", "score_blob", "tf_blob"):
            assert bytes(classic[t][f]) == bytes(fast[t][f]), (t, f)


def test_broadcast_mode_matches_join_mode(spark, built, oracle):
    """Both physical query strategies must return identical results."""
    segs, _ = built
    qdf = spark.createDataFrame(
        [(qid, terms) for qid, terms in QUERIES],
        "qid long, terms array<string>")
    a = sorted(map(tuple, Q.wand_topk(segs, qdf, k=10, mode="join")
                   .collect()))
    b = sorted(map(tuple, Q.wand_topk(segs, qdf, k=10, mode="broadcast")
                   .collect()))
    assert a == b and len(a) > 0


def test_salted_build_identical(spark, docs_sf001, built):
    """Skew-safe two-stage build must produce byte-identical segments
    (resumability analogue: same input → same bytes)."""
    segs, stats = built
    postings = B.build_postings(docs_sf001, dbigram_distance=None)
    scored = B.score_postings(postings, stats["n_docs"], stats["avgdl"])
    plain = {r["term"]: r for r in
             B.build_segments(scored, salt_buckets=0).collect()
             if B.PAIR_SEP not in r["term"]}
    salted = {r["term"]: r for r in
              B.build_segments(scored, salt_buckets=4).collect()}
    assert set(plain) == set(salted)
    for t in plain:
        a, b = plain[t], salted[t]
        assert bytes(a["did_blob"]) == bytes(b["did_blob"]), t
        assert bytes(a["score_blob"]) == bytes(b["score_blob"]), t
        assert a["block_max"] == b["block_max"]
        assert a["block_last"] == b["block_last"]


def test_term_filter_semi_join(spark, docs_sf001):
    """T6/J2: broadcast filter-set pruning — only listed terms survive."""
    from candidategeneration_spark.build import build_postings
    keep = spark.createDataFrame([("fast",), ("key",)], "term string")
    filtered = build_postings(docs_sf001, term_filter=keep)
    got = {r["term"] for r in filtered.select("term").distinct().collect()}
    assert got <= {"fast", "key"} and got
    full = build_postings(docs_sf001)
    n_full = full.where(F.col("term").isin("fast", "key")).count()
    assert filtered.count() == n_full


def test_skew_aware_build_identical(spark, docs_sf001):
    """Skew-split (hot terms salted, tail streamed) must produce segments
    byte-identical to the plain build."""
    from candidategeneration_spark.build import (
        build_postings, build_segments, build_segments_skew_aware,
        global_stats, score_postings)
    stats = global_stats(docs_sf001)
    postings = build_postings(docs_sf001)
    scored = score_postings(postings, stats["n_docs"], stats["avgdl"]).cache()
    plain = {r["term"]: r for r in build_segments(scored).collect()}
    skew = {r["term"]: r
            for r in build_segments_skew_aware(
                scored, hot_df_threshold=50, salt_buckets=4).collect()}
    assert set(plain) == set(skew)
    for t, a in plain.items():
        b = skew[t]
        assert bytes(a["did_blob"]) == bytes(b["did_blob"]), t
        assert bytes(a["score_blob"]) == bytes(b["score_blob"]), t
        assert list(a["block_max"]) == list(b["block_max"]), t


def test_score_postings_pair_guard_fires_executor_side(spark, docs_sf001):
    """The unigrams-only guard is fused into the df aggregate (round 5 —
    no extra probe job): feeding pair rows must still raise, now at the
    first action that evaluates the scored rows."""
    from candidategeneration_spark.build import (
        build_postings, global_stats, score_postings)
    stats = global_stats(docs_sf001)
    with_pairs = build_postings(docs_sf001, dbigram_distance=5)
    bad = score_postings(with_pairs, stats["n_docs"], stats["avgdl"])
    with pytest.raises(Exception, match="unigrams only"):
        bad.collect()


def test_score_postings_runs_one_job(spark, docs_sf001):
    """Happy path: score_postings itself schedules ZERO jobs (the old
    eager isEmpty probe scanned every partition when no pair rows
    existed — one wasted job per build / per streaming micro-batch)."""
    from candidategeneration_spark.build import (
        build_postings, global_stats, score_postings)
    stats = global_stats(docs_sf001)
    postings = build_postings(docs_sf001)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    # building the plan must not launch anything
    scored = score_postings(postings, stats["n_docs"], stats["avgdl"])
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
    assert scored.columns  # plan analyzes cleanly
