#!/usr/bin/env python
"""Benchmark harness: index build + query throughput at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {phase: sec, ...}, "sf": ..., ...extras}

Phases
  build_unigram   tokenize → postings → score → compressed segments (count)
  build_dbigram   same including d-bigram pairs (distance=5)
  query_wand      200-query BM25 top-10 batch via Block-Max WAND
Extras: postings/sec for the builds (BASELINE.json metric) and per-query
mean latency for the query batch.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from candidategeneration_spark.build import build_index, build_postings  # noqa: E402
from candidategeneration_spark.config import get_spark  # noqa: E402
from candidategeneration_spark.entrysql import QUERY_SET  # noqa: E402
from candidategeneration_spark.queryengine import wand_topk  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_QUERIES = 200


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = get_spark(master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, int(CPUS)),
                      app_name="cg-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    docs.count()  # warm: session + parquet footer + cache

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # postings volume for postings/sec (counted once, not timed as build)
    n_post_uni = build_postings(docs).count()
    n_post_bi = build_postings(docs, dbigram_distance=5).count()

    def timed_build(dist):
        # min of 3 reps, fresh cache each: this host shows bursty noise
        # (identical runs measured 2x apart); min is the least-interference
        # estimate of the engine's throughput
        best = None
        for _ in range(3):
            spark.catalog.clearCache()
            d = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
            d.count()
            t0 = time.time()
            seg, _ = build_index(d, dbigram_distance=dist)
            seg.write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        return best

    timings["build_unigram"] = round(timed_build(None), 3)
    extras["unigram_postings_per_sec"] = round(
        n_post_uni / timings["build_unigram"], 1)

    timings["build_dbigram"] = round(timed_build(5), 3)
    extras["dbigram_postings_per_sec"] = round(
        n_post_bi / timings["build_dbigram"], 1)

    seg_uni, _ = build_index(docs, dbigram_distance=None)
    # compact the serving copy: the build emits 4x-cores term-hash
    # partitions (right for encode parallelism + skew smoothing at scale);
    # serving an sf-sized index from 128 tiny cached partitions just adds
    # per-batch task-scheduling overhead (measured ~0.2-0.9s on 200-query
    # batches). A real deployment compacts the index before loading it.
    seg_uni = seg_uni.coalesce(max(8, int(CPUS))).cache()
    seg_uni.count()

    qrows = []
    base = [terms for _, terms in QUERY_SET if terms]
    for i in range(N_QUERIES):
        qrows.append((i, list(base[i % len(base)])))
    qdf = spark.createDataFrame(qrows, "qid long, terms array<string>")
    # warm the query path once (Arrow worker spin-up is not steady-state)
    wand_topk(seg_uni, qdf.limit(4), k=10).count()
    # min of 4 (vs 2 for the builds): the batch is ~1.5s so extra reps are
    # cheap, and this host's noise bursts are comparable to the batch itself
    qbest, n_res = None, 0
    for _ in range(4):
        t0 = time.time()
        n_res = wand_topk(seg_uni, qdf, k=10).count()
        el = time.time() - t0
        qbest = el if qbest is None else min(qbest, el)
    timings["query_wand"] = round(qbest, 3)
    extras["query_mean_ms"] = round(timings["query_wand"] / N_QUERIES * 1e3, 2)
    extras["query_result_rows"] = n_res

    # steady-state serving (recorded as an extra, NOT in the headline sum,
    # so round-1..4 wall-time comparability is preserved): the index is
    # prepared (collected + broadcast) ONCE and the batch runs as a single
    # shuffle-free mapInPandas stage — the physical strategy a deployment
    # picks when the working set fits (and the apples-to-apples shape vs
    # the reference's C++ loop, which loads its arrays once per query set,
    # algo_toplayer.cpp:393-474). Results are asserted identical to the
    # join mode in tests/test_build_query.py.
    from candidategeneration_spark.queryengine import (
        prepare_index, wand_topk_prepared)
    prep = prepare_index(seg_uni)
    wand_topk_prepared(prep, qdf.limit(4), k=10).count()
    pbest = None
    for _ in range(4):
        t0 = time.time()
        n_p = wand_topk_prepared(prep, qdf, k=10).count()
        el = time.time() - t0
        pbest = el if pbest is None else min(pbest, el)
    assert n_p == n_res
    extras["query_prepared_s"] = round(pbest, 3)

    # per-query latency DISTRIBUTION (BASELINE metric asks for p99): the
    # serving kernel timed query-by-query against the prepared index —
    # the same per-query shape as the reference's C++ engine loop.
    import numpy as np
    from candidategeneration_spark.indexcodec import Segment
    from candidategeneration_spark.queryengine import topk_auto
    seg_rows = seg_uni.collect()
    fields = ("df", "did_blob", "score_blob", "tf_blob", "block_last",
              "block_max", "block_n", "did_off", "score_off", "tf_off")
    local = {r["term"]: Segment(**{f: r[f] for f in fields})
             for r in seg_rows}
    # per-query min over 3 passes: the distribution should measure the
    # kernel, not this VM's noise bursts (same rationale as min-of-N on
    # the builds)
    lat = np.full(N_QUERIES, np.inf)
    for _ in range(3):
        for qi in range(N_QUERIES):
            terms = base[qi % len(base)]
            segs = [local[t] for t in dict.fromkeys(terms) if t in local]
            t0 = time.time()
            topk_auto(segs, 10)
            lat[qi] = min(lat[qi], time.time() - t0)
    lat_ms = lat * 1e3
    extras["query_kernel_p50_ms"] = round(float(np.percentile(lat_ms, 50)), 3)
    extras["query_kernel_p99_ms"] = round(float(np.percentile(lat_ms, 99)), 3)
    extras["n_postings_unigram"] = n_post_uni
    extras["n_postings_dbigram"] = n_post_bi

    # long-list kernel stress: sf-scale lists are short (WAND rarely
    # dispatches), so measure the serving-path headroom directly — a
    # 1M-posting hot list + 1k rare list (the idf-skew query shape at
    # 100x corpus scale), BMW vs exhaustive, identical results asserted.
    from candidategeneration_spark.indexcodec import encode_postings
    from candidategeneration_spark.queryengine import (
        topk_bmwand, topk_exhaustive)
    rng = np.random.default_rng(42)

    def synth(n, universe):
        dids = np.sort(rng.choice(universe, n, replace=False)).astype(np.int64)
        scores = rng.integers(1, 1_000_000, n).astype(np.int64)
        return encode_postings(dids, scores,
                               rng.integers(1, 50, n).astype(np.int64))

    stress = [synth(1_000, 4_000_000), synth(1_000_000, 4_000_000)]
    for fn, key in ((topk_bmwand, "kernel_1M_wand_ms"),
                    (topk_exhaustive, "kernel_1M_exhaustive_ms")):
        best = None
        for _ in range(5):
            t0 = time.time()
            res = fn(stress, 10)
            el = (time.time() - t0) * 1e3
            best = el if best is None else min(best, el)
        extras[key] = round(best, 2)
    assert np.array_equal(topk_bmwand(stress, 10)[0],
                          topk_exhaustive(stress, 10)[0])

    # round-5-close dominant-list decomposition on the same shape: this is
    # what topk_auto now actually dispatches here (decode the 1k rare list,
    # random-access the 1M hot list, cover the rest with its batched
    # single-list prefix) — identity vs exhaustive asserted.
    from candidategeneration_spark.queryengine import topk_decompose
    best = None
    for _ in range(5):
        t0 = time.time()
        res = topk_decompose(stress, 10)
        el = (time.time() - t0) * 1e3
        best = el if best is None else min(best, el)
    extras["kernel_1M_decompose_ms"] = round(best, 2)
    assert np.array_equal(res[0], topk_exhaustive(stress, 10)[0])

    # negative-hot kernel stress (round 5): under the reference's
    # unsmoothed IDF (utilsClass.java:115-130) a df > N/2 keyword list is
    # ALL-negative — WAND's upper bounds can't prune it and the exhaustive
    # kernel streams the whole 1M postings. topk_lookup answers the same
    # exact top-k by random access into the hot list's candidate blocks,
    # so work tracks the RARE list. Plain segments don't memoize, so each
    # rep pays the COLD per-block path (<=1 block decoded per candidate) —
    # the conservative number; serving amortizes further via
    # _CachingSegment. Identity vs exhaustive asserted.
    from candidategeneration_spark.queryengine import topk_lookup

    def synth_neg(n, universe):
        dids = np.sort(rng.choice(universe, n, replace=False)).astype(np.int64)
        scores = -rng.integers(1, 1_000_000, n).astype(np.int64)
        return encode_postings(dids, scores,
                               rng.integers(1, 50, n).astype(np.int64))

    neg_stress = [synth(1_000, 4_000_000), synth_neg(1_000_000, 4_000_000)]
    for fn, key in ((topk_lookup, "kernel_1M_neghot_lookup_ms"),
                    (topk_exhaustive, "kernel_1M_neghot_exhaustive_ms")):
        best = None
        for _ in range(5):
            t0 = time.time()
            res = fn(neg_stress, 10)
            el = (time.time() - t0) * 1e3
            best = el if best is None else min(best, el)
        assert res is not None
        extras[key] = round(best, 2)
    assert np.array_equal(topk_lookup(neg_stress, 10)[0],
                          topk_exhaustive(neg_stress, 10)[0])

    # round-3 training-data ops (recorded, not part of the headline sum):
    # duplicate_spans over the sf docs; PQ/ADC top-k over the embeddings
    from candidategeneration_spark.annops import pq_adc_topk
    from candidategeneration_spark.pipelineops import duplicate_spans
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    for key, fn in (("duplicate_spans_s",
                     lambda: duplicate_spans(docs).count()),
                    ("pq_adc_topk_s", lambda: pq_adc_topk(emb).count())):
        best = None
        for _ in range(2):
            t0 = time.time()
            fn()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        extras[key] = round(best, 2)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "index-build+query wall seconds (sf documents corpus)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
