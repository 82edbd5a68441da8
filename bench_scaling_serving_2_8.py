#!/usr/bin/env python
"""Round-5 closing rung: 2 -> 8 on the QUERY-SERVING path, final code.

The serving 2->8 efficiency on record (0.918, SCALING.json ``headline``)
predates the round-5 serving-kernel changes (vectorized multi-block WAND
skip, uniform-width decode, selective-lookup kernel). This script
re-measures the under-the-wall N->4N pair on the FINAL engine so the
north-rule evidence pair (build 0.848 + serving) is all final-code:

- one untimed unigram index build per side on the standing 500k-doc
  synthetic source-code corpus (``/tmp/cg_scale_corpus_v3_500000``,
  regenerated via bench_scaling.py if absent);
- prepared-index ``wand_topk_prepared`` batches of 10k queries,
  1 warm + 3 timed reps, min taken (standing bursty-host methodology);
- fresh JVM per side, loadavg sampled around every rep.

Note on batch size: 10k (vs the 8->32 rung's 80k) fits an end-of-round
window; the per-batch fixed cost (~1-2 s of job setup) weighs ~4x more
on the FAST side, so it biases the 2->8 ratio DOWN — the number reported
is a lower bound under this methodology, not a flattered one.

Usage: python bench_scaling_serving_2_8.py [n_queries]   (default 10000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CORPUS = "/tmp/cg_scale_corpus_v3_500000"
def _n_queries() -> int:
    # positional [n_queries] per the usage string; --worker mode reads it
    # from the third argv slot so the parent can forward it.
    args = sys.argv[1:]
    if args and args[0] == "--worker":
        args = args[2:]
    return int(args[0]) if args else 10_000


N_QUERIES = _n_queries()


def _load() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def worker(cores: int) -> None:
    sys.path.insert(0, REPO)
    from candidategeneration_spark.build import build_index
    from candidategeneration_spark.config import get_spark
    from candidategeneration_spark.queryengine import (
        prepare_index, wand_topk_prepared)

    spark = get_spark(master=f"local[{cores}]",
                      shuffle_partitions=max(8, cores * 2),
                      app_name=f"cg-serve28-{cores}")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(CORPUS).repartition(cores * 4).cache()
    docs.count()
    segments, _ = build_index(docs, text_col="content",
                              dbigram_distance=None)
    segments = segments.cache()
    segments.count()
    terms = [["ident0042", "ident0100"], ["ident2000", "ident0371"],
             ["def", "ident0042"], ["ident1234"],
             ["ident0007", "ident0311", "ident4999"],
             ["class", "ident0100", "ident0999"],
             ["ident0250", "ident0251"], ["return", "ident3000"]]
    qrows = [(i, terms[i % len(terms)]) for i in range(N_QUERIES)]
    qdf = (spark.createDataFrame(qrows, "qid long, terms array<string>")
           .repartition(cores * 2).cache())
    qdf.count()
    all_terms = sorted({t for ts in terms for t in ts})
    prep = prepare_index(segments, all_terms)
    wand_topk_prepared(prep, qdf, k=10).count()          # warm rep
    reps, loads = [], []
    for _ in range(3):
        loads.append(_load())
        t0 = time.time()
        wand_topk_prepared(prep, qdf, k=10).count()
        reps.append(time.time() - t0)
    loads.append(_load())
    best = min(reps)
    print(json.dumps({"cores": cores, "query_s": round(best, 3),
                      "reps": [round(r, 3) for r in reps],
                      "loadavg_1min": loads,
                      "queries_per_sec": round(N_QUERIES / best, 1)}),
          flush=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return
    if not os.path.isdir(CORPUS):
        print(f"corpus fixture missing: {CORPUS} — run bench_scaling.py "
              "once to generate it", file=sys.stderr)
        sys.exit(2)
    results = {}
    for cores in (2, 8):
        out = subprocess.run([sys.executable, __file__, "--worker",
                              str(cores), str(N_QUERIES)],
                             capture_output=True, text=True, timeout=1800)
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not lines:
            print("WORKER FAILED", cores, out.stdout[-2000:],
                  out.stderr[-2000:])
            sys.exit(1)
        results[str(cores)] = json.loads(lines[-1])
    rn, r4n = results["2"], results["8"]
    eff = round(r4n["queries_per_sec"] / (4 * rn["queries_per_sec"]), 3)
    print(json.dumps({"qps_n": rn["queries_per_sec"],
                      "qps_4n": r4n["queries_per_sec"],
                      "efficiency": eff, "raw": results}))


if __name__ == "__main__":
    main()
