#!/usr/bin/env python
"""Workload-matched Spark-free host ceiling for the 2->8 build rung.

BENCH/SCALING.json's ``bandwidth_wall`` probe showed this VM's memory
subsystem saturates under *generic* streaming numpy well below 8
processes (2->8 efficiency 0.798 with NO Spark involved). After the
round-5 pair-kernel vectorization the build's dominant CPU kernel
(`_pair_rows_scored`) became faster and therefore more bandwidth-bound,
so the generic probe no longer brackets it tightly. This probe measures
the ACTUAL kernel — the exact `_pair_rows_scored` the build's
mapInPandas stage runs, on a realistic zipf batch — under plain
``multiprocessing`` (no Spark, no JVM, no shuffle) at 1/2/8 processes:

    eff_2_8 = (units_per_sec_8 / units_per_sec_2) / 4

Every process executes identical, independent, share-nothing work; any
efficiency loss is the HOST (shared memory bandwidth / allocator /
SMT), not the engine. The number is the ceiling any Spark job whose
inner loop is this kernel can reach on this box between local[2] and
local[8].

Usage: python bench_kernel_ceiling.py [seconds_per_rung]   (default 25)
Prints one JSON line; paste into BENCH/SCALING.json under
``kernel_ceiling_2_8`` after a quiet-window run.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

WINDOW_S = float(sys.argv[1]) if len(sys.argv) > 1 else 25.0
PROCS = (1, 2, 8)
SEED = 20260820


def _build_batch():
    import numpy as np
    import pandas as pd
    r = np.random.default_rng(SEED)
    vocab_size, n_docs, max_len = 20_000, 600, 400
    vocab = np.array([f"w{i:05d}" for i in range(vocab_size)], dtype=object)
    p = 1.0 / np.arange(1, vocab_size + 1, dtype=np.float64) ** 1.1
    cum = np.cumsum(p / p.sum())
    rows = []
    for i in range(n_docs):
        n = int(r.integers(40, max_len))
        ts = vocab[np.searchsorted(cum, r.random(n))]
        uniq = np.unique(ts.astype(str)).astype(object)
        scores = r.integers(-10_000_000, 10_000_000,
                            uniq.shape[0]).astype(np.int64)
        rows.append((1000 + i * 7, ts, uniq, scores))
    return pd.DataFrame(rows, columns=["doc_id", "__toks", "__terms",
                                       "__scores"])


def _worker(ready, go, stop_t, counter):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from candidategeneration_spark.build import _pair_rows_scored
    pdf = _build_batch()
    _pair_rows_scored(pdf, 5)          # warm (imports, JIT-ish caches)
    ready.wait()                       # signal warmed; parent sets stop_t
    go.wait()                          # released only after stop_t is set
    n = 0
    while time.time() < stop_t.value:
        _pair_rows_scored(pdf, 5)
        n += 1
    with counter.get_lock():
        counter.value += n


def _rung(procs: int) -> dict:
    # Two barriers: `ready` proves every worker finished warming, THEN
    # the parent stamps the deadline, THEN `go` releases the measured
    # loop — so no worker can observe an unset (0.0) deadline and the
    # window never overlaps warm-up time.
    ready = mp.Barrier(procs + 1)
    go = mp.Barrier(procs + 1)
    stop_t = mp.Value("d", 0.0)
    counter = mp.Value("l", 0)
    ps = [mp.Process(target=_worker, args=(ready, go, stop_t, counter))
          for _ in range(procs)]
    for p in ps:
        p.start()
    ready.wait()                       # all workers warmed
    t0 = time.time()
    stop_t.value = t0 + WINDOW_S
    go.wait()                          # start the measured window
    for p in ps:
        p.join()
    elapsed = time.time() - t0
    ups = counter.value / elapsed
    return {"procs": procs, "units": counter.value,
            "elapsed_s": round(elapsed, 2),
            "units_per_sec": round(ups, 3),
            "per_proc": round(ups / procs, 3)}


def main() -> None:
    with open("/proc/loadavg") as f:
        load0 = f.read().split()[:3]
    rungs = {p: _rung(p) for p in PROCS}
    u2, u8 = rungs[2]["units_per_sec"], rungs[8]["units_per_sec"]
    print(json.dumps({
        "what": ("Spark-free multiprocessing ceiling of the ACTUAL "
                 "vectorized pair kernel (_pair_rows_scored, distance=5, "
                 "600-doc zipf batch, share-nothing identical work per "
                 "process)"),
        "window_s": WINDOW_S,
        "loadavg_start": " ".join(load0),
        "rungs": list(rungs.values()),
        "eff_1_2": round(u2 / (2 * rungs[1]["units_per_sec"]), 3),
        "eff_2_8": round(u8 / (4 * u2), 3),
    }))


if __name__ == "__main__":
    main()
