"""Shared synthetic-segment generator for the codec/kernel test files.

One definition so the default differential suite (test_codec.py) and the
opt-in extended campaign (test_fuzz_extended.py) fuzz the SAME posting
distribution — a change to the synth shape here changes both.
"""
import numpy as np

import candidategeneration_spark.indexcodec as ic


def synth_seg(r, n, universe, lo, hi):
    dids = np.sort(r.choice(universe, n, replace=False)).astype(np.int64)
    scores = r.integers(lo, hi, n).astype(np.int64)
    return ic.encode_postings(
        dids, scores, r.integers(1, 50, n).astype(np.int64))
