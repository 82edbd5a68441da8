"""Multimodal plumbing: feature extraction matches a pure-Python oracle."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from candidategeneration_spark import mmops  # noqa: E402


def test_byte_histogram_features_oracle(spark, docs_sf001):
    sample = docs_sf001.limit(20)
    docs = mmops.with_fake_payload(sample)
    rows = mmops.byte_histogram_features(docs).collect()
    texts = {r["doc_id"]: r["text"] for r in sample.collect()}
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], {})[r["bin"]] = r["cnt"]
    assert set(got) == {d for d, t in texts.items() if t}
    for did, text in texts.items():
        b = np.frombuffer(text.encode(), np.uint8)
        h = np.bincount(b >> 4, minlength=16)
        expect = {i: int(c) for i, c in enumerate(h) if c}
        assert got.get(did, {}) == expect


def test_byte_histogram_non_power_of_two_bins_clipped(spark, docs_sf001):
    """bins=10: shift maps bytes to 16 raw buckets; indices must clip to
    bins-1, never emit bin >= bins (ADVICE round 1)."""
    docs = mmops.with_fake_payload(docs_sf001.limit(10))
    rows = mmops.byte_histogram_features(docs, bins=10).collect()
    assert rows and all(0 <= r["bin"] < 10 for r in rows)


def test_frame_sample_stats_match_frames(spark, docs_sf001):
    docs = mmops.with_fake_payload(docs_sf001.limit(10))
    frames = {(r["doc_id"], r["frame_idx"]): bytes(r["frame_bytes"])
              for r in mmops.frame_sample(docs).collect()}
    stats = mmops.frame_sample_stats(docs).collect()
    assert {(r["doc_id"], r["frame_idx"]) for r in stats} == set(frames)
    for r in stats:
        blob = frames[(r["doc_id"], r["frame_idx"])]
        assert r["n_bytes"] == len(blob)
        assert r["byte_sum"] == sum(blob)


def test_frame_sample_shape(spark, docs_sf001):
    docs = mmops.with_fake_payload(docs_sf001.limit(10))
    rows = mmops.frame_sample(docs).collect()
    assert rows, "sampler produced no frames"
    for r in rows:
        assert r["frame_idx"] % 10 == 0  # every=10 default
        assert isinstance(bytes(r["frame_bytes"]), bytes)


def test_frame_sample_matches_scalar_reference(spark):
    """The vectorized sampler must be byte-identical to the original
    per-row/per-frame loop (python-slice clamp semantics included — blobs
    shorter than their frame count yield empty trailing frames)."""
    import numpy as np
    from candidategeneration_spark.mmops import _fake_meta, frame_sample
    rng = np.random.default_rng(7)
    rows = [(i, bytes(rng.integers(0, 256, size=int(n), dtype=np.uint8)))
            for i, n in enumerate([0, 1, 3, 17, 256, 1024, 5000])]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {(r["doc_id"], r["frame_idx"]): bytes(r["frame_bytes"])
           for r in frame_sample(df, every=3).collect()}
    want = {}
    for did, blob in rows:
        n = len(blob)
        _, _, nf = _fake_meta(np.array([n], dtype=np.int64))
        nf = int(nf[0])
        step = max(1, n // nf) if nf else 1
        for i in range(0, nf, 3):
            want[(did, i)] = blob[i * step:(i + 1) * step]
    assert got == want
