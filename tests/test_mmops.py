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
    assert len(rows) == len(texts)
    for r in rows:
        b = np.frombuffer(texts[r["doc_id"]].encode(), np.uint8)
        h = np.bincount(b >> 4, minlength=16).astype(np.float64)
        h = h / h.sum() if h.sum() else h
        assert np.allclose(np.array(r["features"]), h)
        assert abs(sum(r["features"]) - 1.0) < 1e-9


def test_frame_sample_shape(spark, docs_sf001):
    docs = mmops.with_fake_payload(docs_sf001.limit(10))
    rows = mmops.frame_sample(docs).collect()
    assert rows, "sampler produced no frames"
    for r in rows:
        assert r["frame_idx"] % 10 == 0  # every=10 default
        assert isinstance(bytes(r["frame_bytes"]), bytes)
