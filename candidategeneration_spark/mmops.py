"""Multimodal binary-column plumbing.

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` kernels. The decode
step itself is STUBBED (no image/audio libraries in this container): a
deterministic fake decoder derives metadata from the byte stream, and
``decode_image_real`` raises NotImplementedError with the intended
integration point. The Spark-side plumbing — schema, batching, UDF
signature, partition behavior — is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def with_fake_payload(docs: DataFrame) -> DataFrame:
    """Derive a binary 'payload' column (UTF-8 bytes of text) standing in
    for an image/audio blob; real pipelines read it from Parquet/Iceberg."""
    return docs.withColumn("payload", F.encode(F.col("text"), "utf-8"))


def decode_image_real(blob: bytes):
    """Integration point for a real decoder (PIL/libvips/ffmpeg).

    Not available in this environment — the fake decoder below keeps the
    pipeline executable and deterministic."""
    raise NotImplementedError(
        "real image decode requires an imaging library; plug PIL/pyvips "
        "here and return (width, height, channels, pixels)")


def _fake_meta(n_bytes: np.ndarray):
    """Deterministic fake decode: metadata as pure int functions of size."""
    width = n_bytes % 640 + 1
    height = (n_bytes * 7) % 480 + 1
    n_frames = n_bytes % 30 + 1
    return width, height, n_frames


def extract_metadata(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bytes, width, height, n_frames) via Arrow batches."""
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col)
                     .alias("payload"))

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).to_numpy(np.int64)
            w, h, f = _fake_meta(n_bytes)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "n_bytes": n_bytes, "width": w, "height": h,
                "n_frames": f})

    return cols.mapInPandas(
        meta,
        schema="doc_id long, n_bytes long, width long, height long,"
               " n_frames long")


def byte_histogram_features(df: DataFrame, bins: int = 16,
                            payload_col: str = "payload",
                            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, bin, cnt) integer byte-value histogram rows (nonzero bins
    only) — the feature-extraction stage of a multimodal pipeline with the
    decoder stubbed (a real pipeline histograms pixels/spectrogram cells
    instead of raw bytes; swap the kernel, the Spark plumbing is identical).

    Round-2 shape change: the former ``array<double>`` normalized output
    was uncheckable (driver canonicalizer can't hash array columns, and
    float ratios aren't cross-engine stable); exploded int64 rows are both
    — normalize downstream with ``cnt / sum(cnt) over (partition by
    doc_id)`` if ratios are needed. Fully vectorized: ONE ``np.bincount``
    over the concatenated batch keyed by doc×bin. Bin indices are clipped
    to bins-1 so non-power-of-two ``bins`` can't overflow the bin range."""
    cols = df.select(F.col(id_col).alias("doc_id"),
                     F.col(payload_col).alias("payload"))
    shift = 8 - (bins - 1).bit_length()

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ids = pdf["doc_id"].to_numpy(np.int64)
            blobs = [bytes(b) for b in pdf["payload"]]
            lens = np.array([len(b) for b in blobs], dtype=np.int64)
            if lens.sum() == 0:
                yield pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                    "bin": pd.Series([], dtype=np.int64),
                                    "cnt": pd.Series([], dtype=np.int64)})
                continue
            flat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            binv = np.minimum(flat >> shift, bins - 1).astype(np.int64)
            keys = doc_idx * bins + binv
            counts = np.bincount(keys, minlength=n * bins)
            nz = np.flatnonzero(counts)
            yield pd.DataFrame({
                "doc_id": ids[nz // bins],
                "bin": (nz % bins).astype(np.int64),
                "cnt": counts[nz].astype(np.int64)})

    return cols.mapInPandas(feats, schema="doc_id long, bin long, cnt long")


def frame_sample(df: DataFrame, every: int = 10,
                 payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, frame_idx, frame_bytes): deterministic fake frame sampler —
    slices the blob into `n_frames` chunks and keeps every ``every``-th.
    Shows the 1→N explode shape real video sampling has; the chunk content
    stands in for decoded frames."""
    cols = df.select(F.col(id_col).alias("doc_id"),
                     F.col(payload_col).alias("payload"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # vectorized (round 3 — was a per-row/per-frame Python loop): all
        # frame coordinates come from NumPy; the only Python-level work
        # left is materializing each frame's bytes object, which the
        # binary output type requires.
        for pdf in batches:
            blobs = [bytes(b) for b in pdf["payload"]]
            lens = np.array([len(b) for b in blobs], dtype=np.int64)
            if not len(blobs):
                yield pd.DataFrame({"doc_id": [], "frame_idx": [],
                                    "frame_bytes": []})
                continue
            _, _, n_frames = _fake_meta(lens)
            n_frames = n_frames.astype(np.int64)
            steps = np.maximum(1, lens // np.maximum(n_frames, 1))
            kept = (n_frames + every - 1) // every
            doc_sel = np.repeat(np.arange(len(blobs), dtype=np.int64), kept)
            starts = np.concatenate(([0], np.cumsum(kept)[:-1]))
            fidx = (np.arange(doc_sel.shape[0], dtype=np.int64)
                    - starts[doc_sel]) * every
            doc_off = np.concatenate(([0], np.cumsum(lens)[:-1]))
            # python-slice clamping semantics: both ends min'd to the blob
            b0 = doc_off[doc_sel] + np.minimum(fidx * steps[doc_sel],
                                               lens[doc_sel])
            b1 = doc_off[doc_sel] + np.minimum((fidx + 1) * steps[doc_sel],
                                               lens[doc_sel])
            flat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            ids = pdf["doc_id"].to_numpy(np.int64)
            yield pd.DataFrame({
                "doc_id": ids[doc_sel],
                "frame_idx": fidx,
                "frame_bytes": [flat[a:b].tobytes()
                                for a, b in zip(b0, b1)]})

    return cols.mapInPandas(
        sample, schema="doc_id long, frame_idx long, frame_bytes binary")


def frame_sample_stats(df: DataFrame, every: int = 10,
                       payload_col: str = "payload",
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_id, frame_idx, n_bytes, byte_sum): integer projection of
    :func:`frame_sample` output for oracle checking — binary frame content
    reduced to length + byte checksum (both deterministic ints), computed
    in one vectorized pass over the sampled frames."""
    frames = frame_sample(df, every=every, payload_col=payload_col,
                          id_col=id_col)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(b) for b in pdf["frame_bytes"]]
            lens = np.array([len(b) for b in blobs], dtype=np.int64)
            flat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            sums = np.zeros(len(blobs), dtype=np.int64)
            if flat.shape[0]:
                idx = np.repeat(np.arange(len(blobs), dtype=np.int64), lens)
                np.add.at(sums, idx, flat.astype(np.int64))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "frame_idx": pdf["frame_idx"].to_numpy(np.int64),
                "n_bytes": lens, "byte_sum": sums})

    return frames.mapInPandas(
        stats,
        schema="doc_id long, frame_idx long, n_bytes long, byte_sum long")
