"""The batch-vectorized pair kernel (round-5 close) must be byte-identical
to the per-doc reference loop it replaced — same rows, same ORDER (gate
hashes and segment encodes consume this order downstream).

The reference twin below is the retired per-doc implementation verbatim
(modulo the validation it shares with the kernel); both the uniform-vocab
shape (low pair duplication — exercises the per-row concat branch) and the
zipf shape (high duplication — exercises the distinct-vocab-pair concat +
gather branch) are covered, plus empty/1-token/all-duplicate-token docs.
No Spark session needed — this is the pure-NumPy Arrow-batch kernel.
"""

import numpy as np
import pandas as pd

from candidategeneration_spark.build import PAIR_SEP, _pair_rows_scored


def _reference_pair_rows(pdf: pd.DataFrame, distance: int) -> pd.DataFrame:
    out_t, out_d, out_s1, out_s2 = [], [], [], []
    for did, ts, terms, scores in zip(
            pdf["doc_id"].to_numpy(np.int64), pdf["__toks"],
            pdf["__terms"], pdf["__scores"]):
        n = len(ts)
        if n < 2:
            continue
        tsorted = np.asarray(terms, dtype=str)
        k = tsorted.shape[0]
        tok_ids = np.searchsorted(tsorted, np.asarray(ts, dtype=str))
        lefts, rights = [], []
        for s in range(1, min(distance, n - 1) + 1):
            lefts.append(tok_ids[:-s])
            rights.append(tok_ids[s:])
        a = np.concatenate(lefts)
        b = np.concatenate(rights)
        neq = a != b
        a, b = a[neq], b[neq]
        if a.shape[0] == 0:
            continue
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        keys = np.unique(lo * k + hi)
        lo_u = keys // k
        hi_u = keys % k
        svals = np.asarray(scores, dtype=np.int64)
        out_t.append(np.fromiter(
            (x + PAIR_SEP + y for x, y in
             zip(tsorted[lo_u].tolist(), tsorted[hi_u].tolist())),
            dtype=object, count=keys.shape[0]))
        out_d.append(np.full(keys.shape[0], did, np.int64))
        out_s1.append(svals[lo_u])
        out_s2.append(svals[hi_u])
    if not out_t:
        return pd.DataFrame({
            "term": pd.Series([], dtype=object),
            "doc_id": pd.Series([], dtype=np.int64),
            "tf": pd.Series([], dtype=np.int64),
            "s1": pd.Series([], dtype=np.int64),
            "s2": pd.Series([], dtype=np.int64),
            "score_q": pd.Series([], dtype=np.int64)})
    s1 = np.concatenate(out_s1)
    s2 = np.concatenate(out_s2)
    return pd.DataFrame({
        "term": np.concatenate(out_t).astype(object),
        "doc_id": np.concatenate(out_d),
        "tf": np.ones(s1.shape[0], np.int64),
        "s1": s1, "s2": s2, "score_q": s1 + s2})


def _batch(r: np.random.Generator, n_docs: int, vocab_size: int,
           max_len: int, zipf: bool) -> pd.DataFrame:
    vocab = np.array([f"w{i:05d}" for i in range(vocab_size)], dtype=object)
    if zipf:
        p = 1.0 / np.arange(1, vocab_size + 1, dtype=np.float64) ** 1.1
        cum = np.cumsum(p / p.sum())
    rows = []
    for i in range(n_docs):
        n = int(r.integers(0, max_len))
        if zipf:
            ts = vocab[np.searchsorted(cum, r.random(n))]
        else:
            ts = vocab[r.integers(0, vocab_size, n)]
        uniq = np.unique(ts.astype(str)).astype(object)
        scores = r.integers(-10_000_000, 10_000_000,
                            uniq.shape[0]).astype(np.int64)
        rows.append((1000 + i * 7, ts, uniq, scores))
    return pd.DataFrame(rows, columns=["doc_id", "__toks", "__terms",
                                       "__scores"])


def test_batch_kernel_matches_per_doc_reference():
    for trial in range(40):
        r = np.random.default_rng(6000 + trial)
        pdf = _batch(r, int(r.integers(1, 30)), int(r.integers(2, 50)),
                     int(r.integers(1, 40)), zipf=bool(trial % 2))
        dist = int(r.integers(1, 8))
        got = _pair_rows_scored(pdf, dist).reset_index(drop=True)
        exp = _reference_pair_rows(pdf, dist).reset_index(drop=True)
        assert got.equals(exp), (trial, dist, len(got), len(exp))


def test_batch_kernel_edge_docs():
    # empty doc, 1-token doc, all-one-token doc (pairs a==b only -> none),
    # and a doc long enough that distance > n-1 windows truncate
    w = np.array(["aa", "bb", "cc"], dtype=object)
    pdf = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
        "__toks": [np.array([], dtype=object),
                   np.array(["aa"], dtype=object),
                   np.array(["bb", "bb", "bb"], dtype=object),
                   np.array(["aa", "cc"], dtype=object)],
        "__terms": [np.array([], dtype=object), w[:1].copy(),
                    w[1:2].copy(), np.array(["aa", "cc"], dtype=object)],
        "__scores": [np.array([], dtype=np.int64),
                     np.array([5], dtype=np.int64),
                     np.array([7], dtype=np.int64),
                     np.array([3, 9], dtype=np.int64)],
    })
    got = _pair_rows_scored(pdf, 5).reset_index(drop=True)
    exp = _reference_pair_rows(pdf, 5).reset_index(drop=True)
    assert got.equals(exp)
    assert len(got) == 1
    assert got["term"][0] == "aa" + PAIR_SEP + "cc"
    assert int(got["score_q"][0]) == 12


def test_batch_kernel_missing_token_raises():
    # a token absent from the score map must raise (filtered map misuse)
    pdf = pd.DataFrame({
        "doc_id": np.array([1], dtype=np.int64),
        "__toks": [np.array(["aa", "zz"], dtype=object)],
        "__terms": [np.array(["aa"], dtype=object)],
        "__scores": [np.array([5], dtype=np.int64)],
    })
    try:
        _pair_rows_scored(pdf, 5)
    except ValueError as e:
        assert "unfiltered" in str(e)
    else:
        raise AssertionError("filtered score map did not raise")
