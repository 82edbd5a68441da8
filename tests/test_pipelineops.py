"""Unit tests for the training-data pipeline family (pipelineops.py).

The driver-mirror gate (test_entry_contract.py) checks each op against its
DuckDB oracle on sf0.01; these tests pin the *semantics* on hand-built
corpora where expected outputs are enumerable by eye or by a brute-force
reference loop.
"""

import numpy as np
import pytest

from candidategeneration_spark import pipelineops as P


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------

def test_decontaminate_whole_token_phrases(spark):
    docs = _docs(spark, [
        (0, "merge sort is stable"),          # contains "merge sort"
        (1, "mergesort is one word"),         # must NOT match inside token
        (2, "we sort then merge"),            # wrong order -> no match
        (3, "a merge sort and merge sort"),   # two hits still = one row
        (4, ""),
    ])
    phrases = spark.createDataFrame(
        [(0, "merge sort"), (1, "stable")], "qid long, phrase string")
    got = {(r["qid"], r["doc_id"])
           for r in P.decontaminate(docs, phrases).collect()}
    assert got == {(0, 0), (0, 3), (1, 0)}


# ---------------------------------------------------------------------------
# pii_scrub
# ---------------------------------------------------------------------------

def test_pii_scrub_counts_and_redaction(spark):
    hex32 = "0123456789abcdef0123456789abcdef"
    docs = _docs(spark, [
        (0, "mail me at bob.smith+x@corp.example.com thanks"),
        (1, f"token {hex32} and acct 123456789012 end"),
        (2, "short num 12345678 and short hex deadbeef stay"),
        (3, "a@b.cd plus key deadbeefdeadbeef0042"),
    ])
    rows = {r["doc_id"]: r for r in P.pii_scrub(docs).collect()}
    assert (rows[0]["n_email"], rows[0]["n_hex"], rows[0]["n_num"]) == (1, 0, 0)
    assert (rows[1]["n_email"], rows[1]["n_hex"], rows[1]["n_num"]) == (0, 1, 1)
    # below-threshold runs are kept
    assert (rows[2]["n_email"], rows[2]["n_hex"], rows[2]["n_num"]) == (0, 0, 0)
    # 20-char hex id matches \b[0-9a-f]{16,}\b; a@b.cd is a valid email
    assert (rows[3]["n_email"], rows[3]["n_hex"], rows[3]["n_num"]) == (1, 1, 0)
    # the md5 pins the replacement bytes exactly
    import hashlib
    want = hashlib.md5(
        b"mail me at <EMAIL> thanks").hexdigest()
    assert rows[0]["scrub_md5"] == want


# ---------------------------------------------------------------------------
# sample_split
# ---------------------------------------------------------------------------

def test_sample_split_exact_quotas_and_determinism(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = P.sample_split(docs).toPandas()
    for stratum, grp in out.groupby("stratum"):
        n = len(grp)
        counts = grp["split"].value_counts().to_dict()
        n_train = sum(1 for rn in range(1, n + 1) if rn * 1000 <= n * 800)
        n_val = sum(1 for rn in range(1, n + 1)
                    if n * 800 < rn * 1000 <= n * 900)
        assert counts.get("train", 0) == n_train
        assert counts.get("val", 0) == n_val
        assert counts.get("test", 0) == n - n_train - n_val
    # deterministic: a second run assigns identical splits
    out2 = P.sample_split(docs).toPandas()
    m = out.set_index("doc_id")["split"]
    m2 = out2.set_index("doc_id")["split"]
    assert m.sort_index().equals(m2.sort_index())


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------

def _greedy_ref(lens, cap):
    """Row-at-a-time reference greedy (the oracle CTE's exact recurrence):
    every doc after the bucket's first starts a new sequence iff adding it
    would overflow; the first doc always opens sequence 0."""
    seq, off, s, fill = [], [], 0, 0
    for i, ln in enumerate(lens):
        if i > 0 and fill + ln > cap:
            s, fill = s + 1, 0
        seq.append(s)
        off.append(fill)
        fill += ln
    return seq, off


def test_pack_sequences_matches_reference_greedy(spark):
    rng = np.random.default_rng(7)
    rows = [(int(i), "tok " * int(rng.integers(0, 60)))
            for i in range(300)]
    docs = _docs(spark, rows)
    out = (P.pack_sequences(docs, cap=100, n_buckets=4)
           .toPandas().sort_values(["bucket", "doc_id"]))
    for bucket, grp in out.groupby("bucket"):
        seq, off = _greedy_ref(grp["n_tokens"].tolist(), 100)
        assert grp["seq"].tolist() == seq, f"bucket {bucket}"
        assert grp["off"].tolist() == off, f"bucket {bucket}"
        # invariant: every sequence fits the cap unless it is a singleton
        for sq, g in grp.groupby("seq"):
            assert g["n_tokens"].sum() <= 100 or len(g) == 1


def test_pack_sequences_oversize_doc_is_singleton(spark):
    docs = _docs(spark, [
        (0, "a1 " * 50), (4, "b1 " * 300), (8, "c1 " * 50), (12, "d1 " * 60)])
    out = (P.pack_sequences(docs, cap=100, n_buckets=1)
           .toPandas().sort_values("doc_id"))
    # the 300-token doc is a singleton sequence; the next sequence starts
    # fresh, and 50 + 60 > 100 so docs 8 and 12 do not share either
    assert out["seq"].tolist() == [0, 1, 2, 3]
    assert out["off"].tolist() == [0, 0, 0, 0]


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------

def test_repetition_stats_hand_case(spark):
    docs = _docs(spark, [
        (0, "ab cd ab cd ab"),   # bigrams: ab-cd x2, cd-ab x2 -> all dup
        (1, "aa bb cc dd"),      # 3 bigrams, all unique
        (2, "xx"),               # <2 tokens -> zeros
        (3, ""),
    ])
    rows = {r["doc_id"]: r for r in P.repetition_stats(docs).collect()}
    assert (rows[0]["n_bigrams"], rows[0]["n_dup"]) == (4, 4)
    assert rows[0]["dup_frac_q"] == 1_000_000
    assert (rows[1]["n_bigrams"], rows[1]["n_dup"]) == (3, 0)
    assert rows[1]["dup_frac_q"] == 0
    assert (rows[2]["n_bigrams"], rows[2]["dup_frac_q"]) == (0, 0)
    assert (rows[3]["n_bigrams"], rows[3]["dup_frac_q"]) == (0, 0)


# ---------------------------------------------------------------------------
# plan shape: the phrase side broadcasts; packing shuffles once on bucket
# ---------------------------------------------------------------------------

def test_decontaminate_null_phrase_rows_are_ignored(spark):
    """A NULL phrase can never match a document; it must be dropped, not
    TypeError the driver-side length partitioning (the old Spark-side
    plen filters rejected NULL under three-valued logic)."""
    import candidategeneration_spark.pipelineops as P
    docs = spark.createDataFrame(
        [(0, "keep this clean document"), (1, "the secret phrase here")],
        "doc_id long, text string")
    phrases = spark.createDataFrame(
        [(0, "secret phrase"), (1, None)], "qid long, phrase string")
    got = {(r["qid"], r["doc_id"])
           for r in P.decontaminate(docs, phrases).collect()}
    assert got == {(0, 1)}  # the NULL phrase matched nothing, crashed nothing


def test_decontaminate_broadcasts_phrases(spark):
    """Round 4: the phrase prefilter must be an equi (hash) join on the
    gram key — a BroadcastNestedLoopJoin would be O(docs × phrases)."""
    docs = _docs(spark, [(0, "a1 b1"), (1, "b1 c1")])
    phrases = spark.createDataFrame([(0, "a1 b1")], "qid long, phrase string")
    plan = P.decontaminate(docs, phrases)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_decontaminate_long_phrases_verify_path(spark):
    """Phrases >= DECON_PREFIX_K tokens take the k-gram prefilter + exact
    verify path; a doc sharing only the phrase's first k-gram (prefilter
    hit) must be rejected by the verify step."""
    k = P.DECON_PREFIX_K
    phrase = " ".join(f"t{i}" for i in range(k + 2))        # 6 tokens
    prefix_only = " ".join(f"t{i}" for i in range(k))        # first k only
    docs = _docs(spark, [
        (0, f"intro {phrase} outro"),          # full match
        (1, f"xx {prefix_only} yy zz"),        # prefilter hit, verify miss
        (2, "nothing shared here at all"),
        (3, phrase),                            # exact doc == phrase
    ])
    phrases = spark.createDataFrame([(7, phrase)], "qid long, phrase string")
    got = {(r["qid"], r["doc_id"])
           for r in P.decontaminate(docs, phrases).collect()}
    assert got == {(7, 0), (7, 3)}
    plan = P.decontaminate(docs, phrases)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_sample_split_null_stratum_is_a_group(spark):
    """SQL window semantics: a NULL stratum is its own group (DuckDB's
    PARTITION BY treats NULLs as one partition) — the two-stage rank must
    not drop or crash on it."""
    rows = [(i, None if i % 4 == 0 else "en") for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = P.sample_split(docs, num_partitions=8).toPandas()
    assert len(out) == 80
    null_grp = out[out["stratum"].isna()]
    assert len(null_grp) == 20
    counts = null_grp["split"].value_counts().to_dict()
    assert counts == {"train": 16, "val": 2, "test": 2}


def test_sample_split_no_stratum_window(spark):
    """Round 4 skew fix: a 95%-one-stratum corpus must not funnel through
    a stratum-partitioned Window (one task holding the giant stratum).
    The two-stage plan has no Window operator at all, and the result is
    byte-identical to the window definition."""
    import pandas as pd
    from candidategeneration_spark.textops import MH_MULT, MH_PRIME

    rows = [(i, "en" if i % 20 else "de") for i in range(1000)]  # 95% en
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = P.sample_split(docs, num_partitions=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    got = out.toPandas().sort_values("doc_id").reset_index(drop=True)
    # reference: the window definition, computed in pandas with int64
    ref = pd.DataFrame(rows, columns=["doc_id", "stratum"])
    ref["h"] = (ref["doc_id"] * MH_MULT) % MH_PRIME
    ref = ref.sort_values(["stratum", "h", "doc_id"])
    ref["rn"] = ref.groupby("stratum").cumcount() + 1
    ref["n"] = ref.groupby("stratum")["doc_id"].transform("size")
    ref["split"] = "test"
    ref.loc[ref["rn"] * 1000 <= ref["n"] * P.SPLIT_VAL_PM, "split"] = "val"
    ref.loc[ref["rn"] * 1000 <= ref["n"] * P.SPLIT_TRAIN_PM, "split"] = "train"
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    assert got["split"].tolist() == ref["split"].tolist()
    assert got["h"].tolist() == ref["h"].tolist()


def test_pack_sequences_single_shuffle(spark):
    docs = _docs(spark, [(i, "tok tok") for i in range(20)])
    plan = P.pack_sequences(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") <= 1 + plan.count("AQEShuffleRead"), plan


# ---------------------------------------------------------------------------
# lm_doc_scores
# ---------------------------------------------------------------------------

def test_lm_doc_scores_hand_case(spark):
    """4-token corpus: cf(aa)=3, cf(bb)=1, total=4. Doc 0 = 'aa aa aa'
    (typical language, low NLL), doc 1 = 'bb' (rare, high NLL), doc 2
    empty. Quantization replayed with the same math.log."""
    import math
    docs = _docs(spark, [(0, "aa aa aa"), (1, "bb"), (2, "")])
    rows = {r["doc_id"]: r for r in P.lm_doc_scores(docs).collect()}
    lp_aa = math.floor(P.LM_LOG_SCALE * math.log(3 / 4))
    lp_bb = math.floor(P.LM_LOG_SCALE * math.log(1 / 4))
    assert rows[0]["n_tokens"] == 3
    assert rows[0]["nll_q"] == (3 * -lp_aa) // 3
    assert rows[1]["nll_q"] == -lp_bb
    assert rows[0]["nll_q"] < rows[1]["nll_q"]  # rare text scores worse
    assert (rows[2]["n_tokens"], rows[2]["nll_q"]) == (0, 0)


# ---------------------------------------------------------------------------
# duplicate_spans
# ---------------------------------------------------------------------------

def test_duplicate_spans_interval_union(spark):
    """Two docs share a 6-token passage; with k=4 that passage yields 3
    duplicated windows per doc whose UNION covers exactly 6 tokens —
    overlap must not be double counted. A third doc shares nothing."""
    shared = "aa bb cc dd ee ff"
    rows = [
        (1, f"{shared} x1 y1 z1 w1"),
        (2, f"p2 q2 {shared} r2 s2"),
        (3, "u3 v3 w3 x3 y3 z3 a3 b3 c3 d3"),
    ]
    out = {r["doc_id"]: r for r in
           P.duplicate_spans(_docs(spark, rows), k=4).collect()}
    # doc 1: 10 tokens -> 7 windows; duplicated windows start at 1,2,3
    assert out[1]["n_windows"] == 7
    assert out[1]["n_dup_windows"] == 3
    assert out[1]["dup_cov_q"] == 1_000_000 * 6 // 10
    # doc 2: same three windows shifted by the 2-token prefix
    assert out[2]["n_dup_windows"] == 3
    assert out[2]["dup_cov_q"] == 1_000_000 * 6 // 10
    # doc 3: clean
    assert out[3]["n_dup_windows"] == 0 and out[3]["dup_cov_q"] == 0


def test_duplicate_spans_short_doc_and_full_dup(spark):
    """Docs shorter than k produce zero windows (not a negative range);
    two identical docs are 100% covered."""
    rows = [(1, "a b"), (2, "m1 m2 m3 m4 m5"), (3, "m1 m2 m3 m4 m5")]
    out = {r["doc_id"]: r for r in
           P.duplicate_spans(_docs(spark, rows), k=4).collect()}
    assert out[1]["n_windows"] == 0 and out[1]["dup_cov_q"] == 0
    assert out[2]["n_dup_windows"] == 2  # windows at pos 1, 2
    assert out[2]["dup_cov_q"] == 1_000_000  # union covers all 5 tokens
    assert out[3]["dup_cov_q"] == 1_000_000


def test_duplicate_spans_matches_python_oracle(spark):
    """Randomized cross-check: duplicate_spans vs a brute-force pure-
    Python implementation of the same semantics (tokenize contract,
    cross-doc window df, interval union)."""
    import random
    import re

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(40):
        n = rng.randint(0, 25)
        words = [vocab[rng.randrange(len(vocab))] for _ in range(n)]
        rows.append((d, " ".join(words)))
    k = 3

    def tokenize(text):
        t = re.sub(r"[^a-zA-Z0-9.]", " ", text).lower().strip()
        return [x for x in re.split(r"\s+", t) if len(x) >= 2] if t else []

    toks = {d: tokenize(t) for d, t in rows}
    wins = {}  # gram -> set of doc_ids
    per_doc = {d: [] for d, _ in rows}
    for d, ts in toks.items():
        for i in range(len(ts) - k + 1):
            g = " ".join(ts[i:i + k])
            wins.setdefault(g, set()).add(d)
            per_doc[d].append((i + 1, g))
    expected = {}
    for d, ts in toks.items():
        dup_pos = sorted(p for p, g in per_doc[d] if len(wins[g]) >= 2)
        covered = 0
        for j, p in enumerate(dup_pos):
            nxt = dup_pos[j + 1] if j + 1 < len(dup_pos) else None
            covered += min(k, nxt - p) if nxt is not None else k
        n_tok = len(ts)
        expected[d] = (max(n_tok - k + 1, 0), len(dup_pos),
                       1_000_000 * covered // n_tok if n_tok else 0)

    got = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_cov_q"])
           for r in P.duplicate_spans(_docs(spark, rows), k=k).collect()}
    assert got == expected
