"""Index build pipeline: corpus → postings → stats → compressed segments.

Spark-first re-expression of the reference's 4-phase offline builder
(``WWWMain.java:50-199``): its per-thread buffers, sorted dump files and
k-way external merge (``InvertedIndex.java:264-498``, ``ExternalSort.java``)
are replaced wholesale by one shuffle — ``groupBy(term).applyInPandas`` —
whose sort-based exchange does the external merge with spill for free.

Lifecycle (SURVEY.md §3.1):

    read corpus → mapInPandas(tokenize + per-doc tf [+ d-bigram])   [Arrow]
    → join per-term df (shuffle on term)
    → quantized BM25 per posting (JVM column math)
    → groupBy(term).applyInPandas(sort by docID, delta+VByte, block-max)
    → segments DataFrame / Parquet

Skew (north rule): hot d-bigrams (e.g. ``def __init__`` at 10^12-file scale)
overload a single ``applyInPandas`` group. ``build_segments`` supports a
salted two-stage aggregation: stage 1 groups on (term, salt=doc_id%S) and
emits sorted partial runs; stage 2 merges the ≤S runs per term. Because
stage-1 groups are bounded at df/S postings, no single task sees a whole hot
list. The reference has no skew handling at all (fixed 4 shards).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from . import indexcodec
from .bm25 import avgdl_floor, bm25_quantized_col, idf_col
from .tokenizer import DBIGRAM_DISTANCE, tokenize_pandas, tokens_col

PAIR_SEP = "\x1f"  # string analogue of the reference's a<<32|b long packing
                   # (``WWW.java:432-440``) for our string-keyed terms

# Stage-sizing targets (round 4: the unigram fast path had drifted 52k→39k
# postings/s across three rounds; profiling showed the cost was pure Spark
# orchestration, not kernel CPU — a single-file corpus tokenized on ONE
# task, and the encode shuffle fixed at 4×cores partitions regardless of
# volume, paying ~15 ms of mapInPandas overhead per mostly-EMPTY task at
# small scale). Both knobs size stages by measured kernel throughput and
# are inert at 100 TB (inputs arrive with ≥cores partitions; the encode
# partition count is capped at 4×cores as before):
DOCS_PER_TOKENIZE_TASK = 512       # ~30 ms of Arrow tokenize+tf per task
POSTINGS_PER_ENCODE_TASK = 16_384  # ~35 ms of vectorized encode per task
# Pair-pass kernel parallelism (round 5): the per-doc-map join that feeds
# _pair_rows_scored is a SMALL shuffle at bench scale, so AQE coalesces
# its output to ONE partition — the entire pair kernel (the single most
# expensive CPU stage of the build, ~6 µs/token) then runs on one task.
# The kernel width (token volume / this target, ~50 ms of kernel per
# task, capped at 4×cores) is carried by the join's OWN input exchanges
# (_pair_join: both sides hash-repartitioned by doc_id at that count, so
# the join reuses the partitioning and AQE leaves it alone) — no extra
# shuffle at any scale.
TOKENS_PER_PAIR_TASK = 8_192
# build_segments sizes from an UPPER BOUND (distance × total tokens,
# ~1.5-2× the deduped pair count) and pair rows are ~2× heavier than
# unigram rows, so its divisor is 4× the exact-count target; measured
# sweep at sf0.1 (830k pair rows): 87 parts 2.75 s → 44 ≈1.8 s →
# 32 1.41 s → 16 1.31 s, with 4×cores still the skew-safety cap.
HINTED_POSTINGS_PER_ENCODE_TASK = 65_536

POSTINGS_SCHEMA = StructType([
    StructField("term", StringType()),
    StructField("doc_id", LongType()),
    StructField("tf", LongType()),
    StructField("doc_len", LongType()),
    StructField("maxtf", LongType()),
])

SEGMENT_SCHEMA = StructType([
    StructField("term", StringType()),
    StructField("df", LongType()),
    StructField("n_blocks", IntegerType()),
    StructField("did_blob", BinaryType()),
    StructField("score_blob", BinaryType()),
    StructField("tf_blob", BinaryType()),
    StructField("block_last", ArrayType(LongType())),
    StructField("block_max", ArrayType(LongType())),
    StructField("block_n", ArrayType(LongType())),
    StructField("did_off", ArrayType(LongType())),
    StructField("score_off", ArrayType(LongType())),
    StructField("tf_off", ArrayType(LongType())),
])

_RUN_SCHEMA = StructType([
    StructField("term", StringType()),
    StructField("doc_ids", ArrayType(LongType())),
    StructField("scores", ArrayType(LongType())),
    StructField("tfs", ArrayType(LongType())),
])

TOKENS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("toks", ArrayType(StringType())),
])


# --------------------------------------------------------------------------
# Phase 1 — tokenize + per-doc tf (+ optional d-bigram) in one Arrow pass
# --------------------------------------------------------------------------

def _explode_tf(pdf: pd.DataFrame, id_col: str, text_col: str,
                dbigram_distance: int | None,
                stopwords=None) -> pd.DataFrame:
    toks = tokenize_pandas(pdf[text_col], stopwords)
    return _explode_tf_from_toks(pdf[id_col], toks, dbigram_distance)


def _explode_tf_from_toks(ids, toks: pd.Series,
                          dbigram_distance: int | None) -> pd.DataFrame:
    """Pre-tokenized twin of :func:`_explode_tf` — the kernel both the
    text path and the tokenize-once path (:func:`tokenize_docs`) share."""
    lens = toks.map(len).to_numpy(dtype=np.int64)
    doc_ids = np.asarray(ids, dtype=np.int64)
    if lens.sum() == 0:
        return pd.DataFrame(
            {"term": pd.Series([], dtype=object),
             "doc_id": pd.Series([], dtype=np.int64),
             "tf": pd.Series([], dtype=np.int64),
             "doc_len": pd.Series([], dtype=np.int64),
             "maxtf": pd.Series([], dtype=np.int64)})
    # len() guard (not truthiness): Arrow hands token arrays back as
    # numpy arrays, whose bool() is ambiguous
    flat_terms = np.concatenate(
        [np.asarray(t, dtype=object) for t in toks if len(t)] or
        [np.empty(0, dtype=object)])
    flat_docs = np.repeat(doc_ids, lens)
    edf = pd.DataFrame({"doc_id": flat_docs, "term": flat_terms})
    tf = (edf.groupby(["doc_id", "term"], sort=False)
             .size().rename("tf").reset_index())
    per_doc = tf.groupby("doc_id", sort=False)["tf"].max().rename("maxtf")
    doclen = pd.Series(lens, index=doc_ids, name="doc_len")
    tf = tf.merge(per_doc, left_on="doc_id", right_index=True)
    tf = tf.merge(doclen, left_on="doc_id", right_index=True)
    if dbigram_distance:
        pairs = _dbigram_frame(doc_ids, toks, tf, dbigram_distance)
        tf = pd.concat([tf, pairs], ignore_index=True)
    return tf[["term", "doc_id", "tf", "doc_len", "maxtf"]]


def _dbigram_frame(doc_ids, toks, unigram_tf: pd.DataFrame,
                   distance: int) -> pd.DataFrame:
    """Windowed pair generation, vectorized with shifted array views.

    For shift s in 1..d, pair token[i] with token[i+s]; sort each pair
    ascending; dedup per doc (first-occurrence — order-irrelevant because the
    pair score is the sum of doc-level unigram scores; SURVEY §2.4 A8).
    Emitted rows reuse the postings shape with tf=1 (pair tf is unused by the
    reference scorer: the stored pair score is s(t1)+s(t2),
    ``InvertedIndex.java:302-307``).
    """
    out_docs: list[np.ndarray] = []
    out_pairs: list[np.ndarray] = []
    for did, ts in zip(doc_ids, toks):
        n = len(ts)
        if n < 2:
            continue
        # doc-local integer ids (same trick as _pair_rows_scored): window +
        # dedup on int64 keys, strings only for the deduped output
        uniq_t, tok_ids = np.unique(np.asarray(ts, dtype=str),
                                    return_inverse=True)
        k = uniq_t.shape[0]
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
        keys = np.unique(np.minimum(a, b) * k + np.maximum(a, b))
        lo_t = uniq_t[keys // k].tolist()
        hi_t = uniq_t[keys % k].tolist()
        pairs = np.fromiter((x + PAIR_SEP + y for x, y in zip(lo_t, hi_t)),
                            dtype=object, count=keys.shape[0])
        out_pairs.append(pairs)
        out_docs.append(np.full(len(pairs), did, dtype=np.int64))
    if not out_pairs:
        return pd.DataFrame({"term": pd.Series([], dtype=object),
                             "doc_id": pd.Series([], dtype=np.int64),
                             "tf": pd.Series([], dtype=np.int64),
                             "doc_len": pd.Series([], dtype=np.int64),
                             "maxtf": pd.Series([], dtype=np.int64)})
    pdf = pd.DataFrame({
        "term": np.concatenate(out_pairs),
        "doc_id": np.concatenate(out_docs),
    })
    pdf["tf"] = np.int64(1)
    meta = unigram_tf[["doc_id", "doc_len", "maxtf"]].drop_duplicates("doc_id")
    return pdf.merge(meta, on="doc_id")


def build_postings(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   dbigram_distance: int | None = None,
                   term_filter: DataFrame | None = None,
                   stopwords=None,
                   input_partitions: int | None = None) -> DataFrame:
    """corpus → (term, doc_id, tf, doc_len, maxtf) via one Arrow pass.

    Map-side pre-aggregation: raw tokens never leave the Python worker —
    only per-(doc,term) tf rows hit the shuffle (the analogue of the
    reference's per-doc dedup-before-buffer, ``InvertedIndex.java:291``).

    ``term_filter``: optional DataFrame with a ``term`` column — postings
    are pruned to those terms by broadcast LEFT SEMI join, the Spark form
    of the reference's query-trace filter-set probe during generation
    (``InvertedIndex.java:291``/``374``; SURVEY §2.2 T6 / §2.3 J2). Default
    None = index everything.

    ``input_partitions``: optional target partition count for the tokenize
    pass — a single-file local corpus otherwise tokenizes on ONE task. The
    corpus is repartitioned only UP (never coalesced), so a 100 TB input
    that already arrives with thousands of splits is untouched.
    :func:`build_index` derives the target from n_docs.
    """
    from .config import ensure_on_executors
    ensure_on_executors(docs.sparkSession)
    cols = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       F.col(text_col).alias("__text"))
    if input_partitions is not None and input_partitions > 1 \
            and cols.rdd.getNumPartitions() < input_partitions:
        cols = cols.repartition(input_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _explode_tf(pdf, "doc_id", "__text", dbigram_distance,
                              stopwords)

    out = cols.mapInPandas(gen, schema=POSTINGS_SCHEMA)
    if term_filter is not None:
        out = out.join(F.broadcast(term_filter.select("term").distinct()),
                       "term", "left_semi")
    return out


def tokenize_docs(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", stopwords=None,
                  input_partitions: int | None = None) -> DataFrame:
    """corpus → (doc_id, toks array<string>): the tokenize-ONCE table.

    Round 5: the d-bigram build used to tokenize the corpus twice (once
    for unigram postings, once inside the pair pass — the docstring of
    :func:`build_pair_postings` called CPU cheaper than corpus-sized
    state). Persisting this table instead feeds BOTH stages from one
    Arrow tokenize pass: the pair stage's kernel drops its regex+lower
    work and the raw corpus text is scanned exactly once per build. At
    100 TB the persisted form is the same order as the corpus itself —
    use ``StorageLevel.DISK_ONLY`` / checkpoints.py when it exceeds
    cluster RAM (same guidance as the postings persist).

    Empty documents keep a row with an empty array (token-less docs
    still count in n_docs, ``InvertedIndex.java:171``).
    """
    from .config import ensure_on_executors
    ensure_on_executors(docs.sparkSession)
    cols = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       F.col(text_col).alias("__text"))
    if input_partitions is not None and input_partitions > 1 \
            and cols.rdd.getNumPartitions() < input_partitions:
        cols = cols.repartition(input_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(np.int64),
                 "toks": tokenize_pandas(pdf["__text"], stopwords)})

    return cols.mapInPandas(gen, schema=TOKENS_SCHEMA)


def build_postings_from_tokens(tokens_df: DataFrame,
                               dbigram_distance: int | None = None,
                               term_filter: DataFrame | None = None
                               ) -> DataFrame:
    """:func:`build_postings` over a pre-tokenized (doc_id, toks) table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _explode_tf_from_toks(pdf["doc_id"], pdf["toks"],
                                        dbigram_distance)

    out = tokens_df.select("doc_id", "toks") \
                   .mapInPandas(gen, schema=POSTINGS_SCHEMA)
    if term_filter is not None:
        out = out.join(F.broadcast(term_filter.select("term").distinct()),
                       "term", "left_semi")
    return out


# --------------------------------------------------------------------------
# Phase 2 — global stats + per-term df + quantized BM25
# --------------------------------------------------------------------------

def global_stats(docs: DataFrame, text_col: str = "text",
                 stopwords=None) -> dict:
    """N docs / total kept tokens / floored avgdl (``InvertedIndex.java:171``).

    Counts *all* docs (even token-less ones), like the reference's scan.
    """
    row = docs.select(F.size(tokens_col(F.col(text_col), stopwords))
                      .alias("dl")) \
              .agg(F.count("*").alias("n"), F.sum("dl").alias("tot")) \
              .collect()[0]
    n, tot = int(row["n"]), int(row["tot"] or 0)
    return {"n_docs": n, "total_tokens": tot,
            "avgdl": avgdl_floor(tot, n) if n else 0}


def score_postings(postings: DataFrame, n_docs: int, avgdl: int) -> DataFrame:
    """postings + per-term df → + quantized ``score_q`` (int64).

    The df join shuffles on ``term`` — the same key the segment build groups
    on, so AQE/Catalyst reuses the exchange and the pipeline pays one
    logical repartition by term, not two.

    UNIGRAMS ONLY. The round-1 pair branch here (join the pair table twice
    against scored unigrams) was the build's biggest scale-killer and is
    deleted — pair terms must be scored doc-locally by
    :func:`build_pair_postings` (the pair table is born scored and never
    joins anything). Passing pair rows raises (at the first action that
    evaluates the scored rows) rather than silently taking a two-shuffle
    path no caller should want. The guard is fused into the df aggregate
    as an executor-side ``raise_error`` — round 5: the old eager
    ``pairs.isEmpty()`` probe cost a FULL extra scan job per call exactly
    on the happy path (no match → every partition visited), one per build
    and one per streaming-ingest micro-batch.
    """
    # idf via glibc-log pandas UDF on the tiny per-term table (bm25.idf_col
    # determinism note); the per-posting arithmetic below stays in codegen.
    guard_msg = (
        "score_postings scores unigrams only; score pair terms "
        "doc-locally with build_pair_postings (the legacy pair-join "
        "path was removed — it shuffled the pair table twice)")
    term_df = postings.groupBy("term").agg(F.count("*").alias("df")) \
                      .withColumn("df", F.when(
                          F.col("term").contains(PAIR_SEP),
                          F.raise_error(F.lit(guard_msg)).cast("long"))
                          .otherwise(F.col("df"))) \
                      .withColumn("__idf", idf_col(F.col("df"), n_docs))
    return (
        postings.join(term_df, "term")
                .withColumn("score_q", bm25_quantized_col(
                    F.col("tf"), F.col("maxtf"), F.col("df"),
                    F.col("doc_len"), n_docs, avgdl, idf=F.col("__idf")))
                .drop("__idf")
    )


PAIR_SCORED_SCHEMA = StructType([
    StructField("term", StringType()),
    StructField("doc_id", LongType()),
    StructField("tf", LongType()),
    StructField("s1", LongType()),
    StructField("s2", LongType()),
    StructField("score_q", LongType()),
])


def _pair_rows_scored(pdf: pd.DataFrame, distance: int,
                      stopwords=None) -> pd.DataFrame:
    """One Arrow batch of (doc_id, __text | __toks, __terms sorted,
    __scores aligned) → scored pair postings, all doc-local (no join
    touches the pair table).

    ``__toks`` (pre-tokenized, from :func:`tokenize_docs`) is preferred
    when present — the tokenize-once path; ``__text`` re-tokenizes here
    (the standalone :func:`build_pair_postings` shape).

    ``__terms`` is sorted ascending (Spark ``sort_array``; pure-ASCII tokens
    so JVM and NumPy string orders agree) — each pair side's unigram score
    is a vectorized lookup. s1 belongs to the smaller term of the pair
    (the oracle's t1), s2 to the larger; the stored pair score is s1+s2
    (``InvertedIndex.java:302-307``).

    Round-5 close: the kernel is vectorized across the WHOLE Arrow batch
    (the previous form looped per document — per-doc Python constants and
    a per-doc *string* searchsorted were most of its ~6 µs/token cost).
    One hash factorize maps every term/token string to a sorted-vocab id,
    one int64 searchsorted resolves all tokens against all per-doc score
    maps at once (doc-major keys ``doc·V + vid`` are globally sorted
    because each doc's terms are), the d windows slide over the flattened
    doc-major token array with a doc-boundary mask, and one global
    ``np.unique`` dedups (global term-row ids are doc-disjoint, so the
    global dedup IS the per-doc dedup and its ascending key order
    reproduces the per-doc loop's row order byte-for-byte). Output is
    byte-identical to the per-doc form (differential test); the only
    behavior delta is stricter validation — token-resolution is now
    checked for 1-token docs too, where the loop skipped them before
    pairing (unreachable through the public build paths, which always
    feed unfiltered score maps).
    """
    toks = pdf["__toks"] if "__toks" in pdf.columns \
        else tokenize_pandas(pdf["__text"], stopwords)
    empty = pd.DataFrame({
        "term": pd.Series([], dtype=object),
        "doc_id": pd.Series([], dtype=np.int64),
        "tf": pd.Series([], dtype=np.int64),
        "s1": pd.Series([], dtype=np.int64),
        "s2": pd.Series([], dtype=np.int64),
        "score_q": pd.Series([], dtype=np.int64)})
    n_rows = len(pdf)
    if n_rows == 0:
        return empty
    tok_lens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                           count=n_rows)
    term_lens = np.fromiter((len(t) for t in pdf["__terms"]),
                            dtype=np.int64, count=n_rows)
    n_tok = int(tok_lens.sum())
    n_term = int(term_lens.sum())
    missing_msg = (
        "pair pass: document tokens missing from the per-doc "
        "score map — build_pair_postings needs unfiltered "
        "scored unigrams")
    if n_tok == 0:
        return empty
    if n_term == 0:
        if (tok_lens >= 2).any():
            raise ValueError(missing_msg)
        return empty
    tok_doc = np.repeat(np.arange(n_rows, dtype=np.int64), tok_lens)
    term_doc = np.repeat(np.arange(n_rows, dtype=np.int64), term_lens)
    tok_flat = np.concatenate(
        [np.asarray(t, dtype=object) for t in toks])
    term_flat = np.concatenate(
        [np.asarray(t, dtype=object) for t in pdf["__terms"]])
    score_flat = np.concatenate(
        [np.asarray(s, dtype=np.int64) for s in pdf["__scores"]])
    # sorted-vocab ids via ONE hash factorize over all strings (then only
    # the uniques are sorted) — ~10x cheaper than string searchsorted
    vid, vocab = pd.factorize(np.concatenate([term_flat, tok_flat]),
                              sort=True)
    n_vocab = int(vid.max()) + 1
    term_key = term_doc * n_vocab + vid[:n_term]
    tok_key = tok_doc * n_vocab + vid[n_term:]
    # doc-major keys are globally sorted iff each doc's terms are sorted
    # unique (sort_array + one-row-per-(term,doc) guarantee it); a
    # violation means the caller hand-built the score map — refuse rather
    # than silently mis-pair
    if n_term > 1 and (np.diff(term_key) <= 0).any():
        raise ValueError(
            "pair pass: per-doc score map terms must be sorted and "
            "unique (build_pair_postings builds them with sort_array "
            "over one row per term)")
    pos = np.searchsorted(term_key, tok_key)
    # every token must resolve to its term: scored_uni must be the
    # UNFILTERED unigram postings of the doc (build_index guarantees
    # it; a term_filter'ed set here would silently mis-score pairs)
    if not (term_key[np.minimum(pos, n_term - 1)] == tok_key).all():
        raise ValueError(missing_msg)
    # windowing over the flattened doc-major token stream: positions j
    # and j+s are s apart in the SAME doc exactly when the doc index
    # matches (docs are contiguous), so the per-doc windows of the old
    # loop are one strided compare per distance
    lefts, rights = [], []
    for s in range(1, distance + 1):
        if s >= n_tok:
            break
        same = tok_doc[:-s] == tok_doc[s:]
        lefts.append(pos[:-s][same])
        rights.append(pos[s:][same])
    if not lefts:
        return empty
    a = np.concatenate(lefts)
    b = np.concatenate(rights)
    neq = a != b
    a, b = a[neq], b[neq]
    if a.shape[0] == 0:
        return empty
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    # global term-row ids are doc-disjoint ascending, so one unique both
    # dedups per doc AND orders rows (doc-major, then (lo, hi) in each
    # doc's local term order) exactly like the per-doc loop did.
    # n_term^2 must fit int64: n_term < 3e9 — an Arrow batch is ~10k docs
    # x ~1k distinct terms at the extreme, 5 orders of magnitude under it
    keys = np.unique(lo * n_term + hi)
    lo_u = keys // n_term
    hi_u = keys % n_term
    # pair STRINGS depend only on the vocab pair, and real corpora are
    # zipf (hot pairs recur across many docs) — concat each distinct
    # vocab pair ONCE and gather, instead of one Python concat per output
    # row (the concat was ~2/3 of the kernel). Adaptive: when the batch
    # shows little duplication (adversarial near-uniform vocab draws) the
    # searchsorted+gather overhead exceeds the concat saved, so fall back
    # to per-row concat. Plain-Python concat still beats np.char.add by
    # ~10x per element (no per-call ufunc machinery on strings).
    term_vid = vid[:n_term]
    pkey = term_vid[lo_u] * n_vocab + term_vid[hi_u]
    upk = np.unique(pkey)
    if upk.shape[0] * 5 <= pkey.shape[0] * 4:  # >=1.25x duplication
        vocab_arr = np.asarray(vocab, dtype=object)
        ustr = np.fromiter(
            (x + PAIR_SEP + y for x, y in
             zip(vocab_arr[upk // n_vocab].tolist(),
                 vocab_arr[upk % n_vocab].tolist())),
            dtype=object, count=upk.shape[0])
        terms_out = ustr[np.searchsorted(upk, pkey)]
    else:
        terms_out = np.fromiter(
            (x + PAIR_SEP + y for x, y in
             zip(term_flat[lo_u].tolist(), term_flat[hi_u].tolist())),
            dtype=object, count=keys.shape[0])
    s1 = score_flat[lo_u]
    s2 = score_flat[hi_u]
    return pd.DataFrame({
        "term": terms_out,
        "doc_id": pdf["doc_id"].to_numpy(np.int64)[term_doc[lo_u]],
        "tf": np.ones(s1.shape[0], np.int64),
        "s1": s1, "s2": s2, "score_q": s1 + s2})


def build_pair_postings(docs: DataFrame, scored_uni: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        dbigram_distance: int = DBIGRAM_DISTANCE,
                        stopwords=None,
                        num_partitions: int | None = None) -> DataFrame:
    """Scored d-bigram postings with DOC-LOCAL pair scoring.

    Round-1 scored pairs by joining the pair table TWICE against the scored
    unigram table on (term, doc_id) — two shuffle joins over the largest
    intermediate of the whole build (pair postings ≈ 7× unigrams). The
    reference computes pair scores from an in-memory per-doc score map
    (``InvertedIndex.java:302-307``); this is the Spark shape of that idea:

        scored_uni → groupBy(doc_id) collect (term, score) arrays   [1× uni]
        docs ⋈ per-doc map on doc_id                                [1× corpus]
        mapInPandas: re-tokenize + window pairs + searchsorted score

    (:func:`build_pair_postings_from_tokens` is the tokenize-once twin —
    build_index feeds it the persisted token table so this re-tokenize
    disappears from the end-to-end build.)

    The giant pair table is *born scored* and never joins anything. The two
    shuffles that remain move the unigram-sized map and the corpus — at
    10^12 files that's ~8× less shuffle I/O than shuffling pair postings
    twice. Output carries the SEPARATE component streams (s1, s2) — X2
    parity with the reference's precomputed pair lists
    (``BigramIndex.java:44-85``, ``algo_toplayer.cpp:477-564``).
    """
    from .config import ensure_on_executors
    ensure_on_executors(docs.sparkSession)
    joined = _pair_join(
        docs.select(F.col(id_col).cast("long").alias("doc_id"),
                    F.col(text_col).alias("__text")),
        scored_uni, num_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _pair_rows_scored(pdf, dbigram_distance, stopwords)

    return joined.mapInPandas(gen, schema=PAIR_SCORED_SCHEMA)


def _pair_join(docside: DataFrame, scored_uni: DataFrame,
               num_partitions: int | None) -> DataFrame:
    """docside ⋈ per-doc score map on doc_id, with the pair-kernel
    parallelism carried by the join's OWN exchanges.

    With ``num_partitions`` set, both join inputs are hash-repartitioned
    by (doc_id, num_partitions): the join reuses that partitioning (no
    post-join exchange) and AQE never coalesces an explicit-count user
    repartition, so the kernel runs at exactly ``num_partitions`` tasks.
    An earlier round-5 form repartitioned AFTER the join — a third,
    corpus-sized round-robin shuffle on every d-bigram build; sizing the
    join-input exchanges instead costs nothing extra at any scale (the
    doc-side shuffle and the score-map aggregation exchange must happen
    anyway — they just happen at the kernel's width)."""
    if num_partitions is None:
        return docside.join(_per_doc_score_map(scored_uni), "doc_id")
    # repartition BEFORE the groupBy: the aggregation's clustering
    # requirement is satisfied by the explicit hash partitioning, so the
    # map side pays exactly one exchange, already at the kernel's width
    score_map = _per_doc_score_map(
        scored_uni.repartition(num_partitions, "doc_id"))
    return docside.repartition(num_partitions, "doc_id") \
                  .join(score_map, "doc_id")


def _per_doc_score_map(scored_uni: DataFrame) -> DataFrame:
    """(doc_id, __terms sorted, __scores aligned) — the Spark shape of the
    reference's in-memory per-doc score map (``InvertedIndex.java:302-307``)."""
    return (scored_uni.groupBy("doc_id")
            .agg(F.sort_array(F.collect_list(
                F.struct("term", "score_q"))).alias("__u"))
            .select("doc_id", F.col("__u.term").alias("__terms"),
                    F.col("__u.score_q").alias("__scores")))


def build_pair_postings_from_tokens(tokens_df: DataFrame,
                                    scored_uni: DataFrame,
                                    dbigram_distance: int = DBIGRAM_DISTANCE,
                                    num_partitions: int | None = None
                                    ) -> DataFrame:
    """:func:`build_pair_postings` fed by the tokenize-once table
    (:func:`tokenize_docs`) — the pair kernel skips its re-tokenize and
    reads ``__toks`` straight off the Arrow batch. Same output, same
    doc-local scoring; the joined shuffle moves token arrays instead of
    raw text (comparable bytes — tokens are the text minus punctuation).

    ``num_partitions``: explicit kernel parallelism (see
    TOKENS_PER_PAIR_TASK) — without it AQE coalesces the small join
    output to one task at bench scale and the kernel serializes."""
    from .config import ensure_on_executors
    ensure_on_executors(tokens_df.sparkSession)
    joined = _pair_join(
        tokens_df.select("doc_id", F.col("toks").alias("__toks")),
        scored_uni, num_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _pair_rows_scored(pdf, dbigram_distance)

    return joined.mapInPandas(gen, schema=PAIR_SCORED_SCHEMA)


def pair_needed_terms_prune(scored_uni: DataFrame,
                            pairs: DataFrame) -> DataFrame:
    """The needed-terms prune of the budget pair build: restrict the scored
    unigram table to terms mentioned by ANY candidate pair, as an explicit
    broadcast left-semi join (the distinct pair-term set is tiny next to
    the postings table, so the postings never shuffle for this prune).

    Split out of :func:`build_pair_postings_budget` so the plan can be
    asserted directly (tests/test_plans.py): downstream,
    ``posting_positions`` eagerly ``localCheckpoint``-s its input, which
    truncates lineage — the final pair plan starts from the checkpointed
    scan and no longer SHOWS this join, even though it always runs.
    """
    needed = (pairs.select(F.col("t1").alias("term"))
              .unionByName(pairs.select(F.col("t2").alias("term")))
              .distinct())
    return scored_uni.join(F.broadcast(needed), "term", "left_semi") \
                     .select("term", "doc_id", "score_q")


def build_pair_postings_budget(scored_uni: DataFrame, pairs: DataFrame,
                               budget: int) -> DataFrame:
    """J4 exact variant: pair lists merged from top-``budget`` unigram
    prefixes — the reference's precomputed bigram index construction
    (``BigramIndex.java:44-85``, ``getUnigramTopMap`` ibid. 126-151),
    as opposed to :func:`build_pair_postings`'s exact full-corpus pass.

    Reference semantics, re-expressed:

    1. prefix(t) = the first ``budget`` postings of t's unigram list in
       impact order (score desc, doc_id asc — the stored order of the
       reference's unigram index, ``WWW.java:211-247``;
       ``getUnigramTopMap`` reads exactly that prefix).
    2. The pair (t1, t2)'s list = the two prefixes concatenated, re-sorted
       ascending by the doc-id-major packed key (the ``parallelSort`` at
       ``BigramIndex.java:66``), truncated to ``budget`` entries
       (``min(len1+len2, budget)``, ibid. 67).

    Documented deviations (both strictly cleaner, neither affects which
    docs the budget admits except at the cap boundary):
    - a doc present in BOTH prefixes collapses to ONE row carrying the
      separate (s1, s2) components — the reference stores two adjacent
      packed entries that its scorer then sums; our row IS the summed
      form (X2 contract, compatible with :func:`pair_segment_input`).
    - the cap counts reference ENTRIES (a both-sides doc counts 2) and
      never splits a doc: a doc whose two entries straddle the cap is
      dropped whole.

    ``pairs``: (t1, t2) candidate pair set — the query-trace 2-subsets
    (U4, ``Metadata.java:236-262``); t1 < t2.

    Scale shape: prefixes bound every per-term list at ``budget`` rows
    BEFORE anything is joined (the skew-safe rank assignment of
    :func:`~candidategeneration_spark.quality.posting_positions`, so a
    df≈N hot term never lands in one task); the side joins move only
    budget-bounded tables; the per-pair truncation windows over ≤2·budget
    rows. No full-length posting list ever crosses an exchange.
    """
    from .quality import posting_positions
    pre = pair_needed_terms_prune(scored_uni, pairs)
    prefix = posting_positions(pre).where(F.col("pos") < budget) \
                                   .drop("pos")
    a = (prefix.join(pairs, prefix["term"] == pairs["t1"])
         .select("t1", "t2", "doc_id",
                 F.col("score_q").alias("s1"),
                 F.lit(0).cast("long").alias("s2"),
                 F.lit(1).cast("long").alias("__ent")))
    b = (prefix.join(pairs, prefix["term"] == pairs["t2"])
         .select("t1", "t2", "doc_id",
                 F.lit(0).cast("long").alias("s1"),
                 F.col("score_q").alias("s2"),
                 F.lit(1).cast("long").alias("__ent")))
    merged = (a.unionByName(b)
              .groupBy("t1", "t2", "doc_id")
              .agg(F.sum("s1").alias("s1"), F.sum("s2").alias("s2"),
                   F.sum("__ent").alias("__ent")))
    w = Window.partitionBy("t1", "t2").orderBy("doc_id") \
              .rowsBetween(Window.unboundedPreceding, 0)
    return (merged.withColumn("__cum", F.sum("__ent").over(w))
            .where(F.col("__cum") <= budget)
            .select(F.concat_ws(PAIR_SEP, "t1", "t2").alias("term"),
                    "doc_id", "s1", "s2",
                    (F.col("s1") + F.col("s2")).alias("score_q")))


def global_stats_from_postings(postings: DataFrame, n_docs: int) -> dict:
    """Stats without a second corpus scan: total kept tokens = Σ tf over
    unigram postings (each doc contributes its doc_len exactly once as the
    sum of its per-term tfs) — a pure map-side partial aggregation, NO
    shuffle. n_docs from the (metadata-only) corpus count. Token-less docs
    carry no postings but still count in n_docs — same semantics as
    :func:`global_stats` (reference scans every doc, InvertedIndex.java:171).
    """
    uni = postings.where(~F.col("term").contains(PAIR_SEP))
    row = uni.agg(F.sum("tf").alias("tot"),
                  F.count("*").alias("np")).collect()[0]
    tot = int(row["tot"] or 0)
    return {"n_docs": n_docs, "total_tokens": tot,
            "avgdl": avgdl_floor(tot, n_docs) if n_docs else 0,
            "n_postings": int(row["np"])}


# --------------------------------------------------------------------------
# Phase 3 — compressed block-max segments (skew-aware)
# --------------------------------------------------------------------------

def _encode_sorted_run(pdf: pd.DataFrame, n_docs: int, avgdl: int,
                       score_in: bool) -> pd.DataFrame:
    """Encode a (term, doc_id)-sorted frame of COMPLETE term groups.

    Vectorized: group boundaries by one != scan; df = group size; BM25 for
    every row in one NumPy call; per-group slices feed the codec directly
    (doc_ids already sorted — no per-group argsort)."""
    from .bm25 import bm25_quantized_np
    terms = pdf["term"].to_numpy()
    n = terms.shape[0]
    starts = np.flatnonzero(np.r_[True, terms[1:] != terms[:-1]])
    ends = np.r_[starts[1:], n]
    dids = pdf["doc_id"].to_numpy(np.int64)
    tfs = pdf["tf"].to_numpy(np.int64)
    if score_in:
        scores = pdf["score_q"].to_numpy(np.int64)
    else:
        dfs = np.repeat(ends - starts, ends - starts)
        scores = bm25_quantized_np(
            tfs, pdf["maxtf"].to_numpy(np.int64), dfs,
            pdf["doc_len"].to_numpy(np.int64), n_docs, avgdl)
    rows = indexcodec.encode_groups(dids, scores, tfs, starts, ends)
    out = pd.DataFrame(rows)
    out["term"] = terms[starts]
    return out[["term", "df", "n_blocks", "did_blob", "score_blob",
                "tf_blob", "block_last", "block_max", "block_n",
                "did_off", "score_off", "tf_off"]]


def _stream_encode(batches, n_docs: int, avgdl: int, score_in: bool):
    """Per-partition streaming group encoder. Input batches are globally
    sorted by (term, doc_id) within the partition; a term may span batch
    boundaries, so the last (possibly incomplete) group is carried over."""
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
        if not len(pdf):
            continue
        terms = pdf["term"].to_numpy()
        first_of_last = int(np.searchsorted(terms, terms[-1], side="left"))
        carry = pdf.iloc[first_of_last:]
        head = pdf.iloc[:first_of_last]
        if len(head):
            yield _encode_sorted_run(head, n_docs, avgdl, score_in)
    if carry is not None and len(carry):
        yield _encode_sorted_run(carry, n_docs, avgdl, score_in)


def build_segments_fast(postings: DataFrame, n_docs: int, avgdl: int,
                        num_partitions: int | None = None,
                        n_postings: int | None = None) -> DataFrame:
    """Unigram fast path: ONE shuffle total.

    repartition(term) → Tungsten sortWithinPartitions(term, doc_id) →
    streaming mapInPandas group-encode with FUSED df + BM25 (df = group
    size, so the separate df aggregation + join of the classic path
    disappear). ~100× less per-group overhead than one-applyInPandas-call-
    per-term when the dictionary is dominated by tiny lists (unique
    identifiers at 10^12-file scale). Not applicable to salted builds
    (partial groups don't know df) — use :func:`build_segments` there.

    ``n_postings``: optional known row count (build_index gets it for
    free from the stats aggregate over the persisted postings) — sizes
    the encode shuffle at POSTINGS_PER_ENCODE_TASK rows/partition,
    capped at 4×cores. Without it the count-free 4×cores default stands.
    """
    cols = postings.select("term", "doc_id", "tf", "doc_len", "maxtf")
    sc = postings.sparkSession.sparkContext
    if num_partitions is None and n_postings is not None:
        num_partitions = min(
            sc.defaultParallelism * 4,
            max(1, -(-n_postings // POSTINGS_PER_ENCODE_TASK)))
    if num_partitions is None:
        # explicit count (AQE coalescing would shrink a bare
        # repartition("term") to ~advisory-size partitions — measured 21
        # partitions for a 16-core run, which turns term-hash skew into a
        # straggler tail). 4×cores keeps waves balanced under skew.
        num_partitions = sc.defaultParallelism * 4
    part = cols.repartition(num_partitions, "term")
    part = part.sortWithinPartitions("term", "doc_id")

    def run(batches):
        yield from _stream_encode(batches, n_docs, avgdl, score_in=False)

    return part.mapInPandas(run, schema=SEGMENT_SCHEMA)

def _partial_run(pdf: pd.DataFrame) -> pd.DataFrame:
    """Stage-1 salted group: emit one sorted run (uncompressed arrays)."""
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    return pd.DataFrame([{
        "term": pdf["term"].iloc[0],
        "doc_ids": pdf["doc_id"].to_numpy(dtype=np.int64)[order].tolist(),
        "scores": pdf["score_q"].to_numpy(dtype=np.int64)[order].tolist(),
        "tfs": pdf["tf"].to_numpy(dtype=np.int64)[order].tolist(),
    }])


def _merge_runs(pdf: pd.DataFrame) -> pd.DataFrame:
    """Stage-2: k-way merge of a term's sorted runs → compressed segment.

    This is the Spark-native replacement of ``massiveBinaryMerge``
    (``ExternalSort.java:91-205``) — but per term and tiny, because the
    shuffle already routed all runs of a term here.
    """
    term = pdf["term"].iloc[0]
    dids = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["doc_ids"]])
    scores = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["scores"]])
    tfs = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["tfs"]])
    order = np.argsort(dids, kind="stable")
    seg = indexcodec.encode_postings(dids[order], scores[order], tfs[order])
    row = indexcodec.segment_to_row(seg)
    row["term"] = term
    return pd.DataFrame([row])


def build_segments(scored: DataFrame, salt_buckets: int = 0,
                   n_postings_hint: int | None = None) -> DataFrame:
    """scored postings → one segment row per term.

    ``salt_buckets=0``: one explicit term-hash shuffle + Tungsten sort +
    streaming batched encode (same kernel as the fused unigram path; an
    ``applyInPandas`` per term would pay one UDF invocation per term — ruinous
    for d-bigram dictionaries with millions of pair terms).
    ``salt_buckets=S>0``: two-stage salted build — every term flows through
    stage 1 with salt = doc_id % S (deterministic, no RNG), bounding any
    single task's group to ~df/S postings.

    ``n_postings_hint``: optional (over-)estimate of the row count — sizes
    the encode shuffle like :func:`build_segments_fast` (floor = cores so
    a low estimate never serializes the sort; cap = 4×cores as before).
    """
    from .config import ensure_on_executors
    ensure_on_executors(scored.sparkSession)
    cols = scored.select("term", "doc_id", "tf", "score_q")
    if salt_buckets <= 0:
        sc = scored.sparkSession.sparkContext
        n_parts = sc.defaultParallelism * 4
        if n_postings_hint is not None:
            n_parts = min(n_parts, max(
                sc.defaultParallelism,
                -(-n_postings_hint // HINTED_POSTINGS_PER_ENCODE_TASK)))
        part = cols.repartition(n_parts, "term") \
                   .sortWithinPartitions("term", "doc_id")

        def run(batches):
            yield from _stream_encode(batches, 0, 0, score_in=True)

        return part.mapInPandas(run, schema=SEGMENT_SCHEMA)
    salted = cols.withColumn(
        "salt", F.pmod(F.col("doc_id"), F.lit(salt_buckets)).cast("int"))
    runs = salted.groupBy("term", "salt").applyInPandas(
        lambda pdf: _partial_run(pdf), schema=_RUN_SCHEMA)
    return runs.groupBy("term").applyInPandas(
        _merge_runs, schema=SEGMENT_SCHEMA)


def build_segments_skew_aware(scored: DataFrame, hot_df_threshold: int,
                              salt_buckets: int = 16,
                              n_postings_hint: int | None = None
                              ) -> DataFrame:
    """Skew-split segment build: ONLY terms with df > threshold take the
    two-stage salted route; the long tail takes the one-shuffle streaming
    path. This is the practical 100 TB shape — salting everything doubles
    the shuffle for millions of tiny lists to protect against a handful of
    hot ones (``def``/``class``-grade d-bigrams), while salting nothing
    lets one task own a whole hot list. The reference has no skew handling
    at all (fixed 4 shards, InvertedIndex.java:74-84).

    ``scored`` must carry the ``df`` column (score_postings provides it),
    so hot-term detection is a filter, not an extra aggregation.
    """
    hot = scored.where(F.col("df") > hot_df_threshold)
    cold = scored.where(F.col("df") <= hot_df_threshold)
    out = build_segments(cold, salt_buckets=0,
                         n_postings_hint=n_postings_hint)
    if not hot.isEmpty():
        out = out.unionByName(build_segments(hot, salt_buckets=salt_buckets))
    return out


def pair_segment_input(scored_uni: DataFrame, pairs: DataFrame) -> DataFrame:
    """Union scored unigrams with doc-locally scored pairs as segment-build
    input — THE single definition of the stored pair format (X2 contract).

    Pair tf is meaningless (always 1 — the reference scorer never reads it,
    ``InvertedIndex.java:302-307``), so the tf stream carries zigzag(s2)
    instead: a stored pair segment yields the separate (did, s1, s2)
    component streams via s2 = unzigzag(tf), s1 = score - s2
    (``algo_toplayer.cpp:477-564``, ``BigramIndex.java:44-85``). zigzag
    keeps negative components 1-2 VByte bytes. Every build entry point
    (build_index, build_index_skew_aware, checkpoints.build_index_resumable)
    MUST go through here — a path that unioned raw tf=1 instead would store
    segments that decode s2=-1 for every pair.
    """
    s2z = F.expr("(s2 << 1) ^ (s2 >> 63)").cast("long").alias("tf")
    return scored_uni.select("term", "doc_id", "tf", "score_q") \
        .unionByName(pairs.select("term", "doc_id", s2z, "score_q"))


def release_build_caches(stats: dict) -> None:
    """Unpersist the intermediates a build pinned (``stats["cached"]``).

    Call AFTER materializing the returned segments (store write / count):
    the segments plan references the cached tables, so releasing earlier
    just forfeits the cache and recomputes. Long-lived sessions that
    build repeatedly (the driver gate loop, streaming compaction) would
    otherwise accumulate one corpus-order token table per build in the
    cache manager — the same leak class the round-4 ``sample_split`` fix
    removed."""
    for df in stats.pop("cached", []):
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped


def build_index(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text",
                dbigram_distance: int | None = DBIGRAM_DISTANCE,
                salt_buckets: int = 0,
                persist: bool = True,
                phase_times: dict | None = None,
                stopwords=None) -> tuple[DataFrame, dict]:
    """End-to-end build → (segments DataFrame, stats dict).

    Unigram postings are built ONCE (one Arrow tokenize pass) and scored
    with a unigram-sized df join; pair postings are generated *already
    scored* by the doc-local pass (:func:`build_pair_postings`) — the pair
    table, the largest intermediate of the build, never joins anything.

    ``persist=True`` materializes the unigram postings (referenced by the
    stats aggregate + scoring join) and, on d-bigram builds, the token
    table (unigram explode + pair pass) and the scored unigrams (per-doc
    score map + segment union) — without it Catalyst re-runs the
    tokenizer per reference: extra corpus scans at 100 TB. On a real cluster use ``StorageLevel.DISK_ONLY`` via
    checkpoints.py instead when postings exceed cluster RAM.

    ``phase_times``: optional dict filled with wall seconds of the
    materialized sub-phases (benchmark instrumentation).

    The persisted intermediates are returned in ``stats["cached"]``;
    after materializing the segments (writing the store / counting),
    call :func:`release_build_caches` to unpersist them — a long-lived
    session that builds repeatedly would otherwise pin one corpus-order
    token table per build in the cache manager.
    """
    import time as _time
    # n_docs via parquet metadata / cheap count — no tokenize; counted
    # FIRST so it can size the tokenize pass (a single-file local corpus
    # otherwise runs the Arrow pass on one task). Total tokens come from
    # the postings themselves, and on d-bigram builds the pair pass reads
    # the persisted tokenize-once table → the corpus is tokenized exactly
    # once, period (round 5; the pair pass used to re-tokenize).
    n_docs = docs.count()
    sc = docs.sparkSession.sparkContext
    tok_parts = min(sc.defaultParallelism,
                    max(1, -(-n_docs // DOCS_PER_TOKENIZE_TASK)))
    cached: list = []
    tokd = None
    if dbigram_distance:
        # two consumers (unigram explode + pair pass): persist the token
        # table so tokenize runs once
        tokd = tokenize_docs(docs, id_col, text_col, stopwords=stopwords,
                             input_partitions=tok_parts)
        if persist:
            tokd = tokd.persist()
            cached.append(tokd)
        postings = build_postings_from_tokens(tokd)
    else:
        postings = build_postings(docs, id_col, text_col, None,
                                  stopwords=stopwords,
                                  input_partitions=tok_parts)
    if persist:
        postings = postings.persist()
        cached.append(postings)
    t0 = _time.time()
    stats = global_stats_from_postings(postings, n_docs)
    stats["cached"] = cached
    if phase_times is not None:
        phase_times["tokenize_stats"] = round(_time.time() - t0, 3)
    if dbigram_distance is None and salt_buckets <= 0:
        # unigram-only: fused single-shuffle path (df + score in-kernel)
        return build_segments_fast(postings, stats["n_docs"],
                                   stats["avgdl"],
                                   n_postings=stats["n_postings"]), stats
    scored = score_postings(postings, stats["n_docs"], stats["avgdl"])
    if dbigram_distance:
        if persist:
            scored = scored.persist()
            cached.append(scored)
        pair_parts = min(sc.defaultParallelism * 4, max(
            1, -(-stats["total_tokens"] // TOKENS_PER_PAIR_TASK)))
        pairs = build_pair_postings_from_tokens(tokd, scored,
                                                dbigram_distance,
                                                num_partitions=pair_parts)
        # pair rows are bounded by distance × total tokens (each token
        # opens ≤ d windows, pre-dedup) — a cheap over-estimate that sizes
        # the encode shuffle without materializing the pair table
        hint = stats["n_postings"] \
            + dbigram_distance * stats["total_tokens"]
        return build_segments(pair_segment_input(scored, pairs),
                              salt_buckets, n_postings_hint=hint), stats
    return build_segments(scored, salt_buckets,
                          n_postings_hint=stats["n_postings"]), stats


def build_index_skew_aware(docs: DataFrame, hot_df_threshold: int,
                           id_col: str = "doc_id", text_col: str = "text",
                           dbigram_distance: int | None = None,
                           salt_buckets: int = 16,
                           stopwords=None,
                           persist: bool = True) -> tuple[DataFrame, dict]:
    """The 100 TB CLI build: doc-local pair scoring + skew-split encode.

    Same segments, byte-identical, as :func:`build_index` (asserted in
    tests) — but hot lists (df > threshold) take the two-stage salted
    route so no single task ever owns a whole ``def``-grade list.

    Hot-PAIR detection needs no pair-df aggregation: a pair's df is
    bounded by min(df(t1), df(t2)), so only pairs whose BOTH components
    are hot unigrams can possibly be hot. Those route to the salted path
    (conservatively — a routed-but-cold pair is still exact, just takes
    the two-stage encode); everything else is provably cold. The hot-term
    set is small by definition (df > threshold bounds its size by
    total_postings/threshold), and routing is two BROADCAST left joins
    on the pair components (round 5 — it was a collected ``isin`` literal
    list, which at 100 TB with a low threshold becomes a giant In
    predicate compiled into every task). Map-side only: the pair table,
    the build's largest intermediate, still never SHUFFLES for a join.
    """
    n_docs = docs.count()
    sc = docs.sparkSession.sparkContext
    tok_parts = min(sc.defaultParallelism,
                    max(1, -(-n_docs // DOCS_PER_TOKENIZE_TASK)))
    cached: list = []
    tokd = None
    if dbigram_distance:
        tokd = tokenize_docs(docs, id_col, text_col, stopwords=stopwords,
                             input_partitions=tok_parts)
        if persist:
            tokd = tokd.persist()
            cached.append(tokd)
        postings = build_postings_from_tokens(tokd)
    else:
        postings = build_postings(docs, id_col, text_col, None,
                                  stopwords=stopwords,
                                  input_partitions=tok_parts)
    if persist:
        postings = postings.persist()
        cached.append(postings)
    stats = global_stats_from_postings(postings, n_docs)
    stats["cached"] = cached
    scored = score_postings(postings, stats["n_docs"], stats["avgdl"])
    if not dbigram_distance:
        return build_segments_skew_aware(
            scored, hot_df_threshold, salt_buckets,
            n_postings_hint=stats["n_postings"]), stats
    if persist:
        scored = scored.persist()
        cached.append(scored)
    pair_parts = min(sc.defaultParallelism * 4, max(
        1, -(-stats["total_tokens"] // TOKENS_PER_PAIR_TASK)))
    pairs = build_pair_postings_from_tokens(tokd, scored, dbigram_distance,
                                            num_partitions=pair_parts)
    hot_df = scored.where(F.col("df") > hot_df_threshold) \
                   .select("term").distinct()
    uni_rows = scored.select("term", "doc_id", "tf", "score_q", "df")
    s2z = F.expr("(s2 << 1) ^ (s2 >> 63)").cast("long").alias("tf")
    split = F.split(F.col("term"), PAIR_SEP)
    # df column on pair rows only routes hot/cold (never stored): the df
    # bound min(df1,df2) is represented as threshold±1 sentinels. Routing
    # = two broadcast LEFT joins of the hot-term set against the pair
    # components — BroadcastHashJoin, never an In-literal, never a pair
    # shuffle (plan-asserted in test_plans).
    withc = pairs.withColumn("__t1", split.getItem(0)) \
                 .withColumn("__t2", split.getItem(1))
    h1 = hot_df.select(F.col("term").alias("__t1"),
                       F.lit(True).alias("__h1"))
    h2 = hot_df.select(F.col("term").alias("__t2"),
                       F.lit(True).alias("__h2"))
    routed = withc.join(F.broadcast(h1), "__t1", "left") \
                  .join(F.broadcast(h2), "__t2", "left")
    pair_hot = (F.coalesce(F.col("__h1"), F.lit(False))
                & F.coalesce(F.col("__h2"), F.lit(False)))
    pair_rows = routed.select(
        "term", "doc_id", s2z, "score_q",
        F.when(pair_hot, F.lit(hot_df_threshold + 1))
         .otherwise(F.lit(0)).cast("long").alias("df"))
    seg_in = uni_rows.unionByName(pair_rows)
    hint = stats["n_postings"] + dbigram_distance * stats["total_tokens"]
    return build_segments_skew_aware(seg_in, hot_df_threshold,
                                     salt_buckets,
                                     n_postings_hint=hint), stats
