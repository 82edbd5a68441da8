"""Training-data pipeline operators beyond the dedup/quality families.

What a 100 TB LLM-training-data pipeline runs between "raw corpus" and
"training shards", expressed Spark-first with exact integer semantics so
each op has a bit-identical DuckDB oracle (same design rules as textops.py):

- :func:`decontaminate` — benchmark decontamination: flag documents that
  contain an evaluation query as a contiguous token phrase. The phrase
  table is tiny → broadcast; the corpus side is one token-join pass.
- :func:`pii_scrub` — PII / secret redaction for code corpora (emails,
  long hex ids, long digit runs) as pure JVM ``regexp_count`` /
  ``regexp_replace`` column chains (no UDF; stays in codegen).
- :func:`sample_split` — deterministic stratified train/val/test split:
  multiplicative-hash order within each stratum, exact per-mille quotas.
- :func:`pack_sequences` — greedy context-window packing: documents are
  packed in doc_id order into sequences of ≤ ``cap`` tokens per hash
  bucket (the distributed unit), the standard pre-tokenization step that
  turns documents into fixed-budget training rows.
- :func:`repetition_stats` — Gopher-style repetition quality signal:
  per-document fraction of token-bigram occurrences whose bigram occurs
  more than once in the document.

Scale notes (100 TB):
- decontaminate: k-gram equi-join prefilter (BroadcastHashJoin on the
  phrase's first k tokens) + exact verify on the surviving candidates —
  linear in corpus size and independent of phrase count, unlike the
  round-3 broadcast nested-loop `contains`.
- pii_scrub: embarrassingly parallel column math, no shuffle at all.
- sample_split: skew-safe two-stage partial-rank + offset merge (the
  quality.posting_positions pattern) — no stratum-wide window task; a
  dominant 90%-one-language stratum splits across range partitions. The
  window-free variant (pure hash threshold ``h % 1000 < 800``) needs no
  shuffle but gives only approximate fractions; this exact-quota form is
  the gate.
- pack_sequences: one shuffle on the bucket key; packing inside a bucket
  is sequential by construction (greedy order dependence), so buckets are
  the parallelism unit — size n_buckets ≫ executors. The kernel is
  O(#sequences) searchsorted steps, vectorized otherwise.
- repetition_stats: bigram counts shuffle on (doc_id, gram) — the same
  key shape as the unigram tf pass; no skew beyond document length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .textops import MH_MULT, MH_PRIME
from .tokenizer import tokens_col

# pii_scrub patterns — shared verbatim with the SQL oracle. Kept inside
# the common Java-regex ∩ RE2 dialect (no lookaround, no backreferences)
# so Spark (java.util.regex) and DuckDB (RE2) match identically.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
HEX_RE = r"\b[0-9a-f]{16,}\b"
NUM_RE = r"[0-9]{9,}"

# sample_split quotas (per mille) — train 800 / val 100 / test 100
SPLIT_TRAIN_PM = 800
SPLIT_VAL_PM = 900  # cumulative: (800, 900] is val, rest test

# pack_sequences defaults for the gate
PACK_CAP = 120
PACK_BUCKETS = 8


DECON_PREFIX_K = 4  # prefix-gram length for long-phrase prefiltering


def decontaminate(docs: DataFrame, phrases: DataFrame,
                  text_col: str = "text") -> DataFrame:
    """(qid, doc_id) for every document containing an eval phrase.

    ``phrases``: (qid long, phrase string) — terms joined by single
    spaces, already in tokenizer-normal form. Containment is whole-token:
    a phrase of L tokens matches iff some length-L token window of the
    document equals it, so ``merge sort`` cannot match inside
    ``mergesort``.

    SCALE-SAFE (round 4): the old form was a broadcast nested-loop
    ``padded.contains(needle)`` — every doc × every phrase × doc length
    character work, the slowest stage of the pipeline once the eval suite
    reaches 10⁴-10⁵ phrases. Now a hash-join prefilter (the same spirit
    as the reference pruning probes with its filter set,
    InvertedIndex.java:291):

    - short phrases (< ``DECON_PREFIX_K`` tokens): one doc-window pass
      per distinct short length (≤ 3 passes), exact equality equi-join —
      no verify step needed, window == phrase IS the match.
    - long phrases (≥ ``DECON_PREFIX_K`` tokens): one doc-window pass at
      k = DECON_PREFIX_K, equi-join on the phrase's first k-gram, then
      exact whole-token ``contains`` verification on the (tiny) surviving
      candidate set only.

    Both joins broadcast the phrase side (eval suites are small) as a
    BroadcastHashJoin on the gram key — plan-asserted in test_plans; doc
    windows are built JVM-side (transform/slice/array_join, stays in
    codegen) in a bounded number of corpus passes (≤ k-1 short-length
    passes + one k-gram pass + one verify pass) regardless of
    phrase-length diversity or phrase count.
    """
    k = DECON_PREFIX_K
    # ONE phrase snapshot (round 5): the old shape ran two driver actions
    # (short-length distinct + longp.take) against the live phrases plan —
    # a nondeterministic phrase source (e.g. ids minted by
    # monotonically_increasing_id) could show those probes a different
    # partitioning than the later joins. The phrase table is broadcast-
    # small by design (eval suites), so collect it once and derive every
    # side from the frozen rows.
    spark = docs.sparkSession
    prows = phrases.select(F.col("qid").cast("long").alias("qid"),
                           F.col("phrase"),
                           F.size(F.split(F.col("phrase"), " "))
                            .alias("plen")).collect()
    # a NULL phrase can never match a document; drop it here — the old
    # Spark-side plen filters rejected NULL under three-valued logic, and
    # the driver-side set comprehensions below would otherwise TypeError
    # on a None plen
    prows = [r for r in prows if r["plen"] is not None]
    p = spark.createDataFrame(
        [(r["qid"], r["phrase"], r["plen"]) for r in prows],
        "qid long, phrase string, plen int") if prows else None
    toks = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       tokens_col(F.col(text_col)).alias("toks"))

    def windows(src: DataFrame, length) -> DataFrame:
        return src.select(
            "doc_id",
            F.explode(F.expr(
                f"CASE WHEN size(toks) >= {length}"
                f" THEN transform(sequence(1, size(toks) - ({length}) + 1),"
                f"      i -> array_join(slice(toks, i, {length}), ' '))"
                " ELSE CAST(array() AS array<string>) END"
            )).alias("gram"))

    parts = []
    # distinct short lengths actually present (bounded by k-1 passes) —
    # read off the frozen snapshot, no extra Spark action
    short_lens = sorted({r["plen"] for r in prows if r["plen"] < k})
    has_long = any(r["plen"] >= k for r in prows)
    for ln in short_lens:
        cand = F.broadcast(p.where(F.col("plen") == ln)
                           .select("qid", F.col("phrase").alias("gram")))
        parts.append(windows(toks, ln).join(cand, "gram")
                     .select("qid", "doc_id"))
    if has_long:
        longp = p.where(F.col("plen") >= k)
        pref = F.broadcast(longp.select(
            "qid", "phrase",
            F.array_join(F.slice(F.split(F.col("phrase"), " "), 1, k), " ")
             .alias("gram")))
        hits = windows(toks, k).join(pref, "gram") \
                               .select("qid", "doc_id", "phrase").distinct()
        padded = toks.select(
            "doc_id",
            F.concat(F.lit(" "), F.array_join("toks", " "), F.lit(" "))
             .alias("padded"))
        needle = F.concat(F.lit(" "), F.col("phrase"), F.lit(" "))
        parts.append(hits.join(padded, "doc_id")
                     .where(F.col("padded").contains(needle))
                     .select("qid", "doc_id"))
    if not parts:
        return toks.sparkSession.createDataFrame(
            [], "qid long, doc_id long")
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    return out.distinct()


def pii_scrub(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Redact emails → long hex ids → long digit runs, in that order.

    Returns (doc_id, n_email, n_hex, n_num, scrub_md5): per-stage match
    counts (each counted on the text as it stands at that stage — an
    email's hex-ish local part cannot double-count) and the md5 of the
    fully redacted text, which pins the exact replacement bytes.
    """
    t0 = F.col(text_col)
    n_email = F.regexp_count(t0, F.lit(EMAIL_RE))
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    n_hex = F.regexp_count(t1, F.lit(HEX_RE))
    t2 = F.regexp_replace(t1, HEX_RE, "<HEXID>")
    n_num = F.regexp_count(t2, F.lit(NUM_RE))
    t3 = F.regexp_replace(t2, NUM_RE, "<NUM>")
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_email.cast("long").alias("n_email"),
        n_hex.cast("long").alias("n_hex"),
        n_num.cast("long").alias("n_num"),
        F.md5(t3).alias("scrub_md5"))


def sample_split(docs: DataFrame, stratum_col: str = "lang",
                 num_partitions: int | None = None) -> DataFrame:
    """Deterministic stratified split: (doc_id, stratum, h, split).

    Documents are ordered within each stratum by a multiplicative hash of
    doc_id (ties broken by doc_id) and the first 80.0% go to train, the
    next 10.0% to val, the rest to test — exact per-stratum quotas, fully
    reproducible, no RNG state anywhere.

    SKEW-SAFE (round 4): the old ``row_number().over(partitionBy(stratum))``
    put a whole stratum on ONE task — at 100× scale a dominant ``lang``
    stratum (most corpora are ~90% one language) serializes the split.
    Same cure as :func:`quality.posting_positions`: ``repartitionByRange``
    over the full split order (stratum, h, doc_id) + per-partition sort,
    a tiny boundary job collecting per-partition per-stratum counts
    (strata are contiguous in a range-sorted layout, so each partition
    holds only a handful), driver prefix-sum → broadcast offsets +
    totals, then one ``mapInPandas`` pass assigns global ranks and the
    per-mille quota labels. Byte-identical to the window version (the
    order is total) with no task ever holding more than its range slice
    of a stratum. All rank arithmetic is int64 (the old int32
    ``row_number * 1000`` silently overflowed past ~2.147M rows/stratum).
    """
    spark = docs.sparkSession
    sc = spark.sparkContext
    if num_partitions is None:
        num_partitions = sc.defaultParallelism * 4
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(stratum_col).cast("string").alias("stratum"),
        ((F.col("doc_id") * F.lit(MH_MULT)) % F.lit(MH_PRIME))
        .cast("long").alias("h"))
    order = [F.col("stratum").asc(), F.col("h").asc(), F.col("doc_id").asc()]
    # eager localCheckpoint (round 5, was .persist()): the boundary job
    # and the tag job must see the SAME sampled range boundaries, but a
    # bare persist leaks a corpus-sized cache entry per call — the cache
    # manager never releases it. A local checkpoint pins the snapshot the
    # same way while its blocks stay owned by the RDD lineage, so the
    # ContextCleaner reclaims them when the returned DataFrame is
    # garbage-collected. Known trade: localCheckpoint TRUNCATES lineage,
    # so an executor lost between the boundary job and the tag job fails
    # the query instead of recomputing (Spark cannot rebuild the blocks).
    # For long multi-hour cluster runs prefer a reliable checkpoint dir
    # (sparkContext.setCheckpointDir + .checkpoint()) at the cost of a
    # DFS round-trip; the deterministic snapshot requirement is the same.
    part = d.repartitionByRange(num_partitions, *order) \
            .sortWithinPartitions(*order).localCheckpoint(eager=True)

    def counts(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        agg: dict[str, int] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            # dropna=False: a NULL stratum is a group (SQL window / DuckDB
            # row_number PARTITION BY semantics) — the default would drop
            # its counts and the tag pass would KeyError on tot[None]
            for s, c in pdf["stratum"].value_counts(dropna=False).items():
                s = None if pd.isna(s) else s  # NaN key -> the NULL group
                agg[s] = agg.get(s, 0) + int(c)
        yield pd.DataFrame([(pid, s, n) for s, n in agg.items()],
                           columns=["pid", "stratum", "n"])

    meta = part.select("stratum").mapInPandas(
        counts, schema="pid int, stratum string, n long").collect()
    per: dict[str, list[tuple[int, int]]] = {}
    for r in meta:
        per.setdefault(r["stratum"], []).append((int(r["pid"]), int(r["n"])))
    totals: dict[str, int] = {}
    offsets: dict[tuple[int, str], int] = {}
    for s, lst in per.items():
        lst.sort()
        run = 0
        for pid, n in lst:
            offsets[(pid, s)] = run
            run += n
        totals[s] = run
    bc = sc.broadcast((totals, offsets))

    def tag(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        tot, offs = bc.value
        seen: dict[str, int] = {}
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            s_arr = pdf["stratum"].to_numpy()
            rn = np.empty(m, np.int64)
            nn = np.empty(m, np.int64)
            run_starts = np.flatnonzero(np.r_[True, s_arr[1:] != s_arr[:-1]])
            run_ends = np.r_[run_starts[1:], m]
            for a, b in zip(run_starts, run_ends):
                s = s_arr[a]
                base = offs.get((pid, s), 0) + seen.get(s, 0)
                rn[a:b] = base + np.arange(1, b - a + 1, dtype=np.int64)
                nn[a:b] = tot[s]
                seen[s] = seen.get(s, 0) + (b - a)
            out = pdf.copy()
            out["split"] = np.where(
                rn * 1000 <= nn * SPLIT_TRAIN_PM, "train",
                np.where(rn * 1000 <= nn * SPLIT_VAL_PM, "val", "test"))
            yield out

    schema = "doc_id long, stratum string, h long, split string"
    return part.mapInPandas(tag, schema=schema)


def pack_sequences(docs: DataFrame, cap: int = PACK_CAP,
                   n_buckets: int = PACK_BUCKETS,
                   text_col: str = "text") -> DataFrame:
    """Greedy context-window packing per hash bucket.

    Within each bucket, documents are visited in doc_id order and packed
    into the current sequence while the token total stays ≤ ``cap``; a
    document that would overflow starts the next sequence (an oversize
    document becomes a singleton sequence). Returns
    (doc_id, bucket, n_tokens, seq, off) with ``off`` = token offset of
    the document inside its sequence.

    The kernel is O(#sequences) numpy ``searchsorted`` steps on the
    bucket's cumulative token counts — not per-row Python.
    """
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.col("doc_id") % n_buckets).cast("long").alias("bucket"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        lens = pdf["n_tokens"].to_numpy(np.int64)
        cum = np.cumsum(lens)
        n = len(lens)
        seq = np.empty(n, np.int64)
        off = np.empty(n, np.int64)
        start, base, s = 0, 0, 0
        while start < n:
            j = int(np.searchsorted(cum, base + cap, side="right"))
            j = max(j, start + 1)  # an oversize doc still packs, alone
            seq[start:j] = s
            off[start:j] = cum[start:j] - lens[start:j] - base
            base = int(cum[j - 1])
            s += 1
            start = j
        pdf["seq"] = seq
        pdf["off"] = off
        return pdf

    schema = "doc_id long, bucket long, n_tokens long, seq long, off long"
    return d.groupBy("bucket").applyInPandas(pack, schema)


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_bigrams, n_dup, dup_frac_q): duplicate-bigram fraction.

    ``n_dup`` counts bigram *occurrences* whose bigram occurs more than
    once within the document (the Gopher duplicate-n-gram rule at n=2);
    ``dup_frac_q`` = floor(1e6 · n_dup / n_bigrams), 0 for <2-token docs.
    The bigram array is built JVM-side (slice + zip_with, stays in
    codegen); only per-(doc, gram) counts shuffle.
    """
    toks = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       tokens_col(F.col(text_col)).alias("toks"))
    grams = toks.select("doc_id", F.expr(
        "zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),"
        "         slice(toks, 2, greatest(size(toks) - 1, 0)),"
        "         (a, b) -> concat(a, ' ', b))").alias("grams"))
    cnt = (grams.select("doc_id", F.explode("grams").alias("gram"))
                .groupBy("doc_id", "gram").agg(F.count("*").alias("c")))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("nb"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("nd"))
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    out = base.join(agg, "doc_id", "left")
    nb = F.coalesce(F.col("nb"), F.lit(0))
    nd = F.coalesce(F.col("nd"), F.lit(0))
    frac = F.when(nb > 0, F.floor(F.lit(1_000_000) * nd / nb)).otherwise(0)
    return out.select(
        "doc_id", nb.cast("long").alias("n_bigrams"),
        nd.cast("long").alias("n_dup"), frac.cast("long").alias("dup_frac_q"))


LM_LOG_SCALE = 1_000_000  # quantization for per-term log-probabilities


def lm_doc_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """CCNet-style LM quality signal: per-document negative log-likelihood
    per token under the corpus unigram MLE language model (Wenzek et al.
    2020 filter documents by LM perplexity; Q9's probability maps turned
    into a usable per-doc score).

    Returns (doc_id, n_tokens, nll_q) with
    ``nll_q = floor( Σ_t tf_t · (−lp_q(t)) / n_tokens )`` where
    ``lp_q(t) = floor(1e6 · ln(cf_t / total_tokens))`` — LOW nll_q =
    typical corpus language, HIGH = rare/garbled. All arithmetic after
    the one ``ln`` is exact int64, and the ``ln`` follows the engine's
    BM25 determinism posture (bm25.py module note): computed by CPython
    ``math.log`` (glibc — the same library DuckDB's ``ln`` calls) via an
    Arrow-batched UDF over the tiny per-term table, never per posting.
    Token-less docs score 0.

    Scale shape: one (doc,term) tf shuffle (the index build's own key),
    a vocabulary-sized map joined back on term — identical topology to
    the df join in score_postings; no skew beyond term popularity.
    """
    import math

    from pyspark.sql.functions import pandas_udf

    toks = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       tokens_col(F.col(text_col)).alias("toks"))
    tf = (toks.select("doc_id", F.explode("toks").alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = cf.agg(F.sum("cf")).collect()[0][0] or 0

    @pandas_udf("long")
    def lp_q(s: pd.Series) -> pd.Series:
        arr = s.to_numpy(np.int64)
        u, inv = np.unique(arr, return_inverse=True)
        vals = np.array(
            [math.floor(LM_LOG_SCALE * math.log(c / total))
             for c in u.tolist()], dtype=np.int64)
        return pd.Series(vals[inv])

    lm = cf.select("term", lp_q(F.col("cf")).alias("lp_q"))
    per_doc = (tf.join(lm, "term")
               .groupBy("doc_id")
               .agg(F.sum(F.col("tf") * (-F.col("lp_q"))).alias("snll"),
                    F.sum("tf").alias("n_tokens")))
    base = toks.select("doc_id", F.size("toks").alias("nt"))
    out = base.join(per_doc, "doc_id", "left")
    nll = F.when(F.coalesce(F.col("n_tokens"), F.lit(0)) > 0,
                 F.expr("snll div n_tokens")).otherwise(0)
    return out.select(
        "doc_id", F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
        .alias("n_tokens"), nll.cast("long").alias("nll_q"))


DUP_SPAN_K = 8  # window length (tokens) — Lee et al. use 50 BPE tokens


def duplicate_spans(docs: DataFrame, k: int = DUP_SPAN_K,
                    text_col: str = "text") -> DataFrame:
    """(doc_id, n_windows, n_dup_windows, dup_cov_q): exact duplicated-
    span detection — the window-granular form of suffix-array substring
    dedup ("Deduplicating Training Data Makes Language Models Better",
    Lee et al. 2021).

    A length-``k`` token window is *duplicated* if the identical window
    occurs in ≥2 distinct documents. ``n_dup_windows`` counts a doc's
    duplicated windows; ``dup_cov_q`` = floor(1e6 · covered / n_tokens)
    where ``covered`` is the exact token count under the UNION of the
    doc's duplicated windows (fixed-length interval union via one
    lead() pass: consecutive duplicated windows at distance < k overlap,
    so each contributes min(k, next_pos - pos)).

    Scale shape (100 TB): windows are built JVM-side from the token
    array (no UDF); the only heavy shuffle groups windows by gram —
    the same key shape as the index build's term shuffle. At petabyte
    scale shuffle xxhash64(gram) instead of the string (the gate keeps
    exact strings so the DuckDB oracle is collision-free by
    construction); hot grams (boilerplate headers) are bounded by
    gdf-capping exactly like ngram_jaccard's gram_df_cap.
    """
    toks = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       tokens_col(F.col(text_col)).alias("toks"))
    wins = toks.select(
        "doc_id",
        F.posexplode(F.expr(
            f"CASE WHEN size(toks) >= {k}"
            f" THEN transform(sequence(1, size(toks) - {k} + 1),"
            f"      i -> array_join(slice(toks, i, {k}), ' '))"
            " ELSE CAST(array() AS array<string>) END"
        )).alias("pos0", "gram"))
    wins = wins.select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    gdf = (wins.groupBy("gram")
           .agg(F.count_distinct("doc_id").alias("gdf")))
    dup = (wins.join(gdf.where(F.col("gdf") >= 2), "gram")
           .select("doc_id", "pos"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    cov = (dup.withColumn("nxt", F.lead("pos").over(w))
           .withColumn("contrib",
                       F.least(F.lit(k),
                               F.coalesce(F.col("nxt") - F.col("pos"),
                                          F.lit(k)))))
    agg = cov.groupBy("doc_id").agg(
        F.count("*").alias("ndw"), F.sum("contrib").alias("covered"))
    base = toks.select(
        "doc_id", F.size("toks").alias("n_tokens"),
        F.greatest(F.size("toks") - F.lit(k - 1), F.lit(0))
         .alias("n_windows"))
    out = base.join(agg, "doc_id", "left")
    covered = F.coalesce(F.col("covered"), F.lit(0))
    covq = F.when(F.col("n_tokens") > 0,
                  F.floor(F.lit(1_000_000) * covered / F.col("n_tokens"))) \
            .otherwise(0)
    return out.select(
        "doc_id", F.col("n_windows").cast("long").alias("n_windows"),
        F.coalesce(F.col("ndw"), F.lit(0)).cast("long")
         .alias("n_dup_windows"),
        covq.cast("long").alias("dup_cov_q"))
