"""Flash-fetch query engine: top-k BM25 candidate generation.

Re-expression of the reference's C++ online engine
(``algo_toplayer.cpp:85-290``): its budgeted top-layer loads, radix sort,
vector merge, quantile collapses and selective lookups (X1-X10 in SURVEY.md
§2.10) are an *unsafe approximate* pipeline; we replace it with exact
document-at-a-time scoring plus Block-Max WAND pruning — the safe version of
the same idea (impact-ordered prefixes ≈ block-max metadata; selective
lookup nextGEQ ≈ ``searchsorted`` over block skip pointers).

Two kernels with identical output, asserted equal in tests:

- :func:`topk_exhaustive` — decode everything, integer group-sum, top-k.
- :func:`topk_bmwand`     — Block-Max WAND: lists stay compressed; blocks
  whose max-score sum can't beat the running threshold are skipped without
  decoding. This is the 100 TB path: work is proportional to the blocks that
  *might* contain a top-k doc, not to list length.

Scores are int64 sums of pre-quantized per-term scores → associative →
rank-identical everywhere. Tie-break: (score desc, doc_id asc) — the
reference's final sort is score-only and unstable (``algo_toplayer.cpp:274``)
so we define the deterministic order and the oracle enforces it.

Spark orchestration (:func:`wand_topk`): the tiny exploded query-term table
is broadcast and hash-joined against the segment table — segments never
shuffle for the join; only the ≤|terms| matched segment rows per query move
in the final ``groupBy(qid)`` exchange. A query touches at most |q| segment
partitions, satisfying the term-partitioned layout goal of SURVEY.md §7.5.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StructField, StructType,
)

from .indexcodec import Segment, segment_from_row

RESULT_SCHEMA = StructType([
    StructField("qid", LongType()),
    StructField("rank", IntegerType()),
    StructField("doc_id", LongType()),
    StructField("score_q", LongType()),
])


def _final_topk(doc_ids: np.ndarray, scores: np.ndarray, k: int):
    """Exact top-k with (score desc, doc_id asc) tie-break."""
    if doc_ids.shape[0] == 0:
        return doc_ids, scores
    order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]


def topk_exhaustive(segments: list[Segment], k: int):
    """Decode-everything DAAT: integer group-sum over all postings.

    Fully NumPy-vectorized (~50ns/posting) — the baseline the WAND path
    must beat by actually skipping work (see :func:`topk_auto`)."""
    if not segments:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    decoded = [s.decode_all() for s in segments]
    dids = np.concatenate([d[0] for d in decoded])
    scs = np.concatenate([d[1] for d in decoded])
    uniq, inv = np.unique(dids, return_inverse=True)
    sums = np.zeros(uniq.shape[0], dtype=np.int64)
    np.add.at(sums, inv, scs)
    return _final_topk(uniq, sums, k)


class _Cursor:
    """Lazy block-decoding cursor over one term's compressed list."""

    __slots__ = ("seg", "bi", "pos", "dids", "scores", "exhausted")

    def __init__(self, seg: Segment):
        self.seg = seg
        self.bi = -1
        self.pos = 0
        self.dids = None
        self.scores = None
        self.exhausted = seg.n_blocks == 0
        if not self.exhausted:
            self._load(0)

    def _load(self, bi: int):
        if bi >= self.seg.n_blocks:
            self.exhausted = True
            return
        self.bi = bi
        d, s, _ = self.seg.decode_block(bi)
        self.dids, self.scores = d, s
        self.pos = 0

    @property
    def cur_did(self) -> int:
        return int(self.dids[self.pos])

    @property
    def cur_score(self) -> int:
        return int(self.scores[self.pos])

    @property
    def max_score(self) -> int:
        """Global list max (WAND upper bound)."""
        return int(self.seg.block_max.max())

    def block_max_for(self, did: int) -> int:
        """Max score of the block that would contain ``did`` (0 if past end).

        Pure metadata lookup — no block decode (the whole point of BMW)."""
        if did <= int(self.seg.block_last[self.bi]):
            return int(self.seg.block_max[self.bi])
        bi = self.seg.first_block_geq(did)
        if bi >= self.seg.n_blocks:
            return 0
        return int(self.seg.block_max[bi])

    def block_last_for(self, did: int) -> int:
        """Last docID of the block that would contain ``did``."""
        if did <= int(self.seg.block_last[self.bi]):
            return int(self.seg.block_last[self.bi])
        bi = self.seg.first_block_geq(did)
        if bi >= self.seg.n_blocks:
            return (1 << 62)
        return int(self.seg.block_last[bi])

    def next_geq(self, did: int):
        """Advance to the first posting >= did (block skip + searchsorted)."""
        if self.exhausted:
            return
        if did > int(self.seg.block_last[self.bi]):
            nbi = self.seg.first_block_geq(did)
            if nbi >= self.seg.n_blocks:
                self.exhausted = True
                return
            self._load(nbi)
        p = int(np.searchsorted(self.dids, did, side="left"))
        if p >= self.dids.shape[0]:
            self._load(self.bi + 1)
        else:
            self.pos = p

    def advance(self):
        self.pos += 1
        if self.pos >= self.dids.shape[0]:
            self._load(self.bi + 1)


def _safe_bound(vals: list[int]) -> int:
    """Max possible sum over any NON-EMPTY subset of ``vals``.

    Classic WAND assumes non-negative term upper bounds; the reference BM25
    has unsmoothed IDF, so terms with df > N/2 carry NEGATIVE quantized
    scores and plain prefix sums would under-estimate (a doc in a strict
    subset of lists can outscore the full sum). The safe bound is the sum of
    the positive maxes, or the single largest max when all are negative.
    Monotone non-decreasing as lists are added → the pivot rule stays sound.
    """
    pos = 0
    best = -(1 << 62)
    has_pos = False
    for v in vals:
        if v > 0:
            pos += v
            has_pos = True
        if v > best:
            best = v
    return pos if has_pos else best


def topk_bmwand(segments: list[Segment], k: int):
    """Block-Max WAND (Ding & Suel 2011 semantics), exact top-k.

    Pruning is strict (< threshold), never on equality, so ties are always
    fully evaluated and the (score desc, doc_id asc) order is exact.
    Negative-score-safe (see :func:`_safe_bound`).
    """
    cursors = [_Cursor(s) for s in segments if s.n_blocks > 0]
    if not cursors:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    heap: list[tuple[int, int]] = []  # (score, -doc_id) min-heap of top-k
    threshold = -(1 << 62)

    def push(did: int, score: int):
        nonlocal threshold
        item = (score, -did)
        if len(heap) < k:
            heapq.heappush(heap, item)
            if len(heap) == k:
                threshold = heap[0][0]
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
            threshold = heap[0][0]

    while True:
        live = [c for c in cursors if not c.exhausted]
        if not live:
            break
        live.sort(key=lambda c: c.cur_did)
        # pivot: first list where the cumulative safe upper bound could
        # still reach the threshold. Pruning is strict (>=) so tied scores
        # are always evaluated (doc_id tie-break must stay exact).
        maxes: list[int] = []
        pivot = -1
        for i, c in enumerate(live):
            maxes.append(c.max_score)
            if len(heap) < k or _safe_bound(maxes) >= threshold:
                pivot = i
                break
        if pivot < 0:
            break  # even all lists together can't reach the threshold
        pivot_did = live[pivot].cur_did
        # extend pivot across lists tied on pivot_did: they contribute to
        # the doc's score and must be in the bound before any prune
        while pivot + 1 < len(live) and live[pivot + 1].cur_did == pivot_did:
            pivot += 1
        # block-max refinement: bound with the max of the block that would
        # contain pivot_did in each list (metadata only, no decode)
        bm_sum = _safe_bound(
            [c.block_max_for(pivot_did) for c in live[: pivot + 1]])
        if len(heap) == k and bm_sum < threshold:
            # No doc in [pivot_did, boundary] can make top-k: every list's
            # covering block ends at >= boundary, so scores there are bounded
            # by bm_sum. Jump past the smallest block boundary — the
            # block-max skip of the north star.
            boundary = min(c.block_last_for(pivot_did)
                           for c in live[: pivot + 1])
            target = boundary + 1
            if pivot + 1 < len(live):
                target = min(target, live[pivot + 1].cur_did)
            target = max(target, pivot_did + 1)
            for c in live[: pivot + 1]:
                c.next_geq(target)
            continue
        if live[0].cur_did == pivot_did:
            # all lists up to pivot aligned on pivot_did → score it fully
            score = 0
            for c in live:
                if not c.exhausted and c.cur_did == pivot_did:
                    score += c.cur_score
            push(pivot_did, score)
            for c in live:
                if not c.exhausted and c.cur_did == pivot_did:
                    c.advance()
        else:
            # align lists before the pivot onto pivot_did
            for c in live[:pivot]:
                c.next_geq(pivot_did)
    if not heap:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    items = sorted(heap, key=lambda t: (-t[0], -t[1]))
    dids = np.array([-d for _, d in items], dtype=np.int64)
    scs = np.array([s for s, _ in items], dtype=np.int64)
    return dids, scs


# Python-loop WAND costs ~50× the vectorized per-posting cost, so pruning
# must be able to skip ≳98% of postings to win. That requires (a) positive
# upper bounds everywhere (negative-IDF stopword lists weaken the safe
# bound) and (b) strong length skew: a short list drives the pivot while the
# long lists get skipped block-wise.
WAND_STEP_FACTOR = 50
WAND_MIN_TOTAL = 100_000


def topk_auto(segments: list[Segment], k: int):
    """Physical-strategy dispatch; both kernels return identical results
    (asserted in tests), so this is pure cost-based plan choice — the
    engine-side analogue of Catalyst picking broadcast vs shuffle join."""
    if not segments:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    dfs = [int(s.df) for s in segments]
    total = sum(dfs)
    positive = all(int(np.max(s.block_max)) > 0
                   for s in segments if s.n_blocks > 0)
    if positive and total >= WAND_MIN_TOTAL \
            and min(dfs) * WAND_STEP_FACTOR < total:
        return topk_bmwand(segments, k)
    return topk_exhaustive(segments, k)


def _kernel(use_wand) -> "callable":
    if use_wand == "auto":
        return topk_auto
    return topk_bmwand if use_wand else topk_exhaustive


class _CachingSegment:
    """Segment wrapper memoizing block decodes — queries sharing a term in
    the same worker decode each block once (the reference keeps loaded
    top-layer arrays resident across queries, algo_toplayer.cpp:393-474)."""

    __slots__ = ("seg", "_blocks")

    def __init__(self, seg: Segment):
        self.seg = seg
        self._blocks: dict[int, tuple] = {}

    def __getattr__(self, name):
        return getattr(self.seg, name)

    def decode_block(self, i: int):
        b = self._blocks.get(i)
        if b is None:
            b = self.seg.decode_block(i)
            self._blocks[i] = b
        return b

    def decode_all(self):
        parts = [self.decode_block(i) for i in range(self.seg.n_blocks)]
        if not parts:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        return tuple(np.concatenate(cols) for cols in zip(*parts))

    def first_block_geq(self, did: int) -> int:
        return self.seg.first_block_geq(did)


# per-worker cache of broadcast segment dicts (python workers are reused
# across tasks, so hot lists decode once per executor, not once per task)
_BC_SEGMENTS: dict[int, dict[str, _CachingSegment]] = {}


def _query_group(pdf: pd.DataFrame, k: int, use_wand) -> pd.DataFrame:
    qid = int(pdf["qid"].iloc[0])
    segs = [segment_from_row(row) for _, row in pdf.iterrows()]
    fn = _kernel(use_wand)
    dids, scs = fn(segs, k)
    n = dids.shape[0]
    return pd.DataFrame({
        "qid": np.full(n, qid, dtype=np.int64),
        "rank": np.arange(n, dtype=np.int32),
        "doc_id": dids,
        "score_q": scs,
    })


def wand_topk(segments: DataFrame, queries: DataFrame, k: int = 10,
              use_wand="auto", mode: str = "join") -> DataFrame:
    """queries (qid, terms array<string>) × segments → (qid, rank, doc_id,
    score_q). Queries whose terms all miss the index produce no rows.

    Two physical strategies (same results, asserted in tests):

    - ``mode="join"``: broadcast the exploded query terms, hash-join against
      the segment table, groupBy(qid). Segments never shuffle for the join,
      but each query gets its own copy of its terms' blobs in the final
      exchange — right when the term universe is huge and queries are few
      or disjoint (ad-hoc analytics over a 10^12-file index).
    - ``mode="broadcast"``: collect only the segments matching the batch's
      term set, broadcast once, fan queries out with mapInPandas. No
      per-query blob duplication, per-worker decode caching — right for
      query serving where batches share a bounded working set (hot lists
      ship once per executor instead of once per query).
    """
    from .config import ensure_on_executors
    ensure_on_executors(segments.sparkSession)
    if mode == "broadcast":
        return _wand_topk_broadcast(segments, queries, k, use_wand)
    qterms = queries.select(
        F.col("qid").cast("long").alias("qid"),
        F.explode("terms").alias("term"),
    ).distinct()
    matched = segments.join(F.broadcast(qterms), "term")
    return matched.groupBy("qid").applyInPandas(
        lambda pdf: _query_group(pdf, k, use_wand), schema=RESULT_SCHEMA)


class PreparedIndex:
    """A query-serving handle: the working set of segments is collected and
    broadcast ONCE, then any number of query batches run against it — the
    steady-state serving shape (the reference's C++ engine likewise loads
    its top-layer arrays once per query set, algo_toplayer.cpp:393-474)."""

    def __init__(self, spark: SparkSession, bc):
        self.spark = spark
        self.bc = bc


def prepare_index(segments: DataFrame,
                  terms: list[str] | None = None) -> PreparedIndex:
    """Collect + broadcast the segments for ``terms`` (None = all — only
    for small indexes)."""
    from pyspark.sql import SparkSession  # noqa: F401
    spark = segments.sparkSession
    seg = segments if terms is None else \
        segments.where(F.col("term").isin(sorted(set(terms))))
    rows = seg.collect()
    payload = [(r["term"], {f: r[f] for f in
                            ("df", "did_blob", "score_blob", "tf_blob",
                             "block_last", "block_max", "block_n",
                             "did_off", "score_off", "tf_off")})
               for r in rows]
    return PreparedIndex(spark, spark.sparkContext.broadcast(payload))


def wand_topk_prepared(prep: PreparedIndex, queries: DataFrame, k: int = 10,
                       use_wand="auto") -> DataFrame:
    """Serve a query batch against a PreparedIndex (no driver-side work
    besides plan submission)."""
    bc = prep.bc

    def run(batches):
        val = bc.value
        key = id(val)
        hit = _BC_SEGMENTS.get(key)
        # the cache pins `val`, so a live entry's id cannot be reused by a
        # different broadcast value (identity check guards the impossible)
        if hit is not None and hit[0] is val:
            segs = hit[1]
        else:
            segs = {t: _CachingSegment(Segment(**d)) for t, d in val}
            _BC_SEGMENTS.clear()  # one live batch per worker is enough
            _BC_SEGMENTS[key] = (val, segs)
        fn = _kernel(use_wand)
        for pdf in batches:
            out = []
            for qid, qterms in zip(pdf["qid"], pdf["terms"]):
                qsegs = [segs[t] for t in dict.fromkeys(qterms) if t in segs]
                dids, scs = fn(qsegs, k)
                n = dids.shape[0]
                out.append(pd.DataFrame({
                    "qid": np.full(n, qid, dtype=np.int64),
                    "rank": np.arange(n, dtype=np.int32),
                    "doc_id": dids, "score_q": scs}))
            yield (pd.concat(out, ignore_index=True) if out
                   else pd.DataFrame({"qid": [], "rank": [], "doc_id": [],
                                      "score_q": []}))

    return queries.select(F.col("qid").cast("long").alias("qid"), "terms") \
                  .mapInPandas(run, schema=RESULT_SCHEMA)


def _wand_topk_broadcast(segments: DataFrame, queries: DataFrame,
                         k: int, use_wand) -> DataFrame:
    terms = sorted({t for r in queries.select("terms").collect()
                    for t in (r["terms"] or [])})
    prep = prepare_index(segments, terms)
    return wand_topk_prepared(prep, queries, k, use_wand)
