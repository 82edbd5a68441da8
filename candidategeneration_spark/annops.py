"""Similarity search over an embedding column (array<float>).

Two paths per the task brief:
- brute-force top-k (the correctness baseline) — exact integer dot product
  over quantized vectors so the DuckDB oracle matches bit-for-bit;
- LSH-bucketed variant (the scale path) — deterministic integer random-
  hyperplane signs; at 100 TB the bucket equi-join replaces the cross join
  (candidates share a bucket; probe multiple buckets for recall).

Quantization contract (shared with the SQL oracles): q(x) = CAST(round(x *
1000) AS BIGINT) per component. Integer dot products are associative →
order-independent → identical across engines; true cosine over floats is
NOT (FP addition order), which is why the oracle-checked entries use the
quantized form. ``cosine_topk_pandas`` provides the float path (vectorized
NumPy over mapInPandas) for production use where bit-exactness vs an
external engine is not required.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

QUANT = 1000
N_PLANES = 8


def quantized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn(
        "qvec", F.transform(F.col(vec_col),
                            lambda x: F.round(x * QUANT).cast("long")))


def _int_dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


def brute_topk(emb: DataFrame, n_probes: int = 10, k: int = 10) -> DataFrame:
    """(qid, rank, vec_id, score_q): exact quantized-dot-product top-k of
    every other vector for the first ``n_probes`` vec_ids.

    The probe side is broadcast (tiny); the corpus side never shuffles
    until the per-qid top-k aggregation — at scale replace the final window
    with a TakeOrderedAndProject per probe (k small)."""
    q = quantized(emb)
    probes = q.where(F.col("vec_id") < n_probes) \
              .select(F.col("vec_id").alias("qid"),
                      F.col("qvec").alias("qv"))
    scored = (q.crossJoin(F.broadcast(probes))
                .where(F.col("vec_id") != F.col("qid"))
                .select("qid", "vec_id",
                        _int_dot(F.col("qvec"), F.col("qv")).alias("score_q")))
    from pyspark.sql import Window
    w = Window.partitionBy("qid").orderBy(F.desc("score_q"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w) - 1)
                  .where(F.col("rank") < k)
                  .select("qid", F.col("rank").cast("long").alias("rank"),
                          "vec_id", "score_q"))


def lsh_buckets(emb: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, bucket): sign-random-projection bucket id.

    Hyperplane j component i = ((i*7 + j*13) % 11) - 5 — deterministic
    integers, identical in the SQL oracle. bucket = Σ 2^j·[dot_j ≥ 0]."""
    q = quantized(emb)
    planes = emb.sparkSession.range(n_planes).select(
        F.col("id").alias("plane"),
        F.expr("transform(sequence(0, 63),"
               " i -> CAST((i*7 + id*13) % 11 - 5 AS BIGINT))").alias("pv"))
    dots = (q.crossJoin(F.broadcast(planes))
             .select("vec_id", "plane",
                     _int_dot(F.col("qvec"), F.col("pv")).alias("dot")))
    return (dots.groupBy("vec_id")
            .agg(F.sum(F.when(F.col("dot") >= 0,
                              F.expr("shiftleft(1L, cast(plane as int))"))
                       .otherwise(F.lit(0))).alias("bucket"))
            .select("vec_id", F.col("bucket").cast("long").alias("bucket")))


def lsh_topk(emb: DataFrame, n_probes: int = 10, k: int = 10,
             n_planes: int = N_PLANES) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's LSH bucket.

    Same output shape as brute_topk; recall < 1 by construction. The bucket
    equi-join is the piece that scales (no cross join)."""
    q = quantized(emb).join(lsh_buckets(emb, n_planes), "vec_id")
    probes = q.where(F.col("vec_id") < n_probes) \
              .select(F.col("vec_id").alias("qid"),
                      F.col("qvec").alias("qv"), "bucket")
    scored = (q.join(F.broadcast(probes), "bucket")
                .where(F.col("vec_id") != F.col("qid"))
                .select("qid", "vec_id",
                        _int_dot(F.col("qvec"), F.col("qv")).alias("score_q")))
    from pyspark.sql import Window
    w = Window.partitionBy("qid").orderBy(F.desc("score_q"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w) - 1)
                  .where(F.col("rank") < k)
                  .select("qid", F.col("rank").cast("long").alias("rank"),
                          "vec_id", "score_q"))


# ---------------------------------------------------------------------------
# IVF (inverted-file) coarse quantizer — the second scale path beside LSH.
# Deterministic integer k-means: centroids init from the first IVF_K
# vectors, exactly IVF_ITERS Lloyd iterations, all arithmetic exact
# (int64 squared-L2; centroid update = floor(mean) via double division of
# small int sums — IEEE-exact, identical in the SQL oracle); assignment
# tie-break (dist, cid) ascending. Query probes its IVF_NPROBE nearest
# cells and scores only their members — at corpus scale the cell
# equi-join replaces the cross join, like a FAISS IVF-Flat index.
# ---------------------------------------------------------------------------

IVF_K = 8
IVF_ITERS = 2
IVF_NPROBE = 2


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def _assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cid): nearest centroid by exact int squared-L2,
    ties to the smallest cid."""
    from pyspark.sql import Window
    d = (q.crossJoin(F.broadcast(cents))
          .select("vec_id", "cid",
                  _sqdist(F.col("qvec"), F.col("cv")).alias("dist")))
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cid"))
    return (d.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1).select("vec_id", "cid"))


def ivf_centroids(emb: DataFrame, k: int = IVF_K,
                  iters: int = IVF_ITERS) -> DataFrame:
    """(cid, cv array<long>): deterministic k-means centroids."""
    q = quantized(emb).select("vec_id", "qvec")
    cents = q.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("qvec").alias("cv"))
    for _ in range(iters):
        assigned = _assign(q, cents)
        comp = (q.join(assigned, "vec_id")
                 .select("cid", F.posexplode("qvec").alias("i", "x")))
        upd = (comp.groupBy("cid", "i")
               .agg(F.floor(F.sum("x").cast("double") / F.count("*"))
                    .cast("long").alias("cx")))
        # checkpoint each Lloyd iteration: the next _assign broadcasts
        # this table, and an unbroken lineage re-executes every previous
        # iteration's subtree per broadcast (measured 139 s for the 50k
        # stress vs ~6 s checkpointed)
        cents = (upd.groupBy("cid")
                 .agg(F.array_sort(F.collect_list(F.struct("i", "cx")))
                      .alias("s"))
                 .select("cid", F.col("s.cx").alias("cv"))
                 .localCheckpoint())
        # empty cells keep no row → their cid simply disappears (same
        # semantics in the oracle: GROUP BY only over assigned members)
    # iters=0: the init slice never went through the loop's checkpoint
    return cents if iters > 0 else cents.localCheckpoint()


def ivf_cells(emb: DataFrame, k: int = IVF_K,
              iters: int = IVF_ITERS) -> DataFrame:
    """(vec_id, cid): final cell assignment — the inverted file."""
    q = quantized(emb).select("vec_id", "qvec")
    return _assign(q, ivf_centroids(emb, k, iters))


def ivf_topk(emb: DataFrame, n_probes: int = 10, topk: int = 10,
             k: int = IVF_K, iters: int = IVF_ITERS,
             nprobe: int = IVF_NPROBE) -> DataFrame:
    """(qid, rank, vec_id, score_q): probe the ``nprobe`` nearest cells,
    exact integer dot product over their members only. Recall < 1 by
    construction (same contract as lsh_topk); the cell equi-join is the
    piece that scales."""
    from pyspark.sql import Window
    q = quantized(emb).select("vec_id", "qvec")
    # the k-rows centroid table feeds both the cell assignment and the
    # probe scoring; ivf_centroids returns it already checkpointed (the
    # Lloyd loop checkpoints per iteration), so consumers share one
    # materialized leaf — no re-run, no nested plan
    cents = ivf_centroids(emb, k, iters)
    cells = _assign(q, cents)
    probes = q.where(F.col("vec_id") < n_probes) \
              .select(F.col("vec_id").alias("qid"), F.col("qvec").alias("qv"))
    pd_ = (probes.crossJoin(F.broadcast(cents))
           .select("qid", "qv", "cid",
                   _sqdist(F.col("qv"), F.col("cv")).alias("dist")))
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("cid"))
    probe_cells = (pd_.withColumn("rn", F.row_number().over(w))
                   .where(F.col("rn") <= nprobe).select("qid", "qv", "cid"))
    members = q.join(cells, "vec_id")
    scored = (members.join(probe_cells, "cid")
              .where(F.col("vec_id") != F.col("qid"))
              .select("qid", "vec_id",
                      _int_dot(F.col("qvec"), F.col("qv")).alias("score_q")))
    w2 = Window.partitionBy("qid").orderBy(F.desc("score_q"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w2) - 1)
            .where(F.col("rank") < topk)
            .select("qid", F.col("rank").cast("long").alias("rank"),
                    "vec_id", "score_q"))


def cosine_topk_pandas(emb: DataFrame, n_probes: int = 10,
                       k: int = 10) -> DataFrame:
    """Float cosine top-k via vectorized NumPy (matrix multiply per Arrow
    batch) — the production fast path; not oracle-bit-exact by design."""
    probes_pd = (emb.where(F.col("vec_id") < n_probes)
                    .select("vec_id", "embedding").toPandas())
    qids = probes_pd["vec_id"].to_numpy(np.int64)
    qm = np.stack(probes_pd["embedding"].to_numpy()).astype(np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    spark = emb.sparkSession
    bq = spark.sparkContext.broadcast((qids, qm))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qm_ = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            vm = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            vm /= np.maximum(np.linalg.norm(vm, axis=1, keepdims=True), 1e-12)
            sims = vm @ qm_.T  # (batch, probes)
            n = len(pdf)
            out = pd.DataFrame({
                "qid": np.repeat(qids_, n),
                "vec_id": np.tile(pdf["vec_id"].to_numpy(np.int64),
                                  len(qids_)),
                "cos": sims.T.reshape(-1),
            })
            yield out[out.qid != out.vec_id]

    scored = emb.select("vec_id", "embedding").mapInPandas(
        score, schema="qid long, vec_id long, cos double")
    from pyspark.sql import Window
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w) - 1)
                  .where(F.col("rank") < k))


def near_dup_pairs(emb: DataFrame, num: int = 49, den: int = 400,
                   n_planes: int = N_PLANES,
                   band_bits: int = 2) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS — the dedup-family member over
    the embedding column: banded-LSH candidate generation + an EXACT
    integer cosine-threshold test, cos(a,b) ≥ sqrt(num/den), evaluated
    without floats as ``dot ≥ 0 AND den·dot² ≥ num·‖a‖²·‖b‖²`` on the
    quantized vectors (associative integer products — identical in the
    DuckDB oracle).

    Candidates: the ``n_planes``-bit sign signature (lsh_buckets) is cut
    into ``n_planes/band_bits`` bands of ``band_bits`` bits; two vectors
    are candidates iff ANY band matches (classic banding S-curve — pick
    band_bits/n_planes for the target threshold; at a true near-dup
    threshold (cos ≥ .9+) use 32-64 planes and 8-16-bit bands so bucket
    sizes stay bounded). The band equi-join replaces the all-pairs cross
    join — the piece that scales. Returns (vec_id_a, vec_id_b, dot_q).

    Overflow bound: den·dot² and num·na2·nb2 stay inside int64 for
    dim ≤ 64, |x| ≤ 1, QUANT=1000, den ≤ 400 (dot ≤ 6.4e7 →
    den·dot² ≤ 1.6e18 < 2^63)."""
    assert n_planes % band_bits == 0
    sig = lsh_buckets(emb, n_planes)
    bands = emb.sparkSession.range(n_planes // band_bits).select(
        F.col("id").alias("band"))
    mask = (1 << band_bits) - 1
    bb = (sig.crossJoin(F.broadcast(bands))
          .select("vec_id", "band",
                  F.expr(f"shiftright(bucket, cast(band * {band_bits} as int))"
                         f" & {mask}").alias("bkey")))
    cand = (bb.alias("x").join(
                bb.alias("y"),
                (F.col("x.band") == F.col("y.band")) &
                (F.col("x.bkey") == F.col("y.bkey")) &
                (F.col("x.vec_id") < F.col("y.vec_id")))
            .select(F.col("x.vec_id").alias("vec_id_a"),
                    F.col("y.vec_id").alias("vec_id_b"))
            .distinct())
    q = quantized(emb).select(
        "vec_id", "qvec",
        _int_dot(F.col("qvec"), F.col("qvec")).alias("n2"))
    pairs = (cand
             .join(q.select(F.col("vec_id").alias("vec_id_a"),
                            F.col("qvec").alias("va"),
                            F.col("n2").alias("na2")), "vec_id_a")
             .join(q.select(F.col("vec_id").alias("vec_id_b"),
                            F.col("qvec").alias("vb"),
                            F.col("n2").alias("nb2")), "vec_id_b"))
    return (pairs.withColumn("dot_q", _int_dot(F.col("va"), F.col("vb")))
            .where((F.col("dot_q") >= 0) &
                   (F.lit(int(den)) * F.col("dot_q") * F.col("dot_q") >=
                    F.lit(int(num)) * F.col("na2") * F.col("nb2")))
            .select("vec_id_a", "vec_id_b",
                    F.col("dot_q").cast("long").alias("dot_q")))


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the third scale path: FAISS-PQ shape.
# Vectors are split into PQ_M contiguous subspaces; each subspace gets its
# own deterministic integer k-means codebook (same recipe as the IVF
# coarse quantizer: init from the first PQ_KSUB vectors, PQ_ITERS Lloyd
# iterations, exact int squared-L2, (dist, cid) tie-break, floor-mean
# updates). A vector is stored as PQ_M small codes; queries score by
# Asymmetric Distance Computation (ADC): one tiny (probe, subspace, code)
# dot-product table — n_probes·M·ksub rows, always broadcastable — joined
# to the codes on (m, code) and summed per (qid, vec_id). At 100 TB the
# corpus side carries M bytes per vector instead of the raw embedding and
# never shuffles raw vectors at query time.
# ---------------------------------------------------------------------------

PQ_M = 4          # subspaces
PQ_DSUB = 16      # dims per subspace (PQ_M * PQ_DSUB = 64)
PQ_KSUB = 8       # codes per subspace codebook
PQ_ITERS = 2


def _subspaces(q: DataFrame, m_count: int = PQ_M,
               dsub: int = PQ_DSUB) -> DataFrame:
    """(vec_id, m, sv): the m-th length-``dsub`` slice of each qvec."""
    parts = [q.select("vec_id", F.lit(m).cast("long").alias("m"),
                      F.slice("qvec", m * dsub + 1, dsub).alias("sv"))
             for m in range(m_count)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _passign(sub: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, m, cid): nearest sub-centroid per subspace, exact int
    squared-L2, ties to the smallest cid."""
    from pyspark.sql import Window
    d = (sub.join(F.broadcast(cents), "m")
            .select("vec_id", "m", "cid",
                    _sqdist(F.col("sv"), F.col("cv")).alias("dist")))
    w = Window.partitionBy("vec_id", "m").orderBy(F.asc("dist"), F.asc("cid"))
    return (d.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1).select("vec_id", "m", "cid"))


def _pq_train(sub: DataFrame, ksub: int = PQ_KSUB,
              iters: int = PQ_ITERS) -> DataFrame:
    """(m, cid, cv): per-subspace k-means codebooks trained on an
    arbitrary (vec_id, m, sv) subspace frame (raw slices for flat PQ,
    residual slices for IVF-PQ)."""
    cents = sub.where(F.col("vec_id") < ksub).select(
        "m", F.col("vec_id").alias("cid"), F.col("sv").alias("cv"))
    for _ in range(iters):
        assigned = _passign(sub, cents)
        comp = (sub.join(assigned, ["vec_id", "m"])
                   .select("m", "cid", F.posexplode("sv").alias("i", "x")))
        upd = (comp.groupBy("m", "cid", "i")
               .agg(F.floor(F.sum("x").cast("double") / F.count("*"))
                    .cast("long").alias("cx")))
        # same per-iteration checkpoint as ivf_centroids: cut the
        # re-broadcast lineage between Lloyd iterations
        cents = (upd.groupBy("m", "cid")
                 .agg(F.array_sort(F.collect_list(F.struct("i", "cx")))
                      .alias("s"))
                 .select("m", "cid", F.col("s.cx").alias("cv"))
                 .localCheckpoint())
    return cents if iters > 0 else cents.localCheckpoint()


def pq_codebooks(emb: DataFrame, m_count: int = PQ_M, dsub: int = PQ_DSUB,
                 ksub: int = PQ_KSUB, iters: int = PQ_ITERS) -> DataFrame:
    """(m, cid, cv array<long>): per-subspace k-means codebooks."""
    sub = _subspaces(quantized(emb).select("vec_id", "qvec"), m_count, dsub)
    return _pq_train(sub, ksub, iters)


def pq_codes(emb: DataFrame, m_count: int = PQ_M, dsub: int = PQ_DSUB,
             ksub: int = PQ_KSUB, iters: int = PQ_ITERS) -> DataFrame:
    """(vec_id, m, code): the stored PQ encoding — M codes per vector."""
    sub = _subspaces(quantized(emb).select("vec_id", "qvec"), m_count, dsub)
    books = pq_codebooks(emb, m_count, dsub, ksub, iters)
    return _passign(sub, books).select(
        "vec_id", "m", F.col("cid").cast("long").alias("code"))


def pq_adc_topk(emb: DataFrame, n_probes: int = 10, topk: int = 10,
                m_count: int = PQ_M, dsub: int = PQ_DSUB,
                ksub: int = PQ_KSUB, iters: int = PQ_ITERS) -> DataFrame:
    """(qid, rank, vec_id, score_q): ADC top-k over PQ codes.

    score_q = Σ_m dot(query subvector m, codebook[m][code_m(vec)]) — the
    PQ approximation of the full dot product. The per-query work against
    the corpus is ONE broadcast-hash equi-join of the code table with the
    n_probes·M·ksub ADC table plus a per-(qid, vec_id) sum — no raw
    vectors move. Approximate by construction (same contract as
    lsh_topk / ivf_topk: recall measured in test_ann_recall)."""
    from pyspark.sql import Window
    q = quantized(emb).select("vec_id", "qvec")
    sub = _subspaces(q, m_count, dsub)
    # train ONCE: _pq_train returns the codebooks already checkpointed,
    # so every consumer below shares one materialized leaf instead of
    # re-executing the Lloyd lineage per reference
    books = _pq_train(sub, ksub, iters)
    codes = _passign(sub, books).select(
        "vec_id", "m", F.col("cid").alias("code"))
    probes = _subspaces(q.where(F.col("vec_id") < n_probes), m_count, dsub) \
        .select(F.col("vec_id").alias("qid"), "m", F.col("sv").alias("qsv"))
    adc = (probes.join(books, "m")
           .select("qid", "m", F.col("cid").alias("code"),
                   _int_dot(F.col("qsv"), F.col("cv")).alias("t")))
    scored = (codes.join(F.broadcast(adc), ["m", "code"])
              .where(F.col("vec_id") != F.col("qid"))
              .groupBy("qid", "vec_id")
              .agg(F.sum("t").cast("long").alias("score_q")))
    w = Window.partitionBy("qid").orderBy(F.desc("score_q"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w) - 1)
            .where(F.col("rank") < topk)
            .select("qid", F.col("rank").cast("long").alias("rank"),
                    "vec_id", "score_q"))


# ---------------------------------------------------------------------------
# IVF-PQ composite — the FAISS-IVFPQ shape, the index actually deployed at
# 100 TB: the IVF coarse quantizer prunes the corpus to nprobe cells, and
# within them vectors are represented by PQ codes of their RESIDUAL
# (qvec - centroid). Inner-product scoring decomposes exactly:
#   dot(q, x) ≈ dot(q, cv[cell(x)]) + Σ_m dot(q_m, codebook[m][code_m(x)])
# (first term per probed cell, second from one broadcast ADC table), so
# query time touches M bytes per candidate and no raw corpus vector ever
# moves. All arithmetic stays in the exact-integer contract, so the DuckDB
# oracle matches bit-for-bit.
# ---------------------------------------------------------------------------


def _residuals(q: DataFrame, cents: DataFrame, cells: DataFrame) -> DataFrame:
    """(vec_id, qvec): residual vectors qvec - centroid[cell]."""
    return (q.join(cells, "vec_id").join(F.broadcast(cents), "cid")
            .select("vec_id",
                    F.zip_with("qvec", "cv",
                               lambda x, y: x - y).alias("qvec")))


def ivfpq_codes(emb: DataFrame, k: int = IVF_K, iters: int = IVF_ITERS,
                m_count: int = PQ_M, dsub: int = PQ_DSUB,
                ksub: int = PQ_KSUB, pq_iters: int = PQ_ITERS) -> DataFrame:
    """(vec_id, cid, m, code): the stored IVF-PQ encoding — coarse cell id
    plus M residual codes per vector."""
    q = quantized(emb).select("vec_id", "qvec")
    cents = ivf_centroids(emb, k, iters)
    cells = _assign(q, cents).localCheckpoint()
    rsub = _subspaces(_residuals(q, cents, cells), m_count, dsub)
    books = _pq_train(rsub, ksub, pq_iters)
    codes = _passign(rsub, books).select(
        "vec_id", "m", F.col("cid").alias("code"))
    return (codes.join(cells, "vec_id")
            .select("vec_id", F.col("cid").cast("long").alias("cid"), "m",
                    F.col("code").cast("long").alias("code")))


def ivfpq_topk(emb: DataFrame, n_probes: int = 10, topk: int = 10,
               k: int = IVF_K, iters: int = IVF_ITERS,
               nprobe: int = IVF_NPROBE, m_count: int = PQ_M,
               dsub: int = PQ_DSUB, ksub: int = PQ_KSUB,
               pq_iters: int = PQ_ITERS) -> DataFrame:
    """(qid, rank, vec_id, score_q): IVF-PQ ADC top-k.

    score_q = dot(q, centroid[cell]) + Σ_m dot(q_m, residual codebook
    entry) over members of the query's ``nprobe`` nearest cells only.
    Scale shape: candidates come from the cell equi-join (IVF pruning),
    each candidate costs one M-row broadcast ADC join (PQ compression) —
    never a cross join, never a raw-vector shuffle. Approximate by
    construction (recall measured in test_ann_recall)."""
    from pyspark.sql import Window
    q = quantized(emb).select("vec_id", "qvec")
    # training artifacts feed multiple consumers (centroids: cell
    # assignment + residuals + probe scoring; cells: residuals +
    # candidates) — each must be a materialized leaf or the analyzed
    # plan nests the k-means subtree hundreds of times (persist alone
    # would cut only the runtime, not the plan). The training functions
    # checkpoint their own return; cells needs it at this call site.
    cents = ivf_centroids(emb, k, iters)
    cells = _assign(q, cents).localCheckpoint()
    rsub = _subspaces(_residuals(q, cents, cells), m_count, dsub)
    books = _pq_train(rsub, ksub, pq_iters)
    codes = _passign(rsub, books).select(
        "vec_id", "m", F.col("cid").alias("code"))

    probes = q.where(F.col("vec_id") < n_probes) \
              .select(F.col("vec_id").alias("qid"), F.col("qvec").alias("qv"))
    pcd = (probes.crossJoin(F.broadcast(cents))
           .select("qid", "qv", "cid",
                   _sqdist(F.col("qv"), F.col("cv")).alias("dist"),
                   _int_dot(F.col("qv"), F.col("cv")).alias("term1")))
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("cid"))
    pcell = (pcd.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") <= nprobe).select("qid", "cid", "term1"))

    qsub = _subspaces(
        q.where(F.col("vec_id") < n_probes), m_count, dsub) \
        .select(F.col("vec_id").alias("qid"), "m", F.col("sv").alias("qsv"))
    adc = (qsub.join(books, "m")
           .select("qid", "m", F.col("cid").alias("code"),
                   _int_dot(F.col("qsv"), F.col("cv")).alias("t")))

    cand = (cells.join(F.broadcast(pcell), "cid")
            .where(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id", "term1"))
    scored = (cand.join(codes, "vec_id")
              .join(F.broadcast(adc), ["qid", "m", "code"])
              .groupBy("qid", "vec_id")
              .agg((F.max("term1") + F.sum("t")).cast("long")
                   .alias("score_q")))
    w2 = Window.partitionBy("qid").orderBy(F.desc("score_q"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w2) - 1)
            .where(F.col("rank") < topk)
            .select("qid", F.col("rank").cast("long").alias("rank"),
                    "vec_id", "score_q"))


# ---------------------------------------------------------------------------
# PQ index persistence — build once, query many. The topk entry points
# above train inline (self-contained for the oracle gates); a deployment
# trains once, stores codes + codebooks like the text engine stores
# segments, and serves queries that need NOT be corpus members.
# ---------------------------------------------------------------------------


def save_pq_index(emb: DataFrame, path: str, m_count: int = PQ_M,
                  dsub: int = PQ_DSUB, ksub: int = PQ_KSUB,
                  iters: int = PQ_ITERS) -> None:
    """Train and store the PQ index: ``<path>/books`` (m, cid, cv) and
    ``<path>/codes`` (vec_id, m, code) as plain parquet (M rows per
    vector — the compressed corpus representation). A serving deployment
    that co-locates the ADC join should store codes via
    ``sources.bucketed.save_bucketed(codes, ..., key="vec_id")``
    instead — plain parquet re-shuffles the code table per query
    batch."""
    q = quantized(emb).select("vec_id", "qvec")
    sub = _subspaces(q, m_count, dsub)
    books = _pq_train(sub, ksub, iters)
    codes = _passign(sub, books).select(
        "vec_id", "m", F.col("cid").alias("code"))
    books.write.mode("overwrite").parquet(f"{path}/books")
    codes.write.mode("overwrite").parquet(f"{path}/codes")


def load_pq_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(books, codes) back from :func:`save_pq_index`."""
    return (spark.read.parquet(f"{path}/books"),
            spark.read.parquet(f"{path}/codes"))


def pq_adc_topk_prepared(books: DataFrame, codes: DataFrame,
                         queries: DataFrame, topk: int = 10,
                         m_count: int = PQ_M,
                         dsub: int = PQ_DSUB) -> DataFrame:
    """(qid, rank, vec_id, score_q): ADC top-k of a STORED index for
    external queries (qid, embedding) — the queries need not be corpus
    members. Per query batch the work is one broadcast of the tiny ADC
    table (|queries|·M·ksub rows) against the stored code table; the raw
    corpus vectors are never read at all — the serving property that
    matters when the corpus is 100 TB and the codes are M bytes/vector."""
    from pyspark.sql import Window
    qv = quantized(queries).select(F.col("qid").cast("long").alias("qid"),
                                   "qvec")
    qsub = _subspaces(qv.withColumnRenamed("qid", "vec_id"),
                      m_count, dsub) \
        .select(F.col("vec_id").alias("qid"), "m", F.col("sv").alias("qsv"))
    adc = (qsub.join(books, "m")
           .select("qid", "m", F.col("cid").alias("code"),
                   _int_dot(F.col("qsv"), F.col("cv")).alias("t")))
    scored = (codes.join(F.broadcast(adc), ["m", "code"])
              .groupBy("qid", "vec_id")
              .agg(F.sum("t").cast("long").alias("score_q")))
    w = Window.partitionBy("qid").orderBy(F.desc("score_q"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w) - 1)
            .where(F.col("rank") < topk)
            .select("qid", F.col("rank").cast("long").alias("rank"),
                    "vec_id", "score_q"))


def save_ivf_index(emb: DataFrame, path: str, k: int = IVF_K,
                   iters: int = IVF_ITERS) -> None:
    """Train and store the IVF-Flat index: ``<path>/cents`` (cid, cv) and
    ``<path>/cells`` (vec_id, cid, qvec) — the inverted file keeps the
    quantized vector per member (Flat = exact scoring inside probed
    cells). At deployment scale write cells via sources.bucketed keyed
    on cid so a probe reads only its buckets."""
    q = quantized(emb).select("vec_id", "qvec")
    cents = ivf_centroids(emb, k, iters)
    cells = _assign(q, cents).join(q, "vec_id")
    cents.write.mode("overwrite").parquet(f"{path}/cents")
    cells.write.mode("overwrite").parquet(f"{path}/cells")


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(cents, cells) back from :func:`save_ivf_index`."""
    return (spark.read.parquet(f"{path}/cents"),
            spark.read.parquet(f"{path}/cells"))


def ivf_topk_prepared(cents: DataFrame, cells: DataFrame,
                      queries: DataFrame, topk: int = 10,
                      nprobe: int = IVF_NPROBE) -> DataFrame:
    """(qid, rank, vec_id, score_q): stored-index IVF top-k for external
    queries (qid, embedding). Each query probes its ``nprobe`` nearest
    cells and exact-scores only their members — the cell equi-join is
    the only corpus-side work; with a cid-bucketed cell table it is also
    shuffle-free."""
    from pyspark.sql import Window
    qv = quantized(queries).select(F.col("qid").cast("long").alias("qid"),
                                   F.col("qvec").alias("qv"))
    pcd = (qv.crossJoin(F.broadcast(cents))
           .select("qid", "qv", "cid",
                   _sqdist(F.col("qv"), F.col("cv")).alias("dist")))
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("cid"))
    probe_cells = (pcd.withColumn("rn", F.row_number().over(w))
                   .where(F.col("rn") <= nprobe).select("qid", "qv", "cid"))
    scored = (cells.join(F.broadcast(probe_cells), "cid")
              .select("qid", "vec_id",
                      _int_dot(F.col("qvec"), F.col("qv")).alias("score_q")))
    w2 = Window.partitionBy("qid").orderBy(F.desc("score_q"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w2) - 1)
            .where(F.col("rank") < topk)
            .select("qid", F.col("rank").cast("long").alias("rank"),
                    "vec_id", "score_q"))
