"""ANN quality: the LSH-bucketed scale path must recover PLANTED near
neighbors. (On uniform-random embeddings — like the driver's synthetic
table — top-k sets are arbitrary and no sublinear method can recover
them, so recall is asserted on clustered data we construct.)"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from candidategeneration_spark import annops  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def _clustered_emb(spark, n_clusters=20, per_cluster=10, dim=64, jitter=0.06):
    rng = np.random.default_rng(42)
    rows = []
    vid = 0
    for _ in range(n_clusters):
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        for _ in range(per_cluster):
            v = base + jitter * rng.normal(size=dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_topk_recall_on_planted_clusters(spark):
    per = 10
    emb = _clustered_emb(spark, per_cluster=per)
    k = per - 1  # a probe's true neighbors = the rest of its cluster
    probes = 10
    brute = annops.brute_topk(emb, n_probes=probes, k=k).collect()
    lsh = annops.lsh_topk(emb, n_probes=probes, k=k).collect()
    exact, got = {}, {}
    for r in brute:
        exact.setdefault(r["qid"], set()).add(r["vec_id"])
    for r in lsh:
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    # sanity: exact top-k of a cluster member is its cluster
    for q in exact:
        cluster = set(range(q // per * per, q // per * per + per)) - {q}
        assert len(exact[q] & cluster) >= k - 2
    recalls = [len(exact[q] & got.get(q, set())) / len(exact[q])
               for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    # tight clusters land in one bucket with high probability; a broken
    # hash or join would crater this to ~per/N ≈ 0.05
    assert mean_recall >= 0.5, f"mean recall {mean_recall:.3f}"


def test_brute_topk_matches_cosine_ranking(spark):
    """Quantized int-dot ranking must broadly agree with float cosine on
    clustered data (same-cluster members dominate both rankings)."""
    emb = _clustered_emb(spark)
    brute = annops.brute_topk(emb, n_probes=5, k=9).collect()
    cos = annops.cosine_topk_pandas(emb, n_probes=5, k=9).collect()
    b, c = {}, {}
    for r in brute:
        b.setdefault(r["qid"], set()).add(r["vec_id"])
    for r in cos:
        c.setdefault(r["qid"], set()).add(r["vec_id"])
    overlaps = [len(b[q] & c.get(q, set())) / len(b[q]) for q in b]
    mean_overlap = sum(overlaps) / len(overlaps)
    assert mean_overlap >= 0.6, f"mean top-9 overlap {mean_overlap:.2f}"


def test_ivf_topk_recall_on_planted_clusters(spark):
    """IVF cells should put a planted cluster in one (or few) cells; with
    nprobe=2 a probe must recover most of its true neighbors."""
    per = 10
    emb = _clustered_emb(spark, per_cluster=per)
    k = per - 1
    probes = 10
    brute = annops.brute_topk(emb, n_probes=probes, k=k).collect()
    ivf = annops.ivf_topk(emb, n_probes=probes, topk=k).collect()
    exact, got = {}, {}
    for r in brute:
        exact.setdefault(r["qid"], set()).add(r["vec_id"])
    for r in ivf:
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = [len(exact[q] & got.get(q, set())) / len(exact[q])
               for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.6, f"IVF mean recall {mean_recall:.2f}"


def test_near_dup_pairs_recall_and_precision(spark):
    """Embedding-cosine near-dup (dedup family): on planted clusters with
    cos ≥ 0.9 intra-cluster, the banded-LSH + exact-threshold pairs must
    (a) contain NO false positives vs the exact integer threshold (the
    filter is exact by construction — assert it anyway end-to-end), and
    (b) recover most intra-cluster pairs (banding recall)."""
    from pyspark.sql import functions as F
    emb = _clustered_emb(spark, n_clusters=12, per_cluster=6, jitter=0.04)
    # high threshold: cos >= sqrt(324/400) = 0.9
    got = {(r["vec_id_a"], r["vec_id_b"])
           for r in annops.near_dup_pairs(emb, num=324, den=400).collect()}
    # exact brute-force ground truth at the same integer threshold
    q = annops.quantized(emb).select(
        "vec_id", "qvec",
        annops._int_dot(F.col("qvec"), F.col("qvec")).alias("n2"))
    a = q.select(F.col("vec_id").alias("va"), F.col("qvec").alias("qa"),
                 F.col("n2").alias("na2"))
    b = q.select(F.col("vec_id").alias("vb"), F.col("qvec").alias("qb"),
                 F.col("n2").alias("nb2"))
    truth = {(r["va"], r["vb"]) for r in
             a.crossJoin(b).where(F.col("va") < F.col("vb"))
             .withColumn("d", annops._int_dot(F.col("qa"), F.col("qb")))
             .where((F.col("d") >= 0) &
                    (F.lit(400) * F.col("d") * F.col("d") >=
                     F.lit(324) * F.col("na2") * F.col("nb2")))
             .select("va", "vb").collect()}
    assert got <= truth, f"false positives: {sorted(got - truth)[:5]}"
    assert len(truth) > 30  # clusters actually produced near-dups
    recall = len(got) / len(truth)
    assert recall >= 0.6, f"banding recall {recall:.2f}"


def test_pq_adc_topk_recall_on_planted_clusters(spark):
    """PQ/ADC compresses each vector to PQ_M codes; on planted clusters
    the codebooks capture cluster structure, so ADC ranking must still
    recover most true neighbors (FAISS-PQ recall contract)."""
    per = 10
    emb = _clustered_emb(spark, per_cluster=per)
    k = per - 1
    probes = 10
    brute = annops.brute_topk(emb, n_probes=probes, k=k).collect()
    pq = annops.pq_adc_topk(emb, n_probes=probes, topk=k).collect()
    exact, got = {}, {}
    for r in brute:
        exact.setdefault(r["qid"], set()).add(r["vec_id"])
    for r in pq:
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = [len(exact[q] & got.get(q, set())) / len(exact[q])
               for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, f"PQ/ADC mean recall {mean_recall:.2f}"


def test_pq_codes_shape(spark):
    """Every vector gets exactly PQ_M codes, each < PQ_KSUB."""
    emb = _clustered_emb(spark, n_clusters=5, per_cluster=4)
    rows = annops.pq_codes(emb).collect()
    assert len(rows) == 20 * annops.PQ_M
    assert all(0 <= r["code"] < annops.PQ_KSUB for r in rows)
    per_vec = {}
    for r in rows:
        per_vec.setdefault(r["vec_id"], set()).add(r["m"])
    assert all(ms == set(range(annops.PQ_M)) for ms in per_vec.values())


def test_ivfpq_topk_recall_on_planted_clusters(spark):
    """IVF-PQ composite: coarse cells prune, residual PQ codes score.
    On planted clusters both stages align with cluster structure, so
    ADC-over-residuals ranking must recover most true neighbors."""
    per = 10
    emb = _clustered_emb(spark, per_cluster=per)
    k = per - 1
    probes = 10
    brute = annops.brute_topk(emb, n_probes=probes, k=k).collect()
    ivfpq = annops.ivfpq_topk(emb, n_probes=probes, topk=k).collect()
    exact, got = {}, {}
    for r in brute:
        exact.setdefault(r["qid"], set()).add(r["vec_id"])
    for r in ivfpq:
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = [len(exact[q] & got.get(q, set())) / len(exact[q])
               for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, f"IVF-PQ mean recall {mean_recall:.2f}"


def test_ivfpq_codes_shape(spark):
    """Every vector gets one coarse cell + PQ_M residual codes, and the
    cell ids agree with the standalone inverted file (ivf_cells)."""
    emb = _clustered_emb(spark, n_clusters=5, per_cluster=4)
    rows = annops.ivfpq_codes(emb).collect()
    assert len(rows) == 20 * annops.PQ_M
    assert all(0 <= r["code"] < annops.PQ_KSUB for r in rows)
    cells = {r["vec_id"]: r["cid"] for r in annops.ivf_cells(emb).collect()}
    assert all(r["cid"] == cells[r["vec_id"]] for r in rows)


def test_pq_index_save_load_prepared_serving(spark, tmp_path):
    """Stored-index serving must reproduce the inline pq_adc_topk for
    corpus-member queries (modulo the self-match row, which prepared
    serving keeps because external queries have no corpus identity),
    and must serve a genuinely external query."""
    emb = _clustered_emb(spark, n_clusters=6, per_cluster=5)
    path = str(tmp_path / "pq_index")
    annops.save_pq_index(emb, path)
    books, codes = annops.load_pq_index(spark, path)

    probes = emb.where("vec_id < 5").select(
        annops.F.col("vec_id").alias("qid"), "embedding")
    prepared = annops.pq_adc_topk_prepared(books, codes, probes, topk=31)
    inline = annops.pq_adc_topk(emb, n_probes=5, topk=30)
    prep = {(r["qid"], r["vec_id"]): r["score_q"]
            for r in prepared.collect() if r["qid"] != r["vec_id"]}
    inl = {(r["qid"], r["vec_id"]): r["score_q"]
           for r in inline.collect()}
    assert prep == inl

    # external query: mean direction of cluster 0 must retrieve cluster 0
    import numpy as np
    c0 = np.stack([r["embedding"] for r in
                   emb.where("vec_id < 5").collect()]).mean(axis=0)
    ext = spark.createDataFrame(
        [(999, [float(x) for x in c0])], "qid long, embedding array<double>")
    got = [r["vec_id"] for r in
           annops.pq_adc_topk_prepared(books, codes, ext, topk=5).collect()]
    assert len(set(got) & set(range(5))) >= 3, got


def test_ivf_index_save_load_prepared_serving(spark, tmp_path):
    """Stored IVF index serves corpus-member queries identically to the
    inline ivf_topk (minus the self-match row) and retrieves the right
    cluster for an external query."""
    emb = _clustered_emb(spark, n_clusters=6, per_cluster=5)
    path = str(tmp_path / "ivf_index")
    annops.save_ivf_index(emb, path)
    cents, cells = annops.load_ivf_index(spark, path)

    probes = emb.where("vec_id < 5").select(
        annops.F.col("vec_id").alias("qid"), "embedding")
    prepared = annops.ivf_topk_prepared(cents, cells, probes, topk=31)
    inline = annops.ivf_topk(emb, n_probes=5, topk=30)
    prep = {(r["qid"], r["vec_id"]): r["score_q"]
            for r in prepared.collect() if r["qid"] != r["vec_id"]}
    inl = {(r["qid"], r["vec_id"]): r["score_q"]
           for r in inline.collect()}
    assert prep == inl

    import numpy as np
    c0 = np.stack([r["embedding"] for r in
                   emb.where("vec_id < 5").collect()]).mean(axis=0)
    ext = spark.createDataFrame(
        [(999, [float(x) for x in c0])], "qid long, embedding array<double>")
    got = [r["vec_id"] for r in
           annops.ivf_topk_prepared(cents, cells, ext, topk=5).collect()]
    assert len(set(got) & set(range(5))) >= 3, got
