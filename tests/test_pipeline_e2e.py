"""End-to-end training-data pipeline composition: quality filter →
exact dedup → near-dup clustering → decontamination → stratified split →
context-window packing, with row accounting asserted at every stage.

Each op is individually oracle-checked by the driver gate; this test
asserts they COMPOSE — column contracts line up and the survivors at
each stage are exactly the documents the stage semantics predict."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from candidategeneration_spark import pipelineops as P  # noqa: E402
from candidategeneration_spark import textops as T  # noqa: E402
from candidategeneration_spark.tokenizer import tokens_col  # noqa: E402

STOPS = "the and of to in is it on"


def _doc(i):
    """Gopher-passing doc with a PER-DOC vocabulary: 8 stopwords + 60
    unique tokens, so distinct docs share only the stopword set
    (Jaccard ≈ 0.1 — below LSH banding) while a 1-token edit keeps
    Jaccard ≈ 0.97 (above it)."""
    return STOPS + " " + " ".join(f"u{i}x{j}" for j in range(60))


def _corpus(spark):
    rows = []
    # 8 good unique docs (pass gopher, survive dedup)
    for i in range(8):
        rows.append((i, _doc(i), "py"))
    # exact duplicate of doc 0
    rows.append((100, rows[0][1], "py"))
    # near duplicate of doc 1 (one token changed)
    rows.append((101, rows[1][1].replace("u1x0 ", "zz9q7 "), "go"))
    # contaminated: contains the eval phrase verbatim
    rows.append((102, _doc(9) + " the secret eval phrase end", "go"))
    # junk: too short for gopher
    rows.append((103, "tiny doc", "go"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_pipeline_compose_quality_dedup_decontaminate_split_pack(spark):
    docs = _corpus(spark)
    n0 = docs.count()
    assert n0 == 12

    # 1. quality filter
    kept = (docs.join(T.gopher_rules(docs).where(F.col("keep") == 1)
                      .select("doc_id"), "doc_id"))
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 103 not in kept_ids and len(kept_ids) == 11

    # 2. exact dedup: doc 100 collapses into doc 0
    ex = T.dedup_exact(kept)
    survivors = kept.join(
        ex.where(F.col("doc_id") == F.col("canonical_doc_id"))
          .select("doc_id"), "doc_id")
    ids2 = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    assert 100 not in ids2 and 0 in ids2 and len(ids2) == 10

    # 3. near-dup clustering: doc 101 clusters with doc 1
    cl = T.dedup_clusters(survivors)
    canon = survivors.join(
        cl.where(F.col("doc_id") == F.col("cluster_id"))
          .select("doc_id"), "doc_id")
    ids3 = {r["doc_id"] for r in canon.select("doc_id").collect()}
    assert 101 not in ids3 and 1 in ids3

    # 4. decontamination
    phrases = spark.createDataFrame(
        [(0, "the secret eval phrase")], "qid long, phrase string")
    hits = P.decontaminate(canon, phrases)
    hit_ids = {r["doc_id"] for r in hits.collect()}
    assert hit_ids == ({102} & ids3)
    clean = canon.join(hits.select("doc_id").distinct(), "doc_id",
                       "left_anti")
    ids4 = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert 102 not in ids4

    # 5. stratified split: every clean doc gets exactly one split label
    sp = P.sample_split(clean)
    assert sp.count() == len(ids4)
    assert {r["split"] for r in sp.select("split").distinct().collect()} \
        <= {"train", "val", "test"}

    # 6. packing: token totals preserved exactly; no multi-doc sequence
    # exceeds the cap (oversize singletons are allowed by contract)
    packed = P.pack_sequences(clean, cap=128)
    tok_in = (clean.select(F.size(tokens_col(F.col("text"))).alias("n"))
              .agg(F.sum("n")).collect()[0][0])
    tok_out = packed.agg(F.sum("n_tokens")).collect()[0][0]
    assert tok_in == tok_out
    seqs = packed.groupBy("bucket", "seq").agg(
        F.sum("n_tokens").alias("st"), F.count("*").alias("nd"))
    assert seqs.where((F.col("st") > 128) & (F.col("nd") > 1)).count() == 0
