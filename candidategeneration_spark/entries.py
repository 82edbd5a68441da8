"""Spark-side implementations of the driver-gate entries.

Each function has signature ``(spark, sf_dir) -> DataFrame`` and a DuckDB
oracle twin in entrysql.py. Column names/types are aligned on both sides
(the driver's compare hashes values after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .build import (
    PAIR_SEP, build_index, build_postings, global_stats, score_postings,
)
from .entrysql import QUERY_SET, TOPK
from .queryengine import wand_topk
from .tokenizer import DBIGRAM_DISTANCE


def load_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = global_stats(load_docs(spark, sf_dir))
    return spark.createDataFrame(
        [(s["n_docs"], s["total_tokens"], s["avgdl"])],
        "n_docs long, total_tokens long, avgdl long")


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    postings = build_postings(load_docs(spark, sf_dir))
    return postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"))


def _scored_unigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir)
    stats = global_stats(docs)
    postings = build_postings(docs)
    return score_postings(postings, stats["n_docs"], stats["avgdl"])


def q_postings_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scored_unigrams(spark, sf_dir).select(
        "term", F.col("doc_id").cast("long").alias("doc_id"),
        F.col("tf").cast("long").alias("tf"),
        F.col("doc_len").cast("long").alias("doc_len"),
        F.col("maxtf").cast("long").alias("maxtf"),
        F.col("df").cast("long").alias("df"), "score_q")


def q_postings_dbigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir)
    stats = global_stats(docs)
    postings = build_postings(docs, dbigram_distance=DBIGRAM_DISTANCE)
    scored = score_postings(postings, stats["n_docs"], stats["avgdl"])
    pairs = scored.where(F.col("term").contains(PAIR_SEP))
    split = F.split(F.col("term"), PAIR_SEP)
    return pairs.select(
        split.getItem(0).alias("t1"), split.getItem(1).alias("t2"),
        F.col("doc_id").cast("long").alias("doc_id"), "score_q")


def _query_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(qid, list(terms)) for qid, terms in QUERY_SET],
        "qid long, terms array<string>")


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    segments, _ = build_index(load_docs(spark, sf_dir), dbigram_distance=None)
    res = wand_topk(segments, _query_df(spark), k=TOPK, use_wand=True)
    return res.select("qid", F.col("rank").cast("long").alias("rank"),
                      "doc_id", "score_q")


def q_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    segments, _ = build_index(load_docs(spark, sf_dir),
                              dbigram_distance=DBIGRAM_DISTANCE)
    return segments.select(
        "term", F.col("df").cast("long").alias("df"),
        F.col("n_blocks").cast("long").alias("n_blocks"))
