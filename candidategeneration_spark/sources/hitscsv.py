"""Gzip CSV source + HITS aggregation (SURVEY.md §2.1 S6, §2.4 A6).

The reference streams a gzip CSV of per-document hit counts and folds them
into a DCG-style score (``utilsClass.java:195-235`` ``aggregateHITS``). In
Spark the streamed gzip reader is just the csv source (codec inferred from
the ``.gz`` extension; note gzip is NOT splittable — at 100 TB ship many
moderate files or re-encode to bzip2/parquet so the scan parallelizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..relops import HITS_MAX_RANK, hits_weights

HITS_SCHEMA = "doc_id LONG, hits LONG"


def read_hits_csv(spark: SparkSession, path: str) -> DataFrame:
    """(doc_id, hits) rows from (possibly gzipped) CSV files.

    Explicit schema — no inference pass over the (non-splittable) gzip.
    """
    return spark.read.schema(HITS_SCHEMA).csv(path)


def aggregate_hits(rows: DataFrame) -> DataFrame:
    """(doc_id, hit_score): i-th largest count of a doc weighs
    trunc(hits·w_i), w_i the shared exact-int DCG weight table — the same
    arithmetic contract as relops.hits_rank, so results are associative
    int sums (oracle-exact)."""
    spark = rows.sparkSession
    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("doc_id"))
    ranked = (rows.withColumn("pos", F.row_number().over(w))
              .where(F.col("pos") <= HITS_MAX_RANK))
    wdf = spark.createDataFrame(hits_weights(), "pos int, weight long")
    return (ranked.join(F.broadcast(wdf), "pos")
            .withColumn("c", (F.col("hits") * F.col("weight")).cast("long"))
            .groupBy("doc_id").agg(F.sum("c").alias("hit_score")))
