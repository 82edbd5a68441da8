"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of a repeated big-big equi-join (postings ⋈
corpus metadata, clusters ⋈ docs, …) is re-shuffling both sides on every
run. Bucketing pays that shuffle ONCE at write time: both tables are
hash-partitioned AND sorted by the join key into the same number of
buckets, so Catalyst plans later joins with no Exchange and no Sort —
each task zips bucket i of A with bucket i of B. This is the standard
Spark answer to the reference's single-box assumption that everything is
already local.

The demo/test lives in tests/test_plans.py::test_bucketed_join_avoids_
shuffle — the plan assertion IS the feature (a silent regression to a
shuffled join would cost a full re-partition of the larger table per
run at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, table: str, path: str, key: str,
                  n_buckets: int = 64) -> None:
    """Write ``df`` as a bucketed+sorted EXTERNAL table at ``path``.

    Bucket count must match across tables that will be joined (bucket i
    joins bucket i); sortBy removes the per-task sort from later
    sort-merge joins — but ONLY when each bucket is a single file
    (Spark cannot merge-preserve order across multiple files in one
    bucket), so the frame is repartitioned to one writer task per
    bucket first. That pre-shuffle is the one-time cost the later
    shuffle-free joins amortize."""
    (df.repartition(n_buckets, key)
       .write.mode("overwrite").option("path", path)
       .bucketBy(n_buckets, key).sortBy(key).saveAsTable(table))


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with no
    Exchange (asserted in test_plans)."""
    return (spark.table(left_table).hint("merge")
            .join(spark.table(right_table), key))
