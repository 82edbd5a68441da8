"""Relational operator demos over the TPC-H-ish tables.

Exercises the scan/filter/join/aggregate/window/sort surface (SURVEY.md §2
S*/J*/A*/O* families) with Catalyst-native plans: broadcast joins for dims,
partial aggregation, window top-N. Money/quantity sums are quantized to
integer cents BEFORE aggregation so results are associative and match the
DuckDB oracles exactly (double sums are order-dependent)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash agg with map-side combine."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100).cast("long")
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-01"))
              .groupBy("l_returnflag", "l_linestatus")
              .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
                    .alias("sum_qty_c"),
                   F.sum(F.round(F.col("l_extendedprice") * 100)
                         .cast("long")).alias("sum_price_c"),
                   F.sum(cents).alias("sum_disc_price_c"),
                   F.count("*").cast("long").alias("count_order")))


def top_orders(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (dim broadcast) + agg + exact top-k."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100).cast("long")
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
           .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey))
    agg = (j.groupBy("o_orderkey", "o_orderdate")
             .agg(F.sum(rev_c).alias("revenue_c")))
    return (agg.orderBy(F.desc("revenue_c"), F.asc("o_orderkey")).limit(k)
               .select(F.col("o_orderkey").cast("long").alias("o_orderkey"),
                       F.date_format("o_orderdate", "yyyy-MM-dd")
                        .alias("o_orderdate"), "revenue_c"))


def window_topn_events(spark: SparkSession, sf_dir: str,
                       n: int = 3) -> DataFrame:
    """Per-user top-N events by value (window + rank filter — Catalyst
    rewrites to a partial top-k before the shuffle)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.asc("event_id"))
    return (ev.withColumn("rn", F.row_number().over(w))
              .where(F.col("rn") <= n)
              .select(F.col("user_id").cast("long").alias("user_id"),
                      F.col("event_id").cast("long").alias("event_id"),
                      F.col("rn").cast("long").alias("rn")))


def sessionize_events(spark: SparkSession, sf_dir: str,
                      gap_minutes: int = 30) -> DataFrame:
    """(user_id, n_sessions, n_events): session = run of events with
    < gap_minutes between consecutive ones. Batch analogue of the streaming
    sessionizer (streaming/events.py); lag + cumulative-sum pattern."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ: not directly castable to long in Spark 4;
    # epoch absolute value may shift by session tz vs DuckDB, but only gaps
    # matter and those are tz-invariant
    sec = F.col("ts").cast("timestamp").cast("long")
    gap = sec - F.lag(sec).over(w)
    marked = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0))
    return (marked.groupBy("user_id")
            .agg(F.sum("new_sess").cast("long").alias("n_sessions"),
                 F.count("*").cast("long").alias("n_events"))
            .select(F.col("user_id").cast("long").alias("user_id"),
                    "n_sessions", "n_events"))
