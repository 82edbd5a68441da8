"""Structured Streaming operators: availableNow over a file source must
reproduce the batch results (stream-batch parity)."""

import os

import pytest
from pyspark.sql import functions as F

from candidategeneration_spark.streaming import (
    read_events_stream, running_user_counts, session_counts, windowed_counts,
)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
EV = f"{TESTDATA}/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def ev_dir(tmp_path_factory):
    """File stream source needs a DIRECTORY of files; stage the single
    parquet into one (split in two so multi-batch paths execute)."""
    import duckdb
    d = tmp_path_factory.mktemp("events_stream")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ev AS SELECT * FROM read_parquet('{EV}')")
    con.execute(f"COPY (SELECT * FROM ev WHERE event_id % 2 = 0)"
                f" TO '{d}/part0.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY (SELECT * FROM ev WHERE event_id % 2 = 1)"
                f" TO '{d}/part1.parquet' (FORMAT PARQUET)")
    return str(d)


def _run(stream_df, name):
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("complete" if name != "updates" else "update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


@pytest.fixture(scope="module")
def events_batch(spark):
    return spark.read.parquet(EV).withColumn(
        "ts", F.col("ts").cast("timestamp")).cache()


def test_windowed_counts_match_batch(spark, events_batch, ev_dir):
    stream = read_events_stream(spark, ev_dir)
    _run(windowed_counts(stream), "win_counts")
    got = {(r["win_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
           for r in spark.sql("select * from win_counts").collect()}
    exp = {(r["win_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
           for r in (events_batch
                     .groupBy(F.window("ts", "10 minutes").alias("w"),
                              "event_type")
                     .agg(F.count("*").alias("n"),
                          F.sum("value").alias("sum_value"))
                     .select(F.col("w.start").alias("win_start"),
                             "event_type", "n", "sum_value")).collect()}
    assert got == exp and len(got) > 10


def test_session_counts_match_batch_sessionize(spark, events_batch, ev_dir):
    stream = read_events_stream(spark, ev_dir)
    _run(session_counts(stream), "sess_counts")
    got = (spark.sql("select * from sess_counts")
           .groupBy("user_id")
           .agg(F.count("*").alias("n_sessions"),
                F.sum("n_events").alias("n_events")))
    got = {r["user_id"]: (r["n_sessions"], r["n_events"])
           for r in got.collect()}
    # batch twin (lag + gap>30min); session_window differs only on exact
    # gap==30min boundaries, which microsecond timestamps make improbable
    from candidategeneration_spark.relops import sessionize_events
    exp = {r["user_id"]: (r["n_sessions"], r["n_events"])
           for r in sessionize_events(spark, f"{TESTDATA}/sf0.001").collect()}
    assert got == exp


def test_stateful_running_counts(spark, events_batch, ev_dir):
    stream = read_events_stream(spark, ev_dir, max_files=1)
    _run(running_user_counts(stream), "updates")
    # last update per user must equal the batch totals
    upd = spark.sql("select * from updates")
    exp = {r["user_id"]: (r["n"], round(r["mx"], 6)) for r in
           events_batch.groupBy("user_id")
           .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
           .collect()}
    got = {}
    for r in upd.collect():  # memory sink appends updates in order
        got[r["user_id"]] = (r["n_events"], round(r["max_value"], 6))
    assert got == exp
