#!/usr/bin/env python
"""Decontamination phrase-scaling benchmark (VERDICT r3 task 3).

The round-3 implementation was a broadcast nested-loop `contains` —
O(|docs| x |phrases| x doc_len) character work, flat only because gate
phrase tables are tiny. A real eval suite is 10^4-10^5 phrases; at that
size the nested loop is the slowest stage of the pipeline. The round-4
implementation prefilters with a first-k-gram BroadcastHashJoin and
verifies only surviving candidates, so wall time should be ~flat in the
phrase count.

This bench measures both shapes on the sf0.1 corpus with synthetic
phrase tables of 100 / 1,000 / 10,000 / 50,000 entries (half corpus-derived so
there are real hits, half absent) and writes BENCH/DECON.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def phrase_table(spark, docs, n: int):
    """n phrases: even ids are real 5-token spans sampled from the corpus
    (guaranteed hits), odd ids are absent (miss path)."""
    from pyspark.sql import functions as F

    from candidategeneration_spark.tokenizer import tokens_col
    real = (docs.select(tokens_col(F.col("text")).alias("toks"))
            .where(F.size("toks") >= 5)
            .select(F.array_join(F.slice("toks", 1, 5), " ").alias("phrase"))
            .distinct().limit((n + 1) // 2))
    real = real.select(
        (F.monotonically_increasing_id() * 2).alias("qid"), "phrase")
    absent = spark.range(n // 2).select(
        (F.col("id") * 2 + 1).alias("qid"),
        F.concat(F.lit("zq"), F.col("id").cast("string"),
                 F.lit(" zr"), F.col("id").cast("string"),
                 F.lit(" zs"), F.col("id").cast("string")).alias("phrase"))
    return real.unionByName(absent).cache()


def nested_loop_decon(docs, phrases):
    """The round-3 shape, kept here for the A/B only."""
    from pyspark.sql import functions as F

    from candidategeneration_spark.tokenizer import tokens_col
    padded = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(F.lit(" "), F.array_join(tokens_col(F.col("text")), " "),
                 F.lit(" ")).alias("padded"))
    needle = F.concat(F.lit(" "), F.col("phrase"), F.lit(" "))
    return (padded.join(F.broadcast(phrases),
                        F.col("padded").contains(needle))
            .select(F.col("qid").cast("long").alias("qid"), "doc_id"))


def main() -> None:
    from candidategeneration_spark.config import get_spark
    from candidategeneration_spark.pipelineops import decontaminate
    spark = get_spark("local[8]", app_name="cg-decon-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet") \
        .select("doc_id", "text").cache()
    n_docs = docs.count()

    rows = []
    for n in (100, 1_000, 10_000, 50_000):
        ph = phrase_table(spark, docs, n)
        n_ph = ph.count()
        # parity first: both shapes must emit the identical (qid, doc_id)
        # set (the equi-join form is the gate; the nested loop is the
        # spec it replaced)
        got = decontaminate(docs, ph)
        ref = nested_loop_decon(docs, ph)
        n_hits = got.count()
        assert got.exceptAll(ref).isEmpty() and ref.exceptAll(got).isEmpty(), n
        row = {"phrases": n_ph, "hits": n_hits}
        for key, fn in (("equi_s", lambda: decontaminate(docs, ph).count()),
                        ("loop_s", lambda: nested_loop_decon(docs, ph).count())):
            best = None
            for _ in range(3):
                t0 = time.time()
                fn()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            row[key] = round(best, 2)
        rows.append(row)
        ph.unpersist()
        print(row, flush=True)

    lines = [
        "# Decontamination phrase-scaling benchmark",
        "",
        f"Corpus: sf0.1 documents ({n_docs} docs), local[8]. Phrase",
        "tables are half real corpus 5-grams (hit path), half absent",
        "(miss path). `equi_s` = round-4 first-k-gram BroadcastHashJoin",
        "prefilter + exact whole-token verify (pipelineops.decontaminate);",
        "`loop_s` = the round-3 BroadcastNestedLoopJoin `contains` shape.",
        "Both emit the identical (qid, doc_id) set (asserted per row);",
        "min of 3 reps.",
        "",
        "| phrases | hits | equi-join s | nested-loop s |",
        "|---|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['phrases']} | {r['hits']} | {r['equi_s']} "
                     f"| {r['loop_s']} |")
    lines += [
        "",
        "Reading: the equi-join form is ~flat in the phrase count (the",
        "corpus-side window pass dominates and is phrase-independent; the",
        "phrase side only changes a broadcast hash table), while the",
        "nested loop scales linearly with phrases — at 10^5 phrases x",
        "100 TB it would be the slowest stage of the whole pipeline.",
    ]
    with open(os.path.join(REPO, "BENCH", "DECON.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote BENCH/DECON.md")
    spark.stop()


if __name__ == "__main__":
    main()
