"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: build the d-bigram block-max inverted index on
the sf0.001 documents table and answer the fixed BM25 query set with
Block-Max WAND. ``queries()``/``oracle_sql()`` — one entry per implemented
operator family (SURVEY.md §2), each checked against a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from candidategeneration_spark import entries, entrysql  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entries.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # core fulltext engine (SURVEY.md §2.2/2.4: T1-T5, A1-A3)
        "global_stats": entries.q_global_stats,
        "term_stats": entries.q_term_stats,
        # postings + exact BM25 (M1/M2, A1/A2/A8)
        "postings_unigram": entries.q_postings_unigram,
        # d-bigram windowed self-join + pair scoring (J1, T7, M2)
        "postings_dbigram": entries.q_postings_dbigram,
        # full engine: segments + Block-Max WAND top-k (O6, X1-X10, J6)
        "bm25_topk": entries.q_bm25_topk,
        # compressed segment build invariants (C1/C2, O1-O5, S8)
        "segment_stats": entries.q_segment_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "global_stats": entrysql.sql_global_stats(),
        "term_stats": entrysql.sql_term_stats(),
        "postings_unigram": entrysql.sql_postings_unigram(),
        "postings_dbigram": entrysql.sql_postings_dbigram(),
        "bm25_topk": entrysql.sql_bm25_topk(),
        "segment_stats": entrysql.sql_segment_stats(),
    }
