"""Exact reference BM25 arithmetic — the rank-identity contract.

Transcribed semantics (NOT code) of the reference scorer ``getBM25``
(``src/main/java/PredictiveIndex/utilsClass.java:115-130``):

    k = 1.6, b = 0.75
    ntf   = 0.5 + 0.5 * tf / maxtf_doc          (maxtf_doc = max tf in doc)
    idf   = ln((N - df + 0.5) / (df + 0.5))
    avgdl = total_tokens // N                   (integer division — floored!)
    denom = ntf + k * (1 - b + b * doc_len / avgdl)
    score = idf * ntf * (k + 1) / denom
    score_q = int(score * 1e7)                  (truncation toward zero)

The floored ``avgdl`` and the ×1e7 int truncation are deliberate quirks we
reproduce exactly: every downstream sum is over quantized int64 scores, so
multi-term scores are order-independent and rank-identical across engines.

Three implementations with identical results: NumPy (UDF kernels), Spark
Column (JVM path), and scalar Python (test oracle). The DuckDB oracle SQL
uses ``trunc()`` because DuckDB's CAST(double AS BIGINT) *rounds* while
Spark's cast truncates.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.6
B = 0.75
QUANT = 1e7


def avgdl_floor(total_tokens: int, n_docs: int) -> int:
    """Reference's long/long division (``utilsClass.java`` avgdl)."""
    return total_tokens // n_docs


def bm25_quantized_np(tf, maxtf, df, doc_len, n_docs: int, avgdl: int):
    """Vectorized quantized BM25 → int64 array."""
    tf = np.asarray(tf, dtype=np.float64)
    maxtf = np.asarray(maxtf, dtype=np.float64)
    df = np.asarray(df, dtype=np.float64)
    doc_len = np.asarray(doc_len, dtype=np.float64)
    ntf = 0.5 + 0.5 * tf / maxtf
    idf = np.log((n_docs - df + 0.5) / (df + 0.5))
    denom = ntf + K1 * (1.0 - B + B * doc_len / float(avgdl))
    score = idf * ntf * (K1 + 1.0) / denom
    return np.trunc(score * QUANT).astype(np.int64)


def bm25_quantized_scalar(tf: int, maxtf: int, df: int, doc_len: int,
                          n_docs: int, avgdl: int) -> int:
    """Pure-Python scalar version (oracle / golden tests)."""
    ntf = 0.5 + 0.5 * tf / maxtf
    idf = math.log((n_docs - df + 0.5) / (df + 0.5))
    denom = ntf + K1 * (1.0 - B + B * doc_len / float(avgdl))
    return int(ntf * idf * (K1 + 1.0) / denom * QUANT)


def bm25_quantized_col(tf: Column, maxtf: Column, df: Column,
                       doc_len: Column, n_docs: int, avgdl: int) -> Column:
    """Spark Column version (whole-stage-codegen path). Same arithmetic."""
    ntf = F.lit(0.5) + F.lit(0.5) * tf.cast("double") / maxtf.cast("double")
    idf = F.log(
        (F.lit(float(n_docs)) - df.cast("double") + F.lit(0.5))
        / (df.cast("double") + F.lit(0.5))
    )
    denom = ntf + F.lit(K1) * (
        F.lit(1.0 - B) + F.lit(B) * doc_len.cast("double") / F.lit(float(avgdl))
    )
    score = idf * ntf * F.lit(K1 + 1.0) / denom
    # Spark's double→long cast truncates toward zero, matching int() in Java.
    return (score * F.lit(QUANT)).cast("long")


# SQL fragment for the DuckDB oracle — keep in lockstep with the above.
# Placeholders: {tf} {maxtf} {df} {doclen} {n} {avgdl}
BM25_SQL_TEMPLATE = (
    "CAST(trunc((ln(({n} - {df} + 0.5) / ({df} + 0.5))"
    " * (0.5 + 0.5 * {tf} / {maxtf}) * 2.6"
    " / ((0.5 + 0.5 * {tf} / {maxtf})"
    "    + 1.6 * (0.25 + 0.75 * {doclen} / {avgdl}))) * 10000000.0)"
    " AS BIGINT)"
)


def bm25_sql(tf: str, maxtf: str, df: str, doclen: str, n: str,
             avgdl: str) -> str:
    """Render the DuckDB-side BM25 expression over column/scalar SQL exprs.

    All numeric inputs must be rendered as doubles by the caller where
    integer division could bite (we cast inline below).
    """
    return BM25_SQL_TEMPLATE.format(
        tf=f"CAST({tf} AS DOUBLE)",
        maxtf=f"CAST({maxtf} AS DOUBLE)",
        df=f"CAST({df} AS DOUBLE)",
        doclen=f"CAST({doclen} AS DOUBLE)",
        n=f"CAST({n} AS DOUBLE)",
        avgdl=f"CAST({avgdl} AS DOUBLE)",
    )
