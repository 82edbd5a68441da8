"""Shared fixtures for the driver correctness gate (__spark_entry__.py).

Defines the fixed benchmark query set and DuckDB SQL scaffolding that
mirrors the engine's tokenization / BM25 / d-bigram contracts exactly
(tokenizer.py + bm25.py are the source of truth; every constant here must
stay in lockstep with them).

The SQL is the *oracle*: the driver runs each Spark query and its SQL twin
side-by-side on the same parquet tables and value-hashes the results.
DuckDB-specific care:
- CAST(double AS BIGINT) rounds in DuckDB but truncates in Spark — the BM25
  quantization must go through trunc() (handled by bm25.bm25_sql).
- generate_subscripts + unnest give aligned (position, token) pairs.
"""

from __future__ import annotations

from .bm25 import bm25_sql
from .tokenizer import DBIGRAM_DISTANCE, MIN_TOKEN_LEN

# Fixed query set over the synthetic `documents` vocabulary (TESTDATA.md).
# Mirrors the reference's query-trace role (Metadata.java:191-225): mixed
# lengths, one rare term ('dup'), absent terms to exercise empty lists.
QUERY_SET: list[tuple[int, tuple[str, ...]]] = [
    (0, ("fast", "key")),
    (1, ("order", "sort", "merge")),
    (2, ("spark",)),
    (3, ("window", "hash", "join", "scan")),
    (4, ("dup",)),
    (5, ("dup", "stream")),
    (6, ("the", "quick", "zzz")),          # 'quick'/'zzz' absent
    (7, ("zzznotaterm",)),                  # fully absent
    (8, ("batch", "batch", "vector")),      # duplicate term
    (9, ("customer", "table")),
    (10, ("agg", "group", "value")),
    (11, ("big", "small", "slow", "fast")),
    (12, ("column", "row")),
    (13, ("query", "filter", "line", "data")),
]

TOPK = 10

# ---------------------------------------------------------------------------
# SQL scaffolding
# ---------------------------------------------------------------------------

# Tokenize: identical to tokenizer.tokens_col / tokenize_text.
_TOK_CTE = f"""
tok AS (
  SELECT doc_id,
         list_filter(
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9.]', ' ', 'g')), '\\s+'),
           t -> len(t) >= {MIN_TOKEN_LEN}) AS toks
  FROM documents
),
stats AS (
  SELECT count(*) AS n_docs,
         COALESCE(sum(len(toks)), 0) AS total_tokens,
         COALESCE(sum(len(toks)), 0) // count(*) AS avgdl
  FROM tok
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
  GROUP BY doc_id, term
),
docmeta AS (
  SELECT doc_id, max(tf) AS maxtf, sum(tf) AS doc_len FROM tf GROUP BY doc_id
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
"""

_BM25_EXPR = bm25_sql("tf.tf", "docmeta.maxtf", "df.df", "docmeta.doc_len",
                      "stats.n_docs", "stats.avgdl")

_SCORED_CTE = f"""
scored AS (
  SELECT tf.term, tf.doc_id, tf.tf, docmeta.doc_len, docmeta.maxtf, df.df,
         {_BM25_EXPR} AS score_q
  FROM tf
  JOIN docmeta USING (doc_id)
  JOIN df USING (term)
  CROSS JOIN stats
)
"""

_PAIRS_CTE = f"""
pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos
  FROM tok
),
pairs AS (
  SELECT DISTINCT a.doc_id,
         least(a.term, b.term) AS t1,
         greatest(a.term, b.term) AS t2
  FROM pos a
  JOIN pos b
    ON a.doc_id = b.doc_id
   AND b.pos > a.pos AND b.pos <= a.pos + {DBIGRAM_DISTANCE}
   AND a.term <> b.term
)
"""


def _query_values() -> str:
    rows = []
    for qid, terms in QUERY_SET:
        for t in sorted(set(terms)):
            rows.append(f"({qid}, '{t}')")
    return "queries(qid, term) AS (SELECT * FROM (VALUES "\
        + ", ".join(rows) + ") v(qid, term))"


def sql_global_stats() -> str:
    return (f"WITH {_TOK_CTE.strip()} "
            "SELECT CAST(n_docs AS BIGINT) AS n_docs, "
            "CAST(total_tokens AS BIGINT) AS total_tokens, "
            "CAST(avgdl AS BIGINT) AS avgdl FROM stats")


def sql_term_stats() -> str:
    return (f"WITH {_TOK_CTE.strip()} "
            "SELECT term, CAST(count(*) AS BIGINT) AS df, "
            "CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term")


def sql_postings_unigram() -> str:
    return (f"WITH {_TOK_CTE.strip()}, {_SCORED_CTE.strip()} "
            "SELECT term, CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(tf AS BIGINT) AS tf, CAST(doc_len AS BIGINT) AS doc_len, "
            "CAST(maxtf AS BIGINT) AS maxtf, CAST(df AS BIGINT) AS df, "
            "score_q FROM scored")


def sql_postings_dbigram() -> str:
    return (
        f"WITH {_TOK_CTE.strip()}, {_SCORED_CTE.strip()}, {_PAIRS_CTE.strip()} "
        "SELECT p.t1, p.t2, CAST(p.doc_id AS BIGINT) AS doc_id, "
        "s1.score_q + s2.score_q AS score_q "
        "FROM pairs p "
        "JOIN scored s1 ON s1.doc_id = p.doc_id AND s1.term = p.t1 "
        "JOIN scored s2 ON s2.doc_id = p.doc_id AND s2.term = p.t2")


def sql_bm25_topk(k: int = TOPK) -> str:
    return (
        f"WITH {_TOK_CTE.strip()}, {_SCORED_CTE.strip()}, {_query_values()}, "
        "qscore AS ("
        "  SELECT q.qid, s.doc_id, sum(s.score_q) AS score_q"
        "  FROM queries q JOIN scored s ON s.term = q.term"
        "  GROUP BY q.qid, s.doc_id) "
        "SELECT CAST(qid AS BIGINT) AS qid, rank, doc_id, score_q FROM ("
        "  SELECT qid, CAST(row_number() OVER ("
        "    PARTITION BY qid ORDER BY score_q DESC, doc_id) - 1 AS BIGINT)"
        "    AS rank, doc_id, score_q FROM qscore) "
        f"WHERE rank < {k}")


def sql_segment_stats() -> str:
    """df + expected block count for every indexed term, pairs included.

    n_blocks = ceil(df / 128) — validates the compressed segment build
    against pure SQL. Pair terms are keyed t1||chr(31)||t2 like the engine.
    """
    return (
        f"WITH {_TOK_CTE.strip()}, {_PAIRS_CTE.strip()}, "
        "alldf AS ("
        "  SELECT term, count(*) AS df FROM tf GROUP BY term"
        "  UNION ALL"
        "  SELECT t1 || chr(31) || t2 AS term, count(*) AS df"
        "  FROM pairs GROUP BY t1, t2) "
        "SELECT term, CAST(df AS BIGINT) AS df, "
        "CAST((df + 127) // 128 AS BIGINT) AS n_blocks FROM alldf")
