"""Cross-engine tokenizer parity on non-ASCII text (round 4).

Lower-then-strip is not portable off ASCII: DuckDB's (glibc/ICU)
lower('İ' U+0130) = plain 'i' while CPython/JVM produce 'i' + combining
dot — so 'İstanbul' tokenized one way yields 'istanbul' and the other
'stanbul', a silent engine-vs-oracle divergence. The round-4 contract
strips non-keep characters FIRST; these tests pin all four
implementations (scalar, pandas incl. its non-ASCII batch path, Spark
column, DuckDB oracle CTE) to identical output on adversarial unicode,
and that the change is a no-op on ASCII."""

import duckdb
import pandas as pd

from candidategeneration_spark.tokenizer import (
    MIN_TOKEN_LEN, tokenize_pandas, tokenize_text, tokens_col,
)

CASES = [
    "İstanbul CODE ÄÖÜ straße",       # U+0130: the divergence trigger
    "naïve café 42x",
    "ĄĆĘ ŁÓŚŻ abc123",
    "ΣΙΓΜΑ mixedΔtext",
    "ß sharp ẞ SHARP",                 # U+1E9E upper sharp s
    "ﬀ ligature FIｌe",                 # ligature + fullwidth letter
    "plain ascii Text.v2 UNCHANGED",
]

_DUCK_TOKS = (
    "list_filter(string_split_regex(trim(lower("
    "regexp_replace(t, '[^a-zA-Z0-9.]', ' ', 'g'))), '\\s+'),"
    f" x -> len(x) >= {MIN_TOKEN_LEN})"
)


def test_four_way_unicode_parity(spark):
    py = [tokenize_text(t) for t in CASES]
    pdv = tokenize_pandas(pd.Series(CASES)).tolist()
    duck = [r[0] for r in duckdb.sql(
        f"SELECT {_DUCK_TOKS} FROM (SELECT unnest($1::VARCHAR[]) AS t)",
        params=[CASES]).fetchall()]
    from pyspark.sql import functions as F
    sp = [r["toks"] for r in
          spark.createDataFrame([(i, t) for i, t in enumerate(CASES)],
                                "i long, text string")
          .select("i", tokens_col(F.col("text")).alias("toks"))
          .orderBy("i").collect()]
    assert py == pdv == duck == sp
    # the trigger case resolves to the strip-first reading everywhere
    # ('İ' stripped before lower can make an 'i'; 'ß' stripped, the lone
    # 'e' of 'straße' then falls to the length filter)
    assert py[0] == ["stanbul", "code", "stra"]


def test_pandas_ascii_fast_path_equals_safe_path(spark):
    """The ASCII fast path and the strip-first path must agree on ASCII
    batches (one non-ASCII row flips the whole batch to the safe path)."""
    ascii_rows = ["def foo(bar): return BAR.baz2", "A.b C4 dd", ""]
    fast = tokenize_pandas(pd.Series(ascii_rows)).tolist()
    forced = tokenize_pandas(pd.Series(ascii_rows + ["ünicode"])).tolist()
    assert fast == forced[:3]
