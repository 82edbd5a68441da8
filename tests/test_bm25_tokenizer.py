"""BM25 arithmetic identity across implementations + tokenizer contract."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from candidategeneration_spark import bm25
from candidategeneration_spark.tokenizer import (
    dbigram_pairs, tokenize_pandas, tokenize_text, tokens_col,
)


@given(
    tf=st.integers(1, 100),
    maxtf_extra=st.integers(0, 100),
    df=st.integers(1, 10_000),
    doc_len=st.integers(1, 5_000),
    n_docs=st.integers(1, 1_000_000),
    avgdl=st.integers(1, 5_000),
)
@settings(max_examples=300, deadline=None)
def test_scalar_vs_numpy(tf, maxtf_extra, df, doc_len, n_docs, avgdl):
    df = min(df, n_docs)
    maxtf = tf + maxtf_extra
    a = bm25.bm25_quantized_scalar(tf, maxtf, df, doc_len, n_docs, avgdl)
    b = bm25.bm25_quantized_np([tf], [maxtf], [df], [doc_len], n_docs, avgdl)[0]
    assert a == int(b)


def test_scalar_vs_duckdb_sql():
    rng = np.random.default_rng(42)
    n_docs, avgdl = 50_000, 37
    rows = []
    for _ in range(500):
        tf = int(rng.integers(1, 60))
        maxtf = tf + int(rng.integers(0, 60))
        df = int(rng.integers(1, n_docs))
        dl = int(rng.integers(1, 2000))
        rows.append((tf, maxtf, df, dl,
                     bm25.bm25_quantized_scalar(tf, maxtf, df, dl,
                                                n_docs, avgdl)))
    pdf = pd.DataFrame(rows, columns=["tf", "maxtf", "df", "dl", "expect"])
    expr = bm25.bm25_sql("tf", "maxtf", "df", "dl", str(n_docs), str(avgdl))
    got = duckdb.sql(f"SELECT {expr} AS s FROM pdf").df()["s"]
    assert (got.to_numpy() == pdf["expect"].to_numpy()).all()


def test_spark_column_matches_scalar(spark):
    rows = [(tf, tf + m, df, dl)
            for tf in (1, 3, 17) for m in (0, 5) for df in (1, 9, 400)
            for dl in (3, 128, 999)]
    n_docs, avgdl = 1000, 53
    sdf = spark.createDataFrame(rows, "tf long, maxtf long, df long, dl long")
    got = sdf.select(
        "tf", "maxtf", "df", "dl",
        bm25.bm25_quantized_col(
            sdf.tf, sdf.maxtf, sdf.df, sdf.dl, n_docs, avgdl).alias("s")
    ).collect()
    for r in got:
        assert r["s"] == bm25.bm25_quantized_scalar(
            r["tf"], r["maxtf"], r["df"], r["dl"], n_docs, avgdl)


def test_tokenizer_paths_agree(spark):
    texts = [
        "Hello, World! x1 y z.z  Foo_bar BAZ.qux a 42 ..",
        "", "   ", "a b c", "def __init__(self): return self.x",
        "the the the quick-brown fox",
    ]
    py = [tokenize_text(t) for t in texts]
    pdres = tokenize_pandas(pd.Series(texts)).tolist()
    assert py == pdres
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    jvm = [r[0] for r in sdf.select(tokens_col(sdf.text)).collect()]
    assert py == jvm


def test_dbigram_windows():
    toks = "a1 b1 c1 d1 e1 f1 g1".split()
    pairs = dbigram_pairs(toks, distance=2)
    assert ("a1", "b1") in pairs and ("a1", "c1") in pairs
    assert ("a1", "d1") not in pairs  # beyond window
    # self pairs excluded, ordering ascending
    assert all(a < b for a, b in pairs)
    assert dbigram_pairs(["x9", "x9"], 5) == []
    # dedup across windows
    assert dbigram_pairs("p q p q".split(), 5).count(("p", "q")) == 1
