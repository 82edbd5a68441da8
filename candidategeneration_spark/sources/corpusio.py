"""Corpus table ingestion: Iceberg catalog tables or Parquet paths.

The target input (north rule) is an Iceberg table of source-code
repositories with columns ``(repo, path, commit, lang, content)``. This
adapter resolves either source uniformly:

- ``read_corpus(spark, "catalog.db.code_files")`` → Iceberg/catalog table
  (``spark.table``; Iceberg's Spark runtime registers tables in the
  session catalog, giving snapshot isolation + partition pruning + hidden
  partitioning for free — nothing engine-side changes).
- ``read_corpus(spark, "/data/corpus.parquet")`` → Parquet path (the
  sandbox/test shape).

Docs need a stable numeric ``doc_id`` for posting lists. Real repo tables
key rows by (repo, path, commit); :func:`with_doc_id` derives a
DETERMINISTIC 64-bit id via ``xxhash64`` over that natural key, so ids are
reproducible across runs/cluster sizes (required for the N-vs-4N scaling
evidence and for resumable builds) with no global ordering shuffle. A
synthetic corpus that already carries ``doc_id`` passes through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

NATURAL_KEY = ("repo", "path", "commit")


def with_doc_id(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Ensure a deterministic numeric id column (passthrough if present).

    ``xxhash64`` is a pure column function of the natural key — no window,
    no zipWithIndex shuffle, identical on any partitioning. At 10^12 rows
    in a 64-bit space the birthday bound gives ~n²/2N ≈ 27,000 EXPECTED
    collisions (probability ≈ 1, not a tail risk) — at that scale
    ``check_doc_id_unique`` plus a salted re-hash of the colliding keys is
    a REQUIRED build step, not an optional precaution.
    """
    if id_col in docs.columns:
        return docs
    missing = [c for c in NATURAL_KEY if c not in docs.columns]
    if missing:
        raise ValueError(
            f"corpus lacks {id_col!r} and natural-key columns {missing}; "
            f"need either an id column or {NATURAL_KEY}")
    return docs.withColumn(id_col, F.xxhash64(*NATURAL_KEY))


def check_doc_id_unique(docs: DataFrame, id_col: str = "doc_id") -> int:
    """Number of colliding ids (0 = safe). One aggregation, run it once
    per corpus snapshot before a big build."""
    dup = (docs.groupBy(id_col).agg(F.count("*").alias("n"))
           .where(F.col("n") > 1).count())
    return int(dup)


def read_corpus(spark: SparkSession, source: str,
                fmt: str = "auto", id_col: str = "doc_id") -> DataFrame:
    """Load the corpus from an Iceberg/catalog table name or a file path.

    ``fmt``: ``auto`` (catalog-looking names → table, else parquet),
    ``iceberg``/``table``, or ``parquet``.
    """
    if fmt == "auto":
        looks_like_path = ("/" in source or source.endswith(".parquet")
                           or source.startswith("file:")
                           or source.startswith("s3"))
        fmt = "parquet" if looks_like_path else "table"
    if fmt in ("iceberg", "table"):
        docs = spark.table(source)
    elif fmt == "parquet":
        docs = spark.read.parquet(source)
    else:
        raise ValueError(f"unknown corpus format {fmt!r}")
    return with_doc_id(docs, id_col)
