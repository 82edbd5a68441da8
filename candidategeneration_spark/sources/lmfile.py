"""External language-model file reader (Q9 parity path).

The reference converts EXTERNAL n-gram LM text files through its term
dictionary (``convertLanguageModel`` + ``buildLanguageMap``,
``Metadata.java:20-84``): unigram lines are ``term <f1> <prob> ...`` with
the probability at field index 2, bigram lines are ``t1 t2 <f2> <prob>``
with the probability at index 3; terms missing from the dictionary are
dropped (the swallowed NullPointerException), numerically malformed lines
are dropped (the NumberFormatException counter), and bigram ids are packed
``a<<32 | b`` (``getPair``, ``WWW.java:432-440``).

Spark shape: ``spark.read.text`` (handles .gz natively) → split + try_cast
column math → dictionary-encode by joining the (tiny) LM table INTO the
dictionary with the LM side broadcast — the 10^12-term dictionary never
moves. Probabilities are also emitted quantized (floor(p·scale)) so tests
can assert exact integers.

Documented divergences (both in the bigram path):
- pair keys are order-normalized (lo PAIR_SEP hi by term order; the packed
  id sorts tids the same way), whereas the reference packs ids in file
  order — its bigram LM files list each unordered pair once, so
  normalizing is a superset-compatible choice.
- equal-term bigram lines (t1 == t2) are DROPPED. The reference keeps them
  (``getPair(id, id)``), but this engine's d-bigram index can never hold a
  same-term pair (the window generator filters a == b,
  ``build._pair_rows_scored``), so a kept entry could never join anything
  downstream; dropping at read time keeps the LM table exactly the keyable
  set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

LM_SCALE = 1_000_000_000  # = quality.LM_SCALE (kept import-light)


def read_language_model(spark: SparkSession, path: str,
                        dictionary: DataFrame, kind: str = "unigram",
                        scale: int = LM_SCALE) -> DataFrame:
    """(term, tid, is_pair, p, p_q) from an external LM text file.

    ``dictionary``: (term, tid) — the index's term dictionary
    (textops.term_dictionary). ``kind``: "unigram" | "bigram". ``p_q`` =
    floor(p · scale) as int64. OOV terms and malformed lines drop out,
    per the reference's conversion semantics.
    """
    from ..build import PAIR_SEP
    raw = spark.read.text(path).select(
        F.split(F.col("value"), " ").alias("f"))
    d = dictionary.select("term", "tid")
    if kind == "unigram":
        lm = raw.select(
            F.col("f").getItem(0).alias("term"),
            F.col("f").getItem(2).try_cast("double").alias("p")) \
            .where(F.col("p").isNotNull())
        enc = d.join(F.broadcast(lm), "term") \
               .select("term", "tid", F.lit(0).cast("long").alias("is_pair"),
                       "p")
    elif kind == "bigram":
        lm = raw.select(
            F.least(F.col("f").getItem(0), F.col("f").getItem(1))
             .alias("t1"),
            F.greatest(F.col("f").getItem(0), F.col("f").getItem(1))
             .alias("t2"),
            F.col("f").getItem(3).try_cast("double").alias("p")) \
            .where(F.col("p").isNotNull()
                   # documented divergence (module docstring): the
                   # reference keeps t1==t2 lines; we drop them because no
                   # d-bigram key can ever match one
                   & (F.col("t1") != F.col("t2")))
        a = d.select(F.col("term").alias("t1"), F.col("tid").alias("tid1"))
        b = d.select(F.col("term").alias("t2"), F.col("tid").alias("tid2"))
        # each join broadcasts the (tiny, shrinking) LM side into the
        # dictionary scan — the dictionary never crosses an exchange
        enc1 = a.join(F.broadcast(lm), "t1")
        enc = b.join(F.broadcast(enc1), "t2")
        enc = enc.select(
            F.concat_ws(PAIR_SEP, "t1", "t2").alias("term"),
            (F.shiftleft(F.col("tid1"), 32)
             .bitwiseOR(F.col("tid2").bitwiseAND(F.lit(0xFFFFFFFF))))
            .alias("tid"),
            F.lit(1).cast("long").alias("is_pair"), "p")
    else:
        raise ValueError(f"kind must be unigram|bigram, got {kind!r}")
    return enc.select(
        "term", F.col("tid").cast("long").alias("tid"), "is_pair", "p",
        F.floor(F.col("p") * F.lit(int(scale))).cast("long").alias("p_q"))
