"""JSONL corpus source: one JSON document per line, optionally gzipped —
the de-facto interchange format of LLM training-data pipelines (Common
Crawl derivatives, The Pile / RedPajama shards, exported crawl dumps).

Spark's JSON reader handles .jsonl and .jsonl.gz natively (text format,
one record per line; gzip is a non-splittable codec — one task per .gz
file, the same granularity WARC ingestion uses). The schema is passed
EXPLICITLY: schema inference would scan the corpus twice and, at 100 TB,
once is already expensive. Field names are remapped to the engine's
(doc_id, text) contract by coalescing the common public-dump spellings
in priority order; ids are derived deterministically when the shard
carries none (same xxhash64 posture as corpusio.with_doc_id —
reproducible across runs and cluster sizes, birthday-bound caveat and
check-then-salted-rehash posture included by reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# common field spellings across public corpus dumps, priority order
_TEXT_FIELDS = ("text", "content", "raw_content", "body")
_ID_FIELDS = ("doc_id", "id", "document_id")


def read_docs_jsonl(spark: SparkSession, path: str,
                    text_field: str | None = None,
                    id_field: str | None = None) -> DataFrame:
    """(doc_id long, text string) from a JSONL file/dir (.jsonl[.gz]).

    ``text_field`` / ``id_field`` pin a specific spelling; by default the
    common spellings are coalesced in priority order (mixed shards work).
    Rows whose text is empty/missing are dropped. Id derivation, in
    order: numeric id value as-is; non-numeric id (UUIDs etc.) →
    xxhash64 of the id string; no id at all → xxhash64(text), which is
    CONTENT-ADDRESSED — byte-identical texts collapse to one row at
    ingest (exact dedup happens here by construction; downstream ops
    rely on doc_id uniqueness, so the collapse is applied explicitly
    rather than leaking duplicate ids)."""
    text_candidates = (text_field,) if text_field else _TEXT_FIELDS
    id_candidates = (id_field,) if id_field else _ID_FIELDS
    schema = ", ".join(f"{f} string" for f in
                       dict.fromkeys(text_candidates + id_candidates))
    raw = spark.read.schema(schema).json(path)
    text = F.coalesce(*[F.col(f) for f in text_candidates], F.lit("")) \
            .alias("text")
    # Resolve ONE id field per row in priority order FIRST, then derive:
    # coalescing try_cast(long) across all candidates would let a
    # lower-priority numeric id (id="7") override a higher-priority
    # non-numeric one (doc_id="uuid-abc").
    id_str = F.coalesce(*[F.col(f) for f in id_candidates])
    doc_id = F.coalesce(
        id_str.try_cast("long"),
        F.when(id_str.isNotNull(), F.xxhash64(id_str)),
        F.xxhash64(F.coalesce(*[F.col(f) for f in text_candidates],
                              F.lit("")))).alias("doc_id")
    out = raw.select(doc_id, text).where(F.col("text") != "")
    # Deterministic duplicate collapse: distinct texts colliding on an id
    # keep the lexicographically smallest text (dropDuplicates would keep
    # an arbitrary, run-dependent survivor).
    return out.groupBy("doc_id").agg(F.min("text").alias("text"))


def write_docs_jsonl(docs: DataFrame, path: str,
                     compress: bool = True) -> None:
    """Write (doc_id, text) back out as JSONL shards (gzip by default) —
    the sink side of the interchange contract."""
    w = docs.select("doc_id", "text").write.mode("overwrite")
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)
