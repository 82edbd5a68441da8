"""Resumable, idempotent build phases with lineage + metrics manifests.

The reference makes every phase resumable by checking output existence
(``checkExistence`` ``WWW.java:367-369``, used at ``WWWMain.java:78-143``) —
a human re-runs main and completed phases are skipped. Spark gives lineage
recompute *within* a job but nothing across runs, so we add the thin layer
the north rule asks for: each phase writes Parquet + a JSON manifest with

- lineage: input paths/manifest hashes, phase parameters,
- per-partition metrics: one entry per output part-file (rows, bytes),
- throughput: rows/sec (the build reports postings/sec from this).

A phase whose manifest + ``_SUCCESS`` marker exist is skipped and its
output read back — kill the build anywhere, re-run, and only unfinished
phases execute (tested in tests/test_resume.py, byte-identical results).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class Checkpointer:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    def _paths(self, name: str) -> tuple[str, str]:
        out = os.path.join(self.root, name)
        return out, out + ".manifest.json"

    def is_done(self, name: str) -> bool:
        out, manifest = self._paths(name)
        return (os.path.exists(manifest)
                and os.path.exists(os.path.join(out, "_SUCCESS")))

    def manifest(self, name: str) -> dict | None:
        _, m = self._paths(name)
        if not os.path.exists(m):
            return None
        with open(m) as f:
            return json.load(f)

    def phase(self, name: str, builder, inputs: list[str] | None = None,
              params: dict | None = None,
              partition_by: str | None = None) -> tuple[DataFrame, bool]:
        """Run (or skip) one phase. ``builder()`` → DataFrame.

        Returns (output DataFrame read from the checkpoint, skipped?).
        """
        out, manifest_path = self._paths(name)
        if self.is_done(name):
            stored = (self.manifest(name) or {}).get("params") or {}
            if params and stored != params:
                raise ValueError(
                    f"checkpoint {name!r} at {out} was built with params "
                    f"{stored}, but this run asks for {params}; refusing "
                    "to silently reuse it — delete the checkpoint or use "
                    "a different --resume-root")
            return self.spark.read.parquet(out), True
        t0 = time.time()
        df = builder()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(out)
        wall = time.time() - t0
        result = self.spark.read.parquet(out)
        parts = self._partition_metrics(out)
        rows = sum(p["rows"] for p in parts)
        manifest = {
            "phase": name,
            "inputs": inputs or [],
            "params": params or {},
            "rows": rows,
            "wall_s": round(wall, 3),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "n_partitions": len(parts),
            "partitions": parts,
            "app_id": self.spark.sparkContext.applicationId,
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
        }
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, manifest_path)  # atomic: manifest is the commit point
        return result, False

    @staticmethod
    def _partition_metrics(out_dir: str) -> list[dict]:
        """Per-part-file lineage from parquet footers (cheap metadata read)."""
        import pyarrow.parquet as pq
        parts = []
        for root, _dirs, files in os.walk(out_dir):
            for fn in sorted(files):
                if not fn.endswith(".parquet"):
                    continue
                full = os.path.join(root, fn)
                try:
                    rows = pq.ParquetFile(full).metadata.num_rows
                except Exception:
                    rows = -1
                parts.append({
                    "file": os.path.relpath(full, out_dir),
                    "rows": rows,
                    "bytes": os.path.getsize(full),
                })
        return parts


def build_index_resumable(docs: DataFrame, root: str,
                          id_col: str | None = None,
                          dbigram_distance: int | None = 5,
                          salt_buckets: int = 0,
                          n_store_buckets: int = 64,
                          stopwords=None):
    """Checkpointed end-to-end build: postings → scored [→ pairs] → segments.

    Each phase is an idempotent Parquet output; re-running after a crash
    executes only missing phases. The segments phase writes the
    term-bucketed store layout (segmentstore.py). Pairs come from the
    doc-local scoring pass (build.build_pair_postings — the pair table is
    born scored and checkpoints WITHOUT ever being joined), so a crash
    during the giant pair phase resumes from the scored unigrams.
    ``id_col`` defaults to ``doc_id`` if present, else the first column —
    same detection as the CLI build paths."""
    from .build import build_pair_postings, build_postings, build_segments, \
        global_stats, pair_segment_input, score_postings
    from .sources.segmentstore import bucket_of
    from pyspark.sql import functions as F

    spark = docs.sparkSession
    cp = Checkpointer(root, spark)
    text_col = _text_col(docs)
    if id_col is None:
        id_col = "doc_id" if "doc_id" in docs.columns else docs.columns[0]
    # stopwords participate in phase params: a resume against checkpoints
    # built with a different stopword set must fail loudly, not silently
    # reuse postings that were tokenized under the other contract
    sw_key = (sorted(stopwords)[:8] + [f"n={len(stopwords)}"]) \
        if stopwords else None
    stats_df, _ = cp.phase(
        "stats",
        lambda: spark.createDataFrame(
            [tuple(global_stats(docs, text_col, stopwords).values())],
            "n_docs long, total_tokens long, avgdl long"),
        params={"stopwords": sw_key})
    srow = stats_df.collect()[0]
    stats = {"n_docs": srow["n_docs"], "total_tokens": srow["total_tokens"],
             "avgdl": srow["avgdl"]}
    # round-4 stage sizing applies here too: the tokenize pass scales to
    # ceil(n_docs/512) tasks (n_docs is free from the stats phase; inert
    # on multi-split inputs — build_postings only repartitions UP)
    from .build import DOCS_PER_TOKENIZE_TASK
    tok_parts = min(spark.sparkContext.defaultParallelism,
                    max(1, -(-stats["n_docs"] // DOCS_PER_TOKENIZE_TASK)))
    postings, _ = cp.phase(
        "postings",
        lambda: build_postings(docs, id_col=id_col, text_col=text_col,
                               stopwords=stopwords,
                               input_partitions=tok_parts),
        params={"id_col": id_col, "stopwords": sw_key})
    scored, _ = cp.phase(
        "scored",
        lambda: score_postings(postings, stats["n_docs"], stats["avgdl"]),
        inputs=["postings", "stats"])
    if dbigram_distance:
        # round-5 sizing: the pair-kernel input is a SMALL join at bench
        # scale and AQE coalesces it to one task — size it by token
        # volume like build_index does (cap 4×cores, inert at scale)
        from .build import TOKENS_PER_PAIR_TASK
        pair_parts = min(
            spark.sparkContext.defaultParallelism * 4,
            max(1, -(-stats["total_tokens"] // TOKENS_PER_PAIR_TASK)))
        pairs, _ = cp.phase(
            "pairs",
            lambda: build_pair_postings(docs, scored, id_col, text_col,
                                        dbigram_distance,
                                        stopwords=stopwords,
                                        num_partitions=pair_parts),
            inputs=["scored"],
            params={"dbigram_distance": dbigram_distance,
                    "stopwords": sw_key})
        # shared X2 stored format (zigzag(s2) in the tf stream): a resumed
        # build's segments are byte-identical to build_index's
        seg_in = pair_segment_input(scored, pairs)
    else:
        seg_in = scored
    hint = stats["total_tokens"] * (dbigram_distance or 0) \
        + stats["total_tokens"]  # unigram postings <= total tokens
    segments, _ = cp.phase(
        "segments",
        lambda: build_segments(seg_in, salt_buckets=salt_buckets,
                               n_postings_hint=hint)
        .withColumn("bucket", bucket_of(F.col("term"), n_store_buckets)),
        inputs=["scored", "pairs"] if dbigram_distance else ["scored"],
        params={"salt_buckets": salt_buckets,
                "n_store_buckets": n_store_buckets},
        partition_by="bucket")
    return segments, stats, cp


def _text_col(docs: DataFrame) -> str:
    return "content" if "content" in docs.columns else "text"
