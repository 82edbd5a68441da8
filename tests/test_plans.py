"""Physical-plan assertions for the headline pipelines (SURVEY.md §4):
pushdown/pruning/broadcast/codegen must actually appear in the optimized
plans, not just be assumed. These are the sandbox stand-ins for 100 TB plan
reviews — a scan reading unpruned columns fails here instead of on a
cluster bill."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from candidategeneration_spark import plans  # noqa: E402
from candidategeneration_spark.build import build_postings  # noqa: E402
from candidategeneration_spark.queryengine import wand_topk  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def test_tokenize_scan_prunes_columns(spark):
    """The postings pipeline must read ONLY (doc_id, text) from the corpus
    parquet — tokenization cannot drag lang/source/n_chars into the scan."""
    docs = spark.read.parquet(f"{TESTDATA}/sf0.001/documents.parquet")
    postings = build_postings(docs, text_col="text")
    plans.assert_columns_pruned(postings, {"doc_id", "text"})


def test_filter_pushdown_reaches_scan(spark):
    docs = spark.read.parquet(f"{TESTDATA}/sf0.001/documents.parquet")
    q = docs.where(F.col("lang") == "en").select("doc_id")
    plans.assert_pushed_filter(q, "lang")
    plans.assert_columns_pruned(q, {"doc_id", "lang"})


def test_query_join_is_broadcast_not_shuffle(spark, docs_sf001):
    """wand_topk joins segments × query terms: the tiny query side must
    broadcast; the segment table must never move through a SortMergeJoin."""
    from candidategeneration_spark.build import build_index
    segments, _ = build_index(docs_sf001, dbigram_distance=None)
    qdf = spark.createDataFrame([(0, ["fast", "key"])],
                                "qid long, terms array<string>")
    res = wand_topk(segments, qdf, k=5)
    plans.assert_broadcast_join(res)
    plans.assert_no_shuffle_join_of(res, "SortMergeJoin")


def test_term_dictionary_no_global_window(spark, docs_sf001):
    """Dictionary id assignment must not contain a partition-less Window
    (single-task sort of the whole vocabulary) nor a 1-partition exchange;
    ids must still equal the global dense rank by term."""
    from candidategeneration_spark import textops
    dt = textops.doc_tokens(docs_sf001)
    d = textops.term_dictionary(dt)
    plan = plans.explain_str(d, "simple")
    assert "Window" not in plan, f"global window in dictionary plan:\n{plan}"
    assert "SinglePartition" not in plan, \
        f"single-partition exchange in dictionary plan:\n{plan}"
    got = {r["term"]: r["tid"] for r in d.collect()}
    terms = sorted(got)
    assert [got[t] for t in terms] == list(range(1, len(terms) + 1))


def test_relational_agg_uses_codegen(spark):
    """The relational surface must stay inside whole-stage codegen (JVM),
    not fall back to interpreted row processing."""
    from candidategeneration_spark.relops import pricing_summary
    df = pricing_summary(spark, f"{TESTDATA}/sf0.001")
    plans.assert_wholestage_codegen(df)
    plans.assert_columns_pruned(df, {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate"})


def test_dim_join_broadcasts(spark):
    from candidategeneration_spark.relops import top_orders
    df = top_orders(spark, f"{TESTDATA}/sf0.001")
    plans.assert_broadcast_join(df)


def test_pair_budget_semi_join_broadcasts(spark, docs_sf001):
    """build_pair_postings_budget: the needed-terms prune must be a
    broadcast semi join (the scored table never SortMergeJoins against
    the tiny pair-derived term set). Asserted on the prune stage itself —
    posting_positions eagerly localCheckpoints downstream, which truncates
    lineage so the final pair plan no longer SHOWS the prune join even
    though it always runs."""
    from candidategeneration_spark.build import (
        build_pair_postings_budget, build_postings,
        global_stats_from_postings, pair_needed_terms_prune,
        score_postings,
    )
    p = build_postings(docs_sf001)
    st = global_stats_from_postings(p, docs_sf001.count())
    scored = score_postings(p, st["n_docs"], st["avgdl"])
    pairs = spark.createDataFrame([("fast", "key"), ("data", "query")],
                                  "t1 string, t2 string")
    pre = pair_needed_terms_prune(scored, pairs)
    plans.assert_broadcast_join(pre)
    plan = plans.explain_str(pre, "simple")
    assert "SortMergeJoin" not in plan, \
        f"needed-terms prune must not shuffle the postings:\n{plan}"
    # full pipeline: the side joins of budget-bounded prefixes x pair set
    # may legally shuffle at scale (the reference's pair universe is ~11M
    # pairs), but an all-pairs nested-loop join is never acceptable
    bp = build_pair_postings_budget(scored, pairs, 16)
    plans.assert_no_shuffle_join_of(bp, "BroadcastNestedLoopJoin")
    plans.assert_no_shuffle_join_of(bp, "CartesianProduct")


def test_near_dup_band_join_is_equi_join(spark):
    """near_dup_pairs: the band self-join (the piece that must scale) has
    to be a hash/sort equi-join on (band, bkey) — a CartesianProduct or
    BroadcastNestedLoopJoin between the two signature sides would be the
    all-pairs plan the banding exists to avoid."""
    from candidategeneration_spark import annops
    emb = spark.read.parquet(f"{TESTDATA}/sf0.001/embeddings.parquet")
    nd = annops.near_dup_pairs(emb)
    plan = plans.explain_str(nd)
    assert "CartesianProduct" not in plan, plan
    import re
    # an equi-join on the band keys must exist (any hash/sort flavor)
    assert re.search(r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin",
                     plan), plan
    # nested-loop joins may appear ONLY as the broadcast of the tiny bands
    # range (4 rows) — i.e. every one must be a BroadcastNestedLoopJoin,
    # never a plain NestedLoopJoin over the two signature sides
    assert "NestedLoopJoin" not in plan.replace(
        "BroadcastNestedLoopJoin", ""), plan


def test_online_greedy_windows_are_per_query(spark, docs_sf001):
    """Q8: every window in the online-greedy plan must be partitioned (by
    qid / (qid, term) / term) — an empty PARTITION BY would serialize the
    query batch through one task at scale."""
    from candidategeneration_spark import quality as Q
    from candidategeneration_spark.build import (
        build_postings, global_stats, score_postings,
    )
    st = global_stats(docs_sf001)
    scored = score_postings(build_postings(docs_sf001),
                            st["n_docs"], st["avgdl"])
    qdf = spark.createDataFrame([(0, ["fast", "key"])],
                                "qid long, terms array<string>")
    golden = Q.golden_topk(scored, qdf, k=5)
    gt = golden.join(qdf.select("qid", F.explode("terms").alias("term")),
                     "qid").select("term", "doc_id")
    df = Q.online_greedy_topk(scored, qdf, gt, budget=64, k=5)
    plan = plans.explain_str(df, mode="extended")
    import re
    # 'windowspecdefinition(...)' lists partition columns FIRST; in an
    # unpartitioned window the first argument is a sort spec
    # ('col ASC/DESC ...'). Assert every window in the plan partitions.
    specs = re.findall(r"windowspecdefinition\(([^,]+),", plan)
    assert specs, "expected windows in the Q8 plan"
    for first_arg in specs:
        assert " ASC" not in first_arg and " DESC" not in first_arg, \
            f"unpartitioned window in Q8 plan: {first_arg}"


def test_pq_scoring_join_is_broadcast_equi_join(spark):
    """PQ/ADC and IVF-PQ: the per-candidate scoring join (code table ×
    ADC table) must be a broadcast hash equi-join, and the corpus side
    must never enter a CartesianProduct — the only nested-loop joins
    allowed are the broadcast of the tiny centroid/plane tables that the
    deterministic k-means needs."""
    from candidategeneration_spark import annops
    emb = spark.read.parquet(f"{TESTDATA}/sf0.001/embeddings.parquet")
    for df in (annops.pq_adc_topk(emb), annops.ivfpq_topk(emb)):
        plan = plans.explain_str(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan
        assert "NestedLoopJoin" not in plan.replace(
            "BroadcastNestedLoopJoin", ""), plan


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Two tables bucketed+sorted on the join key must join with NO
    Exchange and NO Sort — the write-once/join-many co-location that
    replaces per-run shuffles of the big side at scale."""
    from candidategeneration_spark.sources import bucketed
    a = spark.range(2000).select(F.col("id").alias("doc_id"),
                                 (F.col("id") * 2).alias("x"))
    b = spark.range(2000).select(F.col("id").alias("doc_id"),
                                 (F.col("id") * 3).alias("y"))
    try:
        bucketed.save_bucketed(a, "bt_a", str(tmp_path / "bt_a"),
                               "doc_id", n_buckets=8)
        bucketed.save_bucketed(b, "bt_b", str(tmp_path / "bt_b"),
                               "doc_id", n_buckets=8)
        j = bucketed.bucketed_join(spark, "bt_a", "bt_b", "doc_id")
        plan = plans.explain_str(j, "simple")
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert j.count() == 2000
        # with the sorted-scan flag, the write-time sortBy also removes
        # the per-task Sort (off by default since Spark 3.0: reading
        # every bucket sorted forces one task per bucket, which caps
        # scan parallelism — the flag is a deliberate trade)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        try:
            plan2 = plans.explain_str(
                bucketed.bucketed_join(spark, "bt_a", "bt_b", "doc_id"),
                "simple")
            assert "Sort " not in plan2.replace("SortMergeJoin", ""), plan2
        finally:
            spark.conf.set(
                "spark.sql.legacy.bucketedTableScan.outputOrdering",
                "false")
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_hot_pair_routing_broadcast_not_in_literal(spark, docs_sf001):
    """Skew-aware hot/cold pair routing (build_index_skew_aware): the
    hot-term set must reach the pair table as a BROADCAST left join, not
    a collected In-literal (which at 100 TB with a low threshold compiles
    a giant predicate into every task). Forced-low threshold so hot terms
    and hot-candidate pairs actually exist; the pair table itself must
    never shuffle for the routing join."""
    from candidategeneration_spark.build import build_index_skew_aware
    seg, stats = build_index_skew_aware(docs_sf001, hot_df_threshold=5,
                                        dbigram_distance=2)
    plan = plans.explain_str(seg, "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # no In-literal of collected hot terms anywhere in the routing plan:
    # a term list would render as 'In(term, [' or a giant 'IN (' predicate
    assert " IN (" not in plan and "In(term" not in plan, plan
    # and the routed build still answers: smoke one collect
    assert seg.limit(1).count() == 1
