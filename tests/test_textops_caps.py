"""Hot-group guards for the similarity joins (round-2): gram df-cap and
LSH bucket cap bound the quadratic fan-out on boilerplate-heavy corpora
without changing default (oracle-parity) results."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from candidategeneration_spark import textops  # noqa: E402

BOILER = "license header apache version http www example com rights reserved"


def _corpus(spark):
    rows = []
    # 12 docs sharing identical boilerplate + a unique tail
    for i in range(12):
        rows.append((i, f"{BOILER} unique{i} token{i} filler{i}"))
    # 2 genuinely similar docs with no boilerplate
    rows.append((100, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta iota"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_gram_df_cap(spark):
    docs = _corpus(spark)
    full = textops.ngram_jaccard_pairs(docs, min_jacc_q=1)
    capped = textops.ngram_jaccard_pairs(docs, min_jacc_q=1, gram_df_cap=5)
    f = {(r["doc_a"], r["doc_b"]): (r["inter"], r["jacc_q"])
         for r in full.collect()}
    c = {(r["doc_a"], r["doc_b"]): (r["inter"], r["jacc_q"])
         for r in capped.collect()}
    # capped results are a subset with inter/jacc lower bounds
    assert set(c) <= set(f)
    for k, (inter, jacc) in c.items():
        assert inter <= f[k][0] and jacc <= f[k][1]
    # the boilerplate clique's shared grams are capped out -> those pairs
    # lose their (identical-prefix) intersections
    assert (0, 1) in f and (0, 1) not in c
    # the genuinely-similar low-df pair survives with EXACT values
    assert c[(100, 101)] == f[(100, 101)]


def test_scale_preset_wires_measured_caps(spark):
    """scale=True must equal passing the measured default caps explicitly
    (and an explicit cap must win over the preset)."""
    docs = _corpus(spark)
    preset = {(r["doc_a"], r["doc_b"]) for r in
              textops.lsh_candidate_pairs(docs, scale=True).collect()}
    explicit = {(r["doc_a"], r["doc_b"]) for r in
                textops.lsh_candidate_pairs(
                    docs, max_bucket_size=textops.SCALE_LSH_MAX_BUCKET)
                .collect()}
    assert preset == explicit
    override = {(r["doc_a"], r["doc_b"]) for r in
                textops.lsh_candidate_pairs(
                    docs, max_bucket_size=5, scale=True).collect()}
    small = {(r["doc_a"], r["doc_b"]) for r in
             textops.lsh_candidate_pairs(docs, max_bucket_size=5).collect()}
    assert override == small

    jp = {(r["doc_a"], r["doc_b"]): r["jacc_q"] for r in
          textops.ngram_jaccard_pairs(docs, min_jacc_q=1,
                                      scale=True).collect()}
    je = {(r["doc_a"], r["doc_b"]): r["jacc_q"] for r in
          textops.ngram_jaccard_pairs(
              docs, min_jacc_q=1,
              gram_df_cap=textops.SCALE_GRAM_DF_CAP).collect()}
    assert jp == je


def test_cli_dedup_scale_flag(spark, tmp_path, capsys):
    """`dedup --scale` runs the preset end-to-end and reports pair count."""
    import json
    from candidategeneration_spark import cli
    src = str(tmp_path / "corpus")
    out = str(tmp_path / "pairs")
    _corpus(spark).write.parquet(src)
    rc = cli.main(["dedup", "--corpus", src, "--out", out,
                   "--method", "lsh", "--scale"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["scale"] is True
    assert rep["pairs"] == spark.read.parquet(out).count()


def test_lsh_bucket_cap(spark):
    # identical docs -> identical signatures -> every band bucket holds the
    # whole 12-doc clique (> cap) and gets dropped; the distinct near-dup
    # pair lives in small buckets and survives
    rows = [(i, BOILER) for i in range(12)]
    rows.append((100, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta iota"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = {(r["doc_a"], r["doc_b"])
            for r in textops.lsh_candidate_pairs(docs).collect()}
    capped = {(r["doc_a"], r["doc_b"])
              for r in textops.lsh_candidate_pairs(
                  docs, max_bucket_size=5).collect()}
    assert capped <= full
    # boilerplate clique floods its buckets (12 docs > cap) -> dropped
    assert (0, 1) in full
    assert all(a >= 100 for a, b in capped), capped
    # the small-bucket near-dup pair survives
    assert (100, 101) in full and (100, 101) in capped


def test_dedup_clusters_chain_and_disjoint(spark):
    """Connected components over explicit pairs: a 5-doc chain needs
    multi-round min propagation; a separate 2-doc pair and singletons
    keep their own labels."""
    docs = spark.createDataFrame([(i, f"doc {i}") for i in range(10)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),   # chain 1-2-3-4-5
         (7, 8)],                          # separate pair
        "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in
           textops.dedup_clusters(docs, pairs=pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   6: 6, 7: 7, 8: 7, 9: 9}


def test_dedup_clusters_from_lsh_pairs(spark):
    """End-to-end over LSH candidates: boilerplate clones cluster to the
    min doc_id; the two alpha-docs form their own cluster."""
    docs = _corpus(spark)
    got = {r["doc_id"]: r["cluster_id"] for r in
           textops.dedup_clusters(docs).collect()}
    # 12 boilerplate docs share bands -> one cluster rooted at 0
    assert all(got[i] == 0 for i in range(12))
    assert got[100] == got[101] == 100


def test_gopher_rules_signals_and_keep(spark):
    """Constructed docs: one passes every bound; others each trip exactly
    one rule (too short, symbol-heavy, bullet-heavy, no stopwords)."""
    good_words = ("the cat and dog of house in garden is nice it runs on "
                  "grass with speed over fields near water under trees ")
    good = (good_words * 3).strip()           # >50 tokens, wlen 3-10, stops
    rows = [
        (1, good),
        (2, "the and of"),                              # too short
        (3, good + " " + "#" * 1 + (" #" * 40)),        # symbol-heavy
        (4, "\n".join(f"- {good_words}" for _ in range(10))),  # bullets
        (5, ("zz yy xx ww vv uu tt ss rr qq " * 8).strip()),   # no stops
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textops.gopher_rules(docs).collect()}
    assert got[1]["keep"] == 1
    assert got[2]["keep"] == 0 and got[2]["n_tokens"] < 50
    assert got[3]["keep"] == 0 and got[3]["symbol_ratio_q"] > 100_000
    assert got[4]["keep"] == 0 and got[4]["bullet_ratio_q"] > 900_000
    assert got[5]["keep"] == 0 and got[5]["stop_hits"] < 2
