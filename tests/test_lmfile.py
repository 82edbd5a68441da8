"""External LM file reader (Q9 parity, Metadata.java:20-84 semantics):
field positions, OOV drop, malformed-line drop, pair packing — checked
against a DuckDB replay of the same file."""

import duckdb
import pytest
from pyspark.sql import functions as F

from candidategeneration_spark.build import PAIR_SEP
from candidategeneration_spark.sources.lmfile import read_language_model

SCALE = 1_000_000_000


@pytest.fixture(scope="module")
def dictionary(spark):
    terms = ["alpha", "beta", "gamma", "delta"]
    return spark.createDataFrame(
        [(t, i + 1) for i, t in enumerate(sorted(terms))],
        "term string, tid long").cache()


def test_unigram_lm_reader(spark, tmp_path, dictionary):
    path = tmp_path / "uni.lm"
    lines = [
        "alpha 42 0.25",          # kept
        "beta 7 0.125 extratail",  # kept (extra fields ignored)
        "zeta 1 0.5",              # OOV -> dropped
        "gamma x notanumber",      # malformed prob -> dropped
        "delta 3 1e-3",            # scientific notation kept
    ]
    path.write_text("\n".join(lines) + "\n")
    got = {r["term"]: r for r in
           read_language_model(spark, str(path), dictionary,
                               kind="unigram").collect()}
    assert set(got) == {"alpha", "beta", "delta"}
    assert got["alpha"]["p_q"] == SCALE // 4
    assert got["beta"]["p_q"] == SCALE // 8
    assert got["delta"]["p_q"] == SCALE // 1000
    assert all(r["is_pair"] == 0 for r in got.values())
    # tid comes from the dictionary encode
    tids = {r["term"]: r["tid"] for r in dictionary.collect()}
    assert got["alpha"]["tid"] == tids["alpha"]
    # DuckDB replay of the same semantics over the same file
    oracle = duckdb.sql(f"""
        SELECT f[1] AS term,
               CAST(floor(TRY_CAST(f[3] AS DOUBLE) * {SCALE}) AS BIGINT)
                 AS p_q
        FROM (SELECT string_split(line, ' ') AS f
              FROM read_csv('{path}', sep='\x01', header=false,
                            columns={{'line': 'VARCHAR'}}))
        WHERE TRY_CAST(f[3] AS DOUBLE) IS NOT NULL
          AND f[1] IN ('alpha', 'beta', 'gamma', 'delta')
    """).fetchall()
    assert {(t, q) for t, q in oracle} == \
        {(t, r["p_q"]) for t, r in got.items()}


def test_bigram_lm_reader(spark, tmp_path, dictionary):
    path = tmp_path / "bi.lm"
    lines = [
        "alpha beta 9 0.0625",     # kept; already ordered
        "gamma beta 4 0.03125",    # kept; normalized to beta|gamma
        "alpha zeta 1 0.5",        # one side OOV -> dropped
        "beta alpha x bad",        # malformed prob -> dropped
        "alpha alpha 2 0.25",      # self-pair -> dropped
    ]
    path.write_text("\n".join(lines) + "\n")
    got = {r["term"]: r for r in
           read_language_model(spark, str(path), dictionary,
                               kind="bigram").collect()}
    assert set(got) == {f"alpha{PAIR_SEP}beta", f"beta{PAIR_SEP}gamma"}
    ab = got[f"alpha{PAIR_SEP}beta"]
    assert ab["is_pair"] == 1 and ab["p_q"] == SCALE // 16
    tids = {r["term"]: r["tid"] for r in dictionary.collect()}
    # reference getPair packing (WWW.java:432-440) over ordered tids
    assert ab["tid"] == (tids["alpha"] << 32) | (tids["beta"] & 0xFFFFFFFF)
    bg = got[f"beta{PAIR_SEP}gamma"]
    assert bg["tid"] == (tids["beta"] << 32) | (tids["gamma"] & 0xFFFFFFFF)
    assert bg["p_q"] == SCALE // 32


def test_lm_reader_broadcasts_lm_not_dictionary(spark, tmp_path, dictionary):
    """The dictionary is the 10^12-row side at scale: the plan must
    broadcast the LM table into it, never shuffle-exchange the dict."""
    path = tmp_path / "plan.lm"
    path.write_text("alpha 1 0.5\n")
    for kind in ("unigram", "bigram"):
        p = tmp_path / f"{kind}.lm"
        p.write_text("alpha 1 0.5\n" if kind == "unigram"
                     else "alpha beta 1 0.5\n")
        plan = read_language_model(spark, str(p), dictionary, kind=kind) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
