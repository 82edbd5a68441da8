"""Source connectors: gzip CSV round-trip + HITS aggregation (S6/A6)."""

import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from candidategeneration_spark.relops import HITS_SCALE  # noqa: E402
from candidategeneration_spark.sources import hitscsv  # noqa: E402


def test_gzip_csv_hits_roundtrip(spark, tmp_path):
    p = tmp_path / "hits.csv.gz"
    rows = [(1, 10), (1, 4), (2, 7), (3, 1), (3, 1), (3, 1)]
    with gzip.open(p, "wt") as f:
        for d, h in rows:
            f.write(f"{d},{h}\n")
    df = hitscsv.read_hits_csv(spark, str(p))
    assert df.count() == len(rows)
    agg = {r["doc_id"]: r["hit_score"]
           for r in hitscsv.aggregate_hits(df).collect()}
    # doc 1: 10*w1 + 4*w2 ; w1 = HITS_SCALE (log2(1)+1 == 1)
    from candidategeneration_spark.relops import hits_weights
    w = dict(hits_weights())
    assert agg[1] == 10 * w[1] + 4 * w[2]
    assert agg[2] == 7 * HITS_SCALE
    assert agg[3] == 1 * w[1] + 1 * w[2] + 1 * w[3]
    # DCG property: equal counts at deeper ranks contribute less
    assert w[1] > w[2] > w[3]
