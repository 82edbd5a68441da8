"""spark-submit --py-files deployment contract (the north rule's named
run mode): the package must be fully usable from the zip alone — no repo
on PYTHONPATH, driver script in a scratch dir — through build + query.

Uses the pyspark-bundled spark-submit so the test tracks the installed
Spark version; the driver script prints a rank-identity checksum that the
parent asserts.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import sys
from pyspark.sql import SparkSession

# the package must come from --py-files, not from a repo checkout
assert not any(p.rstrip("/").endswith("repo") for p in sys.path), sys.path
from candidategeneration_spark.build import build_index
from candidategeneration_spark.queryengine import wand_topk

spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
docs = spark.createDataFrame(
    [(i, f"alpha beta w{i} w{i % 3} gamma") for i in range(30)],
    "doc_id long, text string")
segments, stats = build_index(docs, dbigram_distance=2)
queries = spark.createDataFrame(
    [(0, ["alpha", "w1"]), (1, ["absent"])], "qid long, terms array<string>")
rows = wand_topk(segments, queries, k=5).collect()
got = sorted((r["qid"], r["rank"], r["doc_id"]) for r in rows)
print("SUBMIT_OK", stats["n_docs"], len(got), got[0] if got else None)
spark.stop()
"""


def _spark_submit() -> str:
    import pyspark
    cand = os.path.join(os.path.dirname(pyspark.__file__),
                        "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    found = shutil.which("spark-submit")
    if found:
        return found
    pytest.skip("no spark-submit available")


def test_spark_submit_py_files_e2e(tmp_path):
    sys.path.insert(0, REPO)
    from candidategeneration_spark.config import package_zip
    zip_path = package_zip(str(tmp_path / "cg.zip"))
    script = tmp_path / "driver.py"
    script.write_text(DRIVER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [_spark_submit(), "--master", "local[2]",
         "--py-files", zip_path, str(script)],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path), env=env)
    assert out.returncode == 0, out.stderr[-3000:]
    ok = [ln for ln in out.stdout.splitlines() if ln.startswith("SUBMIT_OK")]
    assert ok, out.stdout[-2000:] + out.stderr[-2000:]
    parts = ok[0].split(" ", 3)
    assert parts[1] == "30"          # n_docs through the zip-only build
    assert int(parts[2]) >= 5        # query returned ranked rows
