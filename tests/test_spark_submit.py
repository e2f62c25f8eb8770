"""spark-submit --py-files packaging gate (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Runs a REAL `spark-submit` subprocess from a temp cwd with the repo absent
from sys.path, so the engine is importable only from the shipped zip —
exactly what executors on a remote cluster see."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import json, sys
from pyspark.sql import SparkSession

# the engine must come from the --py-files zip, never the repo checkout
assert not any(p.rstrip('/').endswith('repo') for p in sys.path[:1])
from lightly_ocr_spark.operators.extract_udf import extract_pages
from lightly_ocr_spark.functions.pdf import make_pdf

spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2").getOrCreate())
rows = [
    ("html://1", None, b"<html><body><p>submitted html paragraph with "
                       b"enough words to clear the gates</p></body></html>"),
    ("pdf://1", None, make_pdf("submitted pdf paragraph with plenty of "
                               "words to verify extraction")),
]
pages = spark.createDataFrame(
    rows, "url string, warc_ts timestamp, html binary")
got = {r["url"]: r["text"] for r in extract_pages(pages).collect()}
print("RESULT:" + json.dumps(got))
"""


@pytest.mark.spark
def test_spark_submit_pyfiles_zip(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, REPO)
    from tools.build_pyfiles import main as build_zip

    zip_path = build_zip()
    script = tmp_path / "driver.py"
    script.write_text(DRIVER)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--py-files", zip_path, str(script)],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=600,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT:")]
    assert line, out.stdout[-2000:]
    got = json.loads(line[0][len("RESULT:"):])
    assert got["pdf://1"] == ("submitted pdf paragraph with plenty of "
                              "words to verify extraction")
    assert "submitted html paragraph" in got["html://1"]