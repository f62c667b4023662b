"""Deployment-path smoke: package with tools/make_pyfiles_zip.py and
run a real `spark-submit --py-files` job end-to-end (the north-rule
deployment mode). Mirrors the reference's subprocess golden test
strategy (tests/test_assoc_template.py:24-60 runs its CLI via
subprocess.run)."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

_JOB = """
from pyspark.sql import SparkSession
from ocr_intern_spark.operators.extract import extract
from ocr_intern_spark.sources.corpus import corpus_to_spark, stub_ocr_tokens
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
docs = corpus_to_spark(spark, 12, seed=9)
n = extract(docs, stub_ocr_tokens, ocr_partitions=2).count()
print("SUBMIT_OK docs:", n)
"""


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH"
)
def test_pyfiles_zip_spark_submit(tmp_path):
    zip_path = str(tmp_path / "engine.zip")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles_zip.py"),
         zip_path],
        capture_output=True, text=True, check=True, cwd=str(tmp_path),
    )
    assert zip_path in out.stdout

    job = tmp_path / "job.py"
    job.write_text(_JOB)
    run = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, str(job)],
        capture_output=True, text=True, timeout=400, cwd=str(tmp_path),
    )
    assert run.returncode == 0, run.stderr[-2000:]
    assert "SUBMIT_OK docs: 12" in run.stdout
    assert "Failed to compile" not in run.stderr
