"""Real `spark-submit --py-files` deployment gate (north-rule mode).

Launches the actual spark-submit binary — NOT the in-process session —
with the package shipped only via --py-files (cwd is a temp dir, so a
module-not-on-PYTHONPATH bug fails loudly), builds an index from a
small synthetic pages corpus, then queries it in both modes and checks
the serve answer equals the spark answer.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit():
    import pyspark
    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else shutil.which("spark-submit")


@pytest.mark.spark
def test_submit_build_and_query(spark, tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit binary")

    pages = str(tmp_path / "pages")
    idx = str(tmp_path / "idx")
    from jivesearch_spark import corpus
    corpus.write_pages(spark, pages, n=400)

    from jivesearch_spark.session import package_zip
    env = {**os.environ, "PYTHONPATH": ""}  # package must come from --py-files
    base = [submit, "--master", "local[2]", "--py-files", package_zip(),
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4"]

    out = subprocess.run(
        base + [os.path.join(REPO, "tools", "submit_build.py"),
                "--pages", pages, "--out", idx,
                "--n-buckets", "8", "--bucket-batch", "8"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-3000:]
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    assert metrics["n_docs"] > 0 and metrics["batches"] >= 1

    out = subprocess.run(
        base + [os.path.join(REPO, "tools", "submit_query.py"),
                "--index", idx, "--query", "bob dylan", "--k", "5"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-3000:]
    spark_hits = json.loads(out.stdout.strip().splitlines()[-1])["hits"]
    assert len(spark_hits) > 0

    # serve mode (plain python, package via PYTHONPATH) must agree
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_query.py"),
         "--index", idx, "--query", "bob dylan", "--k", "5",
         "--mode", "serve"],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": REPO}, timeout=120)
    assert out.returncode == 0, out.stderr[-3000:]
    serve_hits = json.loads(out.stdout.strip().splitlines()[-1])["hits"]
    assert serve_hits == spark_hits


@pytest.mark.spark
def test_submit_fielded_build_and_query(spark, tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit binary")

    pages = str(tmp_path / "pages")
    idx = str(tmp_path / "fidx")
    from jivesearch_spark import corpus
    corpus.write_pages(spark, pages, n=300)

    from jivesearch_spark.session import package_zip
    env = {**os.environ, "PYTHONPATH": ""}
    base = [submit, "--master", "local[2]", "--py-files", package_zip(),
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4"]

    out = subprocess.run(
        base + [os.path.join(REPO, "tools", "submit_build.py"),
                "--pages", pages, "--out", idx, "--fielded",
                "--n-buckets", "4", "--bucket-batch", "4"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    assert metrics["fielded"] and metrics["n_docs"] > 0

    # serving-tier fielded query needs no spark-submit at all
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_query.py"),
         "--index", idx, "--query", "bob dylan",
         "--mode", "serve", "--fielded"],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": REPO}, timeout=300)
    assert out.returncode == 0, out.stderr[-3000:]
    hits = json.loads(out.stdout.strip().splitlines()[-1])["hits"]
    assert hits and isinstance(hits[0][0], str)
