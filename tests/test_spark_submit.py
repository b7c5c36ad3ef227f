"""North-rule deployment shape: the build/query CLI must run end-to-end via
``spark-submit --py-files <pkg.zip>`` — i.e. with the library shipped as an
artifact, NOT importable from the working directory or PYTHONPATH. This is
the exact cluster invocation documented in cli.py's header; here it runs on
local[2] from a scratch cwd with a scrubbed environment, and the query
output must be rank- and score-identical to the single-process oracle."""

from __future__ import annotations

import json
import os
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                     "spark-submit")
    if os.path.exists(p):
        return p
    return "spark-submit"  # PATH fallback


def _pkg_zip(dest: str) -> str:
    """The --py-files artifact: visigoth_spark/ zipped at top level (the
    same shape `zip -r visigoth_spark.zip visigoth_spark` produces)."""
    zpath = os.path.join(dest, "visigoth_spark.zip")
    pkg = os.path.join(REPO, "visigoth_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg):
            for fn in files:
                if fn.endswith((".py", ".txt")):
                    full = os.path.join(root, fn)
                    z.write(full,
                            os.path.join("visigoth_spark",
                                         os.path.relpath(full, pkg)))
    return zpath


def test_spark_submit_py_files_build_and_query(tmp_path):
    scratch = tmp_path / "cwd"
    scratch.mkdir()
    corpus = str(tmp_path / "corpus.parquet")
    idx = str(tmp_path / "idx")

    # corpus fixture written by the in-process library (url-sorted parquet)
    import sys

    sys.path.insert(0, REPO)
    from visigoth_spark.corpus import generate_corpus, write_corpus_parquet
    from visigoth_spark.reference_engine import OracleIndex

    n_docs = 200
    write_corpus_parquet(corpus, n_docs)
    zpath = _pkg_zip(str(tmp_path))

    # scrubbed env: no PYTHONPATH, cwd far from the repo — the ONLY route
    # for the package to reach the driver and executors is --py-files
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    def submit(*args: str) -> subprocess.CompletedProcess:
        cmd = [
            _spark_submit(), "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath,
            os.path.join(REPO, "visigoth_spark", "cli.py"), *args,
        ]
        return subprocess.run(cmd, cwd=str(scratch), env=env,
                              capture_output=True, text=True, timeout=300)

    r = submit("build", "--corpus", corpus, "--out", idx,
               "--partitions", "3", "--sorted")
    assert r.returncode == 0, r.stderr[-4000:]
    built = json.loads(r.stdout.strip().splitlines()[-1])
    assert built["n_docs"] == n_docs
    assert built["n_postings"] > 0

    query = "programación java"
    r = submit("query", "--index", idx, "--engine", "bm25", "-k", "10",
               query)
    assert r.returncode == 0, r.stderr[-4000:]
    got = [json.loads(line)
           for line in r.stdout.strip().splitlines() if line.startswith("{")]

    oracle = OracleIndex()
    pdf = generate_corpus(n_docs).sort_values("url")
    for row in pdf.itertuples():
        oracle.put(row.url, row.text)
    exp = oracle.bm25_search(query, k=10)
    assert [g["doc"]["id"] for g in got] == [u for u, _ in exp]
    for g, (_, s) in zip(got, exp):
        assert g["score"] == pytest.approx(s, abs=1e-12)
