from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ["PYTHONPATH"] = (
        repo_root + os.pathsep + os.environ.get("PYTHONPATH", "")
    )
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("visigoth-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.worker.reuse", "true")
        .config("spark.io.compression.codec", "lz4")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def tiny_corpus():
    from visigoth_spark.corpus import generate_corpus

    return generate_corpus(64)


@pytest.fixture(scope="session")
def small_corpus():
    from visigoth_spark.corpus import generate_corpus

    return generate_corpus(1000)


@pytest.fixture(scope="session")
def tiny_corpus_path(tmp_path_factory):
    from visigoth_spark.corpus import write_corpus_parquet

    p = tmp_path_factory.mktemp("corpus") / "tiny.parquet"
    return write_corpus_parquet(str(p), 64)
