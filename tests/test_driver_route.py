"""Cost-based driver-local query routing (query.py::_route_driver):
below the byte threshold the SAME kernels run driver-side on a pyarrow
read of the same pruned files — zero Spark jobs per query. These tests
pin exact result identity (urls, docids, float64 scores, hits) between
route="driver" and route="spark" on every engine and every index layout
(build, appended, merged, compacted), plus the routing decision itself.
"""

from __future__ import annotations

import os

import pytest

from visigoth_spark.build import (
    append_index,
    build_index,
    compact_index,
    merge_appends,
)
from visigoth_spark.corpus import generate_corpus
from visigoth_spark.query import SearchIndex
from visigoth_spark.reference_engine import OracleIndex

N_DOCS = 300

QUERIES = [
    ("programación java", "bm25"),
    ("curso completo programacion", "bm25"),
    ("java", "hits"),
    ("programacion web", "hits"),
    ("python web", "linear"),
    ("programación java", "bm25_or"),
    ("programación java", "bm25_exhaustive"),
    ("huevos", "bm25"),
    ("término inexistente xyzzy", "bm25"),
]


def _rows(df):
    return [(r["url"], r["docid"], r["score"], r["hits"])
            for r in df.collect()]


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """(name, SearchIndex) for every on-disk layout a query can meet."""
    root = tmp_path_factory.mktemp("route")
    pdf = generate_corpus(N_DOCS).sort_values("url").reset_index(drop=True)

    def df(sl):
        return spark.createDataFrame(sl[["url", "text", "lang"]])

    out = {}
    b = str(root / "build")
    build_index(spark, df(pdf), b, num_partitions=4, n_buckets=3)
    out["build"] = b

    a = str(root / "appended")
    build_index(spark, df(pdf.iloc[:200]), a, num_partitions=4, n_buckets=3)
    append_index(spark, df(pdf.iloc[200:]), a, num_partitions=2)
    out["appended"] = a

    m = str(root / "merged")
    build_index(spark, df(pdf.iloc[:150]), m, num_partitions=4, n_buckets=3)
    append_index(spark, df(pdf.iloc[150:220]), m, num_partitions=2)
    append_index(spark, df(pdf.iloc[220:]), m, num_partitions=2)
    merge_appends(spark, m, num_partitions=2)
    out["merged"] = m

    c = str(root / "compacted")
    build_index(spark, df(pdf.iloc[:200]), c, num_partitions=4, n_buckets=3)
    append_index(spark, df(pdf.iloc[200:]), c, num_partitions=2)
    compact_index(spark, c, num_partitions=4)
    out["compacted"] = c
    return out


@pytest.mark.parametrize("layout", ["build", "appended", "merged",
                                    "compacted"])
def test_driver_route_identical_to_spark_route(spark, layouts, layout):
    idx = SearchIndex(spark, layouts[layout])
    for q, engine in QUERIES:
        via_driver = _rows(idx.search(q, engine, 10, route="driver"))
        via_spark = _rows(idx.search(q, engine, 10, route="spark"))
        assert via_driver == via_spark, (layout, q, engine)


def test_driver_route_matches_oracle_scores(spark, layouts):
    idx = SearchIndex(spark, layouts["build"])
    oracle = OracleIndex()
    for r in generate_corpus(N_DOCS).sort_values("url").itertuples():
        oracle.put(r.url, r.text)
    got = [(r["url"], r["score"])
           for r in idx.search("programación java", "bm25", 10,
                               route="driver").collect()]
    exp = oracle.bm25_search("programación java", k=10)
    assert [u for u, _ in got] == [u for u, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert a == pytest.approx(b, abs=1e-12)


class _JobCounter:
    """Count Spark jobs run inside a scoped job group. The default
    statusTracker counters saturate at spark.ui.retainedJobs (1000) in a
    long shared test session, making before/after deltas on the global
    list flaky — a fresh group's count starts at 0 and new jobs are always
    retained (eviction drops the oldest)."""

    def __init__(self, sc, group: str):
        self.sc, self.group = sc, group

    def __enter__(self):
        self.sc.setJobGroup(self.group, "job-count probe")
        return self

    def __exit__(self, *exc):
        self.sc.setLocalProperty("spark.jobGroup.id", None)

    def count(self) -> int:
        ids = self.sc.statusTracker().getJobIdsForGroup(self.group)
        return len(ids or [])


def test_auto_routes_small_queries_driver_side(spark, layouts):
    """Below the threshold, auto serves the query without launching any
    Spark job (group-scoped job counter stays at 0)."""
    idx = SearchIndex(spark, layouts["compacted"])
    with _JobCounter(spark.sparkContext, "vg-route-small") as jc:
        df = idx.search("programación java", "bm25", 10)  # route="auto"
        rows = df.collect()  # createDataFrame(local rows) -> still no job
        assert rows
        assert jc.count() == 0, \
            "auto route below threshold must not run a job"


def test_auto_respects_byte_threshold(spark, layouts):
    """With a 0-byte threshold every query exceeds the estimate and auto
    must take the distributed path (observable: a Spark job runs)."""
    idx = SearchIndex(spark, layouts["build"], driver_local_max_bytes=0)
    with _JobCounter(spark.sparkContext, "vg-route-bytes") as jc:
        rows = idx.search("programación java", "bm25", 10).collect()
        assert rows
        assert jc.count() > 0, \
            "auto route above threshold must go distributed"


def test_search_many_driver_route_identical(spark, layouts):
    idx = SearchIndex(spark, layouts["merged"])
    qs = [q for q, _ in QUERIES[:6]]
    for engine in ("bm25", "hits", "bm25_or"):
        d = [(r["qid"], r["url"], r["docid"], r["score"], r["hits"])
             for r in idx.search_many(qs, engine, 10,
                                      route="driver").collect()]
        s = [(r["qid"], r["url"], r["docid"], r["score"], r["hits"])
             for r in idx.search_many(qs, engine, 10,
                                      route="spark").collect()]
        assert d == s, engine


def test_include_raw_rides_the_driver_route(spark, tmp_path):
    pdf = generate_corpus(80).sort_values("url").reset_index(drop=True)
    out = str(tmp_path / "raw")
    build_index(spark, spark.createDataFrame(pdf[["url", "text", "lang"]]),
                out, num_partitions=2, n_buckets=2, store_raw=True)
    idx = SearchIndex(spark, out)
    by_url = dict(zip(pdf["url"], pdf["text"]))
    rows = idx.search("programación", "bm25", 5, include_raw=True,
                      route="driver").collect()
    assert rows
    for r in rows:
        assert r["raw"] == by_url[r["url"]]


def test_hot_term_cache_warm_results_identical(spark, layouts):
    idx = SearchIndex(spark, layouts["compacted"])
    cold = _rows(idx.search("programación java", "bm25", 10,
                            route="driver"))
    assert idx._term_cache, "driver route must populate the term cache"
    warm = _rows(idx.search("programación java", "bm25", 10,
                            route="driver"))
    assert warm == cold


def test_hot_term_cache_respects_byte_budget(spark, layouts):
    idx = SearchIndex(spark, layouts["compacted"],
                      driver_cache_max_bytes=1)  # nothing fits
    r = _rows(idx.search("programación java", "bm25", 10, route="driver"))
    assert r and not idx._term_cache and idx._term_cache_bytes == 0
    # eviction keeps the accounting consistent under a small budget
    idx2 = SearchIndex(spark, layouts["compacted"],
                       driver_cache_max_bytes=64 << 10)
    for q in ("programación java", "curso completo", "huevos", "python"):
        idx2.search(q, "bm25", 10, route="driver").collect()
        assert idx2._term_cache_bytes <= 64 << 10
    assert idx2._term_cache_bytes == sum(
        sum(a.nbytes for a in v) for v in idx2._term_cache.values()
    )


def test_search_many_mixed_batch_splits_routes(spark, layouts):
    """Per-query routing inside one batch: with a postings bound that
    only some queries fit, the light ones serve from the cache and the
    heavy ones share one distributed job — results identical to the
    all-distributed batch."""
    idx = SearchIndex(spark, layouts["build"],
                      driver_local_max_postings=250)  # splits the batch:
    # 'java' (df 222) fits, 'programación java' (sum ~500) does not
    qs = [q for q, _ in QUERIES[:6]]
    d = [(r["qid"], r["url"], r["docid"], r["score"], r["hits"])
         for r in idx.search_many(qs, "bm25", 10).collect()]
    s = [(r["qid"], r["url"], r["docid"], r["score"], r["hits"])
         for r in idx.search_many(qs, "bm25", 10, route="spark").collect()]
    assert d == s
    assert idx._term_cache, "light queries must have used the cache"
