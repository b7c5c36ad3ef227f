"""Boolean NOT (``exclude=``): documents containing any excluded term are
dropped BEFORE scoring and k-capping, on every matching engine and both
routes; survivors' scores are untouched."""

from __future__ import annotations

import pytest

from visigoth_spark.analysis import AnalyzerConfig
from visigoth_spark.query import SearchIndex

AN = AnalyzerConfig(stopwords=frozenset(), stem=False)

DOCS = [
    ("u00", "alpha beta gamma"),
    ("u01", "alpha beta"),
    ("u02", "alpha beta spam"),
    ("u03", "beta alpha"),
    ("u04", "alpha gamma spam"),
    ("u05", "alpha beta gamma spam"),
    ("u06", "gamma delta"),
    ("u07", "alpha spam beta"),
]
SPAM = {u for u, t in DOCS if "spam" in t}


@pytest.fixture(scope="module")
def xidx(spark, tmp_path_factory):
    from visigoth_spark.build import build_index

    out = str(tmp_path_factory.mktemp("xidx") / "idx")
    df = spark.createDataFrame(DOCS, "url string, text string")
    build_index(spark, df, out, analyzer=AN, num_partitions=2,
                store_positions=True)
    return SearchIndex(spark, out, analyzer=AN)


def _got(res):
    return [(r["url"], round(r["score"], 9), r["hits"]) for r in res.collect()]


@pytest.mark.parametrize("engine", ["bm25", "bm25_or", "hits", "linear",
                                    "phrase"])
@pytest.mark.parametrize("route", ["driver", "spark"])
def test_exclude_drops_docs_keeps_scores(xidx, engine, route):
    base = _got(xidx.search("alpha beta", engine=engine, k=10, route=route))
    exc = _got(xidx.search("alpha beta", engine=engine, k=10, route=route,
                           exclude="spam"))
    assert {g[0] for g in exc} == {g[0] for g in base} - SPAM
    bmap = {g[0]: g[1:] for g in base}
    for u, s, h in exc:
        assert bmap[u] == (s, h)


def test_exclude_query_term_empties_and(xidx):
    assert _got(xidx.search("alpha beta", engine="bm25", k=10,
                            exclude="alpha")) == []


def test_exclude_absent_term_noop(xidx):
    a = _got(xidx.search("alpha beta", engine="bm25", k=10))
    b = _got(xidx.search("alpha beta", engine="bm25", k=10,
                         exclude="nosuchterm"))
    assert a == b


def test_exclude_unbounded_k_none(xidx):
    got = {g[0] for g in _got(xidx.search(
        "alpha beta", engine="bm25", k=None, exclude="spam"))}
    want = {u for u, t in DOCS
            if "alpha" in t and "beta" in t} - SPAM
    assert got == want


def test_exclude_multi_terms(xidx):
    got = {g[0] for g in _got(xidx.search(
        "alpha", engine="bm25", k=10, exclude="spam gamma"))}
    assert got == {"u01", "u03"}


def test_exclude_affects_which_docs_make_topk(xidx):
    # k=1: the excluded best hit must be REPLACED by the next-best, not
    # just dropped (exclusion happens before the k-cap)
    base = _got(xidx.search("alpha beta", engine="hits", k=1))
    assert len(base) == 1
    exc = _got(xidx.search("alpha beta", engine="hits", k=1,
                           exclude=base[0][0].replace("u0", "") and "spam"))
    assert len(exc) == 1 and exc[0][0] not in SPAM


def test_exclude_rejected_on_noops(xidx):
    with pytest.raises(ValueError, match="noop"):
        xidx.search("alpha", engine="noop_all", exclude="spam")


def test_catalog_and_iter_forward_kwargs(spark, xidx, tmp_path):
    from visigoth_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "kcat"), analyzer=AN)
    cat.ingest("d", spark.createDataFrame(DOCS, "url string, text string"))
    rows = cat.search("d", "alpha beta", k=10, exclude="spam").collect()
    assert rows and not ({r["url"] for r in rows} & SPAM)
    it = list(xidx.search_iter("alpha beta", k=10, exclude="spam"))
    assert it and not ({r["url"] for r in it} & SPAM)
