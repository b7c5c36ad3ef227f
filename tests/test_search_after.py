"""Cursor pagination (search_after): ``after=(score, docid)`` from the
previous page's last row; kernels mask (score < s*) OR (score == s* AND
docid > d*) BEFORE k-capping, so deep pages never re-materialize earlier
ones. Exact on batch/compacted indexes (docid order == url order); the
appended-index tie caveat is the same one the k-boundary docs carry."""

from __future__ import annotations

import pytest

from visigoth_spark.analysis import AnalyzerConfig
from visigoth_spark.query import SearchIndex

AN = AnalyzerConfig(stopwords=frozenset(), stem=False)

# enough matching docs for several pages, with deliberate score ties
DOCS = [(f"u{i:02d}",
         ("alpha beta " * ((i % 3) + 1) + "filler" + str(i)).strip())
        for i in range(24)]


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    from visigoth_spark.build import build_index

    out = str(tmp_path_factory.mktemp("pageidx") / "idx")
    build_index(spark, spark.createDataFrame(
        DOCS, "url string, text string"), out, analyzer=AN,
        num_partitions=2, store_positions=True)
    return SearchIndex(spark, out, analyzer=AN)


def _rows(res):
    return [(r["url"], r["docid"], r["score"], r["hits"])
            for r in res.collect()]


def _paged(idx, query, engine, page, total, **kw):
    out, after = [], None
    while len(out) < total:
        rows = _rows(idx.search(query, engine=engine, k=page, after=after,
                                **kw))
        if not rows:
            break
        out.extend(rows)
        after = (rows[-1][2], rows[-1][1])  # (score, docid)
    return out


@pytest.mark.parametrize("engine", ["bm25", "bm25_or", "hits", "phrase"])
def test_paging_reconstructs_full_ordering(pidx, engine):
    full = _rows(pidx.search("alpha beta", engine=engine, k=24))
    for page in (3, 5, 7):
        paged = _paged(pidx, "alpha beta", engine, page, len(full))
        assert paged == full, (engine, page)


@pytest.mark.parametrize("route", ["driver", "spark"])
def test_paging_routes_identical(pidx, route):
    full = _rows(pidx.search("alpha beta", engine="bm25", k=24,
                             route=route))
    p1 = _rows(pidx.search("alpha beta", engine="bm25", k=6, route=route))
    p2 = _rows(pidx.search("alpha beta", engine="bm25", k=6, route=route,
                           after=(p1[-1][2], p1[-1][1])))
    assert p1 + p2 == full[:12]


def test_paging_linear_by_docid(pidx):
    full = _rows(pidx.search("alpha beta", engine="linear", k=24))
    p1 = _rows(pidx.search("alpha beta", engine="linear", k=10))
    p2 = _rows(pidx.search("alpha beta", engine="linear", k=10,
                           after=(0.0, p1[-1][1])))
    assert p1 + p2 == full[:20]


def test_paging_no_dup_no_gap_with_ties(pidx):
    # hits metric is integer -> massive tie classes across pages
    full = _rows(pidx.search("alpha beta", engine="hits", k=24))
    paged = _paged(pidx, "alpha beta", "hits", 4, 24)
    assert paged == full
    assert len({u for u, *_ in paged}) == len(paged)  # no dups


def test_paging_composes_with_exclude(pidx):
    full = _rows(pidx.search("alpha beta", engine="bm25", k=24,
                             exclude="filler3"))
    paged = []
    after = None
    while True:
        rows = _rows(pidx.search("alpha beta", engine="bm25", k=5,
                                 after=after, exclude="filler3"))
        if not rows:
            break
        paged.extend(rows)
        after = (rows[-1][2], rows[-1][1])
    assert paged == full


def test_paging_past_the_end_is_empty(pidx):
    full = _rows(pidx.search("alpha beta", engine="bm25", k=24))
    last = full[-1]
    assert _rows(pidx.search("alpha beta", engine="bm25", k=5,
                             after=(last[2], last[1]))) == []


def test_after_validation(pidx):
    with pytest.raises(ValueError, match="after"):
        pidx.search("alpha", k=None, after=(1.0, 0))
    with pytest.raises(ValueError, match="after"):
        pidx.search("alpha", engine="noop_all", after=(1.0, 0))


# ---- per-term boosts ---------------------------------------------------------


def test_boost_identity_when_one(pidx):
    a = _rows(pidx.search("alpha beta", engine="bm25", k=10))
    b = _rows(pidx.search("alpha^1 beta", engine="bm25", k=10))
    assert a == b


def test_boost_scales_term_contribution(pidx):
    import math

    base = {r[1]: r[2] for r in _rows(
        pidx.search("alpha", engine="bm25", k=24))}
    boosted = {r[1]: r[2] for r in _rows(
        pidx.search("alpha^2.5", engine="bm25", k=24))}
    for d, s in base.items():
        assert math.isclose(boosted[d], 2.5 * s, rel_tol=1e-12)


def test_boost_changes_or_ranking(pidx):
    # filler5 appears only in u05; massively boosting it must rank u05 first
    rows = _rows(pidx.search("alpha filler5^100", engine="bm25_or", k=3))
    assert rows[0][0] == "u05"
    rows0 = _rows(pidx.search("alpha filler5", engine="bm25_or", k=3))
    assert rows != rows0


def test_boost_wand_equals_exhaustive(pidx):
    a = _rows(pidx.search("alpha^3 beta", engine="bm25", k=10))
    b = _rows(pidx.search("alpha^3 beta", engine="bm25_exhaustive", k=10,
                          route="spark"))
    assert a == b


def test_boost_in_search_many(pidx):
    rows = pidx.search_many(["alpha^2.5"], engine="bm25", k=5).collect()
    single = _rows(pidx.search("alpha^2.5", engine="bm25", k=5))
    assert [(r["url"], r["docid"], r["score"], r["hits"])
            for r in rows] == single


def test_boost_without_caret_untouched(pidx):
    # '^' inside no piece: the plain analyze path serves the query
    a = _rows(pidx.search("alpha beta", engine="bm25", k=5))
    assert len(a) == 5


def test_explain_boosted_query_matches_search(pidx):
    ex = pidx.explain_query("alpha^2 beta", engine="bm25")
    assert ex["terms"] == ["alpha", "beta"]  # no stray numeric '2' term
    assert ex["early_exit_empty"] is False


def test_catalog_multi_target_pagination_refused(spark, tmp_path):
    from visigoth_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "pcat"), analyzer=AN)
    df = spark.createDataFrame(DOCS[:6], "url string, text string")
    cat.ingest("a", df)
    cat.ingest("b", df)
    cat.alias("both", "a")
    cat.alias("both", "b")
    with pytest.raises(ValueError, match="per-index"):
        cat.search("both", "alpha", k=5, after=(1.0, 3))
    # single target stays fine
    assert cat.search("a", "alpha", k=5, after=(1e9, -1)).collect()
