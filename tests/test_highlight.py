"""Result highlighting: char spans over the stored content for every token
whose ANALYZED form matches an effective query term — stems match stems,
stopwords never highlight, expansion engines highlight their expansions.
Driver-side on the hydrated top-k only."""

from __future__ import annotations

import json

import pytest

from visigoth_spark.analysis import (AnalyzerConfig, DEFAULT_ANALYZER,
                                     highlight_spans)
from visigoth_spark.query import SearchIndex

AN = AnalyzerConfig(stopwords=frozenset({"the"}), stem=False)


def test_highlight_spans_offsets_exact():
    spans = highlight_spans("Alpha, the beta; ALPHA beta", {"alpha", "beta"},
                            AN)
    raw = "Alpha, the beta; ALPHA beta"
    assert [(s["term"], raw[s["start"]:s["end"]]) for s in spans] == [
        ("alpha", "Alpha"), ("beta", "beta"), ("alpha", "ALPHA"),
        ("beta", "beta"),
    ]


def test_highlight_stopword_never_matches():
    assert highlight_spans("the the the", {"the"}, AN) == []


def test_highlight_stemming_matches_shared_stem():
    # default analyzer stems Spanish: 'tablas' and 'tabla' share a stem
    cfg = DEFAULT_ANALYZER
    from visigoth_spark.analysis import analyze_text

    stem = analyze_text("tablas", cfg)[0]
    spans = highlight_spans("la tabla y las tablas", {stem}, cfg)
    raw = "la tabla y las tablas"
    assert [raw[s["start"]:s["end"]] for s in spans] == ["tabla", "tablas"]


def test_highlight_empty_inputs():
    assert highlight_spans("", {"x"}, AN) == []
    assert highlight_spans("abc", set(), AN) == []


@pytest.fixture(scope="module")
def hidx(spark, tmp_path_factory):
    from visigoth_spark.build import build_index

    docs = [
        ("u0", "alpha beta gamma alpha"),
        ("u1", "beta gamma"),
        ("u2", "alpha spam beta"),
        ("u3", "prefix prefab gamma"),
    ]
    out = str(tmp_path_factory.mktemp("hidx") / "idx")
    build_index(spark, spark.createDataFrame(
        docs, "url string, text string"), out, analyzer=AN,
        num_partitions=2, store_raw=True, store_positions=True)
    return SearchIndex(spark, out, analyzer=AN)


def test_search_highlight_column(hidx):
    rows = hidx.search("alpha beta", k=10, include_raw=True,
                       highlight=True).collect()
    assert rows
    for r in rows:
        spans = json.loads(r["matches"])
        assert spans, r["url"]
        for s in spans:
            assert r["raw"][s["start"]:s["end"]].lower().startswith(
                s["term"])
    u0 = next(r for r in rows if r["url"] == "u0")
    assert [s["term"] for s in json.loads(u0["matches"])] == [
        "alpha", "beta", "alpha"]


def test_search_highlight_expansion_engine(hidx):
    rows = hidx.search("pre", engine="bm25_prefix", k=10,
                       include_raw=True, highlight=True).collect()
    u3 = next(r for r in rows if r["url"] == "u3")
    assert [s["term"] for s in json.loads(u3["matches"])] == [
        "prefix", "prefab"]


def test_search_highlight_excluded_terms_not_highlighted(hidx):
    rows = hidx.search("alpha beta", k=10, include_raw=True,
                       highlight=True, exclude="spam").collect()
    assert all(r["url"] != "u2" for r in rows)
    for r in rows:
        assert all(s["term"] != "spam"
                   for s in json.loads(r["matches"]))


def test_search_highlight_validation(hidx):
    with pytest.raises(ValueError, match="include_raw"):
        hidx.search("alpha", highlight=True)
    with pytest.raises(ValueError, match="top-k"):
        hidx.search("alpha", k=None, include_raw=True, highlight=True)
    with pytest.raises(ValueError, match="noop"):
        hidx.search("alpha", engine="noop_all", include_raw=True,
                    highlight=True)


def test_search_highlight_empty_result_schema(hidx):
    df = hidx.search("nosuchterm", k=10, include_raw=True, highlight=True)
    assert "matches" in df.columns and df.count() == 0
