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


# ---- positions-aware phrase highlighting (round 5) --------------------------

from visigoth_spark.analysis import phrase_highlight_spans  # noqa: E402


def test_phrase_spans_exact_adjacency_windows_only():
    raw = "alpha beta gamma alpha beta alpha"
    spans = phrase_highlight_spans(raw, ["alpha", "beta"], 0, AN)
    # two windows; the trailing lone 'alpha' is NOT highlighted
    assert [(s["window"], s["term"], raw[s["start"]:s["end"]])
            for s in spans] == [
        (0, "alpha", "alpha"), (0, "beta", "beta"),
        (1, "alpha", "alpha"), (1, "beta", "beta"),
    ]


def test_phrase_spans_overlapping_starts_match_phrase_tf():
    raw = "echo echo echo"
    spans = phrase_highlight_spans(raw, ["echo", "echo"], 0, AN)
    # phrase tf = 2 overlapping starts -> 2 windows (kernel semantics)
    assert {s["window"] for s in spans} == {0, 1}
    assert [(s["window"], s["start"]) for s in spans] == [
        (0, 0), (0, 5), (1, 5), (1, 10)]


def test_phrase_spans_slop_marks_chain_not_intervening():
    raw = "alpha filler gamma then alpha nothing"
    spans = phrase_highlight_spans(raw, ["alpha", "gamma"], 1, AN)
    # one window: alpha@0..5, gamma@13..18; 'filler' and the second
    # 'alpha' (no gamma after it) are NOT highlighted
    assert [(s["term"], raw[s["start"]:s["end"]]) for s in spans] == [
        ("alpha", "alpha"), ("gamma", "gamma")]
    # slop=0 rejects the gapped chain entirely
    assert phrase_highlight_spans(raw, ["alpha", "gamma"], 0, AN) == []


def test_phrase_spans_skip_stopwords_like_the_index():
    # 'the' analyzes to nothing -> adjacency holds across it, and the
    # spans still point at the RAW offsets
    raw = "Alpha the Beta"
    spans = phrase_highlight_spans(raw, ["alpha", "beta"], 0, AN)
    assert [(s["term"], raw[s["start"]:s["end"]]) for s in spans] == [
        ("alpha", "Alpha"), ("beta", "Beta")]


def test_search_phrase_highlight_is_windowed(hidx):
    rows = hidx.search("alpha beta", engine="phrase", k=10,
                       include_raw=True, highlight=True).collect()
    u0 = next(r for r in rows if r["url"] == "u0")
    spans = json.loads(u0["matches"])
    # u0 = "alpha beta gamma alpha": ONE window, trailing alpha excluded
    assert [(s["window"], s["term"]) for s in spans] == [
        (0, "alpha"), (0, "beta")]
    for s in spans:
        assert u0["raw"][s["start"]:s["end"]] == s["term"]
    # routes agree
    rows2 = hidx.search("alpha beta", engine="phrase", k=10,
                        include_raw=True, highlight=True,
                        route="spark").collect()
    u0b = next(r for r in rows2 if r["url"] == "u0")
    assert json.loads(u0b["matches"]) == spans


def test_search_phrase_slop_highlight_matched_window(hidx):
    # u0 = "alpha beta gamma alpha": "alpha gamma"~1 chains 0->2; beta
    # and the trailing alpha are not part of the window
    rows = hidx.search("alpha gamma", engine="phrase", k=10, slop=1,
                       include_raw=True, highlight=True).collect()
    u0 = next(r for r in rows if r["url"] == "u0")
    spans = json.loads(u0["matches"])
    assert [(s["term"], u0["raw"][s["start"]:s["end"]]) for s in spans] \
        == [("alpha", "alpha"), ("gamma", "gamma")]
    assert all(s["window"] == 0 for s in spans)
