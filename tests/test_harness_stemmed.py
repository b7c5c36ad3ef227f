"""Pins for the vg_bm25_stemmed harness entry: the transcribed fallback stem
mapping must equal the live stemmer output over the sf0.01 fixture
vocabulary, and the query stems must match the production analyzer."""

from __future__ import annotations

import os

import pytest


@pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.01/documents.parquet"),
    reason="driver testdata not present",
)
def test_fallback_mapping_matches_live():
    from visigoth_spark import harness

    live = harness._stem_mapping()
    # re-derive the literal the same way the fallback embeds it
    fallback = {
        "a": "a", "agg": "agg", "batch": "batch", "big": "big",
        "column": "column", "customer": "custom", "data": "dat",
        "dup": "dup", "fast": "fast", "filter": "filt", "group": "group",
        "hash": "hash", "join": "join", "key": "key", "line": "lin",
        "merge": "merg", "order": "order", "part": "part", "query": "query",
        "row": "row", "scan": "scan", "slow": "slow", "small": "small",
        "sort": "sort", "spark": "spark", "stream": "stream",
        "table": "tabl", "the": "the", "value": "valu", "vector": "vector",
        "window": "window",
    }
    assert live == fallback


def test_query_stems_match_analyzer():
    from visigoth_spark.analysis import AnalyzerConfig, analyze_text
    from visigoth_spark.harness import STEM_QUERY_STEMS

    analyzer = AnalyzerConfig(stopwords=frozenset({"the", "a"}), stem=True)
    assert tuple(sorted(set(analyze_text("tables data", analyzer)))) == (
        STEM_QUERY_STEMS
    )


def test_batched_query_stems_match_analyzer():
    from visigoth_spark.analysis import AnalyzerConfig, analyze_text
    from visigoth_spark.harness import BATCH_QUERIES, BATCH_QUERY_STEMS

    analyzer = AnalyzerConfig(stopwords=frozenset({"the", "a"}), stem=True)
    for q, stems in zip(BATCH_QUERIES, BATCH_QUERY_STEMS):
        assert tuple(sorted(set(analyze_text(q, analyzer)))) == stems


def test_tie_boundary_tokens_are_stem_fixed_points():
    """vg_bm25_tie_boundary's oracle SQL matches raw tokens directly (no
    stem-mapping rows): valid only while the constructed tokens are
    Snowball-es fixed points and survive the analyzer unchanged."""
    from visigoth_spark.analysis import AnalyzerConfig, analyze_text
    from visigoth_spark.stemmer_es import stem_vocab

    assert stem_vocab({"zorp", "blik"}) == {"zorp": "zorp", "blik": "blik"}
    analyzer = AnalyzerConfig(stopwords=frozenset({"the", "a"}), stem=True)
    assert analyze_text("zorp blik", analyzer) == ["zorp", "blik"]
    assert analyze_text("zorp zorp zorp blik", analyzer) == [
        "zorp", "zorp", "zorp", "blik"]


def test_tie_boundary_straddles_k():
    """The constructed corpus must actually put an exact tie across the
    k=4 boundary: 1 winner + 6 identical docs, k selects 3 of 6."""
    from visigoth_spark.harness import _tie_docs

    docs = _tie_docs()
    assert len(docs) == 7
    texts = [t for _, t in docs[1:]]
    assert len(set(texts)) == 1  # identical -> exact score tie
