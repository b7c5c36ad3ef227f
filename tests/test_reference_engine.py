"""1:1 ports of the reference's behavioral tests, run against the oracle
(visigoth_spark.reference_engine). Sources cited per test."""

from __future__ import annotations

import math

import pytest

from visigoth_spark.reference_engine import BM25_B, BM25_K1, OracleIndex, _intersect


def make_index(docs: list[tuple[str, str]]) -> OracleIndex:
    idx = OracleIndex()
    for url, content in docs:
        idx.put(url, content)
    return idx


class TestIntersection:
    """≙ search_linear_search_test.go:9-69 (table-driven)."""

    @pytest.mark.parametrize(
        "a,b,expected",
        [
            ([1, 3, 5, 7], [3, 5, 8, 9], [3, 5]),
            ([], [1, 2], []),
            ([1, 2], [], []),
            ([1, 2, 3], [4, 5, 6], []),
            ([1, 2, 3], [1, 2, 3], [1, 2, 3]),
            ([1], [1], [1]),
            ([0, 2, 4, 6, 8], [1, 2, 3, 4, 5], [2, 4]),
        ],
    )
    def test_cases(self, a, b, expected):
        assert _intersect(a, b) == expected


class TestIndexSearch:
    """≙ index_memory_index_test.go."""

    def test_search_one(self):
        # :9-34 — single term finds exactly the java doc
        idx = make_index(
            [
                ("/course/java", "Curso de programación en Java (León)"),
                ("/course/php", "Curso de programación en PHP (León)"),
            ]
        )
        res = idx.hits_search("java")
        assert len(res) == 1
        assert res[0][0] == "/course/java"

    def test_search_two_documents(self):
        # :36-65
        idx = make_index(
            [
                ("/course/java", "Curso de programacion en Java (León)"),
                ("/course/php", "Curso de programacion en PHP (León)"),
            ]
        )
        res = idx.hits_search("programacion")
        urls = {u for u, _ in res}
        assert urls == {"/course/java", "/course/php"}

    def test_search_deterministic(self):
        # :67-110 — 5 repeated searches give identical ordered results
        idx = make_index(
            [
                ("java-course", "programming course java"),
                ("python-course", "programming course python"),
                ("go-course", "programming course golang"),
                ("js-course", "programming course javascript"),
            ]
        )
        runs = [idx.hits_search("programming") for _ in range(5)]
        assert all(r == runs[0] for r in runs)
        assert len(runs[0]) == 4
        assert {u for u, _ in runs[0]} == {
            "java-course", "python-course", "go-course", "js-course"
        }


class TestHitsSearch:
    """≙ search_hits_search_test.go."""

    DOCS = [
        ("doc1", "java programming tutorial"),
        ("doc2", "python programming guide"),
        ("doc3", "java advanced concepts"),
    ]

    def test_and_logic(self):
        # :36-62 — only docs with ALL tokens
        idx = make_index(self.DOCS)
        res = idx.hits_search("java programming")
        assert [u for u, _ in res] == ["doc1"]

    def test_unique_token_hit_counting(self):
        # :64-102 — hits counts matched query-token instances, not tf
        idx = make_index([("d1", "java java java tutorial")])
        res = idx.hits_search("java")
        assert res == [("d1", 1)]

    def test_relevance_sort_and_tiebreak(self):
        # :104-139 — (hits DESC, url ASC)
        idx = make_index(
            [
                ("b", "java programming"),
                ("a", "java programming"),
            ]
        )
        res = idx.hits_search("java programming")
        assert res == [("a", 2), ("b", 2)]

    def test_empty_query(self):
        # :141-147
        idx = make_index(self.DOCS)
        assert idx.hits_search("") == []

    def test_unknown_token(self):
        # :149-155
        idx = make_index(self.DOCS)
        assert idx.hits_search("xyzzynomatch") == []

    def test_partial_match_excluded(self):
        # :157-164 — doc with only some tokens excluded
        idx = make_index(self.DOCS)
        res = idx.hits_search("java tutorial")
        assert [u for u, _ in res] == ["doc1"]

    def test_three_token_threshold(self):
        # :166-189
        idx = make_index(
            [
                ("full", "java programming tutorial"),
                ("partial", "java programming"),
            ]
        )
        res = idx.hits_search("java programming tutorial")
        assert [u for u, _ in res] == ["full"]

    def test_determinism_10x(self):
        # :191-225
        idx = make_index(self.DOCS)
        runs = [idx.hits_search("java") for _ in range(10)]
        assert all(r == runs[0] for r in runs)

    def test_hits_linear_agreement(self):
        # :227-258 — same doc sets
        idx = make_index(self.DOCS)
        for q in ["java", "programming", "java programming", "nothing"]:
            hits_set = {u for u, _ in idx.hits_search(q)}
            lin_set = {u for u, _ in idx.linear_search(q)}
            assert hits_set == lin_set, q

    def test_search_read_only(self):
        # :260-311 — searching adds no phantom docs
        idx = make_index(self.DOCS)
        n = len(idx)
        idx.hits_search("java programming")
        idx.linear_search("java")
        assert len(idx) == n


class TestLinearSearch:
    """≙ search_linear_search_test.go:71-252."""

    def test_and_semantics_and_docid_order(self):
        idx = make_index(
            [
                ("z-doc", "java programming tutorial"),
                ("a-doc", "java programming guide"),
                ("m-doc", "java only here"),
            ]
        )
        res = idx.linear_search("java programming")
        # docID (insertion) order, NOT url order; hits = len(tokens)
        assert res == [("z-doc", 2), ("a-doc", 2)]

    def test_empty_query_returns_nil(self):
        idx = make_index([("d", "java")])
        assert idx.linear_search("") == []

    def test_missing_token_early_exit(self):
        idx = make_index([("d", "java")])
        assert idx.linear_search("java xyzzynomatch") == []


class TestNoops:
    """≙ search_noop_search.go:6-21."""

    def test_noop_zero(self):
        idx = make_index([("d", "java")])
        assert idx.noop_zero("java") == []

    def test_noop_all(self):
        idx = make_index([("b", "java"), ("a", "php")])
        assert idx.noop_all("anything") == [("b", 0), ("a", 0)]


class TestBM25:
    def test_idf_formula(self):
        idx = make_index([("a", "java web"), ("b", "java"), ("c", "web")])
        # N=3, df(jav)=2 -> ln((3-2+0.5)/(2+0.5)+1)
        assert idx.idf("jav") == pytest.approx(math.log((1.5 / 2.5) + 1))

    def test_rarer_term_scores_higher(self):
        idx = make_index(
            [
                ("common1", "java tutorial"),
                ("common2", "java guide"),
                ("rare", "golang manual"),
            ]
        )
        [(u1, s1)] = idx.bm25_search("golang")
        [(u2, s2), *_] = idx.bm25_search("java")
        assert u1 == "rare"
        assert s1 > s2

    def test_and_candidates(self):
        idx = make_index(
            [
                ("both", "java programming"),
                ("javaonly", "java tutorial"),
            ]
        )
        res = idx.bm25_search("java programming")
        assert [u for u, _ in res] == ["both"]

    def test_topk_and_tiebreak(self):
        idx = make_index([(f"d{i:02d}", "java") for i in range(20)])
        res = idx.bm25_search("java", k=5)
        assert len(res) == 5
        # identical docs -> identical scores -> url ASC tiebreak
        assert [u for u, _ in res] == [f"d{i:02d}" for i in range(5)]

    def test_tf_saturation(self):
        idx = make_index(
            [
                ("tf3", "java java java"),
                ("tf1", "java x y"),  # same doclen
            ]
        )
        res = idx.bm25_search("java", k=2)
        assert res[0][0] == "tf3"
        assert res[0][1] > res[1][1]
