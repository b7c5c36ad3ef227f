"""Property-based tests (SURVEY §5.5): random corpora / posting lists.

All pure-python (oracle engine + kernel functions driven directly with
synthetic segment frames) — no SparkSession, so hypothesis can run hundreds
of examples cheaply."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from visigoth_spark.codec import (
    BM25_B,
    BM25_K1,
    encode_groups,
    encode_segment,
)
from visigoth_spark.query import _wand_kernel_body
from visigoth_spark.reference_engine import OracleIndex

WORDS = ["uno", "dos", "tres", "cuatro", "cinco", "seis", "gato", "perro"]

corpus_st = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=1, max_size=25,
)
query_st = st.lists(st.sampled_from(WORDS), min_size=1, max_size=4)


def _index(docs: list[list[str]]) -> OracleIndex:
    idx = OracleIndex()
    for i, toks in enumerate(docs):
        # feed pre-chosen tokens as a doc; analyzer keeps these words intact
        # modulo stemming, which is applied uniformly to docs AND queries
        idx.put(f"doc-{i:04d}", " ".join(toks))
    return idx


@settings(max_examples=150, deadline=None)
@given(corpus_st, query_st)
def test_hits_and_linear_agree_on_random_corpora(docs, query):
    """LinearSearch ≡ HitsSearch doc sets (the reference asserts this
    pairwise, search_hits_search_test.go:227-258)."""
    idx = _index(docs)
    q = " ".join(query)
    hits_docs = {u for u, _ in idx.hits_search(q)}
    linear_docs = {u for u, _ in idx.linear_search(q)}
    # hits threshold counts duplicate query tokens; linear intersects the
    # distinct token lists — doc sets agree (duplicates re-count per doc)
    assert hits_docs == linear_docs


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**32), st.integers(1, 6), st.integers(1, 40),
       st.integers(1, 10))
def test_wand_kernel_equals_brute_force(seed, n_terms, n_docs, k):
    """Block-max WAND top-k ≡ exhaustive BM25 top-k on random postings."""
    rng = np.random.RandomState(seed % 2**31)
    terms = [f"t{j}" for j in range(n_terms)]
    doclens = rng.randint(1, 50, size=n_docs).astype(np.int64)
    rows = []
    posting: dict[str, dict[int, int]] = {}
    for t in terms:
        docs = np.flatnonzero(rng.rand(n_docs) < 0.7)
        if len(docs) == 0:
            docs = np.array([rng.randint(0, n_docs)])
        tfs = rng.randint(1, 8, size=len(docs)).astype(np.int64)
        posting[t] = dict(zip(docs.tolist(), tfs.tolist()))
        blob, skips = encode_segment(
            docs.astype(np.int64), tfs, doclens[docs]
        )
        rows.append({"term": t, "min_docid": int(docs[0]),
                     "blob": blob, "skips": skips})
    pdf = pd.DataFrame(rows)
    n_total = n_docs
    avgdl = float(doclens.mean())
    dfs = {t: len(posting[t]) for t in terms}
    idf = {t: math.log((n_total - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
           for t in terms}

    out = _wand_kernel_body(pdf, terms, dfs, idf, avgdl, k)

    # brute force: AND candidates, exact BM25, (score DESC, docid ASC) top-k
    cand = set(posting[terms[0]])
    for t in terms[1:]:
        cand &= set(posting[t])
    exp = []
    for d in sorted(cand):
        s = 0.0
        for t in sorted(terms):
            tf = float(posting[t][d])
            dl = float(doclens[d])
            s += idf[t] * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            )
        exp.append((d, s))
    exp.sort(key=lambda x: (-x[1], x[0]))
    exp = exp[:k]

    got = list(zip(out["docid"].tolist(), out["score"].tolist()))
    got.sort(key=lambda x: (-x[1], x[0]))
    # kernel contract (r4): top-k by (score DESC, docid ASC) PLUS rows
    # tied with the k-th score, bounded to 2k — the url re-tiebreak's
    # over-fetch. The k-prefix must equal the brute-force top-k exactly;
    # every extra row must tie the k-th score (bit-identical).
    assert [d for d, _ in got[:k]] == [d for d, _ in exp]
    for (d1, s1), (d2, s2) in zip(got[:k], exp):
        assert abs(s1 - s2) < 1e-12
    assert len(got) <= 2 * k
    if len(got) > k:
        kth = exp[-1][1]
        for _, s in got[k:]:
            assert s == kth


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**32), st.integers(1, 5), st.integers(1, 40),
       st.integers(1, 10))
def test_or_kernel_equals_brute_force(seed, n_terms, n_docs, k):
    """Disjunctive block-max WAND top-k ≡ exhaustive union BM25 top-k."""
    from visigoth_spark.query import _or_kernel_body

    rng = np.random.RandomState(seed % 2**31)
    terms = [f"t{j}" for j in range(n_terms)]
    doclens = rng.randint(1, 50, size=n_docs).astype(np.int64)
    rows = []
    posting: dict[str, dict[int, int]] = {}
    for t in terms:
        docs = np.flatnonzero(rng.rand(n_docs) < 0.4)
        if len(docs) == 0:
            docs = np.array([rng.randint(0, n_docs)])
        tfs = rng.randint(1, 8, size=len(docs)).astype(np.int64)
        posting[t] = dict(zip(docs.tolist(), tfs.tolist()))
        blob, skips = encode_segment(docs.astype(np.int64), tfs,
                                     doclens[docs])
        rows.append({"term": t, "min_docid": int(docs[0]),
                     "blob": blob, "skips": skips})
    pdf = pd.DataFrame(rows)
    avgdl = float(doclens.mean())
    dfs = {t: len(posting[t]) for t in terms}
    idf = {t: math.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
           for t in terms}

    out = _or_kernel_body(pdf, terms, idf, avgdl, k)

    cand = sorted(set().union(*[posting[t] for t in terms]))
    exp = []
    for d in cand:
        s = 0.0
        for t in sorted(terms):
            tf = posting[t].get(d)
            if tf is None:
                continue
            dl = float(doclens[d])
            s += idf[t] * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            )
        exp.append((d, s))
    exp.sort(key=lambda x: (-x[1], x[0]))
    exp = exp[:k]

    got = list(zip(out["docid"].tolist(), out["score"].tolist()))
    got.sort(key=lambda x: (-x[1], x[0]))
    # kernel contract (r4): top-k by (score DESC, docid ASC) PLUS rows
    # tied with the k-th score, bounded to 2k — the url re-tiebreak's
    # over-fetch. The k-prefix must equal the brute-force top-k exactly;
    # every extra row must tie the k-th score (bit-identical).
    assert [d for d, _ in got[:k]] == [d for d, _ in exp]
    for (d1, s1), (d2, s2) in zip(got[:k], exp):
        assert abs(s1 - s2) < 1e-12
    assert len(got) <= 2 * k
    if len(got) > k:
        kth = exp[-1][1]
        for _, s in got[k:]:
            assert s == kth


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 2**32), st.integers(1, 30))
def test_encode_groups_byte_identical_to_per_segment(seed, n_groups):
    rng = np.random.RandomState(seed % 2**31)
    parts, starts, pos = [], [], 0
    for _ in range(n_groups):
        L = rng.randint(1, 300)
        d = (np.cumsum(rng.randint(1, 1000, size=L)) +
             rng.randint(0, 2**40)).astype(np.int64)
        t = rng.randint(1, 100, size=L).astype(np.int64)
        dl = rng.randint(1, 10**6, size=L).astype(np.int64)
        parts.append((d, t, dl))
        starts.append(pos)
        pos += L
    docids = np.concatenate([p[0] for p in parts])
    tfs = np.concatenate([p[1] for p in parts])
    dls = np.concatenate([p[2] for p in parts])
    blobs, skips = encode_groups(np.array(starts), docids, tfs, dls)
    for g, (d, t, dl) in enumerate(parts):
        b2, s2 = encode_segment(d, t, dl)
        assert blobs[g] == b2 and skips[g] == s2


class TestAnalyzeFlatHypothesis:
    """Property: the Arrow/RE2 analysis path and the regex-module path are
    token-identical on the shared-semantics alphabet (no context-sensitive
    case-mapping characters — those are pinned separately to the Go simple
    mapping in test_analysis.py::TestCaseMappingParity)."""

    @given(
        st.lists(
            st.text(
                alphabet="abcéñü 日ω.,!?19-_\t\nde la",
                max_size=60,
            ),
            max_size=20,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_flat_equals_python_path(self, texts):
        import numpy as np
        import pandas as pd

        from visigoth_spark.analysis import (
            DEFAULT_ANALYZER,
            _analyze_lists_python,
            analyze_flat,
        )

        s = pd.Series(texts, dtype=object)
        lists = _analyze_lists_python(s, DEFAULT_ANALYZER)
        terms, lens = analyze_flat(s, DEFAULT_ANALYZER)
        assert lens.tolist() == [len(x) for x in lists]
        assert terms.to_pylist() == [t for lst in lists for t in lst]
