"""Single-process oracle mirroring the reference engine's semantics, extended
with textbook BM25. NOT Spark — this is the rank-identity ground truth every
Spark query result is asserted against (SURVEY.md §5.2).

Semantics transcribed from behavior (not code) of:
- ``index_memory_index.go:44-60``  Put: analyze Statement, dense docID =
  append position, per-token dedup-append (postings are doc-level sets,
  ascending by construction).
- ``search_hits_search.go:43-97``  HitsSearch: for each query token INSTANCE
  (duplicates re-count), +1 per doc in its posting; keep docs with
  hits >= len(tokens); sort (hits DESC, doc.ID ASC)
  (``search_result.go:31-38``).
- ``search_linear_search.go:12-92``  LinearSearch: fold two-pointer
  intersection left-to-right, early-exit on missing token/empty running set;
  results in docID order with hits = len(tokens); empty query -> [].
- ``search_noop_search.go:6-21``  NoopZero -> []; NoopAll -> all docs in
  index order, hits=0.

BM25 extension (the reference has no scoring beyond hit counts; these are the
engine's design targets per BASELINE.json): k1=1.2, b=0.75,
idf = ln((N - df + 0.5)/(df + 0.5) + 1), tf/doclen measured on the analyzed
token list, candidate set = AND over unique analyzed query terms, score
summed over sorted unique terms (fixed float64 summation order), tiebreak
(score DESC, url ASC).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from visigoth_spark.analysis import AnalyzerConfig, DEFAULT_ANALYZER, analyze_text

BM25_K1 = 1.2
BM25_B = 0.75


@dataclass
class OracleIndex:
    name: str = "oracle"
    analyzer: AnalyzerConfig = DEFAULT_ANALYZER
    urls: list[str] = field(default_factory=list)          # docid -> url
    raws: list[str] = field(default_factory=list)          # docid -> stored content
    doclens: list[int] = field(default_factory=list)       # docid -> analyzed token count
    postings: dict[str, list[int]] = field(default_factory=dict)   # term -> sorted docids
    tfs: dict[str, dict[int, int]] = field(default_factory=dict)   # term -> {docid: tf}

    # -- ingest ------------------------------------------------------------
    def put(self, url: str, content: str, statement: str | None = None) -> int:
        """≙ MemoryIndex.Put: returns the assigned dense docid."""
        tokens = analyze_text(statement if statement is not None else content,
                              self.analyzer)
        docid = len(self.urls)
        self.urls.append(url)
        self.raws.append(content)
        self.doclens.append(len(tokens))
        seen: set[str] = set()
        for tok in tokens:
            tf = self.tfs.setdefault(tok, {})
            tf[docid] = tf.get(docid, 0) + 1
            if tok not in seen:
                seen.add(tok)
                self.postings.setdefault(tok, []).append(docid)
        return docid

    # -- read surface (≙ Indexer interface, search_search.go:15-19) --------
    def __len__(self) -> int:
        return len(self.urls)

    def indexed(self, term: str) -> list[int] | None:
        p = self.postings.get(term)
        return list(p) if p is not None else None

    # -- engines ------------------------------------------------------------
    def hits_search(self, query: str) -> list[tuple[str, int]]:
        """Returns [(url, hits)] per the HitsSearch contract."""
        tokens = analyze_text(query, self.analyzer)
        threshold = len(tokens)
        if threshold == 0:
            return []
        hits: dict[int, int] = {}
        for tok in tokens:  # duplicates re-count, matching the reference
            for docid in self.postings.get(tok, ()):  # doc-level set postings
                hits[docid] = hits.get(docid, 0) + 1
        results = [
            (self.urls[d], h) for d, h in hits.items() if h >= threshold
        ]
        results.sort(key=lambda r: (-r[1], r[0]))
        return results

    def linear_search(self, query: str) -> list[tuple[str, int]]:
        """Returns [(url, hits)] in docID order per the LinearSearch contract."""
        tokens = analyze_text(query, self.analyzer)
        if not tokens:
            return []
        docs = self.postings.get(tokens[0])
        if docs is None:
            return []
        docs = list(docs)
        for tok in tokens[1:]:
            nxt = self.postings.get(tok)
            if nxt is None:
                return []
            docs = _intersect(docs, nxt)
            if not docs:
                return []
        return [(self.urls[d], len(tokens)) for d in docs]

    def noop_zero(self, query: str) -> list:
        return []

    def noop_all(self, query: str) -> list[tuple[str, int]]:
        return [(u, 0) for u in self.urls]

    # -- BM25 ----------------------------------------------------------------
    def idf(self, term: str) -> float:
        n = len(self.urls)
        df = len(self.postings.get(term, ()))
        return math.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def avgdl(self) -> float:
        return (sum(self.doclens) / len(self.doclens)) if self.doclens else 0.0

    def bm25_search(self, query: str, k: int = 10) -> list[tuple[str, float]]:
        """Top-k [(url, score)] — AND candidate set over unique analyzed
        terms, fixed summation order (sorted terms), tiebreak
        (score DESC, url ASC)."""
        terms = sorted(set(analyze_text(query, self.analyzer)))
        if not terms:
            return []
        cand: list[int] | None = None
        for t in terms:
            p = self.postings.get(t)
            if not p:
                return []
            cand = list(p) if cand is None else _intersect(cand, p)
            if not cand:
                return []
        avgdl = self.avgdl()
        out: list[tuple[str, float]] = []
        for d in cand:
            dl = self.doclens[d]
            norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            score = 0.0
            for t in terms:  # sorted -> deterministic float64 summation
                tf = self.tfs[t][d]
                score += self.idf(t) * (tf * (BM25_K1 + 1.0)) / (tf + norm)
            out.append((self.urls[d], score))
        out.sort(key=lambda r: (-r[1], r[0]))
        return out[:k]


    def bm25_or_search(self, query: str, k: int = 10
                       ) -> list[tuple[str, float]]:
        """Disjunctive (OR) BM25 top-k — engine extension beyond the
        reference's AND-only retrieval (the candidate set is the UNION of
        the analyzed terms' postings; absent terms contribute 0). Same
        summation order and (score DESC, url ASC) tiebreak as bm25_search."""
        terms = sorted(set(analyze_text(query, self.analyzer)))
        if not terms:
            return []
        cand: set[int] = set()
        for t in terms:
            cand.update(self.postings.get(t, []))
        if not cand:
            return []
        avgdl = self.avgdl()
        out: list[tuple[str, float]] = []
        for d in sorted(cand):
            dl = self.doclens[d]
            norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            score = 0.0
            for t in terms:
                tf = self.tfs.get(t, {}).get(d)
                if tf is not None:
                    score += self.idf(t) * (tf * (BM25_K1 + 1.0)) / (tf + norm)
            out.append((self.urls[d], score))
        out.sort(key=lambda r: (-r[1], r[0]))
        return out[:k]


def _intersect(a: list[int], b: list[int]) -> list[int]:
    """Two-pointer sorted intersection (≙ search_linear_search.go:12-31)."""
    r: list[int] = []
    i = j = 0
    while i < len(a) and j < len(b):
        if a[i] < b[j]:
            i += 1
        elif a[i] > b[j]:
            j += 1
        else:
            r.append(a[i])
            i += 1
            j += 1
    return r
