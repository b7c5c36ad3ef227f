"""Deterministic synthetic Common-Crawl-style corpus generator (FIXTURES.md).

Shape = BASELINE.json input_hint: (url:string, warc_ts:timestamp, html:binary,
text:string, lang:string). Everything is seeded (seed=42), pure Python/numpy —
no external data. The `text` column is the oracle-extracted text of `html`
(title + "\\n" + paragraphs joined by "\\n"); the engine's vectorized extractor
must reproduce it byte-identically per url.

Scales: tiny=64 docs (unit tests), small=5_000 (rank-identity/resume),
bench=600_000 (two-parallelism scaling runs; bench.py DOCS_PER_SF).
"""

from __future__ import annotations

import html as _html
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from visigoth_spark.stopwords_es import SPANISH_STOPWORDS

SEED = 42

# (a) the reference's own test vocabulary (test files cited in FIXTURES.md §1)
REFERENCE_WORDS = [
    "programación", "programacion", "curso", "completo", "java", "php",
    "python", "golang", "javascript", "desarrollo", "web", "tutorial",
    "principiantes", "León", "huevos", "pulgar", "naranjito", "zampo",
    "casco", "programming", "course",
]
# (c) forms pinning tokenizer semantics (accents, case, digits, punctuation
# survivors, a multi-codepoint token)
EDGE_WORDS = ["León", "92", "años", "über", "Águila", "ñandú", "2024", "web2"]

_SYLLABLES = [
    "ca", "que", "qui", "co", "cu", "ba", "be", "bi", "bo", "bu", "da", "de",
    "di", "do", "du", "fa", "fe", "fi", "fo", "fu", "ga", "ge", "gi", "go",
    "gu", "la", "le", "li", "lo", "lu", "ma", "me", "mi", "mo", "mu", "na",
    "ne", "ni", "no", "nu", "pa", "pe", "pi", "po", "pu", "ra", "re", "ri",
    "ro", "ru", "sa", "se", "si", "so", "su", "ta", "te", "ti", "to", "tu",
    "va", "ve", "vi", "vo", "vu", "za", "ze", "zi", "zo", "zu", "ción",
    "dad", "miento", "ando", "ar", "er", "ir", "oso", "ista", "able",
]

VOCAB_SIZE = 20_000


def build_vocabulary() -> list[str]:
    """20k-word deterministic vocabulary: reference words + stopwords +
    edge forms + generated pseudo-Spanish words."""
    rng = np.random.RandomState(SEED)
    vocab: list[str] = []
    seen: set[str] = set()

    def add(w: str) -> None:
        if w not in seen:
            seen.add(w)
            vocab.append(w)

    for w in REFERENCE_WORDS + EDGE_WORDS:
        add(w)
    for w in sorted(SPANISH_STOPWORDS):
        if " " not in w:
            add(w)
    syl = np.array(_SYLLABLES)
    while len(vocab) < VOCAB_SIZE:
        k = rng.randint(2, 5)
        add("".join(syl[rng.randint(0, len(syl), k)]))
    return vocab[:VOCAB_SIZE]


def _zipf_probs(n: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


_ENTITY_MAP = {
    "á": "&aacute;", "é": "&eacute;", "í": "&iacute;", "ó": "&oacute;",
    "ú": "&uacute;", "ñ": "&ntilde;", "ü": "&uuml;", "Á": "&Aacute;",
    "É": "&Eacute;", "Ó": "&Oacute;",
}


def _entityify(s: str) -> str:
    for ch, ent in _ENTITY_MAP.items():
        s = s.replace(ch, ent)
    return s


def generate_corpus(n_docs: int, seed: int = SEED) -> pd.DataFrame:
    """Deterministic corpus DataFrame with the input_hint schema."""
    rng = np.random.RandomState(seed)
    vocab = np.array(build_vocabulary(), dtype=object)
    probs = _zipf_probs(len(vocab))
    t0 = datetime(2025, 1, 1, tzinfo=timezone.utc)

    # doc lengths: lognormal clipped to [20, 600]
    lens = np.clip(
        np.exp(rng.normal(4.2, 0.7, size=n_docs)).astype(np.int64), 20, 600
    )
    langs = np.where(rng.rand(n_docs) < 0.9, "es", "en")
    entity_mask = rng.rand(n_docs) < 0.05

    urls, tss, htmls, texts = [], [], [], []
    for i in range(n_docs):
        lang = langs[i]
        url = f"https://site{i % 97}.example/{lang}/page-{i:08d}"
        toks = vocab[rng.choice(len(vocab), size=lens[i], p=probs)]
        n_title = max(2, min(8, len(toks) // 10))
        title = " ".join(toks[:n_title])
        body = toks[n_title:]
        half = max(1, len(body) // 2)
        p1 = " ".join(body[:half])
        p2 = " ".join(body[half:])
        text = title + "\n" + p1 + "\n" + p2
        esc = _entityify if entity_mask[i] else (lambda s: _html.escape(s, quote=False))
        html_doc = (
            f"<html><head><title>{esc(title)}</title></head>"
            f"<body><p>{esc(p1)}</p><p>{esc(p2)}</p></body></html>"
        )
        urls.append(url)
        tss.append(t0 + timedelta(seconds=int(i) * 137))
        htmls.append(html_doc.encode("utf-8"))
        texts.append(text)

    return pd.DataFrame(
        {
            "url": pd.Series(urls, dtype="string"),
            "warc_ts": pd.Series(tss),
            "html": pd.Series(htmls, dtype=object),
            "text": pd.Series(texts, dtype="string"),
            "lang": pd.Series(langs, dtype="string"),
        }
    )


# The reference query set (FIXTURES.md §2): pinned reference-test queries
# first, then seeded 1-4-term samples spanning head/torso/tail.
PINNED_QUERIES = [
    "java",
    "programacion",
    "programación java",
    "curso completo programacion",
    "python",
    "",
    "huevos",
    "casco",
    "zampo",
    "xyzzynomatch",          # guaranteed-no-match term
    "el la los de en",       # stopwords only -> empty analyzed query
]


def generate_queries(n_queries: int = 100, seed: int = SEED) -> pd.DataFrame:
    rng = np.random.RandomState(seed + 1)
    vocab = build_vocabulary()
    qs = list(PINNED_QUERIES)
    # head / torso / tail samples by vocabulary rank
    zones = [(0, 50), (50, 2000), (2000, len(vocab))]
    while len(qs) < n_queries:
        n_terms = rng.randint(1, 5)
        terms = []
        for _ in range(n_terms):
            lo, hi = zones[rng.randint(0, 3)]
            terms.append(vocab[rng.randint(lo, hi)])
        qs.append(" ".join(terms))
    ks = [10] * len(qs)
    ks[0], ks[1] = 1, 100  # k=1 and k=100 cases
    return pd.DataFrame({"qid": range(len(qs)), "terms": qs, "k": ks})


def write_corpus_parquet(path: str, n_docs: int, seed: int = SEED) -> str:
    """Write the corpus parquet SORTED BY url (row-group order == url order),
    so builds may use the sorted-source fast path (build_index
    assume_sorted=True: docids from file order, no range shuffle)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = generate_corpus(n_docs, seed).sort_values("url").reset_index(drop=True)
    # small row groups keep the file splittable (parquet splits only at
    # row-group boundaries) — needed for parallel scan of a single file
    row_group_size = max(1024, n_docs // 256)
    table = pa.Table.from_pandas(
        df,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us", tz="UTC")),
                ("html", pa.binary()),
                ("text", pa.string()),
                ("lang", pa.string()),
            ]
        ),
        preserve_index=False,
    )
    pq.write_table(table, path, row_group_size=row_group_size)
    return path
