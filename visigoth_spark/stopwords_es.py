"""Spanish stopword list, loaded from the ``stopwords_es.txt`` data file —
the list itself is data copied verbatim (a word list, not code) from the
reference's ``analyze_stopwords_filter.go:6-8`` so stopword removal is
list-identical.

Notes pinned by the reference (tests/test_analysis.py):
- the list contains accented forms (``él``, ``más``, ``qué``) — removal runs
  AFTER lowercasing and BEFORE stemming (``index_memory_index_test.go:11-16``);
- the two-word entry ``"por qué"`` can never match a single token (tokens are
  split on non-alphanumerics) — kept anyway for list identity.

``pkgutil.get_data`` resolves the file both from a filesystem checkout and
from the executor-side package zip shipped by ``ensure_shipped`` /
``spark-submit --py-files``.
"""

from __future__ import annotations

import pkgutil


def _load() -> frozenset[str]:
    data = pkgutil.get_data("visigoth_spark", "stopwords_es.txt")
    assert data is not None, "stopwords_es.txt missing from package"
    return frozenset(
        line
        for line in data.decode("utf-8").splitlines()
        if line and not line.startswith("#")
    )


SPANISH_STOPWORDS = _load()
