"""visigoth_spark — a PySpark-native inverted-index + BM25 search engine.

A brand-new batch-scale build of the capabilities of sonirico/visigoth
(reference: /root/reference, a volatile in-memory Go inverted index) as an
idiomatic Spark dataflow engine:

- corpus = DataFrame of Common-Crawl-style web pages
  (url, warc_ts, html, text, lang)
- analysis = vectorized pandas/Arrow UDFs (tokenize -> lower -> stopwords ->
  Snowball-Spanish stem), never per-row Python
- index = postings DataFrame of delta+varbyte-compressed docID blobs with
  skip pointers and block-max metadata, bucketed by docid range so query-time
  intersection is embarrassingly parallel
- query engines = hits (AND + unique-hit count), linear (boolean AND),
  bm25 (top-k, skip-pointer intersection + block-max pruning), noops
- catalog = named indexes + many-to-many aliases (Elasticsearch-style
  hot-swap), mirroring the reference's IndexRepo semantics

Reference parity contracts are documented per-module with file:line cites
into /root/reference.
"""

__version__ = "0.1.0"

import os as _os
import zipfile as _zipfile

_SHIPPED_SESSIONS: set[int] = set()


def ensure_shipped(spark) -> None:
    """Make this package importable on executors (the programmatic twin of
    ``spark-submit --py-files``). Idempotent per session; no-op when the
    package is already importable worker-side via PYTHONPATH (e.g. tests run
    from the repo root). build_index()/SearchIndex() call this so the
    library works when driven from any cwd."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED_SESSIONS:
        return
    pkg_dir = _os.path.dirname(_os.path.abspath(__file__))
    # zip name keyed by CONTENT hash, not version — a stale zip silently
    # ships old code to executors after an edit (bitten once: executors
    # missing a newly added function while the driver had it)
    import hashlib as _hashlib

    h = _hashlib.md5()
    srcs = []
    for root, _, files in _os.walk(pkg_dir):
        for fn in files:
            if fn.endswith((".py", ".txt")):  # .txt: packaged data files
                srcs.append(_os.path.join(root, fn))
    for full in sorted(srcs):
        h.update(full.encode())
        with open(full, "rb") as f:
            h.update(f.read())
    # per-user 0700 cache dir, NOT world-writable /tmp: a predictable path
    # in a shared tmp would let another local user pre-plant a zip that
    # addPyFile then ships to executors (classic /tmp TOCTOU)
    cache_dir = _os.path.join(
        _os.path.expanduser("~"), ".cache", "visigoth_spark"
    )
    _os.makedirs(cache_dir, mode=0o700, exist_ok=True)
    zpath = _os.path.join(
        cache_dir, f"visigoth_spark_pkg_{h.hexdigest()[:12]}.zip"
    )
    if not _os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with _zipfile.ZipFile(tmp, "w") as z:
            for root, _, files in _os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith((".py", ".txt")):
                        full = _os.path.join(root, fn)
                        rel = _os.path.join(
                            "visigoth_spark",
                            _os.path.relpath(full, pkg_dir),
                        )
                        z.write(full, rel)
        _os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    _SHIPPED_SESSIONS.add(key)


from visigoth_spark.analysis import AnalyzerConfig, analyze_series  # noqa: E402,F401
