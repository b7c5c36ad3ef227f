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

from visigoth_spark.analysis import AnalyzerConfig, analyze_series  # noqa: F401
