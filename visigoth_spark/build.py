"""Batch index build: corpus DataFrame -> on-disk inverted index.

Dataflow (all heavy work in vectorized Arrow kernels; the only wide
exchanges are the url range-shuffle and the (term, bucket) shuffle):

  corpus(url, text)
    -> repartitionByRange(P, url) + sortWithinPartitions(url)   [persist]
    -> pass 0: per-partition row counts -> driver prefix sums   (tiny)
    -> pass 1 (mapInPandas): dense global docid = offset[pid] + local row,
               analyze text, explode -> (term, docid, tf, doclen) pairs
    -> bucket = docid // bucket_width  (docid-range bucketing)
    -> groupBy(term, bucket).applyInPandas(encode)  -> posting segments
    -> write parquet partitioned by bucket, sorted by term
  plus: docmap (docid, url, lang) from pass 1's twin projection, and
  stats.json (N, total_tokens, avgdl) derived from segment metadata.

Scale rationale (100 TB / 10^12 docs):
- **docid assignment** is two cheap passes over the range-shuffled corpus —
  no global window, no driver materialization beyond P counts. Dense ids in
  url order make (score DESC, docid ASC) ≡ (score DESC, url ASC), the
  reference's determinism contract (search_result.go:31-38), and give small
  deltas for varbyte.
- **head-term skew** (north_rule: explicit handling, not AQE-only): the
  shuffle key is (term, bucket), so a head term's postings are split across
  n_buckets reducers and NO task ever holds more than bucket_width postings
  for one term — the per-group memory bound is structural, independent of
  term frequency. Buckets are docid ranges (not hashes) so each segment is a
  sorted docid run and query-time intersection is per-bucket embarrassingly
  parallel with zero cross-bucket coordination.
- **postings never carry text/urls** — only (term, docid, tf, doclen) ints
  cross the term shuffle (SURVEY §1.5).
- **checkpoint/resume**: the corpus is built in ``n_batches`` docid-range
  batches; each batch writes its own parquet subdir + a lineage manifest
  JSON (inputs, counts, bytes, wall time). Resume skips batches whose
  manifest is present and whose output has a _SUCCESS marker. Batches are
  disjoint docid ranges, so per-(term,bucket) segments across batches
  concatenate in sorted order at query time (Lucene-style segments).

Catalog-level semantics (index naming, aliases) live in catalog.py.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from visigoth_spark.analysis import AnalyzerConfig, DEFAULT_ANALYZER, analyze_series
from visigoth_spark.codec import encode_segment

PAIRS_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("docid", LongType()),
        StructField("tf", IntegerType()),
        StructField("doclen", IntegerType()),
    ]
)

DOCMAP_SCHEMA = StructType(
    [
        StructField("docid", LongType()),
        StructField("url", StringType()),
        StructField("doclen", IntegerType()),
    ]
)

SEGMENT_SCHEMA = (
    "term string, bucket int, df_seg int, sum_tf long, "
    "min_docid long, max_docid long, blob binary, skips binary"
)


@dataclass
class BuildMetrics:
    n_docs: int = 0
    n_postings: int = 0
    n_segments: int = 0
    bytes_blob: int = 0
    total_tokens: int = 0
    wall_sec: float = 0.0


def _ranged_corpus(corpus: DataFrame, num_partitions: int) -> DataFrame:
    """Range-partition the corpus by url and sort within partitions — the
    deterministic docid substrate. Only url/text/lang are shuffled; html is
    pruned at the scan (Catalyst column pruning)."""
    cols = [c for c in ("url", "text", "lang") if c in corpus.columns]
    return (
        corpus.select(*cols)
        .repartitionByRange(num_partitions, "url")
        .sortWithinPartitions("url")
    )


def _partition_offsets(ranged: DataFrame) -> dict[int, int]:
    """Pass 0: per-partition counts -> prefix-sum offsets (P rows on driver)."""
    counts = (
        ranged.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    by_pid = {r["_pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(max(by_pid) + 1 if by_pid else 0):
        offsets[pid] = acc
        acc += by_pid.get(pid, 0)
    offsets[-1] = acc  # total doc count
    return offsets


def _pairs_generator(offsets: dict[int, int], analyzer: AnalyzerConfig):
    """mapInPandas fn: assign docids and explode analyzed terms to
    (term, docid, tf, doclen) — tf computed via a vectorized pandas groupby,
    never a per-row Python loop."""

    def gen(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        next_id = offsets.get(pid, 0)
        for pdf in iterator:
            n = len(pdf)
            if n == 0:
                continue
            toks = analyze_series(pdf["text"], analyzer)
            lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
            docids = np.arange(next_id, next_id + n, dtype=np.int64)
            next_id += n
            nz = lens > 0
            if not nz.any():
                continue
            flat_terms = np.concatenate(
                [np.asarray(t, dtype=object) for t, keep in zip(toks, nz) if keep]
            )
            flat_docids = np.repeat(docids[nz], lens[nz])
            flat_doclens = np.repeat(lens[nz], lens[nz])
            g = (
                pd.DataFrame(
                    {
                        "term": flat_terms,
                        "docid": flat_docids,
                        "doclen": flat_doclens.astype(np.int32),
                    }
                )
                .groupby(["term", "docid", "doclen"], sort=False)
                .size()
                .reset_index(name="tf")
            )
            g["tf"] = g["tf"].astype(np.int32)
            yield g[["term", "docid", "tf", "doclen"]]

    return gen


def _docmap_generator(offsets: dict[int, int], analyzer: AnalyzerConfig):
    """mapInPandas fn: (docid, url, doclen). Tokenizes to get the analyzed
    doclen (needed for NoopAll/match-all parity and stats cross-checks) —
    but with stemming disabled: stemming is 1:1 per token, so the count is
    identical and the docmap pass skips the stemmer entirely."""
    import dataclasses

    if analyzer.stem:
        analyzer = dataclasses.replace(analyzer, stem=False)

    def gen(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        next_id = offsets.get(pid, 0)
        for pdf in iterator:
            n = len(pdf)
            if n == 0:
                continue
            toks = analyze_series(pdf["text"], analyzer)
            lens = np.fromiter((len(t) for t in toks), dtype=np.int32, count=n)
            out = pd.DataFrame(
                {
                    "docid": np.arange(next_id, next_id + n, dtype=np.int64),
                    "url": pdf["url"].values,
                    "doclen": lens,
                }
            )
            next_id += n
            yield out

    return gen


def _encode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Encode every complete (term, bucket) group in a sorted batch.
    Input rows are sorted by (term, bucket, docid); group boundaries are
    found vectorized, encode_segment runs once per group (numpy)."""
    terms = pdf["term"].values
    buckets = pdf["bucket"].values
    docids = pdf["docid"].values.astype(np.int64)
    tfs = pdf["tf"].values.astype(np.int64)
    dls = pdf["doclen"].values.astype(np.int64)
    change = np.empty(len(pdf), dtype=bool)
    change[0] = True
    change[1:] = (terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(pdf))
    out: dict[str, list] = {k: [] for k in (
        "term", "bucket", "df_seg", "sum_tf", "min_docid", "max_docid",
        "blob", "skips")}
    for s, e in zip(starts, ends):
        d, t, l = docids[s:e], tfs[s:e], dls[s:e]
        blob, skips = encode_segment(d, t, l)
        out["term"].append(terms[s])
        out["bucket"].append(int(buckets[s]))
        out["df_seg"].append(e - s)
        out["sum_tf"].append(int(t.sum()))
        out["min_docid"].append(int(d[0]))
        out["max_docid"].append(int(d[-1]))
        out["blob"].append(blob)
        out["skips"].append(skips)
    return pd.DataFrame(out)


def _encode_stream(iterator):
    """mapInPandas encode kernel over a partition whose rows are hash-
    partitioned by (term, bucket) and sorted by (term, bucket, docid).
    Arrow batches may split a group, so the trailing (possibly incomplete)
    group of each batch is carried into the next. This replaces a
    groupBy().applyInPandas with the SAME shuffle but none of the per-group
    pandas overhead (measured 100x faster on 110k small groups)."""
    carry: pd.DataFrame | None = None
    for pdf in iterator:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if not len(pdf):
            continue
        last_term = pdf["term"].iloc[-1]
        last_bucket = pdf["bucket"].iloc[-1]
        tail_mask = (
            (pdf["term"].values == last_term)
            & (pdf["bucket"].values == last_bucket)
        )
        not_tail = ~tail_mask[::-1]
        split = len(pdf) - (int(np.argmax(not_tail)) if not_tail.any()
                            else len(pdf))
        carry = pdf.iloc[split:]
        body = pdf.iloc[:split]
        if len(body):
            yield _encode_batch(body)
    if carry is not None and len(carry):
        yield _encode_batch(carry)


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    analyzer: AnalyzerConfig = DEFAULT_ANALYZER,
    num_partitions: int | None = None,
    n_buckets: int | None = None,
    n_batches: int = 1,
    resume: bool = False,
    assume_sorted: bool = False,
    encode_partitions: int | None = None,
    cluster_output: bool = False,
) -> BuildMetrics:
    """Build (or resume) the inverted index at ``out_dir``.

    ``assume_sorted``: the caller guarantees the corpus source is already
    globally sorted by url with partition order == url order (e.g. an
    Iceberg table maintained with a url sort order, or the bench fixture
    parquet). Skips the range shuffle + sampling double-scan entirely —
    docids come from (file-split order, row offset). The resulting index is
    byte-identical to the shuffle path when the guarantee holds."""
    t0 = time.time()
    timing = os.environ.get("VISIGOTH_TIMING") == "1"

    def tick(label: str, since: list[float]) -> None:
        if timing:
            print(f"# build phase {label}: {time.time() - since[0]:.1f}s",
                  flush=True)
        since[0] = time.time()

    tmark = [t0]
    os.makedirs(out_dir, exist_ok=True)
    manifest_dir = os.path.join(out_dir, "_manifests")
    os.makedirs(manifest_dir, exist_ok=True)

    P = num_partitions or spark.sparkContext.defaultParallelism * 2
    saved_mpb = None
    if assume_sorted:
        # split the sorted source into ~P read partitions (row-group
        # granularity); scoped to this build — restored in finally so the
        # session's other reads keep the default split size
        try:
            files = corpus.inputFiles()
            total = sum(
                os.path.getsize(f.replace("file:", "")) for f in files
            )
            saved_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes",
                str(max(1 << 20, total // P)),
            )
        except Exception:
            saved_mpb = None
        cols = [c for c in ("url", "text", "lang") if c in corpus.columns]
        ranged = corpus.select(*cols).persist()
    else:
        ranged = _ranged_corpus(corpus, P).persist()
    try:
        offsets = _partition_offsets(ranged)
        tick("offsets", tmark)
        n_docs = offsets.pop(-1)
        if n_docs == 0:
            raise ValueError("empty corpus")
        P = len(offsets)  # actual partition count (file splits when sorted)
        n_buckets = n_buckets or max(8, P)
        bucket_width = max(1, math.ceil(n_docs / n_buckets))

        # ---- docmap (skipped on resume if already written) -----------------
        docmap_path = os.path.join(out_dir, "docmap")
        docmap_manifest = os.path.join(manifest_dir, "docmap.json")
        if not (resume and _is_complete(docmap_manifest, docmap_path)):
            docmap = ranged.mapInPandas(
                _docmap_generator(offsets, analyzer), DOCMAP_SCHEMA
            )
            docmap.write.mode("overwrite").parquet(docmap_path)
            tick("docmap", tmark)
            _write_manifest(
                docmap_manifest,
                kind="docmap", n_docs=n_docs, partitions=P,
                wall_sec=time.time() - t0,
            )

        # ---- postings, in docid-range batches -------------------------------
        pids = sorted(offsets)
        batch_bounds = [
            pids[round(i * len(pids) / n_batches): round((i + 1) * len(pids) / n_batches)]
            for i in range(n_batches)
        ]
        metrics = BuildMetrics(n_docs=n_docs)
        for bi, batch_pids in enumerate(batch_bounds):
            seg_path = os.path.join(out_dir, "postings", f"batch={bi}")
            man_path = os.path.join(manifest_dir, f"batch_{bi}.json")
            if resume and _is_complete(man_path, seg_path):
                continue
            if not batch_pids:
                _write_manifest(man_path, kind="postings_batch", batch=bi,
                                partitions=[], n_segments=0, wall_sec=0.0)
                continue
            tb = time.time()
            pid_set = set(batch_pids)
            src = ranged.withColumn("_pid", F.spark_partition_id()).filter(
                F.col("_pid").isin(list(pid_set))
            ).drop("_pid")
            pairs = src.mapInPandas(
                _pairs_generator(offsets, analyzer), PAIRS_SCHEMA
            )
            pairs = pairs.withColumn(
                "bucket", (F.col("docid") / F.lit(bucket_width)).cast("int")
            )
            # the (term, bucket) shuffle: hash-repartition + in-partition
            # sort, then one streaming encode pass (see _encode_stream)
            P_enc = encode_partitions or max(
                spark.sparkContext.defaultParallelism * 2, n_buckets
            )
            segments = (
                pairs.repartition(P_enc, "term", "bucket")
                .sortWithinPartitions("term", "bucket", "docid")
                .mapInPandas(_encode_stream, SEGMENT_SCHEMA)
            )
            if cluster_output:
                # optional extra shuffle: one clean term-sorted file per
                # bucket (best read layout; costs one pass over the blobs)
                segments = segments.repartition("bucket").sortWithinPartitions(
                    "term", "min_docid"
                )
            (
                segments.write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(seg_path)
            )
            tick(f"postings batch {bi}", tmark)
            # lineage + metrics from the written segment metadata (exact,
            # no extra corpus pass)
            seg_meta = spark.read.parquet(seg_path).agg(
                F.count("*").alias("n_segments"),
                F.sum("df_seg").alias("n_postings"),
                F.sum("sum_tf").alias("total_tokens"),
                F.sum(F.length("blob")).alias("bytes_blob"),
            ).collect()[0]
            _write_manifest(
                man_path, kind="postings_batch", batch=bi,
                partitions=batch_pids,
                docid_range=[offsets[batch_pids[0]],
                             (offsets[batch_pids[-1] + 1]
                              if batch_pids[-1] + 1 in offsets else n_docs)],
                n_segments=int(seg_meta["n_segments"] or 0),
                n_postings=int(seg_meta["n_postings"] or 0),
                total_tokens=int(seg_meta["total_tokens"] or 0),
                bytes_blob=int(seg_meta["bytes_blob"] or 0),
                wall_sec=time.time() - tb,
            )

        # ---- aggregate stats from manifests (cheap, exact) ------------------
        total_tokens = n_postings = n_segments = bytes_blob = 0
        for bi in range(n_batches):
            with open(os.path.join(manifest_dir, f"batch_{bi}.json")) as f:
                m = json.load(f)
            total_tokens += m.get("total_tokens", 0)
            n_postings += m.get("n_postings", 0)
            n_segments += m.get("n_segments", 0)
            bytes_blob += m.get("bytes_blob", 0)
        metrics.total_tokens = total_tokens
        metrics.n_postings = n_postings
        metrics.n_segments = n_segments
        metrics.bytes_blob = bytes_blob
        metrics.wall_sec = time.time() - t0

        stats = {
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": total_tokens / n_docs,
            "n_postings": n_postings,
            "n_segments": n_segments,
            "bytes_blob": bytes_blob,
            "bucket_width": bucket_width,
            "n_buckets": n_buckets,
            "n_batches": n_batches,
            "bm25": {"k1": 1.2, "b": 0.75},
            "analyzer": {
                "keep_pattern": analyzer.keep_pattern,
                "lowercase": analyzer.lowercase,
                "stem": analyzer.stem,
                "n_stopwords": len(analyzer.stopwords),
            },
            "built_at_sec": time.time(),
            "wall_sec": metrics.wall_sec,
        }
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
        return metrics
    finally:
        if saved_mpb is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", saved_mpb)
        ranged.unpersist()


def _write_manifest(path: str, **kv) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(kv, f, indent=2)
    os.replace(tmp, path)  # atomic: a manifest is either absent or complete


def _is_complete(manifest_path: str, data_path: str) -> bool:
    return (
        os.path.exists(manifest_path)
        and os.path.exists(os.path.join(data_path, "_SUCCESS"))
    )


def load_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f)
