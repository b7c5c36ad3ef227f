"""Structured Streaming incremental indexing (SURVEY §7.3's streaming
extension; the reference itself is batch/volatile — its incremental surface
is ``MemoryIndex.Put`` one doc at a time, index_memory_index.go:44-60).

Spark shape: ``readStream`` on the corpus source -> ``writeStream
.foreachBatch(append_index)``. Each micro-batch becomes one new index batch
dir (Lucene-style segment generation): new docids continue after the current
max (insertion order ≙ the reference's append-time id assignment), new
buckets are disjoint from all existing ones, and the query path needs no
changes — it already concatenates a term's segments across batches in docid
order.

Exactly-once: BEFORE ingesting an epoch, its (index batch id, base docid,
bucket base) allocation is durably pinned in the stream manifest
(state="allocated"); only after append_index commits is it flipped to
"committed". A crash between those steps makes Spark replay the epoch, which
finds the pinned allocation and re-runs append_index with the SAME batch
path (mode=overwrite), SAME docids and SAME buckets — a byte-level redo of
the identical work, so the replay converges instead of appending a second
copy (append_index's stats are likewise recomputed from manifests, never
incremented). Committed epochs are skipped outright.

At 10^12-doc scale the same shape runs against a Kafka/file source with a
long trigger interval; the per-epoch cost is one fused analyze+encode pass
over the epoch's documents (build.py's zero-shuffle pipeline).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from visigoth_spark.analysis import AnalyzerConfig, DEFAULT_ANALYZER
from visigoth_spark.build import append_index


def foreach_batch_indexer(out_dir: str,
                          analyzer: AnalyzerConfig = DEFAULT_ANALYZER,
                          num_partitions: int | None = None):
    """Returns a foreachBatch(fn) that appends each micro-batch to the index.

    Epoch idempotence (see module docstring): the stream manifest pins each
    epoch's (batch, base_docid, bucket_base) allocation BEFORE ingesting, so
    a replayed epoch redoes the identical overwrite instead of appending a
    duplicate. Committed epochs are skipped.
    """
    manifest = os.path.join(out_dir, "_manifests", "stream_epochs.json")

    def _load() -> dict:
        if os.path.exists(manifest):
            with open(manifest) as f:
                return json.load(f)
        return {}

    def _save(state: dict) -> None:
        os.makedirs(os.path.dirname(manifest), exist_ok=True)
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, manifest)

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        state = _load()
        rec = state.get(str(epoch_id))
        if rec is not None and rec.get("state") == "committed":
            return  # replayed epoch, already fully ingested
        if rec is None:
            # pin this epoch's allocation durably before any ingest work
            from visigoth_spark.build import _batch_manifests, load_stats

            if os.path.exists(os.path.join(out_dir, "stats.json")):
                manifests = _batch_manifests(out_dir)
                stats = load_stats(out_dir)
                rec = {
                    "state": "allocated",
                    "batch": 1 + max(m["batch"] for m in manifests),
                    "base_docid": max(
                        m.get("docid_range", [0, 0])[1] for m in manifests
                    ),
                    "bucket_base": max(
                        stats["n_buckets"],
                        max((max(m.get("buckets", [-1])) + 1
                             for m in manifests), default=0),
                    ),
                }
            else:
                # first epoch: fresh build. Marked so a replay re-runs the
                # BUILD (overwrite, idempotent) even if the crashed attempt
                # already committed stats.json — an unpinned append here
                # would ingest a second copy.
                rec = {"state": "allocated", "fresh": True}
            state[str(epoch_id)] = rec
            _save(state)
        if rec.get("fresh"):
            from visigoth_spark.build import build_index

            m = build_index(batch_df.sparkSession, batch_df, out_dir,
                            analyzer=analyzer,
                            num_partitions=num_partitions)
        else:
            m = append_index(
                batch_df.sparkSession, batch_df, out_dir, analyzer=analyzer,
                num_partitions=num_partitions,
                batch_id=rec.get("batch"), base_docid=rec.get("base_docid"),
                bucket_base=rec.get("bucket_base"),
            )
        rec["state"] = "committed"
        rec["n_docs"] = m.n_docs
        state[str(epoch_id)] = rec
        _save(state)

    return fn


def stream_index(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = ("url string, warc_ts timestamp, html binary, "
                   "text string, lang string"),
    analyzer: AnalyzerConfig = DEFAULT_ANALYZER,
    num_partitions: int | None = None,
    available_now: bool = True,
):
    """Index a growing parquet directory incrementally. With
    ``available_now`` the stream drains everything currently present and
    stops (the batch-catchup mode used in tests); otherwise it keeps running
    on the default trigger."""
    stream = (
        spark.readStream.schema(schema).parquet(source_dir)
    )
    writer = (
        stream.writeStream
        .foreachBatch(foreach_batch_indexer(out_dir, analyzer,
                                            num_partitions))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
