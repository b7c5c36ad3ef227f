"""Structured Streaming incremental indexing (SURVEY §7.3's streaming
extension; the reference itself is batch/volatile — its incremental surface
is ``MemoryIndex.Put`` one doc at a time, index_memory_index.go:44-60).

Spark shape: ``readStream`` on the corpus source -> ``writeStream
.foreachBatch(append_index)``. Each micro-batch becomes one new index batch
dir (Lucene-style segment generation): new docids continue after the current
max (insertion order ≙ the reference's append-time id assignment), new
buckets are disjoint from all existing ones, and the query path needs no
changes — it already concatenates a term's segments across batches in docid
order. Exactly-once: foreachBatch epochs are checkpointed by Spark; a
replayed epoch overwrites its own batch dir idempotently (mode=overwrite on
a per-epoch path derived from the stored epoch->batch map in the stream
manifest).

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

    Epoch idempotence: a stream manifest maps epoch_id -> index batch; a
    replayed epoch (failure before the checkpoint committed) re-runs
    append only if its epoch was never recorded.
    """
    manifest = os.path.join(out_dir, "_manifests", "stream_epochs.json")

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        done: dict[str, int] = {}
        if os.path.exists(manifest):
            with open(manifest) as f:
                done = json.load(f)
        if str(epoch_id) in done:
            return  # replayed epoch, already fully ingested
        m = append_index(batch_df.sparkSession, batch_df, out_dir,
                         analyzer=analyzer, num_partitions=num_partitions)
        done[str(epoch_id)] = m.n_docs
        os.makedirs(os.path.dirname(manifest), exist_ok=True)
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump(done, f)
        os.replace(tmp, manifest)

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
