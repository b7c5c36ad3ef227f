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
                          num_partitions: int | None = None,
                          merge_every: int | None = None,
                          store_positions: bool = False):
    """Returns a foreachBatch(fn) that appends each micro-batch to the index.

    Epoch idempotence (see module docstring): the stream manifest pins each
    epoch's (batch, base_docid, bucket_base) allocation BEFORE ingesting, so
    a replayed epoch redoes the identical overwrite instead of appending a
    duplicate. Committed epochs are skipped.

    ``merge_every=k`` runs ``merge_appends`` (tiered minor compaction)
    after every k-th committed epoch, bounding the L0 batch count a
    long-running stream accumulates. Safe here because the stream IS the
    single writer, and a crash mid-merge only delays the merge (the epoch
    itself is already committed; a skipped boundary is retried at the
    next one).
    """
    from visigoth_spark import storage as vstore

    manifest = os.path.join(out_dir, "_manifests", "stream_epochs.json")

    def _load() -> dict:
        store = vstore.get_store(out_dir)
        if store.exists(manifest):
            return store.read_json(manifest)
        return {}

    def _save(state: dict) -> None:
        store = vstore.get_store(out_dir)
        store.makedirs(os.path.join(out_dir, "_manifests"))
        store.write_json_atomic(manifest, state, indent=None)

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        state = _load()
        rec = state.get(str(epoch_id))
        if rec is not None and rec.get("state") == "committed":
            return  # replayed epoch, already fully ingested
        if rec is None:
            # pin this epoch's allocation durably before any ingest work
            from visigoth_spark.build import _batch_manifests, load_stats

            if vstore.get_store(out_dir).exists(
                    os.path.join(out_dir, "stats.json")):
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

            if batch_df.isEmpty():
                # an empty FIRST epoch (e.g. a trigger firing before any
                # source files exist) must not reach build_index, which
                # raises on an empty corpus and would kill the stream.
                # Commit the epoch as a no-op; the next epoch still finds
                # no stats.json and takes the fresh-build path itself.
                rec["state"] = "committed"
                rec["n_docs"] = 0
                state[str(epoch_id)] = rec
                _save(state)
                return
            m = build_index(batch_df.sparkSession, batch_df, out_dir,
                            analyzer=analyzer,
                            num_partitions=num_partitions,
                            store_positions=store_positions)
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
        if merge_every and not rec.get("fresh"):
            # count only committed epochs that actually APPENDED docs: the
            # fresh-build epoch and empty no-op epochs (n_docs is the
            # post-epoch total, so an empty append has n_docs ==
            # base_docid) must not drift the 'every k-th append' boundary
            appended = sum(
                1 for r in state.values()
                if r.get("state") == "committed" and not r.get("fresh")
                and r.get("n_docs", 0) > r.get("base_docid", 0)
            )
            if appended and appended % merge_every == 0:
                from visigoth_spark.build import merge_appends

                merge_appends(batch_df.sparkSession, out_dir,
                              num_partitions=num_partitions)

    return fn


SESSION_OUT_SCHEMA = ("user_id long, session_idx long, n_events long, "
                      "session_start string, session_end string")
SESSION_STATE_SCHEMA = "last_us long, start_us long, n_ev long, idx long"


def _session_fn(gap_us: int):
    """applyInPandasWithState kernel: per-user gap sessionization with the
    open session carried in GroupState across micro-batches. Emits (update
    mode) every session touched this batch — closed sessions final, the
    still-open session at its current value (a later batch re-emits it).
    Vectorized: numpy break-detection + reduceat per segment."""

    def fn(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_us, start_us, n_ev, idx = state.get
        else:
            last_us, start_us, n_ev, idx = None, None, 0, 0
        pdfs = [p for p in pdf_iter if len(p)]
        if not pdfs:
            yield pd.DataFrame(
                columns=["user_id", "session_idx", "n_events",
                         "session_start", "session_end"]
            )
            return
        ev = pd.concat(pdfs).sort_values("ts")
        us = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap_ns_prev = (np.inf if last_us is None else us[0] - last_us)
        breaks = np.empty(len(us), dtype=bool)
        breaks[0] = gap_ns_prev > gap_us
        if len(us) > 1:
            breaks[1:] = np.diff(us) > gap_us
        seg = np.cumsum(breaks)  # 0 = continuation of the open session
        starts_pos = np.flatnonzero(breaks)
        sessions = []  # (idx, n, start_us, end_us)
        if not breaks[0]:
            # first segment extends the open session
            cont_len = int(starts_pos[0]) if len(starts_pos) else len(us)
            n_ev += cont_len
            last_us = int(us[cont_len - 1])
            sessions.append((idx, n_ev, start_us, last_us))
        for si, sp in enumerate(starts_pos):
            ep = (starts_pos[si + 1] if si + 1 < len(starts_pos)
                  else len(us))
            idx += 1
            start_us = int(us[sp])
            n_ev = int(ep - sp)
            last_us = int(us[ep - 1])
            sessions.append((idx, n_ev, start_us, last_us))
        state.update((int(last_us), int(start_us), int(n_ev), int(idx)))

        def fmt(u):
            return (pd.Timestamp(u, unit="us")
                    .strftime("%Y-%m-%d %H:%M:%S"))

        yield pd.DataFrame(
            {
                "user_id": np.full(len(sessions), user_id, dtype=np.int64),
                "session_idx": np.array([s[0] for s in sessions],
                                        dtype=np.int64),
                "n_events": np.array([s[1] for s in sessions],
                                     dtype=np.int64),
                "session_start": [fmt(s[2]) for s in sessions],
                "session_end": [fmt(s[3]) for s in sessions],
            }
        )

    return fn


def sessionize_stream(events_stream, gap_minutes: int = 30):
    """Stateful streaming sessionization (the brief's custom stateful
    operator shape): ``applyInPandasWithState`` keyed by user, update
    output mode — semantics identical to the batch ``pipeline.sessionize``
    for in-order (per-batch time-split) arrival; pinned stream ≡ batch in
    tests/test_streaming_events.py including sessions that SPAN
    micro-batches (merged through GroupState)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60 * 1_000_000),
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


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
    merge_every: int | None = None,
    store_positions: bool = False,
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
                                            num_partitions,
                                            merge_every=merge_every,
                                            store_positions=store_positions))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
