"""Batch index build: corpus DataFrame -> on-disk inverted index.

Dataflow — ONE fused mapInPandas pass over the corpus, ZERO wide shuffles:

  corpus(url, text)
    -> deterministic partitioning substrate:
         assume_sorted: parquet file splits in url order (no shuffle at all)
         else: repartitionByRange(P, url) + sortWithinPartitions(url) [persist]
    -> pass 0: per-partition row counts -> driver prefix sums  (zero-column
       scan; P rows on the driver)
    -> pass 1 (mapInPandas, fused): per partition —
         dense global docid = offset[pid] + local row,
         vectorized analyze, tf via pandas groupby,
         sort (term, docid), vectorized multi-group varbyte encode
         -> SEGMENT rows (kind='s') for every term in the partition
         -> DOCMAP rows (kind='d') (docid, url, doclen)
       written ONCE, partitioned by (kind, batch).
  stats.json (N, total_tokens, avgdl) derived from segment metadata.

Why no (term, docid) shuffle: docids are assigned CONTIGUOUSLY per corpus
partition, so with bucket := partition id every (term, bucket) posting group
already lives inside exactly one map task. The shuffle the classic build
pays to co-locate a term's postings buys nothing here — per-term posting
lists are split across buckets by docid range (Lucene-style segments), and
query-time intersection is per-bucket embarrassingly parallel with zero
cross-bucket coordination (query.py concatenates a term's segments in
min_docid order).

Scale rationale (100 TB / 10^12 docs):
- **docid assignment** is one cheap zero-column counting pass + driver
  prefix sums — no global window, no driver materialization beyond P counts.
  Dense ids in url order make (score DESC, docid ASC) ≡ (score DESC,
  url ASC), the reference's determinism contract (search_result.go:31-38),
  and give delta=1-heavy varbyte streams.
- **head-term skew** (north_rule: explicit handling, not AQE-only): a head
  term's postings are split across ALL partitions, and no task ever holds
  more postings for one term than its own partition's doc count — the
  per-group memory bound is structural, independent of term frequency. There
  is no shuffle whose reducer could be skewed in the first place.
- **postings never carry text/urls** — analysis, tf-aggregation and encoding
  happen inside the partition that read the text; only compressed segment
  blobs and (docid, url) docmap rows are written out (SURVEY §1.5).
- **checkpoint/resume**: the corpus is built in ``n_batches`` partition-range
  batches; each batch writes its own parquet subdir + a lineage manifest
  JSON (inputs, counts, bytes, wall time). Resume skips batches whose
  manifest is present and whose output has a _SUCCESS marker. Batches are
  disjoint docid ranges, so segments across batches concatenate in sorted
  order at query time.

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

from visigoth_spark.analysis import AnalyzerConfig, DEFAULT_ANALYZER, analyze_flat
from visigoth_spark.codec import encode_groups, encode_positions_groups
from visigoth_spark import storage as vstore

# one fused output schema: segment rows (kind='s') + docmap rows (kind='d').
# Non-applicable columns carry sentinel values (not nulls) to keep the Arrow
# conversion branch-free; readers always filter on kind first.
OUT_SCHEMA = (
    "kind string, bucket int, term string, df_seg int, sum_tf long, "
    "min_docid long, max_docid long, blob binary, skips binary, "
    "docid long, url string, doclen int, raw string, pos_blob binary"
)

_SEG_COLS = ["term", "df_seg", "sum_tf", "min_docid", "max_docid",
             "blob", "skips", "pos_blob"]
_DOC_COLS = ["docid", "url", "doclen", "raw"]


@dataclass
class BuildMetrics:
    n_docs: int = 0
    n_postings: int = 0
    n_segments: int = 0
    bytes_blob: int = 0
    total_tokens: int = 0
    wall_sec: float = 0.0


import contextlib
import socket


@contextlib.contextmanager
def _writer_lock(index_dir: str, op: str):
    """Enforce the single-concurrent-writer contract the maintenance ops
    (append/merge/compact/gc) document: two writers claiming the same batch
    id would corrupt the manifest set. A create-exclusive lock file under
    ``_manifests/`` records (pid, host, op); a second writer fails with a
    clear error instead of corrupting. A lock whose pid is dead ON THIS
    host is a crashed writer's leftover and is broken automatically; a
    live-pid or foreign-host lock raises. Atomic on POSIX/HDFS
    (O_EXCL / create(overwrite=false)); best-effort on S3-like stores —
    pair with an external lease there (storage.py module notes).

    The lock lives at the INDEX ROOT, not under ``_manifests/``: the
    in-place compaction swap renames ``_manifests`` away mid-operation,
    and a lock inside it would vanish during exactly the window it must
    protect (a concurrent writer could acquire a fresh lock and race the
    swap).

    Breaking a stale lock goes through a second exclusive file, the
    BREAK CLAIM (``WRITER_LOCK.break``): removing the dead holder's lock
    directly would race — two contenders that both read the same
    dead-pid holder would both remove-and-recreate, and the second
    remove deletes the first contender's FRESH lock, yielding exactly
    the concurrent writers the lock exists to prevent. Instead a
    contender must (1) win ``create_exclusive`` on the break claim,
    (2) RE-READ the main lock under that claim and re-verify the holder
    is still the dead one it saw — while the claim is held no other
    contender can remove the main lock, so the only way its content
    changes is a release+fresh-acquire, whose new holder is alive and
    aborts the break — and only then (3) remove the main lock, drop the
    claim, and go back to competing in ``create_exclusive`` like
    everyone else (it may lose to a third writer; that is correct). A
    break claim whose own holder is dead (breaker crashed mid-break) is
    itself removed after the same dead-pid check."""
    store = vstore.get_store(index_dir)
    store.makedirs(index_dir)
    lock = vstore.join(index_dir, "WRITER_LOCK")
    claim = lock + ".break"
    me = {"pid": os.getpid(), "host": socket.gethostname(), "op": op}
    payload = json.dumps(me).encode()

    def _holder(path) -> dict:
        try:
            return store.read_json(path)
        except FileNotFoundError:
            raise
        except (OSError, ValueError):
            return {}

    def _dead(holder: dict) -> bool:
        """True only for a provably dead holder pid ON THIS host."""
        if holder.get("host") != me["host"] or not holder.get("pid"):
            return False
        try:
            os.kill(int(holder["pid"]), 0)
        except ProcessLookupError:
            return True  # crashed writer on this host
        except PermissionError:
            pass  # alive, owned by another user
        return False

    for attempt in range(4):
        if store.create_exclusive(lock, payload):
            break
        try:
            holder = _holder(lock)
        except FileNotFoundError:
            # holder released between our failed create and the read —
            # definitionally not a live foreign lock; retry the create
            if attempt < 3:
                continue
            holder = {}
        if _dead(holder) and attempt < 3:
            if store.create_exclusive(claim, payload):
                try:
                    # re-verify under the claim: only remove if the main
                    # lock still names the dead holder we decided on
                    with contextlib.suppress(FileNotFoundError):
                        cur = _holder(lock)
                        if cur.get("pid") == holder.get("pid") and _dead(cur):
                            store.remove(lock)
                finally:
                    with contextlib.suppress(FileNotFoundError):
                        store.remove(claim)
                continue
            # someone else is mid-break: if THE BREAKER crashed, clear
            # its claim and retry; otherwise let it finish and recompete
            try:
                if _dead(_holder(claim)):
                    with contextlib.suppress(FileNotFoundError):
                        store.remove(claim)
            except FileNotFoundError:
                pass
            continue
        raise RuntimeError(
            f"index {index_dir!r} is locked by another writer "
            f"{holder or '<unreadable lock>'} ({lock}); maintenance "
            f"ops are single-writer — wait for it, or remove the lock "
            f"file if the writer is known dead"
        )
    else:
        raise RuntimeError(
            f"could not acquire the writer lock on {index_dir!r} after "
            f"contended retries ({lock})"
        )
    try:
        yield
    finally:
        with contextlib.suppress(FileNotFoundError):
            store.remove(lock)


def _locked(op: str, dir_arg: int):
    """Decorator: run the maintenance op under the index writer lock
    (``dir_arg`` = positional index of the index/out dir argument)."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            out_dir = kwargs.get("out_dir", kwargs.get("index_dir"))
            if out_dir is None:
                out_dir = args[dir_arg]
            with _writer_lock(out_dir, op):
                return fn(*args, **kwargs)
        return wrapper
    return deco


def _covers_key(batches: list[int]) -> str:
    """Digest of a visible-batch set — recorded in the termdict manifest so
    append_index can prove the on-disk termdict covers exactly the batches
    it is about to extend (incremental merge) or already covers the
    post-append set (crash replay), and fall back to a full recompute on
    any mismatch."""
    import hashlib

    return hashlib.md5(json.dumps(sorted(batches)).encode()).hexdigest()


def _input_file_size(f: str, spark) -> int:
    """Size of one DataFrame.inputFiles() entry. Spark reports these as
    URIs — 'file:/x' (single slash) for local files; other schemes go
    through their Hadoop store."""
    if f.startswith("file:"):
        return os.path.getsize("/" + f.split(":/", 1)[1].lstrip("/"))
    if vstore.is_uri(f):
        return vstore.get_store(f, spark).getsize(f)
    return os.path.getsize(f)


def _ranged_corpus(corpus: DataFrame, num_partitions: int,
                   extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Range-partition the corpus by url and sort within partitions — the
    deterministic docid substrate. Only url/text/lang (+ a statement column
    when requested) are shuffled; html is pruned at the scan (Catalyst
    column pruning)."""
    keep = ("url", "text", "lang") + tuple(
        c for c in extra_cols if c not in ("url", "text", "lang")
    )
    cols = [c for c in keep if c in corpus.columns]
    return (
        corpus.select(*cols)
        .repartitionByRange(num_partitions, "url")
        .sortWithinPartitions("url")
    )


def _partition_offsets(src: DataFrame) -> dict[int, int]:
    """Pass 0: per-partition counts -> prefix-sum offsets (P rows on driver).
    Projects zero data columns, so a parquet-backed src is a metadata-speed
    scan."""
    counts = (
        src.select(F.spark_partition_id().alias("_pid"))
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


def _seg_frame(terms: np.ndarray, docids: np.ndarray, tfs: np.ndarray,
               dls: np.ndarray, bucket: int,
               positions: np.ndarray | None = None) -> pd.DataFrame:
    """Encode one partition's accumulated (term, docid, tf, doclen) pairs
    into segment rows. Inputs must be sorted by (term, docid); find group
    boundaries vectorized, run the multi-group varbyte encoder once.
    ``positions``, when given, is the flat per-occurrence position array
    (pairs tiling it in the same (term, docid) order, ascending within a
    pair) — encoded as the parallel ``pos_blob`` stream (codec.py)."""
    change = np.empty(len(terms), dtype=bool)
    change[0] = True
    change[1:] = terms[1:] != terms[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(terms))
    blobs, skips = encode_groups(starts, docids, tfs, dls)
    if positions is not None:
        pos_blobs = encode_positions_groups(starts, tfs, positions)
    else:
        pos_blobs = None
    # per-group sum_tf via segmented reduction (groups tile the array)
    sum_tf = np.add.reduceat(tfs, starts)
    n = len(starts)
    return pd.DataFrame(
        {
            "kind": np.full(n, "s", dtype=object),
            "bucket": np.full(n, bucket, dtype=np.int32),
            "term": terms[starts],
            "df_seg": (ends - starts).astype(np.int32),
            "sum_tf": sum_tf.astype(np.int64),
            "min_docid": docids[starts],
            "max_docid": docids[ends - 1],
            "blob": blobs,
            "skips": skips,
            "docid": np.full(n, -1, dtype=np.int64),
            "url": np.full(n, "", dtype=object),
            "doclen": np.zeros(n, dtype=np.int32),
            "raw": np.full(n, None, dtype=object),
            "pos_blob": (pos_blobs if pos_blobs is not None
                         else np.full(n, None, dtype=object)),
        }
    )


def _doc_frame(docids: np.ndarray, urls: np.ndarray, lens: np.ndarray,
               bucket: int, raws: np.ndarray | None = None) -> pd.DataFrame:
    n = len(docids)
    return pd.DataFrame(
        {
            "kind": np.full(n, "d", dtype=object),
            "bucket": np.full(n, bucket, dtype=np.int32),
            "term": np.full(n, "", dtype=object),
            "df_seg": np.zeros(n, dtype=np.int32),
            "sum_tf": np.zeros(n, dtype=np.int64),
            "min_docid": np.zeros(n, dtype=np.int64),
            "max_docid": np.zeros(n, dtype=np.int64),
            "blob": np.full(n, b"", dtype=object),
            "skips": np.full(n, b"", dtype=object),
            "docid": docids,
            "url": urls,
            "doclen": lens.astype(np.int32),
            "raw": (raws if raws is not None
                    else np.full(n, None, dtype=object)),
            "pos_blob": np.full(n, None, dtype=object),
        }
    )


def _fused_generator(offsets: dict[int, int], analyzer: AnalyzerConfig,
                     flush_docs: int = 500_000, bucket_base: int = 0,
                     index_col: str = "text", raw_col: str | None = None,
                     store_positions: bool = False):
    """mapInPandas fn: the whole per-partition build. Emits docmap rows as
    input batches stream through, accumulates (term, docid, tf, doclen)
    pairs, and encodes all of the partition's segments in one vectorized
    pass at the end (or every ``flush_docs`` docs — a flush splits terms
    into extra docid-disjoint segments, which query-time concatenation
    already handles, so memory stays bounded for huge partitions).

    ``index_col`` is what gets analyzed (the DocRequest *statement*,
    entities_request.go:31-38); ``raw_col``, when set, is the stored
    content hydrated into results as ``Doc.Raw`` (search_result.go:6-9)."""

    def gen(iterator):
        import pyarrow as pa
        import pyarrow.compute as pc
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        bucket = pid + bucket_base
        next_id = offsets.get(pid, 0)
        # acc: per-input-batch (terms, docids, tfs, doclens) group arrays,
        # each already (term-lex, docid)-sorted; a doc lives in exactly one
        # input batch, so groups never span batches
        acc: list[tuple] = []
        acc_docs = 0

        def flush():
            nonlocal acc, acc_docs
            if not acc:
                return None
            if len(acc) == 1:
                t, d, tf, dl, pos = acc[0]
            else:
                t = np.concatenate([a[0] for a in acc])
                d = np.concatenate([a[1] for a in acc])
                tf = np.concatenate([a[2] for a in acc])
                dl = np.concatenate([a[3] for a in acc])
                # cross-batch merge: re-sort the (distinct-pair) groups.
                # NOT np.lexsort((d, t)) on the object-string terms — at
                # web-scale partitions (10^7+ pairs) python-object compares
                # dominate the whole flush; dictionary-encode the terms
                # (one C pass), remap codes to lexicographic ranks, and
                # integer-lexsort instead (same order, measured ~2x on
                # 14M-pair partitions)
                denc = pc.dictionary_encode(pa.array(t, type=pa.string()))
                codes = denc.indices.to_numpy(
                    zero_copy_only=False).astype(np.int64)
                vocab = np.asarray(denc.dictionary.to_pylist(),
                                   dtype=object)
                vorder = np.argsort(vocab, kind="stable")
                rank_of = np.empty(len(vocab), dtype=np.int64)
                rank_of[vorder] = np.arange(len(vocab))
                order = np.lexsort((d, rank_of[codes]))
                if store_positions:
                    # gather each pair's variable-length position run into
                    # the new pair order (runs never merge: a doc lives in
                    # exactly one input batch)
                    pos_cat = np.concatenate([a[4] for a in acc])
                    src_off = np.zeros(len(tf), dtype=np.int64)
                    np.cumsum(tf[:-1], out=src_off[1:])
                    tf_o = tf[order]
                    out_starts = np.zeros(len(tf_o), dtype=np.int64)
                    np.cumsum(tf_o[:-1], out=out_starts[1:])
                    total = int(tf.sum())
                    idx = (np.repeat(src_off[order], tf_o)
                           + np.arange(total)
                           - np.repeat(out_starts, tf_o))
                    pos = pos_cat[idx]
                else:
                    pos = None
                t, d, tf, dl = t[order], d[order], tf[order], dl[order]
            acc = []
            acc_docs = 0
            return _seg_frame(t, d, tf, dl, bucket, positions=pos)

        for pdf in iterator:
            n = len(pdf)
            if n == 0:
                continue
            # flat-Arrow analysis: tokens stay in Arrow (RE2 split, is_in
            # stopwords, vectorized stem take) — no per-token Python objects
            terms_arr, lens = analyze_flat(pdf[index_col], analyzer)
            docids = np.arange(next_id, next_id + n, dtype=np.int64)
            next_id += n
            raws = (pdf[raw_col].to_numpy(dtype=object)
                    if raw_col is not None else None)
            yield _doc_frame(docids, pdf["url"].to_numpy(dtype=object),
                             lens, bucket, raws)
            if len(terms_arr) == 0:
                continue
            # tf per (term, doc) without pandas: dictionary-encode terms
            # (C, one pass), remap codes to lexicographic ranks, pack
            # (rank, local docid) into one int64 key, np.unique with counts
            # -> groups sorted by (term, docid). ~8x the pandas groupby.
            denc = pc.dictionary_encode(terms_arr)
            codes = denc.indices.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            vocab = np.asarray(denc.dictionary.to_pylist(), dtype=object)
            vorder = np.argsort(vocab, kind="stable")
            rank_of = np.empty(len(vocab), dtype=np.int64)
            rank_of[vorder] = np.arange(len(vocab))
            vocab_sorted = vocab[vorder]
            local = np.repeat(docids - docids[0], lens)
            rkey = rank_of[codes] * n + local
            if store_positions:
                # stable sort keeps each pair's occurrences in document
                # order, so the gathered positions stay ascending per pair
                order = np.argsort(rkey, kind="stable")
                rs = rkey[order]
                gb = np.empty(len(rs), dtype=bool)
                gb[0] = True
                gb[1:] = rs[1:] != rs[:-1]
                gstarts = np.flatnonzero(gb)
                uniq = rs[gstarts]
                counts = np.diff(np.append(gstarts, len(rs)))
                doc_starts = np.zeros(n, dtype=np.int64)
                np.cumsum(lens[:-1], out=doc_starts[1:])
                pos_in_doc = (np.arange(len(codes), dtype=np.int64)
                              - np.repeat(doc_starts, lens))
                pos_flat = pos_in_doc[order]
            else:
                uniq, counts = np.unique(rkey, return_counts=True)
                pos_flat = None
            g_local = uniq % n
            acc.append((
                vocab_sorted[uniq // n],
                docids[0] + g_local,
                counts.astype(np.int64),
                lens[g_local],
                pos_flat,
            ))
            acc_docs += n
            if acc_docs >= flush_docs:
                out = flush()
                if out is not None:
                    yield out
        out = flush()
        if out is not None:
            yield out

    return gen


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    analyzer: AnalyzerConfig = DEFAULT_ANALYZER,
    num_partitions: int | None = None,
    n_batches: int = 1,
    resume: bool = False,
    assume_sorted: bool = False,
    flush_docs: int = 500_000,
    n_buckets: int | None = None,  # accepted for API compat; bucket == pid
    store_raw: bool = False,
    statement_col: str | None = None,
    finalize_segments: bool = True,
    store_positions: bool = False,
) -> BuildMetrics:
    """Build (or resume) the inverted index at ``out_dir``.

    ``store_positions``: also store each posting's token positions (in the
    analyzed token sequence) as the parallel ``pos_blob`` varbyte stream —
    required for ``engine="phrase"`` queries. Off by default: positions
    roughly double posting bytes at web scale, and every non-phrase query
    path ignores (and never reads) the column.

    ``finalize_segments`` (default True): after each batch's fused
    zero-shuffle write, rewrite that batch's segment files term-range
    partitioned (the same layout ``compact_index`` produces) and record
    per-file term/docid ranges in ``_manifests/segfiles.json`` /
    ``docfiles.json``. A fresh index is then query-ready with file-level
    pruning from the first search: the planner enumerates ~1 segment file
    per query term instead of scheduling one split per corpus partition
    (the reference analogue is the hash-map probe being O(1) from the
    first Put, index_memory_index.go:24-27). Cost: one extra read+write
    of the COMPRESSED posting blobs per batch (~bytes_blob, a few percent
    of corpus bytes — never the corpus text, never the docmap/raw rows).
    Set False for maximum-throughput ingest where a merge/compact pass
    will establish the serving layout anyway (the append/streaming path's
    tiering model).

    ``store_raw``: store each document's content in the docmap so results
    can hydrate ``Doc.Raw`` (≙ search_result.go:6-9 / the ``"raw"`` field of
    search_result_easyjson.go:127-142). Off by default — at web scale the
    stored-content sidecar doubles the write volume and most serving paths
    hydrate from the source table instead.

    ``statement_col``: the DocRequest content/statement split
    (entities_request.go:31-38): when set, THIS column is analyzed/indexed
    while ``text`` is only stored (implies ``store_raw``) — search matches
    on the statement, results carry the content.

    ``assume_sorted``: the caller guarantees the corpus source is already
    globally sorted by url with partition order == url order (e.g. an
    Iceberg table maintained with a url sort order, or the bench fixture
    parquet). Skips the range shuffle entirely — docids come from
    (file-split order, row offset); parquet file splits of equal size keep
    file order (Spark's split packing sorts by length descending with a
    stable sort), which tests/test_engine_spark.py pins via docmap url
    monotonicity. The resulting index is identical to the shuffle path when
    the guarantee holds."""
    t0 = time.time()
    import visigoth_spark

    visigoth_spark.ensure_shipped(spark)
    if statement_col is not None and statement_col not in corpus.columns:
        raise ValueError(
            f"statement_col {statement_col!r} not in corpus columns "
            f"{corpus.columns}"
        )
    index_col = statement_col or "text"
    raw_col = "text" if (store_raw or statement_col) else None
    timing = os.environ.get("VISIGOTH_TIMING") == "1"

    def tick(label: str, since: list[float]) -> None:
        if timing:
            print(f"# build phase {label}: {time.time() - since[0]:.1f}s",
                  flush=True)
        since[0] = time.time()

    tmark = [t0]
    store = vstore.get_store(out_dir, spark)
    store.makedirs(out_dir)
    manifest_dir = os.path.join(out_dir, "_manifests")
    store.makedirs(manifest_dir)

    P = num_partitions or spark.sparkContext.defaultParallelism * 2
    saved_mpb = None
    persisted = False
    if assume_sorted:
        # split the sorted source into ~P read partitions (row-group
        # granularity); scoped to this build — restored in finally so the
        # session's other reads keep the default split size. No persist:
        # parquet re-reads are deterministic and cheaper than JVM row
        # caching of text columns.
        try:
            files = corpus.inputFiles()
            total = sum(_input_file_size(f, spark) for f in files)
            saved_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes",
                str(max(1 << 20, total // P)),
            )
        except Exception:
            saved_mpb = None
        keep = ("url", "text", "lang") + (
            (statement_col,) if statement_col else ()
        )
        cols = [c for c in dict.fromkeys(keep) if c in corpus.columns]
        src = corpus.select(*cols)
    else:
        # the range shuffle samples boundaries nondeterministically, so the
        # partitioning must be pinned across passes -> persist
        extra = (statement_col,) if statement_col else ()
        src = _ranged_corpus(corpus, P, extra).persist()
        persisted = True
    try:
        offsets = _partition_offsets(src)
        tick("offsets", tmark)
        n_docs = offsets.pop(-1)
        if n_docs == 0:
            raise ValueError("empty corpus")
        P = len(offsets)  # actual partition count (file splits when sorted)

        pids = sorted(offsets)
        batch_bounds = [
            pids[round(i * len(pids) / n_batches):
                 round((i + 1) * len(pids) / n_batches)]
            for i in range(n_batches)
        ]
        metrics = BuildMetrics(n_docs=n_docs)
        data_root = os.path.join(out_dir, "data")
        for bi, batch_pids in enumerate(batch_bounds):
            batch_path = os.path.join(data_root, f"batch={bi}")
            man_path = os.path.join(manifest_dir, f"batch_{bi}.json")
            if resume and _is_complete(man_path, batch_path):
                continue
            if not batch_pids:
                _write_manifest(man_path, kind="batch", batch=bi,
                                partitions=[], n_segments=0, n_docs=0,
                                wall_sec=0.0)
                continue
            tb = time.time()
            part = src
            if len(batch_pids) < P:
                part = src.withColumn(
                    "_pid", F.spark_partition_id()
                ).filter(F.col("_pid").isin(batch_pids)).drop("_pid")
            fused = part.mapInPandas(
                _fused_generator(offsets, analyzer, flush_docs,
                                 index_col=index_col, raw_col=raw_col,
                                 store_positions=store_positions),
                OUT_SCHEMA,
            )
            # small row groups: segment files are term-sorted and docmap
            # files docid-sorted, so 4 MB row groups turn query-term and
            # docid filters into row-group-level scan pruning (the parquet
            # analogue of the term-dictionary seek)
            (
                fused.write.mode("overwrite")
                .option("parquet.block.size", str(4 * 1024 * 1024))
                .partitionBy("kind")
                .parquet(batch_path)
            )
            tick(f"batch {bi}", tmark)
            if finalize_segments:
                # term-range rewrite BEFORE the manifest commit: a crash
                # mid-rewrite leaves the batch manifestless (invisible) and
                # resume redoes it wholesale via mode("overwrite")
                _finalize_batch_segments(
                    spark, store, batch_path,
                    n_files=max(1, min(64, len(batch_pids))))
                tick(f"batch {bi} finalize", tmark)
            # lineage + metrics from the written segment metadata (exact,
            # no extra corpus pass). Read the batch ROOT filtered on kind so
            # a batch with zero posting segments (all docs analyzed to zero
            # tokens) doesn't raise on a missing kind=s partition dir.
            seg_meta = _seg_meta(spark, batch_path)
            _write_manifest(
                man_path, kind="batch", batch=bi,
                partitions=batch_pids,
                docid_range=[offsets[batch_pids[0]],
                             (offsets[batch_pids[-1] + 1]
                              if batch_pids[-1] + 1 in offsets else n_docs)],
                n_docs=(offsets[batch_pids[-1] + 1]
                        if batch_pids[-1] + 1 in offsets else n_docs)
                       - offsets[batch_pids[0]],
                n_segments=int(seg_meta["n_segments"] or 0),
                n_postings=int(seg_meta["n_postings"] or 0),
                total_tokens=int(seg_meta["total_tokens"] or 0),
                bytes_blob=int(seg_meta["bytes_blob"] or 0),
                wall_sec=time.time() - tb,
            )

        # ---- term dictionary: term -> (df, sum_tf) --------------------------
        # one aggregation over segment METADATA columns (no blobs touched);
        # term-sorted with small row groups so the query coordinator resolves
        # df/idf with a driver-side pruned read instead of a Spark job per
        # query (the Lucene term-dictionary-seek analogue).
        td_path = os.path.join(out_dir, "termdict")
        td_manifest = os.path.join(manifest_dir, "termdict.json")
        if not (resume and _is_complete(td_manifest, td_path)):
            seg_all = (
                spark.read.option("basePath", data_root).parquet(data_root)
                .filter(F.col("kind") == "s")
            )
            n_td = max(1, min(32, P // 4))
            (
                seg_all.groupBy("term")
                .agg(F.sum("df_seg").alias("df"),
                     F.sum("sum_tf").alias("sum_tf"))
                .repartitionByRange(n_td, "term")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .option("parquet.block.size", str(1 << 20))
                .parquet(td_path)
            )
            vis_now = [m["batch"] for m in _visible_batches(out_dir)]
            _write_manifest(td_manifest, kind="termdict",
                            covers_md5=_covers_key(vis_now),
                            covers_n=len(vis_now),
                            wall_sec=time.time() - tmark[0])
            tick("termdict", tmark)

        # ---- aggregate stats from manifests (cheap, exact) ------------------
        total_tokens = n_postings = n_segments = bytes_blob = 0
        for bi in range(n_batches):
            m = store.read_json(
                os.path.join(manifest_dir, f"batch_{bi}.json"))
            total_tokens += m.get("total_tokens", 0)
            n_postings += m.get("n_postings", 0)
            n_segments += m.get("n_segments", 0)
            bytes_blob += m.get("bytes_blob", 0)
        metrics.total_tokens = total_tokens
        metrics.n_postings = n_postings
        metrics.n_segments = n_segments
        metrics.bytes_blob = bytes_blob
        metrics.wall_sec = time.time() - t0

        part_sizes = [offsets[p + 1] - offsets[p] for p in pids[:-1]]
        part_sizes.append(n_docs - offsets[pids[-1]])
        stats = {
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": total_tokens / n_docs,
            "n_postings": n_postings,
            "n_segments": n_segments,
            "bytes_blob": bytes_blob,
            # bucket == corpus partition: the structural per-segment bound is
            # the largest partition's doc count
            "bucket_width": max(part_sizes),
            "n_buckets": P,
            "n_batches": n_batches,
            "bm25": {"k1": 1.2, "b": 0.75},
            "store_raw": raw_col is not None,
            "store_positions": store_positions,
            "statement_col": statement_col,
            "analyzer": {
                "keep_pattern": analyzer.keep_pattern,
                "lowercase": analyzer.lowercase,
                "stem": analyzer.stem,
                "n_stopwords": len(analyzer.stopwords),
            },
            "built_at_sec": time.time(),
            "wall_sec": metrics.wall_sec,
        }
        # file-range pruning manifests from the FIRST build (r3 gap: only
        # merge/compact created them, so a fresh never-maintained index
        # scheduled one split per corpus partition per query). With
        # finalize_segments the segment ranges are tight (~1 file per
        # term); without it they are wide-but-honest (docfiles ranges are
        # tight either way — docids are assigned in partition order).
        # append_index EXTENDS these from here on (_extend_file_manifests).
        _write_segfiles_manifest(
            out_dir, manifest_dir,
            [os.path.join(data_root, f"batch={bi}", "kind=s")
             for bi in range(n_batches)])
        _write_docfiles_manifest(
            out_dir, manifest_dir,
            [os.path.join(data_root, f"batch={bi}", "kind=d")
             for bi in range(n_batches)])
        tick("file manifests", tmark)
        store.write_json_atomic(os.path.join(out_dir, "stats.json"), stats)
        return metrics
    finally:
        if saved_mpb is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", saved_mpb)
        if persisted:
            src.unpersist()


_SEG_FILE_SCHEMA = ("bucket int, term string, df_seg int, sum_tf long, "
                    "min_docid long, max_docid long, blob binary, "
                    "skips binary, docid long, url string, doclen int, "
                    "raw string, pos_blob binary")


def _finalize_batch_segments(spark: SparkSession, store, batch_path: str,
                             n_files: int) -> None:
    """Rewrite one batch's ``kind=s`` dir term-range partitioned (disjoint
    per-file term ranges, term-sorted rows, 4 MB row groups) — the layout
    ``compact_index`` produces, established at build time so the segfiles
    manifest prunes to ~1 file per query term from the first search. Only
    the compressed posting blobs move (one read+write of ~bytes_blob);
    the docmap files never do. Content is row-identical — file placement
    is the only thing that changes (the bench's resume digest compares
    sorted rows for exactly this reason). Crash-safe: the caller commits
    the batch manifest only after this returns, so a crash mid-rewrite
    leaves the batch invisible and resume redoes it wholesale."""
    seg_dir = os.path.join(batch_path, "kind=s")
    if not store.isdir(seg_dir):
        return  # batch whose docs all analyzed to zero tokens
    files = [os.path.join(seg_dir, f) for f in store.listdir(seg_dir)
             if f.endswith(".parquet")]
    if not files:
        return
    tmp = os.path.join(batch_path, "_seg_tmp")
    (
        spark.read.schema(_SEG_FILE_SCHEMA).parquet(*files)
        .repartitionByRange(n_files, "term")
        .sortWithinPartitions("term", "bucket", "min_docid")
        .write.mode("overwrite")
        .option("parquet.block.size", str(4 * 1024 * 1024))
        .parquet(tmp)
    )
    store.rmtree(seg_dir)
    store.rename(tmp, seg_dir)


def _seg_meta(spark: SparkSession, batch_path: str):
    """Segment-metadata aggregate for one batch dir. Reads the batch ROOT
    with the hive `kind` partition filter (tolerates an absent kind=s dir —
    a batch whose docs all analyze to zero tokens writes only kind=d)."""
    return (
        spark.read.parquet(batch_path)
        .filter(F.col("kind") == "s")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum("df_seg").alias("n_postings"),
            F.sum("sum_tf").alias("total_tokens"),
            F.sum(F.length("blob")).alias("bytes_blob"),
        )
        .collect()[0]
    )


def _batch_manifests(out_dir: str) -> list[dict]:
    """All committed batch manifests, sorted by batch number. These — not
    stats.json — are the source of truth for docid/bucket allocation:
    stats.json is a derived cache that a crash can leave stale."""
    store = vstore.get_store(out_dir)
    manifest_dir = vstore.join(out_dir, "_manifests")
    out = []
    for f in store.listdir(manifest_dir):
        if f.startswith("batch_") and f.endswith(".json"):
            out.append(store.read_json(vstore.join(manifest_dir, f)))
    return sorted(out, key=lambda m: m["batch"])


def _visible_batches(out_dir: str) -> list[dict]:
    """Committed batch manifests that are CURRENTLY part of the index:
    a merged batch's manifest carries ``replaces=[...]``, which hides the
    batches it subsumed even while their manifests/dirs still exist (the
    window between a merge's manifest commit and its GC). This — one
    atomic manifest write flipping visibility — is what makes
    ``merge_appends`` crash-atomic without a directory swap: readers and
    stats plan from this set, never from a directory listing."""
    ms = _batch_manifests(out_dir)
    replaced: set[int] = set()
    for m in ms:
        replaced.update(m.get("replaces", []))
    # an empty batch (n_docs == 0, e.g. an n_batches slice that got no
    # partitions) commits a manifest but never writes a batch dir — it owns
    # no rows, so readers and stats must not try to plan its (nonexistent)
    # path. Only an explicit 0 excludes; absent n_docs keeps the batch.
    return [m for m in ms
            if m["batch"] not in replaced and m.get("n_docs", 1) != 0]


@_locked("append", dir_arg=2)
def append_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    analyzer: AnalyzerConfig = DEFAULT_ANALYZER,
    num_partitions: int | None = None,
    flush_docs: int = 500_000,
    store_raw: bool = False,
    statement_col: str | None = None,
    batch_id: int | None = None,
    base_docid: int | None = None,
    bucket_base: int | None = None,
    store_positions: bool | None = None,
) -> BuildMetrics:
    """Incrementally ingest ``corpus`` into an EXISTING index (or create it).

    ``store_positions``: only meaningful when this call CREATES the index
    (the streaming first-epoch path) — an existing index's setting is an
    index-level invariant that appends inherit; passing a conflicting
    value raises instead of silently building a mixed index.

    ≙ the reference's incremental ``MemoryIndex.Put``
    (index_memory_index.go:44-60): new documents get docids continuing after
    the current max — insertion order, exactly the reference's append-time id
    assignment. The new docs land in a fresh batch dir with fresh bucket ids
    (disjoint from every existing bucket), so query-time per-bucket kernels
    and cross-batch segment concatenation keep working unchanged.

    Crash-safety / idempotence contract (single concurrent writer):
    - ``batch_id`` / ``base_docid`` / ``bucket_base`` are derived from the
      committed BATCH MANIFESTS, never from stats.json (a crash between the
      batch write and the stats rewrite leaves stats stale; manifests are
      written atomically and are the commit point).
    - The batch parquet is written mode=overwrite to its final path. A crash
      AFTER the parquet write but BEFORE the manifest leaves an orphan dir
      whose batch number and docid range are exactly what the next append
      (or an idempotent replay with pinned ``batch_id``/``base_docid`` —
      see streaming.foreach_batch_indexer) will claim and overwrite — the
      docid-disjoint-segment invariant cannot be violated by a partial
      append. The orphan is INVISIBLE to queries in that window:
      ``SearchIndex`` and the termdict/stats refreshes plan from the
      committed batch manifests (``_visible_batches``), never from a
      directory listing.

    Ordering note: WITHIN each appended batch docids follow url order; ACROSS
    batches they follow ingest order. The reference breaks exact-score ties
    on Document.ID() — the url STRING (search_result.go:31-38 +
    entities_doc.go:12-14) — NOT insertion order, so on an appended index
    the kernels' docid tiebreak can select a different k-set at the score
    boundary than strict url order would. query.py re-tiebreaks the
    hydrated top-k on url (contract holds within the returned set);
    ``compact_index`` restores url-ordered docids and with them the full
    contract. Exact-score ranking is unaffected (BM25 stats are global).
    """
    t0 = time.time()
    import visigoth_spark

    visigoth_spark.ensure_shipped(spark)
    store = vstore.get_store(out_dir, spark)
    if not store.exists(os.path.join(out_dir, "stats.json")):
        return build_index(spark, corpus, out_dir, analyzer=analyzer,
                           num_partitions=num_partitions,
                           flush_docs=flush_docs, store_raw=store_raw,
                           statement_col=statement_col,
                           store_positions=bool(store_positions))
    stats = load_stats(out_dir)
    # positions are an index-level invariant: a mixed index (some batches
    # with pos_blob, some without) would silently break phrase queries on
    # the gap — appends always inherit the base index's setting
    inherited = bool(stats.get("store_positions"))
    if store_positions is not None and bool(store_positions) != inherited:
        raise ValueError(
            f"store_positions={store_positions} conflicts with the "
            f"index's setting ({inherited}); positions are an index-level "
            "invariant — rebuild (or compact into a new index) to change it"
        )
    store_positions = inherited
    manifests = _batch_manifests(out_dir)
    if base_docid is None:
        base_docid = max(
            (m.get("docid_range", [0, 0])[1] for m in manifests),
            default=stats["n_docs"],
        )
    if bucket_base is None:
        bucket_base = max(
            (max(m.get("buckets", [-1])) + 1 for m in manifests),
            default=stats["n_buckets"],
        )
        bucket_base = max(bucket_base, stats["n_buckets"])
    if batch_id is None:
        batch_id = 1 + max(m["batch"] for m in manifests)
    manifest_dir = os.path.join(out_dir, "_manifests")
    if statement_col is None:
        # inherit the index's statement/content split — an append must
        # analyze the same column the original build did
        statement_col = stats.get("statement_col")
    if statement_col is not None and statement_col not in corpus.columns:
        raise ValueError(
            f"statement_col {statement_col!r} not in corpus columns "
            f"{corpus.columns}"
        )
    if (store_raw or statement_col) and not stats.get("store_raw"):
        # retrofitting raw onto an index whose existing documents have no
        # stored content would make include_raw silently return null for
        # every pre-existing doc — refuse; rebuild with store_raw instead
        raise ValueError(
            "cannot enable store_raw on an existing index built without it"
        )
    index_col = statement_col or "text"
    raw_col = "text" if (store_raw or statement_col
                         or stats.get("store_raw")) else None

    P = num_partitions or spark.sparkContext.defaultParallelism * 2
    extra = (statement_col,) if statement_col else ()
    src = _ranged_corpus(corpus, P, extra).persist()
    try:
        offsets = _partition_offsets(src)
        n_new = offsets.pop(-1)
        if n_new == 0:
            return BuildMetrics(n_docs=base_docid)
        offsets = {pid: off + base_docid for pid, off in offsets.items()}
        P = len(offsets)

        batch_path = os.path.join(out_dir, "data", f"batch={batch_id}")
        fused = src.mapInPandas(
            _fused_generator(offsets, analyzer, flush_docs, bucket_base,
                             index_col=index_col, raw_col=raw_col,
                             store_positions=store_positions),
            OUT_SCHEMA,
        )
        (
            fused.write.mode("overwrite")
            .option("parquet.block.size", str(4 * 1024 * 1024))
            .partitionBy("kind")
            .parquet(batch_path)
        )
        seg_meta = _seg_meta(spark, batch_path)
        part_sizes = [offsets[p] for p in sorted(offsets)]
        widths = [b - a for a, b in zip(part_sizes, part_sizes[1:])]
        widths.append(base_docid + n_new - part_sizes[-1])
        # MAINTAIN the file-range pruning manifests (when present) instead
        # of invalidating them: sweep ONLY the new batch's files and extend
        # the entry list, so an appended index keeps file-level pruning
        # live (previously every append disabled it until the next
        # merge/compact — measured ~2x on bm25 p50 at sf0.1). Ordering and
        # crash safety: the extension is written BEFORE the commit point,
        # so the manifest is always a SUPERSET of the visible batches'
        # files — readers filter entries by batch visibility at open
        # (query.py::_filter_entries_visible), which makes an orphan
        # batch's extra entries harmless, while a manifest MISSING a
        # visible batch's files (the dangerous direction) cannot occur.
        # A replayed append rewrites its batch dir with fresh file names,
        # so existing entries under this batch's path are replaced, never
        # duplicated or left dangling.
        _extend_file_manifests(store, out_dir, manifest_dir, batch_id,
                               batch_path)
        # commit point: the manifest makes the batch part of the index
        _write_manifest(
            os.path.join(manifest_dir, f"batch_{batch_id}.json"),
            kind="batch", batch=batch_id, appended=True,
            partitions=sorted(offsets),
            buckets=[bucket_base + i for i in range(P)],
            docid_range=[base_docid, base_docid + n_new],
            n_docs=n_new,
            bucket_width=max(widths),
            n_segments=int(seg_meta["n_segments"] or 0),
            n_postings=int(seg_meta["n_postings"] or 0),
            total_tokens=int(seg_meta["total_tokens"] or 0),
            bytes_blob=int(seg_meta["bytes_blob"] or 0),
            wall_sec=time.time() - t0,
        )

        # refresh the term dictionary (global df/sum_tf changed).
        # INCREMENTAL by default: merge the existing termdict (V terms —
        # bounded by vocabulary) with ONLY the new batch's aggregate,
        # instead of re-aggregating every visible batch's segment metadata
        # (O(total segments) — at 10^12 docs that is billions of metadata
        # rows scanned per small append). The termdict manifest records the
        # md5 of the batch set it covers; the incremental merge runs ONLY
        # when that set provably EXCLUDES this batch id. Everything else —
        # an older crash, manual surgery, a pre-covers manifest, or a
        # covers set that already contains this batch id (a crash replay OR
        # an orphan batch id being reclaimed with DIFFERENT data — batch-id
        # equality does not prove content equality) — pays the full
        # recompute, which is always correct.
        data_root = os.path.join(out_dir, "data")
        td_path = os.path.join(out_dir, "termdict")
        visible = [m["batch"] for m in _visible_batches(out_dir)]
        n_td = max(1, min(32, (bucket_base + P) // 4))
        td_man_path = os.path.join(manifest_dir, "termdict.json")
        td_covers = None
        if store.exists(td_man_path):
            td_covers = store.read_json(td_man_path).get("covers_md5")
        post_key = _covers_key(visible)
        pre_key = _covers_key([b for b in visible if b != batch_id])
        # invalidate the covers manifest BEFORE any termdict mutation: a
        # crash at ANY point inside the refresh then leaves no covers key,
        # forcing the next writer onto the always-correct full recompute.
        # Without this there is a window (termdict swapped, covers not yet
        # rewritten) where a pinned-batch replay would see the PRE-append
        # key against a POST-append termdict and union the batch in twice.
        if td_covers is not None:
            with contextlib.suppress(FileNotFoundError):
                store.remove(td_man_path)
        if td_covers == pre_key and store.exists(td_path):
            td_mode = "incremental"
            # incremental: old termdict UNION new batch's aggregate
            batch_agg = (
                spark.read.parquet(batch_path)
                .filter(F.col("kind") == "s")
                .select("term", F.col("df_seg").cast("long").alias("df"),
                        "sum_tf")
            )
            old_td = spark.read.parquet(td_path)
            merged = (
                old_td.select("term", "df", "sum_tf")
                .unionByName(batch_agg)
                .groupBy("term")
                .agg(F.sum("df").alias("df"),
                     F.sum("sum_tf").alias("sum_tf"))
            )
            # old termdict is an INPUT: stage to a tmp dir, then swap
            # (Spark cannot overwrite a path it is reading). In the
            # swap window the termdict is absent, which term_df treats
            # as "no fast path", never as df=0.
            tmp_td = os.path.join(out_dir, "_termdict_tmp")
            store.rmtree(tmp_td)
            (
                merged.repartitionByRange(n_td, "term")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .option("parquet.block.size", str(1 << 20))
                .parquet(tmp_td)
            )
            store.rmtree(td_path)
            store.rename(tmp_td, td_path)
        else:
            td_mode = "full"
            # fallback: full recompute over the visible batches
            seg_all = (
                spark.read.option("basePath", data_root)
                .parquet(data_root)
                .filter(F.col("kind") == "s")
                .filter(F.col("batch").isin(visible))
            )
            (
                seg_all.groupBy("term")
                .agg(F.sum("df_seg").alias("df"),
                     F.sum("sum_tf").alias("sum_tf"))
                .repartitionByRange(n_td, "term")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .option("parquet.block.size", str(1 << 20))
                .parquet(td_path)
            )
        _write_manifest(td_man_path, kind="termdict", mode=td_mode,
                        covers_md5=post_key, covers_n=len(visible),
                        wall_sec=time.time() - t0)
        # fuzzydict lifecycle: a fresh sidecar stays fresh across the
        # append (delta-extended with the batch's terms); absent/stale
        # sidecars cost one manifest existence check and nothing else
        _fuzzydict_extend(spark, store, out_dir, batch_path,
                          pre_key, post_key)

        # stats: RECOMPUTED from the VISIBLE committed manifests (idempotent
        # under replay — a re-run of the same pinned batch converges, never
        # double-counts; a merge's half-GC'd leftovers don't inflate totals),
        # not incremented from the possibly-stale cache
        manifests = _visible_batches(out_dir)
        stats["n_docs"] = max(m.get("docid_range", [0, 0])[1]
                              for m in manifests)
        stats["total_tokens"] = sum(m.get("total_tokens", 0)
                                    for m in manifests)
        stats["avgdl"] = stats["total_tokens"] / stats["n_docs"]
        stats["n_postings"] = sum(m.get("n_postings", 0) for m in manifests)
        stats["n_segments"] = sum(m.get("n_segments", 0) for m in manifests)
        stats["bytes_blob"] = sum(m.get("bytes_blob", 0) for m in manifests)
        stats["bucket_width"] = max(
            [stats["bucket_width"]]
            + [m["bucket_width"] for m in manifests if "bucket_width" in m]
        )
        stats["n_buckets"] = bucket_base + P
        stats["n_batches"] = len(manifests)
        stats["store_raw"] = raw_col is not None or bool(
            stats.get("store_raw")
        )
        stats["built_at_sec"] = time.time()
        store.write_json_atomic(os.path.join(out_dir, "stats.json"), stats)
        return BuildMetrics(
            n_docs=stats["n_docs"],
            n_postings=int(seg_meta["n_postings"] or 0),
            n_segments=int(seg_meta["n_segments"] or 0),
            bytes_blob=int(seg_meta["bytes_blob"] or 0),
            total_tokens=int(seg_meta["total_tokens"] or 0),
            wall_sec=time.time() - t0,
        )
    finally:
        src.unpersist()


@_locked("merge", dir_arg=1)
def merge_appends(
    spark: SparkSession,
    index_dir: str,
    num_partitions: int | None = None,
    min_batches: int = 2,
    gc: bool = True,
) -> BuildMetrics | None:
    """Tiered (minor) compaction: collapse the appended/previously-merged
    batches into ONE term-range-partitioned batch without touching the
    base build batches and WITHOUT decoding a single posting blob — the
    LSM / Lucene tiered-merge analogue, with ``compact_index`` as the
    major compaction (the reference never needs either: ``MemoryIndex``
    is one in-memory map, index_memory_index.go:11-18).

    - **File-layout only.** Segment rows (one per (term, bucket, chunk);
      the blob stays opaque) are rewritten ``repartitionByRange(term)`` so
      the merged tier gets ~disjoint per-file term ranges; docmap rows are
      rewritten docid-range partitioned. Docids, buckets, scores and
      result order are byte-identical to the pre-merge index — no docid
      remap, no re-encode, no text touched.
    - **Bounds query fan-out.** N appends leave N batch dirs and ~N file
      splits per query term; after a merge a term touches ~1 merged file,
      and the regenerated ``segfiles.json`` covers EVERY visible segment
      file, so file-level pruning serves the whole index again (appends
      invalidate it).
    - **Crash-atomic via manifest visibility, not a directory swap.** The
      merged batch dir is written under ``data/`` but stays invisible
      (readers plan from batch manifests) until its own manifest —
      carrying ``replaces=[...]`` — is atomically written. A crash before
      that leaves an inert orphan dir, reclaimed by the next merge; a
      crash after it but before GC leaves replaced manifests that
      ``_visible_batches`` already hides. Single concurrent writer, same
      as ``append_index`` (pause streams across a merge).

    At 10^12-doc scale this is the steady-state maintenance op: appends
    accumulate small L0 batches, ``merge_appends`` rolls them into the L1
    tier at file-shuffle cost, and the full rewrite (url-order remap +
    re-encode) runs rarely, when the ingest-order tiebreak or bucket-count
    drift starts to matter.

    ``gc=False`` defers reclamation: replaced batches stay on disk (hidden
    from every new reader by ``replaces``) so readers that planned before
    the merge keep a consistent snapshot; run ``gc_index`` when they're
    gone.

    Returns the merged batch's metrics, or None when fewer than
    ``min_batches`` appended batches exist."""
    t0 = time.time()
    import visigoth_spark

    visigoth_spark.ensure_shipped(spark)
    store = vstore.get_store(index_dir, spark)
    stats = load_stats(index_dir)
    manifest_dir = os.path.join(index_dir, "_manifests")
    vis_now = _visible_batches(index_dir)
    pre_visible = [m["batch"] for m in vis_now]
    to_merge = [m for m in vis_now
                if m.get("appended") or m.get("merged")]
    if len(to_merge) < min_batches:
        return None
    src_ids = [m["batch"] for m in to_merge]
    data_root = os.path.join(index_dir, "data")
    new_batch = 1 + max(m["batch"] for m in _batch_manifests(index_dir))
    # never claim a batch id a stream epoch has durably ALLOCATED but not
    # yet committed (stream_epochs.json): the epoch's crash-replay writes
    # its pinned batch id mode=overwrite and would destroy the merged batch
    ledger = os.path.join(manifest_dir, "stream_epochs.json")
    if store.exists(ledger):
        epochs = store.read_json(ledger)
        new_batch = max(new_batch, 1 + max(
            (r["batch"] for r in epochs.values() if "batch" in r),
            default=-1,
        ))
    batch_path = os.path.join(data_root, f"batch={new_batch}")
    if store.exists(batch_path):
        store.rmtree(batch_path)  # inert orphan from a crashed prior merge
    paths = [os.path.join(data_root, f"batch={b}") for b in src_ids]
    rows = spark.read.option("basePath", data_root).parquet(*paths)
    P = num_partitions or spark.sparkContext.defaultParallelism * 2
    (
        rows.filter(F.col("kind") == "s").drop("batch")
        .repartitionByRange(max(1, min(64, P)), "term")
        .sortWithinPartitions("term", "bucket", "min_docid")
        .write.mode("overwrite")
        .option("parquet.block.size", str(4 * 1024 * 1024))
        .partitionBy("kind")
        .parquet(batch_path)
    )
    (
        rows.filter(F.col("kind") == "d").drop("batch")
        .repartitionByRange(max(1, min(32, P)), "docid")
        .sortWithinPartitions("docid")
        .write.mode("append")
        .option("parquet.block.size", str(4 * 1024 * 1024))
        .partitionBy("kind")
        .parquet(batch_path)
    )
    seg_meta = _seg_meta(spark, batch_path)
    # extend the file-range manifests with the merged batch's entries
    # BEFORE the commit point, KEEPING the replaced batches' entries: the
    # manifest stays a SUPERSET of the visible files on both sides of the
    # commit (readers filter entries by batch visibility), so neither a
    # crash before the commit (merged batch invisible, its extra entries
    # ignored) nor after it (replaced batches hidden, their entries
    # ignored) can make pruning miss a visible file. The sweep touches
    # ONLY the merged batch's files — O(merged files), not O(index files).
    had_manifest = store.exists(
        os.path.join(manifest_dir, "segfiles.json")
    ) and store.exists(os.path.join(manifest_dir, "docfiles.json"))
    _extend_file_manifests(store, index_dir, manifest_dir, new_batch,
                           batch_path)
    # commit point: ONE atomic manifest write makes the merged batch
    # visible and simultaneously hides the batches it replaces
    _write_manifest(
        os.path.join(manifest_dir, f"batch_{new_batch}.json"),
        kind="batch", batch=new_batch, merged=True,
        replaces=src_ids,
        docid_range=[min(m["docid_range"][0] for m in to_merge),
                     max(m["docid_range"][1] for m in to_merge)],
        n_docs=sum(m["n_docs"] for m in to_merge),
        buckets=sorted({b for m in to_merge
                        for b in m.get("buckets", [])}),
        bucket_width=max(m.get("bucket_width", 0) for m in to_merge),
        n_segments=int(seg_meta["n_segments"] or 0),
        n_postings=int(seg_meta["n_postings"] or 0),
        total_tokens=int(seg_meta["total_tokens"] or 0),
        bytes_blob=int(seg_meta["bytes_blob"] or 0),
        wall_sec=time.time() - t0,
    )
    # GC the replaced batches: manifests first (visibility already hides
    # them), dirs after — a crash anywhere in here is harmless. With
    # gc=False the replaced batches stay on disk, hidden by ``replaces``:
    # readers constructed BEFORE the merge keep a working snapshot (their
    # planned file paths still resolve) while new readers see the merged
    # tier; reclaim later with ``gc_index`` once old readers are gone.
    if gc:
        for b in src_ids:
            mp = os.path.join(manifest_dir, f"batch_{b}.json")
            if store.exists(mp):
                store.remove(mp)
        for b in src_ids:
            store.rmtree(os.path.join(data_root, f"batch={b}"))
    vis_after = _visible_batches(index_dir)
    if had_manifest:
        # cleanup: drop the replaced batches' (already reader-invisible)
        # entries — pure entry filtering, no footer sweeps. A crash before
        # this only leaves dead entries that visibility filtering hides.
        vis_prefixes = tuple(f"data/batch={m['batch']}/" for m in vis_after)
        for mf in ("segfiles.json", "docfiles.json"):
            mp = os.path.join(manifest_dir, mf)
            if store.exists(mp):
                files = [e for e in store.read_json(mp)["files"]
                         if e["path"].startswith(vis_prefixes)]
                _write_manifest(mp, files=files)
    else:
        # first manifest for this index (build-layout base + merged tier):
        # one full sweep over every visible segment/docmap file. The
        # merged tier has tight disjoint term ranges; base build-layout
        # files carry whatever their footer stats give (wide).
        _write_segfiles_manifest(
            index_dir, manifest_dir,
            [os.path.join(data_root, f"batch={m['batch']}", "kind=s")
             for m in vis_after],
        )
        _write_docfiles_manifest(
            index_dir, manifest_dir,
            [os.path.join(data_root, f"batch={m['batch']}", "kind=d")
             for m in vis_after],
        )
    # the merge moved postings between batches without changing a single
    # (term, df, sum_tf) — the termdict VALUES stay valid, but its covers
    # key must be re-pointed at the post-merge batch set, or the next
    # append would see a mismatch and pay a full recompute. Only re-point
    # a termdict that provably covered the pre-merge set.
    td_man_path = os.path.join(manifest_dir, "termdict.json")
    if store.exists(td_man_path):
        td_man = store.read_json(td_man_path)
        if td_man.get("covers_md5") == _covers_key(pre_visible):
            vis_ids = [m["batch"] for m in vis_after]
            td_man["covers_md5"] = _covers_key(vis_ids)
            td_man["covers_n"] = len(vis_ids)
            store.write_json_atomic(td_man_path, td_man)
            # the fuzzydict sidecar is derived from the (unchanged)
            # vocabulary — re-point a fresh one the same way, or every
            # merge would silently false-stale it back to the O(V) scan
            fd_man_path = os.path.join(manifest_dir, "fuzzydict.json")
            if store.exists(fd_man_path):
                fd_man = store.read_json(fd_man_path)
                if fd_man.get("covers_md5") == _covers_key(pre_visible):
                    fd_man["covers_md5"] = _covers_key(vis_ids)
                    store.write_json_atomic(fd_man_path, fd_man)
    # fuzzydict lifecycle: a sidecar the re-point above could NOT keep
    # fresh (it was already stale, e.g. appends ran before the sidecar
    # existed or a crash dropped its manifest) is rebuilt here from the
    # post-merge termdict, under the merge's writer lock — maintenance
    # never demotes fuzzy/suggest to the O(vocabulary) scan
    _fuzzydict_refresh_if_stale(spark, store, index_dir)
    # stats: recomputed from the visible manifests (same rule as append)
    stats["n_docs"] = max(m.get("docid_range", [0, 0])[1]
                          for m in vis_after)
    stats["total_tokens"] = sum(m.get("total_tokens", 0) for m in vis_after)
    stats["avgdl"] = stats["total_tokens"] / stats["n_docs"]
    stats["n_postings"] = sum(m.get("n_postings", 0) for m in vis_after)
    stats["n_segments"] = sum(m.get("n_segments", 0) for m in vis_after)
    stats["bytes_blob"] = sum(m.get("bytes_blob", 0) for m in vis_after)
    stats["n_batches"] = len(vis_after)
    stats["merged_at_sec"] = time.time()
    store.write_json_atomic(os.path.join(index_dir, "stats.json"), stats)
    return BuildMetrics(
        n_docs=stats["n_docs"],
        n_postings=int(seg_meta["n_postings"] or 0),
        n_segments=int(seg_meta["n_segments"] or 0),
        bytes_blob=int(seg_meta["bytes_blob"] or 0),
        total_tokens=int(seg_meta["total_tokens"] or 0),
        wall_sec=time.time() - t0,
    )


@_locked("gc", dir_arg=0)
def gc_index(index_dir: str) -> list[int]:
    """Reclaim batches hidden by a merge's ``replaces`` field — the
    deferred half of ``merge_appends(gc=False)``. Manifests are removed
    first (visibility already excludes them), directories after; safe to
    crash anywhere and safe to re-run. Only call once readers that planned
    BEFORE the merge are gone (single-writer contract, like every other
    maintenance op here). Returns the batch ids reclaimed."""
    ms = _batch_manifests(index_dir)
    replaced: set[int] = set()
    for m in ms:
        replaced.update(m.get("replaces", []))
    victims = sorted(replaced & {m["batch"] for m in ms})
    store = vstore.get_store(index_dir)
    manifest_dir = os.path.join(index_dir, "_manifests")
    data_root = os.path.join(index_dir, "data")
    for b in victims:
        mp = os.path.join(manifest_dir, f"batch_{b}.json")
        if store.exists(mp):
            store.remove(mp)
    for b in victims:
        store.rmtree(os.path.join(data_root, f"batch={b}"))
    return victims


TOMBSTONES_FILE = "tombstones.json"


def load_tombstones(index_dir: str) -> list[int]:
    """The index's tombstoned docids (sorted), [] when none."""
    store = vstore.get_store(index_dir)
    path = os.path.join(index_dir, "_manifests", TOMBSTONES_FILE)
    if not store.exists(path):
        return []
    return sorted(int(d) for d in store.read_json(path).get("docids", []))


@_locked("delete", dir_arg=1)
def delete_docs(spark: SparkSession, index_dir: str,
                urls=None, docids=None) -> int:
    """LSM-style document deletion: record the docids as TOMBSTONES in
    ``_manifests/tombstones.json`` (atomic rewrite under the writer lock).

    Semantics (exactly Lucene's deleted-docs model):
    - queries mask tombstoned docs BEFORE scoring and k-capping (exact —
      a deleted doc can never appear in results, and survivors' ranks are
      computed as if it simply lost the match);
    - BM25 corpus statistics (df, n_docs, avgdl) keep counting deleted
      docs until the next ``compact_index``, which purges them physically
      (docmap rows dropped pre-remap, postings dropped by the remap join)
      and clears the tombstone set;
    - ``merge_appends`` is unaffected (file layout only — docids stable).
    An update is delete + append (the reference's Put always appends a
    NEW doc even for a repeated url — entities_doc.go:12-14 identity is
    the url STRING; tombstoning the old docid gives replace semantics).

    ``urls`` resolve against the VISIBLE docmap; unknown urls delete
    nothing. Returns the number of newly tombstoned docids (idempotent:
    re-deleting is 0). Scale note: the tombstone set ships to query
    kernels with the task closure — keep it modest (<~1M) and compact to
    reclaim; the upgrade path is a per-batch roaring-bitmap sidecar
    behind this same file."""
    if (urls is None) == (docids is None):
        raise ValueError("pass exactly one of urls= or docids=")
    store = vstore.get_store(index_dir, spark)
    manifest_dir = os.path.join(index_dir, "_manifests")
    if docids is None:
        urls = list(urls)
        if not urls:
            return 0
        vis = [m["batch"] for m in _visible_batches(index_dir)]
        data_root = os.path.join(index_dir, "data")
        data = spark.read.option("basePath", data_root).parquet(data_root)
        rows = (
            data.filter(F.col("kind") == "d")
            .filter(F.col("batch").isin(vis))
            .filter(F.col("url").isin(urls))
            .select("docid").collect()
        )
        docids = [r["docid"] for r in rows]
    path = os.path.join(manifest_dir, TOMBSTONES_FILE)
    cur: set[int] = set()
    if store.exists(path):
        cur = set(store.read_json(path).get("docids", []))
    new = {int(d) for d in docids} - cur
    if new:
        store.write_json_atomic(
            path, {"docids": sorted(cur | new)})
    return len(new)


def _deletion_variants(term_col, max_edits: int):
    """Array column: the term itself plus every string reachable by
    deleting up to ``max_edits`` characters (the SymSpell deletion
    neighborhood), deduplicated — pure Catalyst, no Python in the row
    path. ``max_edits=2`` builds the 2-deletion neighborhood as the
    1-deletions of the 1-deletions."""
    def del1(col):
        return F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                col.substr(F.lit(1), i - 1),
                col.substr(i + 1, F.length(col)),
            ),
        )

    d1 = del1(term_col)
    out = F.array_union(F.array(term_col), d1)
    if max_edits >= 2:
        out = F.array_union(out, F.flatten(F.transform(d1, del1)))
    return F.array_distinct(out)


def _fuzzydict_rebuild(spark: SparkSession, store, root: str,
                       num_files: int, max_edits: int, covers) -> None:
    """(Re)build the sidecar under ``root`` from ``root``'s termdict —
    atomic tmp+swap, manifest-gated (the manifest is REMOVED before any
    directory mutation and re-written only after the swap completes; on
    object stores rename is copy+delete, so readers in the window fail
    the freshness check and take the always-correct scan fallback).
    Shared by the public ``build_fuzzydict`` and the maintenance ops'
    lifecycle hooks (which already hold the writer lock)."""
    td_path = os.path.join(root, "termdict")
    terms = spark.read.parquet(td_path).select("term")
    rows = terms.select(
        F.explode(_deletion_variants(F.col("term"), max_edits))
        .alias("variant"),
        "term",
    )
    tmp = os.path.join(root, "_fuzzydict_tmp")
    store.rmtree(tmp)
    (
        rows.repartitionByRange(num_files, "variant")
        .sortWithinPartitions("variant", "term")
        .write.mode("overwrite")
        .option("parquet.block.size", str(1 << 20))
        .parquet(tmp)
    )
    final = os.path.join(root, "fuzzydict")
    man_path = os.path.join(root, "_manifests", "fuzzydict.json")
    with contextlib.suppress(FileNotFoundError):
        store.remove(man_path)
    store.rmtree(final)
    store.rename(tmp, final)
    _write_manifest(man_path, kind="fuzzydict", covers_md5=covers,
                    max_edits=max_edits, num_files=num_files)


def _fuzzydict_extend(spark: SparkSession, store, index_dir: str,
                      batch_path: str, pre_key: str, post_key: str) -> None:
    """Keep a FRESH sidecar fresh across an append by delta-extending it
    with the new batch's (distinct) terms' deletion variants — O(batch
    vocabulary) work, not O(total vocabulary). Rows for terms the sidecar
    already covers are harmless duplicates (readers dedup candidates);
    the next merge/compact rebuilds the sidecar and squashes them. A
    sidecar that is absent, or already stale w.r.t. the pre-append batch
    set, is left alone (the merge/compact hooks rebuild it). Manifest-
    gated like the rebuild: a crash mid-extend leaves no manifest, which
    reads as stale — never as wrong candidates."""
    man_path = os.path.join(index_dir, "_manifests", "fuzzydict.json")
    if not store.exists(man_path):
        return
    man = store.read_json(man_path)
    if man.get("covers_md5") != pre_key:
        return  # already stale — nothing to keep fresh
    fd_dir = os.path.join(index_dir, "fuzzydict")
    if not store.isdir(fd_dir):
        return
    max_edits = int(man.get("max_edits", 1))
    with contextlib.suppress(FileNotFoundError):
        store.remove(man_path)
    terms = (
        spark.read.parquet(batch_path)
        .filter(F.col("kind") == "s")
        .select("term").distinct()
    )
    (
        terms.select(
            F.explode(_deletion_variants(F.col("term"), max_edits))
            .alias("variant"),
            "term",
        )
        .coalesce(1)
        .sortWithinPartitions("variant", "term")
        .write.mode("append")
        .option("parquet.block.size", str(1 << 20))
        .parquet(fd_dir)
    )
    _write_manifest(man_path, kind="fuzzydict", covers_md5=post_key,
                    max_edits=max_edits,
                    num_files=int(man.get("num_files", 4)), mode="delta")


def _fuzzydict_refresh_if_stale(spark: SparkSession, store,
                                index_dir: str) -> None:
    """Post-merge/compact hook: if a sidecar EXISTS but no longer matches
    the live termdict covers key, rebuild it from the (fresh) termdict
    under the caller's writer lock — the lifecycle integration that keeps
    ``expand_fuzzy``/``suggest`` on the O(keys) SymSpell path across
    maintenance instead of demoting to the O(vocabulary) scan. No-ops
    when no sidecar was ever built, or when it is already fresh (the
    cheap re-point paths)."""
    fd_dir = os.path.join(index_dir, "fuzzydict")
    man_path = os.path.join(index_dir, "_manifests", "fuzzydict.json")
    had_dir = store.isdir(fd_dir)
    had_man = store.exists(man_path)
    if not (had_dir or had_man):
        return
    td_man = os.path.join(index_dir, "_manifests", "termdict.json")
    if not store.exists(td_man):
        return  # no provably-fresh vocabulary to rebuild from
    covers = store.read_json(td_man).get("covers_md5")
    man = store.read_json(man_path) if had_man else {}
    if had_dir and man.get("covers_md5") == covers:
        return  # fresh already
    _fuzzydict_rebuild(spark, store, index_dir,
                       num_files=int(man.get("num_files", 4)),
                       max_edits=int(man.get("max_edits", 1)),
                       covers=covers)


@_locked("fuzzydict", dir_arg=1)
def build_fuzzydict(spark: SparkSession, index_dir: str,
                    num_files: int = 4, max_edits: int = 1) -> int:
    """SymSpell-style deletion-neighborhood sidecar for fuzzy expansion:
    one (variant, term) row for every vocabulary term and each of its
    up-to-``max_edits``-deletion strings, variant-range partitioned +
    variant-sorted. Two terms are within Levenshtein distance d iff their
    d-deletion neighborhoods intersect (incl. the terms themselves), so a
    fuzzy lookup becomes a row-group-pruned point read of the query's
    deletion-neighborhood keys instead of the O(vocabulary) scan — the
    public SymSpell design (Garbe), which is the scale path
    ``expand_fuzzy`` documents. ``max_edits=2`` serves both d=1 and d=2
    lookups (a 1-deletion neighborhood is a subset of the stored
    2-deletion one; extra candidates die at the exact verify) at
    O(len^2) variants per term.

    Lifecycle: the sidecar records the termdict manifest's covers key;
    ``expand_fuzzy`` uses it ONLY while that key still matches the live
    termdict and silently falls back to the always-correct vocab scan
    otherwise. The maintenance ops keep it fresh automatically —
    ``append_index`` delta-extends it with the batch's terms,
    ``merge_appends`` re-points (vocabulary unchanged) or rebuilds, and
    ``compact_index`` rebuilds it in the staged layout (the vocabulary
    can SHRINK there: tombstone purge drops fully-deleted terms) — so
    one explicit build keeps the O(keys) path live for the index's
    lifetime. Returns the variant row count."""
    import visigoth_spark

    visigoth_spark.ensure_shipped(spark)
    if max_edits not in (1, 2):
        raise ValueError("max_edits must be 1 or 2")
    store = vstore.get_store(index_dir, spark)
    td_path = os.path.join(index_dir, "termdict")
    if not store.isdir(td_path):
        raise ValueError("index has no termdict — build the index first")
    td_man = os.path.join(index_dir, "_manifests", "termdict.json")
    covers = (store.read_json(td_man).get("covers_md5")
              if store.exists(td_man) else None)
    _fuzzydict_rebuild(spark, store, index_dir, num_files, max_edits,
                       covers)
    return spark.read.parquet(
        os.path.join(index_dir, "fuzzydict")).count()


def update_docs(spark: SparkSession, index_dir: str, corpus: DataFrame,
                analyzer: AnalyzerConfig = DEFAULT_ANALYZER,
                num_partitions: int | None = None,
                driver_url_max: int = 100_000,
                tombstone_max: int = 2_000_000,
                **append_kwargs) -> int:
    """Replace-by-url: tombstone the index's CURRENT docs for ``corpus``'s
    urls (``delete_docs``), then append ``corpus`` as new docs
    (``append_index``) — the engine-level update primitive. Returns how
    many urls existed before (were replaced); the rest are plain inserts.

    Two sequential writer-locked ops, not one transaction: a crash between
    them leaves the urls tombstoned but not yet re-added — retrying the
    SAME update converges only if the append hadn't committed (use the
    streaming path's pinned-epoch idempotence for exactly-once pipelines).

    Scale guard: batches of up to ``driver_url_max`` distinct urls take
    the point path (url IN-list pruned docmap scan). Bigger batches
    switch to a join-based matching plan — the corpus's distinct urls
    join the docmap executor-side, so neither the url list nor its plan
    literals ever materialize on the driver. The matched-docid count is
    still bounded by ``tombstone_max`` with a LOUD error: tombstones are
    a driver/manifest-resident set by design (query.py masks them into
    every kernel), so a rewrite touching more live docs than that must go
    through ``build_index``/``compact_index`` instead of pretending to be
    an update."""
    # one count decides the matching plan; distinct() also makes the
    # "replaced" accounting url-unique by construction
    urls_df = corpus.select("url").distinct()
    n_urls = urls_df.count()
    replaced = 0
    if n_urls:
        vis = [m["batch"] for m in _visible_batches(index_dir)]
        data_root = os.path.join(index_dir, "data")
        docmap = (
            spark.read.option("basePath", data_root).parquet(data_root)
            .filter(F.col("kind") == "d")
            .filter(F.col("batch").isin(vis))
        )
        if n_urls <= driver_url_max:
            # point path: IN-list filter prunes docmap files/row-groups
            urls = [r["url"] for r in urls_df.collect()]
            rows = (docmap.filter(F.col("url").isin(urls))
                    .select("url", "docid").collect())
        else:
            # join path: urls stay distributed; only the MATCHED (url,
            # docid) pairs come back, after the tombstone_max count gate
            matched = docmap.join(urls_df, "url").select("url", "docid")
            n_matched = matched.count()
            if n_matched > tombstone_max:
                raise ValueError(
                    f"update_docs matched {n_matched:,} existing docs — "
                    f"above tombstone_max={tombstone_max:,}. A rewrite "
                    "this size must not run through the tombstone path "
                    "(the docid set is driver/manifest-resident): rebuild "
                    "with build_index, or update in bounded batches and "
                    "compact_index between them."
                )
            rows = matched.collect()
        live = set(load_tombstones(index_dir))
        found = [(r["url"], int(r["docid"])) for r in rows
                 if int(r["docid"]) not in live]
        # replaced = DISTINCT urls currently visible (a url ingested twice
        # counts once; an already-tombstoned url counts zero — it no
        # longer "exists"); the delete itself tombstones by docid set
        replaced = len({u for u, _ in found})
        if found:
            delete_docs(spark, index_dir, docids=[d for _, d in found])
    append_index(spark, corpus, index_dir, analyzer=analyzer,
                 num_partitions=num_partitions, **append_kwargs)
    return replaced


@_locked("compact", dir_arg=1)
def compact_index(
    spark: SparkSession,
    index_dir: str,
    dest: str | None = None,
    num_partitions: int | None = None,
    flush_docs: int = 500_000,
) -> BuildMetrics:
    """Merge a multi-batch (appended) index back into the canonical
    single-batch layout — the Lucene force-merge analogue for this engine
    (north_rule "merge" clause; the reference never needs it because
    ``MemoryIndex`` is one in-memory map, index_memory_index.go:11-18).

    What compaction restores after a run of ``append_index`` calls:

    - **url-ordered dense docids**: appended batches assign docids in ingest
      order, so exact-score ties are broken by ingest order. Compaction
      reassigns docids densely in global url order, restoring
      (score DESC, docid ASC) ≡ (score DESC, url ASC) — the pure-batch-build
      determinism contract (search_result.go:31-38).
    - **bounded bucket count**: every append adds P fresh buckets; the
      per-bucket query kernel fans out per bucket, so hundreds of appends
      mean hundreds of tiny kernel groups. Compaction rewrites to exactly P
      range-partitioned buckets.
    - **one segment run per term**: per-term postings fragmented across
      batch dirs collapse into at most ceil(bucket_docs/flush_docs) segments
      per (term, bucket), cutting per-query decode/seek overhead.
    - **term-range file layout**: compacted segment files are
      range-partitioned AND sorted by term (the build's per-corpus-partition
      files are only term-sorted *within* a file), so a query term's
      segments for ALL buckets live in one file — row-group pruning touches
      a single file per term instead of one per corpus partition.

    Dataflow (never touches corpus text — compaction is metadata + postings
    only, ~bytes_blob + docmap in, same out):

      docmap (all batches) --repartitionByRange(url)--> pass 0 offsets
        --mapInPandas--> map(docid_old -> docid_new, bucket_new) [staged]
      segments --decode--> (term, docid_old, tf) [doclens ride in the blob]
        --join map on docid_old (broadcast when small, SMJ at scale)-->
        --groupBy(bucket, docid_new // flush_docs) applyInPandas-->
          re-encoded segment rows  --repartitionByRange(term)--> write
      termdict rebuilt; stats/manifests rewritten; for in-place compaction
      the staged index swaps in via directory renames, with the previous
      index preserved at ``_pre_compact`` until the swap completes.

    Invariants preserved (asserted by tests/test_compact.py): the multiset
    of per-term (url, tf, doclen) postings, n_docs, total_tokens,
    n_postings, store_raw content, BM25 scores. Per-doc-range memory in the
    encode stage is bounded by ``flush_docs`` docs per group — a group is a
    (bucket, docid-chunk), never a whole term's posting list, so head-term
    skew cannot concentrate in one task (same structural bound as the
    build).

    ``dest``: write the compacted index to a NEW directory, leaving
    ``index_dir`` untouched (the safe cluster mode — repoint an alias after,
    catalog.py). ``dest=None`` compacts in place: stage under
    ``index_dir/_compact_tmp``, then swap via renames. The swap is a
    single-writer maintenance window; a crash mid-swap leaves both halves on
    disk (``_pre_compact`` + staged pieces) for manual recovery, and a stale
    ``_compact_tmp`` from a crashed run is cleared on the next call.
    """
    import visigoth_spark

    visigoth_spark.ensure_shipped(spark)
    t0 = time.time()
    store = vstore.get_store(index_dir, spark)
    _recover_pre_compact(store, index_dir)
    stats = load_stats(index_dir)
    in_place = dest is None
    stage = os.path.join(index_dir, "_compact_tmp") if in_place else dest
    # dest may live on a DIFFERENT store than the source index (e.g.
    # compact a POSIX index into s3a://); the swap path is in-place only,
    # so src/dst stores never mix inside a rename
    stage_store = store if in_place else vstore.get_store(stage, spark)
    if in_place and store.exists(stage):
        store.rmtree(stage)  # stale staging from a crashed prior run
    stage_store.makedirs(stage)

    old_root = os.path.join(index_dir, "data")
    data = spark.read.option("basePath", old_root).parquet(old_root)
    # fold ONLY visible batches: a crashed append leaves an orphan batch
    # dir (invisible to queries — SearchIndex plans from the manifests) and
    # a crashed merge_appends can leave a replaced batch's manifest behind
    # — folding either would make uncommitted/duplicate ingest permanent
    committed = [m["batch"] for m in _visible_batches(index_dir)]
    data = data.filter(F.col("batch").isin(committed))
    has_raw = bool(stats.get("store_raw")) and "raw" in data.columns
    has_pos = (bool(stats.get("store_positions"))
               and "pos_blob" in data.columns)
    doc_cols = ["docid", "url", "doclen"] + (["raw"] if has_raw else [])
    docmap_old = data.filter(F.col("kind") == "d").select(*doc_cols)

    # purge tombstoned docs: dropped from the docmap BEFORE the remap, so
    # they get no new docid; their postings drop for free at the remap
    # join below (inner on docid_old). Stats recompute from the re-encoded
    # data, so n_docs/df/avgdl stop counting them — the Lucene merge
    # semantics — and the tombstone set is NOT carried to the new
    # generation (old docids would alias remapped ones).
    tombs = load_tombstones(index_dir)
    if tombs:
        tdf = spark.createDataFrame([(int(t),) for t in tombs],
                                    "docid long")
        docmap_old = docmap_old.join(F.broadcast(tdf), "docid", "left_anti")

    P = num_partitions or spark.sparkContext.defaultParallelism * 2
    # secondary sort on old docid: a url ingested twice (the reference
    # appends duplicates as distinct docs) keeps ingest order within the tie
    src = (
        docmap_old.repartitionByRange(P, "url")
        .sortWithinPartitions("url", "docid")
        .persist()
    )
    try:
        offsets = _partition_offsets(src)
        n_docs = offsets.pop(-1)
        if n_docs == 0:
            if tombs:
                raise ValueError(
                    "every document is tombstoned — an index cannot "
                    "compact to empty; drop it (Catalog.drop / rmtree) "
                    "instead of compacting"
                )
            raise ValueError("cannot compact an empty index")
        P = len(offsets)

        def remap_gen(iterator):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            next_id = offsets.get(pid, 0)
            for pdf in iterator:
                n = len(pdf)
                if n == 0:
                    continue
                out = pd.DataFrame(
                    {
                        "docid_old": pdf["docid"].to_numpy(np.int64),
                        "docid": np.arange(next_id, next_id + n,
                                           dtype=np.int64),
                        "bucket": np.full(n, pid, dtype=np.int32),
                        "url": pdf["url"].to_numpy(dtype=object),
                        "doclen": pdf["doclen"].to_numpy(np.int32),
                        "raw": (pdf["raw"].to_numpy(dtype=object)
                                if "raw" in pdf.columns
                                else np.full(n, None, dtype=object)),
                    }
                )
                next_id += n
                yield out

        # stage the docid map as parquet: the range shuffle samples
        # boundaries nondeterministically, so the TWO downstream consumers
        # (docmap write, postings join) must read ONE pinned materialization
        map_path = os.path.join(stage, "map")
        src.mapInPandas(
            remap_gen,
            "docid_old long, docid long, bucket int, url string, "
            "doclen int, raw string",
        ).write.mode("overwrite").parquet(map_path)
    finally:
        src.unpersist()
    map_df = spark.read.parquet(map_path)

    # ---- new docmap (kind=d), docid-sorted files, 4 MB row groups ----------
    batch_path = os.path.join(stage, "data", "batch=0")
    n = F.lit
    docmap_new = map_df.repartitionByRange(
        P, "docid"
    ).sortWithinPartitions("docid").select(
        n("d").alias("kind"), "bucket", n("").alias("term"),
        n(0).alias("df_seg"), n(0).cast("long").alias("sum_tf"),
        n(0).cast("long").alias("min_docid"),
        n(0).cast("long").alias("max_docid"),
        n(b"").cast("binary").alias("blob"),
        n(b"").cast("binary").alias("skips"),
        "docid", "url", "doclen",
        (F.col("raw") if has_raw else n(None).cast("string")).alias("raw"),
        n(None).cast("binary").alias("pos_blob"),
    )
    (
        docmap_new.write.mode("overwrite")
        .option("parquet.block.size", str(4 * 1024 * 1024))
        .partitionBy("kind")
        .parquet(batch_path)
    )

    # ---- postings: decode -> remap -> re-encode ----------------------------
    from visigoth_spark.codec import decode_segment

    from visigoth_spark.codec import decode_positions

    def explode_gen(iterator):
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            terms = pdf["term"].to_numpy(dtype=object)
            ids_acc, tfs_acc, dls_acc, reps = [], [], [], []
            pos_acc: list = []
            for i, blob in enumerate(pdf["blob"]):
                d, tf, dl = decode_segment(bytes(blob))
                ids_acc.append(d)
                tfs_acc.append(tf)
                dls_acc.append(dl)
                reps.append(len(d))
                if has_pos:
                    # per-posting position lists ride the shuffle as
                    # array<long> and re-encode on the other side
                    flat = decode_positions(
                        bytes(pdf["pos_blob"].iloc[i]), tf)
                    pos_acc.extend(
                        np.split(flat, np.cumsum(tf[:-1])))
            out = {
                "term": np.repeat(terms, reps),
                "docid_old": np.concatenate(ids_acc),
                "tf": np.concatenate(tfs_acc),
                # doclen rides the blob (decode gives it for free), so
                # the remap join below only carries (docid, bucket) —
                # a narrower build side and shuffle
                "dl": np.concatenate(dls_acc),
            }
            if has_pos:
                out["pos"] = pd.Series(pos_acc, dtype=object)
            yield pd.DataFrame(out)

    explode_schema = "term string, docid_old long, tf long, dl long"
    seg_cols = ["term", "blob"]
    if has_pos:
        explode_schema += ", pos array<long>"
        seg_cols.append("pos_blob")
    exploded = (
        data.filter(F.col("kind") == "s")
        .select(*seg_cols)
        .mapInPandas(explode_gen, explode_schema)
    )
    # the remap side is (docid_old, docid, bucket): ~20 B/doc. Up to a few
    # million docs that is broadcast territory — hash-joining each posting
    # row beats sort-merge-joining the (50x larger) exploded postings side,
    # and the bench's AQE-off sessions would otherwise always pick SMJ.
    # Past the cutoff (~80 MB broadcast) SMJ is the right plan and scales
    # to 10^12 docs.
    remap = map_df.select("docid_old", "docid", "bucket")
    if n_docs <= 4_000_000:
        remap = F.broadcast(remap)
    joined = exploded.join(remap, "docid_old").withColumn(
        "chunk", F.floor(F.col("docid") / F.lit(flush_docs)))

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        t = pdf["term"].to_numpy(dtype=object)
        d = pdf["docid"].to_numpy(np.int64)
        tf = pdf["tf"].to_numpy(np.int64)
        dl = pdf["dl"].to_numpy(np.int64)
        order = np.lexsort((d, t))
        pos = None
        if "pos" in pdf.columns:
            pos = np.concatenate(
                [np.asarray(p, dtype=np.int64)
                 for p in pdf["pos"].to_numpy(dtype=object)[order]]
            ) if len(pdf) else np.zeros(0, dtype=np.int64)
        return _seg_frame(t[order], d[order], tf[order], dl[order],
                          int(pdf["bucket"].iloc[0]), positions=pos)

    n_seg_files = max(1, min(64, P))
    (
        joined.groupBy("bucket", "chunk")
        .applyInPandas(encode_group, OUT_SCHEMA)
        .repartitionByRange(n_seg_files, "term")
        .sortWithinPartitions("term", "bucket")
        .write.mode("append")
        .option("parquet.block.size", str(4 * 1024 * 1024))
        .partitionBy("kind")
        .parquet(batch_path)
    )

    # ---- termdict + manifests + stats --------------------------------------
    new_root = os.path.join(stage, "data")
    seg_meta = _seg_meta(spark, batch_path)
    td_path = os.path.join(stage, "termdict")
    seg_all = (
        spark.read.option("basePath", new_root).parquet(new_root)
        .filter(F.col("kind") == "s")
    )
    n_td = max(1, min(32, P // 4))
    (
        seg_all.groupBy("term")
        .agg(F.sum("df_seg").alias("df"), F.sum("sum_tf").alias("sum_tf"))
        .repartitionByRange(n_td, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .option("parquet.block.size", str(1 << 20))
        .parquet(td_path)
    )

    manifest_dir = os.path.join(stage, "_manifests")
    stage_store.makedirs(manifest_dir)
    # termdict completeness marker (matches build_index/append_index):
    # without it, a later resumed build's completeness check would rebuild
    # the termdict unnecessarily. The compacted layout is one batch 0.
    _write_manifest(os.path.join(manifest_dir, "termdict.json"),
                    kind="termdict", covers_md5=_covers_key([0]),
                    covers_n=1, wall_sec=time.time() - t0)
    pids = sorted(offsets)
    part_sizes = [offsets[p + 1] - offsets[p] for p in pids[:-1]]
    part_sizes.append(n_docs - offsets[pids[-1]])
    wall = time.time() - t0
    _write_manifest(
        os.path.join(manifest_dir, "batch_0.json"),
        kind="batch", batch=0, compacted=True,
        compacted_from=stats.get("n_batches", 1),
        partitions=pids,
        docid_range=[0, n_docs],
        n_docs=n_docs,
        bucket_width=max(part_sizes),
        n_segments=int(seg_meta["n_segments"] or 0),
        n_postings=int(seg_meta["n_postings"] or 0),
        total_tokens=int(seg_meta["total_tokens"] or 0),
        bytes_blob=int(seg_meta["bytes_blob"] or 0),
        wall_sec=wall,
    )
    # file-level range manifests: compacted segment files are term-range
    # partitioned (disjoint ranges), so recording each file's
    # (term_min, term_max) lets SearchIndex enumerate ~1 file per query
    # term instead of scheduling a split per segment file (query.py
    # _seg_scan); likewise docmap files are docid-partitioned, so the
    # docid ranges let hydration open ~1 file per result id (query.py
    # _docmap_for). The stage root becomes the index root after the swap.
    _write_segfiles_manifest(stage, manifest_dir,
                             [os.path.join(batch_path, "kind=s")])
    _write_docfiles_manifest(stage, manifest_dir,
                             [os.path.join(batch_path, "kind=d")])
    # carry over non-batch manifest state — e.g. the streaming epoch ledger
    # (stream_epochs.json): losing it across the swap would make a restarted
    # stream re-ingest its replayed epochs as duplicates
    old_manifest_dir = os.path.join(index_dir, "_manifests")
    for fname in store.listdir(old_manifest_dir):
        if fname.startswith("batch_") or ".tmp" in fname or (
            # termdict/segfiles/docfiles: regenerated above for the staged
            # layout. ".tmp" also matches HadoopStore's ".tmp-<uuid>"
            # write_atomic debris a crash can leave — carrying it over
            # would immortalize it in every compacted index.
            # tombstones: PURGED physically above — carrying the old
            # docids over would mask freshly-remapped docs that reuse them.
            # fuzzydict: regenerated below when a sidecar exists (the
            # vocabulary can SHRINK across a compaction — tombstone purge
            # drops fully-deleted terms — so a re-point is not enough).
            fname in ("termdict.json", "segfiles.json", "docfiles.json",
                      "fuzzydict.json", TOMBSTONES_FILE)
        ):
            continue
        stage_store.write_atomic(
            os.path.join(manifest_dir, fname),
            store.read_bytes(os.path.join(old_manifest_dir, fname)),
        )
    # fuzzydict lifecycle: an index that had a sidecar gets a fresh one in
    # the staged layout, rebuilt from the staged termdict with the old
    # sidecar's settings (writer lock already held by this op)
    old_fd_man = os.path.join(old_manifest_dir, "fuzzydict.json")
    had_fuzzydict = (store.exists(old_fd_man)
                     or store.isdir(os.path.join(index_dir, "fuzzydict")))
    if had_fuzzydict:
        fd_prev = (store.read_json(old_fd_man)
                   if store.exists(old_fd_man) else {})
        _fuzzydict_rebuild(spark, stage_store, stage,
                           num_files=int(fd_prev.get("num_files", 4)),
                           max_edits=int(fd_prev.get("max_edits", 1)),
                           covers=_covers_key([0]))
    new_stats = dict(stats)
    new_stats.update(
        n_docs=n_docs,
        total_tokens=int(seg_meta["total_tokens"] or 0),
        avgdl=int(seg_meta["total_tokens"] or 0) / n_docs,
        n_postings=int(seg_meta["n_postings"] or 0),
        n_segments=int(seg_meta["n_segments"] or 0),
        bytes_blob=int(seg_meta["bytes_blob"] or 0),
        bucket_width=max(part_sizes),
        n_buckets=P,
        n_batches=1,
        store_raw=has_raw,
        compacted_at_sec=time.time(),
        built_at_sec=time.time(),
        wall_sec=wall,
    )
    stage_store.write_json_atomic(
        os.path.join(stage, "stats.json"), new_stats)
    stage_store.rmtree(map_path)  # staging artifact, not part of the index

    if in_place:
        # swap: previous index parked at _pre_compact until the new one is
        # fully in place, then deleted. Single-writer maintenance window.
        # On rename-atomic filesystems each piece moves atomically; on
        # object stores rename is a copy — prefer dest= + alias repoint
        # (catalog.py) there, which this swap path never requires.
        pre = os.path.join(index_dir, "_pre_compact")
        if store.exists(pre):
            store.rmtree(pre)
        store.makedirs(pre)
        # fuzzydict is an OPTIONAL piece: swapped when (re)built above,
        # tolerated absent on either side (e.g. first compaction of an
        # index whose sidecar dir was manually removed)
        pieces = _COMPACT_PIECES + (("fuzzydict",) if had_fuzzydict
                                    else ())
        for name in pieces:
            old_piece = os.path.join(index_dir, name)
            if store.exists(old_piece):
                store.rename(old_piece, os.path.join(pre, name))
        for name in pieces:
            staged_piece = os.path.join(stage, name)
            if store.exists(staged_piece):
                store.rename(staged_piece,
                             os.path.join(index_dir, name))
        store.rmtree(pre)
        store.rmtree(stage)

    return BuildMetrics(
        n_docs=n_docs,
        n_postings=int(seg_meta["n_postings"] or 0),
        n_segments=int(seg_meta["n_segments"] or 0),
        bytes_blob=int(seg_meta["bytes_blob"] or 0),
        total_tokens=int(seg_meta["total_tokens"] or 0),
        wall_sec=time.time() - t0,
    )


_COMPACT_PIECES = ("data", "termdict", "_manifests", "stats.json")


def _recover_pre_compact(store, index_dir: str) -> None:
    """Auto-recover from a crash inside a previous in-place compaction
    swap. The swap parks the old index at ``_pre_compact`` piece by piece,
    then moves the staged pieces in; a crash anywhere in between leaves
    the index root incomplete (or mixed-generation) while ``_pre_compact``
    still holds every not-yet-overwritten old piece. Recovery restores the
    PRE-compaction index exactly: every piece present under
    ``_pre_compact`` replaces its root counterpart (pieces the crash never
    moved are already the same generation; staged new-generation pieces
    that made it to the root are discarded — they derive from the old
    index and the re-run compaction rebuilds them).

    Restore ONLY when the swap is provably incomplete. Both swap phases
    remove pieces from the root before putting their replacements back
    (phase 1 parks root pieces under ``_pre_compact`` one rename at a
    time; phase 2 moves staged pieces in one rename at a time), so a
    crash anywhere inside the swap leaves the root missing at least one
    of ``_COMPACT_PIECES``. Conversely, a root with all pieces present
    means the swap FINISHED and only the final ``rmtree(_pre_compact)``
    was lost — then ``_pre_compact`` is a completed swap's leftover and
    is deleted, never restored: batches appended between that crash and
    this call live only in the new generation's ``data``/``_manifests``,
    and restoring the old generation over them would silently destroy
    committed ingest. No-op when ``_pre_compact`` is absent."""
    pre = vstore.join(index_dir, "_pre_compact")
    if not store.exists(pre):
        return
    if all(store.exists(vstore.join(index_dir, name))
           for name in _COMPACT_PIECES):
        # completed swap's leftover (crash after phase 2, before cleanup):
        # the root is the live new generation — possibly with appends on
        # top — so just finish the interrupted cleanup
        store.rmtree(pre)
        store.rmtree(vstore.join(index_dir, "_compact_tmp"))
        return
    for name in _COMPACT_PIECES + ("fuzzydict",):  # fuzzydict: optional
        src = vstore.join(pre, name)
        if store.exists(src):
            dst = vstore.join(index_dir, name)
            if store.exists(dst):
                store.rmtree(dst)
            store.rename(src, dst)
    store.rmtree(pre)
    store.rmtree(vstore.join(index_dir, "_compact_tmp"))


def _sweep_file_ranges(root: str, dirs: list[str],
                       column: str, key: str) -> list[dict]:
    """Per-file (min, max) of ``column`` from parquet footer stats — one
    driver-side metadata sweep, no row reads. Parquet stats truncation is
    conservative (min rounds down, max rounds up), so pruning on these
    bounds can only over-include, never miss a file. Paths are stored
    relative to ``root`` (the directory that will be the index root when
    the manifest is read). A ``dirs`` entry that does not exist (e.g. a
    batch whose docs all analyzed to zero tokens writes no kind=s dir) is
    skipped. A file with absent stats gets null bounds — planners must
    always include it."""
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    store = vstore.get_store(root)

    def _footer(full: str):
        local = store.local_path(full)
        if local is not None:
            return pq_.ParquetFile(local).metadata
        # object store: footer via the store's seekable stream (a handful
        # of ranged reads per file; py4j-batched, no per-byte marshalling)
        with store.open_seekable(full) as f:
            return pq_.ParquetFile(pa_.PythonFile(f, mode="r")).metadata

    entries = []
    for d in dirs:
        if not store.isdir(d):
            continue
        for fn in store.listdir(d):
            if not fn.endswith(".parquet"):
                continue
            full = vstore.join(d, fn)
            md = _footer(full)
            names = [md.schema.column(i).name
                     for i in range(md.num_columns)]
            ci = names.index(column)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or st.min is None or st.max is None:
                    mins, maxs = [], []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            entries.append({
                "path": vstore.relpath(full, root),
                f"{key}_min": min(mins) if mins else None,
                f"{key}_max": max(maxs) if maxs else None,
            })
    return entries


def _extend_file_manifests(store, out_dir: str, manifest_dir: str,
                           batch_id: int, batch_path: str) -> None:
    """Extend segfiles/docfiles with ONE batch's file ranges (replacing any
    stale entries under the same batch path — a replayed append rewrites
    the dir with fresh file names). No-op when a manifest is absent (the
    build layout never writes one; the first merge/compact creates it and
    appends maintain it from then on)."""
    specs = (("segfiles.json", "term", "term", "kind=s"),
             ("docfiles.json", "docid", "docid", "kind=d"))
    prefix = f"data/batch={batch_id}/"
    for mf, column, key, sub in specs:
        mp = os.path.join(manifest_dir, mf)
        if not store.exists(mp):
            continue
        kept = [e for e in store.read_json(mp)["files"]
                if not e["path"].startswith(prefix)]
        new = _sweep_file_ranges(out_dir,
                                 [os.path.join(batch_path, sub)],
                                 column, key)
        _write_manifest(mp, files=kept + new)


def _write_segfiles_manifest(root: str, manifest_dir: str,
                             seg_dirs: list[str]) -> None:
    """``_manifests/segfiles.json``: per-segment-file term ranges so the
    query planner (query.py::_seg_scan) enumerates only the files whose
    range covers a query term."""
    _write_manifest(
        os.path.join(manifest_dir, "segfiles.json"),
        files=_sweep_file_ranges(root, seg_dirs, "term", "term"),
    )


def _write_docfiles_manifest(root: str, manifest_dir: str,
                             doc_dirs: list[str]) -> None:
    """``_manifests/docfiles.json``: per-docmap-file docid ranges so
    result hydration (query.py::_docmap_for) opens only the files covering
    the k result ids instead of sweeping every docmap footer. Docmap files
    are docid-sorted both in the build layout (docids assigned in
    partition order) and after merge/compact rewrites, so ranges are tight
    and ~disjoint."""
    _write_manifest(
        os.path.join(manifest_dir, "docfiles.json"),
        files=_sweep_file_ranges(root, doc_dirs, "docid", "docid"),
    )


def _write_manifest(path: str, **kv) -> None:
    # atomic commit: a manifest is either absent or complete (POSIX rename
    # locally; per-scheme commit semantics in storage.py)
    vstore.get_store(path).write_json_atomic(path, kv)


def _is_complete(manifest_path: str, data_path: str) -> bool:
    store = vstore.get_store(manifest_path)
    return (
        store.exists(manifest_path)
        and store.exists(vstore.join(data_path, "_SUCCESS"))
    )


def load_stats(index_dir: str) -> dict:
    return vstore.get_store(index_dir).read_json(
        vstore.join(index_dir, "stats.json")
    )
