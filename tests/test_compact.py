"""Segment compaction (build.compact_index) — the Lucene force-merge
analogue. After a run of append_index calls, compaction must restore exactly
the index a cold single-batch build over the same documents produces:
identical docmap (dense docids in url order), identical per-term posting
lists, identical search results — while preserving stored raw content and
surviving stale staging dirs."""

from __future__ import annotations

import os

import numpy as np
import pytest

from visigoth_spark.build import (
    append_index,
    build_index,
    compact_index,
    load_stats,
)
from visigoth_spark.corpus import generate_corpus
from visigoth_spark.query import SearchIndex
from visigoth_spark.reference_engine import OracleIndex

QUERIES = ["curso", "programación java", "java java", "web curso gratis"]


def _df(spark, pdf):
    return spark.createDataFrame(pdf[["url", "text", "lang"]])


def _interleaved_slices(n=240, parts=3):
    """Slices whose urls INTERLEAVE — appended docids are maximally out of
    url order, so compaction's remap is actually exercised."""
    pdf = generate_corpus(n).sort_values("url").reset_index(drop=True)
    return pdf, [pdf.iloc[i::parts] for i in range(parts)]


def _appended_index(spark, tmp_path, name, slices, **kw):
    out = str(tmp_path / name)
    build_index(spark, _df(spark, slices[0]), out, num_partitions=3, **kw)
    for s in slices[1:]:
        append_index(spark, _df(spark, s), out, num_partitions=2, **kw)
    return out


def _docmap_rows(spark, out, cols=("docid", "url", "doclen")):
    idx = SearchIndex(spark, out)
    return [tuple(r[c] for c in cols)
            for r in idx._docmap.orderBy("docid").collect()]


class TestCompactEqualsColdBuild:
    @pytest.fixture(scope="class")
    def built(self, spark, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("compact")
        pdf, slices = _interleaved_slices()
        appended = _appended_index(spark, tmp, "appended", slices)
        cold = str(tmp / "cold")
        build_index(spark, _df(spark, pdf), cold, num_partitions=4)
        m = compact_index(spark, appended, num_partitions=4)
        return pdf, appended, cold, m

    def test_docmap_identical_to_cold_build(self, spark, built):
        pdf, compacted, cold, _ = built
        assert _docmap_rows(spark, compacted) == _docmap_rows(spark, cold)

    def test_postings_identical_to_cold_build(self, spark, built):
        _, compacted, cold, _ = built

        def full_postings(out):
            """term -> (docids, tfs, doclens) concatenated across segments,
            one collect per index."""
            from visigoth_spark.codec import decode_segment

            idx = SearchIndex(spark, out)
            rows = idx._postings.select(
                "term", "min_docid", "blob"
            ).collect()
            by_term: dict[str, list] = {}
            for r in rows:
                by_term.setdefault(r["term"], []).append(
                    (r["min_docid"], decode_segment(bytes(r["blob"])))
                )
            return {
                t: tuple(
                    np.concatenate([seg[i] for _, seg in sorted(
                        parts, key=lambda p: p[0])])
                    for i in range(3)
                )
                for t, parts in by_term.items()
            }

        pa, pb = full_postings(compacted), full_postings(cold)
        assert set(pa) == set(pb) and pa
        for t in pa:
            for i, name in enumerate(("docids", "tfs", "doclens")):
                np.testing.assert_array_equal(pa[t][i], pb[t][i],
                                              err_msg=f"{t}/{name}")

    def test_stats_preserved(self, built):
        _, compacted, cold, m = built
        sa, sb = load_stats(compacted), load_stats(cold)
        for k in ("n_docs", "total_tokens", "n_postings"):
            assert sa[k] == sb[k], k
        assert sa["avgdl"] == pytest.approx(sb["avgdl"])
        assert sa["n_batches"] == 1
        assert m.n_docs == sb["n_docs"]
        assert m.n_postings == sb["n_postings"]

    def test_search_parity_with_oracle(self, spark, built):
        pdf, compacted, _, _ = built
        oracle = OracleIndex()
        for r in pdf.sort_values("url").itertuples():
            oracle.put(r.url, r.text)
        idx = SearchIndex(spark, compacted)
        for q in QUERIES:
            got = [(r["url"], r["score"])
                   for r in idx.search(q, "bm25", k=10).collect()]
            exp = oracle.bm25_search(q, k=10)
            assert [u for u, _ in got] == [u for u, _ in exp], q
            for (u1, s1), (_, s2) in zip(got, exp):
                assert s1 == pytest.approx(s2, abs=1e-12), (q, u1)

    def test_no_staging_leftovers(self, built):
        _, compacted, _, _ = built
        assert not os.path.exists(os.path.join(compacted, "_compact_tmp"))
        assert not os.path.exists(os.path.join(compacted, "_pre_compact"))


class TestCompactModes:
    def test_dest_mode_leaves_source_untouched(self, spark, tmp_path):
        pdf, slices = _interleaved_slices(120, 2)
        src = _appended_index(spark, tmp_path, "src", slices)
        before = _docmap_rows(spark, src)
        dest = str(tmp_path / "dst")
        compact_index(spark, src, dest=dest, num_partitions=3)
        assert load_stats(src)["n_batches"] == 2
        assert _docmap_rows(spark, src) == before
        # dest is url-ordered dense while source kept ingest order
        urls = [u for _, u, _ in _docmap_rows(spark, dest)]
        assert urls == sorted(urls)
        # dest matches the single-process oracle exactly (incl. the url
        # tiebreak); src may legitimately differ from dest on exact-score
        # ties at the k boundary (ingest-order tiebreak) — assert its score
        # sequence instead
        oracle = OracleIndex()
        for r in pdf.sort_values("url").itertuples():
            oracle.put(r.url, r.text)
        a = SearchIndex(spark, src)
        b = SearchIndex(spark, dest)
        for q in QUERIES:
            exp = oracle.bm25_search(q, k=10)
            gb = [(r["url"], r["score"])
                  for r in b.search(q, "bm25", k=10).collect()]
            assert [u for u, _ in gb] == [u for u, _ in exp], q
            ga_scores = [r["score"]
                         for r in a.search(q, "bm25", k=10).collect()]
            assert ga_scores == pytest.approx([s for _, s in exp],
                                              abs=1e-12), q

    def test_url_tiebreak_restored(self, spark, tmp_path):
        """Two docs with IDENTICAL text appended in reverse url order tie on
        score. The reference breaks ties on Document.ID() = the url string
        (search_result.go:31-38 + entities_doc.go:12-14): the appended
        index honors it via the hydrated-top-k url re-tiebreak (kernels
        select on docid = ingest order; only the k-BOUNDARY can differ),
        and compaction restores docid ≡ url order so the contract holds
        structurally."""
        pdf, _ = _interleaved_slices(60, 1)
        dup_text = "curso de programación java y web"
        import pandas as pd

        extra = pd.DataFrame(
            {
                "url": ["zz-b-second", "zz-a-first"],
                "text": [dup_text, dup_text],
                "lang": ["es", "es"],
            }
        )
        out = str(tmp_path / "tie")
        build_index(spark, _df(spark, pdf), out, num_partitions=2)
        append_index(spark, _df(spark, extra.iloc[[0]]), out,
                     num_partitions=1)
        append_index(spark, _df(spark, extra.iloc[[1]]), out,
                     num_partitions=1)
        idx = SearchIndex(spark, out)
        pre = [r["url"] for r in idx.search(dup_text, "bm25", k=5).collect()
               if r["url"].startswith("zz-")]
        assert pre == ["zz-a-first", "zz-b-second"]  # url re-tiebreak
        compact_index(spark, out, num_partitions=2)
        idx2 = SearchIndex(spark, out)
        post = [r["url"]
                for r in idx2.search(dup_text, "bm25", k=5).collect()
                if r["url"].startswith("zz-")]
        assert post == ["zz-a-first", "zz-b-second"]  # url order

    def test_raw_preserved(self, spark, tmp_path):
        pdf, slices = _interleaved_slices(90, 3)
        out = _appended_index(spark, tmp_path, "raw", slices,
                              store_raw=True)
        compact_index(spark, out, num_partitions=2)
        idx = SearchIndex(spark, out)
        assert idx.has_raw
        rows = idx.search("curso", "bm25", k=5, include_raw=True).collect()
        assert rows
        text_of = dict(zip(pdf["url"], pdf["text"]))
        for r in rows:
            assert r["raw"] == text_of[r["url"]]

    def test_chunked_encode_parity(self, spark, tmp_path):
        """flush_docs far below the corpus size forces multiple docid-chunk
        segments per (term, bucket); results must be unchanged."""
        pdf, slices = _interleaved_slices(150, 3)
        out = _appended_index(spark, tmp_path, "chunked", slices)
        compact_index(spark, out, num_partitions=2, flush_docs=40)
        idx = SearchIndex(spark, out)
        segs = (
            idx._postings.groupBy("term", "bucket").count()
            .filter("count > 1").count()
        )
        assert segs > 0  # the chunk path actually ran
        oracle = OracleIndex()
        for r in pdf.sort_values("url").itertuples():
            oracle.put(r.url, r.text)
        for q in QUERIES:
            got = [(r["url"], r["score"])
                   for r in idx.search(q, "bm25", k=10).collect()]
            exp = oracle.bm25_search(q, k=10)
            assert [u for u, _ in got] == [u for u, _ in exp], q

    def test_stale_staging_cleared(self, spark, tmp_path):
        pdf, slices = _interleaved_slices(60, 2)
        out = _appended_index(spark, tmp_path, "stale", slices)
        stale = os.path.join(out, "_compact_tmp")
        os.makedirs(os.path.join(stale, "data"))
        with open(os.path.join(stale, "data", "junk"), "w") as f:
            f.write("crashed run leftovers")
        compact_index(spark, out, num_partitions=2)
        assert not os.path.exists(stale)
        urls = [u for _, u, _ in _docmap_rows(spark, out)]
        assert urls == sorted(urls)


class TestCompactStreamingInterplay:
    def test_stream_epoch_ledger_survives_compaction(self, spark, tmp_path):
        """Compaction must carry the streaming epoch ledger
        (stream_epochs.json) across the _manifests swap: a restarted stream
        replays its last epoch, and a lost ledger would re-ingest it as a
        duplicate batch."""
        from visigoth_spark.streaming import foreach_batch_indexer

        pdf = generate_corpus(120).sort_values("url").reset_index(drop=True)
        p1, p2 = pdf.iloc[:80], pdf.iloc[80:]
        out = str(tmp_path / "sidx")
        fn = foreach_batch_indexer(out, num_partitions=2)
        fn(_df(spark, p1), epoch_id=0)
        fn(_df(spark, p2), epoch_id=1)
        compact_index(spark, out, num_partitions=2)
        st = load_stats(out)
        assert st["n_docs"] == 120 and st["n_batches"] == 1

        fn(_df(spark, p2), epoch_id=1)  # checkpoint replay after compaction
        st = load_stats(out)
        assert st["n_docs"] == 120 and st["n_batches"] == 1  # skipped

        fn(_df(spark, p2.iloc[:20]), epoch_id=2)  # stream continues
        st = load_stats(out)
        assert st["n_docs"] == 140 and st["n_batches"] == 2

    def test_orphan_batch_excluded_from_compaction(self, spark, tmp_path):
        """A crashed append leaves a batch dir with no manifest (healed by
        the next append's overwrite). Compaction must fold only COMMITTED
        batches — folding the orphan would make the uncommitted ingest
        permanent and duplicate its docid range."""
        import shutil

        pdf, slices = _interleaved_slices(120, 2)
        out = _appended_index(spark, tmp_path, "orph", slices)
        src = os.path.join(out, "data", "batch=1")
        shutil.copytree(src, os.path.join(out, "data", "batch=9"))
        compact_index(spark, out, num_partitions=2)
        st = load_stats(out)
        assert st["n_docs"] == 120
        rows = _docmap_rows(spark, out)
        assert len(rows) == 120
        assert [d for d, _, _ in rows] == list(range(120))
        assert sorted(u for _, u, _ in rows) == sorted(pdf["url"])


class TestFileLevelTermPruning:
    """compact_index writes _manifests/segfiles.json (per-file term
    ranges); SearchIndex._seg_scan enumerates only covering files. The
    pruned plan must be invisible semantically: same results as the full
    hive scan, and appends must invalidate the manifest."""

    def test_manifest_written_and_results_identical(self, spark, tmp_path):
        pdf, slices = _interleaved_slices(150, 3)
        out = _appended_index(spark, tmp_path, "fp", slices)
        compact_index(spark, out, num_partitions=4)
        mpath = os.path.join(out, "_manifests", "segfiles.json")
        assert os.path.exists(mpath)
        idx = SearchIndex(spark, out)
        assert idx._segfiles is not None and len(idx._segfiles) >= 2
        # disjoint, ordered file ranges
        ordered = sorted(idx._segfiles, key=lambda e: e["term_min"])
        for a, b in zip(ordered, ordered[1:]):
            assert a["term_max"] <= b["term_min"]
        pruned = {}
        for q in QUERIES:
            pruned[q] = [(r["url"], r["score"], r["hits"]) for r in
                         idx.search(q, "bm25", k=10).collect()]
        os.remove(mpath)
        full = SearchIndex(spark, out)
        assert full._segfiles is None
        for q in QUERIES:
            got = [(r["url"], r["score"], r["hits"]) for r in
                   full.search(q, "bm25", k=10).collect()]
            assert got == pruned[q], q

    def test_all_terms_outside_ranges_returns_empty(self, spark, tmp_path):
        pdf, slices = _interleaved_slices(60, 2)
        out = _appended_index(spark, tmp_path, "fp2", slices)
        compact_index(spark, out, num_partitions=2)
        idx = SearchIndex(spark, out)
        # 'ÿÿÿÿ' (U+00FF) sorts after every fixture term — including
        # 'über' (ü = U+00FC > 'z') -> zero files selected
        assert idx._seg_scan(["ÿÿÿÿ"]) is None
        assert idx.search("ÿÿÿÿ", "hits", k=10).count() == 0

    def test_append_maintains_manifest(self, spark, tmp_path):
        """An append EXTENDS the file-range manifest with its own batch's
        file ranges (it used to delete it, costing file-level pruning
        until the next merge/compact): the appended doc's never-seen term
        must be findable through the maintained manifest, and the old
        batches keep their tight pruning entries."""
        import json

        import pandas as pd

        pdf, slices = _interleaved_slices(60, 2)
        out = _appended_index(spark, tmp_path, "fp3", slices)
        compact_index(spark, out, num_partitions=2)
        mpath = os.path.join(out, "_manifests", "segfiles.json")
        with open(mpath) as f:
            before = json.load(f)["files"]
        extra = pd.DataFrame({
            "url": ["zz-new-doc"],
            "text": ["palabrarara inventada"],
            "lang": ["es"],
        })
        append_index(spark, _df(spark, extra), out, num_partitions=1)
        assert os.path.exists(mpath)
        with open(mpath) as f:
            after = json.load(f)["files"]
        new_entries = [e for e in after
                       if e["path"].startswith("data/batch=1/")]
        assert len(after) == len(before) + len(new_entries) > len(before)
        idx = SearchIndex(spark, out)
        assert idx._segfiles is not None  # pruning still live
        got = [r["url"] for r in
               idx.search("palabrarara", "bm25", k=5).collect()]
        assert got == ["zz-new-doc"]
        # the correctness-critical direction: the appended batch's files
        # are ADMITTED for its own (stemmed) term (compacted batch-0 files
        # may legitimately also be admitted — their lexicographic ranges
        # tile the whole vocabulary)
        from visigoth_spark.analysis import analyze_text

        stem = analyze_text("palabrarara", idx.analyzer)[0]
        pruned = idx._seg_prune.prune([stem])
        assert any(p.startswith("data/batch=1/") for p in pruned)

    def test_search_many_pruned_parity(self, spark, tmp_path):
        pdf, slices = _interleaved_slices(90, 3)
        out = _appended_index(spark, tmp_path, "fp4", slices)
        compact_index(spark, out, num_partitions=3)
        idx = SearchIndex(spark, out)
        assert idx._segfiles is not None
        batch = idx.search_many(QUERIES, "bm25", k=10).collect()
        singles = []
        for qid, q in enumerate(QUERIES):
            for r in idx.search(q, "bm25", k=10).collect():
                singles.append((qid, r["url"], r["score"], r["hits"]))
        got = [(r["qid"], r["url"], r["score"], r["hits"]) for r in batch]
        assert got == singles


class TestDocfilesHydrationPruning:
    """compact_index writes _manifests/docfiles.json (per-docmap-file docid
    ranges); _docmap_for opens only covering files. Must be semantically
    invisible, and appends must invalidate it."""

    def test_hydration_identical_with_and_without_manifest(
        self, spark, tmp_path
    ):
        pdf, slices = _interleaved_slices(120, 3)
        out = _appended_index(spark, tmp_path, "df1", slices,
                              store_raw=True)
        compact_index(spark, out, num_partitions=3)
        mpath = os.path.join(out, "_manifests", "docfiles.json")
        assert os.path.exists(mpath)
        idx = SearchIndex(spark, out)
        assert idx._docfiles is not None
        ids = [0, 7, 59, 119]
        fast = idx._docmap_for(ids, with_raw=True)
        assert set(fast) == set(ids)
        os.remove(mpath)
        slow = SearchIndex(spark, out)._docmap_for(ids, with_raw=True)
        assert fast == slow
        # raw round-trips through the pruned read
        urls = {u: r for u, r in
                zip(pdf["url"], pdf["text"])}
        for d, (u, raw) in fast.items():
            assert raw == urls[u]

    def test_append_maintains_docfiles(self, spark, tmp_path):
        """Appends now EXTEND docfiles.json with their own batch's docid
        ranges (they used to delete it): hydration of an appended docid
        must work through the maintained manifest."""
        import json

        import pandas as pd

        pdf, slices = _interleaved_slices(60, 2)
        out = _appended_index(spark, tmp_path, "df2", slices)
        compact_index(spark, out, num_partitions=2)
        mpath = os.path.join(out, "_manifests", "docfiles.json")
        assert os.path.exists(mpath)
        extra = pd.DataFrame({
            "url": ["zz-df-new"], "text": ["palabrota nueva"],
            "lang": ["es"],
        })
        append_index(spark, _df(spark, extra), out, num_partitions=1)
        assert os.path.exists(mpath)
        with open(mpath) as f:
            files = json.load(f)["files"]
        assert any(e["path"].startswith("data/batch=1/") for e in files)
        idx = SearchIndex(spark, out)
        assert idx._docfiles is not None
        # docid 60 = the appended doc; admitted by the maintained ranges
        pruned = idx._doc_prune.prune([60])
        assert any(p.startswith("data/batch=1/") for p in pruned)
        got = idx._docmap_for([60])
        assert got[60][0] == "zz-df-new"


class TestManifestSupersetVisibility:
    """The file-range manifests are maintained as a SUPERSET of the visible
    files (extended before each op's commit point); batch-visibility
    filtering at index open is what keeps that safe across crashes."""

    def test_orphan_batch_entries_are_filtered(self, spark, tmp_path):
        """Crash after the segfiles extension but before the batch commit:
        the manifest carries entries for an invisible batch. A reader must
        neither plan those files nor surface the orphan's docs."""
        import json

        import pandas as pd

        pdf, slices = _interleaved_slices(60, 2)
        out = _appended_index(spark, tmp_path, "sv1", slices)
        compact_index(spark, out, num_partitions=2)
        extra = pd.DataFrame({
            "url": ["zz-orphan"], "text": ["fantasma palabra"],
            "lang": ["es"],
        })
        append_index(spark, _df(spark, extra), out, num_partitions=1)
        # simulate the crash: batch manifest gone, segfiles extension kept
        os.remove(os.path.join(out, "_manifests", "batch_1.json"))
        with open(os.path.join(out, "_manifests", "segfiles.json")) as f:
            raw = json.load(f)["files"]
        assert any(e["path"].startswith("data/batch=1/") for e in raw)
        idx = SearchIndex(spark, out)
        # visibility filter dropped the orphan's entries...
        assert all(not e["path"].startswith("data/batch=1/")
                   for e in idx._segfiles)
        assert all(not e["path"].startswith("data/batch=1/")
                   for e in idx._docfiles)
        # ...so the orphan doc is invisible and other queries still work
        assert idx.search("fantasma", "bm25", k=5).count() == 0
        assert idx.search("curso", "bm25", k=5).count() > 0

    def test_replayed_append_replaces_entries(self, spark, tmp_path):
        """A replayed append (pinned batch id) rewrites its batch dir with
        fresh file names; the manifest extension must REPLACE the batch's
        old entries — every planned path must exist on disk."""
        import json

        import pandas as pd

        pdf, slices = _interleaved_slices(60, 2)
        out = _appended_index(spark, tmp_path, "sv2", slices)
        compact_index(spark, out, num_partitions=2)
        extra = pd.DataFrame({
            "url": ["zz-replay"], "text": ["replay documento unico"],
            "lang": ["es"],
        })
        kw = dict(num_partitions=1, batch_id=1, base_docid=60,
                  bucket_base=load_stats(out)["n_buckets"])
        append_index(spark, _df(spark, extra), out, **kw)
        append_index(spark, _df(spark, extra), out, **kw)  # replay
        with open(os.path.join(out, "_manifests", "segfiles.json")) as f:
            files = json.load(f)["files"]
        b1 = [e["path"] for e in files
              if e["path"].startswith("data/batch=1/")]
        assert b1, "replayed batch entries present"
        for p in b1:
            assert os.path.exists(os.path.join(out, p)), p
        idx = SearchIndex(spark, out)
        got = [r["url"] for r in
               idx.search("replay", "bm25", k=5).collect()]
        assert got == ["zz-replay"]
        assert load_stats(out)["n_docs"] == 61


class TestPreCompactRecovery:
    """A crash inside the in-place swap leaves _pre_compact holding the
    old index; the next compact_index must auto-restore and complete."""

    def _build(self, spark, tmp_path, name):
        pdf, slices = _interleaved_slices(90, 3)
        out = _appended_index(spark, tmp_path, name, slices)
        return pdf, out

    def _oracle_check(self, spark, pdf, out):
        oracle = OracleIndex()
        for r in pdf.sort_values("url").itertuples():
            oracle.put(r.url, r.text)
        idx = SearchIndex(spark, out)
        got = [(r["url"], r["score"])
               for r in idx.search("curso java", "bm25", k=10).collect()]
        exp = oracle.bm25_search("curso java", k=10)
        assert [u for u, _ in got] == [u for u, _ in exp]

    def test_phase1_crash_recovered(self, spark, tmp_path):
        """Crash while parking the old index: some pieces moved to
        _pre_compact, none of the staged ones moved in."""
        import shutil

        pdf, out = self._build(spark, tmp_path, "p1")
        pre = os.path.join(out, "_pre_compact")
        os.makedirs(pre)
        for piece in ("data", "termdict"):
            shutil.move(os.path.join(out, piece),
                        os.path.join(pre, piece))
        # index root is now unreadable (no data/) — recovery + compaction
        compact_index(spark, out, num_partitions=2)
        assert not os.path.exists(pre)
        assert load_stats(out)["n_batches"] == 1
        self._oracle_check(spark, pdf, out)

    def test_phase2_crash_recovered(self, spark, tmp_path):
        """Crash while moving staged pieces in: _pre_compact holds ALL old
        pieces, the root holds a mixed set (one staged piece made it)."""
        import shutil

        pdf, out = self._build(spark, tmp_path, "p2")
        pre = os.path.join(out, "_pre_compact")
        os.makedirs(pre)
        for piece in ("data", "termdict", "_manifests", "stats.json"):
            shutil.move(os.path.join(out, piece), os.path.join(pre, piece))
        # fake a new-generation piece that made it to the root
        os.makedirs(os.path.join(out, "data"))
        with open(os.path.join(out, "data", "_marker"), "w") as f:
            f.write("staged-generation")
        compact_index(spark, out, num_partitions=2)
        assert not os.path.exists(pre)
        assert not os.path.exists(os.path.join(out, "data", "_marker"))
        assert load_stats(out)["n_batches"] == 1
        self._oracle_check(spark, pdf, out)

    def test_completed_swap_leftover_preserves_later_appends(
            self, spark, tmp_path):
        """Crash AFTER the swap finished but BEFORE _pre_compact was
        deleted: the root is the live new generation, and batches appended
        after that crash live only in the new data/_manifests. The next
        compaction must treat _pre_compact as a finished swap's leftover
        (all pieces present at the root) and DELETE it — restoring it
        would silently destroy the post-crash appends."""
        from visigoth_spark import storage as vstore
        from visigoth_spark.build import _COMPACT_PIECES

        pdf, out = self._build(spark, tmp_path, "done")
        # first compaction, crashing at the final rmtree(_pre_compact):
        # the old generation stays parked while the root is fully swapped
        real_rmtree = vstore.LocalStore.rmtree
        def crashing_rmtree(self_, path):
            if path.endswith("_pre_compact"):
                raise RuntimeError("injected crash before cleanup")
            real_rmtree(self_, path)
        vstore.LocalStore.rmtree = crashing_rmtree
        try:
            with pytest.raises(RuntimeError, match="injected crash"):
                compact_index(spark, out, num_partitions=2)
        finally:
            vstore.LocalStore.rmtree = real_rmtree
        pre = os.path.join(out, "_pre_compact")
        assert os.path.exists(pre)
        for piece in _COMPACT_PIECES:
            assert os.path.exists(os.path.join(out, piece))
        # the crashed run's writer lock is a dead-pid leftover in-process
        # (same pid, still alive) — clear it like an operator would
        lock = os.path.join(out, "WRITER_LOCK")
        if os.path.exists(lock):
            os.remove(lock)
        # post-crash append: committed only in the NEW generation
        extra = generate_corpus(8, seed=777)
        extra = extra.assign(url="zz-postcrash-" + extra["url"],
                             text=extra["text"] + " postcrash")
        append_index(spark, _df(spark, extra), out, num_partitions=1)
        n_after = load_stats(out)["n_docs"]
        # second compaction: must NOT roll back to _pre_compact
        compact_index(spark, out, num_partitions=2)
        assert not os.path.exists(pre)
        assert load_stats(out)["n_docs"] == n_after
        idx = SearchIndex(spark, out)
        got = [r["url"] for r in
               idx.search("postcrash", "linear", k=None).collect()]
        assert len(got) == 8 and all(u.startswith("zz-postcrash-")
                                     for u in got)
        self._oracle_check_with_extra(spark, pdf, extra, out)

    def _oracle_check_with_extra(self, spark, pdf, extra, out):
        import pandas as pd

        oracle = OracleIndex()
        both = pd.concat([pdf, extra], ignore_index=True)
        for r in both.sort_values("url").itertuples():
            oracle.put(r.url, r.text)
        idx = SearchIndex(spark, out)
        got = [(r["url"], r["score"])
               for r in idx.search("curso java", "bm25", k=10).collect()]
        exp = oracle.bm25_search("curso java", k=10)
        assert [u for u, _ in got] == [u for u, _ in exp]
