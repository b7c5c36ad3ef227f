"""Tiered (minor) compaction (build.merge_appends) and the manifest-driven
batch-visibility model it rests on.

merge_appends is a FILE-LAYOUT rewrite: appended batches collapse into one
term-range-partitioned tier with docids, buckets, blobs, and therefore
scores and result order byte-identical to the pre-merge index (unlike
compact_index, which remaps docids to url order). Visibility is flipped by
ONE atomic manifest write carrying ``replaces=[...]``; orphan dirs and
half-GC'd replaced batches must be invisible to queries, stats, and the
termdict refresh."""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pytest

from visigoth_spark.build import (
    _visible_batches,
    append_index,
    build_index,
    compact_index,
    gc_index,
    load_stats,
    merge_appends,
)
from visigoth_spark.corpus import generate_corpus
from visigoth_spark.query import SearchIndex

QUERIES = ["curso", "programación java", "java java", "web curso gratis"]


def _df(spark, pdf):
    return spark.createDataFrame(pdf[["url", "text", "lang"]])


def _slices(n=150, parts=3):
    pdf = generate_corpus(n).sort_values("url").reset_index(drop=True)
    return pdf, [pdf.iloc[i::parts] for i in range(parts)]


def _appended(spark, tmp_path, name, slices, **kw):
    out = str(tmp_path / name)
    build_index(spark, _df(spark, slices[0]), out, num_partitions=3, **kw)
    for s in slices[1:]:
        append_index(spark, _df(spark, s), out, num_partitions=2, **kw)
    return out


def _results(idx, engine="bm25"):
    out = {}
    for q in QUERIES:
        out[q] = [(r["url"], r["docid"], round(float(r["score"]), 12),
                   r["hits"]) for r in idx.search(q, engine, k=10).collect()]
    return out


def _batch_dirs(out):
    return sorted(d for d in os.listdir(os.path.join(out, "data"))
                  if d.startswith("batch="))


class TestMergeIdentity:
    @pytest.fixture(scope="class")
    def built(self, spark, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("merge")
        pdf, slices = _slices(150, 3)
        out = _appended(spark, tmp, "idx", slices)
        idx_before = SearchIndex(spark, out)
        before = {
            "bm25": _results(idx_before, "bm25"),
            "hits": _results(idx_before, "hits"),
            "stats": load_stats(out),
            "docmap": [
                (r["docid"], r["url"], r["doclen"]) for r in
                idx_before._docmap.orderBy("docid").collect()
            ],
        }
        m = merge_appends(spark, out, num_partitions=3)
        return out, before, m

    def test_results_byte_identical(self, spark, built):
        out, before, m = built
        assert m is not None
        idx = SearchIndex(spark, out)
        assert _results(idx, "bm25") == before["bm25"]
        assert _results(idx, "hits") == before["hits"]

    def test_docmap_identical_and_docids_unchanged(self, spark, built):
        out, before, _ = built
        idx = SearchIndex(spark, out)
        got = [(r["docid"], r["url"], r["doclen"]) for r in
               idx._docmap.orderBy("docid").collect()]
        assert got == before["docmap"]

    def test_replaced_batches_gcd_single_tier_remains(self, spark, built):
        out, before, _ = built
        # base batch 0 + ONE merged tier; appended dirs gone
        assert _batch_dirs(out) == ["batch=0", "batch=3"]
        vis = _visible_batches(out)
        assert [m["batch"] for m in vis] == [0, 3]
        merged = vis[1]
        assert merged["merged"] is True and merged["replaces"] == [1, 2]

    def test_stats_conserved(self, spark, built):
        out, before, _ = built
        st = load_stats(out)
        for k in ("n_docs", "total_tokens", "n_postings", "bytes_blob",
                  "avgdl"):
            assert st[k] == before["stats"][k], k
        assert st["n_batches"] == 2

    def test_segfiles_covers_whole_index(self, spark, built):
        out, _, _ = built
        with open(os.path.join(out, "_manifests", "segfiles.json")) as f:
            files = json.load(f)["files"]
        assert any(e["path"].startswith("data/batch=0/") for e in files)
        assert any(e["path"].startswith("data/batch=3/") for e in files)
        idx = SearchIndex(spark, out)
        assert idx._segfiles is not None

    def test_full_compact_after_merge(self, spark, built, tmp_path):
        # compact a COPY (this fixture is class-shared); docids are
        # remapped to url order by the major compaction, so compare
        # (url, score, hits) only
        out, before, _ = built
        copy = str(tmp_path / "compacted")
        shutil.copytree(out, copy)
        compact_index(spark, copy, num_partitions=4)
        idx = SearchIndex(spark, copy)
        for q in QUERIES:
            got = [(r["url"], round(float(r["score"]), 12), r["hits"])
                   for r in idx.search(q, "bm25", k=10).collect()]
            want = [(u, s, h) for u, _d, s, h in before["bm25"][q]]
            assert got == want, q

    def test_append_after_merge_continues_allocation(self, spark, built):
        # LAST in the class: mutates the shared index
        out, before, _ = built
        extra = pd.DataFrame({
            "url": ["zz-post-merge"],
            "text": ["palabrunica inventada"],
            "lang": ["es"],
        })
        append_index(spark, _df(spark, extra), out, num_partitions=1)
        idx = SearchIndex(spark, out)
        assert len(idx) == before["stats"]["n_docs"] + 1
        got = [(r["url"], r["docid"]) for r in
               idx.search("palabrunica", "bm25", k=5).collect()]
        assert got == [("zz-post-merge", before["stats"]["n_docs"])]
        # hits scores are idf-free (pure hit counts), and the new doc has
        # the largest docid with zero hits on the old queries — the old
        # hits results must be EXACTLY unchanged by the append
        assert _results(idx, "hits") == before["hits"]


class TestVisibilityModel:
    def test_orphan_batch_invisible_to_queries(self, spark, tmp_path):
        """A crashed append (batch dir present, manifest absent) must not
        leak postings into results, stats refreshes, or hydration."""
        pdf, slices = _slices(60, 2)
        out = _appended(spark, tmp_path, "vis", slices)
        # simulate the crash: append, then delete the manifest
        ghost = pd.DataFrame({
            "url": ["gg-ghost"], "text": ["fantasmagoria espectral"],
            "lang": ["es"],
        })
        append_index(spark, _df(spark, ghost), out, num_partitions=1)
        os.remove(os.path.join(out, "_manifests", "batch_2.json"))
        idx = SearchIndex(spark, out)
        assert idx._batches == [0, 1]
        assert idx.search("fantasmagoria", "bm25", k=5).count() == 0
        assert idx.search("fantasmagoria", "hits", k=5).count() == 0

    def test_uncommitted_merge_dir_invisible(self, spark, tmp_path):
        """A merge that crashed before its manifest commit leaves the
        merged dir inert: results unchanged, and the next merge reclaims
        the batch id."""
        pdf, slices = _slices(90, 3)
        out = _appended(spark, tmp_path, "vis2", slices)
        before = _results(SearchIndex(spark, out))
        # hand-craft the crash: a merged-tier dir at the id the next merge
        # will claim (batch=3), with NO manifest
        data = os.path.join(out, "data")
        shutil.copytree(os.path.join(data, "batch=1"),
                        os.path.join(data, "batch=3"))
        idx = SearchIndex(spark, out)
        assert idx._batches == [0, 1, 2]
        assert _results(idx) == before
        # the real merge now reclaims batch id 3 and overwrites the orphan
        m = merge_appends(spark, out, num_partitions=2)
        assert m is not None
        idx2 = SearchIndex(spark, out)
        assert [mm["batch"] for mm in _visible_batches(out)] == [0, 3]
        assert _results(idx2) == before

    def test_half_gcd_replaced_manifest_stays_hidden(self, spark, tmp_path):
        """Crash AFTER the merge manifest commit but BEFORE GC: the
        replaced batches' manifests and dirs still exist, yet queries and
        stats must not double-count them."""
        pdf, slices = _slices(90, 3)
        out = _appended(spark, tmp_path, "vis3", slices)
        before = _results(SearchIndex(spark, out))
        n_docs = load_stats(out)["n_docs"]
        # snapshot the replaced state so we can resurrect it post-GC
        mdir = os.path.join(out, "_manifests")
        data = os.path.join(out, "data")
        saved = {}
        for b in (1, 2):
            with open(os.path.join(mdir, f"batch_{b}.json")) as f:
                saved[b] = f.read()
            shutil.copytree(os.path.join(data, f"batch={b}"),
                            str(tmp_path / f"save_batch_{b}"))
        merge_appends(spark, out, num_partitions=2)
        # resurrect: replaced manifests + dirs back on disk
        for b in (1, 2):
            with open(os.path.join(mdir, f"batch_{b}.json"), "w") as f:
                f.write(saved[b])
            shutil.copytree(str(tmp_path / f"save_batch_{b}"),
                            os.path.join(data, f"batch={b}"))
        vis = _visible_batches(out)
        assert [m["batch"] for m in vis] == [0, 3]
        idx = SearchIndex(spark, out)
        assert idx._batches == [0, 3]
        assert _results(idx) == before
        # an append in this state must not double-count the resurrected
        # batches in its stats/termdict refresh
        extra = pd.DataFrame({
            "url": ["zz-late"], "text": ["palabrarisima nueva"],
            "lang": ["es"],
        })
        append_index(spark, _df(spark, extra), out, num_partitions=1)
        assert load_stats(out)["n_docs"] == n_docs + 1

    def test_merge_below_min_batches_is_noop(self, spark, tmp_path):
        pdf, slices = _slices(40, 2)
        out = _appended(spark, tmp_path, "vis4", slices)
        assert merge_appends(spark, out, min_batches=3) is None
        assert _batch_dirs(out) == ["batch=0", "batch=1"]

    def test_merge_respects_stream_epoch_allocation(self, spark, tmp_path):
        """A stream epoch that durably allocated batch id N must keep it:
        the merge takes N+1, so the epoch's replay cannot overwrite the
        merged tier."""
        pdf, slices = _slices(60, 3)
        out = _appended(spark, tmp_path, "vis5", slices)
        ledger = os.path.join(out, "_manifests", "stream_epochs.json")
        with open(ledger, "w") as f:
            json.dump({"7": {"state": "allocated", "batch": 3,
                             "base_docid": 60, "bucket_base": 9}}, f)
        merge_appends(spark, out, num_partitions=2)
        assert [m["batch"] for m in _visible_batches(out)] == [0, 4]

    def test_merge_twice_is_tiered(self, spark, tmp_path):
        """append after a merge, merge again: the second merge folds the
        previous tier + the new append into a fresh single tier."""
        pdf, slices = _slices(90, 3)
        out = _appended(spark, tmp_path, "vis6", slices)
        merge_appends(spark, out, num_partitions=2)
        extra = generate_corpus(110).sort_values("url").iloc[90:]
        append_index(spark, _df(spark, extra), out, num_partitions=2)
        before = _results(SearchIndex(spark, out))
        m = merge_appends(spark, out, num_partitions=2, min_batches=2)
        assert m is not None
        assert [mm["batch"] for mm in _visible_batches(out)] == [0, 5]
        assert _results(SearchIndex(spark, out)) == before


class TestMergeEdgeCases:
    def test_zero_token_appended_batch_merges(self, spark, tmp_path):
        """An appended batch whose docs all analyze to ZERO tokens writes
        only kind=d; the merge must carry its docmap rows, skip its absent
        segment dir, and keep every search/hydration contract."""
        pdf, slices = _slices(60, 2)
        out = _appended(spark, tmp_path, "zt", slices)
        punct = pd.DataFrame({
            "url": [f"zz-punct-{i}" for i in range(3)],
            "text": ["!!! ... ???", "---", "¡¿"],
            "lang": ["es"] * 3,
        })
        append_index(spark, _df(spark, punct), out, num_partitions=1)
        before = _results(SearchIndex(spark, out))
        n_docs = load_stats(out)["n_docs"]
        m = merge_appends(spark, out, num_partitions=2)
        assert m is not None
        idx = SearchIndex(spark, out)
        assert len(idx) == n_docs == 63
        assert _results(idx) == before
        # zero-token docs are hydratable (docmap carried through the merge)
        got = idx._docmap_for([60, 61, 62])
        assert sorted(u for u, _ in got.values()) == sorted(punct["url"])
        # and the docfiles manifest covers them
        assert idx._docfiles is not None
        assert any(e["docid_max"] is not None and e["docid_max"] >= 62
                   for e in idx._docfiles)


    def test_deferred_gc_snapshot_isolation(self, spark, tmp_path):
        """merge_appends(gc=False) keeps the replaced batches on disk:
        a reader constructed BEFORE the merge keeps serving its snapshot
        (its planned paths still resolve), a reader constructed after sees
        only the merged tier, and gc_index reclaims the leftovers."""
        pdf, slices = _slices(90, 3)
        out = _appended(spark, tmp_path, "gcd", slices)
        old_reader = SearchIndex(spark, out)
        before = _results(old_reader)
        m = merge_appends(spark, out, num_partitions=2, gc=False)
        assert m is not None
        # replaced manifests + dirs retained
        assert _batch_dirs(out) == ["batch=0", "batch=1", "batch=2",
                                    "batch=3"]
        assert os.path.exists(
            os.path.join(out, "_manifests", "batch_1.json"))
        # old reader: same snapshot, still fully functional
        assert old_reader._batches == [0, 1, 2]
        assert _results(old_reader) == before
        # new reader: merged view, same results
        fresh = SearchIndex(spark, out)
        assert fresh._batches == [0, 3]
        assert _results(fresh) == before
        # reclaim
        assert gc_index(out) == [1, 2]
        assert _batch_dirs(out) == ["batch=0", "batch=3"]
        assert gc_index(out) == []  # idempotent
        assert _results(SearchIndex(spark, out)) == before


def test_half_written_manifests_regenerated_by_next_merge(spark, tmp_path):
    """A crash between the first merge's segfiles and docfiles writes
    leaves only segfiles.json; the next merge must detect the incomplete
    pair and regenerate BOTH (had_manifest requires both), not strand the
    hydration manifest forever."""
    pdf = generate_corpus(160).sort_values("url").reset_index(drop=True)
    out = str(tmp_path / "hm")
    build_index(spark, _df(spark, pdf.iloc[:80]), out, num_partitions=2)
    for lo, hi in ((80, 120), (120, 160)):
        append_index(spark, _df(spark, pdf.iloc[lo:hi]), out,
                     num_partitions=1)
    merge_appends(spark, out, num_partitions=2)
    # simulate the crashed first sweep: docfiles gone, segfiles kept
    os.remove(os.path.join(out, "_manifests", "docfiles.json"))
    extra = generate_corpus(30, seed=5)
    extra["url"] = "hm-" + extra["url"]
    for half in (extra.iloc[:15], extra.iloc[15:]):
        append_index(spark, _df(spark, half), out, num_partitions=1)
    merge_appends(spark, out, num_partitions=2)
    for mf in ("segfiles.json", "docfiles.json"):
        assert os.path.exists(os.path.join(out, "_manifests", mf)), mf
    idx = SearchIndex(spark, out)
    assert idx._docfiles is not None
    assert idx.search("curso", "bm25", 10).count() > 0
