"""Physical-plan regression guards: the pruning PLANS.md documents must
stay in the plan. These catch silent regressions (a refactor that widens
ReadSchema, drops the pushed term filter, or loses the kind partition
filter) that correctness tests cannot see — the results stay right while
the 100-TB scan cost explodes."""

from __future__ import annotations

import pytest

from visigoth_spark.build import build_index, compact_index
from visigoth_spark.corpus import generate_corpus
from visigoth_spark.query import SearchIndex


def _df(spark, pdf):
    return spark.createDataFrame(pdf[["url", "text", "lang"]])


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def built_idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("plans") / "idx")
    build_index(spark, _df(spark, generate_corpus(150)), out,
                num_partitions=2)
    return out


class TestScanPruning:
    def test_postings_scan_pushdown(self, spark, built_idx):
        """Query-term filter pushed to parquet; docmap files never in the
        scan (the manifest-pruned path enumerates kind=s files only); no
        docmap columns in the postings ReadSchema."""
        idx = SearchIndex(spark, built_idx)
        plan = _plan(idx._seg_scan(["curs", "jav"]))
        assert "PushedFilters" in plan
        assert "In(term" in plan or "in(term" in plan.lower()
        # fresh builds now plan from the segfiles manifest: the scan
        # location lists segment files explicitly — docmap files are
        # structurally excluded (stronger than the old kind partition
        # filter, which still listed every file)
        assert "kind=s" in plan and "kind=d" not in plan
        # column pruning: the postings scan must not read docmap columns
        read_schema = [ln for ln in plan.splitlines()
                       if "ReadSchema" in ln]
        assert read_schema and "url" not in read_schema[0]
        assert "doclen" not in read_schema[0]

    def test_fresh_build_prunes_files_before_any_maintenance(
            self, spark, built_idx):
        """A NEVER-merged, never-compacted index already has file-level
        pruning: build_index finalizes each batch's segments term-range
        partitioned and writes segfiles/docfiles.json (r3 gap — fresh
        indexes scheduled one split per corpus partition per query until
        their first maintenance op)."""
        idx = SearchIndex(spark, built_idx)
        assert idx._segfiles and idx._docfiles  # written at build time
        pruned = idx._seg_prune.prune(["curs"])
        assert pruned is not None
        assert 0 < len(pruned) < len(idx._segfiles)
        # docid hydration pruning too: one result id opens ~1 docmap file
        some_docid = idx.search("curso", "bm25", k=1).collect()[0]["docid"]
        dpruned = idx._doc_prune.prune([int(some_docid)])
        assert dpruned is not None
        assert 0 < len(dpruned) < max(2, len(idx._docfiles))

    def test_compacted_scan_uses_file_manifest(self, spark, built_idx,
                                               tmp_path):
        """After compaction the planner enumerates only term-covering
        files (segfiles manifest) — and still pushes the term filter."""
        import shutil

        out = str(tmp_path / "cidx")
        shutil.copytree(built_idx, out)
        compact_index(spark, out, num_partitions=2)
        idx = SearchIndex(spark, out)
        assert idx._segfiles  # manifest written
        pruned = idx._seg_prune.prune(["curs"])
        assert pruned is not None and 0 < len(pruned) < len(idx._segfiles)
        plan = _plan(idx._seg_scan(["curs"]))
        # single-term isin folds to EqualTo; either way it must be PUSHED
        assert "PushedFilters" in plan
        assert "In(term" in plan or "EqualTo(term,curs)" in plan
        # and the scan location lists ONLY the manifest-pruned file(s)
        assert plan.count(".parquet") >= 1

    def test_match_all_reads_docmap_only(self, spark, built_idx):
        """noop_all scans kind=d only (partition filter), never postings
        blobs."""
        idx = SearchIndex(spark, built_idx)
        plan = _plan(idx._docmap)
        assert "kind" in plan
        read_schema = [ln for ln in plan.splitlines()
                       if "ReadSchema" in ln]
        assert read_schema and "blob" not in read_schema[0]

    def test_build_corpus_scan_prunes_html(self, spark, tmp_path):
        """The build's corpus projection must push column pruning to the
        scan — html (the dominant column) never read when text exists."""
        from visigoth_spark.build import _ranged_corpus

        pdf = generate_corpus(50)
        pdf["html"] = "<html>" + pdf["text"] + "</html>"
        pdf["warc_ts"] = "2025-01-01"
        src = str(tmp_path / "corpus.parquet")
        spark.createDataFrame(
            pdf[["url", "warc_ts", "html", "text", "lang"]]
        ).write.parquet(src)
        corpus = spark.read.parquet(src)
        plan = _plan(_ranged_corpus(corpus, 2))
        read_schema = [ln for ln in plan.splitlines()
                       if "ReadSchema" in ln]
        assert read_schema and "html" not in read_schema[0]
        assert "warc_ts" not in read_schema[0]
