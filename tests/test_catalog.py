"""Catalog semantics ported 1:1 from the reference's repo tests
(`/root/reference/repos_repo_test.go`): alias create/missing-index (:17-35),
unalias (:37-54), search via alias + multi-index fan-out (:56-87), put via
alias (:89-97), rename keeps aliases working (:99-118), hot-swap (:120-130),
drop cascades to aliases (:132-160), repo-level determinism (:162-196)."""

from __future__ import annotations

import pytest

from visigoth_spark.analysis import AnalyzerConfig
from visigoth_spark.catalog import Catalog
from visigoth_spark.corpus import generate_corpus

ANALYZER = AnalyzerConfig()


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "catalog"), ANALYZER)


def _corpus(spark, n=60, seed=42):
    pdf = generate_corpus(n, seed=seed)
    return spark.createDataFrame(pdf[["url", "text", "lang"]])


def test_alias_requires_existing_index(cat, spark):
    # repos_repo_test.go:17-35 — aliasing a missing index fails
    assert not cat.alias("courses", "nope")
    cat.ingest("idx1", _corpus(spark), num_partitions=2)
    assert cat.alias("courses", "idx1")
    assert cat.has_alias("courses")
    assert cat.list_aliases() == {"courses": ["idx1"]}


def test_unalias(cat, spark):
    # repos_repo_test.go:37-54
    cat.ingest("idx1", _corpus(spark), num_partitions=2)
    cat.alias("a", "idx1")
    assert cat.unalias("a", "idx1")
    assert not cat.has_alias("a")
    assert not cat.unalias("missing", "idx1")


def test_unalias_empty_index_drops_alias(cat, spark):
    # repos_repo.go:104-136 — empty index arg drops the whole alias
    cat.ingest("i1", _corpus(spark), num_partitions=2)
    cat.ingest("i2", _corpus(spark, seed=7), num_partitions=2)
    cat.alias("both", "i1")
    cat.alias("both", "i2")
    assert cat.unalias("both")
    assert not cat.has_alias("both")


def test_search_via_alias(cat, spark):
    # repos_repo_test.go:56-64
    cat.ingest("idx1", _corpus(spark), num_partitions=2)
    cat.alias("courses", "idx1")
    direct = {r["url"] for r in cat.search("idx1", "curso", "hits", k=None).collect()}
    aliased = {r["url"] for r in cat.search("courses", "curso", "hits", k=None).collect()}
    assert direct == aliased and direct


def test_search_unknown_index_raises(cat):
    # repos_repo.go:182
    with pytest.raises(KeyError):
        cat.search("ghost", "curso")


def test_multi_index_alias_fans_out(cat, spark):
    # repos_repo_test.go:66-87 — alias over two indexes returns the union
    cat.ingest("i1", _corpus(spark, n=40, seed=1), num_partitions=2)
    cat.ingest("i2", _corpus(spark, n=40, seed=2), num_partitions=2)
    cat.alias("all", "i1")
    cat.alias("all", "i2")
    u1 = {r["url"] for r in cat.search("i1", "curso", "hits", k=None).collect()}
    u2 = {r["url"] for r in cat.search("i2", "curso", "hits", k=None).collect()}
    both = {r["url"] for r in cat.search("all", "curso", "hits", k=None).collect()}
    assert both == u1 | u2
    assert u1 and u2


def test_ingest_via_alias_fans_out(cat, spark, tmp_path):
    # repos_repo_test.go:89-97 — put through an alias reaches every target
    cat.ingest("i1", _corpus(spark, n=30, seed=1), num_partitions=2)
    cat.ingest("i2", _corpus(spark, n=30, seed=2), num_partitions=2)
    cat.alias("w", "i1")
    cat.alias("w", "i2")
    targets = cat.ingest("w", _corpus(spark, n=30, seed=3), num_partitions=2)
    assert sorted(targets) == ["i1", "i2"]
    # both now index the seed-3 corpus -> identical result sets
    u1 = {r["url"] for r in cat.search("i1", "curso", "hits", k=None).collect()}
    u2 = {r["url"] for r in cat.search("i2", "curso", "hits", k=None).collect()}
    assert u1 == u2


def test_rename_keeps_alias_working(cat, spark):
    # repos_repo_test.go:99-118
    cat.ingest("old", _corpus(spark), num_partitions=2)
    cat.alias("stable", "old")
    before = [r["url"] for r in cat.search("stable", "curso", "bm25").collect()]
    assert cat.rename("old", "new")
    assert cat.list() == ["new"]
    assert not cat.has("old")
    after = [r["url"] for r in cat.search("stable", "curso", "bm25").collect()]
    assert before == after
    assert not cat.rename("missing", "x")
    cat.ingest("other", _corpus(spark), num_partitions=2)
    assert not cat.rename("other", "new")  # target exists


def test_hot_swap(cat, spark):
    # repos_repo_test.go:120-130 — repoint an alias atomically
    cat.ingest("v1", _corpus(spark, n=30, seed=1), num_partitions=2)
    cat.ingest("v2", _corpus(spark, n=30, seed=2), num_partitions=2)
    cat.alias("live", "v1")
    r1 = {r["url"] for r in cat.search("live", "curso", "hits", k=None).collect()}
    cat.unalias("live", "v1")
    cat.alias("live", "v2")
    r2 = {r["url"] for r in cat.search("live", "curso", "hits", k=None).collect()}
    exp2 = {r["url"] for r in cat.search("v2", "curso", "hits", k=None).collect()}
    assert r2 == exp2
    assert r1 != r2  # different corpora -> different urls (seeded urls differ)


def test_drop_cascades_to_aliases(cat, spark):
    # repos_repo_test.go:132-160
    cat.ingest("i1", _corpus(spark, n=30, seed=1), num_partitions=2)
    cat.ingest("i2", _corpus(spark, n=30, seed=2), num_partitions=2)
    cat.alias("a", "i1")
    cat.alias("a", "i2")
    cat.alias("only1", "i1")
    assert cat.drop("i1")
    assert cat.list() == ["i2"]
    assert cat.list_aliases() == {"a": ["i2"]}  # i1 scrubbed; only1 empty -> gone
    assert not cat.has_alias("only1")
    assert not cat.drop("i1")  # already gone


def test_repo_level_determinism(cat, spark):
    # repos_repo_test.go:162-196 — same query 5x through the catalog
    cat.ingest("d", _corpus(spark), num_partitions=2)
    runs = [
        [(r["url"], r["score"]) for r in cat.search("d", "programación java", "bm25").collect()]
        for _ in range(5)
    ]
    assert all(r == runs[0] for r in runs)


def test_append_via_alias_fans_out_and_compact(cat, spark):
    # ≙ IndexRepo.Put's APPEND semantics (repos_repo.go:216-238): putting
    # through an alias appends to every aliased index, never rebuilds
    pdf = generate_corpus(120).sort_values("url").reset_index(drop=True)
    first, second = pdf.iloc[0::2], pdf.iloc[1::2]

    def df(p):
        return spark.createDataFrame(p[["url", "text", "lang"]])

    cat.ingest("i1", df(first), num_partitions=2)
    cat.ingest("i2", df(first), num_partitions=2)
    cat.alias("live", "i1")
    cat.alias("live", "i2")
    assert sorted(cat.append("live", df(second), num_partitions=2)) == [
        "i1", "i2"]

    from visigoth_spark.build import load_stats

    for t in ("i1", "i2"):
        st = load_stats(cat._index_dir(t))
        assert st["n_docs"] == 120 and st["n_batches"] == 2

    hits_appended = {(r["url"], r["hits"]) for r in cat.search(
        "live", "curso", "hits", k=None).collect()}

    # compact through the alias: both indexes fold to one batch, search
    # results unchanged
    assert sorted(cat.compact("live", num_partitions=2)) == ["i1", "i2"]
    for t in ("i1", "i2"):
        st = load_stats(cat._index_dir(t))
        assert st["n_docs"] == 120 and st["n_batches"] == 1
    hits_compacted = {(r["url"], r["hits"]) for r in cat.search(
        "live", "curso", "hits", k=None).collect()}
    assert hits_compacted == hits_appended


def test_append_lazily_creates_index(cat, spark):
    cat.append("fresh", _corpus(spark, 40), num_partitions=2)
    assert cat.has("fresh")
    assert cat.search("fresh", "curso", "hits", k=None).count() > 0


def test_merge_via_alias_fans_out(cat, spark):
    # tiered MINOR compaction through an alias: every aliased index folds
    # its appended batches into one tier; results byte-identical
    pdf = generate_corpus(120).sort_values("url").reset_index(drop=True)
    s0, s1, s2 = pdf.iloc[0::3], pdf.iloc[1::3], pdf.iloc[2::3]

    def df(p):
        return spark.createDataFrame(p[["url", "text", "lang"]])

    cat.ingest("m1", df(s0), num_partitions=2)
    cat.ingest("m2", df(s0), num_partitions=2)
    cat.alias("mlive", "m1")
    cat.alias("mlive", "m2")
    for s in (s1, s2):
        cat.append("mlive", df(s), num_partitions=2)

    before = [(r["url"], r["docid"], round(float(r["score"]), 12))
              for r in cat.search("mlive", "curso", "bm25", k=10).collect()]
    assert sorted(cat.merge("mlive", num_partitions=2)) == ["m1", "m2"]

    from visigoth_spark.build import load_stats

    for t in ("m1", "m2"):
        st = load_stats(cat._index_dir(t))
        assert st["n_docs"] == 120 and st["n_batches"] == 2  # base + tier
    after = [(r["url"], r["docid"], round(float(r["score"]), 12))
             for r in cat.search("mlive", "curso", "bm25", k=10).collect()]
    assert after == before
    # already merged: one appended tier left -> below min_batches, no-op
    assert cat.merge("mlive", num_partitions=2) == []
