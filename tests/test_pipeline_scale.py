"""Scale-hardening tests for the pipeline operators flagged in round 1:

- jaccard_pairs: the max_shingle_df cap bounds candidate generation even
  when a boilerplate shingle is shared by every document;
- minhash_lsh_pairs: the bucket-size cap bounds the O(cluster^2) pair
  expansion of a mega-bucket;
- simhash64: the no-collect_list formulation is bit-identical to a direct
  python computation and completes on a very long document in bounded
  memory (fixed 60-long agg buffer per group);
- IVF partitioned path: identical results to the on-the-fly ivf_topk, with
  parquet partition pruning visible in the physical plan.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from visigoth_spark import pipeline as P


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BOILER = "all rights reserved contact us terms"


class TestJaccardCap:
    def test_boilerplate_shingle_bounded(self, spark):
        # 30 docs all sharing a boilerplate phrase + unique bodies; two true
        # near-dup docs sharing real content
        rows = [
            (i, f"{BOILER} unique body {i} alpha beta gamma delta{i}")
            for i in range(30)
        ]
        rows += [(100, "spark shuffle join broadcast partition skew salt"),
                 (101, "spark shuffle join broadcast partition skew salting")]
        df = _docs_df(spark, rows)
        # cap at 5: every boilerplate shingle (df=30) is dropped from
        # candidate generation, so no pair forms among the 30 boilerplate
        # docs; the true near-dup pair (unique shingles, df=2) survives
        pairs = P.jaccard_pairs(df, threshold=0.3, max_shingle_df=5).collect()
        ids = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (100, 101) in ids
        assert all(a == 100 for a, b in ids), (
            f"boilerplate docs must not pair: {ids}"
        )

    def test_uncapped_equals_high_cap(self, spark):
        rows = [(i, f"common prefix words here body {i % 3} tail") for i in
                range(12)]
        df = _docs_df(spark, rows)
        hi = P.jaccard_pairs(df, threshold=0.4, max_shingle_df=10_000)
        no = P.jaccard_pairs(df, threshold=0.4, max_shingle_df=None)
        assert sorted(map(tuple, hi.collect())) == sorted(
            map(tuple, no.collect())
        )


class TestLshBucketCap:
    def test_mega_bucket_dropped(self, spark):
        # 20 identical docs -> every band bucket has 20 members; capped at 5
        # none of them pair. Two other near-identical docs still pair.
        rows = [(i, "identical spam page content repeated") for i in range(20)]
        rows += [(100, "real page about spark joins and shuffles today"),
                 (101, "real page about spark joins and shuffles")]
        df = _docs_df(spark, rows)
        pairs = P.minhash_lsh_pairs(df, max_bucket_size=5).collect()
        ids = {(r["id_a"], r["id_b"]) for r in pairs}
        assert all(a >= 100 for a, b in ids), f"spam cluster paired: {ids}"
        # sanity: without the cap the spam cluster explodes into 190 pairs
        uncapped = P.minhash_lsh_pairs(df, max_bucket_size=None).count()
        assert uncapped >= 190


def _simhash_py(text: str, bits: int = 60) -> int:
    toks = [t for t in __import__("regex").findall(r"[\p{L}\p{N}]+",
                                                   text.lower())]
    sums = [0] * bits
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        for j in range(bits):
            sums[j] += 1 if (h >> j) & 1 else -1
    out = 0
    for j in range(bits):
        if sums[j] > 0:
            out |= 1 << j
    return out


class TestSimhashNoCollect:
    def test_matches_python_oracle(self, spark):
        rows = [(1, "spark join shuffle spark spark"),
                (2, "completely different words entirely"),
                (3, "spark join shuffle spark sparks")]
        df = _docs_df(spark, rows)
        got = {r["doc_id"]: r["simhash"]
               for r in P.simhash64(df).collect()}
        for did, text in rows:
            assert got[did] == _simhash_py(text), f"doc {did}"

    def test_long_doc_bounded(self, spark):
        # 60k tokens in one document: the old collect_list shape would hold
        # 60k x 60 longs (~29 MB) in one agg buffer; the sum shape holds 60.
        words = " ".join(f"w{i % 997}" for i in range(60_000))
        df = _docs_df(spark, [(1, words), (2, "short doc")])
        out = P.simhash64(df).collect()
        assert len(out) == 2
        got = {r["doc_id"]: r["simhash"] for r in out}
        assert got[2] == _simhash_py("short doc")

    def test_plan_has_no_collect_list(self, spark):
        df = _docs_df(spark, [(1, "a b c")])
        plan = P.simhash64(df)._jdf.queryExecution().optimizedPlan().toString()
        assert "collect_list" not in plan


class TestIvfPartitioned:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(400, 16)).astype(float)
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(400)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_partitioned_equals_inline(self, spark, emb, tmp_path):
        path = str(tmp_path / "ivf")
        P.ivf_write_partitioned(emb, path, n_cells=8, dims=16)
        q = emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
        a = P.ivf_topk(emb, list(q), k=10, n_cells=8).collect()
        b = P.ivf_topk_partitioned(spark, path, list(q), k=10,
                                   n_cells=8).collect()
        assert [(r["vec_id"], r["sim"]) for r in a] == [
            (r["vec_id"], r["sim"]) for r in b
        ]

    def test_partition_pruning_in_plan(self, spark, emb, tmp_path):
        path = str(tmp_path / "ivf2")
        P.ivf_write_partitioned(emb, path, n_cells=8, dims=16)
        q = emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
        df = P.ivf_topk_partitioned(spark, path, list(q), k=10, n_cells=8)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "cell" in plan
        # the pruned scan must enumerate only the probed cells (2 of 8)
        probe = P.probe_cells(list(q), n_cells=8)
        assert len(probe) == 2

    def test_recall_vs_brute(self, spark, emb, tmp_path):
        import numpy as np

        rng = np.random.default_rng(11)
        hits = 0
        n_q = 5
        for qi in range(n_q):
            q = emb.filter(F.col("vec_id") == qi).collect()[0]["embedding"]
            brute = {r["vec_id"]
                     for r in P.cosine_topk(emb, list(q), k=10).collect()}
            ivf = {r["vec_id"]
                   for r in P.ivf_topk(emb, list(q), k=10,
                                       n_cells=8).collect()}
            hits += len(brute & ivf)
        # random gaussian vectors + random centroids: recall well above the
        # 2/8-cells-scanned floor
        assert hits / (10 * n_q) >= 0.2


class TestEmbeddingDup:
    @pytest.fixture(scope="class")
    def emb2(self, spark):
        import numpy as np

        rng = np.random.default_rng(3)
        base = rng.normal(size=(60, 16))
        rows = [(i, [float(x) for x in base[i]]) for i in range(60)]
        # 10 planted near-dups: tiny perturbations of vectors 0..9
        for i in range(10):
            v = base[i] + rng.normal(scale=0.03, size=16)
            rows.append((100 + i, [float(x) for x in v]))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_planted_pairs_found(self, spark, emb2):
        pairs = P.embedding_dup_pairs(emb2, threshold=0.95, n_planes=16,
                                      band_size=4, dims=16).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        planted = {(i, 100 + i) for i in range(10)}
        # LSH recall < 1 by construction; demand >= 70% of planted pairs
        # and no false positives below the cosine threshold
        assert len(got & planted) >= 7
        for r in pairs:
            assert r["cos"] >= 0.95

    def test_bucket_cap_bounds_megacluster(self, spark, emb2):
        import numpy as np

        rng = np.random.default_rng(5)
        v = rng.normal(size=16)
        clones = [(200 + i, [float(x) for x in v]) for i in range(30)]
        df = emb2.union(
            emb2.sparkSession.createDataFrame(
                clones, "vec_id long, embedding array<double>"
            )
        )
        capped = P.embedding_dup_pairs(df, threshold=0.95, n_planes=16,
                                       band_size=4, dims=16,
                                       max_bucket_size=10).collect()
        ids = {(r["id_a"], r["id_b"]) for r in capped}
        assert not any(a >= 200 and b >= 200 for a, b in ids)


class TestWinnowing:
    def test_shared_run_guarantees_shared_fingerprint(self, spark):
        # winnowing guarantee: a match of >= n+w-1 = 6 consecutive tokens
        # must produce at least one shared fingerprint
        shared = "alpha bravo charlie delta echo foxtrot"
        rows = [(1, f"intro words {shared} tail one"),
                (2, f"other beginning {shared} different end"),
                (3, "completely unrelated document text here")]
        df = _docs_df(spark, rows)
        fps = P.winnow_fingerprints(df, n=3, w=4).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r["doc_id"], set()).add(r["wfp"])
        assert by_doc[1] & by_doc[2], "shared 6-token run must share a wfp"
        assert not (by_doc[1] & by_doc[3])

    def test_storage_reduction(self, spark):
        words = " ".join(f"tok{i}" for i in range(200))
        df = _docs_df(spark, [(1, words)])
        n_sh = 200 - 2
        n_fp = P.winnow_fingerprints(df, n=3, w=4).count()
        # ~1/w of the shingle count (2/(w+1) expected density for random)
        assert n_fp < n_sh / 2


class TestQualityRepetition:
    def test_constructed_docs_exact(self, spark):
        rows = [
            # 8 tokens, bigram "spam spam" x7 of 7 bigrams, dup 7 of 8
            (0, "spam spam spam spam spam spam spam spam"),
            # 7 distinct tokens, all 6 bigrams unique: top = 1/6 = 16.7%
            # <= 18% (a 6-token doc would FAIL: 1/5 = 20% — the integer
            # rule is exact, with no small-doc grace)
            (1, "one two three four five six seven"),
            # single token: no bigrams, no dups
            (2, "solo"),
            # empty after tokenization
            (3, "!!! ..."),
            # top bigram "a b" 2x of 4 bigrams (50% > 18%), dup 2 of 5
            (4, "a b c a b"),
        ]
        out = {r["doc_id"]: r for r in
               P.quality_repetition(_docs_df(spark, rows)).collect()}
        assert (out[0]["n_tokens"], out[0]["dup_tokens"],
                out[0]["n_bigrams"], out[0]["top_bigram_count"],
                out[0]["repetition_ok"]) == (8, 7, 7, 7, False)
        assert (out[1]["dup_tokens"], out[1]["top_bigram_count"],
                out[1]["repetition_ok"]) == (0, 1, True)
        assert (out[2]["n_tokens"], out[2]["n_bigrams"],
                out[2]["repetition_ok"]) == (1, 0, True)
        assert (out[3]["n_tokens"], out[3]["repetition_ok"]) == (0, True)
        assert (out[4]["n_bigrams"], out[4]["top_bigram_count"],
                out[4]["repetition_ok"]) == (4, 2, False)

    def test_no_collect_and_doc_keyed_shuffle(self, spark):
        # the plan must contain no collect_list and aggregate partially
        plan = P.quality_repetition(_docs_df(spark, [(0, "a b a")])) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "collect_list" not in plan
        assert "partial" in plan.lower()  # map-side combine on the counts


class TestDomainStats:
    def test_exact(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c", "en", "s1"), (1, "d e", "es", "s1"),
             (2, "f", "en", "s2")],
            "doc_id long, text string, lang string, source string")
        out = {r["source"]: r for r in P.domain_stats(df).collect()}
        assert out["s1"]["n_docs"] == 2
        assert out["s1"]["total_tokens"] == 5
        assert out["s1"]["n_langs"] == 2
        assert out["s1"]["total_chars"] == len("a b c") + len("d e")
        assert out["s2"]["n_docs"] == 1 and out["s2"]["n_langs"] == 1


class TestConnectedComponents:
    def _cc(self, spark, pairs, nodes, **kw):
        pairs_df = spark.createDataFrame(pairs, "id_a long, id_b long")
        nodes_df = spark.createDataFrame([(n,) for n in nodes],
                                         "doc_id long")
        out = P.connected_components(pairs_df, nodes_df, **kw)
        got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
        P.unpersist_deps(out)
        return got

    def test_cliques_chains_singletons(self, spark):
        pairs = [(1, 2), (2, 3),            # triangle-ish chain -> min 1
                 (10, 11), (11, 12), (12, 13), (13, 14),  # 5-chain -> 10
                 (20, 21)]                  # pair -> 20
        nodes = [1, 2, 3, 10, 11, 12, 13, 14, 20, 21, 99]  # 99 singleton
        got = self._cc(spark, pairs, nodes)
        assert got == {1: 1, 2: 1, 3: 1,
                       10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
                       20: 20, 21: 20, 99: 99}

    def test_long_chain_needs_multiple_rounds(self, spark):
        # a 12-node path: min-label propagation needs ~diameter rounds;
        # convergence must reach the global min at the far end
        n = 12
        pairs = [(i, i + 1) for i in range(n - 1)]
        got = self._cc(spark, pairs, list(range(n)))
        assert set(got.values()) == {0}

    def test_planted_near_dups_cluster_together(self, spark):
        # three copies of one text + unrelated docs: LSH pairs ->
        # components puts the copies in ONE cluster keyed by min id
        import pandas as pd

        texts = ["fila columna mesa dato valor orden grupo clave"] * 3 + [
            f"texto distinto numero {i} palabras unicas aqui{i}"
            for i in range(7)
        ]
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": range(10), "text": texts}))
        pairs = P.minhash_lsh_pairs(df, num_hashes=8, band_size=2)
        got = {r["doc_id"]: r["cluster_id"] for r in
               P.connected_components(pairs, df).collect()}
        P.unpersist_deps(pairs)
        assert got[0] == got[1] == got[2] == 0
        assert all(got[i] != 0 for i in range(3, 10))


class TestCollocations:
    def test_constructed_pmi_exact(self, spark):
        import math

        # 6 docs: "x y" always adjacent (perfect collocation), "a b" only
        # sometimes, plus independent filler
        rows = [
            (0, "x y a c"), (1, "x y b d"), (2, "x y a b"),
            (3, "c a x y"), (4, "d b x y"), (5, "x y c d"),
        ]
        out = {(r["w1"], r["w2"]): (r["c12"], r["pmi"])
               for r in P.collocations(
                   _docs_df(spark, rows), min_count=3, k=10).collect()}
        # python oracle
        from collections import Counter

        uni, bg = Counter(), Counter()
        for _, t in rows:
            toks = t.split()
            uni.update(toks)
            bg.update(zip(toks, toks[1:]))
        nu, nb = sum(uni.values()), sum(bg.values())
        for (w1, w2), (c12, pmi) in out.items():
            assert c12 == bg[(w1, w2)]
            want = math.log(c12 * nu * nu / (nb * uni[w1] * uni[w2]))
            assert abs(pmi - round(want, 6)) < 1e-9
        assert ("x", "y") in out and out[("x", "y")][0] == 6
        # min_count floor drops rarer pairs
        assert all(c >= 3 for c, _ in out.values())

    def test_plan_partial_agg_no_collect(self, spark):
        plan = P.collocations(_docs_df(spark, [(0, "a b a b")])) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "collect_list" not in plan
        assert "partial" in plan.lower()


class TestUnigramNLL:
    def test_constructed_exact(self, spark):
        import math

        rows = [(0, "a a b"), (1, "b c")]
        out = {r["doc_id"]: (r["n_tokens"], r["nll"])
               for r in P.unigram_nll(_docs_df(spark, rows)).collect()}
        # counts: a=2, b=2, c=1, NU=5
        nll0 = -(math.log(2 / 5) + math.log(2 / 5) + math.log(2 / 5)) / 3
        nll1 = -(math.log(2 / 5) + math.log(1 / 5)) / 2
        assert out[0] == (3, round(nll0, 6))
        assert out[1] == (2, round(nll1, 6))

    def test_rare_token_doc_scores_higher(self, spark):
        rows = [(i, "common words here") for i in range(8)]
        rows.append((99, "xylophone quux zzyzx"))
        out = {r["doc_id"]: r["nll"]
               for r in P.unigram_nll(_docs_df(spark, rows)).collect()}
        assert out[99] > max(v for k, v in out.items() if k != 99)

    def test_plan_partial_agg(self, spark):
        plan = P.unigram_nll(_docs_df(spark, [(0, "a b")])) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "collect_list" not in plan
        assert "partial" in plan.lower()
