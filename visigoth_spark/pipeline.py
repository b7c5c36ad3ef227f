"""Training-data pipeline operators over document/embedding tables —
deduplication, similarity search, text analysis. All Catalyst-first: built-in
pyspark.sql.functions only (JVM-side, whole-stage codegen) so every transform
here is also expressible as ANSI SQL for the DuckDB oracle harness.

Hash parity note: cross-engine-deterministic hashes use md5 (identical hex in
Spark and DuckDB); 60-bit ints derive from the first 15 hex chars via base
conversion. xxhash64/murmur are NOT portable across engines and are avoided
in anything oracle-checked.

Scale notes per operator are in the docstrings — these run over 10^12-row
tables, so every design avoids driver materialization and unbounded groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"[^\p{L}\p{N}]+"  # ≙ the engine tokenizer split class


def unpersist_deps(df: DataFrame) -> None:
    """Release the intermediate frames a pipeline op persisted for the
    returned (lazy) result. jaccard_pairs / minhash_lsh_pairs /
    embedding_dup_pairs cache their candidate-generation lineage because
    the result frame consumes it 3-4x; the cache must outlive the result's
    evaluation, so those ops cannot unpersist it themselves. Call this once
    the result has been consumed — a long-lived session running many dedup
    jobs otherwise accumulates cached lineage. Safe on any DataFrame
    (no-op when nothing was attached)."""
    for cached in getattr(df, "_vg_cached", []):
        cached.unpersist()


def tokens_col(text: Column) -> Column:
    """lower + split + drop empty boundary tokens (pure Catalyst)."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT), lambda t: t != "")


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", tokens_col(F.col(text_col)))


def hash60(col: Column) -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of md5, base-16."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash. Returns (id, text_hash, is_dup) where
    is_dup marks every doc that is not the min-id canonical of its group.

    Scale: one shuffle on the 16-byte hash; group sizes = duplicate-cluster
    sizes (naturally small); no skew risk beyond pathological spam clusters,
    which AQE skew-split handles."""
    h = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
    canon = h.groupBy("text_hash").agg(F.min(id_col).alias("_canon"))
    return (
        h.join(canon, "text_hash")
        .select(
            id_col, "text_hash",
            (F.col(id_col) != F.col("_canon")).alias("is_dup"),
        )
    )


def token_shingles(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct token n-gram shingles per doc: (id, shingle)."""
    toks = with_tokens(df, text_col)
    sh = F.when(
        F.size("tokens") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("tokens") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice("tokens", i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        toks.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3,
                  threshold: float = 0.5,
                  max_shingle_df: int | None = 10_000) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: (id_a, id_b, jaccard).

    Scale: the shingle self-join is the classic candidate generator; the
    shuffle key is the shingle, so hot shingles (boilerplate) are THE skew
    blowup at web scale — one shingle shared by 10^8 docs would expand to
    10^16 candidate pairs on a single join key. ``max_shingle_df`` drops
    shingles with df above the cap from candidate generation AND from the
    intersection counts (they carry no discriminative signal); denominators
    keep the FULL per-doc shingle counts, so the reported jaccard is a lower
    bound for pairs that shared a capped shingle and exact otherwise.
    Singleton shingles (df == 1) are also dropped before the self-join —
    they cannot produce a pair and at web scale they are the long tail of
    the shingle distribution (zero result change, large shuffle saving)."""
    sh = token_shingles(df, id_col, text_col, n).cache()
    # cached: sizes, the df aggregate and both self-join sides would
    # otherwise recompute the shingle lineage 4x. Lifetime contract: the
    # cache backs the RETURNED lazy frame, so it cannot be dropped here —
    # call unpersist_deps(result) once the result is consumed (a long-lived
    # session running many dedup jobs otherwise accumulates cached lineage)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sdf = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    live = sdf.filter(F.col("sdf") >= 2)
    if max_shingle_df is not None:
        live = live.filter(F.col("sdf") <= max_shingle_df)
    capped = sh.join(live.select("shingle"), "shingle")
    a = capped.select(F.col(id_col).alias("id_a"), "shingle")
    b = capped.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"))
    out = (
        inter.join(na, "id_a").join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    out._vg_cached = [sh]  # released via unpersist_deps(out)
    return out


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_hashes: int = 8, band_size: int = 2,
                      max_bucket_size: int | None = 10_000) -> DataFrame:
    """MinHash + LSH banding candidate pairs: (id_a, id_b).

    MinHash permutation h_j = md5(j || shingle) compared as hex strings
    (lexicographic min over a cryptographic hash ≈ a random permutation) —
    portable to the SQL oracle, unlike xxhash64. Bands of ``band_size``
    consecutive minhashes; docs sharing any band bucket become a pair.

    Scale: per-band shuffle key = (band_idx, band_hash); bucket sizes are the
    collision clusters (near-dups), so skew == actual duplication. The
    O(cluster²) pair expansion inside a bucket is the standard LSH cost;
    ``max_bucket_size`` drops buckets above the cap before pairing (a
    10^6-doc spam cluster would otherwise expand to 10^12 pairs on one
    (band, sig) join key — the pairs inside a mega-cluster are redundant
    anyway: exact dedup or a cluster-id assignment handles them in O(n)).
    Singleton buckets are dropped too (no pair possible, big join saving)."""
    sh = token_shingles(df, id_col, text_col, n)
    mh = sh.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(str(j) + ":"), F.col("shingle"))))
            .alias(f"mh{j}")
            for j in range(num_hashes)
        ]
    )
    n_bands = num_hashes // band_size
    bands = mh.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"mh{bi * band_size + o}")
                                for o in range(band_size)
                            ],
                        ).alias("sig"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bs"),
    ).select(id_col, "bs.band", "bs.sig").cache()
    # cached: the shingle+minhash lineage above would otherwise re-execute
    # for the bucket-size aggregate AND each self-join side (3-4 passes).
    # Lifetime: backs the returned lazy frame — unpersist_deps(result)
    cached = bands
    bsize = bands.groupBy("band", "sig").agg(F.count("*").alias("bn"))
    live = bsize.filter(F.col("bn") >= 2)
    if max_bucket_size is not None:
        live = live.filter(F.col("bn") <= max_bucket_size)
    bands = bands.join(live.select("band", "sig"), ["band", "sig"])
    a = bands.select(F.col(id_col).alias("id_a"), "band", "sig")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "sig")
    out = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    out._vg_cached = [cached]
    return out


def connected_components(pairs: DataFrame, nodes: DataFrame,
                         id_col: str = "doc_id", a_col: str = "id_a",
                         b_col: str = "id_b", max_iter: int = 20
                         ) -> DataFrame:
    """Near-duplicate CLUSTERING: (id, cluster_id = min node id of the
    connected component) over a candidate-pair graph — the step after
    LSH/embedding pair generation that turns pairwise evidence into
    keep/drop decisions (keep ``cluster_id == id``, drop the rest).
    Singletons (no pair) cluster with themselves.

    Algorithm: min-label propagation — each round every node takes the
    min of its own label and its neighbors' labels; stop when a round
    changes nothing. Rounds needed = graph diameter; near-dup graphs are
    clique/star-shaped (LSH buckets pair all members directly), so 2-4
    rounds in practice; ``max_iter`` bounds adversarial chains (where the
    alternating large-star/small-star variant — Kiveris et al. 2014 —
    would be the next tool). Per round: one join keyed by node id + one
    min-aggregation; the only shuffled state is (node, label) — 2 longs a
    node; edges are persisted once and reused every round.

    Each round's frame is ``localCheckpoint``-ed: persist alone keeps the
    full LOGICAL plan, and because every round references the previous
    labels twice (neighbor lookup + merge) the plan DOUBLES per round —
    Spark OOMs rendering it long before the data is big. Checkpointing
    truncates lineage so the plan stays O(1) per round. On a cluster
    where executor loss must be survivable mid-computation, swap in
    reliable ``checkpoint()`` with a checkpoint dir — same shape,
    durable blocks."""
    edges = (
        pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
        .union(pairs.select(F.col(b_col).alias("x"),
                            F.col(a_col).alias("y")))
        .distinct()
        .persist()
    )
    lbl = nodes.select(
        F.col(id_col).alias("x"), F.col(id_col).cast("long").alias("lbl")
    ).localCheckpoint()
    try:
        for _ in range(max_iter):
            nbr_min = (
                edges.join(
                    lbl.select(F.col("x").alias("y"),
                               F.col("lbl").alias("nlbl")), "y")
                .groupBy("x").agg(F.min("nlbl").alias("cand"))
            )
            merged = (
                lbl.join(nbr_min, "x", "left")
                .select(
                    "x", "lbl",
                    F.least(F.col("lbl"),
                            F.coalesce("cand", F.col("lbl"))).alias("new"),
                )
                .localCheckpoint()
            )
            n_changed = merged.filter(F.col("new") < F.col("lbl")).count()
            lbl = merged.select("x", F.col("new").alias("lbl"))
            if n_changed == 0:
                break
        return lbl.select(F.col("x").alias(id_col),
                          F.col("lbl").alias("cluster_id"))
    finally:
        edges.unpersist()


def simhash64(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", bits: int = 60) -> DataFrame:
    """SimHash fingerprint per doc: (id, simhash) over token md5-60bit
    hashes. bit_j(doc) = sign of sum over tokens of (2*bit_j(h(tok)) - 1),
    weighted by tf.

    Scale: explode (doc, token-hash) then ONE groupBy(doc) with ``bits``
    scalar SUM aggregates (one per bit) — partial (map-side) aggregation
    applies, so the shuffle carries one 60-long row per (doc, partition),
    and the agg buffer per group is a fixed 60 longs regardless of document
    length. (The previous collect_list formulation materialized
    n_tokens x 60 longs per group before folding — ~48 MB for a 100k-token
    doc; this shape is O(1) per group.)"""
    toks = with_tokens(df, text_col).select(
        F.col(id_col), F.explode("tokens").alias("tok")
    )
    th = toks.withColumn("h", hash60(F.col("tok")))
    # per bit j: sum over tokens of +-1, as `bits` independent scalar SUMs
    # (bit positions are Python ints — shiftright takes a literal shift)
    aggs = [
        F.sum(
            (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
            .cast("long")
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    summed = th.groupBy(id_col).agg(*aggs)
    packed = None
    for j in range(bits):
        term = F.when(
            F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed + term
    return summed.select(F.col(id_col), packed.alias("simhash"))


# ---------------------------------------------------------------------------
# Similarity search (embeddings)
# ---------------------------------------------------------------------------

def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns (JVM-side)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding"
                ) -> DataFrame:
    """Brute-force cosine top-k: (id, sim). The exact baseline every ANN
    variant is validated against.

    Scale: embarrassingly parallel scan + global top-k via orderBy.limit
    (Spark's TakeOrdered — per-partition heaps then driver merge of k·P
    rows, no full sort)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.select(
            F.col(id_col),
            F.round(
                cosine_sim(F.col(vec_col).cast("array<double>"), q), 6
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_centroids(n_cells: int, dims: int) -> list[list[float]]:
    """Deterministic md5-derived pseudo-random centroids in [-1, 1]^dims.
    Shared by ivf_topk and the harness oracle SQL (which embeds them as
    literals) so both sides bucket identically."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{c}:{d}".encode()).hexdigest()[:8], 16)
             / 0xFFFFFFFF) * 2.0 - 1.0
            for d in range(dims)
        ]
        for c in range(n_cells)
    ]


KMEANS_QUANT = 65536  # 2^16 fixed-point scale for order-independent sums


def kmeans_centroids(emb: DataFrame, n_cells: int = 16, iters: int = 4,
                     id_col: str = "vec_id", vec_col: str = "embedding"
                     ) -> list[list[float]]:
    """Data-trained IVF centroids: seeded Lloyd k-means with EXACTLY
    reproducible arithmetic, so an independent pure-Python replica
    (``kmeans_centroids_replica``, used by the DuckDB-oracle builder and
    pinned bit-identical in tests) derives the same centroids from the
    same parquet — no float-summation-order nondeterminism anywhere:

    - init: the ``n_cells`` rows with the smallest ``md5(str(id))``
      (deterministic, data-dependent, engine-portable);
    - assign: cosine argmax against centroid literals via ``cosine_sim``'s
      left-to-right float64 fold (bitwise-reproducible sequential IEEE
      ops), first-max tiebreak;
    - update: per (cell, dim) SUM of ``floor(x * 2^16)`` int64 values —
      integer addition is associative/commutative, so the Spark shuffle
      order cannot change the total; the final ``sum / (count * 2^16)``
      is one float64 division on the driver. Empty cells keep their
      previous centroid.

    Scale: each iteration is one narrow shuffle of (cell, dim, partial
    sum) with map-side partials — k*dims rows reach the driver. The 2^16
    quantization bounds ``rows_per_cell * 2^16 * max|x|`` under int64 up
    to ~10^13 rows/cell at |x|<8; beyond that, raise to a two-level
    (partition-partial, then global) integer agg. Quantization error
    2^-16 per value only nudges centroids, never breaks reproducibility
    (both sides quantize identically)."""
    vec_d = F.col(vec_col).cast("array<double>")
    seed_rows = (
        emb.select(F.md5(F.col(id_col).cast("string")).alias("_h"),
                   F.col(id_col).alias("_id"), vec_d.alias("_v"))
        .orderBy("_h", "_id")
        .limit(n_cells)
        .collect()
    )
    cents = [list(r._v) for r in seed_rows]
    for _ in range(iters):
        assigned = ivf_assign(emb, vec_col=vec_col, centroids=cents)
        q = F.floor(F.col("_x") * F.lit(float(KMEANS_QUANT))).cast("long")
        agg = (
            assigned.select(
                F.col("cell"), F.posexplode(vec_d).alias("_d", "_x"))
            .select("cell", "_d", q.alias("_q"))
            .groupBy("cell", "_d")
            .agg(F.sum("_q").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = [list(c) for c in cents]
        for r in agg:
            new[r.cell][r._d] = r.s / (r.n * KMEANS_QUANT)
        cents = new
    return cents


def kmeans_centroids_replica(parquet_path: str, n_cells: int = 16,
                             iters: int = 4, id_col: str = "vec_id",
                             vec_col: str = "embedding"
                             ) -> list[list[float]]:
    """Pure-Python replica of ``kmeans_centroids`` over the same parquet —
    builds the oracle-SQL centroid literals without a SparkSession. Every
    step mirrors the Spark plan's arithmetic exactly: float64 casts, the
    sequential cosine fold, floor-quantized int64 sums, one division."""
    import hashlib
    import math

    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=[id_col, vec_col])
    ids = tbl.column(id_col).to_pylist()
    vecs = [[float(x) for x in v] for v in tbl.column(vec_col).to_pylist()]

    def seq_cosine(a: list[float], b: list[float]) -> float:
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = 0.0
        for x in a:
            na += x * x
        nb = 0.0
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    order = sorted(range(len(ids)),
                   key=lambda i: (hashlib.md5(str(ids[i]).encode())
                                  .hexdigest(), ids[i]))
    cents = [list(vecs[i]) for i in order[:n_cells]]
    for _ in range(iters):
        sums = [[0] * len(c) for c in cents]
        counts = [0] * n_cells
        for v in vecs:
            sims = [seq_cosine(v, c) for c in cents]
            cell = sims.index(max(sims))
            counts[cell] += 1
            for d, x in enumerate(v):
                sums[cell][d] += math.floor(x * KMEANS_QUANT)
        cents = [
            ([s / (counts[c] * KMEANS_QUANT) for s in sums[c]]
             if counts[c] else list(cents[c]))
            for c in range(n_cells)
        ]
    return cents


def ivf_assign(emb: DataFrame, n_cells: int = 16, dims: int = 64,
               vec_col: str = "embedding",
               centroids: list[list[float]] | None = None) -> DataFrame:
    """Add a ``cell`` column: index of the nearest centroid (cosine
    argmax, first-max tiebreak) — ``centroids`` if given (e.g. k-means
    trained), else the ``n_cells`` fixed md5-derived ones. Pure Catalyst —
    one pass, no shuffle."""
    cents = centroids if centroids is not None \
        else ivf_centroids(n_cells, dims)
    n_cells = len(cents)
    vec_d = F.col(vec_col).cast("array<double>")
    sims = F.array(
        *[
            cosine_sim(vec_d, F.array(*[F.lit(x) for x in cents[c]]))
            for c in range(n_cells)
        ]
    )
    return (
        emb.withColumn("_sims", sims)
        .withColumn(
            "cell",
            F.array_position(F.col("_sims"), F.array_max("_sims")).cast("int")
            - 1,
        )
        .drop("_sims")
    )


def probe_cells(query_vec: list[float], n_cells: int = 16,
                n_probe: int | None = None,
                centroids: list[list[float]] | None = None) -> list[int]:
    """The cells an IVF query probes: the ``n_probe`` (default n_cells/4)
    centroids nearest to the query by cosine. Driver-side math over
    n_cells x dims floats."""
    import numpy as np

    cents = centroids if centroids is not None \
        else ivf_centroids(n_cells, len(query_vec))
    n_cells = len(cents)
    qv = np.array(query_vec, dtype=np.float64)
    qn = qv / (np.linalg.norm(qv) or 1.0)
    cell_sims = [
        float(np.dot(qn, np.array(c) / (np.linalg.norm(c) or 1.0)))
        for c in cents
    ]
    best = sorted(range(n_cells), key=lambda c: -cell_sims[c])
    return best[: (n_probe or max(1, n_cells // 4))]


def ivf_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
             n_probe_ids: int | None = None, n_cells: int = 16,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF-style ANN over an UNMATERIALIZED table: assign cells on the fly,
    probe the query's neighborhood, exact-score within. This is the
    SQL-oracle-checkable form (one plan, no side files); it scans the whole
    table once (the assignment pass). The SCALE path is
    ``ivf_write_partitioned`` + ``ivf_topk_partitioned``: assign ONCE at
    write time, store partitionBy(cell), and let every query scan only the
    probed cells via parquet partition pruning (~n_probe/n_cells of the
    data). Recall < 1 by construction; validated against cosine_topk in
    tests (recall@10 threshold)."""
    dims = len(query_vec)
    assigned = ivf_assign(emb, n_cells, dims, vec_col, centroids=centroids)
    probe = probe_cells(query_vec, n_cells, n_probe_ids,
                        centroids=centroids)
    pruned = assigned.filter(F.col("cell").isin(probe))
    return cosine_topk(pruned, query_vec, k, id_col, vec_col)


def ivf_write_partitioned(emb: DataFrame, out_path: str, n_cells: int = 16,
                          dims: int = 64, vec_col: str = "embedding") -> None:
    """Materialize the IVF index: assign each vector once, write the table
    hive-partitioned by cell. At 10^12 rows this is the one-time build cost
    that turns every subsequent query's scan into a partition-pruned read of
    ~n_probe/n_cells of the data."""
    (
        ivf_assign(emb, n_cells, dims, vec_col)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(out_path)
    )


def ivf_topk_partitioned(spark, ivf_path: str, query_vec: list[float],
                         k: int = 10, n_cells: int = 16,
                         n_probe: int | None = None,
                         id_col: str = "vec_id", vec_col: str = "embedding"
                         ) -> DataFrame:
    """Query a materialized IVF table: the ``cell IN (probe)`` filter hits
    the hive partition column, so Catalyst prunes unprobed cell directories
    at planning time — the physical scan shows
    ``PartitionFilters: [cell IN (...)]`` and reads only ~1/4 of the files
    (asserted in tests/test_pipeline_scale.py). Identical results to
    ``ivf_topk`` on the same data by construction (same centroids, same
    probe rule, exact scoring within probed cells)."""
    emb = spark.read.parquet(ivf_path)
    probe = probe_cells(query_vec, n_cells, n_probe)
    return cosine_topk(
        emb.filter(F.col("cell").isin(probe)), query_vec, k, id_col, vec_col
    )


def rh_planes(n_planes: int, dims: int) -> list[list[float]]:
    """Deterministic md5-derived random hyperplanes in [-1, 1]^dims for
    cosine LSH (sign-random-projection). Shared with the harness oracle SQL
    (embedded as literals) so both sides bucket identically."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"rh{p}:{d}".encode()).hexdigest()[:8], 16)
             / 0xFFFFFFFF) * 2.0 - 1.0
            for d in range(dims)
        ]
        for p in range(n_planes)
    ]


def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.9,
                        n_planes: int = 16, band_size: int = 4,
                        dims: int = 64, max_bucket_size: int | None = 10_000,
                        id_col: str = "vec_id", vec_col: str = "embedding"
                        ) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos) with
    cos >= threshold, candidates generated by sign-random-projection LSH
    (bit_p = sign of dot(v, plane_p); bands of ``band_size`` bits; docs
    sharing any band bucket become candidates), exact cosine within buckets.

    Scale: identical shape to minhash_lsh_pairs — per-band shuffle key is
    the packed sign band, bucket sizes are near-dup clusters, the bucket cap
    bounds the O(cluster^2) expansion, singleton buckets are dropped. Recall
    < 1 by LSH construction (a pair can land in no common band); for
    sign-LSH the miss probability at cos>=0.9 with 4 bands of 4 bits is
    ~(1-(1-0.144)^4)^4 ~= 2%/band-config — tests pin recall vs the O(n^2)
    exact join on a small fixture."""
    planes = rh_planes(n_planes, dims)
    vec_d = F.col(vec_col).cast("array<double>")
    dots = [
        F.aggregate(
            F.zip_with(vec_d, F.array(*[F.lit(x) for x in planes[p]]),
                       lambda a, b: a * b),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        for p in range(n_planes)
    ]
    n_bands = n_planes // band_size
    band_sigs = [
        F.concat_ws(
            "",
            *[
                F.when(dots[bi * band_size + o] >= 0, F.lit("1"))
                .otherwise(F.lit("0"))
                for o in range(band_size)
            ],
        )
        for bi in range(n_bands)
    ]
    # bands carry only (id, band, sig) — vectors do NOT ride the LSH
    # shuffle; they join back onto the (much smaller) candidate pair set
    bands = emb.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(bi).alias("band"),
                             band_sigs[bi].alias("sig"))
                    for bi in range(n_bands)
                ]
            )
        ).alias("bs"),
    ).select(id_col, "bs.band", "bs.sig").cache()
    # cached: the n_planes x dims dot-product projection would otherwise
    # re-execute for the bucket-size aggregate and each self-join side.
    # Lifetime: backs the returned lazy frame — unpersist_deps(result)
    cached = bands
    bsize = bands.groupBy("band", "sig").agg(F.count("*").alias("bn"))
    live = bsize.filter(F.col("bn") >= 2)
    if max_bucket_size is not None:
        live = live.filter(F.col("bn") <= max_bucket_size)
    bands = bands.join(live.select("band", "sig"), ["band", "sig"])
    a = bands.select(F.col(id_col).alias("id_a"), "band", "sig")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), vec_d.alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), vec_d.alias("vb"))
    out = (
        cand.join(va, "id_a").join(vb, "id_b")
        .withColumn("cos", F.round(cosine_sim(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
    out._vg_cached = [cached]
    return out


# ---------------------------------------------------------------------------
# Event-stream aggregation (batch form of the Structured Streaming shape)
# ---------------------------------------------------------------------------

def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          ts_col: str = "ts") -> DataFrame:
    """Tumbling-window per-type event aggregates:
    (window_start, event_type, n_events, sum_value).

    This is the BATCH form of the Structured Streaming windowed
    aggregation — the exact same expression runs under readStream with
    ``withWatermark`` (tests/test_streaming_events.py pins stream ≡ batch).
    Scale: one shuffle keyed by (window, event_type); late data is bounded
    by the watermark in the streaming form."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window).alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30,
               ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """Gap-based sessionization (batch form): a new session starts when a
    user's inter-event gap exceeds ``gap_minutes``. Returns
    (user_id, session_idx, n_events, session_start, session_end) with
    timestamps formatted as strings (engine-portable hashing).

    Classic lag + cumulative-sum-of-breaks window pair — one shuffle keyed
    by user (per-group size = per-user event count; the same partitioning
    serves both window passes). The streaming form with identical semantics
    is streaming.sessionize_stream (applyInPandasWithState);
    stream ≡ batch is pinned in tests/test_streaming_events.py."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    # exact integer microseconds, timezone-free (works on TIMESTAMP_NTZ):
    # Spark timestampdiff(MICROSECOND) ≡ DuckDB date_diff('microsecond')
    prev = F.lag(F.col(ts_col)).over(w)
    gap = F.expr(
        f"timestampdiff(MICROSECOND, _prev_ts, `{ts_col}`)"
    )
    new_sess = F.when(
        prev.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    marked = (
        events.withColumn("_prev_ts", prev)
        .withColumn("_new", new_sess)
        .withColumn(
            "session_idx",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        marked.groupBy(user_col, "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss")
            .alias("session_start"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss")
            .alias("session_end"),
        )
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

LANG_MARKERS = {
    "en": ["the", "of", "and", "to", "in", "is"],
    "es": ["de", "la", "el", "en", "y", "que"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "les", "des", "et", "est", "une"],
}


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
            ) -> DataFrame:
    """Marker-word language heuristic: (id, pred_lang). Deterministic
    argmax with lexicographic tiebreak; 'und' when no marker hits."""
    toks = with_tokens(df, text_col)

    def marker_filter(lang: str):
        words = LANG_MARKERS[lang]
        return lambda t: t.isin(words)  # single-arg lambda: F.filter arity

    scores = [
        F.size(F.filter(F.col("tokens"), marker_filter(lang))).alias(f"s_{lang}")
        for lang in sorted(LANG_MARKERS)
    ]
    scored = toks.select(F.col(id_col), *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{g}") for g in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for g in langs:  # sorted -> first max wins (lexicographic tiebreak)
        pred = pred.when(F.col(f"s_{g}") == best, F.lit(g))
    return scored.select(F.col(id_col), pred.alias("pred_lang"))


def quality_score(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Heuristic quality features + compound score:
    (id, n_tokens, mean_tok_len, stopword_ratio, alnum_ratio, qscore)."""
    stop = LANG_MARKERS["en"] + ["a"]
    toks = with_tokens(df, text_col)
    n_tok = F.size("tokens")
    n_char = F.length(text_col)
    alnum = F.length(F.regexp_replace(F.col(text_col), r"[^\p{L}\p{N}]", ""))
    n_stop = F.size(F.filter(F.col("tokens"), lambda t: t.isin(stop)))
    # raw (unrounded) ratios feed the compound score — composing from
    # rounded values puts results exactly on .5e-6 rounding boundaries,
    # where engine ROUND implementations legitimately disagree
    swr_raw = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    alr_raw = F.when(n_char > 0, alnum / n_char).otherwise(F.lit(0.0))
    mean_len = F.when(
        n_tok > 0,
        F.round(
            F.aggregate(
                F.col("tokens"), F.lit(0.0),
                lambda acc, t: acc + F.length(t),
            ) / n_tok,
            6,
        ),
    ).otherwise(F.lit(0.0))
    q = F.round(
        F.when(n_tok > 0,
               0.4 * F.least(n_tok / F.lit(100.0), F.lit(1.0))
               + 0.3 * (1.0 - swr_raw) + 0.3 * alr_raw
               ).otherwise(F.lit(0.0)),
        6,
    )
    return toks.select(
        F.col(id_col), n_tok.cast("long").alias("n_tokens"),
        mean_len.alias("mean_tok_len"),
        F.round(swr_raw, 6).alias("stopword_ratio"),
        F.round(alr_raw, 6).alias("alnum_ratio"),
        q.alias("qscore"),
    )


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, ws_tokens, alnum_tokens, bpe_ish_tokens): whitespace count,
    letter/number-run count, and a BPE-ish subword proxy (runs of <=4 chars:
    ceil(len/4) summed — a deterministic stand-in for a real BPE vocab)."""
    toks = with_tokens(df, text_col)
    ws = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""))
    bpe = F.aggregate(
        F.col("tokens"), F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"),
    )
    return toks.select(
        F.col(id_col), ws.cast("long").alias("ws_tokens"),
        F.size("tokens").cast("long").alias("alnum_tokens"),
        bpe.alias("bpe_ish_tokens"),
    )


def bpe_count_col(tok: Column, merges: list[tuple[str, str]]) -> Column:
    """Number of BPE tokens for one analyzed token under a FROZEN merge
    table (visigoth_spark/bpe.py semantics), as a pure Catalyst column:
    spell the token as delimited symbols ``<h><o><l><a>`` then fold the
    merges in rank order, each one plain replace-all of ``<a><b>`` ->
    ``<ab>`` (F.aggregate over a literal struct array — a runtime loop,
    not an unrolled expression tree). The symbol count is the ``<`` count
    of the fixed point. Identical semantics to Python str.replace and
    DuckDB replace, which is what keeps the DuckDB oracle exact."""
    spelled = F.regexp_replace(tok, "(.)", "<$1>")
    merge_arr = F.array(*[
        F.struct(F.lit(f"<{a}><{b}>").alias("pat"),
                 F.lit(f"<{a}{b}>").alias("rep"))
        for a, b in merges
    ])
    final = F.aggregate(
        merge_arr, spelled, lambda acc, m: F.replace(acc, m.pat, m.rep)
    )
    return (
        F.length(final) - F.length(F.replace(final, F.lit("<"), F.lit("")))
    ).cast("long")


def token_counts_bpe(df: DataFrame, merges: list[tuple[str, str]]
                     | None = None, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, alnum_tokens, bpe_tokens): analyzed-token count and REAL
    byte-pair-encoding token count under the frozen merge table
    (``bpe_merges.txt``, trained by tools/train_bpe.py) — the honest
    upgrade of ``token_counts``'s bpe_ish proxy (round-4 verdict task 6).

    Plan shape (100 TB): the merge fold runs once per DISTINCT token (the
    vocabulary — groupBy dedup with map-side partials), never per corpus
    token; per-token counts then join back to the exploded corpus on the
    token key and sum per doc. Vocabulary ≪ corpus, so the expensive
    200-replace fold touches ~10^8 rows while the corpus is 10^12; the
    join is key-partitioned (AQE picks broadcast when the vocab fits).
    Docs with zero tokens are preserved via the left join from ``df``."""
    from visigoth_spark.bpe import load_merges

    if merges is None:
        merges = load_merges()
    toks = with_tokens(df, text_col)
    exploded = toks.select(F.col(id_col), F.explode("tokens").alias("tok"))
    vocab = exploded.select("tok").distinct()
    vocab_bpe = vocab.select(
        "tok", bpe_count_col(F.col("tok"), merges).alias("n_bpe"))
    per_doc = (
        exploded.join(vocab_bpe, "tok")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_alnum"),
             F.sum("n_bpe").alias("_bpe"))
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_alnum"), F.lit(0)).cast("long")
            .alias("alnum_tokens"),
            F.coalesce(F.col("_bpe"), F.lit(0)).cast("long")
            .alias("bpe_tokens"),
        )
    )


def quality_repetition(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1 — the
    web-corpus quality rules that drop boilerplate/spam by REPEATED
    content rather than by vocabulary), adapted to this tokenizer:

    - ``dup_tokens``: n_tokens - distinct tokens (the duplicate-word mass)
    - ``top_bigram_count`` / ``n_bigrams``: occurrences of the document's
      most frequent bigram vs total bigrams
    - ``repetition_ok``: Gopher-shaped acceptance — top bigram <= 18% of
      bigrams AND duplicate tokens <= 30% of tokens, computed in INTEGER
      arithmetic (count*100 <= total*threshold) so the flag is exact and
      engine-independent (no float rounding at the decision boundary).

    Plan shape (100 TB): dup_tokens is pure array math in the scan
    projection — zero shuffle; bigram counting is posexplode →
    groupBy(id, bigram) → groupBy(id), both keyed by the doc id (+bigram)
    with map-side partial aggregation — per-group size is one document's
    bigrams, so no cross-doc skew axis exists."""
    toks = with_tokens(df, text_col)
    n_tok = F.size("tokens").cast("long")
    base = toks.select(
        F.col(id_col),
        F.col("tokens"),
        n_tok.alias("n_tokens"),
        (n_tok - F.size(F.array_distinct("tokens"))).cast("long")
        .alias("dup_tokens"),
    )
    bigrams = F.when(
        F.size("tokens") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("tokens") - 1),
            lambda i: F.concat_ws(" ", F.slice("tokens", i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        base.select(F.col(id_col), F.explode(bigrams).alias("bg"))
        .groupBy(id_col, "bg").count()
        .groupBy(id_col)
        .agg(F.max("count").alias("top"), F.sum("count").alias("tot"))
    )
    ok = (
        (F.coalesce(F.col("top"), F.lit(0)) * 100
         <= F.coalesce(F.col("tot"), F.lit(0)) * 18)
        & (F.col("dup_tokens") * 100 <= F.col("n_tokens") * 30)
    )
    return (
        base.drop("tokens")
        .join(counts, id_col, "left")
        .select(
            F.col(id_col), "n_tokens", "dup_tokens",
            F.coalesce(F.col("tot"), F.lit(0)).cast("long")
            .alias("n_bigrams"),
            F.coalesce(F.col("top"), F.lit(0)).cast("long")
            .alias("top_bigram_count"),
            ok.alias("repetition_ok"),
        )
    )


def domain_stats(df: DataFrame, domain_col: str = "source",
                 id_col: str = "doc_id", text_col: str = "text",
                 lang_col: str = "lang") -> DataFrame:
    """Per-domain (source) corpus statistics — the aggregation behind
    domain sampling weights in a web-corpus training pipeline (how much
    of each source to keep, per CCNet/Gopher-style mixing): doc count,
    total analyzed tokens, distinct languages, total characters. ONE
    groupBy(domain) with map-side partial aggregation — the single
    shuffle carries one row per (partition, domain), never per doc."""
    toks = with_tokens(df, text_col)
    return (
        toks.groupBy(domain_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.size("tokens")).cast("long").alias("total_tokens"),
            F.countDistinct(lang_col).cast("long").alias("n_langs"),
            F.sum(F.length(text_col)).cast("long").alias("total_chars"),
        )
    )


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      default: float = 0.0) -> DataFrame:
    """DETERMINISTIC stratified sampling — the language/domain mixing
    primitive of a training-data pipeline (keep fraction f of each
    stratum, e.g. downsample head languages). Unlike Bernoulli sampleBy,
    membership is a pure function of the row id (28-bit md5 bucket
    < f * 2^28 — 7 hex chars), so
    the sample is reproducible across runs/engines, exactly SQL-mirrorable
    for the oracle, and stable under re-partitioning — the property a
    resumable 100 TB pipeline needs (a retried task must keep the same
    rows). One narrow projection + filter; no shuffle at all."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 7),
               16, 10).cast("long")
    )  # uniform in [0, 2^28)
    frac = F.coalesce(
        *[F.when(F.col(strata_col) == k, F.lit(float(v)))
          for k, v in sorted(fractions.items())],
        F.lit(float(default)),
    )
    return df.filter(bucket < frac * float(1 << 28))


def decontaminate(df: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 5) -> DataFrame:
    """Benchmark decontamination — flag training documents that share any
    analyzed-token n-gram with an evaluation/benchmark set (the GPT-3
    appendix-C procedure, 13-gram there; ``n`` configurable). Returns one
    row per corpus doc: (id, shared_ngrams = distinct overlapping n-grams,
    contaminated = shared_ngrams > 0).

    Plan shape (100 TB corpus x small benchmark): the benchmark side
    reduces to its DISTINCT n-gram set — eval sets are tiny, so it gets a
    broadcast hint and the corpus side never shuffles for the join; the
    only wide exchange is the per-doc distinct-gram count, keyed by doc
    id with map-side partial aggregation."""
    grams = F.when(
        F.size("tokens") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("tokens") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice("tokens", i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    corpus_g = (
        with_tokens(df, text_col)
        .select(F.col(id_col), F.explode(grams).alias("gram"))
        .distinct()
    )
    bench_g = (
        with_tokens(benchmark, text_col)
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    hits = (
        corpus_g.join(F.broadcast(bench_g), "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("shared_ngrams"))
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("shared_ngrams"), F.lit(0)).cast("long")
            .alias("shared_ngrams"),
            (F.coalesce(F.col("shared_ngrams"), F.lit(0)) > 0)
            .alias("contaminated"),
        )
    )


def collocations(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", min_count: int = 5,
                 k: int = 20) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information — the
    phrase-mining pass of a web-corpus pipeline (finds multiword units
    worth treating as single tokens; classic Church & Hanks 1990 PMI over
    corpus bigrams). PMI = ln(p(w1,w2) / (p(w1) p(w2))) with
    p(w1,w2) = c12/NB over adjacent pairs and p(w) = c/NU over unigrams;
    ``min_count`` drops the unstable low-count tail.

    Plan shape (100 TB): two counting shuffles (bigram keys, unigram
    keys), both with map-side partial aggregation; corpus totals ride in
    as broadcast crossJoins; the final top-k is orderBy+limit
    (TakeOrdered — never a full sort). Ordering ties break on the ROUNDED
    pmi then (w1, w2), so the result is engine-independent at float-ulp
    boundaries."""
    toks = with_tokens(df, text_col)
    bigrams = F.when(
        F.size("tokens") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("tokens") - 1),
            lambda i: F.struct(
                F.element_at("tokens", i).alias("w1"),
                F.element_at("tokens", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = toks.select(F.explode(bigrams).alias("b")).select("b.w1", "b.w2")
    uni = toks.select(F.explode("tokens").alias("w"))
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    cu = uni.groupBy("w").agg(F.count("*").alias("c"))
    nb = bg.agg(F.count("*").alias("nb"))
    nu = uni.agg(F.count("*").alias("nu"))
    # log-space: the ratio form (c12*nu^2)/(nb*c1*c2) overflows int64 once
    # the corpus passes ~3e9 tokens (nu^2 > 2^63) — exactly the scale the
    # plan shape targets
    pmi = F.round(
        F.log("c12") + 2 * F.log("nu") - F.log("nb")
        - F.log("c1") - F.log("c2"),
        6,
    )
    return (
        c12.filter(F.col("c12") >= min_count)
        .join(cu.select(F.col("w").alias("w1"), F.col("c").alias("c1")),
              "w1")
        .join(cu.select(F.col("w").alias("w2"), F.col("c").alias("c2")),
              "w2")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
        .select("w1", "w2", F.col("c12").cast("long").alias("c12"),
                pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def unigram_nll(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    unigram language model — the deterministic in-repo stand-in for the
    CCNet-style LM-perplexity quality filter (docs whose token
    distribution is far from the corpus read as noise/boilerplate and
    score high). nll = -(1/n) sum_i ln(count(t_i)/NU); no smoothing
    needed (every scored token is in the corpus by construction).

    Plan shape (100 TB): one unigram-count shuffle (map-side partial
    agg), one (token -> count) join against the exploded corpus (AQE
    picks broadcast vs SMJ by vocabulary size), one per-doc aggregation
    keyed by the doc id. Docs with zero analyzed tokens are excluded
    (no tokens to score)."""
    toks = with_tokens(df, text_col)
    flat = toks.select(F.col(id_col), F.explode("tokens").alias("w"))
    cu = flat.groupBy("w").agg(F.count("*").alias("c"))
    nu = flat.agg(F.count("*").alias("nu"))
    return (
        flat.join(cu, "w")
        .crossJoin(F.broadcast(nu))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(-F.avg(F.log(F.col("c") / F.col("nu"))), 6)
            .alias("nll"),
        )
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (id, fp)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3, w: int = 4
                        ) -> DataFrame:
    """Winnowing fingerprints (MOSS-style, Schleimer et al. SIGMOD'03,
    adapted to token shingles): hash every token ``n``-gram, slide a
    ``w``-shingle window, select each window's minimum hash; the document's
    fingerprint set is the distinct selected hashes. Guarantees any match
    of >= n+w-1 consecutive tokens between two docs shares a fingerprint,
    at ~1/w the storage of the full shingle set.

    Returns (id, wfp) distinct rows. Pure Catalyst: posexplode + one
    window MIN with a [CURRENT, w-1 FOLLOWING] frame — partitioned by doc,
    so the only shuffle key is the doc id (per-group size = doc shingle
    count; no cross-doc skew)."""
    from pyspark.sql import Window

    toks = with_tokens(df, text_col)
    sh = F.when(
        F.size("tokens") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("tokens") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice("tokens", i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pos = toks.select(
        F.col(id_col), F.posexplode(sh).alias("i", "shingle")
    ).withColumn("h", F.md5("shingle"))
    win = Window.partitionBy(id_col).orderBy("i").rowsBetween(0, w - 1)
    return (
        pos.withColumn("wfp", F.min("h").over(win))
        .select(id_col, "wfp")
        .distinct()
    )
