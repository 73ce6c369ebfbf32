"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN recipe:

- brute-force cosine top-k: exact baseline. queries × corpus join →
  cosine → window top-k. All JVM expressions (zip_with/aggregate fold),
  no Python in the hot path. At 100 TB the corpus side stays put and the
  (small) query side broadcasts: the join is a BroadcastNestedLoopJoin
  over each corpus partition — embarrassingly parallel, no shuffle of
  the corpus.
- LSH-bucketed (random hyperplane / SRP): corpus is pre-bucketed by the
  sign-bit signature of h deterministic hyperplanes; queries probe only
  their own bucket (+ optional multi-probe by flipping bits). Turns
  top-k from O(N) per query into O(N / 2^h) expected, the scale path.
  Hyperplanes are derived from a seed via xxhash64 — deterministic,
  no RNG state, computable identically on any cluster size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a JVM fold (double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k neighbors per query row.

    Output: (query_id, neighbor_id, cos, rank). Self-matches (same id)
    are excluded when ids share a namespace. Ties broken by neighbor_id
    for determinism.
    """
    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("query_id"),
                       F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cv"))
    joined = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    scored = joined.select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("_qv"), F.col("_cv")), round_to).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def near_duplicate_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    round_to: int = 6,
    unblocked_limit: int | None = None,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup dedup).

    block_col (e.g. an SRP bucket from ``srp_signature``) bounds the
    self-join; None = full O(n²) — test scale only, enforced by
    :func:`lumbermill_spark.training.dedup.require_block` (raises past
    ``unblocked_limit`` rows, default UNBLOCKED_PAIR_LIMIT, so the
    crossJoin fallback cannot silently reach production scale).
    Output: (id_a, id_b, cos), id_a < id_b.
    """
    if block_col is None:
        from lumbermill_spark.training.dedup import (UNBLOCKED_PAIR_LIMIT,
                                                     require_block)

        require_block(df, "near_duplicate_pairs",
                      unblocked_limit if unblocked_limit is not None
                      else UNBLOCKED_PAIR_LIMIT)
    cols = [F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")]
    if block_col:
        cols.append(F.col(block_col).alias("_blk"))
    base = df.select(*cols)
    a = base.select(*[c.alias(n) for c, n in zip(
        [F.col("_id"), F.col("_v")] + ([F.col("_blk")] if block_col else []),
        ["id_a", "_va"] + (["_blk"] if block_col else []))])
    b = base.select(*[c.alias(n) for c, n in zip(
        [F.col("_id"), F.col("_v")] + ([F.col("_blk")] if block_col else []),
        ["id_b", "_vb"] + (["_blk"] if block_col else []))])
    joined = (a.join(b, on=["_blk"]) if block_col else a.crossJoin(b)).filter(
        F.col("id_a") < F.col("id_b")
    )
    return (
        joined.select(
            "id_a", "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), round_to).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# --------------------------------------------------------------------- #
# LSH (signed random projection) scale path

def _hyperplane(dim: int, plane: int, seed: int) -> list[float]:
    """Deterministic pseudo-gaussian-ish hyperplane from hash mixing.

    Uniform in [-1, 1) per component — for SRP only the direction's
    randomness matters, not gaussianity.
    """
    out = []
    for i in range(dim):
        h = (plane * 1_000_003 + i) ^ (seed * 0x9E3779B9)
        h = (h * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        h ^= h >> 31
        out.append((h % (1 << 24)) / float(1 << 23) - 1.0)
    return out


def srp_signature(
    df: DataFrame,
    dim: int,
    num_planes: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
    out_col: str = "srp_bucket",
) -> DataFrame:
    """Add an int bucket column: bit b = sign(v · hyperplane_b).

    Pure JVM: each plane is a literal array; the dot is a zip_with fold.
    2^num_planes expected buckets; cosine-similar vectors collide with
    probability (1 - θ/π)^num_planes.
    """
    sig: Column = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, p, seed)])
        bit = (dot(F.col(vec_col), plane) > 0).cast("long")
        sig = sig + F.shiftleft(bit, p)
    return df.withColumn(out_col, sig)


#: Hard ceiling on the quantizer size ``ivf_assign`` will collect to the
#: driver. 64k centroids × dim 1024 float64 ≈ 512 MB worst case — the
#: outer bound of what a driver-side broadcast matrix should ever be.
#: Larger quantizers need a distributed coarse assignment (SRP-prefilter
#: the centroids, then a bucket equi-join), not a bigger collect.
IVF_CENTROID_CAP = 65536


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str | None = None,
    n: int = 1,
    out_col: str = "cell",
    centroid_cap: int = IVF_CENTROID_CAP,
) -> DataFrame:
    """Assign each vector to its ``n`` nearest centroids by cosine
    (ties broken by centroid id) — the IVF coarse quantizer.

    Centroids are collected to the driver (their count is CAPPED at
    ``centroid_cap`` — the collect fetches at most cap+1 rows and
    raises if the quantizer exceeds it, so driver memory is bounded no
    matter the corpus size) and the assignment is one vectorized Arrow
    matmul per batch against the broadcast centroid matrix — the corpus
    never shuffles. n=1 builds the index (one cell per vector);
    n=nprobe>1 expands queries to their probe list. Output: input
    columns + ``out_col`` (exploded — one row per assigned cell).
    """
    import numpy as np

    cvec = centroid_vec_col or vec_col
    rows = [(r[centroid_id_col], r[cvec])
            for r in centroids.select(centroid_id_col, cvec)
            .limit(centroid_cap + 1).collect()]
    if len(rows) > centroid_cap:
        raise ValueError(
            f"IVF quantizer exceeds centroid_cap={centroid_cap}; "
            "use a fixed num_centroids sample (ivf_topk) or a "
            "distributed coarse assignment instead of growing the "
            "driver-side centroid matrix")
    rows.sort(key=lambda r: r[0])
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    cnorms = np.linalg.norm(mat, axis=1)
    cnorms[cnorms == 0] = 1.0
    k = min(n, len(ids))

    @F.pandas_udf("array<long>")
    def _nearest(v: pd.Series) -> pd.Series:
        arr = np.stack(v.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(arr, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        # dot-then-divide (not normalize-then-dot): mirrors the SQL
        # twin's list_inner_product / (sqrt·sqrt) rounding behavior
        sims = (arr @ mat.T) / (norms * cnorms)  # (batch, n_centroids)
        # top-k by (-sim, centroid_id): lexsort is stable + total order
        order = np.lexsort((np.broadcast_to(ids, sims.shape), -sims),
                           axis=-1)[:, :k]
        return pd.Series(list(ids[order]))

    out = df.withColumn("_cells", _nearest(F.col(vec_col)))
    return out.select(*df.columns, F.explode("_cells").alias(out_col))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 3,
    num_centroids: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF approximate top-k: the second ANN scale path next to
    multi-table SRP-LSH.

    Single-pass IVF with a FIXED-SIZE deterministic centroid sample:
    the ``num_centroids`` corpus rows with the smallest
    ``md5(cast(id as string))`` (a uniform pseudo-random sample that
    any engine can replay — DuckDB: ``ORDER BY md5(CAST(id AS
    VARCHAR)) LIMIT C``). No iterative k-means: deterministic,
    oracle-replayable, and at corpus scale a uniform sample is as good
    a coarse quantizer as one Lloyd round. Unlike a stride-based rule,
    the quantizer size is INDEPENDENT of corpus rows — the driver-side
    centroid matrix stays ``num_centroids × dim`` whether the corpus is
    1e4 or 1e12 vectors, and ``ivf_assign`` asserts the cap before
    collecting. The selection itself is a per-partition top-C merge
    (Spark plans orderBy+limit as TakeOrderedAndProject) — one scan,
    no full shuffle, driver holds C rows.

    Corpus vectors land in exactly one cell; queries probe their
    ``nprobe`` nearest cells; exact cosine top-k within the probed
    union. The cell equi-join is shuffle-partitionable on C keys and
    the corpus is scanned once — O(N·nprobe/C) scored pairs per query
    instead of O(N).
    Output: (query_id, neighbor_id, cos, rank).
    """
    if not (0 < num_centroids <= IVF_CENTROID_CAP):
        raise ValueError(
            f"num_centroids must be in (0, {IVF_CENTROID_CAP}]")
    cents = (
        corpus.select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
        .orderBy(F.md5(F.col("centroid_id").cast("string").cast("binary")),
                 F.col("centroid_id"))
        .limit(num_centroids)
    )
    c = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cv")),
        cents, vec_col="_cv", centroid_vec_col=vec_col, n=1)
    q = ivf_assign(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv")),
        cents, vec_col="_qv", centroid_vec_col=vec_col, n=nprobe)
    joined = c.join(q, on=["cell"]).filter(
        F.col("query_id") != F.col("neighbor_id"))
    scored = joined.select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("_qv"), F.col("_cv")), round_to).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def srp_buckets(
    vec: Column,
    dim: int,
    num_planes: int,
    num_tables: int,
    seed: int = 42,
) -> Column:
    """array<long> of per-table SRP buckets (table t uses planes seeded
    seed + 1000·t, identical to calling srp_signature per table).

    All num_tables × num_planes hyperplanes live in ONE nested literal
    array and the dots are a single transform+fold expression — versus
    one fold expression per plane, whose duplicated 64-literal arrays
    blow the plan and codegen size up (measured ~6x slower at 16×4
    planes)."""
    # One vectorized Arrow batch matmul: (batch × dim) @ (dim × T·P) →
    # sign bits → per-table bucket ints. T·P separate JVM fold
    # expressions were measured 5-70x slower here: higher-order
    # functions run interpreted (no whole-stage codegen), and any
    # shared intermediate bits column gets its defining expression
    # re-evaluated per reference. numpy float64 matmul reproduces the
    # sequential fold's sign bit-for-bit on this data (verified against
    # the DuckDB list_inner_product oracle); at corpus scale this is
    # also the right shape — one BLAS call per Arrow batch.
    import numpy as np

    planes_m = np.array(
        [_hyperplane(dim, p, seed + 1000 * t)
         for t in range(num_tables) for p in range(num_planes)],
        dtype=np.float64,
    ).T  # (dim, T*P)
    weights = (1 << np.arange(num_planes)).astype(np.int64)
    nt, npl = num_tables, num_planes

    @F.pandas_udf("array<long>")
    def _buckets(v: pd.Series) -> pd.Series:
        arr = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (arr @ planes_m) > 0                       # (n, T*P)
        bk = bits.reshape(len(arr), nt, npl) @ weights    # (n, T)
        return pd.Series(list(bk))

    return _buckets(vec)


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    round_to: int = 6,
    probe_bits: int = 0,
    num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the query's SRP bucket (+ neighbors).

    Recall < 1 by construction (bucket-boundary misses); the exact
    baseline (cosine_topk) is the oracle to measure that recall against.
    The join is an equi-join on bucket — shuffle-partitionable, no
    broadcast requirement, so the query side may be arbitrarily large
    (batch ANN over the whole corpus against itself included).

    ``probe_bits=1`` enables multi-probe: each query also probes the
    ``num_planes`` buckets at Hamming distance 1 (one sign bit flipped),
    recovering most boundary misses. This is what lets ``num_planes``
    be raised for parallelism (2^planes buckets must be ≥ O(cluster
    cores), or the bucket equi-join caps out) without recall collapse.
    Implemented by EXPLODING the query side into its probe buckets and
    keeping the equi-join shape — never a hamming-distance theta-join
    (which would degenerate to a cross product at scale).

    ``num_tables=L`` is classical multi-table LSH: L independent plane
    sets (seed + 1000·t), candidate = union over tables. Recall is
    1-(1-p^h)^L, the standard knob when neighbors are far (low cosine):
    measured on the sf0.01 embeddings, h=4/L=16 gives recall@5 ≈ 0.94
    where a single 12-plane table gives ≈ 0.02. Join parallelism is
    L × 2^h keys on the (table, bucket) equi-join.
    """
    if probe_bits not in (0, 1):
        raise ValueError("probe_bits must be 0 or 1")
    if num_tables < 1:
        raise ValueError("num_tables >= 1")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        srp_buckets(F.col(vec_col), dim, num_planes, num_tables, seed)
        .alias("_bk"),
    ).select("neighbor_id", "_cv",
             F.posexplode("_bk").alias("t", "b"))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        srp_buckets(F.col(vec_col), dim, num_planes, num_tables, seed)
        .alias("_bk"),
    )
    qsigs = []
    for t in range(num_tables):
        base = [F.element_at("_bk", t + 1)]
        if probe_bits == 1:
            base += [F.element_at("_bk", t + 1).bitwiseXOR(F.lit(1 << p))
                     for p in range(num_planes)]
        qsigs += [F.struct(F.lit(t).alias("t"), bb.alias("b")) for bb in base]
    q = q.select(
        "query_id", "_qv", F.explode(F.array(*qsigs)).alias("_tb"),
    ).select("query_id", "_qv", "_tb.t", "_tb.b")
    joined = c.join(q, on=["t", "b"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    if num_tables > 1:
        # the same pair can collide in several tables; dedupe before
        # ranking (vectors ride along — identical across dupes)
        joined = joined.dropDuplicates(["query_id", "neighbor_id"])
    scored = joined.select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("_qv"), F.col("_cv")), round_to).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def semdedup(
    corpus: DataFrame,
    threshold: float = 0.7,
    num_centroids: int = 32,
    max_cell: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """SemDedup-style semantic deduplication (Abbas et al. 2023):
    cluster the corpus with the IVF coarse quantizer, then inside each
    cluster drop every vector that has a LOWER-id neighbor with cosine
    >= ``threshold`` (greedy keep-lowest, the same keep rule as
    ``exact_dedup``). Pairwise comparison only ever happens WITHIN a
    cell, so the quadratic term is bounded by cell size instead of
    corpus size — the property that makes semantic dedup tractable at
    10^9+ embeddings where an all-pairs pass cannot run.

    Clustering reuses :func:`ivf_topk`'s deterministic fixed-size
    quantizer (the ``num_centroids`` rows with smallest md5(id) —
    replayable by any engine, centroid matrix independent of corpus
    rows). Cells larger than ``max_cell`` are excluded from pair
    generation entirely (every member kept, ``cell_skipped`` flag set):
    a degenerate quantizer region must cost O(max_cell²) at worst, not
    silently go quadratic — same guard philosophy as
    ``minhash_lsh_pairs(max_bucket=...)``. The within-cell self-join is
    an equi-join on cell (shuffle keyed by ``num_centroids`` values;
    size ``num_centroids`` >= O(cluster cores) in production).

    Output: one row per corpus vector —
    (id, cell, cell_skipped, kept) with kept=false exactly for the
    dropped duplicates.
    """
    cents = (
        corpus.select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
        .orderBy(F.md5(F.col("centroid_id").cast("string").cast("binary")),
                 F.col("centroid_id"))
        .limit(num_centroids)
    )
    # materialize the assignment once: it feeds FOUR consumers (cell
    # sizes, both self-join sides, the final keep join) and the Arrow
    # matmul UDF would otherwise re-run per consumer
    assigned = ivf_assign(
        corpus.select(F.col(id_col).alias("_id"),
                      F.col(vec_col).alias("_v")),
        cents, vec_col="_v", centroid_vec_col=vec_col, n=1,
    ).localCheckpoint(eager=True)
    sizes = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("_cell_n"))
    flagged = assigned.join(F.broadcast(sizes), on="cell").withColumn(
        "cell_skipped", F.col("_cell_n") > F.lit(max_cell))
    # hoist the per-vector norm out of the pair loop: norms are two
    # interpreted folds PER VECTOR here instead of per pair, and the
    # pair expression stays arithmetically identical to cosine()
    # (dot / (na*nb) — same double ops, same rounding as the SQL twin)
    eligible = flagged.filter(~F.col("cell_skipped")) \
        .select("cell", "_id", "_v", l2_norm(F.col("_v")).alias("_n"))
    a = eligible.select(
        F.col("cell"), F.col("_id").alias("_ida"),
        F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    b = eligible.select(
        F.col("cell"), F.col("_id").alias("_idb"),
        F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    denom = F.col("_na") * F.col("_nb")
    pair_cos = F.when(denom > 0,
                      dot(F.col("_va"), F.col("_vb")) / denom) \
        .otherwise(F.lit(0.0))
    drops = (
        a.join(b, on="cell")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(F.round(pair_cos, round_to) >= F.lit(threshold))
        .select(F.col("_idb").alias("_id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        flagged.join(drops, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            "cell",
            "cell_skipped",
            F.col("_dropped").isNull().alias("kept"),
        )
    )


def kmeans_refine(
    corpus: DataFrame,
    num_centroids: int = 32,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Lloyd refinement of the deterministic IVF quantizer: start from
    the fixed-size md5-sample centroids (the q51 recipe), then for each
    of ``n_iter`` rounds (a) assign every vector to its nearest
    centroid by cosine and (b) replace each centroid with the
    element-wise mean of its members. One or two rounds noticeably
    tighten the cells the ANN / SemDedup paths probe; the sample init
    keeps the whole procedure deterministic and replayable in SQL
    (no RNG, ties broken by centroid id then position).

    Plan per round: one Arrow-matmul assignment pass over the corpus
    (no shuffle — broadcast centroid matrix), then ``posexplode`` of
    the member vectors to (cell, pos, val) rows collapsing into
    per-(cell, pos) partial-aggregated means — shuffle volume is
    O(num_centroids × dim), never corpus-sized — and re-assembly via
    ``array_sort(collect_list(struct(pos, val)))`` (deterministic
    order without relying on shuffle arrival order). Empty cells keep
    their previous centroid (classic Lloyd convention), implemented as
    a left join back to the prior round's frame.

    Output: (cell, centroid array<double>, n_members) after the final
    refinement, rounded to ``round_to`` for cross-engine comparison.
    """
    if n_iter < 1:
        raise ValueError("n_iter >= 1")
    cents = (
        corpus.select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
        .orderBy(F.md5(F.col("centroid_id").cast("string").cast("binary")),
                 F.col("centroid_id"))
        .limit(num_centroids)
    )
    vecs = corpus.select(F.col(id_col).alias("_id"),
                         F.col(vec_col).cast("array<double>").alias("_v"))
    prior = cents.select(
        F.col("centroid_id").alias("cell"),
        F.col(vec_col).cast("array<double>").alias("centroid"),
    )
    for _ in range(n_iter):
        assigned = ivf_assign(vecs, prior, vec_col="_v",
                              centroid_id_col="cell",
                              centroid_vec_col="centroid", n=1)
        means = (
            assigned.select("cell", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cell", "pos").agg(F.avg("val").alias("m"),
                                        F.count(F.lit(1)).alias("n"))
            .groupBy("cell").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"]).alias("centroid"),
                F.max("n").alias("n_members"),
            )
        )
        # empty cells (no members this round) keep the prior centroid
        prior = (
            prior.select("cell", F.col("centroid").alias("_prev"))
            .join(means, on="cell", how="left")
            .select(
                "cell",
                F.coalesce(F.col("centroid"), F.col("_prev"))
                .alias("centroid"),
                F.coalesce(F.col("n_members"), F.lit(0)).alias("n_members"),
            )
            .localCheckpoint(eager=True)  # iterative: truncate lineage
        )
    return prior.select(
        "cell",
        F.transform("centroid", lambda x: F.round(x, round_to))
        .alias("centroid"),
        F.col("n_members").cast("bigint").alias("n_members"),
    )
