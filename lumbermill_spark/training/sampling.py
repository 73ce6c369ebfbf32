"""Deterministic source-mix sampling for training-data curation.

A pretraining corpus is a MIXTURE: target proportions per source
(web / wiki / books / code ...) rarely match the raw crawl counts, so
the pipeline computes per-source sampling rates that hit the target
mix using downsampling only, then applies them with a deterministic
hash-threshold keep decision (NOT ``df.sample`` — rows must keep or
drop identically across retries, resumed jobs and reruns, or the
checkpoint/lineage story breaks).

Scale shape: ``mix_rates`` is one groupBy over the strata column
(#strata output rows — tiny) plus a scalar min folded in via a
broadcast cross join; ``stratified_sample`` broadcasts the rate table
onto the corpus and filters with a pure-JVM md5 threshold — no
shuffle of the fact side, embarrassingly parallel at any corpus size.

The hash is :func:`~lumbermill_spark.training.dedup.md5_hash60`
(first 15 md5 hex digits as int60) so the keep decision is computable
bit-identically outside Spark (DuckDB:
``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``) — the whole
sampling pass is oracle-checkable, and a resumed job re-derives the
exact same kept set from the data alone.

Reference parity note: the reference's event-stream sampling knob is
the rate-limited / modulo Throttle path
(`lumbermill/misc/Throttle.py`); the mixture computation itself has
no reference analog — it is part of the training-pipeline surface
this engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lumbermill_spark.training.dedup import md5_hash60

TWO_POW_60 = float(1 << 60)


def mix_rates(
    df: DataFrame,
    strata_col: str,
    target: dict[str, float] | Column,
    count_col: str = "n_docs",
    rate_col: str = "rate",
) -> DataFrame:
    """Per-stratum downsampling rates that realize a target mixture.

    ``target`` maps stratum -> desired proportion (must cover every
    stratum present; proportions need not sum to 1 — they are treated
    as relative weights). Alternatively pass a Column expression that
    computes the weight from the strata column (keeps the plan free of
    a large literal map when weights are derivable).

    With raw counts ``n_s`` and weights ``p_s``, the largest total
    achievable by downsampling alone is ``T = min_s(n_s / p_s)`` and
    each stratum keeps ``rate_s = p_s * T / n_s`` (<= 1 by
    construction; the binding stratum keeps everything). Returns one
    row per stratum: (strata_col, count_col, rate_col).

    The min folds in via a one-row broadcast cross join — #strata rows
    total, never corpus-sized.
    """
    if isinstance(target, Column):
        weight = target
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in target.items() for x in kv])
        weight = mapping[F.col(strata_col)]
    counts = (
        df.groupBy(strata_col)
        .agg(F.count("*").alias(count_col))
        .withColumn("_w", weight.cast("double"))
    )
    bad = counts.filter(F.col("_w").isNull() | (F.col("_w") <= 0)).limit(1)
    if bad.count() > 0:
        missing = bad.collect()[0][strata_col]
        raise ValueError(
            f"target mixture has no positive weight for stratum "
            f"{missing!r}; every stratum present in the data needs one")
    total = counts.agg(
        F.min(F.col(count_col) / F.col("_w")).alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            strata_col,
            count_col,
            (F.col("_w") * F.col("_t") / F.col(count_col)).alias(rate_col),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: DataFrame,
    id_col: str = "doc_id",
    salt: str = "mix",
    rate_col: str = "rate",
) -> DataFrame:
    """Deterministic hash-threshold sample: keep a row iff
    ``md5_hash60(id || ':' || salt) < rate * 2^60`` for its stratum's
    rate (``rates`` as produced by :func:`mix_rates`). Changing
    ``salt`` draws an independent sample; the same salt always
    reproduces the same kept set.

    The rate table is broadcast (#strata rows) — the corpus side never
    shuffles. Returns df's columns unchanged, filtered.
    """
    key = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
    return (
        df.join(F.broadcast(rates.select(strata_col, rate_col)), strata_col)
        .filter(md5_hash60(key) < F.col(rate_col) * F.lit(TWO_POW_60))
        .select(*[F.col(c) for c in df.columns])
    )


def token_budget_trim(
    df: DataFrame,
    budget: int,
    strata_col: str = "source",
    tokens_col: str = "n_tok",
    id_col: str = "doc_id",
    salt: str = "budget",
) -> DataFrame:
    """Deterministic budget-constrained selection: per stratum, keep
    documents in md5-hash order until the cumulative ``tokens_col``
    would exceed ``budget`` ("give me <=1B tokens per source,
    reproducibly"). A document that would push past the budget is
    dropped — totals never exceed the budget; the kept set is identical
    across reruns/resumes and changes only with ``salt``.

    Plan: one window shuffle per stratum (hash-order cumsum). Exact
    budgeting is inherently a per-stratum ordered scan, so a single
    giant stratum serializes in one task — for that shape use
    :func:`mix_rates` + :func:`stratified_sample` (rate =
    budget/total, approximate but shuffle-free) instead.
    """
    from pyspark.sql import Window

    key = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
    w = (Window.partitionBy(strata_col)
         .orderBy(md5_hash60(key), F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("_cum", F.sum(tokens_col).over(w))
            .where(F.col("_cum") <= budget)
            .drop("_cum"))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in the
    split whose cumulative-weight interval contains
    ``md5_hash60(id:salt) / 2^60`` — the standard reproducible eval
    split. Disjoint and exhaustive by construction; the same
    (id, salt) always lands in the same split across retries, resumes
    and cluster sizes (never ``randomSplit``, which is
    partitioning-dependent), and changing ``salt`` redraws
    independently. Pure-JVM hash + chained comparisons: zero shuffle,
    embarrassingly parallel, and bit-replayable outside Spark (the
    DuckDB twin uses the same md5 interval arithmetic).

    ``weights``: {split_name: weight}, weights > 0, normalized
    internally (pass {"train": 0.98, "val": 0.01, "test": 0.01}).
    """
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be non-empty and positive")
    total = float(sum(weights.values()))
    key = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
    u = md5_hash60(key)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = u < F.lit(cum * TWO_POW_60)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def epoch_shuffle_key(
    df: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    key_col: str = "shuffle_key",
) -> DataFrame:
    """Epoch-stable deterministic global shuffle ORDER for training
    data: adds ``key_col`` = md5_hash60(id:epoch:salt). Sorting by
    (key, id) is a uniform permutation that is identical across
    retries, resumes and cluster sizes (``df.orderBy(rand())`` is
    none of those), and each epoch draws an independent permutation.

    Scale contract: this adds the KEY only — materialize the order
    with ``repartitionByRange(key_col, id_col)`` +
    ``sortWithinPartitions`` at write time (a range-partitioned sort,
    no single-reducer global rank). A row_number rank over the whole
    table would be a one-partition window; don't.
    """
    key = F.concat_ws(":", F.col(id_col).cast("string"),
                      F.lit(str(int(epoch))), F.lit(salt))
    return df.withColumn(key_col, md5_hash60(key))


def stratified_cap(
    df: DataFrame,
    strata_col: str = "source",
    cap: int = 100,
    id_col: str = "doc_id",
    salt: str = "cap",
    prefilter_factor: int = 8,
) -> DataFrame:
    """Exact deterministic per-stratum cap: keep the ``cap`` rows with
    the smallest ``md5_hash60(id:salt)`` in each stratum (ties broken
    by id — every row has a distinct key, so the kept SET is unique
    and reproducible across reruns, resumes and cluster sizes).

    Complements :func:`stratified_sample` (rate-based: kept count is
    binomial around rate·n) — this is the "exactly ≤ K docs per
    source" contract an eval-set builder needs.

    Scale plan: a naive row_number window sorts every stratum in full.
    Instead the corpus is pre-filtered to hash < prefilter_factor ·
    cap / n_s (per-stratum counts broadcast — tiny), so the window
    sorts only ~factor·cap candidate rows per stratum regardless of
    corpus size. Exactness is preserved, not assumed: the kept rows
    are the cap globally-smallest hashes, which the prefilter can only
    miss if a stratum yields < cap candidates (P < 1e-40 at factor 8
    by Chernoff); that case is detected by comparing candidate counts
    and the affected stratum falls back to its full row set. Strata
    with n_s ≤ cap skip straight through (rate 1).
    """
    from pyspark.sql import Window

    key = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
    u = md5_hash60(key)
    # null-SAFE stratum joins throughout: a null stratum is a group of
    # its own (capped like any other), never silently dropped by an
    # equi-join's null-never-matches rule
    skey = F.col(strata_col).eqNullSafe(F.col("_sk"))
    counts = (df.groupBy(F.col(strata_col).alias("_sk"))
              .agg(F.count(F.lit(1)).alias("_ns")))
    rate = F.least(F.lit(1.0),
                   F.lit(float(prefilter_factor * cap)) /
                   F.col("_ns").cast("double"))
    cand = (df.withColumn("_u", u)
            .join(F.broadcast(counts), skey)
            .filter(F.col("_u") < rate * F.lit(TWO_POW_60))
            .drop("_sk", "_ns")
            .localCheckpoint(eager=False))
    # left join FROM counts so a stratum with zero surviving candidates
    # (absent from cand entirely) is still flagged short
    cand_counts = (cand.groupBy(F.col(strata_col).alias("_ck"))
                   .agg(F.count(F.lit(1)).alias("_nc")))
    short = (counts.join(cand_counts,
                         F.col("_sk").eqNullSafe(F.col("_ck")), "left")
             .filter(F.coalesce(F.col("_nc"), F.lit(0)) <
                     F.least(F.lit(cap), F.col("_ns")))
             .select("_sk"))
    # shortfall strata (vanishingly rare; exactness guard): replace
    # their candidates with the full stratum. Broadcast anti/semi joins
    # against a frame that is almost always empty.
    safe = cand.join(F.broadcast(short), skey, "left_anti")
    rescue = (df.withColumn("_u", u)
              .join(F.broadcast(short), skey, "left_semi"))
    w = Window.partitionBy(strata_col).orderBy("_u", id_col)
    return (safe.unionByName(rescue)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .select(*[F.col(c) for c in df.columns]))
