"""Skew handling: salted repartitioning and two-phase aggregation.

The reference statically splits work across forked workers
(/root/reference/lumbermill/LumberMill.py:426-431, input/File.py:105-119)
and has no notion of key skew — a hot key lands on one worker. The
north_rule makes skew a first-class requirement: the synthetic corpus
is deliberately skewed on ``source`` (apache=60%), and at 10^12 rows a
groupBy/repartition on ``source`` alone puts 60% of the data through
one reducer.

Three tools, composable with everything else in the package:

- ``salt_col``:            deterministic salt from a high-cardinality
                           column (doc_id), so re-runs are stable.
- ``salted_repartition``:  spread a hot key over ``salt`` buckets —
                           even partition layout for sink writes and
                           downstream per-partition work.
- ``salted_agg``:          two-phase aggregate for algebraic functions
                           (count/sum/min/max): partial per
                           (key, salt) → final per key. The partial
                           shuffle carries salt× more rows per key,
                           but each reducer gets ≤ 1/salt of the hot
                           key's data.

AQE (spark.sql.adaptive.skewJoin, enabled in session.py) already splits
skewed JOIN partitions at runtime; these helpers cover aggregation and
explicit-repartition skew, which AQE does not rebalance pre-write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(entropy: Column | str, buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of a high-cardinality
    column (NOT rand() — re-runs and resumes must place rows
    identically, BASELINE determinism requirement)."""
    col = F.col(entropy) if isinstance(entropy, str) else entropy
    return F.pmod(F.xxhash64(col), F.lit(buckets)).cast("int")


def salted_repartition(
    df: DataFrame,
    key: str | Column,
    buckets: int = 16,
    entropy: str | Column = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """repartition on (key, salt): a key holding p% of the data spans
    ``buckets`` partitions instead of one, bounding any partition at
    ~p/buckets. Layout is deterministic given the input."""
    kcol = F.col(key) if isinstance(key, str) else key
    s = salt_col(entropy, buckets)
    if num_partitions:
        return df.repartition(num_partitions, kcol, s)
    return df.repartition(kcol, s)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
    entropy: str | Column = "doc_id",
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: output_name -> (function, column) with function in
    {count, sum, min, max} (the algebraic set that composes as
    partial→merge; avg = sum/count built on top by the caller).

        salted_agg(df, ["source"], {"n": ("count", "*"),
                                    "tok": ("sum", "n_tok")})

    Phase 1 groups by (keys, salt) — the hot key's rows split across
    ``buckets`` reducers; phase 2 merges the ≤ buckets×|keys| partials.
    Note Spark's hash aggregate already does map-side partial
    aggregation, which de-skews plain counts; this explicit form is for
    when the per-key state is big (collect_set-like) or when the
    partition layout itself must stay balanced end-to-end.
    """
    merge_fn = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    part_exprs = []
    final_exprs = []
    for name, (fn, colname) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"unsupported salted agg function {fn!r}")
        c = F.lit(1) if colname == "*" else F.col(colname)
        part = (F.count(c) if fn == "count" else getattr(F, fn)(c))
        part_exprs.append(part.alias(f"_p_{name}"))
        final_exprs.append(merge_fn[fn](F.col(f"_p_{name}")).alias(name))
    partial = (
        df.withColumn("_salt", salt_col(entropy, buckets))
        .groupBy(*keys, "_salt")
        .agg(*part_exprs)
    )
    return partial.groupBy(*keys).agg(*final_exprs)


def ensure_min_parallelism(
    df: DataFrame,
    min_partitions: int | None = None,
) -> DataFrame:
    """Fan-out guard for coarse inputs: round-robin repartition up to
    the session's default parallelism, ONLY when the current plan is
    narrower.

    Why: a parquet file with a single row group scans as ONE partition
    regardless of cluster size (splits land on row-group boundaries),
    which serializes every downstream explode / regex / decode stage on
    one task — the CPU-heavy fan-out work that dominates curation ops.
    At production scale inputs arrive in thousands of splits, the guard
    reads the partition count off the compiled plan (no job) and
    returns the frame untouched — so callers pay a real shuffle only in
    the small-file case, where the data is by definition tiny.

    Deliberately round-robin (not keyed): the consumers explode and
    immediately partial-aggregate, so placement is irrelevant and
    round-robin is the even-layout choice.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def write_bucketed(df, table: str, key: str | list[str],
                   buckets: int = 64, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a BUCKETED (and bucket-sorted) table on its
    join/aggregation key — the co-located-join primitive: two tables
    bucketed the same way join with ZERO exchanges (locked by
    tests/test_plans.py::test_bucketed_join_is_shuffle_free), and a
    groupBy on the key skips its exchange too. This is what turns a
    repeated big-big join (fact x fact on doc_id at 100 TB) from a
    per-query shuffle of both sides into a one-time layout cost at
    ingest. Parquet/Hive bucketing here; with the Iceberg runtime the
    same layout is ``bucket(N, key)`` in ``partitionedBy`` (iceberg.py)
    and the co-location survives catalog round-trips.

    ``buckets`` sizes task parallelism for every downstream co-located
    stage — pick ~2-4x executor-core count at the target scale.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.mode(mode).format("parquet").saveAsTable(table)
