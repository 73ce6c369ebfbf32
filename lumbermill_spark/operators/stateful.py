"""Stateful / flatMap operators: MergeEvent sessionization, Permutate.

Reference modules:
- modifier.MergeEvent (/root/reference/lumbermill/modifier/MergeEvent.py:115-171):
  buffer events per ``buffer_key``; a new buffer starts when
  ``start_pattern`` matches (or flushes when ``end_pattern`` matches);
  on flush, concatenate ``match_field`` across buffered events with
  ``glue`` into one merged event.
- modifier.Permutate (/root/reference/lumbermill/modifier/Permutate.py:31-69):
  emit one event per r-length permutation of a list field, zipping the
  permutation into ``target_fields``, optionally attaching per-value
  context from ``context_data_field``.

Batch MergeEvent is classic sessionization: session id = running count
of start-marks per key in event order, then group-concat. The running
count is a window function — one shuffle on (key), which is the minimum
possible: merge semantics are inherently ordered-per-key. At 100 TB the
key space (sender host) is large, so partitions stay balanced; a single
hot key is the same pathology the reference has (its per-key buffer
lives on one worker too).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_event(
    df: DataFrame,
    buffer_key: str | Column,
    order_by: str | Column,
    match_field: str = "data",
    start_pattern: str | None = None,
    end_pattern: str | None = None,
    glue: str = "",
    keep_fields: list[str] | None = None,
) -> DataFrame:
    """Group-and-concatenate per session.

    start_pattern: a row matching it begins a NEW session (multiline
    log reassembly: the un-indented first line). end_pattern: a row
    matching it ENDS the current session (the next row starts a new
    one). Exactly one of the two is typical; both may be given
    (MergeEvent.py:128-141 evaluates start first, then end).
    Rows before the first start-mark form session 0, matching the
    reference's behavior of buffering from the first event seen.

    Output: one row per (buffer_key, session) with ``match_field`` =
    concatenated values, ``n_merged`` = event count, plus first-row
    values of ``keep_fields``.
    """
    kcol = F.col(buffer_key) if isinstance(buffer_key, str) else buffer_key
    ocol = F.col(order_by) if isinstance(order_by, str) else order_by
    src = F.col(match_field)

    w = Window.partitionBy(kcol).orderBy(ocol)
    if start_pattern is not None:
        is_start = src.rlike(start_pattern).cast("int")
        session = F.sum(is_start).over(w)
    elif end_pattern is not None:
        is_end = src.rlike(end_pattern).cast("int")
        # a row ending a session belongs to it; the NEXT row increments
        prev_end = F.lag(is_end, 1, 0).over(w)
        session = F.sum(prev_end).over(w)
    else:
        session = F.lit(0)

    keyed = df.withColumn("_mk", kcol).withColumn("_session", session) \
              .withColumn("_ord", ocol)
    aggs = [
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_ord", src.alias("v")))),
                lambda s: s["v"],
            ),
            glue,
        ).alias(match_field),
        F.count(F.lit(1)).alias("n_merged"),
    ]
    for kf in keep_fields or []:
        aggs.append(F.min_by(F.col(kf), F.col("_ord")).alias(kf))
    return (
        keyed.groupBy(F.col("_mk").alias("buffer_key"), "_session")
        .agg(*aggs)
        .withColumnRenamed("_session", "session")
    )


def sessionize_gap(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    gap: int = 1800,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization (batch twin of
    streaming/pipeline.py's ``session_window`` aggregation): a new
    session starts when the key has been silent for more than ``gap``.

    ``gap`` is in seconds when ``ts`` is a timestamp column, else in
    ``ts``'s own units. Adds ``session_col`` = 0-based session index
    per key; the caller aggregates (duration, events/session, ...).

    Plan: one shuffle on the key; boundary = lag-diff > gap, session
    index = running sum of boundaries — both over the same window, so
    Spark plans a single sort. Same inherently-per-key-ordered shape
    (and the same hot-key caveat) as merge_event above.
    """
    from pyspark.sql import types as T

    tcol = F.col(ts)
    if isinstance(df.schema[ts].dataType,
                  (T.TimestampType, T.TimestampNTZType)):
        tcol = F.unix_timestamp(tcol)
    w = Window.partitionBy(key).orderBy(tcol)
    prev = F.lag(tcol).over(w)
    boundary = F.when(prev.isNull() | ((tcol - prev) > gap), 1).otherwise(0)
    return df.withColumn(
        session_col, (F.sum(boundary).over(w) - F.lit(1)).cast("bigint"))


def permutate(
    df: DataFrame,
    source_field: str,
    target_fields: list[str],
    length: int | None = None,
    drop_source: bool = True,
) -> DataFrame:
    """One output row per r-length permutation (ordered, no repeats by
    position) of the array in ``source_field``; element i of the
    permutation lands in target_fields[i].

    Pure JVM: r chained posexplodes over the SAME array with
    position-inequality filters — no Python, no driver loop over data.
    r is len(target_fields) like the reference (Permutate.py:42-44).
    """
    r = length or len(target_fields)
    if r != len(target_fields):
        raise ValueError("length must equal len(target_fields)")
    out = df
    pos_cols: list[str] = []
    for i, tf in enumerate(target_fields):
        pc = f"_perm_pos{i}"
        out = out.select(
            "*", F.posexplode(F.col(source_field)).alias(pc, tf)
        )
        for prev in pos_cols:
            out = out.filter(F.col(pc) != F.col(prev))
        pos_cols.append(pc)
    out = out.drop(*pos_cols)
    if drop_source:
        out = out.drop(source_field)
    return out


def upsert_latest(
    base: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    version: str,
) -> DataFrame:
    """SCD-1 merge (the Iceberg ``MERGE INTO`` analog in pure
    DataFrame ops): union the incoming batch onto the base table and
    keep, per key, the row with the highest ``version`` (update wins at
    equal version — the batch is newer information). Insert-only keys
    pass through; deletes are an upstream filter.

    Plan: one union + one partial-aggregated max_by on the key — no
    join, no window sort; the shuffle carries one candidate row per
    (key, input partition) after map-side combine. At table scale this
    is the compaction pass a log pipeline runs per ingest cycle.

    Ties: ``max_by`` on the struct (version, is_update) makes the
    update side win deterministically at equal version.
    """
    keys = [key] if isinstance(key, str) else list(key)
    cols = base.columns
    if set(cols) != set(updates.columns):
        raise ValueError("base and updates must share a schema")
    b = base.select(*cols).withColumn("_upd", F.lit(0))
    u = updates.select(*cols).withColumn("_upd", F.lit(1))
    allr = b.unionByName(u)
    payload = F.struct(*[F.col(c) for c in cols])
    won = (allr.groupBy(*keys)
           .agg(F.max_by(payload,
                         F.struct(F.col(version), F.col("_upd")))
                .alias("_row")))
    return won.select(*[F.col("_row")[c].alias(c) for c in cols])


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data-capture diff between two snapshots of a table:
    one row per key with status ``added`` / ``removed`` / ``changed``
    / ``unchanged`` (the regression check a pipeline runs after a
    re-ingest, code change, or backfill — 'what did this deploy do to
    the output table?').

    Plan: ONE full outer join on the key; row equality is a struct
    comparison of ``compare_cols`` (default: all non-key columns both
    sides share), evaluated null-safely (``eqNullSafe`` — a null field
    equals null, so nullable columns don't all report changed).
    Output: key columns + status + the new side's compare struct
    (null for removed rows).
    """
    keys = [key] if isinstance(key, str) else list(key)
    cols = compare_cols or [c for c in old.columns
                            if c not in keys and c in new.columns]
    o = old.select(*keys, F.struct(*cols).alias("_old"))
    n = new.select(*keys, F.struct(*cols).alias("_new"))
    j = o.join(n, on=keys, how="full_outer")
    status = (F.when(F.col("_old").isNull(), "added")
              .when(F.col("_new").isNull(), "removed")
              .when(F.col("_old").eqNullSafe(F.col("_new")), "unchanged")
              .otherwise("changed"))
    return j.select(*keys, status.alias("status"), F.col("_new"))


def session_paths(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    step_col: str = "event_type",
    gap: int = 1800,
    max_steps: int = 5,
    top_k: int = 10,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Top navigation paths: gap-sessionize, take each session's first
    ``max_steps`` steps in event order, and count the resulting path
    strings ("view>view>click>purchase" — the product-analytics 'common
    journeys' report).

    ``order_cols`` extend the in-session order to a TOTAL order (pass a
    unique id column after the timestamp) — without it, equal
    timestamps make paths run-dependent. ``max_steps`` bounds per-path
    state so a bot session with 10^6 events contributes a fixed-size
    path, not an unbounded string.

    Plan: the sessionize window shuffle, then ONE groupBy per session
    (collect_list of at most the whole session, sorted + sliced
    JVM-side) and one path-keyed count. Output: (path, n_sessions,
    rank).
    """
    from pyspark.sql import types as T

    tcol = F.col(ts)
    if isinstance(df.schema[ts].dataType,
                  (T.TimestampType, T.TimestampNTZType)):
        tcol = F.unix_timestamp(tcol)
    s = sessionize_gap(df.withColumn("_t", tcol), key=key, ts="_t",
                       gap=gap)
    ord_cols = [F.col("_t")] + [F.col(c) for c in (order_cols or [])]
    step = F.struct(*ord_cols, F.col(step_col).alias("s"))
    per_session = (s.groupBy(key, "session_id")
                   .agg(F.slice(F.array_sort(F.collect_list(step)),
                                1, max_steps).alias("steps")))
    path = F.array_join(F.transform(F.col("steps"), lambda x: x["s"]), ">")
    counted = (per_session.select(path.alias("path"))
               .groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions")))
    w = Window.orderBy(F.col("n_sessions").desc(), F.col("path").asc())
    return (counted.withColumn("rank",
                               F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= top_k)
            .select("path",
                    F.col("n_sessions").cast("bigint").alias("n_sessions"),
                    "rank"))
