"""Structured Streaming face of the pipeline engine.

The reference is stream-native: inputs tail files / consume Kafka
(/root/reference/lumbermill/input/File.py:67-147, input/Kafka.py:39-85),
interval timers flush aggregates
(modifier/Facet.py:154-160, misc/Metrics.py:169-171), and shutdown
drains queues for a final flush (LumberMill.py:505-531).

Spark mapping (SURVEY.md §3.3):
- tail/consume      → ``readStream`` (file source here; kafka source is
  the same plan with ``format('kafka')``)
- interval flush    → ``trigger(processingTime=...)`` + watermarked
  windowed aggregates (late data handled — the reference silently
  loses stragglers, we bound them explicitly)
- flush-on-stop     → ``trigger(availableNow=True)`` drains everything
  pending and commits the final micro-batch
- EventBuffer WAL   → the sink's checkpointLocation (offsets + state)

Every BATCH transform in this package (parse/modify/enrich/route_tag)
is a DataFrame→DataFrame function, so it composes onto a streaming
DataFrame unchanged — including the mapInArrow token decode. The only
streaming-specific operators are the stateful ones below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def stream_source(
    spark: SparkSession,
    path: str,
    schema: str = TOKEN_SCHEMA,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream source over a (growing) token-table directory — the
    input.File 'tail' mode analog; new files are discovered per
    micro-batch, position tracking comes from the stream checkpoint
    (sincedb analog, input/File.py:121-135)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    keys: list[str] | None = None,
    token_col: str | None = "n_tok",
) -> DataFrame:
    """SimpleStats/Metrics interval emission as a watermarked windowed
    aggregate: one row per (window, keys) per trigger, counts +
    sum(tokens)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if token_col and token_col in df.columns:
        aggs.append(F.sum(token_col).cast("long").alias("sum_tok"))
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), *(keys or []))
        .agg(*aggs)
    )


def facet_stream(
    df: DataFrame,
    source_field: str,
    group_by: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """modifier.Facet's interval flush (Facet.py:154-160): per window +
    group key, the sorted distinct values of source_field."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), group_by)
        .agg(F.sort_array(F.collect_set(source_field)).alias("facets"))
        # COUNT(DISTINCT) is unsupported on streams; the set is already
        # collected, so the count is its size
        .withColumn("facet_count", F.size("facets").cast("long"))
    )


def merge_sessions_stream(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    match_field: str = "data",
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    glue: str = "",
) -> DataFrame:
    """modifier.MergeEvent on a stream via the built-in session_window:
    events for a key belong to one session until ``gap`` of silence,
    then the merged event (concatenated ``match_field``, event count,
    session bounds) is emitted once the watermark passes.

    Divergence from the batch merge_event, documented: the reference's
    start/end PATTERN semantics need per-key ordered state, and both
    custom-state APIs (applyInPandasWithState /
    transformWithStateInPandas) crash their Python state workers in
    this runtime — gap-based sessionization is the built-in-operator
    expression of the same reassembly, and is what the reference's
    flush-on-timeout path (MergeEvent.py buffer timeout) degenerates to
    anyway when no end pattern arrives.
    """
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"),
                 F.col(key))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col(ts_col).alias("_t"),
                                 F.col(match_field).alias("v")))),
                    lambda s: s["v"],
                ),
                glue,
            ).alias(match_field),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .select(F.col("session.start").alias("session_start"),
                F.col("session.end").alias("session_end"),
                key, match_field, "n_merged")
    )


def throttle_stream(
    df: DataFrame,
    key: str,
    max_count: int,
) -> DataFrame:
    """misc.Throttle as custom streaming state (Throttle.py:60-110):
    pass at most ``max_count`` events per key across the stream's
    lifetime (the reference GCs stale keys on a timer,
    Throttle.py:100-104 — here the state store TTL/timer facilities of
    transformWithStateInPandas cover that when configured).

    Implemented with transformWithStateInPandas (the Spark 4 custom
    stateful operator API): a ValueState counter per key.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    out_schema = df.schema

    class ThrottleProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("seen", "n long")

        def handleInputRows(self, key, rows, timer_values):
            seen = self._count.get()[0] if self._count.exists() else 0
            for pdf in rows:
                take = max(0, max_count - seen)
                out = pdf.iloc[:take]
                seen += len(out)
                if len(out):
                    yield out
            self._count.update((seen,))

        def close(self) -> None:
            pass

    return (
        df.groupBy(key)
        .transformWithStateInPandas(
            ThrottleProcessor(), out_schema, "Append",
            "ProcessingTime",
        )
    )


def dedup_stream(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Streaming exact dedup — the streaming analog of
    ``training.dedup.exact_dedup``: drop rows whose (normalized)
    content hash was already seen, via Spark's built-in stateful
    ``dropDuplicates`` machinery (state store keyed on the hash, one
    slim 64-hex entry per distinct content, map-side pre-filtered).

    With ``ts_col`` + ``watermark``, uses
    ``dropDuplicatesWithinWatermark`` so per-key state EXPIRES once the
    watermark passes — the only state-bounded form at 10^12-sequence
    scale (unbounded dropDuplicates state grows with distinct contents
    forever). Without a watermark, state is unbounded: fine for
    bounded replays/tests, documented footgun otherwise.

    Semantics difference from the batch op (documented): batch
    exact_dedup keeps the LOWEST id per content; a stream keeps the
    FIRST ARRIVAL (arrival order is the stream's identity — there is
    no "lowest future id" in an infinite stream). Null text hashes to
    null and ``dropDuplicates`` treats nulls as equal — i.e. streaming
    follows the batch op's ``keep_nulls=False`` policy; pre-filter
    nulls upstream if they must pass through.
    """
    key = (F.lower(F.trim(F.col(text_col))) if normalize
           else F.col(text_col))
    hashed = df.withColumn("_content_hash", F.sha2(key.cast("string"), 256))
    if ts_col and watermark:
        out = (hashed.withWatermark(ts_col, watermark)
               .dropDuplicatesWithinWatermark(["_content_hash"]))
    else:
        out = hashed.dropDuplicates(["_content_hash"])
    return out.drop("_content_hash")


def run_throttled_batches(
    df: DataFrame,
    key: str,
    base: str,
    checkpoint: str,
    min_count: int = 1,
    max_count: int | None = None,
    available_now: bool = True,
):
    """Throttle with per-micro-batch timeframes via foreachBatch: each
    micro-batch is one throttle window (the reference's `timeframe`
    maps to the trigger interval), reusing the batch operator.

    This is the portable fallback: in this sandbox BOTH custom-state
    APIs (applyInPandasWithState and transformWithStateInPandas)
    crash their Python state workers on stock examples — a pyspark
    4.1.2-in-container defect, reproduced outside this codebase — so
    cross-batch running counts (throttle_stream above) can't execute
    here, while per-window counts can.
    """
    from lumbermill_spark.operators.stats import throttle

    def write_batch(batch_df: DataFrame, batch_id: int):
        passed = throttle(batch_df, key, min_count=min_count,
                          max_count=max_count)
        passed.write.mode("append").parquet(base)

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=available_now)
        .start()
    )
    if available_now:
        q.awaitTermination()
    return q


def run_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
    output_mode: str = "append",
):
    """Drain-everything-then-stop execution (flush-on-stop analog).
    Returns the StreamingQuery (already awaiting termination when
    available_now)."""
    q = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=available_now)
        .start()
    )
    if available_now:
        q.awaitTermination()
    return q


def run_routed(
    df: DataFrame,
    sinks,
    base: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Streaming fan-out: foreachBatch applies the batch router to each
    micro-batch (per-sink filters + writes + per-sink metrics), with
    exactly-once via the stream checkpoint + idempotent batch-id paths.
    """
    from lumbermill_spark.router import route

    def write_batch(batch_df: DataFrame, batch_id: int):
        for name, branch in route(batch_df, sinks).items():
            branch.write.mode("append").parquet(f"{base}/{name}")

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=available_now)
        .start()
    )
    if available_now:
        q.awaitTermination()
    return q


def _checkpoint_namespace(spark, checkpoint: str) -> str:
    """Stable namespace for one LIFETIME of a stream checkpoint: a
    marker file inside the checkpoint dir, created on first use and
    read back on every restart. A deleted/rebuilt checkpoint (the
    standard 'reprocess from scratch' ops move) gets a NEW namespace,
    so its batch ids restarting at 0 cannot collide with sink commit
    rows from the previous checkpoint's life — without it, a rebuilt
    stream's batches 0..N would all be resume-SKIPPED as already
    committed and the reprocess would silently merge nothing."""
    import uuid as _uuid

    from lumbermill_spark.functions.fsutil import read_marker, write_marker

    marker = f"{checkpoint.rstrip('/')}/__lms_ns"
    ns = read_marker(spark, marker)
    if ns:
        return ns
    ns = _uuid.uuid4().hex[:12]
    write_marker(spark, marker, ns)
    return ns


def run_merged(
    df: DataFrame,
    sink,
    base: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Streaming SCD-1 ingestion into a merge-mode sink: each
    micro-batch merges into the sink's latest committed snapshot
    (router merge mode — the streaming form of the ES 'update' bulk
    action). Exactly-once without transactions: the stream checkpoint
    dedups source replays, and the batch run_id IS the batch_id, so a
    replayed foreachBatch (possible after a crash between the sink
    commit and the stream commit) is skipped by the router's
    committed-sinks check instead of double-merging. Restarting the
    query against the same checkpoint processes only new source files
    and merges them on top of the surviving snapshot;
    deleting the checkpoint to reprocess starts a fresh
    namespaced run_id series (see _checkpoint_namespace)
    instead of being skipped by the previous life's commits.
    """
    from lumbermill_spark.router import route_and_write

    if sink.mode != "merge":
        raise ValueError("run_merged requires a mode='merge' SinkSpec")
    # namespace per checkpoint LIFETIME: a deleted/rebuilt checkpoint
    # restarts batch ids at 0 — without the namespace those would
    # collide with the previous life's committed run_ids and every
    # reprocess batch would be resume-SKIPPED (silently merging nothing)
    ns = _checkpoint_namespace(df.sparkSession, checkpoint)

    def write_batch(batch_df: DataFrame, batch_id: int):
        route_and_write(batch_df, [sink], base,
                        run_id=f"{ns}-b{batch_id:012d}", resume=True)

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=available_now)
        .start()
    )
    if available_now:
        q.awaitTermination()
    return q
