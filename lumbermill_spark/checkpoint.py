"""Checkpoint / lineage table + resume.

Spark-native analog of misc.EventBuffer
(/root/reference/lumbermill/misc/EventBuffer.py:44-143), which WALs every
live event to redis and re-injects unfinished ones on restart. Spark's
deterministic lineage makes a per-event WAL unnecessary; what a killed
job needs is *per-sink commit records* so a restart skips completed work
(north_rule: "resume from the last committed snapshot without
reprocessing, per-partition lineage + row/token metrics").

Protocol (works on plain parquet; with Iceberg the commit marker becomes
the table snapshot itself):

1. sink writes go to ``{base}/{sink}`` with mode=overwrite — idempotent,
   so a crash mid-write is healed by rewriting;
2. AFTER a sink write completes, one commit row is appended to
   ``{base}/_checkpoint`` recording (run_id, stage, sink, rows, tokens,
   n_partitions, committed_at) plus a per-partition lineage array
   (partition_id, rows, tokens);
3. on restart with the same run_id, sinks that have a commit row are
   skipped entirely (their data is already consistent: the marker is
   written only after the data).

The commit row is written as a single-task append; like the reference,
the protocol tolerates duplicates on re-run because doc_ids are stable
(EventBuffer.py:29-31 makes the same argument) and sink writes are
idempotent overwrites.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHECKPOINT_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType()),
    T.StructField("stage", T.StringType()),
    T.StructField("sink", T.StringType()),
    T.StructField("rows", T.LongType()),
    T.StructField("tokens", T.LongType()),
    T.StructField("n_partitions", T.IntegerType()),
    T.StructField("committed_at", T.DoubleType()),
    T.StructField("lineage", T.ArrayType(T.StructType([
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("rows", T.LongType()),
        T.StructField("tokens", T.LongType()),
    ]))),
])


def _ckpt_path(base: str) -> str:
    return f"{base.rstrip('/')}/_checkpoint"


def partition_lineage(df: DataFrame, token_col: str | None = "n_tok") -> list[dict]:
    """Per-partition (rows, tokens) — the lineage payload."""
    tok = (F.sum(token_col).cast("long") if token_col and token_col in df.columns
           else F.lit(None).cast("long"))
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("rows"), tok.alias("tokens"))
        .orderBy("partition_id")
        .collect()
    )
    return [r.asDict() for r in rows]


def commit(spark: SparkSession, base: str, run_id: str, stage: str, sink: str,
           rows: int, tokens: int | None, lineage: list[dict] | None) -> None:
    rec = [(
        run_id, stage, sink, int(rows),
        int(tokens) if tokens is not None else None,
        len(lineage) if lineage else None,
        time.time(),
        [(d["partition_id"], d["rows"], d["tokens"]) for d in (lineage or [])] or None,
    )]
    (spark.createDataFrame(rec, CHECKPOINT_SCHEMA)
        .coalesce(1)
        .write.mode("append").parquet(_ckpt_path(base)))


def committed_sinks(spark: SparkSession, base: str, run_id: str) -> set[str]:
    try:
        df = spark.read.parquet(_ckpt_path(base))
    except Exception:
        return set()
    return {
        r["sink"] for r in
        df.filter(F.col("run_id") == run_id).select("sink").distinct().collect()
    }


def read_checkpoints(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.parquet(_ckpt_path(base))
