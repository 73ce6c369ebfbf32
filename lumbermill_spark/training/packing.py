"""GPT-style sequence packing: concatenate token sequences (plus an
EOS separator each) into one logical stream ordered by doc id, and
slice the stream into fixed-size training blocks.

This is the canonical last step of a pretraining-data pipeline: the
model consumes fixed-length blocks, documents span block boundaries,
and nothing is padded. The op here computes the doc → stream-offset
assignment SCALABLY and then derives either per-block stats
(`pack_stats`) or the fully assembled block token arrays
(`pack_blocks`).

Scale design — the offset computation is the interesting part. A
window cumsum over a global ORDER BY is a single-partition sort at
corpus scale, so instead:

1. repartitionByRange(id) + sortWithinPartitions(id): globally ordered
   across partitions, parallel sort;
2. per-partition token totals (one slim aggregate, collected — one row
   per partition, not per doc);
3. exclusive cumsum of those totals on the driver → per-partition base
   offsets, closed over by a mapInPandas that adds the batch-local
   cumsum. The slim (id, len, start) frame is localCheckpoint()ed so
   the range boundaries the bases were computed for can never resample.

Everything after offsets is pure JVM: a doc covering stream range
[start, end] explodes into the ceil-range of block ids it overlaps
(``sequence(floor(start/C), floor(end/C))``) — one row per (doc,
block), never per token.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    append_eos: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, _len, _start): each doc's length (+1 for EOS when
    ``append_eos``) and its exclusive-cumsum start offset in the
    id-ordered concatenated token stream. Slim output, eagerly
    localCheckpoint()ed (ids + two longs — safe at any corpus size)."""
    from pyspark import StorageLevel

    extra = 1 if append_eos else 0
    # null tokens count as an empty doc (size(null) is -1 legacy / null
    # ANSI — neither is a length); a doc may end up _len 0 with
    # append_eos=False, which downstream treats as occupying no stream
    # space rather than emitting inverted spans
    n_tok = F.when(F.col(tokens_col).isNull(), F.lit(0)) \
        .otherwise(F.size(F.col(tokens_col)))
    sized = df.select(
        F.col(id_col).alias("_id"),
        (n_tok + F.lit(extra)).cast("long").alias("_len"),
    )
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    # cache the slim (id, len) projection FIRST: repartitionByRange
    # samples its input to pick boundaries, which would otherwise run
    # the (possibly expensive) upstream once more just for the sample
    sized = sized.persist(StorageLevel.MEMORY_AND_DISK)
    rp = (sized.repartitionByRange(p, "_id")
          .sortWithinPartitions("_id")
          .persist(StorageLevel.MEMORY_AND_DISK))
    try:
        totals = {r["pid"]: r["tot"] for r in
                  rp.groupBy(F.spark_partition_id().alias("pid"))
                  .agg(F.sum("_len").alias("tot")).collect()}
        bases: dict[int, int] = {}
        acc = 0
        for pid in sorted(totals):
            bases[pid] = acc
            acc += int(totals[pid])

        id_type = sized.schema["_id"].dataType
        out_schema = T.StructType([
            T.StructField("_id", id_type),
            T.StructField("_len", T.LongType()),
            T.StructField("_start", T.LongType()),
        ])

        def run(batches):
            from pyspark import TaskContext

            base = bases.get(TaskContext.get().partitionId(), 0)
            for pdf in batches:
                ln = pdf["_len"].to_numpy(dtype=np.int64)
                starts = base + np.concatenate(
                    ([0], np.cumsum(ln)[:-1])) if len(ln) else ln
                base += int(ln.sum())
                yield pd.DataFrame({"_id": pdf["_id"], "_len": pdf["_len"],
                                    "_start": starts})

        # pin: the bases above belong to THIS materialized partitioning;
        # a recompute could re-sample different range boundaries and
        # silently shift every _start. localCheckpoint pins to executor
        # storage only — if an executor dies between the totals collect
        # and here, a recompute over nondeterministic upstream order
        # could still diverge. On a real cluster set a checkpoint dir
        # (sparkContext.setCheckpointDir on reliable storage): the
        # eager reliable checkpoint below then makes the pinned frame
        # executor-loss tolerant. Single-JVM local mode (tests, bench)
        # has no executor loss, so localCheckpoint is exact there.
        mapped = rp.mapInPandas(run, out_schema)
        if spark.sparkContext.getCheckpointDir():
            out = mapped.checkpoint(eager=True)
        else:
            out = mapped.localCheckpoint(eager=True)
    finally:
        rp.unpersist()
        sized.unpersist()
    return out


def _doc_blocks(offsets: DataFrame, block_size: int) -> DataFrame:
    """One row per (doc, overlapped block): block_id + covered length
    + the in-doc slice coordinates."""
    c = F.lit(block_size).cast("long")
    end = (F.col("_start") + F.col("_len") - 1).alias("_end")
    # zero-length docs (empty tokens, append_eos=False) occupy no
    # stream space: they must not explode (sequence(k, k-1) would emit
    # a DESCENDING range -> spurious rows / phantom blocks)
    spans = offsets.filter(F.col("_len") > 0) \
        .select("_id", "_start", "_len", end)
    return spans.select(
        "_id", "_start", "_len", "_end",
        F.explode(F.sequence(F.floor(F.col("_start") / c),
                             F.floor(F.col("_end") / c))).alias("block_id"),
    ).withColumn(
        "_covered",
        F.least(F.col("_end"), (F.col("block_id") + 1) * c - 1)
        - F.greatest(F.col("_start"), F.col("block_id") * c) + 1,
    ).withColumn(
        "_slice_from",  # 0-based offset within the doc's (tokens+eos)
        F.greatest(F.col("block_id") * c - F.col("_start"), F.lit(0)),
    )


def pack_stats(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    block_size: int = 2048,
    append_eos: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-block packing statistics: (block_id, n_tokens, n_docs,
    first_doc, last_doc). Every block carries exactly ``block_size``
    tokens except the final one."""
    offsets = stream_offsets(df, id_col, tokens_col, append_eos,
                             num_partitions)
    return (
        _doc_blocks(offsets, block_size)
        .groupBy("block_id")
        .agg(F.sum("_covered").alias("n_tokens"),
             F.count(F.lit(1)).alias("n_docs"),
             F.min("_id").alias("first_doc"),
             F.max("_id").alias("last_doc"))
    )


def pack_blocks(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    block_size: int = 2048,
    eos_token: int = 0,
    append_eos: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assembled fixed-size training blocks: (block_id, tokens) where
    ``tokens`` is the ``block_size``-length slice of the concatenated
    (doc tokens + EOS) stream (final block may be shorter).

    Pure JVM assembly: each (doc, block) overlap contributes a slice of
    the doc's array; per block the pieces are sorted by stream offset
    and flattened. Shuffle volume is one row per (doc, block) — token
    arrays ride the shuffle exactly once."""
    offsets = stream_offsets(df, id_col, tokens_col, append_eos,
                             num_partitions)
    arr_type = df.schema[tokens_col].dataType
    toks = F.coalesce(F.col(tokens_col), F.array().cast(arr_type))
    if append_eos:
        toks = F.concat(toks, F.array(F.lit(eos_token)).cast(arr_type))
    pieces = (
        _doc_blocks(offsets, block_size)
        .join(df.select(F.col(id_col).alias("_id"), toks.alias("_toks")),
              on="_id")
        .select(
            "block_id", "_start",
            # slice() is 1-based
            F.slice(F.col("_toks"), (F.col("_slice_from") + 1).cast("int"),
                    F.col("_covered").cast("int")).alias("_piece"),
        )
    )
    return (
        pieces.groupBy("block_id")
        .agg(F.flatten(F.transform(
            F.array_sort(F.collect_list(F.struct("_start", "_piece"))),
            lambda s: s["_piece"])).alias(tokens_col))
    )


def chunk_sequences(
    df: DataFrame,
    max_len: int,
    stride: int | None = None,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunking of long token sequences — the complement
    of packing (packing merges short docs into fixed blocks; chunking
    splits docs longer than the context window into overlapping
    ``max_len`` windows with step ``stride``, the HF-tokenizer
    "return_overflowing_tokens" convention). The last window may be
    shorter; a doc of <= ``max_len`` tokens yields exactly one chunk;
    empty/null docs yield none.

    Pure per-row explode over ``sequence()`` + ``slice()`` — zero
    shuffle, zero Python, linear in emitted tokens, so it composes
    with a downstream ``pack_stats`` without re-partitioning.

    Output: input columns (minus tokens) + (chunk_idx, chunk,
    n_chunk).
    """
    stride = max_len if stride is None else stride
    if not (0 < stride <= max_len):
        raise ValueError(
            f"chunk_sequences: need 0 < stride <= max_len, "
            f"got stride={stride} max_len={max_len}")
    n = F.coalesce(F.size(F.col(tokens_col)), F.lit(0))
    n_chunks = (F.ceil(F.greatest(n - max_len, F.lit(0)) / stride) + 1) \
        .cast("int")
    idx = F.when(n > 0, F.sequence(F.lit(0), n_chunks - 1)) \
        .otherwise(F.array().cast("array<int>"))
    out = df.withColumn("chunk_idx", F.explode(idx))
    chunk = F.slice(F.col(tokens_col), F.col("chunk_idx") * stride + 1,
                    max_len)
    return (out.withColumn("chunk", chunk)
               .withColumn("n_chunk", F.size("chunk"))
               .drop(tokens_col))


def sequence_length_profile(
    df: DataFrame,
    len_col: str = "n_tok",
    by: str | None = "source",
    bucket_width: int = 16,
    context_len: int = 128,
) -> DataFrame:
    """Sequence-length histogram + padding-waste profile — the
    planning table consumed BEFORE choosing a packing strategy: how
    long are the sequences, and how many tokens would pad-to-context
    training burn if they were NOT packed (the number pack_stats /
    pack_blocks then drives to ~zero).

    Bucket = floor(len / bucket_width) · bucket_width (integer ops
    only — replays exactly in any engine). ``pad_waste`` = per-sequence
    ceil(len/context)·context − len, i.e. tokens of padding under
    naive one-doc-per-block batching at ``context_len``.

    Plan: pure per-row integer projection + ONE map-side-combined
    groupBy on (group, bucket) — cardinality ≤ groups × max_len/width,
    independent of corpus rows. No Python, no window, no second pass.
    """
    n = F.col(len_col).cast("long")
    blocks = F.floor((n + context_len - 1) / context_len)
    keys = ([F.col(by)] if by else []) + [
        (F.floor(n / bucket_width) * bucket_width)
        .cast("long").alias("len_bucket")]
    return (df.select(*keys,
                      n.alias("_n"),
                      (blocks * context_len - n).alias("_waste"))
            .groupBy(*[c for c in ([by] if by else []) + ["len_bucket"]])
            .agg(F.count(F.lit(1)).cast("long").alias("n_seqs"),
                 F.sum("_n").cast("long").alias("sum_tok"),
                 F.sum("_waste").cast("long").alias("pad_waste"))
            .orderBy(*([by] if by else []), "len_bucket"))
