"""Seed quality classifier for pretraining-data curation: a Naive
Bayes log-odds scorer trained on a deterministic hash split of the
corpus, in the shape GPT-3 / CCNet / fastText pipelines use ("score
every crawl document by how much it looks like the reference corpus,
keep the high scorers").

The model is a BOUNDED vocabulary table (top-``vocab_size`` train
tokens), so scoring is a broadcast join against the corpus — the only
shuffles are the partial-aggregated token-count group-bys, linear in
corpus size. Nothing about the model scales with document count:
training collapses to per-(label, word) counts before anything
shuffles, the vocabulary is a TakeOrderedAndProject top-K, and the
totals/prior are a one-row broadcast.

Reference analog: the reference has no ML scorer; the closest module
shape is its per-field statistics (`lumbermill/misc/Metrics.py`) and
value-map enrichment (`lumbermill/modifier/Field.py` map action) — this
module composes those ideas (corpus statistics → per-event enrichment)
into the curation scorer a 100 TB pipeline actually needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lumbermill_spark.functions.skew import ensure_min_parallelism
from lumbermill_spark.training.textstats import words


def hash_split(id_col: Column, buckets: int = 10) -> Column:
    """Deterministic hash-bucket assignment in [0, buckets): the first
    8 hex digits of md5(id-as-string) mod ``buckets``. Stable across
    engines (DuckDB twin: ``CAST('0x' || substr(md5(CAST(id AS
    VARCHAR)), 1, 8) AS BIGINT) % buckets``) and across Spark restarts
    — the property a train/held-out split must have so re-runs never
    leak eval docs into training."""
    hex8 = F.substring(F.md5(id_col.cast("string").cast("binary")), 1, 8)
    return (F.conv(hex8, 16, 10).cast("long") % buckets).cast("int")


def seed_quality_classifier(
    df: DataFrame,
    positive: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_buckets: int = 3,
    split_buckets: int = 10,
    vocab_size: int = 1000,
    round_to: int = 4,
) -> DataFrame:
    """Train an add-one-smoothed Naive Bayes log-odds model on the
    deterministic train split (hash buckets ``< train_buckets`` of
    ``split_buckets``) with ``positive`` as the seed label, then score
    EVERY document:

        score(d) = ln(Dp/Dn) + sum_w k_w(d) * llr(w)
        llr(w)   = ln((cp_w + 1)/(Np + V)) - ln((cn_w + 1)/(Nn + V))

    where cp/cn are train token counts inside the top-``vocab_size``
    vocabulary, Np/Nn the vocabulary-total token counts per class,
    V the realized vocabulary size, and Dp/Dn the train doc counts
    (the class prior). Out-of-vocabulary words use the same formula
    with cp = cn = 0 — unseen evidence, not ignored evidence.

    Plan: two corpus scans (train counts; scoring counts), both
    collapsing to per-(doc, word) partial aggregates before any
    shuffle. The vocabulary is ``orderBy(count desc, word).limit(K)``
    → TakeOrderedAndProject (per-partition top-K, driver holds K
    rows); the model and the totals row are explicit broadcasts, so
    the corpus-side scoring join never shuffles. Documents with zero
    words score the bare prior (left join + coalesce).

    Output: (id, n_words, score, label) with label = 'pos' when the
    ROUNDED score > 0 — rounding before the comparison keeps the
    decision replayable in any engine despite float-sum ordering.
    """
    df = ensure_min_parallelism(df)
    toks = F.filter(words(F.col(text_col)), lambda x: x != F.lit(""))
    bucket = hash_split(F.col(id_col), split_buckets)

    train = df.filter(bucket < train_buckets).select(
        F.col(id_col), positive.alias("y"), F.col(text_col))
    # per-(label, word) counts — partial aggregation collapses each
    # executor's explode output before the single word-keyed shuffle
    tw = (
        train.select("y", F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("cp"),
             F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("cn"))
    )
    model = (
        tw.orderBy((F.col("cp") + F.col("cn")).desc(), F.col("w"))
        .limit(vocab_size)
        .localCheckpoint(eager=True)  # consumed twice: totals + join
    )
    totals = model.agg(
        F.sum("cp").alias("np"), F.sum("cn").alias("nn"),
        F.count(F.lit(1)).alias("v"))
    prior = train.agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("dp"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("dn"))

    dw = (
        df.select(F.col(id_col), F.explode(toks).alias("w"))
        .groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("k"))
    )
    llr = (
        F.log((F.coalesce(F.col("cp"), F.lit(0)) + 1)
              / (F.col("np") + F.col("v")))
        - F.log((F.coalesce(F.col("cn"), F.lit(0)) + 1)
                / (F.col("nn") + F.col("v")))
    )
    per_doc = (
        dw.join(F.broadcast(model), on="w", how="left")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(F.sum("k").alias("n_words"),
             F.sum(F.col("k") * llr).alias("evidence"))
    )
    return (
        df.select(id_col).join(per_doc, on=id_col, how="left")
        .crossJoin(F.broadcast(prior))
        .select(
            F.col(id_col),
            F.coalesce("n_words", F.lit(0)).cast("bigint")
            .alias("n_words"),
            F.round(F.log(F.col("dp") / F.col("dn"))
                    + F.coalesce("evidence", F.lit(0.0)),
                    round_to).alias("score"),
        )
        .withColumn(
            "label",
            F.when(F.col("score") > 0, F.lit("pos"))
            .otherwise(F.lit("neg")))
    )


def hashed_ngram_buckets(text: Column, buckets: int = 1024,
                         include_bigrams: bool = True) -> Column:
    """DSIR-style hashed n-gram featurization (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): every
    unigram (and bigram) hashes to one of ``buckets`` ids via the
    engine-portable md5-hex8 bucket (same recipe as ``hash_split``),
    so the feature space is FIXED-SIZE regardless of vocabulary — the
    property that lets the importance model broadcast at any corpus
    scale. Returns array<long> of bucket ids, one per n-gram
    occurrence (duplicates intentionally kept: weights sum over
    occurrences)."""
    ws = F.filter(words(text), lambda x: x != F.lit(""))

    def bucket(g: Column) -> Column:
        hex8 = F.substring(F.md5(g.cast("binary")), 1, 8)
        return F.conv(hex8, 16, 10).cast("long") % buckets

    feats = F.transform(ws, bucket)
    if include_bigrams:
        n = F.size(ws)
        bi = F.zip_with(F.slice(ws, 1, F.greatest(n - 1, F.lit(0))),
                        F.slice(ws, 2, F.greatest(n - 1, F.lit(0))),
                        lambda a, b: bucket(F.concat(a, F.lit(" "), b)))
        feats = F.concat(feats, bi)
    return feats


def dsir_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    include_bigrams: bool = True,
    round_to: int = 4,
) -> DataFrame:
    """DSIR importance weights for data selection: estimate the target
    and raw (source) distributions over hashed n-gram buckets, then
    score every document by its log importance weight

        lw(d) = sum_b k_b(d) * (ln p_t(b) - ln p_s(b))

    with add-one smoothing over the ``buckets``-sized feature space
    (p_t from documents matching ``target``, p_s from the whole pool).
    Higher weight = more target-like. The ABSOLUTE sign is dominated
    by the smoothing mass whenever the target sample is small relative
    to ``buckets``, so selection must be relative (DSIR resamples by
    rank): the ``keep`` flag marks docs whose ROUNDED weight exceeds
    the rounded pool average over scored docs — a deterministic,
    engine-replayable resampling proxy (one extra one-row broadcast,
    no global sort).

    Plan: ONE featurize scan (explode of the hashed-bucket array) →
    one (doc, bucket)-keyed partial-aggregated shuffle; the bucket
    distribution table is a second aggregate OVER THAT RESULT (≤
    ``buckets`` rows) broadcast back, and the totals are a one-row
    broadcast. Unlike the vocabulary classifier there is no top-K cap
    to tune — the hash bound IS the model size, at 10^12 docs exactly
    like at 500.

    Output: (id, n_feats, log_weight, keep).
    """
    df = ensure_min_parallelism(df)
    feats = hashed_ngram_buckets(F.col(text_col), buckets,
                                 include_bigrams)
    dw = (
        df.select(F.col(id_col), target.alias("y"),
                  F.explode(feats).alias("b"))
        .groupBy(id_col, "y", "b")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    bt = dw.groupBy("b").agg(
        F.sum("k").alias("s"),
        F.sum(F.when(F.col("y"), F.col("k")).otherwise(0)).alias("t"))
    tot = bt.agg(F.sum("s").alias("ns"), F.sum("t").alias("nt"))
    lam = (
        F.log((F.col("t") + 1) / (F.col("nt") + buckets))
        - F.log((F.col("s") + 1) / (F.col("ns") + buckets))
    )
    scored = (
        dw.join(F.broadcast(bt), on="b")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(F.sum("k").alias("n_feats"),
             F.sum(F.col("k") * lam).alias("lw"))
    )
    mstat = scored.agg(F.avg("lw").alias("mlw"))
    lw = F.round(F.coalesce("lw", F.lit(0.0)), round_to)
    n_feats = F.coalesce("n_feats", F.lit(0)).cast("bigint")
    return (
        df.select(id_col).join(scored, on=id_col, how="left")
        .crossJoin(F.broadcast(mstat))
        .select(
            F.col(id_col),
            n_feats.alias("n_feats"),
            lw.alias("log_weight"),
            ((n_feats > 0) & (lw > F.round("mlw", round_to)))
            .alias("keep"))
    )
