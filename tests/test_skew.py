"""Salted repartition / two-phase aggregation on the skewed corpus."""

from pyspark.sql import functions as F

from lumbermill_spark.data.synth import synth_tokens
from lumbermill_spark.functions.skew import salt_col, salted_agg, salted_repartition


def _partition_rows(df):
    return [
        r["n"] for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n")).collect()
    ]


def test_salting_bounds_partition_skew(spark):
    df = synth_tokens(spark, 20000)  # apache ~60%
    plain = df.repartition(16, "source")
    salted = salted_repartition(df, "source", buckets=16, num_partitions=16)
    p_max = max(_partition_rows(plain))
    s_max = max(_partition_rows(salted))
    # hash-partitioning on 4 keys leaves >=60% in one partition;
    # salting must spread far below that
    assert p_max >= 0.55 * 20000
    # (4 sources × 16 salts) hashed into 16 partitions: a partition can
    # still collect a few hot-key buckets, but nothing near the 60%
    # single-reducer pathology
    assert s_max < 0.25 * 20000


def test_salt_is_deterministic(spark):
    df = synth_tokens(spark, 1000).withColumn("s", salt_col("doc_id", 8))
    a = {r["doc_id"]: r["s"] for r in df.collect()}
    b = {r["doc_id"]: r["s"] for r in df.collect()}
    assert a == b
    assert set(a.values()) == set(range(8))


def test_salted_agg_matches_direct(spark):
    df = synth_tokens(spark, 5000)
    direct = {
        r["source"]: (r["n"], r["tok"], r["mx"])
        for r in df.groupBy("source").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tok").alias("tok"),
            F.max("n_tok").alias("mx"),
        ).collect()
    }
    two_phase = {
        r["source"]: (r["n"], r["tok"], r["mx"])
        for r in salted_agg(
            df, ["source"],
            {"n": ("count", "*"), "tok": ("sum", "n_tok"),
             "mx": ("max", "n_tok")},
            buckets=8,
        ).collect()
    }
    assert direct == two_phase
