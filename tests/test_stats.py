"""Interval/window statistics operators."""

from pyspark.sql import functions as F


def test_sliding_window_agg(spark):
    from datetime import datetime

    from lumbermill_spark.operators.stats import sliding_window_agg

    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 2), "a", 1.0),
         (datetime(2024, 1, 1, 0, 7), "a", 2.0),
         (datetime(2024, 1, 1, 0, 2), "b", 4.0)],
        "ts timestamp, event_type string, value double")
    out = sliding_window_agg(
        df, "ts", "10 minutes", "5 minutes", ["event_type"],
        [F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")])
    rows = {(r["window_start"].minute, r["event_type"]): (r["n"], r["s"])
            for r in out.collect()}
    # 00:02 lands in windows starting 23:55 and 00:00; 00:07 in 00:00
    # and 00:05 — the 00:00 window sees both 'a' events
    assert rows[(0, "a")] == (2, 3.0)
    assert rows[(55, "a")] == (1, 1.0)
    assert rows[(5, "a")] == (1, 2.0)
    assert rows[(0, "b")] == (1, 4.0)
    assert rows[(55, "b")] == (1, 4.0)
    assert len(rows) == 5


def test_top_k_per_group(spark):
    from lumbermill_spark.operators.stats import top_k_per_group

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 30), ("a", 3, 30), ("a", 4, 5),
         ("b", 5, 1)],
        "g string, uid int, n int")
    out = top_k_per_group(df, ["g"], "n", 2, tiebreak_fields=["uid"])
    rows = {(r["g"], r["rank"]): r["uid"] for r in out.collect()}
    # tie on n=30 broken by uid ascending: uid 2 ranks above uid 3
    assert rows[("a", 1)] == 2 and rows[("a", 2)] == 3
    assert rows[("b", 1)] == 5
    assert len(rows) == 3


def test_zscore_flags(spark):
    from lumbermill_spark.operators.stats import zscore_flags

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 100.0),
         ("c", 7.0), ("c", 7.0)],
        "g string, v double")
    out = zscore_flags(df, "v", ["g"], threshold=1.5)
    rows = out.collect()
    flagged = [r for r in rows if r["is_outlier"]]
    assert len(flagged) == 1 and flagged[0]["v"] == 100.0
    # constant group: stddev 0 -> null zscore, never flagged
    assert all(r["zscore"] is None and not r["is_outlier"]
               for r in rows if r["g"] == "c")
