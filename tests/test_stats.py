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
