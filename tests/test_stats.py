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


def test_sessionize_gap(spark):
    from lumbermill_spark.operators.stateful import sessionize_gap

    df = spark.createDataFrame(
        [("u1", 0), ("u1", 100), ("u1", 2000), ("u1", 2100),
         ("u2", 50)],
        "k string, t int")
    out = sessionize_gap(df, key="k", ts="t", gap=1800)
    got = {(r.k, r.t): r.session_id for r in out.collect()}
    # u1: 0,100 in session 0; 2000 (gap 1900 > 1800) starts session 1
    assert got == {("u1", 0): 0, ("u1", 100): 0,
                   ("u1", 2000): 1, ("u1", 2100): 1, ("u2", 50): 0}

    # exact-gap boundary is NOT a split (strictly greater only)
    df2 = spark.createDataFrame([("u", 0), ("u", 1800)], "k string, t int")
    s2 = sessionize_gap(df2, key="k", ts="t", gap=1800).collect()
    assert {r.session_id for r in s2} == {0}


def test_cohort_retention(spark):
    from lumbermill_spark.operators.stats import cohort_retention

    day = 86400
    df = spark.createDataFrame(
        [("a", 0), ("a", 8 * day), ("b", 0), ("b", 1 * day),
         ("c", 7 * day)],
        "user_id string, es long").selectExpr(
        "user_id", "to_timestamp(es) AS ts")
    out = {(r.cohort_period, r.periods_since): r.n_users
           for r in cohort_retention(df).collect()}
    # a,b in cohort 0 (both active period 0); a returns in period 1;
    # b's day-1 event is still period 0; c is cohort 1.
    assert out == {(0, 0): 2, (0, 1): 1, (1, 0): 1}


def test_funnel_counts(spark):
    from lumbermill_spark.operators.stats import funnel_counts

    rows = [
        # u1 completes in order
        ("u1", 10, "view"), ("u1", 20, "click"), ("u1", 30, "purchase"),
        # u2 clicks BEFORE viewing and never re-clicks -> stops at view
        ("u2", 5, "click"), ("u2", 10, "view"), ("u2", 20, "purchase"),
        # u3 views only
        ("u3", 1, "view"),
        # u4 purchase with no view -> counted nowhere
        ("u4", 1, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, es long, event_type string").selectExpr(
        "user_id", "to_timestamp(es) AS ts", "event_type")
    out = {r.step_name: r.n_users
           for r in funnel_counts(
               df, steps=["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_rollup_agg(spark):
    from lumbermill_spark.operators.stats import rollup_agg
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", None, 3)],
        "d1 string, d2 string, v int")
    out = rollup_agg(df, ["d1", "d2"],
                     [F.sum("v").cast("long").alias("s")])
    got = {(r.d1, r.d2): r.s for r in out.collect()}
    # real null in d2 stays null; subtotal rows say ALL
    assert got == {
        ("a", "x"): 1, ("a", "y"): 2, ("b", None): 3,
        ("a", "ALL"): 3, ("b", "ALL"): 3, ("ALL", "ALL"): 6,
    }


def test_pivot_counts(spark):
    from lumbermill_spark.operators.stats import pivot_counts

    df = spark.createDataFrame(
        [("d1", "a"), ("d1", "a"), ("d1", "b"), ("d2", "b")],
        "day string, et string")
    out = {r.day: (r.a, r.b, r.c)
           for r in pivot_counts(df, "day", "et", ["a", "b", "c"]).collect()}
    # explicit values: schema is fixed, missing combos are 0 (incl. a
    # value absent from the data entirely)
    assert out == {"d1": (2, 1, 0), "d2": (0, 1, 0)}


def test_rolling_agg(spark):
    from lumbermill_spark.operators.stats import rolling_agg

    df = spark.createDataFrame(
        [("k", 1, 10), ("k", 2, 20), ("k", 3, 30), ("k", 4, 40)],
        "g string, seq int, v int")
    out = {r.seq: (r.roll_sum, r.roll_n, r.roll_avg)
           for r in rolling_agg(df, key="g", order_by=["seq"],
                                value_field="v", n=3).collect()}
    assert out == {1: (10, 1, 10.0), 2: (30, 2, 15.0),
                   3: (60, 3, 20.0), 4: (90, 3, 30.0)}


def test_json_key_profile(spark):
    from lumbermill_spark.operators.stats import json_key_profile

    df = spark.createDataFrame(
        [('{"a": 1, "b": 2}',), ('{"a": 3}',), ("not json",), (None,)],
        "j string")
    out = {r.key: (r.n_present, r.pct)
           for r in json_key_profile(df, "j").collect()}
    # malformed/null rows add no keys but stay in the denominator
    assert out == {"a": (2, 50.0), "b": (1, 25.0)}


def test_ntile_buckets(spark):
    from lumbermill_spark.operators.stats import ntile_buckets

    df = spark.createDataFrame(
        [("k", i, i) for i in range(10)], "g string, id int, v int")
    out = {r.id: r.bucket
           for r in ntile_buckets(df, "g", ["v", "id"], n=5).collect()}
    assert out == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3,
                   5: 3, 6: 4, 7: 4, 8: 5, 9: 5}


def test_inter_arrival_stats(spark):
    from lumbermill_spark.operators.stats import inter_arrival_stats

    df = spark.createDataFrame(
        [("k", 0, 1), ("k", 10, 2), ("k", 30, 3), ("k", 60, 4),
         ("solo", 5, 5)],
        "g string, t int, id int")
    rows = {r.g: r for r in
            inter_arrival_stats(df, key="g", ts="t", id_col="id").collect()}
    k = rows["k"]
    # gaps: 10, 20, 30 -> mean 20, p50 20, p95 interpolated 29.0
    assert (k.n_gaps, k.avg_gap, k.p50_gap, k.p95_gap) == (3, 20.0, 20.0, 29.0)
    # a key with a single event has no gaps -> no row
    assert "solo" not in rows


def test_active_users(spark):
    from lumbermill_spark.operators.stats import active_users

    day = 86400
    rows = [("u1", 0), ("u1", 0), ("u2", 0),       # day 0: u1,u2
            ("u1", 1 * day),                       # day 1: u1
            ("u3", 8 * day)]                       # day 8: u3
    df = spark.createDataFrame(rows, "user_id string, es long") \
        .selectExpr("user_id", "to_timestamp(es) AS ts")
    out = {r.day: (r.dau, r.wau)
           for r in active_users(df, window_days=7).collect()}
    # day 0: dau 2, wau 2; day 1: dau 1, wau {u1,u2}=2
    # day 8: dau 1, wau {u3} only (day-1 activity fell out of [2..8])
    assert out == {0: (2, 2), 1: (1, 2), 8: (1, 1)}


def test_association_rules(spark):
    from lumbermill_spark.operators.stats import association_rules

    txn = spark.createDataFrame(
        [("t1", "x"), ("t1", "y"), ("t1", "x"),   # dup item collapses
         ("t2", "x"), ("t2", "y"),
         ("t3", "x"), ("t4", "z")],
        "txn_id string, item string")
    out = {(r.item_a, r.item_b): r
           for r in association_rules(txn).collect()}
    r = out[("x", "y")]
    # n=4 txns, x in 3, y in 2, xy in 2
    assert r.n_pair == 2
    assert r.support == 0.5
    assert r.conf_ab == round(2 / 3, 4)   # P(y|x)
    assert r.conf_ba == 1.0               # P(x|y)
    assert r.lift == round(2 * 4 / (3 * 2), 4)
    assert ("x", "z") not in out


def test_mad_flags(spark):
    from lumbermill_spark.operators.stats import mad_flags

    # median 10, MAD 1 -> the 500 spike flags; z-score would be
    # dragged by the spike itself (stddev ~155, z(500) ~ 3.1 with a
    # 2.5x threshold barely firing, and nothing else resolvable)
    vals = [9.0, 10.0, 10.0, 11.0, 9.0, 11.0, 500.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)],
        "g string, id int, v double")
    out = {r.id: (r.mzscore, r.is_outlier)
           for r in mad_flags(df, "v", ["g"], threshold=3.5).collect()}
    assert out[6][1] is True           # the spike
    assert all(not out[i][1] for i in range(6))
    assert out[6][0] == round(0.6745 * (500 - 10) / 1.0, 4)

    # constant group: MAD 0 -> nothing flags, mzscore null
    df2 = spark.createDataFrame([("c", i, 5.0) for i in range(4)],
                                "g string, id int, v double")
    got2 = mad_flags(df2, "v", ["g"]).collect()
    assert all(not r.is_outlier and r.mzscore is None for r in got2)


def test_funnel_null_user_semantics(spark):
    # a NULL user may count at step 1 (it forms a group) but can never
    # advance — join-on-user semantics, which any SQL twin shares
    from lumbermill_spark.operators.stats import funnel_counts

    ev = spark.createDataFrame(
        [(None, "2024-01-01 00:00:00", "view"),
         (None, "2024-01-01 00:01:00", "click"),
         (7, "2024-01-01 00:00:00", "view"),
         (7, "2024-01-01 00:01:00", "click")],
        "user_id string, ts string, event_type string")
    got = {r["step_name"]: r["n_users"]
           for r in funnel_counts(ev, ["view", "click"]).collect()}
    assert got == {"view": 2, "click": 1}
