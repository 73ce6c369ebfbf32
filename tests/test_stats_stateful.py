"""Facet/Metrics/SimpleStats/Math/Throttle + MergeEvent/Permutate + lookup.

Fixtures re-express the reference's module tests
(tests/modifier/TestFacet.py:14-56, tests/misc/TestThrottle.py:13-53,
tests/modifier/TestMergeEvent.py, tests/modifier/TestPermutate.py) as
DataFrame assertions.
"""

import pytest
from pyspark.sql import functions as F

from lumbermill_spark.operators import lookup, stateful, stats


@pytest.fixture(scope="module")
def facet_df(spark):
    # reference TestFacet: 6 events, group by remote_ip-ish key,
    # collect distinct usernames
    rows = [
        ("10.0.0.1", "john", "e1"),
        ("10.0.0.1", "mary", "e2"),
        ("10.0.0.1", "john", "e3"),
        ("10.0.0.2", "bob", "e4"),
        ("10.0.0.2", "bob", "e5"),
        ("10.0.0.1", "ann", "e6"),
    ]
    return spark.createDataFrame(rows, "ip string, username string, eid string")


def test_facet(facet_df):
    out = {
        r["ip"]: r
        for r in stats.facet(
            facet_df, "username", "ip", other_event_fields=["eid"]
        ).collect()
    }
    assert out["10.0.0.1"]["facets"] == ["ann", "john", "mary"]
    assert out["10.0.0.1"]["facet_count"] == 3
    assert out["10.0.0.2"]["facets"] == ["bob"]
    # sample = fields of the min-by-facet-value event (deterministic)
    assert out["10.0.0.1"]["sample"]["eid"] == "e6"  # ann's event


def test_facet_max(facet_df):
    out = stats.facet(facet_df, "username", "ip", max_facets=2).collect()
    by_ip = {r["ip"]: r["facets"] for r in out}
    assert by_ip["10.0.0.1"] == ["ann", "john"]


def test_simple_stats(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "event_type string"
    )
    got = {r["event_type"]: r["events_received"]
           for r in stats.simple_stats(df).collect()}
    assert got == {"a": 2, "b": 1}


def test_metrics_summary_and_histogram(spark):
    df = spark.createDataFrame(
        [("m", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]],
        "name string, v double",
    )
    out = stats.metrics(
        df, "lat_$(name)", value_field="v",
        buckets=[0.0, 5.0, 10.0], percentiles=[50],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["metric"] == "lat_m"
    assert r["count"] == 10
    assert r["min"] == 1.0 and r["max"] == 10.0 and r["mean"] == 5.5
    assert abs(r["p50"] - 5.5) < 1e-9  # numpy.percentile linear interp
    # width_bucket: [0,5) -> 1 (values 1..4), [5,10) -> 2 (5..9), 10 -> 3
    assert r["histogram"] == {1: 4, 2: 5, 3: 1}


def test_metrics_histogram_non_uniform_edges(spark):
    # numpy.digitize semantics over explicitly non-uniform edges —
    # width_bucket's (lo, hi, n) form would put 3.0 in the wrong bin
    df = spark.createDataFrame(
        [("m", float(v)) for v in [-1, 0, 1, 3, 9, 50, 99, 100, 150]],
        "name string, v double",
    )
    r = stats.metrics(df, "$(name)", value_field="v",
                      buckets=[0.0, 1.0, 10.0, 100.0]).collect()[0]
    # <0 -> 0; [0,1) -> 1; [1,10) -> 2; [10,100) -> 3; >=100 -> 4
    assert r["histogram"] == {0: 1, 1: 1, 2: 3, 3: 2, 4: 2}


def test_math_row_and_interval(spark):
    df = spark.createDataFrame(
        [("a", 2.0, 3.0), ("a", 4.0, 5.0), ("b", 1.0, 1.0)],
        "k string, x double, y double",
    )
    per_row = stats.math_op(df, "prod", "x * y")
    assert {r["prod"] for r in per_row.collect()} == {6.0, 20.0, 1.0}
    agg = stats.math_op(df, "prod", "x * y", interval_key="k",
                        results_function="sum(prod)")
    got = {r["interval_key"]: r["prod"] for r in agg.collect()}
    assert got == {"a": 26.0, "b": 1.0}


def test_throttle(spark):
    # reference TestThrottle: pass only keys seen between min and max times
    rows = [("k1",)] * 5 + [("k2",)] * 2 + [("k3",)] * 1
    df = spark.createDataFrame(rows, "key string")
    out = stats.throttle(df, "key", min_count=2, max_count=4)
    got = [r["key"] for r in out.collect()]
    assert sorted(got) == ["k2", "k2"]  # k1 over max, k3 under min


def test_throttle_timeframe(spark):
    df = spark.createDataFrame(
        [("k", 0), ("k", 1), ("k", 100), ("k", 101), ("k", 102)],
        "key string, t long",
    )
    frame = (F.col("t") / 100).cast("int")
    out = stats.throttle(df, "key", timeframe_col=frame, min_count=3)
    assert sorted(r["t"] for r in out.collect()) == [100, 101, 102]


def test_merge_event_start_pattern(spark):
    # multiline reassembly: java stacktrace style — unindented line starts
    rows = [
        ("h1", 1, "Exception in thread"),
        ("h1", 2, "  at foo()"),
        ("h1", 3, "  at bar()"),
        ("h1", 4, "OtherError"),
        ("h1", 5, "  at baz()"),
        ("h2", 1, "lonely line"),
    ]
    df = spark.createDataFrame(rows, "host string, seq int, data string")
    out = stateful.merge_event(
        df, "host", "seq", "data", start_pattern=r"^\S", glue="\n",
        keep_fields=["seq"],
    )
    got = {(r["buffer_key"], r["session"]): r for r in out.collect()}
    assert got[("h1", 1)]["data"] == "Exception in thread\n  at foo()\n  at bar()"
    assert got[("h1", 1)]["n_merged"] == 3
    assert got[("h1", 2)]["data"] == "OtherError\n  at baz()"
    assert got[("h2", 1)]["data"] == "lonely line"
    assert got[("h1", 1)]["seq"] == 1


def test_merge_event_end_pattern(spark):
    rows = [("h", 1, "a"), ("h", 2, "b END"), ("h", 3, "c"), ("h", 4, "d END")]
    df = spark.createDataFrame(rows, "host string, seq int, data string")
    out = stateful.merge_event(df, "host", "seq", "data",
                               end_pattern=r"END$", glue="|")
    vals = sorted(r["data"] for r in out.collect())
    assert vals == ["a|b END", "c|d END"]


def test_permutate(spark):
    df = spark.createDataFrame([(1, ["a", "b", "c"])], "id int, hosts array<string>")
    out = stateful.permutate(df, "hosts", ["h1", "h2"])
    pairs = {(r["h1"], r["h2"]) for r in out.collect()}
    assert pairs == {("a", "b"), ("a", "c"), ("b", "a"),
                     ("b", "c"), ("c", "a"), ("c", "b")}
    assert "hosts" not in out.columns


def test_enrich_broadcast(spark):
    ev = spark.createDataFrame([("1.1.1.1", 1), ("2.2.2.2", 2), ("9.9.9.9", 3)],
                               "ip string, n int")
    geo = spark.createDataFrame([("1.1.1.1", "AU"), ("2.2.2.2", "US")],
                                "ip string, country string")
    out = lookup.enrich(ev, geo, on="ip")
    got = {r["ip"]: r["country"] for r in out.collect()}
    assert got == {"1.1.1.1": "AU", "2.2.2.2": "US", "9.9.9.9": None}
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_enrich_from_dict_default(spark):
    ev = spark.createDataFrame([("200",), ("404",), ("999",)], "code string")
    out = lookup.enrich_from_dict(
        ev, {"200": "ok", "404": "client_error"}, "code", "klass",
        default="other",
    )
    got = {r["code"]: r["klass"] for r in out.collect()}
    assert got == {"200": "ok", "404": "client_error", "999": "other"}


def test_enrich_computed_runs_once_per_distinct(spark):
    ev = spark.createDataFrame([("a.com",)] * 50 + [("b.com",)] * 50,
                               "host string")

    def compute(distinct_df):
        return distinct_df.withColumn("resolved",
                                      F.concat(F.col("host"), F.lit("!")))

    out = lookup.enrich_computed(ev, "host", compute)
    assert out.count() == 100
    assert out.filter(F.col("resolved") == "a.com!").count() == 50


def test_upsert_latest(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from lumbermill_spark.operators.stateful import upsert_latest

    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")],
        "k long, v long, payload string")
    updates = spark.createDataFrame(
        [(1, 20, "a2"),     # newer -> replaces
         (2, 5, "b-old"),   # older -> ignored
         (3, 10, "c2"),     # equal version -> update wins
         (4, 1, "d")],      # new key -> inserted
        "k long, v long, payload string")
    out = {r.k: (r.v, r.payload)
           for r in upsert_latest(base, updates, key="k",
                                  version="v").collect()}
    assert out == {1: (20, "a2"), 2: (10, "b"),
                   3: (10, "c2"), 4: (1, "d")}

    with _pytest.raises(ValueError):
        upsert_latest(base, updates.drop("payload"), key="k", version="v")


def test_snapshot_diff(spark):
    from lumbermill_spark.operators.stateful import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, "d", 40)],
        "k long, s string, v int")
    new = spark.createDataFrame(
        [(1, "a", 10),      # unchanged
         (2, "b", None),    # unchanged — null == null (eqNullSafe)
         (3, "c", 31),      # changed
         (5, "e", 50)],     # added; 4 removed
        "k long, s string, v int")
    got = {r.k: r.status for r in snapshot_diff(old, new, key="k").collect()}
    assert got == {1: "unchanged", 2: "unchanged", 3: "changed",
                   4: "removed", 5: "added"}


def test_session_paths(spark):
    from lumbermill_spark.operators.stateful import session_paths

    rows = [
        # u1 session 0: v -> c -> p; session 1 (after gap): v
        ("u1", 1, 0, "view"), ("u1", 2, 100, "click"),
        ("u1", 3, 200, "purchase"), ("u1", 4, 9000, "view"),
        # u2: v -> c -> p (same path as u1's first session)
        ("u2", 5, 0, "view"), ("u2", 6, 50, "click"),
        ("u2", 7, 60, "purchase"),
        # u3: a long bot session — path capped at max_steps
        *[("u3", 10 + i, i, "view") for i in range(8)],
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, es long, event_type string")
    out = {r.path: (r.n_sessions, r.rank)
           for r in session_paths(df, key="user_id", ts="es", gap=1800,
                                  max_steps=5, top_k=10,
                                  order_cols=["event_id"]).collect()}
    assert out["view>click>purchase"] == (2, 1)
    assert out["view>view>view>view>view"][0] == 1   # capped at 5
    assert out["view"][0] == 1                        # u1's second session
