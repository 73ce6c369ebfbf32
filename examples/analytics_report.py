"""End-to-end telemetry analytics example: the product/ops report a
log-pipeline team derives from the event stream, on the sf test data.

    python examples/analytics_report.py [sf_dir]

Sections (each a library operator; see lumbermill_spark/operators/):
 1. as-of config enrichment — every event picks up the config version
    active at its event time (lookup.asof_join over an SCD-2 history;
    union-marker window, one shuffle, no fact x versions join)
 2. sessions    — gap-based sessionization (stateful.sessionize_gap)
    + per-session aggregates and per-config session length comparison
 3. engagement  — DAU / trailing-7-day WAU (stats.active_users),
    weekly cohort retention (stats.cohort_retention)
 4. conversion  — ordered view -> click -> purchase funnel
    (stats.funnel_counts)
 5. stream health — inter-arrival p50/p95 per type
    (stats.inter_arrival_stats), hourly top-K heavy hitters
    (stats.top_k_per_group), z-score outliers (stats.zscore_flags)
 6. shape       — one-pass ROLLUP subtotals (stats.rollup_agg) and a
    day x type pivot (stats.pivot_counts)
 7. journeys    — top session paths (stateful.session_paths) and
    within-session association rules (stats.association_rules)

Everything before a .show() is one lazy DataFrame chain — Catalyst sees
the whole plan per section; nothing is collected except the rendered
report rows.
"""
import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from lumbermill_spark.operators import stateful, stats  # noqa: E402
from lumbermill_spark.operators.lookup import asof_join  # noqa: E402
from lumbermill_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("analytics-report", cores=8)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    # 1. as-of config enrichment (deploy history: per-type quartiles)
    base = ev.select("event_id", "user_id", "event_type", "ts",
                     F.unix_timestamp("ts").alias("es"))
    bounds = base.groupBy("event_type").agg(
        F.min("es").alias("t0"), F.max("es").alias("t1"))
    vers = (bounds.select(
        "event_type", "t0",
        F.floor((F.col("t1") - F.col("t0")) / F.lit(4)).cast("long").alias("step"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"))
        .select("event_type",
                (F.col("t0") + F.col("k") * F.col("step")).alias("valid_from"),
                F.concat(F.lit("v"), (F.col("k") + 1).cast("string")).alias("cfg"))
        .groupBy("event_type", "valid_from").agg(F.max("cfg").alias("cfg")))
    enriched = asof_join(base, vers, on="event_type", ts="es",
                         dim_ts="valid_from")

    # 2. sessions: 30-min silence splits; mean session length per cfg
    s = stateful.sessionize_gap(enriched, key="user_id", ts="es", gap=1800)
    sessions = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("es") - F.min("es")).alias("dur_s"),
        F.min_by("cfg", "es").alias("entry_cfg"))
    print("== sessions per entry config ==")
    sessions.groupBy("entry_cfg").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 2).alias("avg_events"),
        F.round(F.avg("dur_s"), 1).alias("avg_dur_s"),
    ).orderBy("entry_cfg").show()

    # 3. engagement
    print("== DAU / WAU (first 10 days) ==")
    stats.active_users(ev).orderBy("day").show(10)
    print("== weekly cohort retention ==")
    stats.cohort_retention(ev).orderBy("cohort_period",
                                       "periods_since").show()

    # 4. conversion funnel
    print("== view -> click -> purchase funnel ==")
    stats.funnel_counts(ev, steps=["view", "click", "purchase"]).show()

    # 5. stream health
    print("== inter-arrival profile per type ==")
    stats.inter_arrival_stats(ev, key="event_type", ts="ts",
                              id_col="event_id").orderBy("event_type").show()
    print("== hourly heavy hitters (top 3 users, first rows) ==")
    hourly = ev.groupBy(F.window("ts", "1 hour").alias("w"),
                        "event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n"))
    stats.top_k_per_group(hourly, ["w", "event_type"], "n", 3,
                          tiebreak_fields=["user_id"]) \
        .select(F.col("w.start").alias("hour"), "event_type",
                "user_id", "n", "rank").orderBy("hour").show(6)
    print("== value outliers (|z| > 2.5) per type ==")
    stats.zscore_flags(ev, "value", ["event_type"], threshold=2.5) \
        .where("is_outlier").groupBy("event_type").count().show()

    # 6. shape
    print("== ROLLUP subtotals (type x day, first rows) ==")
    shaped = ev.select("event_type",
                       F.date_format("ts", "yyyy-MM-dd").alias("day"),
                       F.floor("value").cast("long").alias("fv"))
    stats.rollup_agg(shaped, ["event_type", "day"],
                     [F.count(F.lit(1)).alias("n"),
                      F.sum("fv").alias("sum_fv")]) \
        .orderBy("event_type", "day").show(8)
    print("== day x type pivot (first rows) ==")
    stats.pivot_counts(
        ev.select(F.date_format("ts", "yyyy-MM-dd").alias("day"),
                  "event_type"),
        "day", "event_type",
        ["click", "error", "purchase", "signup", "view"]) \
        .orderBy("day").show(5)

    # 7. journeys
    print("== top session paths ==")
    stateful.session_paths(
        ev.select("user_id", "event_id", "event_type",
                  F.unix_timestamp("ts").alias("es2")),
        key="user_id", ts="es2", gap=1800, max_steps=5, top_k=5,
        order_cols=["event_id"]).show(truncate=False)
    print("== within-session association rules (top lift) ==")
    sess = stateful.sessionize_gap(
        ev.select("user_id", "event_type",
                  F.unix_timestamp("ts").alias("es3")),
        key="user_id", ts="es3", gap=1800)
    txn = sess.select(
        F.concat_ws("#", F.col("user_id").cast("string"),
                    F.col("session_id").cast("string")).alias("txn_id"),
        F.col("event_type").alias("item"))
    stats.association_rules(txn, min_pair_count=5) \
        .orderBy(F.col("lift").desc()).show(5)


if __name__ == "__main__":
    main(*sys.argv[1:2])
