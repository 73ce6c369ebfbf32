"""Broadcast-join enrichment (the reference's lookup family).

Reference modules this generalizes:
- modifier.Field 'map' action: value -> small literal dict
  (/root/reference/lumbermill/modifier/Field.py:562-580) — stays a
  literal MapType expression (operators/field_actions.map_).
- modifier.AddGeoInfo (/root/reference/lumbermill/modifier/AddGeoInfo.py:128-205):
  per-ip maxmind lookup with an LRU(1000) memo cache.
- modifier.AddDnsLookup (/root/reference/lumbermill/modifier/AddDnsLookup.py:79-127):
  threadpool resolver with an LRU(5000) cache.
- parser.UserAgent / parser.DomainName: per-value library lookups with
  LRU caches.

The Spark-native shape for all of them (SURVEY.md §4): the LRU memo
cache becomes either (a) a **broadcast hash join** against a lookup
table — the lookup side ships once per executor, the big side never
shuffles — or (b) for *computed* lookups (dns, geo-mmdb, UA parse),
**dedupe-distinct → compute once per distinct key → broadcast join
back**: exactly what an LRU cache approximates, but exact, and sized by
key cardinality instead of cache luck.

north_rule names this directly: "ModifyFields/AddDateTime/lookup
modules become broadcast-join enrichments keyed on source".
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def enrich(
    df: DataFrame,
    lookup: DataFrame,
    on: str | list[str] | Column,
    select: list[str] | None = None,
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Join a (small) lookup table onto the event stream.

    ``broadcast=True`` hints BroadcastHashJoin — no shuffle of the big
    side. Set False only when the lookup exceeds executor memory; then
    AQE decides (and skew-join handles hot keys).
    """
    if select:
        keys = [on] if isinstance(on, str) else (on if isinstance(on, list) else [])
        cols = list(dict.fromkeys([*keys, *select]))
        lookup = lookup.select(*cols)
    if broadcast:
        lookup = F.broadcast(lookup)
    return df.join(lookup, on=on, how=how)


def enrich_from_dict(
    df: DataFrame,
    mapping: dict,
    source_field: str,
    target_field: str,
    default: object | None = None,
) -> DataFrame:
    """Literal-map enrichment (Field 'map' for larger dicts): builds the
    lookup DataFrame from a driver-side dict and broadcast-joins it.
    Unlike a MapType literal this scales to ~millions of entries and
    keeps the plan small."""
    spark = df.sparkSession
    lk = spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], schema=f"`{source_field}` string, `{target_field}` string"
    )
    out = df.join(F.broadcast(lk), on=source_field, how="left")
    if default is not None:
        out = out.withColumn(
            target_field, F.coalesce(F.col(target_field), F.lit(default))
        )
    return out


def enrich_computed(
    df: DataFrame,
    source_field: str,
    compute: Callable[[DataFrame], DataFrame],
    how: str = "left",
) -> DataFrame:
    """Dedupe-distinct → compute → broadcast join back (the LRU-cache
    replacement for AddDnsLookup / UserAgent / DomainName).

    ``compute`` receives a 1-column DataFrame of DISTINCT source values
    and must return it with extra columns attached (typically via a
    vectorized pandas UDF). The expensive function runs once per
    distinct value cluster-wide, not once per row — strictly better
    than the reference's per-process LRU(5000).
    """
    distinct = df.select(source_field).where(F.col(source_field).isNotNull()).distinct()
    computed = compute(distinct)
    return df.join(F.broadcast(computed), on=source_field, how=how)


def asof_join(
    facts: DataFrame,
    dims: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    dim_ts: str = "valid_from",
    dim_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Point-in-time (as-of) join: attach to each fact row the dims row
    for the same key that is nearest in time — ``backward`` (default)
    takes the latest ``dim_ts <= ts`` (SCD-2 "config version active when
    the event happened"), ``forward`` the earliest ``dim_ts >= ts``.
    Both directions are INCLUSIVE at equality.

    The reference enriches each event against whatever lookup state is
    loaded at process time (e.g. AddGeoInfo's database snapshot,
    /root/reference/lumbermill/modifier/AddGeoInfo.py:128-152); the
    distributed, replayable form is this join against the *versioned*
    lookup history keyed on event time.

    Plan — union-marker + running ``last`` window, never a join:
    tag dim rows, union them into the fact stream, sort each key
    partition by (time, dim-first-at-ties), and carry the dim payload
    forward with ``last(..., ignorenulls=True)``. One shuffle on the
    key, linear in |facts| + |dims|; no fact×versions intermediate, so
    dims with millions of versions per key stream through unchanged.
    The dim payload moves as ONE struct so a version with a null field
    can't inherit that field from an older version.

    Scale note: each key's timeline sorts inside one task — as-of
    semantics are inherently per-key ordered. Fine for source-keyed
    telemetry (many keys); for a near-constant key, pre-split the
    timeline or broadcast the dims and aggregate-filter instead.

    Requires (key, dim_ts) unique in ``dims`` (ties among dim rows at
    one instant have no defined winner). Facts with no matching version
    get nulls. Output: all fact columns + the dim payload columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = dim_cols or [c for c in dims.columns if c not in (*keys, dim_ts)]
    fact_cols = [c for c in facts.columns if c not in (*keys, ts)]

    dim_struct = F.struct(*[F.col(c) for c in payload])
    dim_type = dims.select(dim_struct.alias("_d")).schema["_d"].dataType
    fact_struct = F.struct(*[F.col(c) for c in fact_cols])
    fact_type = facts.select(fact_struct.alias("_f")).schema["_f"].dataType

    f2 = facts.select(
        *keys, F.col(ts).alias("_t"), F.lit(0).alias("_is_dim"),
        fact_struct.alias("_f"), F.lit(None).cast(dim_type).alias("_d"))
    d2 = dims.select(
        *keys, F.col(dim_ts).alias("_t"), F.lit(1).alias("_is_dim"),
        F.lit(None).cast(fact_type).alias("_f"), dim_struct.alias("_d"))
    u = f2.unionByName(d2)

    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (Window.partitionBy(*keys)
         .orderBy(t_order, F.col("_is_dim").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = (u.withColumn("_df", F.last("_d", ignorenulls=True).over(w))
               .where(F.col("_is_dim") == 0))
    return filled.select(
        *keys, F.col("_t").alias(ts),
        *[F.col("_f")[c].alias(c) for c in fact_cols],
        *[F.col("_df")[c].alias(c) for c in payload])
