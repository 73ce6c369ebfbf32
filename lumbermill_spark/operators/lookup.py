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

from pyspark.sql import Column, DataFrame
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
