"""Config-driven pipeline compiler: YAML/dict stage list -> DataFrame DAG.

The reference compiles a YAML list of module configs into a linked module
graph and pushes events through it
(/root/reference/lumbermill/LumberMill.py:105-310). Here the same shape
of config compiles into a chain of DataFrame transformations ending in a
routed fan-out write; Catalyst replaces steps analyze/optimize/physical
(SURVEY.md §3.1).

Spec shape (YAML-safe dict list, module names mirror the reference):

    pipeline:
      - input.Tokens:   {path: /data/tokens}          # or input.Synthetic
      - parser.Regex:   {source: tokens, field_extraction_patterns: [...]}
      - modifier.Field: {action: map, source_field: http_status, map: {...}}
      - output.Parquet: {name: parsed, filter: "$(event_type) != 'Unknown'",
                         partition_by: [event_type]}
      - output.DevNull: {name: unmatched, filter: "$(event_type) == 'Unknown'"}

Engine-primitive config keys honored on every module
(BaseModule.py:151-236):

- ``filter``: input filter — non-matching rows BYPASS the module
  unchanged (not dropped): split -> transform -> unionByName;
- ``add_fields`` / ``delete_fields`` / ``set_event_type``: common
  actions applied to handled rows.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lumbermill_spark.data.synth import synth_tokens
from lumbermill_spark.functions.dynamic import dynamic_value_col, has_dynamic_refs
from lumbermill_spark.functions.filters import filter_to_column
from lumbermill_spark.functions.skew import salted_repartition
from lumbermill_spark.operators import (
    enrichers, field_actions, lookup, netflow, parsers, stateful, stats)
from lumbermill_spark.operators.regex_parser import RegexParser
from lumbermill_spark.router import SinkSpec, route_and_write

try:  # optional: pyyaml isn't a hard dependency
    import yaml as _yaml
except ImportError:  # pragma: no cover
    _yaml = None


# ----------------------------------------------------------------------- #
# module builders: (df, config) -> df

def _in_tokens(spark: SparkSession, cfg: dict) -> DataFrame:
    return spark.read.format(cfg.get("format", "parquet")).load(cfg["path"])


def _in_synth(spark: SparkSession, cfg: dict) -> DataFrame:
    return synth_tokens(spark, int(cfg.get("rows", 10000)),
                        int(cfg.get("seed", 42)))


def _m_regex(df: DataFrame, cfg: dict) -> DataFrame:
    parser = RegexParser(
        cfg["field_extraction_patterns"],
        source_field=cfg.get("source_field", "data"),
        mark_unmatched_as=cfg.get("mark_unmatched_as", "Unknown"),
        break_on_match=cfg.get("break_on_match", True),
        hot_rules_first=cfg.get("hot_rules_first", True),
        engine=cfg.get("engine", "auto"),
    )
    tokens_col = cfg.get("tokens_col")
    if cfg.get("optimize_rule_order"):
        # expr-engine hot_rules_first analog: sample-measured selectivity
        parser.optimize_rule_order(df, tokens_col=tokens_col)
    return parser.apply(df, tokens_col=tokens_col,
                        drop_tokens=cfg.get("drop_tokens", False))


def _m_geo(df: DataFrame, cfg: dict) -> DataFrame:
    from lumbermill_spark.operators.enrichers import geo_enrich

    geo = df.sparkSession.read.parquet(cfg["geo_table_path"])
    return geo_enrich(df, geo, cfg["source_fields"],
                      prefix_len=cfg.get("prefix_len", 3),
                      target_field=cfg.get("target_field", "geo_info"))


def _m_field(df: DataFrame, cfg: dict) -> DataFrame:
    cfg = dict(cfg)
    action = cfg.pop("action")
    return field_actions.apply_action(df, action, **cfg)


def _m_drop(df: DataFrame, cfg: dict) -> DataFrame:
    # modifier.DropEvent (/root/reference/lumbermill/modifier/DropEvent.py:21-22)
    # is only meaningful under an input filter; standalone it drops all.
    return df.limit(0)


def _wrap(fn):
    return lambda df, cfg: fn(df, **cfg)


def _m_throttle(df: DataFrame, cfg: dict) -> DataFrame:
    """misc.Throttle: ``timeframe`` as a date_trunc unit over ``ts_field``
    (the YAML-safe stand-in for an arbitrary frame Column)."""
    cfg = dict(cfg)
    unit = cfg.pop("timeframe", None)
    ts_field = cfg.pop("ts_field", "ts")
    frame = F.date_trunc(unit, F.col(ts_field)) if unit else None
    return stats.throttle(df, cfg.pop("key"), timeframe_col=frame, **cfg)


TRANSFORMS = {
    "parser.Regex": _m_regex,
    "parser.Csv": _wrap(parsers.parse_csv),
    "parser.Json": _wrap(parsers.parse_json),
    "parser.JsonEncode": _wrap(parsers.encode_json),
    "parser.Line": _wrap(parsers.parse_line),
    "parser.DateTime": _wrap(parsers.parse_datetime),
    "parser.Url": _wrap(parsers.parse_url),
    "parser.UrlEncode": _wrap(parsers.encode_url),
    "parser.SyslogPrival": _wrap(parsers.parse_syslog_prival),
    "parser.Base64": _wrap(parsers.base64_codec),
    "parser.Encoding": _wrap(parsers.recode_charset),
    "parser.Inflate": _wrap(parsers.inflate),
    "parser.MsgPack": _wrap(parsers.parse_msgpack),
    "parser.XPath": _wrap(parsers.parse_xpath),
    "parser.DomainName": _wrap(enrichers.split_domain),
    "parser.UserAgent": _wrap(enrichers.parse_user_agent),
    "parser.NetFlow": _wrap(netflow.parse_netflow),
    "modifier.AddGeoInfo": _m_geo,
    "modifier.Field": _m_field,
    "modifier.AddDateTime": _wrap(parsers.add_datetime),
    "modifier.DropEvent": _m_drop,
    "modifier.Math": _wrap(stats.math_op),
    "modifier.MergeEvent": _wrap(stateful.merge_event),
    "modifier.Permutate": _wrap(stateful.permutate),
    "modifier.Lookup": _wrap(lookup.enrich_from_dict),
    "misc.Facet": _wrap(stats.facet),
    "misc.Metrics": _wrap(stats.metrics),
    "misc.SimpleStats": _wrap(stats.simple_stats),
    "misc.Throttle": _m_throttle,
    "misc.SaltedRepartition": _wrap(salted_repartition),
    "misc.Noop": lambda df, cfg: df,
}

INPUTS = {
    "input.Tokens": _in_tokens,
    "input.Synthetic": _in_synth,
}

OUTPUTS = {"output.Parquet", "output.File", "output.DevNull", "output.StdOut"}


def _common_actions(df: DataFrame, cfg: dict) -> DataFrame:
    """add_fields / delete_fields / set_event_type (BaseModule.py:217-236)."""
    for k, v in (cfg.get("add_fields") or {}).items():
        col = (dynamic_value_col(v, df.columns)
               if isinstance(v, str) and has_dynamic_refs(v) else F.lit(v))
        df = df.withColumn(k, col)
    for k in cfg.get("delete_fields") or []:
        df = df.drop(k)
    if cfg.get("set_event_type"):
        df = df.withColumn("event_type", F.lit(cfg["set_event_type"]))
    return df


_COMMON_KEYS = {"filter", "add_fields", "delete_fields", "set_event_type"}


def _apply_module(df: DataFrame, name: str, cfg: dict) -> DataFrame:
    cfg = dict(cfg or {})
    input_filter = cfg.pop("filter", None)
    common = {k: cfg.pop(k) for k in list(cfg) if k in _COMMON_KEYS}
    fn = TRANSFORMS[name]
    if input_filter is None:
        return _common_actions(fn(df, cfg), common)
    # input-filter pass-through (BaseModule.py:260-276): non-matching rows
    # bypass unchanged
    pred = filter_to_column(input_filter)
    handled = _common_actions(fn(df.filter(pred), cfg), common)
    bypassed = df.filter(~F.coalesce(pred, F.lit(False)))
    return handled.unionByName(bypassed, allowMissingColumns=True)


class CompiledPipeline:
    def __init__(self, spark: SparkSession, stages: list, sinks: list[SinkSpec],
                 source_df: DataFrame | None):
        self.spark = spark
        self.stages = stages            # [(name, cfg), ...] transform modules
        self.sinks = sinks
        self._source = source_df

    def dataframe(self, df: DataFrame | None = None) -> DataFrame:
        """The transform DAG output (pre-routing)."""
        cur = df if df is not None else self._source
        if cur is None:
            raise ValueError("pipeline has no input stage and no df given")
        for name, cfg in self.stages:
            cur = _apply_module(cur, name, cfg)
        return cur

    def run(self, base: str, run_id: str | None = None, resume: bool = False,
            df: DataFrame | None = None, **route_kw) -> dict:
        out = self.dataframe(df)
        run_id = run_id or uuid.uuid4().hex[:12]
        if not self.sinks:
            raise ValueError("pipeline has no output stage")
        return route_and_write(out, self.sinks, base, run_id=run_id,
                               resume=resume, **route_kw)


def compile_pipeline(spark: SparkSession, spec: list | dict | str) -> CompiledPipeline:
    """spec: a list of {ModuleName: config} items, a {'pipeline': [...]}
    dict, or a YAML string of either."""
    if isinstance(spec, str):
        if _yaml is None:
            raise RuntimeError("pyyaml not available for YAML specs")
        spec = _yaml.safe_load(spec)
    if isinstance(spec, dict):
        spec = spec.get("pipeline", [])
    source_df = None
    stages: list = []
    sinks: list[SinkSpec] = []
    for item in spec:
        (name, cfg), = item.items()
        cfg = cfg or {}
        if name in INPUTS:
            source_df = INPUTS[name](spark, cfg)
        elif name in OUTPUTS:
            fmt = {"output.Parquet": "parquet", "output.File": "text",
                   "output.DevNull": "noop", "output.StdOut": "noop"}[name]
            sinks.append(SinkSpec(
                name=cfg.get("name", f"sink{len(sinks)}"),
                filter=cfg.get("filter"),
                path=cfg.get("path"),
                format=cfg.get("format", fmt),
                partition_by=cfg.get("partition_by", []),
                columns=cfg.get("columns"),
                mode=cfg.get("mode", "overwrite"),
                compression=cfg.get("compression"),
                line_format=cfg.get("line_format") or cfg.get("format_line"),
            ))
        elif name in TRANSFORMS:
            stages.append((name, cfg))
        else:
            raise ValueError(f"unknown module {name!r}")
    return CompiledPipeline(spark, stages, sinks, source_df)
