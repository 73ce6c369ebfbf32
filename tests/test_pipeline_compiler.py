"""Compiler-level features: config validation, set_internal store,
ExecPython escape hatch, Kafka option wiring."""

import pytest
from pyspark.sql import functions as F

from lumbermill_spark.pipeline import compile_pipeline


@pytest.fixture()
def ev(spark):
    return spark.createDataFrame(
        [(1, "click", 3.0), (2, "error", 5.0), (3, "click", 2.0)],
        "event_id long, event_type string, value double",
    )


# ------------------------------------------------------------------ #
# config validation (ConfigurationValidator.py analog)

def test_unknown_module_fails_at_compile(spark):
    with pytest.raises(ValueError, match="unknown module.*parser.Regx"):
        compile_pipeline(spark, [{"parser.Regx": {}}])


def test_unknown_module_suggests(spark):
    with pytest.raises(ValueError, match="did you mean 'parser.Regex'"):
        compile_pipeline(spark, [{"parser.Regex2": {}}])


def test_unknown_option_fails_before_any_job(spark):
    with pytest.raises(ValueError,
                       match="unknown option 'sourcefield'.*parser.Csv"):
        compile_pipeline(spark, [
            {"parser.Csv": {"fieldnames": ["a"], "sourcefield": "x"}},
        ])


def test_unknown_option_suggests(spark):
    with pytest.raises(ValueError, match="did you mean 'source_field'"):
        compile_pipeline(spark, [
            {"parser.Csv": {"fieldnames": ["a"], "sourcefield": "x"}},
        ])


def test_unknown_field_action_fails(spark):
    with pytest.raises(ValueError, match="unknown field action 'uper'"):
        compile_pipeline(spark, [{"modifier.Field": {"action": "uper"}}])


def test_field_action_option_validated(spark):
    with pytest.raises(ValueError,
                       match="unknown option 'sourcefield'.*modifier.Field"):
        compile_pipeline(spark, [
            {"modifier.Field": {"action": "upper", "sourcefield": ["x"]}},
        ])


def test_missing_required_option_fails_at_compile(spark):
    # ADVICE r2: a misc.SetInternal without 'key' used to die later with
    # a bare KeyError inside dataframe(); _wrap'ed modules missing a
    # required param used to surface as TypeError from the builder.
    # Both must fail at compile naming the field.
    with pytest.raises(ValueError,
                       match="misc.SetInternal.*missing required.*'key'"):
        compile_pipeline(spark, [{"misc.SetInternal": {"value": "x"}}])
    with pytest.raises(ValueError,
                       match="parser.Csv.*missing required.*'fieldnames'"):
        compile_pipeline(spark, [{"parser.Csv": {"source_field": "x"}}])
    with pytest.raises(ValueError,
                       match="parser.Regex.*'field_extraction_patterns'"):
        compile_pipeline(spark, [{"parser.Regex": {}}])
    with pytest.raises(ValueError,
                       match="modifier.Field.*missing required"):
        compile_pipeline(spark, [{"modifier.Field": {"action": "rename"}}])


def test_sink_and_input_options_validated(spark):
    with pytest.raises(ValueError, match="unknown option 'filtr'"):
        compile_pipeline(spark, [{"output.Parquet": {"filtr": "x"}}])
    with pytest.raises(ValueError, match="unknown option 'rows'"):
        compile_pipeline(spark, [{"input.Tokens": {"rows": 5}}])


def test_common_keys_still_accepted(spark, ev):
    p = compile_pipeline(spark, [
        {"modifier.Field": {"action": "upper", "source_fields": ["event_type"],
                            "filter": "$(value) > 2.5"}},
    ])
    out = {r["event_id"]: r["event_type"] for r in p.dataframe(ev).collect()}
    assert out == {1: "CLICK", 2: "ERROR", 3: "click"}


# ------------------------------------------------------------------ #
# set_internal (BaseModule.py:234-235 analog)

def test_set_internal_feeds_later_module(spark, ev):
    p = compile_pipeline(spark, [
        {"misc.SetInternal": {"key": "run_tag", "value": "r42"}},
        {"modifier.Field": {"action": "insert", "target_field": "tag",
                            "value": "@internal:run_tag"}},
    ])
    out = p.dataframe(ev)
    assert {r["tag"] for r in out.collect()} == {"r42"}
    # programmatic surface + broadcast handle
    p.internal.set("threshold", 2.5)
    assert p.internal.get("threshold") == 2.5
    assert p.internal.broadcast("threshold").value == 2.5


def test_internal_unset_key_raises(spark, ev):
    p = compile_pipeline(spark, [
        {"modifier.Field": {"action": "insert", "target_field": "tag",
                            "value": "@internal:nope"}},
    ])
    with pytest.raises(KeyError, match="nope"):
        p.dataframe(ev)


# ------------------------------------------------------------------ #
# ExecPython escape hatch (modifier/ExecPython.py analog)

def test_exec_python_fn(spark, ev):
    from lumbermill_spark.operators.escape import exec_python

    def double(pdf):
        pdf = pdf.copy()
        pdf["value"] = pdf["value"] * 2
        return pdf

    out = exec_python(ev, fn=double)
    assert {r["value"] for r in out.collect()} == {6.0, 10.0, 4.0}
    assert out.schema == ev.schema


def test_exec_python_code_via_pipeline(spark, ev):
    code = (
        "def transform(pdf):\n"
        "    pdf = pdf.copy()\n"
        "    pdf['event_type'] = pdf['event_type'].str.upper()\n"
        "    return pdf\n"
    )
    p = compile_pipeline(spark, [{"modifier.ExecPython": {"code": code}}])
    out = {r["event_type"] for r in p.dataframe(ev).collect()}
    assert out == {"CLICK", "ERROR"}


def test_exec_python_schema_change(spark, ev):
    from lumbermill_spark.operators.escape import exec_python

    out = exec_python(
        ev,
        code=("def transform(pdf):\n"
              "    import pandas as pd\n"
              "    return pd.DataFrame({'n': [len(pdf)]})\n"),
        schema="n long",
    )
    assert sum(r["n"] for r in out.collect()) == 3


def test_exec_python_arg_validation(spark, ev):
    from lumbermill_spark.operators.escape import exec_python

    with pytest.raises(ValueError, match="exactly one"):
        exec_python(ev)
    with pytest.raises(ValueError, match="exactly one"):
        exec_python(ev, fn=lambda p: p, code="x = 1")


# ------------------------------------------------------------------ #
# Kafka option wiring (jar-gated; no broker needed)

def test_kafka_option_wiring():
    from lumbermill_spark.streaming.kafka import (
        kafka_read_options, kafka_write_options)

    r = kafka_read_options(brokers=["b1:9092", "b2:9092"],
                           topics=["logs", "metrics"],
                           group_id="lm", starting_offsets="earliest")
    assert r == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "logs,metrics",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
        "kafka.group.id": "lm",
    }
    w = kafka_write_options(brokers="b1:9092", topic="out")
    assert w == {"kafka.bootstrap.servers": "b1:9092", "topic": "out"}


def test_kafka_source_fails_fast_without_jar(spark):
    from lumbermill_spark.streaming.kafka import kafka_source

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_source(spark, brokers="b:9092", topics="t")


# ------------------------------------------------------------------ #
# multimodal real codec (conditional on Pillow)

def test_decode_images_real_codec_runs(spark):
    # real codec must execute in ANY runtime: Pillow when present, the
    # bundled pure-stdlib PNG codec otherwise (stub is video-only now)
    import numpy as np

    from lumbermill_spark.functions import png_lite
    from lumbermill_spark.training import multimodal

    rgb = np.zeros((6, 8, 3), dtype=np.uint8)
    rgb[:, :, 0] = 255                        # pure red
    gray = np.full((4, 5), 128, dtype=np.uint8)
    df = spark.createDataFrame(
        [("m-rgb", bytearray(png_lite.encode_png(rgb))),
         ("m-gray", bytearray(png_lite.encode_png(gray)))],
        "media_id string, payload binary")
    rows = {r["media_id"]: r
            for r in multimodal.decode_images(df, codec="real").collect()}
    r = rows["m-rgb"]
    assert (r["width"], r["height"], r["channels"]) == (8, 6, 3)
    assert abs(r["mean_luma"] - 0.299) < 2 / 255  # ITU-R 601-2 red luma
    g = rows["m-gray"]
    assert (g["width"], g["height"], g["channels"]) == (5, 4, 1)
    assert abs(g["mean_luma"] - 128 / 255) < 1e-6
    # non-image payloads still fail loudly, not silently
    media = multimodal.synth_media(spark, 2)
    with pytest.raises(Exception,
                       match="not a PNG|cannot identify|image"):
        multimodal.decode_images(media, codec="real").collect()


def test_resize_real_codec(spark):
    import numpy as np

    from lumbermill_spark.functions import png_lite
    from lumbermill_spark.training import multimodal

    arr = np.arange(12 * 10 * 3, dtype=np.uint8).reshape(12, 10, 3)
    df = spark.createDataFrame(
        [("m-1", bytearray(png_lite.encode_png(arr)))],
        "media_id string, payload binary")
    out = multimodal.resize(df, 5, 6, codec="real").first()
    assert (out["width"], out["height"]) == (5, 6)
    back = png_lite.decode_png(bytes(out["payload"]))
    assert back.shape == (6, 5, 3)


def test_iceberg_option_wiring():
    from lumbermill_spark.iceberg import iceberg_catalog_conf, read_options

    c = iceberg_catalog_conf(catalog="lm", warehouse="file:///tmp/w")
    assert c == {
        "spark.sql.catalog.lm": "org.apache.iceberg.spark.SparkCatalog",
        "spark.sql.catalog.lm.type": "hadoop",
        "spark.sql.catalog.lm.warehouse": "file:///tmp/w",
    }
    # non-hadoop catalogs carry no warehouse key
    assert "spark.sql.catalog.h.warehouse" not in iceberg_catalog_conf(
        catalog="h", catalog_type="hive")
    assert read_options(snapshot_id=42) == {"snapshot-id": "42"}
    assert read_options(as_of_ms=1700000000000) == {
        "as-of-timestamp": "1700000000000"}
    assert read_options() == {}
    with pytest.raises(ValueError, match="not both"):
        read_options(snapshot_id=1, as_of_ms=2)


def test_iceberg_fails_fast_without_jar(spark):
    from lumbermill_spark.iceberg import read_table, write_table

    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_table(spark, "lm.db.tokens")
    df = spark.range(1)
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        write_table(df, "lm.db.tokens")
    # mode vocabulary: full overwrite and dynamic partition overwrite
    # are distinct modes (overwritePartitions only replaces partitions
    # present in df — not what the name "overwrite" promises)
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        write_table(df, "lm.db.tokens", mode="overwrite_partitions")
    with pytest.raises(ValueError, match="mode must be"):
        write_table(df, "lm.db.tokens", mode="replace")


def test_required_if_sink_merge(spark):
    # conditional config validation (reference `is: required if ...`
    # clauses, ConfigurationValidator.py:26-45): a merge-mode output
    # without merge_key/merge_version must fail AT COMPILE, naming the
    # missing options, before any Spark job runs
    from lumbermill_spark.pipeline import compile_pipeline

    bad = [{"input.Synthetic": {"rows": 10}},
           {"output.Parquet": {"name": "docs", "mode": "merge"}}]
    with pytest.raises(ValueError,
                       match="required when 'mode' is 'merge'"):
        compile_pipeline(spark, bad)
    ok = [{"input.Synthetic": {"rows": 10}},
          {"output.Parquet": {"name": "docs", "mode": "merge",
                              "merge_key": "doc_id",
                              "merge_version": "seq"}}]
    compiled = compile_pipeline(spark, ok)
    assert compiled.sinks[0].merge_key == "doc_id"
