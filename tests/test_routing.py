"""Routing, sinks, checkpoint/resume, pipeline compiler — F9 fixtures.

Golden checks per sink: count(*), sum(n_tok), doc_id set equality, exact
token-array pass-through (BASELINE.json invariant), resume-without-
reprocessing (EventBuffer analog).
"""

import pytest
from pyspark.sql import functions as F

from lumbermill_spark import checkpoint as ckpt
from lumbermill_spark.data.synth import synth_tokens
from lumbermill_spark.functions.filters import filter_to_sql
from lumbermill_spark.pipeline import compile_pipeline
from lumbermill_spark.pipelines_builtin import ACCESS_RULES
from lumbermill_spark.router import SinkSpec, route, route_and_write


def test_filter_translation():
    assert filter_to_sql("if $(remote_ip) == '1.2.3.4'") == "`remote_ip` == '1.2.3.4'"
    assert (filter_to_sql("$(a) == 1 and re.match('GET', $(url))")
            == "`a` == 1 and (`url` rlike '^GET')")
    with pytest.raises(ValueError):
        filter_to_sql("__import__('os').system('x')")


@pytest.fixture(scope="module")
def parsed(spark):
    from lumbermill_spark.operators.regex_parser import RegexParser
    df = synth_tokens(spark, 2000)
    return RegexParser(ACCESS_RULES, engine="expr").apply(
        df, tokens_col="tokens").cache()


def test_route_partition_of_rows(spark, parsed):
    sinks = [
        SinkSpec("parsed", "$(event_type) != 'Unknown'"),
        SinkSpec("unmatched", "$(event_type) == 'Unknown'"),
    ]
    branches = route(parsed, sinks)
    n_all = parsed.count()
    n_p = branches["parsed"].count()
    n_u = branches["unmatched"].count()
    assert n_p + n_u == n_all and n_u > 0


def test_route_and_write_golden(spark, parsed, tmp_path):
    base = str(tmp_path / "out")
    sinks = [
        SinkSpec("parsed", "$(event_type) != 'Unknown'",
                 partition_by=["event_type"]),
        SinkSpec("unmatched", "$(event_type) == 'Unknown'"),
    ]
    res = route_and_write(parsed, sinks, base, run_id="r1")
    # per-sink golden counts vs direct computation
    expect_p = parsed.filter("event_type != 'Unknown'")
    assert res["parsed"]["rows"] == expect_p.count()
    assert res["parsed"]["tokens"] == expect_p.agg(F.sum("n_tok")).first()[0]

    back = spark.read.parquet(f"{base}/parsed")
    # routed-row set equality on doc_id
    a = {r["doc_id"] for r in back.select("doc_id").collect()}
    b = {r["doc_id"] for r in expect_p.select("doc_id").collect()}
    assert a == b
    # exact token-array pass-through per doc_id (BASELINE invariant)
    src = parsed.select("doc_id", F.col("tokens").alias("t_src"))
    joined = back.join(src, "doc_id")
    assert joined.filter(F.col("tokens") != F.col("t_src")).count() == 0

    # checkpoint table carries rows/tokens + per-partition lineage
    cp = ckpt.read_checkpoints(spark, base)
    row = cp.filter("sink = 'parsed'").first()
    assert row["rows"] == res["parsed"]["rows"]
    assert row["tokens"] == res["parsed"]["tokens"]
    assert sum(x["rows"] for x in row["lineage"]) == row["rows"]


def test_resume_skips_committed(spark, parsed, tmp_path):
    base = str(tmp_path / "out2")
    sinks = [
        SinkSpec("parsed", "$(event_type) != 'Unknown'"),
        SinkSpec("unmatched", "$(event_type) == 'Unknown'"),
    ]
    first = route_and_write(parsed, sinks, base, run_id="rr", resume=True)
    assert not first["parsed"]["skipped"]
    # "killed after commit" restart: same run_id -> both sinks skipped,
    # no reprocessing
    second = route_and_write(parsed, sinks, base, run_id="rr", resume=True)
    assert second["parsed"]["skipped"] and second["unmatched"]["skipped"]
    # different run -> processed again
    third = route_and_write(parsed, sinks, base, run_id="rr2", resume=True)
    assert not third["parsed"]["skipped"]
    assert third["parsed"]["rows"] == first["parsed"]["rows"]


def test_partial_crash_resume(spark, parsed, tmp_path):
    # simulate: sink1 committed, job died before sink2 -> resume rewrites
    # only sink2
    base = str(tmp_path / "out3")
    s1 = [SinkSpec("parsed", "$(event_type) != 'Unknown'")]
    route_and_write(parsed, s1, base, run_id="rz", resume=True)
    both = s1 + [SinkSpec("unmatched", "$(event_type) == 'Unknown'")]
    res = route_and_write(parsed, both, base, run_id="rz", resume=True)
    assert res["parsed"]["skipped"] is True
    assert res["unmatched"]["skipped"] is False
    total = (spark.read.parquet(f"{base}/parsed").count()
             + spark.read.parquet(f"{base}/unmatched").count())
    assert total == parsed.count()


def test_pipeline_compiler_end_to_end(spark, tmp_path):
    base = str(tmp_path / "pipe")
    spec = [
        {"input.Synthetic": {"rows": 1000}},
        {"parser.Regex": {"field_extraction_patterns": ACCESS_RULES,
                          "tokens_col": "tokens", "engine": "expr"}},
        {"modifier.Field": {"action": "map", "source_field": "http_status",
                            "map": {"200": "OK", "301": "Moved", "304": "Not Modified",
                                    "400": "Bad Request", "404": "Not Found",
                                    "500": "Server Error"}}},
        {"output.Parquet": {"name": "parsed",
                            "filter": "$(event_type) != 'Unknown'",
                            "partition_by": ["event_type"]}},
        {"output.Parquet": {"name": "unmatched",
                            "filter": "$(event_type) == 'Unknown'"}},
    ]
    pipe = compile_pipeline(spark, spec)
    res = pipe.run(base, run_id="p1")
    assert res["parsed"]["rows"] + res["unmatched"]["rows"] == 1000
    back = spark.read.parquet(f"{base}/parsed")
    assert "http_status_mapped" in back.columns
    assert back.filter("event_type = 'httpd_access_log'").count() > 0


def test_pipeline_input_filter_passthrough(spark):
    # BaseModule.py:260-276: non-matching events bypass the module UNCHANGED
    df = spark.createDataFrame([("a", "keep"), ("b", "skip")], "v string, tag string")
    spec = [
        {"modifier.Field": {"action": "upper", "source_fields": ["v"],
                            "filter": "$(tag) == 'keep'"}},
    ]
    pipe = compile_pipeline(spark, spec)
    rows = {r["tag"]: r["v"] for r in pipe.dataframe(df).collect()}
    assert rows == {"keep": "A", "skip": "b"}


def test_pipeline_common_actions(spark):
    df = spark.createDataFrame([("x",)], "v string")
    spec = [
        {"misc.Noop": {"add_fields": {"greeting": "hello $(v)"},
                       "set_event_type": "tagged"}},
    ]
    out = compile_pipeline(spark, spec).dataframe(df).first()
    assert out["greeting"] == "hello x"
    assert out["event_type"] == "tagged"


def test_pipeline_extended_modules(spark):
    """New registry entries: Math, Throttle, SimpleStats, Salted
    repartition compile and run from a YAML-shaped spec."""
    from lumbermill_spark.pipeline import compile_pipeline

    spec = [
        {"input.Synthetic": {"rows": 2000}},
        {"misc.SaltedRepartition": {"key": "source", "buckets": 4,
                                    "num_partitions": 8}},
        {"modifier.Math": {"target_field": "tok2", "function": "n_tok * 2"}},
        {"misc.SimpleStats": {"group_field": "source"}},
    ]
    pipe = compile_pipeline(spark, spec)
    out = pipe.dataframe()
    got = {r["source"]: r["events_received"] for r in out.collect()}
    assert sum(got.values()) == 2000
    assert set(got) == {"apache", "nginx", "syslog", "unknown"}


def test_pipeline_throttle_module(spark):
    from lumbermill_spark.pipeline import compile_pipeline

    spec = [
        {"misc.Throttle": {"key": "k", "min_count": 2}},
    ]
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    out = compile_pipeline(spark, spec).dataframe(df)
    assert [r["k"] for r in out.collect()] == ["a", "a"]


def test_file_sink_line_format(spark, tmp_path):
    from lumbermill_spark.router import SinkSpec, route_and_write

    df = spark.createDataFrame(
        [("e1", "click", 3), ("e2", "error", 5)],
        "doc_id string, event_type string, n_tok int",
    )
    base = str(tmp_path / "out")
    res = route_and_write(
        df,
        [SinkSpec("lines", format="text",
                  line_format="$(doc_id)|$(event_type)|$(n_tok)")],
        base, run_id="r1",
    )
    assert res["lines"]["rows"] == 2
    got = sorted(r["value"] for r in spark.read.text(f"{base}/lines").collect())
    assert got == ["e1|click|3", "e2|error|5"]


def test_route_and_write_tagged(spark, tmp_path):
    from lumbermill_spark.router import SinkSpec, route_and_write_tagged

    df = spark.createDataFrame(
        [("d1", "click", 3), ("d2", "error", 5), ("d3", "click", 2)],
        "doc_id string, event_type string, n_tok int",
    )
    sinks = [
        SinkSpec("errs", "$(event_type) == 'error'"),
        SinkSpec("rest", None),
    ]
    base = str(tmp_path / "tagged")
    res = route_and_write_tagged(df, sinks, base, run_id="t1")
    assert res["errs"]["rows"] == 1 and res["errs"]["tokens"] == 5
    assert res["rest"]["rows"] == 2 and res["rest"]["tokens"] == 5
    # data lands under sink= partitions and is readable per sink
    errs = spark.read.parquet(f"{base}/routed").filter("sink = 'errs'")
    assert [r["doc_id"] for r in errs.collect()] == ["d2"]
    # checkpoint rows committed per sink
    from lumbermill_spark.checkpoint import read_checkpoints
    ck = read_checkpoints(spark, base)
    assert ck.filter("run_id = 't1'").count() == 2


def test_route_and_write_tagged_rejects_configured_sinks(spark, tmp_path):
    import pytest

    from lumbermill_spark.router import SinkSpec, route_and_write_tagged

    df = spark.createDataFrame([("d1", "click", 3)],
                               "doc_id string, event_type string, n_tok int")
    # the single-pass writer can't honor a per-sink path/format/
    # line_format — it must refuse, not silently write parquet elsewhere
    for spec in [
        SinkSpec("s", None, path=str(tmp_path / "elsewhere")),
        SinkSpec("s", None, format="json"),
        SinkSpec("s", None, line_format="$(doc_id)"),
        SinkSpec("s", None, columns=["doc_id"]),
    ]:
        with pytest.raises(ValueError, match="cannot honor"):
            route_and_write_tagged(df, [spec], str(tmp_path / "t"))


def test_filter_struct_field_access(spark):
    from pyspark.sql import functions as F

    from lumbermill_spark.functions.filters import filter_to_column

    df = spark.createDataFrame([(1,)], "id int").withColumn(
        "geo", F.struct(F.lit("DE").alias("country"))
    )
    assert df.filter(filter_to_column("$(geo.country) == 'DE'")).count() == 1
    assert df.filter(filter_to_column("$(geo.country) == 'US'")).count() == 0


def test_pipeline_enricher_modules(spark, tmp_path):
    from lumbermill_spark.pipeline import compile_pipeline

    geo_path = str(tmp_path / "geo")
    spark.createDataFrame([("10.0.1", "DE")], "ip_prefix string, country string") \
        .write.parquet(geo_path)
    spec = [
        {"parser.DomainName": {"source_field": "host"}},
        {"parser.UserAgent": {"source_field": "ua"}},
        {"modifier.AddGeoInfo": {"geo_table_path": geo_path,
                                 "source_fields": ["ip"], "prefix_len": 3}},
    ]
    df = spark.createDataFrame(
        [("www.example.co.uk", "curl/8.0.1", "10.0.1.9")],
        "host string, ua string, ip string",
    )
    out = compile_pipeline(spark, spec).dataframe(df).first()
    assert out["domain"] == "example" and out["tld"] == "co.uk"
    assert out["user_agent_info"]["browser"] == "curl"
    assert out["geo_info"]["country"] == "DE"


def test_route_and_write_no_persist(spark, tmp_path):
    # persist_level=None: each sink recomputes with filter pushdown
    # instead of caching the routed parent — results must be identical
    from lumbermill_spark.router import SinkSpec, route_and_write

    df = spark.createDataFrame(
        [("d%d" % i, "error" if i % 3 == 0 else "click", i)
         for i in range(60)],
        "doc_id string, event_type string, n_tok int",
    )
    sinks = [
        SinkSpec("errs", "$(event_type) == 'error'",
                 path=str(tmp_path / "errs")),
        SinkSpec("rest", "$(event_type) != 'error'",
                 path=str(tmp_path / "rest")),
    ]
    res = route_and_write(df, sinks, str(tmp_path), run_id="np",
                          persist_level=None)
    assert res["errs"]["rows"] == 20 and res["rest"]["rows"] == 40
    assert spark.read.parquet(str(tmp_path / "errs")).count() == 20


def test_merge_mode_sink(spark, tmp_path):
    # ES 'update' bulk-action analog (ElasticSearch.py:166-194): two
    # batches with overlapping doc_ids route into a merge-mode sink;
    # the sink's committed snapshot holds exactly the latest-version
    # row per doc_id, survives a re-run of the same run_id (resume),
    # and an uncommitted snapshot dir is ignored (crash before commit).
    from lumbermill_spark.router import merge_snapshot_path, read_merged

    base = str(tmp_path / "m")
    spec = [SinkSpec("docs", None, mode="merge",
                     merge_key="doc_id", merge_version="version")]
    b1 = spark.createDataFrame(
        [(1, 1, "a1", 3), (2, 1, "b1", 4), (3, 1, "c1", 5)],
        "doc_id long, version long, body string, n_tok long")
    r1 = route_and_write(b1, spec, base, run_id="m1")
    assert r1["docs"]["rows"] == 3 and r1["docs"]["tokens"] == 12
    # batch 2: doc 2 updated (v2), doc 3 STALE (v0 loses), doc 4 new
    b2 = spark.createDataFrame(
        [(2, 2, "b2", 7), (3, 0, "c0", 9), (4, 1, "d1", 6)],
        "doc_id long, version long, body string, n_tok long")
    r2 = route_and_write(b2, spec, base, run_id="m2")
    assert r2["docs"]["rows"] == 4
    snap = {r["doc_id"]: (r["version"], r["body"])
            for r in read_merged(spark, base, "docs").collect()}
    assert snap == {1: (1, "a1"), 2: (2, "b2"), 3: (1, "c1"), 4: (1, "d1")}
    # resume: same run_id skips (no double merge)
    r2b = route_and_write(b2, spec, base, run_id="m2", resume=True)
    assert r2b["docs"]["skipped"] is True
    assert read_merged(spark, base, "docs").count() == 4
    # crash before commit: a bare snapshot dir with no checkpoint row
    # must NOT become current
    stale = spark.createDataFrame([(9, 9, "x", 1)],
                                  "doc_id long, version long, body string, n_tok long")
    stale.write.mode("overwrite").parquet(f"{base}/docs/snap=crashed")
    cur = merge_snapshot_path(spark, base, "docs")
    assert cur is not None and cur.endswith("snap=m2")
    # next increment merges on top of m2, not the crashed dir
    b3 = spark.createDataFrame([(1, 5, "a5", 2)],
                               "doc_id long, version long, body string, n_tok long")
    route_and_write(b3, spec, base, run_id="m3")
    snap3 = {r["doc_id"]: r["body"]
             for r in read_merged(spark, base, "docs").collect()}
    assert snap3 == {1: "a5", 2: "b2", 3: "c1", 4: "d1"}


def test_merge_mode_requires_key_and_version(spark, tmp_path):
    bad = [SinkSpec("d", None, mode="merge", merge_key="doc_id")]
    df = spark.createDataFrame([(1, 1)], "doc_id long, version long")
    with pytest.raises(ValueError, match="merge_key and merge_version"):
        route_and_write(df, bad, str(tmp_path / "x"), run_id="m")


def test_dynamic_path_text_gzip_sink(spark, tmp_path):
    # output.File / output.WebHdfs path semantics (File.py:113-142,
    # WebHdfs.py:142): the reference renders "%Y-%m-%d/$(event_type).log"
    # per event; the scalable equivalent is partition columns, so a
    # dynamic path template becomes partition_by on derived columns.
    # Golden: partitioned text+gzip write, then byte-compare one
    # partition's decompressed payload.
    import glob
    import gzip

    df = spark.createDataFrame(
        [("e1", "click", "2024-03-01 10:00:00", 3),
         ("e2", "error", "2024-03-01 11:00:00", 5),
         ("e3", "click", "2024-03-02 09:00:00", 2)],
        "doc_id string, event_type string, ts string, n_tok int",
    ).withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    base = str(tmp_path / "dyn")
    res = route_and_write(
        df,
        [SinkSpec("logs", format="text", compression="gzip",
                  partition_by=["day", "event_type"],
                  line_format="$(doc_id)|$(n_tok)")],
        base, run_id="d1",
    )
    assert res["logs"]["rows"] == 3
    part = f"{base}/logs/day=2024-03-01/event_type=click"
    files = glob.glob(f"{part}/*.txt.gz") or glob.glob(f"{part}/*.gz")
    assert files, f"no gzip part files under {part}"
    raw = b"".join(gzip.open(f, "rb").read() for f in sorted(files))
    assert raw == b"e1|3\n"
    # the other day partition holds exactly its own row
    part2 = glob.glob(f"{base}/logs/day=2024-03-02/event_type=click/*.gz")
    assert b"".join(gzip.open(f, "rb").read()
                    for f in sorted(part2)) == b"e3|2\n"
    # spark can read it back partition-pruned
    back = spark.read.text(f"{base}/logs/day=2024-03-01/event_type=error")
    assert [r["value"] for r in back.collect()] == ["e2|5"]


def test_merge_mode_rejects_noop_format(spark, tmp_path):
    spec = [SinkSpec("d", None, mode="merge", format="noop",
                     merge_key="doc_id", merge_version="v")]
    df = spark.createDataFrame([(1, 1)], "doc_id long, v long")
    with pytest.raises(ValueError, match="persistent snapshot"):
        route_and_write(df, spec, str(tmp_path / "x"), run_id="m",
                        token_col=None)
