"""parser.Regex fixtures re-expressed as DataFrame assertions.

Source fixtures: /root/reference/tests/parser/TestRegex.py:10-73 and
FIXTURES.md F1.
"""

import pytest
from pyspark.sql import functions as F

from lumbermill_spark.functions.grok import expand_grok
from lumbermill_spark.operators.regex_parser import RegexParser

RAW = '192.168.2.20 - - [28/Jul/2006:10:27:10 -0300] "GET /cgi-bin/try/ HTTP/1.0" 200 3395'

MULTILINE = """Who shall declare this good, that ill
When good and ill so intertwine
But to fulfil the vast design of an omniscient will.
When seeming again but turns to loss
When earthly treasure proves but dross
And what seems lost but turns again
To high eternal gain."""

ACCESS_PATTERN = (
    r"(?P<remote_ip>\d+\.\d+\.\d+\.\d+)\s+(?P<identd>\w+|-)\s+(?P<user>\w+|-)\s+"
    r"\[(?P<datetime>\d+/\w+/\d+:\d+:\d+:\d+\s.\d+)\]\s+\"(?P<url>.*)\"\s+"
    r"(?P<http_status>\d+)\s+(?P<bytes_send>\d+)"
)

ENGINES = ["expr", "arrow"]


@pytest.fixture(params=ENGINES)
def engine(request):
    return request.param


def _one_row(spark, line):
    return spark.createDataFrame([(line,)], "data string")


def test_access_log_fields(spark, engine):
    # TestRegex.testDefaultValues (/root/reference/tests/parser/TestRegex.py:23-30)
    p = RegexParser([{"http_access_log": ACCESS_PATTERN}], source_field="data",
                    engine=engine)
    row = p.apply(_one_row(spark, RAW)).collect()[0]
    assert row["bytes_send"] == "3395"
    assert row["remote_ip"] == "192.168.2.20"
    assert row["http_status"] == "200"
    assert row["url"] == "GET /cgi-bin/try/ HTTP/1.0"
    assert row["event_type"] == "http_access_log"


def test_unmatched_marked_unknown(spark, engine):
    # Regex.py:182-183 default mark_unmatched_as
    p = RegexParser([{"http_access_log": ACCESS_PATTERN}], source_field="data",
                    engine=engine)
    row = p.apply(_one_row(spark, "?? corrupt ??")).collect()[0]
    assert row["event_type"] == "Unknown"
    assert row["bytes_send"] is None


def test_multiline_without_options(spark, engine):
    # TestRegex.testMultilineWithoutRegexOptions: '.*' without DOTALL only
    # captures the first line
    p = RegexParser([{"dame_irene": "(?P<poem>.*)"}], source_field="data",
                    engine=engine)
    row = p.apply(_one_row(spark, MULTILINE)).collect()[0]
    assert row["poem"] == MULTILINE.split("\n")[0]
    assert row["event_type"] == "dame_irene"


def test_multiline_with_options(spark, engine):
    p = RegexParser(
        [{"dame_irene": ["(?P<poem>.*)", "re.MULTILINE | re.DOTALL"]}],
        source_field="data", engine=engine)
    row = p.apply(_one_row(spark, MULTILINE)).collect()[0]
    assert row["poem"] == MULTILINE
    assert row["event_type"] == "dame_irene"


def test_findall(spark, engine):
    # TestRegex.testFindAllRegexOption: expect ['When','When','When']
    p = RegexParser(
        [{"dame_irene": ["(?P<date>When)", "re.MULTILINE | re.DOTALL", "findall"]}],
        source_field="data", engine=engine)
    row = p.apply(_one_row(spark, MULTILINE)).collect()[0]
    assert list(row["date"]) == ["When", "When", "When"]
    assert row["event_type"] == "dame_irene"


def test_grok_expansion():
    # TestRegex.testLogstashPattern analog
    pat = "(?P<virtual_host_name>%{HOST}) (?P<remote_ip>%{IP})"
    expanded = expand_grok(pat)
    assert expanded != pat
    assert "%{" not in expanded
    import re as _re
    m = _re.search(expanded, "web01.example.com 10.1.2.3")
    assert m and m.group("remote_ip") == "10.1.2.3"
    assert m.group("virtual_host_name") == "web01.example.com"


def test_grok_in_rule(spark, engine):
    p = RegexParser(
        [{"host_ip": "(?P<host>%{HOSTNAME}) (?P<ip>%{IPV4})"}],
        source_field="data", engine=engine)
    row = p.apply(_one_row(spark, "web01.example.com 10.1.2.3")).collect()[0]
    assert row["host"] == "web01.example.com"
    assert row["ip"] == "10.1.2.3"


def test_first_match_wins(spark, engine):
    rules = [
        {"numeric": r"^(?P<num>\d+)$"},
        {"anything": r"(?P<all>.+)"},
    ]
    p = RegexParser(rules, source_field="data", engine=engine,
                    hot_rules_first=False)
    df = spark.createDataFrame([("123",), ("abc",)], "data string")
    rows = {r["data"]: r for r in p.apply(df).collect()}
    assert rows["123"]["event_type"] == "numeric"
    assert rows["123"]["num"] == "123"
    assert rows["abc"]["event_type"] == "anything"
    assert rows["abc"]["all"] == "abc"


def test_no_break_last_rule_quirk(spark, engine):
    # Regex.py:160-183: with break_on_match=False, a non-matching final
    # rule resets the tag to Unknown even though fields were extracted.
    rules = [
        {"numeric": r"^(?P<num>\d+)$"},
        {"alpha": r"^(?P<alpha>[a-z]+)$"},
    ]
    p = RegexParser(rules, source_field="data", engine=engine,
                    break_on_match=False, hot_rules_first=False)
    df = spark.createDataFrame([("123",), ("abc",)], "data string")
    rows = {r for r in []}
    rows = {r["data"]: r for r in p.apply(df).collect()}
    assert rows["123"]["event_type"] == "Unknown"  # last rule missed
    assert rows["123"]["num"] == "123"             # but fields were set
    assert rows["abc"]["event_type"] == "alpha"


def test_null_source(spark, engine):
    p = RegexParser([{"t": r"(?P<x>\d+)"}], source_field="data", engine=engine)
    row = p.apply(_one_row(spark, None)).collect()[0]
    assert row["event_type"] == "Unknown"


def test_engines_agree_on_corpus(spark):
    from lumbermill_spark.data.synth import synth_tokens
    from lumbermill_spark.pipelines_builtin import ACCESS_RULES

    df = synth_tokens(spark, 300).cache()
    a = RegexParser(ACCESS_RULES, engine="expr").apply(
        df, tokens_col="tokens").select("doc_id", "event_type", "remote_ip",
                                        "http_status")
    b = RegexParser(ACCESS_RULES, engine="arrow").apply(
        df, tokens_col="tokens").select("doc_id", "event_type", "remote_ip",
                                        "http_status")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_null_source_preserves_prior_event_type(spark):
    """Reference parity (Regex.py:152-159): null/non-string source ->
    event passes through UNCHANGED, keeping a prior event_type."""
    from pyspark.sql import functions as F

    from lumbermill_spark.operators.regex_parser import RegexParser

    df = spark.createDataFrame(
        [("a", "x=1", "earlier_type"), ("b", None, "earlier_type")],
        "id string, data string, event_type string",
    )
    rules = [{"kv": r"x=(?P<xval>\d+)"}]
    for engine in ("expr", "arrow"):
        out = {r["id"]: r["event_type"]
               for r in RegexParser(rules, source_field="data",
                                    engine=engine).apply(df).collect()}
        assert out["a"] == "kv", engine
        assert out["b"] == "earlier_type", engine
    # without a prior event_type column, null source -> mark_unmatched_as
    df2 = spark.createDataFrame([("b", None)], "id string, data string")
    for engine in ("expr", "arrow"):
        out2 = RegexParser(rules, source_field="data",
                           engine=engine).apply(df2).first()
        assert out2["event_type"] == "Unknown", engine
