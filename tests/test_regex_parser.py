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


# ------------------------------------------------------------------ #
# full grok vocabulary (reference assets/grok_patterns: grok-patterns +
# firewalls + haproxy; fixture line from tests/parser/TestRegex.py:11)

GROK_FIXTURES = {
    "COMMONAPACHELOG":
        '192.168.2.20 - - [28/Jul/2006:10:27:10 -0300] '
        '"GET /cgi-bin/try/ HTTP/1.0" 200 3395',
    "COMBINEDAPACHELOG":
        '192.168.2.20 - frank [28/Jul/2006:10:27:10 -0300] '
        '"GET /cgi-bin/try/ HTTP/1.0" 200 3395 '
        '"http://ref.example/x" "Mozilla/5.0 (X11; Linux)"',
    "SYSLOGLINE":
        "Feb 21 13:00:01 myhost sshd[1234]: Accepted password for root",
    "HAPROXYHTTP":
        'Feb  6 12:14:14 localhost haproxy[14389]: 10.0.1.2:33317 '
        '[06/Feb/2009:12:14:14.655] http-in static/srv1 10/0/30/69/109 '
        '200 2750 - - ---- 1/1/1/1/0 0/0 {1wt.eu} {} '
        '"GET /index.html HTTP/1.1"',
    "HAPROXYTCP":
        'Feb  6 12:12:56 localhost haproxy[14387]: 10.0.1.2:33313 '
        '[06/Feb/2009:12:12:51.443] fnt bck/srv1 0/0/5007 212 -- '
        '0/0/0/0/3 0/0',
    "CISCOFW106001":
        'Inbound TCP connection denied from 10.1.1.1/53770 to '
        '192.168.1.1/80 flags SYN on interface outside',
    "CISCOFW106023":
        'Deny tcp src dmz:10.1.2.30/63016 dst outside:192.0.0.8/53 '
        'by access-group "acl_dmz" [0xe3aab522, 0x0]',
    "CISCOFW106100":
        'access-list inside-out permitted tcp inside/10.1.1.1(1234) -> '
        'outside/8.8.8.8(53) hit-cnt 1 first hit [0x62c4905, 0x0]',
    "CISCOFW302013_302014_302015_302016":
        'Built inbound TCP connection 11757 for '
        'outside:100.66.98.44/56256 (100.66.98.44/56256) to '
        'inside:172.31.98.44/443 (172.31.98.44/443)',
    "CISCO_TAGGED_SYSLOG":
        '<164>Jun 21 2016 14:02:19 FW01 : %ASA-4-106023: Deny tcp ...',
    "NETSCREENSESSIONLOG":
        'Jun  2 14:53:31 fire00 aka1: NetScreen device_id=aka1 '
        '[Root]system-notification-00257(traffic): '
        'start_time="2006-06-02 14:53:30" duration=0 policy_id=120 '
        'service=udp/port:17210 proto=17 src zone=Trust dst zone=DMZ '
        'action=Deny sent=0 rcvd=0 src=192.168.2.2 dst=1.2.3.4 '
        'src_port=53 dst_port=17210',
    "HTTPD20_ERRORLOG":
        '[Mon Dec 26 16:15:55 2005] [error] [client 1.2.3.4] '
        'File does not exist: /var/www/html/favicon.ico',
    "HTTPD24_ERRORLOG":
        '[Thu Jun 09 06:07:05 2016] [core:notice] [pid 12812:tid 8735] '
        '[client 10.1.2.3:512] AH00094: Command line: /usr/sbin/apachectl',
}


def test_grok_vocabulary_expands_and_compiles():
    import re as _re

    from lumbermill_spark.functions.grok import (BUILTIN_PATTERNS,
                                                 expand_grok)

    assert len(BUILTIN_PATTERNS) >= 100  # full logstash-scale vocabulary
    for name in BUILTIN_PATTERNS:
        for style in ("python", "plain"):
            expanded = expand_grok("%%{%s:x}" % name,
                                   named_group_style=style)
            assert "%{" not in expanded, f"{name}: unresolved macro"
            _re.compile(expanded)


def test_grok_fixture_lines_match():
    import re as _re

    from lumbermill_spark.functions.grok import expand_grok

    for name, line in GROK_FIXTURES.items():
        pat = expand_grok("%%{%s}" % name)
        assert _re.search(pat, line), f"{name} failed on fixture"


def test_grok_combined_apachelog_fields():
    import re as _re

    from lumbermill_spark.functions.grok import expand_grok

    m = _re.search(expand_grok("%{COMBINEDAPACHELOG}"),
                   GROK_FIXTURES["COMBINEDAPACHELOG"])
    d = m.groupdict()
    assert d["clientip"] == "192.168.2.20"
    assert d["auth"] == "frank"
    assert d["verb"] == "GET"
    assert d["request"] == "/cgi-bin/try/"
    assert d["response"] == "200" and d["bytes"] == "3395"
    assert d["referrer"] == "http://ref.example/x"
    assert d["agent"] == "Mozilla/5.0 (X11; Linux)"


def test_grok_composites_java_safe(spark):
    # the expr engine runs these through Java's regex (rlike /
    # regexp_extract) — the expansion must be Java-compatible too
    from pyspark.sql import functions as F

    from lumbermill_spark.operators.regex_parser import RegexParser

    for name in ("COMBINEDAPACHELOG", "SYSLOGLINE", "HAPROXYHTTP",
                 "CISCOFW106023", "HTTPD24_ERRORLOG"):
        df = spark.createDataFrame([(GROK_FIXTURES[name],)], "line string")
        parser = RegexParser([{name.lower(): "%%{%s}" % name}],
                             engine="expr", source_field="line")
        row = parser.apply(df).first()
        assert row["event_type"] == name.lower(), name


def test_source_and_tokens_col_mutually_exclusive(spark):
    # both at once used to silently fall back to a per-row bytes()
    # decode inside the parse UDF (the one non-vectorized decode path);
    # it is now an explicit error for both engines
    from pyspark.sql import functions as F

    from lumbermill_spark.operators.regex_parser import RegexParser

    df = spark.createDataFrame([("x", [120])],
                               "line string, tokens array<int>")
    for engine in ("expr", "arrow"):
        parser = RegexParser([{"t": r"(?P<v>x)"}], engine=engine)
        with pytest.raises(ValueError, match="not both"):
            parser.apply(df, source=F.col("line"), tokens_col="tokens")
