"""DomainName/UserAgent/Geo/DNS enrichers + NetFlow decode."""

import pytest
from pyspark.sql import functions as F

from lumbermill_spark.operators import enrichers, netflow


def test_split_domain(spark):
    df = spark.createDataFrame(
        [("www.example.com",), ("example.co.uk",), ("a.b.example.co.jp",),
         ("localhost",)],
        "host string",
    )
    out = {r["host"]: (r["subdomain"], r["domain"], r["tld"])
           for r in enrichers.split_domain(df, "host").collect()}
    assert out["www.example.com"] == ("www", "example", "com")
    assert out["example.co.uk"] == ("", "example", "co.uk")
    assert out["a.b.example.co.jp"] == ("a.b", "example", "co.jp")
    assert out["localhost"] == ("", "", "")


def test_parse_user_agent(spark):
    uas = [
        ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
         "(KHTML, like Gecko) Chrome/120.0 Safari/537.36",),
        ("curl/8.0.1",),
        ("Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",),
        ("Googlebot/2.1 (+http://www.google.com/bot.html)",),
    ]
    df = spark.createDataFrame(uas * 10, "ua string")  # dupes: dedupe path
    out = enrichers.parse_user_agent(df, "ua")
    assert out.count() == 40
    by_browser = {r["user_agent_info"]["browser"]
                  for r in out.dropDuplicates(["ua"]).collect()}
    assert {"Chrome", "curl", "Firefox", "bot"} <= by_browser
    bot = [r for r in out.dropDuplicates(["ua"]).collect()
           if r["user_agent_info"]["is_bot"]]
    assert len(bot) == 1


def test_geo_enrich_first_ip_wins(spark):
    ev = spark.createDataFrame(
        [(None, "10.0.1.5", 1), ("10.0.2.9", "10.0.1.5", 2), (None, None, 3)],
        "xff string, remote_ip string, n int",
    )
    geo = spark.createDataFrame(
        [("10.0.1", "DE", "Berlin"), ("10.0.2", "US", "NYC")],
        "ip_prefix string, country string, city string",
    )
    out = {r["n"]: r["geo_info"] for r in enrichers.geo_enrich(
        ev, geo, ["xff", "remote_ip"]).collect()}
    assert out[1]["country"] == "DE"
    assert out[2]["country"] == "US"      # xff takes precedence
    assert out[3]["country"] is None


def test_geo_enrich_cidr_longest_prefix(spark):
    ev = spark.createDataFrame(
        [("10.8.1.5", 1),      # matches /16 and /24 -> /24 wins
         ("10.8.2.7", 2),      # only the /16
         ("10.9.0.1", 3),      # only the /8
         ("172.16.0.1", 4),    # no match -> catch-all /0
         ("300.1.2.3", 5),     # malformed ip -> null attrs
         (None, 6)],
        "ip string, n int")
    geo = spark.createDataFrame(
        [("10.0.0.0/8", "net8"), ("10.8.0.0/16", "net16"),
         ("10.8.1.0/24", "net24"), ("0.0.0.0/0", "default"),
         ("10.8.1.9", "host32")],
        "cidr string, label string")
    out = {r["n"]: r["geo_info"]["label"]
           for r in enrichers.geo_enrich_cidr(ev, geo, ["ip"]).collect()}
    assert out == {1: "net24", 2: "net16", 3: "net8", 4: "default",
                   5: None, 6: None}
    # exact /32 beats every shorter prefix
    ev32 = spark.createDataFrame([("10.8.1.9", 9)], "ip string, n int")
    got = enrichers.geo_enrich_cidr(ev32, geo, ["ip"]).first()
    assert got["geo_info"]["label"] == "host32"


def test_dns_lookup_injected_resolver(spark):
    df = spark.createDataFrame([("a.example",), ("b.example",), ("a.example",)],
                               "host string")
    out = enrichers.dns_lookup(
        df, "host", resolver=lambda h: f"ip-of-{h}")
    got = [r["dns_name"] for r in out.collect()]
    assert sorted(got) == ["ip-of-a.example", "ip-of-a.example", "ip-of-b.example"]
    with pytest.raises(NotImplementedError):
        enrichers.dns_lookup(df, "host")


def test_netflow_roundtrip(spark):
    flows = [
        (0x0A000001, 0x0A000002, 1234, 80, 10, 5000, 6, 0b10010),  # tcp SYN+ACK
        (0x0A000003, 0x0A000004, 53, 5353, 2, 300, 17, 0),          # udp
    ]
    payload = netflow.encode_v5(flows)
    df = spark.createDataFrame(
        [("d1", bytearray(payload)), ("d2", bytearray(b"\x00\x09short"))],
        "doc_id string, payload binary",
    )
    out = netflow.parse_netflow(df)
    rows = sorted(out.collect(), key=lambda r: r["flow_index"])
    assert len(rows) == 2  # d2 is version!=5 -> dropped
    assert rows[0]["srcaddr"] == "10.0.0.1" and rows[0]["dstport"] == 80
    assert rows[0]["protocol"] == "tcp"
    assert set(rows[0]["tcp_flags"]) == {"SYN", "ACK"}
    assert rows[1]["protocol"] == "udp" and rows[1]["octets"] == 300


def test_collectd_roundtrip(spark):
    from lumbermill_spark.operators import collectd as cd

    p1 = cd.encode_packet(
        "web01", "cpu", [(cd.DS_GAUGE, 0.75), (cd.DS_COUNTER, 123456)],
        time=1700000000, interval=10, plugin_instance="0",
        type_="percent", type_instance="user")
    p2 = cd.encode_packet("db01", "memory", [(cd.DS_DERIVE, -42)])
    df = spark.createDataFrame(
        [("d1", bytearray(p1)), ("d2", bytearray(p2)),
         ("d3", bytearray(b"\x00\x06junk"))],
        "doc_id string, payload binary",
    )
    rows = {r["doc_id"]: r for r in cd.parse_collectd(df).collect()}
    assert set(rows) == {"d1", "d2"}  # d3 malformed -> dropped
    r1 = rows["d1"]
    assert (r1["host"], r1["plugin"], r1["plugin_instance"],
            r1["type"], r1["type_instance"]) == (
        "web01", "cpu", "0", "percent", "user")
    assert r1["time"] == 1700000000.0 and r1["interval"] == 10.0
    assert r1["dstypes"] == [cd.DS_GAUGE, cd.DS_COUNTER]
    assert r1["values"] == [0.75, 123456.0]
    assert rows["d2"]["values"] == [-42.0]
    assert rows["d2"]["time"] is None


def test_collectd_truncated_parts_skipped_not_fatal(spark):
    # struct.error paths (not ValueError): a TYPE_TIME part whose plen
    # claims an 8-byte body but is truncated, and a VALUES body shorter
    # than 2 bytes — both must drop the packet, never fail the job
    # (reference Collectd.py decodeEvent catches all and skips)
    from lumbermill_spark.operators import collectd as cd

    bad_time = cd._HDR.pack(cd.TYPE_TIME, 12) + b"\x00\x00"
    bad_vals = cd._HDR.pack(cd.TYPE_VALUES, 5) + b"\x01"
    ok = cd.encode_packet("h", "p", [(cd.DS_GAUGE, 1.0)])
    df = spark.createDataFrame(
        [("t", bytearray(bad_time)), ("v", bytearray(bad_vals)),
         ("ok", bytearray(ok))],
        "doc_id string, payload binary")
    rows = {r["doc_id"] for r in cd.parse_collectd(df).collect()}
    assert rows == {"ok"}


def test_collectd_multi_values_parts(spark):
    # two VALUES parts in ONE packet -> two rows (documented divergence
    # from the reference's last-wins event.update)
    from lumbermill_spark.operators import collectd as cd

    pkt = cd.encode_packet("h", "p", [(cd.DS_GAUGE, 1.0)])
    pkt += cd._U16.pack(0)[:0]  # no-op, keep bytes object
    extra_body = cd._U16.pack(1) + bytes([cd.DS_GAUGE]) + cd._LED.pack(2.5)
    pkt += cd._HDR.pack(cd.TYPE_VALUES, cd._HDR.size + len(extra_body)) \
        + extra_body
    df = spark.createDataFrame([("d1", bytearray(pkt))],
                               "doc_id string, payload binary")
    vals = sorted(r["values"][0]
                  for r in cd.parse_collectd(df).collect())
    assert vals == [1.0, 2.5]


def test_asof_join_backward_and_forward(spark):
    from lumbermill_spark.operators.lookup import asof_join

    facts = spark.createDataFrame(
        [("a", 5, 100), ("a", 1, 101), ("a", 3, 102),
         ("b", 2, 103), ("c", 9, 104)],
        "k string, t int, event_id int")
    dims = spark.createDataFrame(
        [("a", 1, "v1"), ("a", 3, "v2"), ("a", 4, "v3"), ("b", 5, "v9")],
        "k string, valid_from int, cfg string")

    back = {r.event_id: r.cfg
            for r in asof_join(facts, dims, on="k", ts="t").collect()}
    # ties are inclusive (t=1 matches valid_from=1, t=3 matches 3)
    assert back == {101: "v1", 102: "v2", 100: "v3", 103: None, 104: None}

    fwd = {r.event_id: r.cfg
           for r in asof_join(facts, dims, on="k", ts="t",
                              direction="forward").collect()}
    assert fwd == {101: "v1", 102: "v2", 100: None, 103: "v9", 104: None}

    with pytest.raises(ValueError):
        asof_join(facts, dims, on="k", ts="t", direction="nearest")


def test_asof_join_null_dim_field_not_inherited(spark):
    """A newer version with a NULL field must NOT inherit that field
    from the older version — the payload moves as one struct."""
    from lumbermill_spark.operators.lookup import asof_join

    facts = spark.createDataFrame([("a", 10, 1)], "k string, t int, id int")
    dims = spark.createDataFrame(
        [("a", 1, "r1", "east"), ("a", 5, None, "west")],
        "k string, valid_from int, release string, region string")
    row = asof_join(facts, dims, on="k", ts="t").collect()[0]
    assert row.region == "west" and row.release is None


def test_blocklist_filter(spark):
    from lumbermill_spark.operators.enrichers import blocklist_filter

    df = spark.createDataFrame(
        [(1, "ads.tracker.co.uk"),     # subdomain of blocked multi-suffix
         (2, "tracker.co.uk"),         # exact blocked registrable
         (3, "news.tracker.org"),      # different TLD -> kept
         (4, "m1.shop.com"),           # kept
         (5, "SPAM.example.COM"),      # blocked case-insensitively
         (6, "localhost")],            # no dot: matches bare entry only
        "id long, host string")
    bl = spark.createDataFrame(
        [("tracker.co.uk",), ("Example.com",)], "domain string")
    kept = sorted(r["id"] for r in blocklist_filter(df, bl, "host").collect())
    assert kept == [3, 4, 6]
    blocked = sorted(r["id"] for r in
                     blocklist_filter(df, bl, "host", invert=True).collect())
    assert blocked == [1, 2, 5]
    # columns pass through unchanged
    assert blocklist_filter(df, bl, "host").columns == ["id", "host"]
    # bare-host entry blocks the dotless host
    bl2 = spark.createDataFrame([("localhost",)], "domain string")
    assert sorted(r["id"] for r in
                  blocklist_filter(df, bl2, "host").collect()) == [1, 2, 3, 4, 5]
