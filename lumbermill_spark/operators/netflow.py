"""NetFlow v5 binary decode: 1 datagram → N flow rows.

Reference: parser.NetFlow
(/root/reference/lumbermill/parser/NetFlow.py:88-121): struct-unpacks
the 24-byte v5 header then 48-byte flow records, decodes TCP flags and
maps protocol numbers to names via an assets file.

Spark shape: binary column → mapInPandas (iterator form, Arrow batches)
→ exploded typed rows. Per-record work is a struct.unpack over an
in-memory batch — the canonical (b)-tier custom operator from the
build rules: no built-in expresses variable-record binary decode.
The layout constants below are from the public NetFlow v5 spec.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

HEADER_LEN = 24
RECORD_LEN = 48

IP_PROTOCOLS = {1: "icmp", 2: "igmp", 6: "tcp", 17: "udp", 41: "ipv6",
                47: "gre", 50: "esp", 51: "ah", 89: "ospf", 132: "sctp"}

TCP_FLAG_NAMES = ["FIN", "SYN", "RST", "PSH", "ACK", "URG"]

FLOW_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("flow_index", T.IntegerType()),
    T.StructField("srcaddr", T.StringType()),
    T.StructField("dstaddr", T.StringType()),
    T.StructField("srcport", T.IntegerType()),
    T.StructField("dstport", T.IntegerType()),
    T.StructField("packets", T.LongType()),
    T.StructField("octets", T.LongType()),
    T.StructField("protocol", T.StringType()),
    T.StructField("tcp_flags", T.ArrayType(T.StringType())),
])


def _ip(n: int) -> str:
    return f"{(n >> 24) & 255}.{(n >> 16) & 255}.{(n >> 8) & 255}.{n & 255}"


def _flags(b: int) -> list[str]:
    return [name for i, name in enumerate(TCP_FLAG_NAMES) if b & (1 << i)]


def decode_record(payload: bytes, idx: int) -> tuple | None:
    off = HEADER_LEN + idx * RECORD_LEN
    rec = payload[off:off + RECORD_LEN]
    if len(rec) < RECORD_LEN:
        return None
    (srcaddr, dstaddr, _nexthop, _inif, _outif, pkts, octets, _first,
     _last, srcport, dstport, _pad1, flags, proto, _tos, _sas, _das,
     _smask, _dmask, _pad2) = struct.unpack("!IIIHHIIIIHHBBBBHHBBH", rec)
    return (idx, _ip(srcaddr), _ip(dstaddr), srcport, dstport, pkts,
            octets, IP_PROTOCOLS.get(proto, str(proto)), _flags(flags))


def parse_netflow(df: DataFrame, source_field: str = "payload",
                  id_field: str = "doc_id") -> DataFrame:
    """(id, binary datagram) → one row per v5 flow record. Datagrams
    whose version≠5 or that are truncated yield no rows (the reference
    drops undecodable packets, NetFlow.py:93-99)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FLOW_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_field], pdf[source_field]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if len(payload) < HEADER_LEN:
                    continue
                version, count = struct.unpack("!HH", payload[:4])
                if version != 5:
                    continue
                for i in range(count):
                    rec = decode_record(payload, i)
                    if rec is not None:
                        rows.append((did, *rec))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, FLOW_SCHEMA)


def encode_v5(flows: list[tuple]) -> bytes:
    """Test/generator helper: flows = [(src_ip_int, dst_ip_int, srcport,
    dstport, pkts, octets, proto, tcp_flags)] → one v5 datagram."""
    out = struct.pack("!HHIIIIBBH", 5, len(flows), 0, 0, 0, 0, 0, 0, 0)
    for (src, dst, sp, dp, pk, oc, proto, fl) in flows:
        out += struct.pack("!IIIHHIIIIHHBBBBHHBBH",
                           src, dst, 0, 0, 0, pk, oc, 0, 0, sp, dp,
                           0, fl, proto, 0, 0, 0, 0, 0, 0)
    return out
