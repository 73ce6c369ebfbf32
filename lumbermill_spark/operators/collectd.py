"""Collectd binary network protocol decode: 1 packet → N value rows.

Reference: parser.Collectd
(/root/reference/lumbermill/parser/Collectd.py:52-78) decodes the
collectd network plugin's binary packets and merges the decoded
attributes into the event. The wire format is the public collectd
binary protocol (https://collectd.org/wiki/index.php/Binary_protocol):
a packet is a sequence of TLV parts — string parts (host, plugin,
plugin_instance, type, type_instance) and number parts (time, interval,
high-resolution variants) set decoder state; each VALUES part emits one
metric record carrying the current state plus a list of typed values
(GAUGE little-endian double; COUNTER/ABSOLUTE unsigned, DERIVE signed
big-endian int64).

Spark shape: binary column → mapInPandas (Arrow batches) → one typed
row per VALUES part. Divergence from the reference, documented: the
reference collapses multiple VALUES parts of one packet into a single
event dict (last part wins); here each VALUES part becomes its own row
— the handleEvent-0..N flatMap semantics, with no data loss.
Undecodable packets yield no rows (reference warns and skips).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

TYPE_HOST = 0x0000
TYPE_TIME = 0x0001
TYPE_PLUGIN = 0x0002
TYPE_PLUGIN_INSTANCE = 0x0003
TYPE_TYPE = 0x0004
TYPE_TYPE_INSTANCE = 0x0005
TYPE_VALUES = 0x0006
TYPE_INTERVAL = 0x0007
TYPE_TIMEHR = 0x0008
TYPE_INTERVALHR = 0x0009

DS_COUNTER, DS_GAUGE, DS_DERIVE, DS_ABSOLUTE = 0, 1, 2, 3

_HDR = struct.Struct("!2H")
_U64 = struct.Struct("!Q")
_I64 = struct.Struct("!q")
_U16 = struct.Struct("!H")
_LED = struct.Struct("<d")  # GAUGE: x86 little-endian double on the wire

_STRING_PARTS = {TYPE_HOST: "host", TYPE_PLUGIN: "plugin",
                 TYPE_PLUGIN_INSTANCE: "plugin_instance",
                 TYPE_TYPE: "type", TYPE_TYPE_INSTANCE: "type_instance"}

COLLECTD_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("plugin", T.StringType()),
    T.StructField("plugin_instance", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("type_instance", T.StringType()),
    T.StructField("time", T.DoubleType()),
    T.StructField("interval", T.DoubleType()),
    T.StructField("dstypes", T.ArrayType(T.IntegerType())),
    T.StructField("values", T.ArrayType(T.DoubleType())),
])


def _cdtime(v: int) -> float:
    """High-resolution cdtime → epoch seconds (2^30 units/second)."""
    return (v >> 30) + (v & ((1 << 30) - 1)) / (1 << 30)


def decode_packet(buf: bytes) -> list[dict]:
    """All VALUES records of one packet, with accumulated part state."""
    state: dict = {"host": None, "plugin": None, "plugin_instance": None,
                   "type": None, "type_instance": None, "time": None,
                   "interval": None}
    out: list[dict] = []
    off, blen = 0, len(buf)
    while off + _HDR.size <= blen:
        ptype, plen = _HDR.unpack_from(buf, off)
        if plen < _HDR.size or off + plen > blen:
            raise ValueError("malformed part")
        body = buf[off + _HDR.size:off + plen]
        if ptype in _STRING_PARTS:
            state[_STRING_PARTS[ptype]] = body[:-1].decode("utf-8", "replace")
        elif ptype == TYPE_TIME:
            state["time"] = float(_U64.unpack(body)[0])
        elif ptype == TYPE_TIMEHR:
            state["time"] = _cdtime(_U64.unpack(body)[0])
        elif ptype == TYPE_INTERVAL:
            state["interval"] = float(_U64.unpack(body)[0])
        elif ptype == TYPE_INTERVALHR:
            state["interval"] = _cdtime(_U64.unpack(body)[0])
        elif ptype == TYPE_VALUES:
            n = _U16.unpack_from(body, 0)[0]
            if len(body) != 2 + 9 * n:
                raise ValueError("values part size mismatch")
            dstypes = list(body[2:2 + n])
            vals = []
            voff = 2 + n
            for ds in dstypes:
                raw = body[voff:voff + 8]
                if ds == DS_GAUGE:
                    vals.append(_LED.unpack(raw)[0])
                elif ds == DS_DERIVE:
                    vals.append(float(_I64.unpack(raw)[0]))
                elif ds in (DS_COUNTER, DS_ABSOLUTE):
                    vals.append(float(_U64.unpack(raw)[0]))
                else:
                    raise ValueError(f"unsupported DS type {ds}")
                voff += 8
            out.append({**state, "dstypes": dstypes, "values": vals})
        # unknown part types are skipped (forward compat), not fatal
        off += plen
    return out


def parse_collectd(df: DataFrame, source_field: str = "payload",
                   id_field: str = "doc_id") -> DataFrame:
    """(id, binary packet) → one row per VALUES part."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in COLLECTD_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_field], pdf[source_field]):
                if payload is None:
                    continue
                try:
                    recs = decode_packet(bytes(payload))
                except (ValueError, struct.error):
                    # reference warns + skips undecodable data
                    # (Collectd.py decodeEvent catches everything);
                    # struct.error covers truncated number/VALUES
                    # bodies where unpack_from runs out of bytes
                    continue
                for r in recs:
                    rows.append((did, r["host"], r["plugin"],
                                 r["plugin_instance"], r["type"],
                                 r["type_instance"], r["time"],
                                 r["interval"], r["dstypes"], r["values"]))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, COLLECTD_SCHEMA)


# ------------------------------------------------------------------ #
# encode (the reference's encodeEvent is a TODO stub; this writer is
# needed for tests/generators and completes the roundtrip)

def _str_part(ptype: int, s: str) -> bytes:
    body = s.encode("utf-8") + b"\0"
    return _HDR.pack(ptype, _HDR.size + len(body)) + body


def _num_part(ptype: int, v: int) -> bytes:
    return _HDR.pack(ptype, _HDR.size + 8) + _U64.pack(v)


def encode_packet(host: str, plugin: str, values: list[tuple[int, float]],
                  time: int | None = None, interval: int | None = None,
                  plugin_instance: str = "", type_: str = "gauge",
                  type_instance: str = "") -> bytes:
    """One packet with a single VALUES part (test/generator helper)."""
    out = _str_part(TYPE_HOST, host)
    if time is not None:
        out += _num_part(TYPE_TIME, time)
    out += _str_part(TYPE_PLUGIN, plugin)
    if plugin_instance:
        out += _str_part(TYPE_PLUGIN_INSTANCE, plugin_instance)
    out += _str_part(TYPE_TYPE, type_)
    if type_instance:
        out += _str_part(TYPE_TYPE_INSTANCE, type_instance)
    if interval is not None:
        out += _num_part(TYPE_INTERVAL, interval)
    body = _U16.pack(len(values)) + bytes(ds for ds, _v in values)
    for ds, v in values:
        if ds == DS_GAUGE:
            body += _LED.pack(float(v))
        elif ds == DS_DERIVE:
            body += _I64.pack(int(v))
        else:
            body += _U64.pack(int(v))
    out += _HDR.pack(TYPE_VALUES, _HDR.size + len(body)) + body
    return out
