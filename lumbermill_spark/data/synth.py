"""Deterministic synthetic token-sequence table.

Spark-native analog of the reference's load generator ``input.Spam``
(/root/reference/lumbermill/input/Spam.py:41-79), which splits a target
event count across workers and emits template events at max rate. Here the
"workers" are Spark partitions (``spark.range(n)`` is already evenly
partitioned) and every row value is a pure function of the row id and the
seed — no ``random``, no wall clock — so any two runs (and any two cluster
sizes) produce byte-identical tables.

Schema (BASELINE.json input_hint):
    doc_id  string      "doc-%012d"
    tokens  array<int>  byte codes of a UTF-8 log line (FIXTURES.md F1/F2/F4)
    n_tok   int         size(tokens)
    source  string      skewed categorical: apache 60 / nginx 25 / syslog 10 / unknown 5

The skew on ``source`` is intentional: it is the repartition/aggregation
key the north_rule wants salted at scale.

Everything is JVM expressions (hash/pmod/format_string/transform), so
generation itself scales with the cluster: 10^12 rows is just
spark.range(10**12) over enough partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lumbermill_spark.functions.tokens import encode_line

# Deterministic per-row pseudo-random stream: independent draws come from
# xxhash64(id, salt_k). abs() because xxhash64 is signed.


def _draw(salt: int) -> F.Column:
    return F.abs(F.xxhash64(F.col("id"), F.lit(salt)))


def _pick(salt: int, options: list[str]) -> F.Column:
    arr = F.array(*[F.lit(o) for o in options])
    # element_at is 1-based
    return F.element_at(arr, (_draw(salt) % len(options) + 1).cast("int"))


def _fmt(fmt: str, *cols) -> F.Column:
    return F.format_string(fmt, *cols)


_METHODS = ["GET", "GET", "GET", "POST", "PUT", "HEAD"]
_PATHS = [
    "/cgi-bin/try/",
    "/index.html",
    "/api/v1/items",
    "/static/app.js",
    "/login",
    "/images/logo.png",
    "/search?q=spark",
    "/health",
]
_STATUSES = ["200", "200", "200", "200", "301", "304", "400", "404", "500"]
_USERS = ["-", "-", "frank", "alice", "bob"]
_REFERERS = ["-", "http://example.com/start", "http://www.google.com/"]
_AGENTS = [
    "Mozilla/5.0 (X11; Linux x86_64)",
    "curl/8.0.1",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64)",
]
_PROTOS = ["TCP", "UDP", "ICMP"]
_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def _ip(salt: int) -> F.Column:
    return _fmt(
        "%d.%d.%d.%d",
        (_draw(salt) % 223 + 1).cast("int"),
        (_draw(salt + 1) % 256).cast("int"),
        (_draw(salt + 2) % 256).cast("int"),
        (_draw(salt + 3) % 254 + 1).cast("int"),
    )


def _clock(salt: int) -> tuple[F.Column, F.Column, F.Column]:
    hh = (_draw(salt) % 24).cast("int")
    mm = (_draw(salt + 1) % 60).cast("int")
    ss = (_draw(salt + 2) % 60).cast("int")
    return hh, mm, ss


def _apache_line() -> F.Column:
    """F1: 192.168.2.20 - - [28/Jul/2006:10:27:10 -0300] "GET /x HTTP/1.0" 200 3395"""
    hh, mm, ss = _clock(10)
    day = (_draw(13) % 28 + 1).cast("int")
    mon = _pick(14, _MONTHS)
    return _fmt(
        '%s - %s [%02d/%s/2006:%02d:%02d:%02d -0300] "%s %s HTTP/1.0" %s %d',
        _ip(20),
        _pick(24, _USERS),
        day,
        mon,
        hh,
        mm,
        ss,
        _pick(25, _METHODS),
        _pick(26, _PATHS),
        _pick(27, _STATUSES),
        (_draw(28) % 100000).cast("int"),
    )


def _nginx_line() -> F.Column:
    """Combined-log-format variant (same family, extra referer/agent)."""
    hh, mm, ss = _clock(30)
    day = (_draw(33) % 28 + 1).cast("int")
    mon = _pick(34, _MONTHS)
    return _fmt(
        '%s - %s [%02d/%s/2016:%02d:%02d:%02d +0000] "%s %s HTTP/1.1" %s %d "%s" "%s"',
        _ip(40),
        _pick(44, _USERS),
        day,
        mon,
        hh,
        mm,
        ss,
        _pick(45, _METHODS),
        _pick(46, _PATHS),
        _pick(47, _STATUSES),
        (_draw(48) % 100000).cast("int"),
        _pick(49, _REFERERS),
        _pick(50, _AGENTS),
    )


def _syslog_line() -> F.Column:
    """F2: <prival>... kernel: iptables denied: IN=.. SRC=.. DST=.. PROTO=.. SPT=.. DPT=.."""
    hh, mm, ss = _clock(60)
    day = (_draw(63) % 28 + 1).cast("int")
    prival = (_draw(64) % 192).cast("int")
    return _fmt(
        "<%d>%s %2d %02d:%02d:%02d fw01 kernel: iptables denied: "
        "IN=eth0 OUT= SRC=%s DST=%s PROTO=%s SPT=%d DPT=%d",
        prival,
        _pick(65, _MONTHS),
        day,
        hh,
        mm,
        ss,
        _ip(70),
        _ip(75),
        _pick(79, _PROTOS),
        (_draw(80) % 65535 + 1).cast("int"),
        (_draw(81) % 65535 + 1).cast("int"),
    )


def _unknown_line() -> F.Column:
    """Deliberately unparseable payload -> event_type 'Unknown' routing."""
    return _fmt(
        "?? corrupt frame %x %x ??",
        (_draw(90) % 2**31).cast("int"),
        (_draw(91) % 2**31).cast("int"),
    )


def synth_tokens(spark: SparkSession, n_rows: int, seed: int = 42,
                 num_partitions: int | None = None) -> DataFrame:
    """Build the deterministic token table.

    source mix (FIXTURES.md F0): apache 60%, nginx 25%, syslog 10%,
    unknown 5%. Line template follows the source, so routing by parse
    result correlates with (but is not identical to) ``source``:
    that mirrors the reference, where event_type comes from the matching
    regex rule, not from the input module (parser/Regex.py:177).
    """
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    df = spark.range(0, n_rows, 1, num_partitions)
    # fold the seed into the id stream so different seeds give different tables
    df = df.withColumn("id", F.xxhash64(F.col("id"), F.lit(seed)) % F.lit(2**40))
    bucket = _draw(1) % 100
    source = (
        F.when(bucket < 60, F.lit("apache"))
        .when(bucket < 85, F.lit("nginx"))
        .when(bucket < 95, F.lit("syslog"))
        .otherwise(F.lit("unknown"))
    )
    line = (
        F.when(bucket < 60, _apache_line())
        .when(bucket < 85, _nginx_line())
        .when(bucket < 95, _syslog_line())
        .otherwise(_unknown_line())
    )
    out = df.select(
        F.format_string("doc-%012d", F.abs(F.col("id")).cast("long")).alias("doc_id"),
        encode_line(line).alias("tokens"),
        source.alias("source"),
    ).withColumn("n_tok", F.size("tokens"))
    return out.select("doc_id", "tokens", "n_tok", "source")


def write_synth(spark: SparkSession, n_rows: int, path: str, seed: int = 42) -> None:
    """Materialize the token table as parquet (the stand-in for the
    Iceberg source table; writer is format-agnostic)."""
    synth_tokens(spark, n_rows, seed).write.mode("overwrite").parquet(path)
