"""Property-based tests (hypothesis) for semantics that must match a
pure-Python reference exactly — the SURVEY §5 strategy taken further
than fixture examples: each property runs a batch of generated rows
through the real Spark operator and compares against the reference
computation row-by-row.

Examples are deliberately few (max_examples) since each example is one
Spark job; the batch-per-example shape keeps coverage high anyway.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(max_examples=8, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])

# ASCII printable minus nothing special — byte-token payload domain
ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=120)


@given(st.lists(ascii_text, min_size=1, max_size=25))
@SET
def test_token_encode_decode_roundtrip(spark, lines):
    """encode_line ∘ decode_tokens == identity for ASCII payloads (the
    BASELINE per-row token-array invariant)."""
    from lumbermill_spark.functions.tokens import decode_tokens, encode_line

    df = spark.createDataFrame([(i, s) for i, s in enumerate(lines)],
                               "i long, s string")
    out = df.select("i", "s",
                    decode_tokens(encode_line(F.col("s"))).alias("back"))
    for r in out.collect():
        assert r["back"] == r["s"]


@given(st.lists(ascii_text, min_size=1, max_size=25))
@SET
def test_arrow_decode_matches_jvm_decode(spark, lines):
    """The zero-copy Arrow buffer-reinterpret decode must agree with
    the JVM per-character expression byte-for-byte."""
    from lumbermill_spark.functions.tokens import (
        decode_tokens, decode_tokens_arrow, encode_line)

    df = spark.createDataFrame([(i, s) for i, s in enumerate(lines)],
                               "i long, s string")
    tok = df.select("i", "s", encode_line(F.col("s")).alias("tokens"))
    arrow = {r["i"]: r["_lms_line"]
             for r in decode_tokens_arrow(tok, "tokens",
                                          out_col="_lms_line").collect()}
    jvm = {r["i"]: r["d"]
           for r in tok.select("i", decode_tokens("tokens").alias("d"))
           .collect()}
    assert arrow == jvm


num_like = st.one_of(
    st.integers(-10**12, 10**12).map(str),
    st.floats(allow_nan=False, allow_infinity=False,
              width=32).map(lambda f: repr(round(f, 4))),
    ascii_text,
)


@given(st.lists(num_like, min_size=1, max_size=30))
@SET
def test_cast_to_int_matches_reference(spark, values):
    """cast semantics: int(float(v)) on success else 0 — the reference
    Field.py cast error path (truncation toward zero, never rounding)."""
    from lumbermill_spark.operators.field_actions import cast_to_int

    def ref(v):
        try:
            return int(float(v))
        except (TypeError, ValueError, OverflowError):
            return 0

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               "i long, v string")
    out = {r["i"]: r["v"] for r in cast_to_int(df, ["v"]).collect()}
    for i, v in enumerate(values):
        expected = ref(v)
        if abs(expected) > 2**62:
            continue  # long-range edge: reference Python int is unbounded
        assert out[i] == expected, (v, out[i], expected)


kv_word = st.text(alphabet="abcdefghijklmnop0123456789", min_size=1,
                  max_size=8)


@given(st.lists(st.tuples(kv_word, kv_word), min_size=1, max_size=8,
                unique_by=lambda t: t[0]))
@SET
def test_key_value_matches_python_dict(spark, pairs):
    """key_value with line_separator parses like dict(split(sep)...)."""
    from lumbermill_spark.operators.field_actions import key_value

    s = ";".join(f"{k}={v}" for k, v in pairs)
    df = spark.createDataFrame([(s,)], "s string")
    out = key_value(df, "s", kv_separator="=", line_separator=";",
                    target_field="m").first()["m"]
    assert dict(out) == dict(pairs)


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=1, max_size=40),
       st.lists(st.floats(min_value=-100, max_value=100,
                          allow_nan=False),
                min_size=3, max_size=6, unique=True))
@SET
def test_histogram_matches_numpy_digitize(spark, values, edges):
    """metrics() histogram == numpy.digitize(right=False) for ANY edge
    list, uniform or not."""
    import numpy as np

    from lumbermill_spark.operators import stats

    edges = sorted(edges)
    df = spark.createDataFrame([("m", float(v)) for v in values],
                               "name string, v double")
    r = stats.metrics(df, "$(name)", value_field="v",
                      buckets=list(edges)).collect()[0]
    got = dict(r["histogram"])
    expect = {}
    for b in np.digitize(values, edges, right=False):
        expect[int(b)] = expect.get(int(b), 0) + 1
    assert got == expect, (edges, got, expect)


@given(st.lists(ascii_text.filter(lambda s: s.strip()), min_size=2,
                max_size=12))
@SET
def test_fingerprint_whitespace_invariance(spark, texts):
    """fingerprint is invariant under whitespace-runs + case, and
    injective across distinct normalized texts (md5)."""
    from lumbermill_spark.training.textstats import fingerprint

    rows = []
    for i, t in enumerate(texts):
        rows.append((2 * i, t))
        rows.append((2 * i + 1, "  " + t.upper().replace(" ", "   ")))
    df = spark.createDataFrame(rows, "id long, text string")
    fp = {r["id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    import re
    for i, t in enumerate(texts):
        assert fp[2 * i] == fp[2 * i + 1], t
        norm = re.sub(r"\s+", " ", t.strip()).lower()
        for j, u in enumerate(texts[:i]):
            normu = re.sub(r"\s+", " ", u.strip()).lower()
            assert (fp[2 * i] == fp[2 * j]) == (norm == normu)


# URL-ish generator: scheme/host case noise, optional port/query/fragment
_url_like = st.builds(
    lambda sch, host, port, path, q, frag:
        f"{sch}://{host}{port}{path}{q}{frag}",
    st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    st.from_regex(r"(www\.)?[A-Za-z][A-Za-z0-9]{0,8}\.(com|ORG|io)",
                  fullmatch=True),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.from_regex(r"(/[A-Za-z0-9]{0,6}){0,3}/?", fullmatch=True),
    st.sampled_from(["", "?b=2&a=1", "?utm_source=x&z=9", "?gclid=1"]),
    st.sampled_from(["", "#frag"]),
)


@given(st.lists(_url_like, min_size=1, max_size=20))
@SET
def test_canonicalize_url_idempotent(spark, urls):
    """canonicalize ∘ canonicalize == canonicalize: the output is a
    fixpoint (already lowercase, no default port, no tracking params,
    sorted query, normalized slashes)."""
    from lumbermill_spark.operators.parsers import canonicalize_url

    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, url string")
    once = canonicalize_url(df, "url", target_field="c1")
    twice = canonicalize_url(once, "c1", target_field="c2")
    for r in twice.collect():
        assert r["c2"] == r["c1"], (r["url"], r["c1"], r["c2"])


@given(st.lists(st.text(min_size=0, max_size=80), min_size=1,
                max_size=20))
@SET
def test_normalize_text_idempotent(spark, texts):
    """normalize_text is a fixpoint on arbitrary unicode (NFC is
    idempotent; stripped char classes stay stripped; collapsed
    whitespace stays collapsed)."""
    from lumbermill_spark.training.textstats import normalize_text

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    once = normalize_text(df, target_col="c1")
    twice = normalize_text(once, text_col="c1", target_col="c2")
    for r in twice.collect():
        assert r["c2"] == r["c1"], (r["text"], r["c1"], r["c2"])


_field = st.text(alphabet=st.characters(min_codepoint=33,
                                        max_codepoint=126,
                                        exclude_characters='";[]'),
                 min_size=1, max_size=12)


@given(st.lists(st.tuples(_field, _field, _field), min_size=1,
                max_size=15))
@SET
def test_dissect_inverts_format(spark, rows):
    """dissect is the left inverse of formatting: for separator-free
    field values, formatting then dissecting recovers every field."""
    from lumbermill_spark.operators.parsers import dissect

    df = spark.createDataFrame(
        [(i, f'{a} - {b} ["{c}"]') for i, (a, b, c) in enumerate(rows)],
        "i long, data string")
    out = {r["i"]: r for r in
           dissect(df, '%{x} - %{y} ["%{z}"]').collect()}
    for i, (a, b, c) in enumerate(rows):
        r = out[i]
        assert (r["x"], r["y"], r["z"]) == (a, b, c), (a, b, c, r)


# --- as-of join vs brute force -------------------------------------

_asof_fact = st.tuples(st.sampled_from(["a", "b", "c"]),
                       st.integers(min_value=0, max_value=50))
_asof_dim = st.tuples(st.sampled_from(["a", "b", "c"]),
                      st.integers(min_value=0, max_value=50))


@given(st.lists(_asof_fact, min_size=1, max_size=20),
       st.lists(_asof_dim, min_size=0, max_size=10, unique=True))
@SET
def test_asof_join_matches_bruteforce(spark, facts, dims):
    """asof_join == per-row argmax(valid_from <= t) brute force, both
    directions, for any key/time layout (incl. empty dims)."""
    from lumbermill_spark.operators.lookup import asof_join

    fdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(facts)],
        "k string, t int, fid int")
    ddf = spark.createDataFrame(
        [(k, t, f"v{k}{t}") for (k, t) in dims],
        "k string, valid_from int, cfg string")
    if not dims:
        ddf = spark.createDataFrame([], "k string, valid_from int, cfg string")

    got_b = {r.fid: r.cfg for r in asof_join(fdf, ddf, on="k", ts="t").collect()}
    got_f = {r.fid: r.cfg
             for r in asof_join(fdf, ddf, on="k", ts="t",
                                direction="forward").collect()}
    for i, (k, t) in enumerate(facts):
        back = [vf for (dk, vf) in dims if dk == k and vf <= t]
        fwd = [vf for (dk, vf) in dims if dk == k and vf >= t]
        assert got_b[i] == (f"v{k}{max(back)}" if back else None), (i, k, t)
        assert got_f[i] == (f"v{k}{min(fwd)}" if fwd else None), (i, k, t)


@given(st.lists(st.integers(min_value=0, max_value=200),
                min_size=1, max_size=30),
       st.integers(min_value=1, max_value=40))
@SET
def test_sessionize_gap_matches_bruteforce(spark, times, gap):
    """Session ids are the running count of >gap silences over the
    sorted timeline, for any times (incl. duplicates) and any gap."""
    from lumbermill_spark.operators.stateful import sessionize_gap

    df = spark.createDataFrame([("k", t) for t in times], "k string, t int")
    out = sessionize_gap(df, key="k", ts="t", gap=gap).collect()

    ordered = sorted(times)
    expect = {}
    sid = 0
    for i, t in enumerate(ordered):
        if i > 0 and t - ordered[i - 1] > gap:
            sid += 1
        expect[t] = sid  # duplicates land in the same session
    for r in out:
        assert r.session_id == expect[r.t], (r.t, gap, ordered)


# --- rolling mean vs pandas ------------------------------------------

@given(st.lists(st.integers(min_value=-1000, max_value=1000),
                min_size=1, max_size=25),
       st.integers(min_value=1, max_value=8))
@SET
def test_rolling_agg_matches_pandas(spark, values, n):
    import pandas as pd

    from lumbermill_spark.operators.stats import rolling_agg

    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(values)],
        "g string, seq int, v long")
    out = {r.seq: (r.roll_sum, r.roll_n, r.roll_avg)
           for r in rolling_agg(df, key="g", order_by=["seq"],
                                value_field="v", n=n).collect()}
    s = pd.Series(values)
    sums = s.rolling(n, min_periods=1).sum()
    cnts = s.rolling(n, min_periods=1).count()
    for i in range(len(values)):
        assert out[i][0] == int(sums[i])
        assert out[i][1] == int(cnts[i])
        assert out[i][2] == round(sums[i] / cnts[i], 4)


# --- token budget trim invariants ------------------------------------

@given(st.lists(st.tuples(st.sampled_from(["s1", "s2"]),
                          st.integers(min_value=1, max_value=50)),
                min_size=1, max_size=25),
       st.integers(min_value=1, max_value=120))
@SET
def test_token_budget_trim_invariants(spark, rows, budget):
    """Per-stratum totals never exceed the budget; the kept set is
    exactly the hash-order greedy prefix (drop-on-overflow)."""
    import hashlib

    from lumbermill_spark.training import sampling

    df = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(rows)],
        "doc_id long, source string, n_tok long")
    kept = sampling.token_budget_trim(df, budget=budget,
                                      tokens_col="n_tok")
    got = {}
    for r in kept.collect():
        got.setdefault(r.source, set()).add(r.doc_id)

    def h60(i):
        return int(hashlib.md5(f"{i}:budget".encode()).hexdigest()[:15], 16)

    for src in {s for s, _ in rows}:
        members = sorted(((h60(i), i, t) for i, (s, t) in enumerate(rows)
                          if s == src))
        cum, expect = 0, set()
        for _, i, t in members:
            cum += t
            if cum <= budget:
                expect.add(i)
            else:
                break  # keep-while-prefix: first overflow stops the scan
        assert got.get(src, set()) == expect, (src, budget)
        assert sum(t for i, (s, t) in enumerate(rows)
                   if s == src and i in expect) <= budget


# --- upsert / snapshot diff vs brute force ----------------------------

_kv = st.tuples(st.integers(min_value=0, max_value=6),
                st.integers(min_value=0, max_value=9))


@given(st.lists(_kv, min_size=0, max_size=12, unique_by=lambda t: t[0]),
       st.lists(_kv, min_size=0, max_size=12, unique_by=lambda t: t[0]))
@SET
def test_upsert_latest_matches_bruteforce(spark, base, batch):
    from lumbermill_spark.operators.stateful import upsert_latest

    if not base or not batch:
        return  # createDataFrame needs rows; empty sides are untested API
    b = spark.createDataFrame(base, "k int, v int")
    u = spark.createDataFrame(batch, "k int, v int")
    got = {r.k: r.v for r in upsert_latest(b, u, key="k",
                                           version="v").collect()}
    expect = {}
    for k, v in base:
        expect[k] = (v, 0)
    for k, v in batch:
        if k not in expect or (v, 1) > expect[k]:
            expect[k] = (v, 1)
    assert got == {k: v for k, (v, _) in expect.items()}


@given(st.lists(_kv, min_size=1, max_size=12, unique_by=lambda t: t[0]),
       st.lists(_kv, min_size=1, max_size=12, unique_by=lambda t: t[0]))
@SET
def test_snapshot_diff_matches_bruteforce(spark, old, new):
    from lumbermill_spark.operators.stateful import snapshot_diff

    o = spark.createDataFrame(old, "k int, v int")
    n = spark.createDataFrame(new, "k int, v int")
    got = {r.k: r.status for r in snapshot_diff(o, n, key="k").collect()}
    od, nd = dict(old), dict(new)
    for k in set(od) | set(nd):
        if k not in od:
            assert got[k] == "added"
        elif k not in nd:
            assert got[k] == "removed"
        elif od[k] == nd[k]:
            assert got[k] == "unchanged"
        else:
            assert got[k] == "changed"


_tokseq = st.lists(st.integers(min_value=0, max_value=5),
                   min_size=0, max_size=12)


@given(st.lists(_tokseq, min_size=1, max_size=10),
       st.lists(_tokseq, min_size=1, max_size=4))
@SET
def test_token_contamination_matches_bruteforce(spark, train, evals):
    from lumbermill_spark.training.tokenize import token_contamination

    n = 3
    t = spark.createDataFrame(
        [(i, seq) for i, seq in enumerate(train)],
        "doc_id long, tokens array<int>")
    e = spark.createDataFrame(
        [(i, seq) for i, seq in enumerate(evals)],
        "doc_id long, tokens array<int>")
    got = {r["doc_id"]: (r["n_grams"], r["n_contaminated"])
           for r in token_contamination(t, e, n=n).collect()}

    def grams(seq):
        return {tuple(seq[i:i + n]) for i in range(len(seq) - n + 1)}

    inventory = set().union(*(grams(s) for s in evals)) if evals else set()
    for i, seq in enumerate(train):
        g = grams(seq)
        assert got[i] == (len(g), len(g & inventory)), (i, seq)
