"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf dir; compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted,
floats canonicalized). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from lumbermill_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    return str(v)


def frame_sig(cols: list[str], rows: list[tuple]) -> tuple[int, str, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    norm = sorted(
        "\x01".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\x02".join(norm).encode()).hexdigest()
    return len(rows), ",".join(sorted(cols)), h


def connect_oracle(sf: str):
    """DuckDB connection with the sf dir's tables registered as views
    (same names the driver uses)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def run_gate(spark, sf: str, only=None, con=None) -> list[str]:
    """Run the driver-equivalent correctness gate; returns the failing
    query names. Importable (tests wire this in as a smoke check for
    queries past the driver gate's 50-query cap — see COVERAGE.md)."""
    if con is None:
        con = connect_oracle(sf)
    only = set(only) if only else None
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)"
                  + (" EMPTY!" if not srows else ""))
            if not srows:
                failures.append(name)
            continue
        try:
            res = con.sql(oracles[name])
            drows = res.fetchall()
            dcols = res.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        s_sig = frame_sig(scols, srows)
        d_sig = frame_sig(dcols, drows)
        if s_sig == d_sig:
            print(f"ok   {name}: {s_sig[0]} rows match")
        else:
            failures.append(name)
            print(f"FAIL {name}: spark={s_sig} duckdb={d_sig}")
            if s_sig[0] == d_sig[0] and s_sig[1] == d_sig[1]:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted("|".join(canon(r[i]) for i in order) for r in srows)
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dset = sorted("|".join(canon(r[i]) for i in dorder) for r in drows)
                diffs = [(a, b) for a, b in zip(sset, dset) if a != b]
                for a, b in diffs[:3]:
                    print(f"       spark : {a[:160]}")
                    print(f"       duckdb: {b[:160]}")
    return failures


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cores=8)
    failures = run_gate(spark, sf, only=only)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
