"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8
from N to 4N executors).

No real cluster exists in this sandbox, so per the BASELINE contract the
same spark-submit job runs at two parallelism levels — local[8] (N) and
local[32] (4N) — against the IDENTICAL pre-materialized token table, in
fresh JVMs (subprocess per level, so JIT/codegen warm-up is symmetric:
each level reports its best of --runs).

    python tools/bench_scaling.py [--rows 8000000] [--runs 4]

Writes the result table into BENCH.md and prints a JSON summary:
scaling_efficiency = throughput(4N) / (4 * throughput(N)).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = "/tmp/lms_submit/lms.zip"


def build_zip() -> None:
    os.makedirs(os.path.dirname(ZIP), exist_ok=True)
    with zipfile.ZipFile(ZIP, "w") as z:
        pkg = os.path.join(REPO, "lumbermill_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


def run_level(cores: int, rows: int, runs: int, prepare: bool = False) -> dict:
    cmd = [
        "spark-submit", "--master", f"local[{cores}]",
        "--conf", "spark.driver.memory=16g",
        "--conf", f"spark.sql.shuffle.partitions={max(cores * 2, 8)}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--py-files", ZIP,
        os.path.join(REPO, "tools", "submit_flagship.py"),
        "--rows", str(rows), "--runs", str(runs),
    ] + (["--prepare-only"] if prepare else [])
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    lines = [json.loads(ln) for ln in out.stdout.splitlines()
             if ln.startswith("{")]
    if prepare:
        return lines[-1]
    summary = [ln for ln in lines if ln.get("summary")][-1]
    summary["all_runs"] = [ln for ln in lines if not ln.get("summary")]
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--n4", type=int, default=32)
    args = ap.parse_args()

    build_zip()
    run_level(args.n4, args.rows, args.runs, prepare=True)  # materialize once
    lo = run_level(args.n, args.rows, args.runs)
    hi = run_level(args.n4, args.rows, args.runs)
    ratio = args.n4 / args.n
    eff = hi["seq_per_sec"] / (ratio * lo["seq_per_sec"])
    result = {
        "rows": args.rows,
        f"local[{args.n}]": lo,
        f"local[{args.n4}]": hi,
        "speedup": round(hi["seq_per_sec"] / lo["seq_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result, indent=2))

    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

Same spark-submit job (`tools/submit_flagship.py`, shipped via
`--py-files`), identical pre-materialized token table
({args.rows:,} rows), fresh JVM per level, best of {args.runs} runs
per level (symmetric JIT warm-up).

| parallelism | secs (best) | sequences/sec | tokens/sec |
|---|---|---|---|
| local[{args.n}] (N) | {lo['secs']} | {lo['seq_per_sec']:,.0f} | {lo['tok_per_sec']:,.0f} |
| local[{args.n4}] (4N) | {hi['secs']} | {hi['seq_per_sec']:,.0f} | {hi['tok_per_sec']:,.0f} |

**Speedup {args.n}→{args.n4} cores: {result['speedup']}×;
scaling efficiency = throughput(4N) / (4 × throughput(N)) =
{result['scaling_efficiency']}** (target ≥ 0.8 → {'PASS' if result['pass'] else 'FAIL'}).

All runs (secs): local[{args.n}] = {[r['secs'] for r in lo['all_runs']]},
local[{args.n4}] = {[r['secs'] for r in hi['all_runs']]}.

Why it scales: the flagship plan is scan → mapInArrow decode → codegen'd
regex projection → partial aggregate → tiny shuffle (one row per
(event_type, http_status) per partition) → final aggregate. Every stage
is embarrassingly parallel over input splits; the only shuffle carries
O(keys × partitions) rows. The same plan on a 1000-executor cluster
shuffles the same tiny aggregate state, so the efficiency holds at
10^12 rows provided input splits (default 128 MB) keep all executors fed.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print("wrote BENCH.md", file=sys.stderr)


if __name__ == "__main__":
    main()
