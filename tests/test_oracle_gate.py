"""Mechanical full-registry oracle sweep (r03 verdict item 6).

Runs the driver-gate replica (tools/check_oracle.run_gate) over the
ENTIRE registry — every `queries()` entry, however many there are —
at sf0.001, so "every tail entry is re-verified locally each round"
is a test, not a docstring promise. The driver's own 50-query window
runs at sf0.01; this sweep is the cheap-scale guard for the rest.

SPARK_GRAFT_GATE_SF overrides the fixture dir (e.g. sf0.01 for the
exact driver replica — slower; the default keeps the suite fast).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

GATE_SF = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.001")


def test_full_registry_matches_oracles(spark):
    from check_oracle import run_gate

    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    assert len(registry) >= 195, "registry shrank"
    failures = run_gate(sf_dir=GATE_SF, spark=spark, quiet=False)
    assert not failures, f"oracle mismatches at {GATE_SF}: {failures}"
