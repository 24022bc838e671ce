"""Unit tests for bench.py's harness logic that must not depend on a
SparkSession: the compact-payload trimmer and the chunked
orchestrator's merge/accounting (children mocked — no JVMs)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_compact_payload_fits_limit_and_records_trim():
    queries = {f"q{i:03d}": 1.234 for i in range(400)}
    payload = {
        "metric": "headline_queries_total",
        "value": 493.6,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
    }
    out = bench._compact(payload)
    assert len(json.dumps(out)) <= bench._COMPACT_LIMIT
    assert out["n"] == 400
    assert out["omitted"] == 400 - len(out["queries"])
    assert out["omitted"] > 0
    # bench order preserved: the surviving entries are the head
    assert list(out["queries"]) == list(queries)[: len(out["queries"])]


def test_orchestrator_merges_chunk_payloads(monkeypatch, tmp_path, capsys):
    """Each mocked child writes its chunk's payload to
    BENCH_LOCAL.json; the orchestrator must merge timings in bench
    order, propagate errors/skips, and flag chunk members missing
    from a child payload instead of silently dropping them."""
    local = tmp_path / "BENCH_LOCAL.json"
    monkeypatch.setattr(bench, "_local_json_path", lambda: str(local))

    bench_set = [f"q{i}" for i in range(6)]
    calls = []

    class FakeProc:
        returncode = 0
        stderr = ""

    def fake_run(cmd, env=None, capture_output=True, text=True, timeout=0):
        chunk = env["SPARK_GRAFT_BENCH_ONLY"].split(",")
        calls.append(chunk)
        part = {
            "queries": {n: 1.0 for n in chunk if n != "q4"},
            "sf": 0.1,
        }
        if "q4" in chunk:
            part["errors"] = {"q4": "boom"}
        with open(local, "w") as fh:
            json.dump(part, fh)
        return FakeProc()

    import subprocess

    monkeypatch.setattr(subprocess, "run", fake_run)

    bench._orchestrate(bench_set, chunk_size=3)
    captured = capsys.readouterr()
    payload = json.loads(open(local).read())
    assert calls == [bench_set[:3], bench_set[3:]]
    assert list(payload["queries"]) == ["q0", "q1", "q2", "q3", "q5"]
    assert payload["errors"] == {"q4": "boom"}
    assert "skipped" not in payload
    last = captured.out.strip().splitlines()[-1]
    compact = json.loads(last)
    assert compact["n"] == 5 and compact["errors"] == 1


def test_orchestrator_flags_missing_and_stale_payload(
    monkeypatch, tmp_path, capsys
):
    """A child that crashes before writing a payload must surface
    every chunk member as an error (the pre-launch payload delete
    prevents a stale read)."""
    local = tmp_path / "BENCH_LOCAL.json"
    monkeypatch.setattr(bench, "_local_json_path", lambda: str(local))
    # stale payload from some previous run
    with open(local, "w") as fh:
        json.dump({"queries": {"zz": 9.9}}, fh)

    class FakeProc:
        returncode = 1
        stderr = ""

    def fake_run(cmd, env=None, capture_output=True, text=True, timeout=0):
        return FakeProc()  # writes nothing

    import subprocess

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._orchestrate(["a", "b"], chunk_size=2)
    capsys.readouterr()
    payload = json.loads(open(local).read())
    assert payload["queries"] == {}
    assert set(payload["errors"]) == {"a", "b"}
    assert "stale" not in json.dumps(payload)
