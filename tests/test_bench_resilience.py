"""The bench harness must survive a broken query (round-3 regression).

BENCH_r03 was ``rc: 1, parsed: null`` because one AnalysisException aborted
the sweep before a single timing was printed. The contract now: every query
runs inside try/except, failures land in an ``errors`` dict, and the JSON
line is always emitted with the surviving timings.
"""

from __future__ import annotations

import json

import bench


def test_broken_query_does_not_erase_timings(spark, sf_dir, monkeypatch, capsys):
    def good(s, d):
        return s.range(10).selectExpr("id", "id * 2 AS doubled")

    def broken(s, d):
        raise RuntimeError("deliberately broken for the resilience test")

    def analysis_broken(s, d):
        # Fails at analysis time inside the noop write, like the r3 bug.
        return s.range(1).selectExpr("no_such_column")

    monkeypatch.setattr(
        bench, "QUERIES", {"good": good, "broken": broken, "bad_plan": analysis_broken}
    )
    monkeypatch.setattr(bench, "HEADLINE", ["bad_plan", "broken", "good"])
    monkeypatch.setattr(bench, "SF_DIR", sf_dir)
    monkeypatch.setattr(bench, "CPUS", 4)
    # bench.main calls get_spark (getOrCreate reuses the fixture session) and
    # then spark.stop(); neuter stop so the shared fixture survives.
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(out)
    assert "good" in payload["queries"] and payload["queries"]["good"] > 0
    assert set(payload["errors"]) == {"broken", "bad_plan"}
    assert "deliberately broken" in payload["errors"]["broken"]
    assert payload["value"] == payload["queries"]["good"]
