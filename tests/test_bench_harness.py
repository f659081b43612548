"""bench.py harness invariants — no SparkSession needed.

Round 2's bench artifact was destroyed by a single failing query
(BENCH_r02.json: rc=1, zero timings). These tests pin the two
protections added in round 3: per-query failure isolation in
``run_suite`` and crash-tolerant baseline loading in ``_baseline``.
"""

from __future__ import annotations

import json

import bench


class TestRunSuite:
    def test_one_broken_query_does_not_stop_the_run(self):
        def execute(name):
            if name == "broken":
                raise RuntimeError("boom")
            return 7

        timings, rows, errors = bench.run_suite(
            ["a", "broken", "b"], execute, base={}
        )
        assert set(timings) == {"a", "b"}
        assert rows == {"a": 7, "b": 7}
        assert list(errors) == ["broken"]
        assert "RuntimeError" in errors["broken"]

    def test_all_queries_run_twice_and_keep_min(self):
        calls: dict[str, int] = {}

        def execute(name):
            calls[name] = calls.get(name, 0) + 1
            return 1

        timings, _rows, errors = bench.run_suite(["a", "b"], execute, base={})
        assert calls == {"a": 2, "b": 2}
        assert not errors
        assert all(t >= 0 for t in timings.values())

    def test_confirmation_pass_reruns_slow_queries(self):
        calls: dict[str, int] = {}

        def execute(name):
            calls[name] = calls.get(name, 0) + 1
            return 1

        # baseline of 0 seconds can never be met -> a third (late) run
        bench.run_suite(["slow"], execute, base={"slow": 1e-12})
        assert calls["slow"] == 3

    def test_flaky_then_recovering_query_gets_a_timing(self):
        calls = {"n": 0}

        def execute(name):
            calls["n"] += 1
            if calls["n"] == 1:
                raise ValueError("transient")
            return 3

        timings, rows, errors = bench.run_suite(["q"], execute, base={})
        # pass 1 failed, pass 2 succeeded: timing recorded, error kept
        assert "q" in timings
        assert rows["q"] == 3
        assert "q" in errors


class TestBaselineLoader:
    def test_skips_crashed_round_and_uses_previous(self, tmp_path, monkeypatch):
        ok = {"parsed": {"queries": {"q1": 1.5}}}
        crashed = {"parsed": None, "rc": 1}
        (tmp_path / "BENCH_r01.json").write_text(json.dumps(ok))
        (tmp_path / "BENCH_r02.json").write_text(json.dumps(crashed))
        monkeypatch.setattr(
            bench.os.path, "dirname", lambda _p: str(tmp_path)
        )
        assert bench._baseline() == {"q1": 1.5}

    def test_no_artifacts_means_empty(self, tmp_path, monkeypatch):
        monkeypatch.setattr(
            bench.os.path, "dirname", lambda _p: str(tmp_path)
        )
        assert bench._baseline() == {}

    def test_non_numeric_timings_filtered(self, tmp_path, monkeypatch):
        doc = {"parsed": {"queries": {"good": 2.0, "bad": None, "worse": "x"}}}
        (tmp_path / "BENCH_r01.json").write_text(json.dumps(doc))
        monkeypatch.setattr(
            bench.os.path, "dirname", lambda _p: str(tmp_path)
        )
        assert bench._baseline() == {"good": 2.0}
