"""bench v3 delta confirmation: flag selection and isolated re-timing
(monkeypatched sessions — no real Spark runs; the driver executes the
real path each round)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_no_flags_when_within_threshold():
    base = json.load(open(os.path.join(bench.os.path.dirname(
        os.path.abspath(bench.__file__)), "BENCH_BASELINE.json")))
    timings = dict(base["queries"])  # identical -> nothing flagged
    out = bench.confirm_deltas(timings, cpus=2, sf_dir="unused")
    assert set(out) == {"baseline", "flagged", "cap"}
    assert out["flagged"] == []


def test_run_degradation_clean_and_degraded():
    """Round-7 verdict #1: a machine-wide slow run must be annotated at
    the RUN level, not read as per-query regressions."""
    base = json.load(open(os.path.join(bench.os.path.dirname(
        os.path.abspath(bench.__file__)), "BENCH_BASELINE.json")))
    clean = bench.run_degradation(dict(base["queries"]))
    assert clean["degraded"] is False
    assert clean["ratio"] == 1.0
    slow = bench.run_degradation(
        {k: v * 1.4 for k, v in base["queries"].items()})
    assert slow["degraded"] is True
    assert "unreliable" in slow["note"]
    # Wrong SF: no verdict, no overlap claimed.
    other = bench.run_degradation(dict(base["queries"]), sf=0.01)
    assert other["degraded"] is False


def test_isolation_cap_scales_with_flagged_count():
    """A degraded run flags many queries; every one must be eligible
    for isolated evidence (cap grows past the old fixed 6, capped 16)."""
    base = json.load(open(os.path.join(bench.os.path.dirname(
        os.path.abspath(bench.__file__)), "BENCH_BASELINE.json")))
    timings = {k: (v * 2 if v >= 0.3 else v)
               for k, v in base["queries"].items()}
    n_big = sum(1 for v in base["queries"].values() if v >= 0.3)
    # Don't actually re-time: peek at the cap via a zero-workload call.
    out = bench.confirm_deltas(
        timings, cpus=2, sf_dir="unused", cap=0)
    assert len(out["flagged"]) >= min(8, n_big)
    assert bench._isolation_cap(2) == 6
    assert bench._isolation_cap(8) == 8      # the round-7 failure case
    assert bench._isolation_cap(40) == 16


def test_sub_300ms_deltas_ignored():
    base = json.load(open(os.path.join(bench.os.path.dirname(
        os.path.abspath(bench.__file__)), "BENCH_BASELINE.json")))
    timings = dict(base["queries"])
    tiny = min(timings, key=timings.get)
    assert timings[tiny] < 0.3, "no sub-0.3s query in baseline?"
    timings[tiny] = 0.29  # huge ratio, tiny absolute
    out = bench.confirm_deltas(timings, cpus=2, sf_dir="unused")
    assert tiny not in out


def test_other_scale_factor_never_compares(monkeypatch):
    base = json.load(open(os.path.join(bench.os.path.dirname(
        os.path.abspath(bench.__file__)), "BENCH_BASELINE.json")))
    timings = {k: v * 10 for k, v in base["queries"].items()}
    out = bench.confirm_deltas(timings, cpus=2, sf_dir="unused", sf=0.01)
    assert out == {}


def test_flagged_queries_get_isolated_runs(monkeypatch):
    base = json.load(open(os.path.join(bench.os.path.dirname(
        os.path.abspath(bench.__file__)), "BENCH_BASELINE.json")))
    timings = dict(base["queries"])
    big = max(timings, key=timings.get)
    timings[big] = round(timings[big] * 3, 3)

    class FakeDF:
        class write:  # noqa: N801
            @staticmethod
            def mode(_):
                class S:
                    @staticmethod
                    def format(_):
                        class V:
                            @staticmethod
                            def save():
                                return None
                        return V
                return S

    class FakeSystem:
        @staticmethod
        def gc():
            pass

    class FakeJvm:
        System = FakeSystem

    class FakeSession:
        _jvm = FakeJvm

        def stop(self):
            pass

    monkeypatch.setattr(bench, "warm_session", lambda cpus: FakeSession())
    monkeypatch.setattr(
        bench.entry_mod, "queries",
        lambda: {big: (lambda spark, sf: FakeDF())},
    )
    out = bench.confirm_deltas(timings, cpus=2, sf_dir="unused")
    assert big in out
    assert out[big]["baseline"] == base["queries"][big]
    assert out[big]["bench"] == timings[big]
    assert len(out[big]["isolated_warm"]) == 2
