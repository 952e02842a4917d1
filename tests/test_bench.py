"""bench.py capture-path hardening (VERDICT r3 item 6).

One transient tunnel failure on an aggregate row must not drop the
remaining rows from the official record.
"""

import bench


def test_collect_aggregates_continues_past_failed_row(capsys):
    calls = []

    def measure(nruns):
        calls.append(nruns)
        if nruns == 8:
            raise RuntimeError("simulated tunnel hiccup")
        return {"symbols_per_sec": float(nruns) * 1e6}

    aggs = bench.collect_aggregates(measure, (8, 32, 128))
    assert calls == [8, 32, 128]  # all rows attempted despite the failure
    assert sorted(aggs) == [32, 128]
    assert aggs[128]["symbols_per_sec"] == 128e6
    out = capsys.readouterr().out
    assert "aggregate 8 runs failed" in out


def test_collect_aggregates_all_ok():
    aggs = bench.collect_aggregates(
        lambda n: {"symbols_per_sec": 1.0}, (8, 32))
    assert sorted(aggs) == [8, 32]


def test_ser_band_check():
    """Every capture is an accuracy certificate (VERDICT r4 weak #2): full-
    workload measurements must carry their converged soft SER, and the band
    verdict covers exactly the >= 170-frame programs."""
    ok, sers = bench.ser_band_check([
        ("agg", {"frames_timed": 170, "ser_soft_last20": 0.0315,
                 "symbols_per_sec": 1.0}),
        ("short", {"frames_timed": 10, "ser_soft_last20": 0.4}),  # exempt
        ("missing", None),
    ])
    assert ok is True and sers == {"agg": 0.0315}

    ok, sers = bench.ser_band_check([
        ("agg", {"frames_timed": 170, "ser_soft_last20": 0.05})])
    assert ok is False

    ok, sers = bench.ser_band_check([("none", None)])
    assert ok is None and sers == {}
