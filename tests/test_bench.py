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
