"""Unit tests for bench.py's drift-robust headline capture (VERDICT r4 #1):
when a capture window flags suspect (spread/median > 10%), the bench waits
and re-captures once, reports the better window's median, and carries both
windows' per-rep provenance plus the cross-window floor. Tested with
injected fake capture/sleep — no TPU, no real 90 s wait."""

import numpy as np

from bench import _WINDOW_SUSPECT_SPREAD, drift_robust_timing


def _window(rates, work=48.0, t0=100.0):
    """Fake (secs_samples, stamps) whose work/secs rates are ``rates``."""
    return [work / r for r in rates], [t0 + i for i in range(len(rates))]


def test_clean_window_no_retry():
    sleeps = []
    calls = []

    def capture():
        calls.append(1)
        return _window([1000.0, 1010.0, 990.0, 1005.0, 995.0])

    (secs, stamps), extra = drift_robust_timing(
        capture, 48.0, sleep_fn=sleeps.append
    )
    assert len(calls) == 1 and sleeps == []
    assert extra == {}
    rates = sorted(48.0 / s for s in secs)
    assert (rates[-1] - rates[0]) / np.median(rates) <= _WINDOW_SUSPECT_SPREAD


def test_suspect_window_retries_and_reports_better_median():
    sleeps = []
    windows = [
        _window([2891.0, 3379.8, 3796.0], t0=100.0),   # suspect: 27% spread
        _window([2010.0, 2019.4, 2030.0], t0=300.0),   # clean but slower
    ]
    calls = []

    def capture():
        calls.append(1)
        return windows[len(calls) - 1]

    (secs, stamps), extra = drift_robust_timing(
        capture, 48.0, sleep_fn=sleeps.append, retry_wait_s=90.0
    )
    assert len(calls) == 2
    assert sleeps == [90.0]
    # Better (higher-median) window wins: the first one.
    assert stamps[0] == 100.0
    assert float(np.median([48.0 / s for s in secs])) == 3379.8
    # Both windows' provenance + the cross-window floor ride the record.
    assert len(extra["windows"]) == 2
    assert extra["floor"] == 2019.4
    assert extra["retried_suspect_window"] is True
    assert extra["windows"][1]["median"] == 2019.4
    assert extra["windows"][0]["rep_ts"][0] == 100.0


def test_second_window_better_wins():
    windows = [
        _window([900.0, 1000.0, 1150.0], t0=0.0),   # suspect AND slower
        _window([1300.0, 1310.0, 1305.0], t0=200.0),
    ]
    calls = []

    def capture():
        calls.append(1)
        return windows[len(calls) - 1]

    (secs, stamps), extra = drift_robust_timing(
        capture, 48.0, sleep_fn=lambda s: None
    )
    assert stamps[0] == 200.0
    assert float(np.median([48.0 / s for s in secs])) == 1305.0
    assert extra["floor"] == 1000.0


def test_both_windows_suspect_stops_after_max_retries():
    calls = []

    def capture():
        calls.append(1)
        return _window([800.0, 1000.0, 1200.0])  # always suspect

    (secs, _), extra = drift_robust_timing(
        capture, 48.0, sleep_fn=lambda s: None, max_retries=1
    )
    assert len(calls) == 2  # one retry, not an infinite loop
    # The chosen window is still suspect; _emit's spread check will set
    # window_suspect on the emitted record from these samples.
    rates = sorted(48.0 / s for s in secs)
    assert (rates[-1] - rates[0]) / np.median(rates) > _WINDOW_SUSPECT_SPREAD
    assert extra["retried_suspect_window"] is True
