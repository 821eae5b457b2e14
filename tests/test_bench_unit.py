"""Unit tests for bench.py's measurement machinery.

The driver runs bench.py unattended at the end of every round; a latent
bug in the timing/pairing helpers (e.g. in the >1-core scenario-1b branch
this box never executes) would silently produce a broken BENCH_r{N}.json.
These tests drive the shared helper with stubbed pipeline/decode functions
so every field the JSON line is built from is covered without real video.
"""

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def _fake_process(walls, timers):
    """A process_video stand-in: pops a scripted wall time (slept for real,
    scaled down) and emits the runner's stage-timer log line."""
    import time

    calls = {"n": 0}

    def run(clip, params, log_func):
        i = calls["n"]
        calls["n"] += 1
        time.sleep(walls[i])
        dw, dc = timers[i]
        log_func(f"Stage timers: decode_wait={dw}s device_compute={dc}s")
        return None

    return run


def test_timed_runs_paired(monkeypatch):
    # 3 reps; rep 1 is fastest -> its stage split is reported; calibration
    # reps pair 1:1 with e2e reps in call order
    # 10x separation so pool jitter cannot reorder which rep is fastest
    walls = [0.25, 0.02, 0.12]
    timers = [(1.0, 2.0), (3.0, 4.0), (5.0, 6.0)]
    cals = iter([0.024, 0.009, 0.012])
    monkeypatch.setattr(bench, "_decode_only", lambda clip, vr: next(cals))

    r = bench._timed_runs(_fake_process(walls, timers), "clip", object(), 3,
                          duration=1.0)
    assert r is not None
    # best wall is rep 1 (~0.01 s); loose bound — the shared pool can
    # stretch a 10 ms sleep severalfold
    assert r["x"] > 2.0
    assert (r["decode_wait"], r["device_compute"]) == (3.0, 4.0)
    assert r["decode_only"] == 0.009
    # efficiency is the best per-rep cal/wall pair, capped at 1.0; the
    # median of per-rep ratios is reported alongside (the number of record,
    # VERDICT r4 #2 — max alone is upward-biased)
    assert 0.0 < r["efficiency"] <= 1.0
    assert 0.0 < r["efficiency_med"] <= r["efficiency"]


def test_timed_runs_unpaired_skips_calibration(monkeypatch):
    def boom(clip, vr):  # must never be called with paired=False
        raise AssertionError("calibration ran in unpaired mode")

    monkeypatch.setattr(bench, "_decode_only", boom)
    r = bench._timed_runs(_fake_process([0.0], [(0.5, 0.5)]), "clip",
                          object(), 1, duration=2.0, paired=False)
    assert r is not None
    assert r["decode_only"] == 0.0
    assert r["efficiency"] == 0.0
    assert r["efficiency_med"] == 0.0


def test_timed_runs_error_returns_none(monkeypatch):
    monkeypatch.setattr(bench, "_decode_only", lambda clip, vr: 0.01)

    def failing(clip, params, log_func):
        return "decode error"

    assert bench._timed_runs(failing, "clip", object(), 2, 1.0) is None


def test_timed_runs_missing_stage_timers(monkeypatch):
    # a run whose log carries no stage-timer line must not crash the bench
    monkeypatch.setattr(bench, "_decode_only", lambda clip, vr: 0.01)

    def quiet(clip, params, log_func):
        log_func("Funscript saved")
        return None

    r = bench._timed_runs(quiet, "clip", object(), 1, 1.0)
    assert r is not None
    assert (r["decode_wait"], r["device_compute"]) == (0.0, 0.0)


def test_timed_runs_unavailable_calibration(monkeypatch):
    # _decode_only returns inf when the native pump is unavailable; the
    # ratio list must stay finite-only and efficiency degrade to 0.0
    monkeypatch.setattr(bench, "_decode_only",
                        lambda clip, vr: float("inf"))
    r = bench._timed_runs(_fake_process([0.0], [(0.1, 0.1)]), "clip",
                          object(), 1, 1.0)
    assert r is not None
    assert r["decode_only"] == 0.0
    assert r["efficiency"] == 0.0


def test_threads_scaling_branch(monkeypatch):
    """The >1-core scenario-1b legs (never executed on this 1-core box):
    Params must accept the threads kwarg and the branch's _timed_runs calls
    must be well-formed. Drives the exact calls main() makes."""
    from funscript_flow_tpu.utils.params import Params

    seen = []

    def fake_timed(fn, clip, params, n, duration, vr_mode=False, paired=True):
        seen.append((params.threads, n, paired))
        return {"x": 5.0, "decode_wait": 0.0, "device_compute": 0.0,
                "decode_only": 0.0, "efficiency": 1.0}

    monkeypatch.setattr(bench, "_timed_runs", fake_timed)
    host_cores = 4
    rn = bench._timed_runs(None, "clip",
                           Params(overwrite=True, threads=host_cores), 3,
                           bench.DURATION_S)
    r1 = bench._timed_runs(None, "clip", Params(overwrite=True, threads=1),
                           3, bench.DURATION_S)
    assert rn["x"] == 5.0 and r1["x"] == 5.0
    assert seen == [(4, 3, True), (1, 3, True)]


def test_stats_folder_shape():
    """The interleaved folder path feeds _stats zeroed stage splits and
    its own cal pairing; best-of and median efficiency must come out of
    the same per-rep ordering the headline path uses."""
    walls = [4.0, 2.0, 8.0]
    cals = [2.0, 1.9, 2.1]  # ratios: 0.5, 0.95, 0.2625 -> median 0.5
    r = bench._stats(walls, [(0.0, 0.0)] * 3, cals, 40.0)
    assert r["x"] == 40.0 / 2.0
    assert r["decode_only"] == 1.9
    assert r["efficiency"] == pytest.approx(0.95)
    assert r["efficiency_med"] == pytest.approx(0.5)
    assert r["decode_wait"] == 0.0 and r["device_compute"] == 0.0


def test_single_rep_pairs_calibration(monkeypatch):
    """_single_rep must run the e2e leg FIRST and the calibration leg
    immediately after (same pool window), and return (wall, split, cal)."""
    order = []

    def proc(clip, params, log_func):
        order.append("e2e")
        log_func("Stage timers: decode_wait=0.3s device_compute=0.2s")
        return None

    monkeypatch.setattr(bench, "_decode_only",
                        lambda clip, vr: order.append("cal") or 1.5)
    wall, split, cal = bench._single_rep(proc, "clip", object())
    assert order == ["e2e", "cal"]
    assert split == (0.3, 0.2) and cal == 1.5 and wall >= 0.0
