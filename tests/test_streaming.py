"""StreamingFlowAnalyzer equivalence + compute_actions routing."""

import numpy as np
import pytest

import reference_cv as ref
from funscript_flow_tpu.models.pipeline import (
    FlowAnalyzer,
    PipelineConfig,
    StreamingFlowAnalyzer,
)
from funscript_flow_tpu.runner import compute_actions
from funscript_flow_tpu.ops import signal_host as sh
from funscript_flow_tpu.utils.params import Params

pytestmark = pytest.mark.slow  # golden/e2e: minutes, not seconds


@pytest.mark.parametrize("push_size", [3, 7, 40])
def test_streaming_equals_batch(push_size):
    """Streaming push/flush must be bitwise identical to the batch analyzer,
    for any push granularity (including pushes smaller than the halo)."""
    frames = np.stack(ref.make_synthetic_frames(32, h=48, w=48, period=9, seed=13))
    cfg = PipelineConfig(pair_batch=6)
    want = FlowAnalyzer(cfg).analyze_video_pairs(frames)

    st = StreamingFlowAnalyzer(cfg)
    results = []
    for i in range(0, len(frames), push_size):
        results.extend(st.push(list(frames[i : i + push_size])))
    results.extend(st.flush())
    got = {k: np.concatenate([r[k] for r in results]) for k in st.KEYS}
    assert st.pairs_emitted == 31
    for k in ("dots", "centers", "mean_mag", "val_pos"):
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    np.testing.assert_array_equal(got["cuts"], want["cuts"])


def test_streaming_ramp_window_equals_batch():
    """First-window ramp (pair_batch > smallest bucket): pushing in chunks
    small enough that the ramp dispatch fires (a 20-pair first window for
    pair_batch=80; bucket floor 16) must stay bitwise identical to the
    batch analyzer — the ramp is a dispatch-schedule change only."""
    frames = np.stack(ref.make_synthetic_frames(120, h=48, w=48, period=9,
                                                seed=7))
    cfg = PipelineConfig(pair_batch=80)
    want = FlowAnalyzer(cfg).analyze_video_pairs(frames)

    st = StreamingFlowAnalyzer(cfg)
    assert st.ramp_pairs == 20
    results = []
    # 47-frame first push: 46 pairs >= ramp(20)+radius(6), < 86 -> ramp fires
    for i in range(0, len(frames), 47):
        results.extend(st.push(list(frames[i : i + 47])))
    # the ramp window actually dispatched first (s=20 after push 1; the
    # full-window loop then advances in pair_batch strides)
    assert st._s in (20, 100, 120)
    results.extend(st.flush())
    got = {k: np.concatenate([r[k] for r in results]) for k in st.KEYS}
    assert st.pairs_emitted == 119
    for k in st.KEYS:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


@pytest.mark.parametrize("n_frames", [120, 87, 167, 100])
def test_streaming_ramp_down_equals_batch(n_frames):
    """Tail ramp-DOWN (total handed to the analyzer): the remaining pairs
    after the last full window dispatch as descending buckets during decode
    instead of one window at flush — a dispatch-schedule change only, so
    results must stay bitwise identical to the batch analyzer."""
    frames = np.stack(ref.make_synthetic_frames(n_frames, h=48, w=48,
                                                period=9, seed=11))
    cfg = PipelineConfig(pair_batch=80)
    want = FlowAnalyzer(cfg).analyze_video_pairs(frames)

    st = StreamingFlowAnalyzer(cfg, n_pairs_total=n_frames - 1)
    results = []
    # runner pull pattern: priming pull of ramp + radius + 1, then B per pull
    sent = min(st.ramp_pairs + st.radius + 1, n_frames)
    results.extend(st.push(list(frames[:sent])))
    while sent < n_frames:
        n = min(cfg.pair_batch, n_frames - sent)
        results.extend(st.push(list(frames[sent : sent + n])))
        sent += n
    # with the total known and every frame delivered, the ramp-down already
    # dispatched the final window inside push()
    assert st.pairs_emitted == n_frames - 1
    results.extend(st.flush())
    got = {k: np.concatenate([r[k] for r in results]) for k in st.KEYS}
    for k in st.KEYS:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_streaming_truncated_total_falls_back_to_flush():
    """n_pairs_total is an upper bound: when the container truncates (fewer
    real frames than metadata promised) the final window never becomes
    dispatchable in push() and flush() must emit the remainder with REAL
    counts — same funscript semantics as an unknown total."""
    frames = np.stack(ref.make_synthetic_frames(70, h=48, w=48, period=9,
                                                seed=5))
    cfg = PipelineConfig(pair_batch=80)
    want = FlowAnalyzer(cfg).analyze_video_pairs(frames)

    st = StreamingFlowAnalyzer(cfg, n_pairs_total=119)  # promised 120 frames
    results = []
    for i in range(0, len(frames), 47):
        results.extend(st.push(list(frames[i : i + 47])))
    results.extend(st.flush())
    assert st.pairs_emitted == 69
    got = {k: np.concatenate([r[k] for r in results]) for k in st.KEYS}
    for k in st.KEYS:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_compute_actions_routes_discontinuity_to_host(rng):
    """A cumulative-flow jump > 1000 must give the reference's exact
    (re-anchored window grid) result, i.e. the host path."""
    n = 200
    dots = rng.normal(0, 2, n)
    dots[100] = 2500.0  # integration jump > threshold
    cuts = np.zeros(n, bool)
    ts = np.arange(n)
    p_auto = Params(signal_backend="auto")
    p_host = Params(signal_backend="host")
    a_auto, _ = compute_actions(dots, cuts, ts, 30.0, 30.0, p_auto)
    a_host, _ = compute_actions(dots, cuts, ts, 30.0, 30.0, p_host)
    assert a_auto == a_host


def test_compute_actions_auto_routes_small_to_host(rng):
    """auto uses the exact host chain below AUTO_DEVICE_MIN_SAMPLES (the
    device chain would pay one compile per new bucket length — folder
    batches of short videos were spending seconds per video on that)."""
    n = 300
    dots = np.sin(np.arange(n) / 7.0) * 3
    cuts = np.zeros(n, bool)
    ts = np.arange(n)
    a_auto, norm_auto = compute_actions(dots, cuts, ts, 30.0, 30.0,
                                        Params(signal_backend="auto"))
    a_host, norm_host = compute_actions(dots, cuts, ts, 30.0, 30.0,
                                        Params(signal_backend="host"))
    np.testing.assert_allclose(norm_auto, norm_host, atol=1e-12)
    assert a_auto == a_host


def test_compute_actions_tiny_signal_host_path():
    """n < 32 routes to the exact host path; must match signal_host exactly
    (including the <5-sample detrend quirks)."""
    dots = np.array([0.5, 1.0])
    cuts = np.array([False, False])
    ts = np.array([0, 1])
    a, _ = compute_actions(dots, cuts, ts, 30.0, 30.0, Params())
    want, _ = sh.signal_chain(dots, cuts, ts, 30.0, 60, 90)
    assert a == want


def test_planned_tail_buckets_match_analyzer(monkeypatch):
    """_planned_tail_buckets (the async prewarm) must predict exactly the
    non-full window shapes StreamingFlowAnalyzer dispatches, for any video
    length — otherwise the prewarm compiles a shape the run never uses."""
    from funscript_flow_tpu.models import pipeline as pl
    from funscript_flow_tpu.runner import _planned_tail_buckets

    r = pl.CENTER_SMOOTH_RADIUS if hasattr(pl, "CENTER_SMOOTH_RADIUS") else 6
    B = 48
    shapes = []

    def fake_program(frames, n_pairs, cfg):
        n = frames.shape[0] - 2 * r - 1
        shapes.append(n)
        return {
            "dots": np.zeros(n + 2 * r, np.float32),
            "cuts": np.zeros(n + 2 * r, bool),
            "centers": np.zeros((n + 2 * r, 2), np.float32),
            "mean_mag": np.zeros(n + 2 * r, np.float32),
            "val_pos": np.zeros(n + 2 * r, np.float32),
        }

    monkeypatch.setattr(pl, "flow_chunk_program", fake_program)
    frame = np.zeros((4, 4), np.uint8)
    # B=48: ramp == pair_batch (no ramp window); B=128: ramp=32 fires on
    # every clip with >= 38 pairs — the production shape (pair_batch=240,
    # ramp=60) behaves like the latter (code-review r4 finding: the old
    # predictor ignored the ramp partition entirely)
    for B in (48, 128):
        cfg = pl.PipelineConfig(pair_batch=B)
        for n_pairs in list(range(1, 3 * B + 20, 7)) + [
                B - 1, B, B + 1, 2 * B - 1, 2 * B, 2 * B + 1, 3 * B]:
            shapes.clear()
            # the runner always hands the analyzer its pair total (tail
            # ramp-down schedules against it)
            an = pl.StreamingFlowAnalyzer(cfg, n_pairs_total=n_pairs)
            # emulate the runner's pull pattern: priming pull of
            # ramp + radius + 1 frames, then pair_batch per pull
            total = n_pairs + 1
            sent = min(an.ramp_pairs + an.radius + 1, total)
            an.push([frame] * sent)
            while sent < total:
                n = min(B, total - sent)
                an.push([frame] * n)
                sent += n
            an.flush()
            got = sorted({s for s in shapes if s != B})
            want = sorted(_planned_tail_buckets(B, an.radius, n_pairs))
            assert got == want, (B, n_pairs, got, want)
