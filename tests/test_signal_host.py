"""Unit tests for the host (NumPy) signal chain against hand-derived values
and a literal transcription of the reference semantics (SURVEY.md §2.1 #14-19).
"""

import numpy as np
import pytest

from funscript_flow_tpu.ops import signal_host as sh


# --- literal transcriptions (independent of the library code paths) ---------

def ref_integrate(final_flow_list):
    """Literal transcription of reference FunscriptFlow.pyw:1266-1284."""
    cum_flow = [0]
    time_stamps = [final_flow_list[0][2]]
    for i in range(1, len(final_flow_list)):
        flow_prev, cut_prev, t_prev = final_flow_list[i - 1]
        flow_curr, cut_curr, t_curr = final_flow_list[i]
        if cut_curr:
            cum_flow.append(0)
        else:
            mid_flow = (flow_prev + flow_curr) / 2
            cum_flow.append(cum_flow[-1] + mid_flow)
        time_stamps.append(t_curr)
    cum_flow = [
        (cum_flow[i] + cum_flow[i - 1]) / 2 if i > 0 else cum_flow[i]
        for i in range(len(cum_flow))
    ]
    return np.array(cum_flow, dtype=np.float64), time_stamps


def ref_detrend(cum_flow, detrend_win):
    """Literal transcription of reference FunscriptFlow.pyw:1286-1331."""
    cum_flow = np.asarray(cum_flow, dtype=np.float64)
    detrended_data = np.zeros_like(cum_flow)
    weight_sum = np.zeros_like(cum_flow)
    disc_indices = np.where(np.abs(np.diff(cum_flow)) > 1000)[0] + 1
    segment_boundaries = [0] + list(disc_indices) + [len(cum_flow)]
    overlap = detrend_win // 2
    for i in range(len(segment_boundaries) - 1):
        seg_start = segment_boundaries[i]
        seg_end = segment_boundaries[i + 1]
        seg_length = seg_end - seg_start
        if seg_length < 5:
            detrended_data[seg_start:seg_end] = cum_flow[seg_start:seg_end] - np.mean(
                cum_flow[seg_start:seg_end]
            )
            continue
        if seg_length <= detrend_win:
            segment = cum_flow[seg_start:seg_end]
            x = np.arange(len(segment))
            trend = np.polyfit(x, segment, 1)
            detrended_segment = segment - np.polyval(trend, x)
            weights = np.hanning(len(segment))
            detrended_data[seg_start:seg_end] += detrended_segment * weights
            weight_sum[seg_start:seg_end] += weights
        else:
            for start in range(seg_start, seg_end - overlap, overlap):
                end = min(start + detrend_win, seg_end)
                segment = cum_flow[start:end]
                x = np.arange(len(segment))
                trend = np.polyfit(x, segment, 1)
                detrended_segment = segment - np.polyval(trend, x)
                weights = np.hanning(len(segment))
                detrended_data[start:end] += detrended_segment * weights
                weight_sum[start:end] += weights
    return detrended_data / np.maximum(weight_sum, 1e-6)


def ref_rolling_norm(smoothed_data, norm_win):
    """Literal transcription of reference FunscriptFlow.pyw:1335-1349."""
    if norm_win % 2 == 0:
        norm_win += 1
    half_norm = norm_win // 2
    out = np.empty_like(smoothed_data)
    for i in range(len(smoothed_data)):
        s = max(0, i - half_norm)
        e = min(len(smoothed_data), i + half_norm + 1)
        w = smoothed_data[s:e]
        lo, hi = w.min(), w.max()
        out[i] = 50 if hi - lo == 0 else (smoothed_data[i] - lo) / (hi - lo) * 100
    return out


# --- tests -------------------------------------------------------------------

def make_case(rng, n, cut_p=0.02, scale=3.0):
    dots = rng.normal(0, scale, n)
    cuts = rng.random(n) < cut_p
    ts = np.arange(n) * 2  # original-fps frame indices, step 2
    return dots, cuts, ts


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 50, 731])
def test_integrate_matches_reference(rng, n):
    dots, cuts, ts = make_case(rng, n, cut_p=0.1)
    ffl = [(dots[i], bool(cuts[i]), ts[i]) for i in range(n)]
    want, want_ts = ref_integrate(ffl)
    got = sh.integrate_flow(dots, cuts)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert list(ts) == want_ts


@pytest.mark.parametrize("n,win", [(1, 20), (4, 20), (5, 20), (20, 20), (21, 20),
                                   (100, 30), (731, 60), (731, 61), (50, 4)])
def test_detrend_matches_reference(rng, n, win):
    dots, cuts, _ = make_case(rng, n, cut_p=0.05)
    cum = sh.integrate_flow(dots, cuts)
    np.testing.assert_allclose(sh.detrend(cum, win), ref_detrend(cum, win), rtol=1e-9, atol=1e-12)


def test_detrend_with_discontinuities():
    # Force a |diff| > 1000 jump -> segment split, including a tiny (<5) segment.
    x = np.concatenate([
        np.linspace(0, 10, 40),
        np.linspace(2000, 2010, 3),   # jump up: segment of 3 -> mean-subtract quirk
        np.linspace(5, 0, 37),        # jump down
    ])
    got = sh.detrend(x, 16)
    want = ref_detrend(x, 16)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)
    # the <5 segment is amplified by 1e6 (reference quirk: zero weight_sum)
    assert np.abs(got[40:43]).max() > 1e5


def test_binomial_smooth_is_np_convolve_same(rng):
    x = rng.normal(0, 1, 97)
    want = np.convolve(x, [1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16], mode="same")
    np.testing.assert_allclose(sh.binomial_smooth(x), want, rtol=1e-12)


@pytest.mark.parametrize("n,win", [(1, 5), (10, 4), (10, 5), (200, 31), (200, 30)])
def test_rolling_normalize_matches_reference(rng, n, win):
    x = rng.normal(0, 1, n)
    np.testing.assert_allclose(
        sh.rolling_normalize(x, win), ref_rolling_norm(x, win), rtol=1e-12
    )


def test_rolling_normalize_flat_window_is_50():
    x = np.full(20, 3.25)
    assert (sh.rolling_normalize(x, 5) == 50.0).all()


def test_keyframe_indices_slope_inversions():
    #            0   1   2   3   4   5   6
    x = np.array([0., 5., 3., 3., 7., 2., 4.])
    # reference semantics: (d1<0) != (d2<0)
    # i=1: d1=5,d2=-2 -> keep; i=2: d1=-2,d2=0 -> keep (True != False);
    # i=3: d1=0,d2=4 -> skip;  i=4: d1=4,d2=-5 -> keep; i=5: d1=-5,d2=2 -> keep
    assert sh.keyframe_indices(x) == [0, 1, 2, 4, 5, 6]


def test_keyframe_length_one_duplicates_zero():
    assert sh.keyframe_indices(np.array([42.0])) == [0, 0]


def test_actions_contract():
    norm = np.array([10.0, 80.6, 20.2])
    ts = np.array([0, 2, 4])
    actions = sh.actions_from_signal(norm, ts, fps=59.94, keyframe_reduction=True)
    # at = int(frame_idx / fps * 1000); pos = 100 - int(round(norm))
    assert actions == [
        {"at": 0, "pos": 90},
        {"at": int(2 / 59.94 * 1000), "pos": 100 - 81},
        {"at": int(4 / 59.94 * 1000), "pos": 100 - 20},
    ]


def test_actions_no_keyframe_reduction_emits_all():
    norm = np.array([10.0, 80.0, 20.0, 30.0])
    actions = sh.actions_from_signal(norm, np.arange(4), fps=30.0, keyframe_reduction=False)
    assert len(actions) == 4


def test_signal_chain_end_to_end_smoke(rng):
    dots, cuts, ts = make_case(rng, 400)
    actions, norm = sh.signal_chain(dots, cuts, ts, fps=30.0, detrend_win=60, norm_win=90)
    assert norm.shape == (400,)
    assert all(0 <= a["pos"] <= 100 for a in actions)
    assert all(actions[i]["at"] <= actions[i + 1]["at"] for i in range(len(actions) - 1))
