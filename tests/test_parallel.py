"""Multichip sharding on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import pytest

import reference_cv as ref
from funscript_flow_tpu.models.pipeline import PipelineConfig, FlowAnalyzer
from funscript_flow_tpu.ops import signal_host as sh
from funscript_flow_tpu.parallel.mesh import make_mesh
from funscript_flow_tpu.parallel.dp import analyze_multichip
from funscript_flow_tpu.parallel.signal_sp import signal_chain_sharded


pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
    ),
    pytest.mark.slow,  # golden/e2e: minutes, not seconds
]


def test_dp_matches_single_device():
    frames = np.stack(ref.make_synthetic_frames(30, h=48, w=48, period=10, seed=9))
    cfg = PipelineConfig(pair_batch=4)
    mesh = make_mesh(8)
    got = analyze_multichip(frames, cfg, mesh)
    want = FlowAnalyzer(PipelineConfig(pair_batch=16)).analyze_video_pairs(frames)
    for k in ("dots", "centers", "mean_mag"):
        np.testing.assert_allclose(got[k], want[k], atol=1e-5, err_msg=k)
    np.testing.assert_array_equal(got["cuts"], want["cuts"])


def test_dp_video_shorter_than_mesh():
    frames = np.stack(ref.make_synthetic_frames(6, h=48, w=48, period=4, seed=1))
    mesh = make_mesh(8)
    got = analyze_multichip(frames, PipelineConfig(pair_batch=4), mesh)
    want = FlowAnalyzer(PipelineConfig(pair_batch=8)).analyze_video_pairs(frames)
    np.testing.assert_allclose(got["dots"], want["dots"], atol=1e-5)


@pytest.mark.parametrize("n,dwin,nwin", [(731, 60, 91), (512, 30, 45), (1000, 61, 90)])
def test_sp_signal_chain_matches_host(rng, n, dwin, nwin):
    dots = rng.normal(0, 3, n)
    cuts = rng.random(n) < 0.03
    mesh = make_mesh(8)
    norm, mask = signal_chain_sharded(dots, cuts, mesh, dwin, nwin)

    cum = sh.integrate_flow(dots, cuts)
    want = sh.rolling_normalize(sh.binomial_smooth(sh.detrend(cum, dwin)), nwin)
    np.testing.assert_allclose(norm, want, atol=0.5)
    want_idx = sorted(set(sh.keyframe_indices(want)))
    got_idx = list(np.nonzero(mask)[0])
    # float32 vs float64 can flip ties on near-flat stretches; demand 95% agreement
    agree = len(set(got_idx) & set(want_idx)) / max(len(want_idx), 1)
    assert agree > 0.95, f"keyframe agreement {agree}"


def test_sp_device_count_invariance(rng):
    n = 640
    dots = rng.normal(0, 2, n)
    cuts = rng.random(n) < 0.02
    outs = [
        signal_chain_sharded(dots, cuts, make_mesh(d), 40, 61)[0]
        for d in (2, 4, 8)
    ]
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-3)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-3)


def test_compute_actions_routes_to_sharded_chain(rng, monkeypatch):
    """Production SP wiring (VERDICT r2 #4): with an active multi-device
    mesh and a long clean signal, runner.compute_actions runs the
    distributed time-axis-sharded chain — and its funscript matches the
    exact host path within the device-path tolerance."""
    from funscript_flow_tpu import runner
    from funscript_flow_tpu.utils.params import Params

    n = 4096
    monkeypatch.setattr(runner, "AUTO_DEVICE_MIN_SAMPLES", 1024)
    dots = rng.normal(0, 3, n)
    cuts = rng.random(n) < 0.01
    ts = np.arange(n) * 2
    params = Params(signal_backend="auto")
    mesh = make_mesh(4)

    logs = []
    actions, norm = runner.compute_actions(
        dots, cuts, ts, 60.0, 30.0, params, logs.append, mesh=mesh)
    assert any("time-axis sharded" in ln for ln in logs), logs

    want_actions, want_norm = runner.compute_actions(
        dots, cuts, ts, 60.0, 30.0, Params(signal_backend="host"))
    np.testing.assert_allclose(norm, want_norm, atol=0.5)
    want_at = {a["at"]: a["pos"] for a in want_actions}
    got_at = {a["at"]: a["pos"] for a in actions}
    shared = set(want_at) & set(got_at)
    assert len(shared) / max(len(want_at), 1) > 0.95
    assert all(abs(want_at[t] - got_at[t]) <= 1 for t in shared)

    # without a mesh the same signal routes to the single-device chain
    logs2 = []
    runner.compute_actions(dots, cuts, ts, 60.0, 30.0, params, logs2.append)
    assert not any("sharded" in ln for ln in logs2)


def test_process_video_mesh_uses_sharded_signal_chain(rng, tmp_path,
                                                      monkeypatch):
    """End-to-end: a --mesh run on the virtual mesh routes the signal chain
    through the sharded path and still writes a funscript that matches the
    host-path output (done-criterion of VERDICT r2 #4)."""
    import cv2

    from funscript_flow_tpu import runner
    from funscript_flow_tpu.io.funscript import load_funscript
    from funscript_flow_tpu.utils.params import Params

    frames = ref.make_synthetic_frames(120, h=64, w=64, period=12, seed=3)
    clip = str(tmp_path / "clip.mp4")
    vw = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 64))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()

    monkeypatch.setattr(runner, "AUTO_DEVICE_MIN_SAMPLES", 64)
    outs = {}
    for label, params in [
        ("mesh", Params(overwrite=True, mesh=2, pair_batch=24,
                        decode_quality="exact")),
        ("host", Params(overwrite=True, pair_batch=24,
                        signal_backend="host", decode_quality="exact")),
    ]:
        logs = []
        err = runner.process_video(clip, params, logs.append)
        assert not err, logs
        outs[label] = load_funscript(clip.replace(".mp4", ".funscript"))
        if label == "mesh":
            assert any("time-axis sharded" in ln for ln in logs), logs

    got = outs["mesh"]["actions"]
    want = outs["host"]["actions"]
    got_at = {a["at"]: a["pos"] for a in got}
    want_at = {a["at"]: a["pos"] for a in want}
    shared = set(got_at) & set(want_at)
    assert len(shared) / max(len(want_at), 1) > 0.9
    assert all(abs(want_at[t] - got_at[t]) <= 1 for t in shared)


def test_graft_entry_dryrun():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out["dots"].shape == (16,)
    ge.dryrun_multichip(8)
