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


def test_graft_entry_dryrun():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out["dots"].shape == (16,)
    ge.dryrun_multichip(8)
