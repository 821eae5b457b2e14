"""C++ frame_pump runtime vs the Python decode path (must be bit-identical)."""

import numpy as np
import pytest

import reference_cv as ref
from funscript_flow_tpu.io import decode as iodec
from funscript_flow_tpu import runtime as native_rt


pytestmark = pytest.mark.skipif(
    not native_rt.available(), reason="libframe_pump.so not built"
)


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("nat")
    frames = ref.make_synthetic_frames(40, h=200, w=320, period=10, seed=4)
    p = str(d / "clip.mp4")
    vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 60, (320, 200))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()
    return p


def collect(source, n_total):
    out = []
    while True:
        batch = source.get_batch(16)
        if not batch:
            break
        out.extend(batch)
    source.close()
    return out


@pytest.mark.parametrize("vr", [False, True])
def test_native_matches_python_decode(clip, vr):
    meta = iodec.probe(clip)
    assert meta.step == 2  # 60 fps -> sample every 2nd frame
    py = list(iodec.sampled_frames(clip, meta, vr_mode=vr))
    nat = collect(native_rt.NativeFrameSource(clip, meta, vr_mode=vr), len(py))
    assert len(nat) == len(py)
    for a, b in zip(nat, py):
        np.testing.assert_array_equal(a, b)


def test_native_bad_file(tmp_path):
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"junk")
    meta = type("M", (), {"step": 1})()
    with pytest.raises(IOError):
        native_rt.NativeFrameSource(str(bad), meta)


def collect_np(source):
    out = []
    while True:
        batch = source.get_batch(16)
        if not batch:
            break
        out.extend(batch)
    source.close()
    return np.stack(out)


@pytest.mark.parametrize("vr", [False, True])
def test_fast_engine_close_to_exact(clip, vr):
    """The libav fast engine (lowres + luma-only + range LUT) is numerically
    faithful to the exact cv2 path: same frame count/alignment, small pixel
    deltas (the residual is swscale's fixed-point YUV->RGB approximation vs
    the analytic limited->full expansion — see frame_pump.cpp)."""
    meta = iodec.probe(clip)
    ex_src = native_rt.NativeFrameSource(clip, meta, vr_mode=vr, gray=True)
    fa_src = native_rt.NativeFrameSource(clip, meta, vr_mode=vr, gray=True,
                                         fast=True)
    assert not ex_src.is_fast
    assert fa_src.is_fast  # mp4v supports gray-only decode
    ex = collect_np(ex_src)
    fa = collect_np(fa_src)
    assert ex.shape == fa.shape
    d = ex.astype(np.int16) - fa.astype(np.int16)
    assert np.abs(d).mean() < 4.0
    assert np.abs(d).max() <= 16


def test_fast_engine_range_decode_bitwise(clip):
    """start_sample/max_samples on the fast engine (keyframe seek + pre-roll
    skip) yields exactly the frames of the corresponding full-read slice —
    the invariant host-parallel sharded decode relies on."""
    meta = iodec.probe(clip)
    full = collect_np(native_rt.NativeFrameSource(clip, meta, gray=True,
                                                  fast=True))
    part = collect_np(native_rt.NativeFrameSource(clip, meta, gray=True,
                                                  fast=True, start_sample=7,
                                                  max_samples=9))
    np.testing.assert_array_equal(part, full[7:16])


def test_fast_requires_gray():
    """fast=True with gray=False silently uses the exact engine (fast mode
    only produces the 1-channel analysis plane)."""
    import cv2
    import tempfile, os

    d = tempfile.mkdtemp()
    frames = ref.make_synthetic_frames(6, h=64, w=64, period=3, seed=1)
    p = os.path.join(d, "c.mp4")
    vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 64))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()
    meta = iodec.probe(p)
    src = native_rt.NativeFrameSource(p, meta, gray=False, fast=True)
    assert not src.is_fast
    assert src.get_batch(1)[0].shape == (256, 256, 3)
    src.close()


@pytest.fixture(scope="module")
def h264_clip(tmp_path_factory):
    """Long-GOP h264 with B-frames (the dominant real-library codec and the
    reference's decode hot spot, FunscriptFlow.pyw:177-189), written through
    the native encoder (encoder.cpp) — cv2 on TPU hosts has no h264 encoder.
    60 fps -> step 2, so the off-grid nonref-skip path is exercised."""
    if not native_rt.encoder_available("libx264"):
        pytest.skip("libx264 encoder not available")
    d = tmp_path_factory.mktemp("h264")
    frames = ref.make_synthetic_frames(240, h=200, w=320, period=12, seed=9)
    p = str(d / "clip264.mp4")
    with native_rt.VideoEncoder(p, 320, 200, 60.0, codec="libx264",
                                gop=250, bframes=3) as enc:
        for f in frames:
            enc.write(np.ascontiguousarray(f[..., ::-1]))  # RGB -> BGR
    return p


def test_h264_metadata_exact(h264_clip):
    """The encoder must write frame durations such that probes see the true
    fps (a missing last-frame duration reads 60fps * n/(n-1) and flips
    step=ceil(fps/30)) — and the pump's self-probe must agree."""
    meta = iodec.probe(h264_clip)
    assert meta.fps == 60.0
    assert meta.total_frames == 240
    assert meta.step == 2
    src = native_rt.NativeFrameSource(h264_clip, None, gray=True, fast=True)
    assert src.meta.fps == 60.0 and src.meta.step == 2
    src.close()


def test_h264_fast_engine_close_to_exact(h264_clip):
    """Long-GOP h264 through the fast engine (luma-only decode, grid-aware
    AVDISCARD_NONREF skipping, loop filter skipped on NONREF frames only)
    vs the exact cv2 engine. The residual is chroma's contribution to
    BGR2GRAY plus missing deblock on non-reference frames — neither can
    grow along the GOP (reference frames keep their loop filter, so
    prediction chains stay bit-exact)."""
    meta = iodec.probe(h264_clip)
    fa_src = native_rt.NativeFrameSource(h264_clip, meta, gray=True, fast=True)
    assert fa_src.is_fast
    fa = collect_np(fa_src)
    ex = collect_np(native_rt.NativeFrameSource(h264_clip, meta, gray=True))
    assert ex.shape == fa.shape == (120, 256, 256)
    d = ex.astype(np.int16) - fa.astype(np.int16)
    assert np.abs(d).mean() < 4.5
    assert np.abs(d).max() <= 48
    # no error accumulation along the GOP: the last quarter of the clip is
    # no worse than the first (all 240 source frames are one GOP)
    per_frame = np.abs(d).mean(axis=(1, 2))
    assert per_frame[90:].mean() < per_frame[:30].mean() + 1.0


def test_h264_range_decode_bitwise(h264_clip):
    """Keyframe seek + pre-roll + nonref-skip on h264 preserves the
    range-slice == full-read-slice invariant sharded decode relies on."""
    meta = iodec.probe(h264_clip)
    full = collect_np(native_rt.NativeFrameSource(h264_clip, meta, gray=True,
                                                  fast=True))
    part = collect_np(native_rt.NativeFrameSource(h264_clip, meta, gray=True,
                                                  fast=True, start_sample=41,
                                                  max_samples=30))
    np.testing.assert_array_equal(part, full[41:71])


def test_encoder_frame_roundtrip(h264_clip):
    """Frames decoded from the encoder's output must track the frames that
    went in (sanity: pts/dts ordering with bframes=3 survives the mux)."""
    import cv2

    frames = ref.make_synthetic_frames(240, h=200, w=320, period=12, seed=9)
    cap = cv2.VideoCapture(h264_clip)
    worst = 0.0
    for i in (0, 17, 100, 239):
        cap.set(cv2.CAP_PROP_POS_FRAMES, i)
        ok, got = cap.read()
        assert ok
        want = frames[i][..., ::-1]  # RGB -> BGR
        worst = max(worst, float(np.abs(
            got.astype(np.int16) - want.astype(np.int16)).mean()))
    cap.release()
    assert worst < 8.0  # lossy encode, but the right frame at the right index


@pytest.mark.parametrize("vr", [False, True])
def test_direct_slabs_match_classic_queue(clip, vr):
    """The direct-write slab path (fp_open_v3 + fp_submit_slab/fp_wait_slab:
    decode preprocesses straight into numpy memory) must be bitwise
    identical to the classic bounded-queue path, across odd batch sizes
    that straddle slab boundaries."""
    meta = iodec.probe(clip)
    classic = native_rt.NativeFrameSource(clip, meta, vr_mode=vr, gray=True,
                                          direct=False)
    direct = native_rt.NativeFrameSource(clip, meta, vr_mode=vr, gray=True,
                                         direct=True)
    a, b = [], []
    for src, acc in ((classic, a), (direct, b)):
        while True:
            batch = src.get_batch(7)  # odd size: exercises slab straddling
            if not batch:
                break
            acc.extend(batch)
        src.close()
    assert len(a) == len(b) == len(meta.sampled_indices)
    np.testing.assert_array_equal(np.stack(a), np.stack(b))


def test_direct_slabs_partial_tail_and_exact_fit(tmp_path):
    """Stream lengths exactly at and just past a slab boundary terminate
    cleanly (partial tail slab, empty final slab)."""
    import cv2

    n_slab = native_rt.NativeFrameSource.SLAB_FRAMES
    # 30 fps -> step 1: sample count == frame count; make one clip exactly
    # slab-sized and one a single frame longer
    for n in (n_slab, n_slab + 1):
        frames = ref.make_synthetic_frames(n, h=64, w=64, period=9, seed=2)
        p = str(tmp_path / f"c{n}.mp4")
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 64))
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
        meta = iodec.probe(p)
        assert meta.step == 1
        src = native_rt.NativeFrameSource(p, meta, gray=True, direct=True)
        got = collect(src, n)
        assert len(got) == n, (n, len(got))


def test_native_cancel(clip):
    meta = iodec.probe(clip)
    flag = {"c": False}
    src = native_rt.NativeFrameSource(clip, meta, cancel_flag=lambda: flag["c"])
    assert len(src.get_batch(4)) == 4
    flag["c"] = True
    assert src.get_batch(4) == []
    src.close()


def test_self_probe_meta_matches_cv2_probe(clip):
    """meta=None lets the pump self-probe (single container open): the
    reported VideoMeta and the decoded frames must match the cv2-probe
    path exactly (the 60 fps clip also exercises step=2 self-computation)."""
    want_meta = iodec.probe(clip)
    src = native_rt.NativeFrameSource(clip, None, gray=True)
    got_meta = src.meta
    assert got_meta.fps == want_meta.fps
    assert got_meta.total_frames == want_meta.total_frames
    assert (got_meta.width, got_meta.height) == (want_meta.width, want_meta.height)
    assert got_meta.step == want_meta.step == 2
    got = collect(src, None)

    ref_src = native_rt.NativeFrameSource(clip, want_meta, gray=True)
    want = collect(ref_src, None)
    assert len(got) == len(want) == len(want_meta.sampled_indices)
    np.testing.assert_array_equal(np.stack(got), np.stack(want))


@pytest.fixture(scope="module")
def hevc_clip(tmp_path_factory):
    """Long-GOP HEVC — the dominant VR-library codec. Same shape as the
    h264 fixture so the grid-skip (step 2) path is exercised; encoded via
    libx265 ultrafast (encoder.cpp)."""
    if not native_rt.encoder_available("libx265"):
        pytest.skip("libx265 encoder not available")
    d = tmp_path_factory.mktemp("hevc")
    frames = ref.make_synthetic_frames(240, h=200, w=320, period=12, seed=9)
    p = str(d / "clip265.mp4")
    with native_rt.VideoEncoder(p, 320, 200, 60.0, codec="libx265",
                                gop=250, bframes=3) as enc:
        for f in frames:
            enc.write(np.ascontiguousarray(f[..., ::-1]))  # RGB -> BGR
    return p


def test_hevc_fast_engine_close_to_exact(hevc_clip):
    """HEVC through the fast engine (luma-only, grid-aware NONREF skip,
    deblock+SAO skipped on non-reference frames only) vs the exact cv2
    engine — same bar as h264: bounded residual, no growth along the GOP
    (reference frames keep their in-loop filters, so prediction chains
    stay bit-exact)."""
    meta = iodec.probe(hevc_clip)
    assert meta.fps == 60.0 and meta.step == 2
    fa_src = native_rt.NativeFrameSource(hevc_clip, meta, gray=True, fast=True)
    assert fa_src.is_fast
    fa = collect_np(fa_src)
    ex = collect_np(native_rt.NativeFrameSource(hevc_clip, meta, gray=True))
    assert ex.shape == fa.shape == (120, 256, 256)
    d = ex.astype(np.int16) - fa.astype(np.int16)
    assert np.abs(d).mean() < 4.5
    assert np.abs(d).max() <= 48
    per_frame = np.abs(d).mean(axis=(1, 2))
    assert per_frame[90:].mean() < per_frame[:30].mean() + 1.0


def test_hevc_range_decode_bitwise(hevc_clip):
    """Keyframe seek + pre-roll + nonref-skip on HEVC preserves the
    range-slice == full-read-slice invariant sharded decode relies on."""
    meta = iodec.probe(hevc_clip)
    full = collect_np(native_rt.NativeFrameSource(hevc_clip, meta, gray=True,
                                                  fast=True))
    part = collect_np(native_rt.NativeFrameSource(hevc_clip, meta, gray=True,
                                                  fast=True, start_sample=37,
                                                  max_samples=30))
    np.testing.assert_array_equal(part, full[37:67])


# ---------------------------------------------------------------------------
# .webm codec family (VP9 / AV1) — in the reference's extension whitelist
# (FunscriptFlow.pyw:28-29: .webm) but a different codec lineage than the
# MPEG family: no B-frames, non-displayed altref frames carry the pts of
# nothing (they must not shift frame indexing), and the WebM container has
# no nb_frames so total_frames comes from the duration estimate.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module", params=["libvpx-vp9", "libaom-av1"],
                ids=["vp9", "av1"])
def webm_clip(tmp_path_factory, request):
    codec = request.param
    if not native_rt.encoder_available(codec):
        pytest.skip(f"{codec} encoder not available")
    d = tmp_path_factory.mktemp("webm")
    frames = ref.make_synthetic_frames(240, h=200, w=320, period=12, seed=11)
    p = str(d / f"clip_{codec.replace('-', '_')}.webm")
    with native_rt.VideoEncoder(p, 320, 200, 60.0, codec=codec,
                                gop=250, bframes=0) as enc:
        for f in frames:
            enc.write(np.ascontiguousarray(f[..., ::-1]))  # RGB -> BGR
    return p


def test_webm_fast_engine_close_to_exact(webm_clip):
    """VP9/AV1 through the fast engine (luma-only decode; grid-skip inert —
    every frame is a reference in realtime-encoded streams) vs the exact
    cv2 engine: bounded residual, no drift along the GOP."""
    meta = iodec.probe(webm_clip)
    assert meta.fps == 60.0 and meta.step == 2
    fa_src = native_rt.NativeFrameSource(webm_clip, meta, gray=True, fast=True)
    assert fa_src.is_fast
    fa = collect_np(fa_src)
    ex = collect_np(native_rt.NativeFrameSource(webm_clip, meta, gray=True))
    assert ex.shape == fa.shape == (120, 256, 256)
    d = ex.astype(np.int16) - fa.astype(np.int16)
    assert np.abs(d).mean() < 4.5
    assert np.abs(d).max() <= 48
    per_frame = np.abs(d).mean(axis=(1, 2))
    assert per_frame[90:].mean() < per_frame[:30].mean() + 1.0


def test_webm_range_decode_bitwise(webm_clip):
    """Keyframe seek + pre-roll on WebM (duration-derived total_frames,
    granule timestamps) preserves range-slice == full-read-slice."""
    meta = iodec.probe(webm_clip)
    full = collect_np(native_rt.NativeFrameSource(webm_clip, meta, gray=True,
                                                  fast=True))
    part = collect_np(native_rt.NativeFrameSource(webm_clip, meta, gray=True,
                                                  fast=True, start_sample=37,
                                                  max_samples=30))
    np.testing.assert_array_equal(part, full[37:67])


# ---------------------------------------------------------------------------
# Container/codec matrix — the rest of the reference's extension whitelist
# (FunscriptFlow.pyw:28-29: .avi .mov .mkv .m4v .wmv .flv .mpg .mpeg .ts;
# .mp4/.webm families covered above). Each container carries its era's
# dominant codec; wmv2/flv1/mpeg2 are mpegvideo-family, so the fast engine's
# genuine lowres (half-res) decode path runs, while mov/mkv take the h264
# path. .mpeg is the same MPEG-PS demuxer as .mpg and is not repeated.
# ---------------------------------------------------------------------------

_CONTAINER_MATRIX = [
    ("avi", "mpeg4", 2),
    ("mov", "libx264", 3),
    ("mkv", "libx264", 3),
    ("m4v", "mpeg4", 2),
    ("wmv", "wmv2", 0),       # ASF container; WMV8 has no B-frames
    ("flv", "flv", 0),        # FLV1/Sorenson H.263; no B-frames
    ("mpg", "mpeg2video", 2),  # MPEG-PS
    ("ts", "mpeg2video", 2),   # MPEG-TS (no global duration/frame count)
]


@pytest.fixture(scope="module", params=_CONTAINER_MATRIX,
                ids=[f"{e}_{c}" for e, c, _ in _CONTAINER_MATRIX])
def matrix_clip(tmp_path_factory, request):
    ext, codec, bframes = request.param
    if not native_rt.encoder_available(codec, ext=ext):
        pytest.skip(f"{codec} encoder not available")
    d = tmp_path_factory.mktemp("matrix")
    frames = ref.make_synthetic_frames(120, h=200, w=320, period=12, seed=13)
    p = str(d / f"clip_{codec}.{ext}")
    with native_rt.VideoEncoder(p, 320, 200, 30.0, codec=codec,
                                gop=25, bframes=bframes) as enc:
        for f in frames:
            enc.write(np.ascontiguousarray(f[..., ::-1]))  # RGB -> BGR
    return p


def test_matrix_probe_exact(matrix_clip):
    """Every whitelisted container probes the right frame count and rate —
    incl. matroska (ms-quantized timestamps need the DefaultDuration the
    encoder now writes) and MPEG-TS (no container frame count at all).
    MPEG-PS has no per-stream frame count OR duration, so the count is a
    mux-timestamp estimate (cv2 reports the same 118 the reference would
    see) — exactness is required everywhere else."""
    meta = iodec.probe(matrix_clip)
    assert meta.fps == 30.0
    assert meta.step == 1
    if matrix_clip.endswith(".mpg"):
        assert 117 <= meta.total_frames <= 121
    else:
        assert meta.total_frames == 120


def test_matrix_fast_engine_close_to_exact(matrix_clip):
    """Fast engine vs exact engine across the container matrix: same frame
    count/alignment, bounded residual (lowres half-res decode for the
    mpegvideo-family codecs; luma-only everywhere)."""
    meta = iodec.probe(matrix_clip)
    fa_src = native_rt.NativeFrameSource(matrix_clip, meta, gray=True,
                                         fast=True)
    assert fa_src.is_fast
    fa = collect_np(fa_src)
    ex = collect_np(native_rt.NativeFrameSource(matrix_clip, meta, gray=True))
    n = len(meta.sampled_indices)  # PS: duration-estimated, may be < 120
    assert ex.shape == fa.shape == (n, 256, 256)
    d = ex.astype(np.int16) - fa.astype(np.int16)
    assert np.abs(d).mean() < 4.5
    assert np.abs(d).max() <= 48


def test_matrix_range_decode_bitwise(matrix_clip):
    """Keyframe seek + pre-roll preserves range-slice == full-read-slice in
    every container (sharded decode's invariant), incl. PS/TS timestamp
    discontinuity handling and ASF's packet-level seeking."""
    meta = iodec.probe(matrix_clip)
    full = collect_np(native_rt.NativeFrameSource(matrix_clip, meta,
                                                  gray=True, fast=True))
    part = collect_np(native_rt.NativeFrameSource(matrix_clip, meta,
                                                  gray=True, fast=True,
                                                  start_sample=37,
                                                  max_samples=30))
    np.testing.assert_array_equal(part, full[37:67])


# ---------------------------------------------------------------------------
# 10-bit content (yuv420p10): modern hevc/h264 libraries are commonly 10-bit.
# The exact engine (cv2) converts via swscale; the fast engine narrows the
# uint16 luma plane to 8 bits with rounding before the shared LUT+resize
# path (frame_pump.cpp::to_gray). Skipped where the distro x264/x265 build
# is 8-bit-only.
# ---------------------------------------------------------------------------

_TENBIT = [("libx264", "yuv420p10le"), ("libx265", "yuv420p10le")]


@pytest.fixture(scope="module", params=_TENBIT, ids=[c for c, _ in _TENBIT])
def tenbit_clip(tmp_path_factory, request):
    codec, pf = request.param
    if not native_rt.encoder_available(codec, pix_fmt=pf):
        pytest.skip(f"{codec} has no {pf} support in this build")
    d = tmp_path_factory.mktemp("tenbit")
    frames = ref.make_synthetic_frames(120, h=200, w=320, period=12, seed=3)
    p = str(d / f"ten_{codec}.mp4")
    with native_rt.VideoEncoder(p, 320, 200, 30.0, codec=codec, gop=25,
                                bframes=2, pix_fmt=pf) as enc:
        for f in frames:
            enc.write(np.ascontiguousarray(f[..., ::-1]))
    return p


def test_tenbit_fast_engine_close_to_exact(tenbit_clip):
    """Fast engine on 10-bit content: same alignment and the same residual
    envelope as the 8-bit fast path (not garbage from reading uint16 luma
    bytes as uint8 — the failure this coverage pins down)."""
    meta = iodec.probe(tenbit_clip)
    assert meta.total_frames == 120 and meta.step == 1
    fa_src = native_rt.NativeFrameSource(tenbit_clip, meta, gray=True,
                                         fast=True)
    assert fa_src.is_fast
    fa = collect_np(fa_src)
    ex = collect_np(native_rt.NativeFrameSource(tenbit_clip, meta, gray=True))
    assert ex.shape == fa.shape == (120, 256, 256)
    d = ex.astype(np.int16) - fa.astype(np.int16)
    assert np.abs(d).mean() < 3.0
    assert np.abs(d).max() <= 24


def test_tenbit_range_decode_bitwise(tenbit_clip):
    meta = iodec.probe(tenbit_clip)
    full = collect_np(native_rt.NativeFrameSource(tenbit_clip, meta,
                                                  gray=True, fast=True))
    part = collect_np(native_rt.NativeFrameSource(tenbit_clip, meta,
                                                  gray=True, fast=True,
                                                  start_sample=37,
                                                  max_samples=30))
    np.testing.assert_array_equal(part, full[37:67])


# ---------------------------------------------------------------------------
# Rotation metadata (phone recordings): a display matrix on the stream that
# every player — and cv2 >= 4.7 auto-orientation, i.e. the reference's
# decoder — applies before display. Both pump engines must match: the fast
# engine rotates the luma plane itself; the exact engine disables
# VideoCapture auto-orientation (WRONG direction on system OpenCV 4.6,
# opencv#21946, and version-inconsistent META convention) and applies the
# libav-read rotation in preprocess.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module", params=[90, 180, 270],
                ids=["rot90", "rot180", "rot270"])
def rotated_clip(tmp_path_factory, request):
    rot = request.param
    if not native_rt.encoder_available("libx264"):
        pytest.skip("libx264 encoder not available")
    d = tmp_path_factory.mktemp("rot")
    frames = ref.make_synthetic_frames(90, h=200, w=320, period=12, seed=5)
    p = str(d / f"rot{rot}.mp4")
    with native_rt.VideoEncoder(p, 320, 200, 30.0, codec="libx264", gop=25,
                                bframes=2, rotation=rot) as enc:
        for f in frames:
            enc.write(np.ascontiguousarray(f[..., ::-1]))
    return rot, p


def test_rotated_probe_display_dims(rotated_clip):
    """Probe and pump self-probe report DISPLAY orientation dims."""
    rot, p = rotated_clip
    meta = iodec.probe(p)
    want = (200, 320) if rot in (90, 270) else (320, 200)
    assert (meta.width, meta.height) == want
    src = native_rt.NativeFrameSource(p, None, gray=True, fast=True)
    pm = src.meta
    src.close()
    assert (pm.width, pm.height) == want


def test_rotated_exact_engine_matches_python(rotated_clip):
    """Pump exact engine == Python path (cv2 5.x correct auto-orientation)
    bit-for-bit on rotated content."""
    rot, p = rotated_clip
    meta = iodec.probe(p)
    ex = collect_np(native_rt.NativeFrameSource(p, meta, gray=True))
    py = np.stack(list(iodec.sampled_frames(p, meta, gray=True)))
    np.testing.assert_array_equal(ex, py)


def test_rotated_fast_engine_close_to_exact(rotated_clip):
    """Fast engine applies the same display rotation — wrong direction (the
    OpenCV 4.6 bug) or no rotation would blow these bounds by an order of
    magnitude."""
    rot, p = rotated_clip
    meta = iodec.probe(p)
    fa_src = native_rt.NativeFrameSource(p, meta, gray=True, fast=True)
    assert fa_src.is_fast
    fa = collect_np(fa_src)
    ex = collect_np(native_rt.NativeFrameSource(p, meta, gray=True))
    assert fa.shape == ex.shape == (90, 256, 256)
    d = ex.astype(np.int16) - fa.astype(np.int16)
    assert np.abs(d).mean() < 3.0
    assert np.abs(d).max() <= 24


def test_rotated_marker_direction(tmp_path):
    """Direction pin: a block stored top-left with rotate-tag 90 must
    display top-RIGHT (clockwise), in both engines — catches a
    clockwise/counterclockwise flip that engine-vs-engine comparison alone
    would miss if both flipped together."""
    if not native_rt.encoder_available("libx264"):
        pytest.skip("libx264 encoder not available")
    frame = np.zeros((200, 320, 3), np.uint8)
    frame[:40, :40] = 255
    p = str(tmp_path / "marker90.mp4")
    with native_rt.VideoEncoder(p, 320, 200, 30.0, codec="libx264", gop=10,
                                bframes=0, rotation=90) as enc:
        for _ in range(10):
            enc.write(frame)
    meta = iodec.probe(p)

    def corner(img):
        q = [img[:64, :64].mean(), img[:64, -64:].mean(),
             img[-64:, :64].mean(), img[-64:, -64:].mean()]
        return ["TL", "TR", "BL", "BR"][int(np.argmax(q))]

    for fast in (False, True):
        src = native_rt.NativeFrameSource(p, meta, gray=True, fast=fast)
        fr = np.array(src.get_batch(1)[0])
        src.close()
        assert corner(fr) == "TR", f"fast={fast}: wrong rotation direction"


def test_rotated_range_decode_bitwise(rotated_clip):
    rot, p = rotated_clip
    meta = iodec.probe(p)
    full = collect_np(native_rt.NativeFrameSource(p, meta, gray=True,
                                                  fast=True))
    part = collect_np(native_rt.NativeFrameSource(p, meta, gray=True,
                                                  fast=True,
                                                  start_sample=31,
                                                  max_samples=25))
    np.testing.assert_array_equal(part, full[31:56])


# ---------------------------------------------------------------------------
# VFR (variable frame rate) content — phone/stream captures drop frames and
# jitter timestamps. The fast engine samples by TIME slot (array position k
# = presentation index k*step): a gap holds the next frame for the missed
# slots; jitter collapsing two frames onto one slot drops the later one.
# cv2 (exact engine / reference) samples by decode count instead, which
# drifts after every stall — the engines legitimately differ per frame on
# VFR, but both must emit the full budget and the fast engine must keep its
# sharded-decode invariant.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def vfr_clip(tmp_path_factory):
    if not native_rt.encoder_available("libx264"):
        pytest.skip("libx264 encoder not available")
    d = tmp_path_factory.mktemp("vfr")
    frames = ref.make_synthetic_frames(120, h=200, w=320, period=12, seed=9)
    p = str(d / "vfr.mp4")
    with native_rt.VideoEncoder(p, 320, 200, 30.0, codec="libx264", gop=25,
                                bframes=2) as enc:
        t = 0
        for i, f in enumerate(frames):
            if i % 7 == 3:  # camera frame drop: timestamp gap, no frame
                t += 1
                continue
            enc.write(np.ascontiguousarray(f[..., ::-1]), pts=t)
            t += 1
    return p


def test_vfr_full_budget_both_engines(vfr_clip):
    """Both engines emit exactly the probed sample budget on VFR content —
    the fast engine fills timestamp-gap slots instead of shortening the
    stream (which would shift every later sample's timing)."""
    meta = iodec.probe(vfr_clip)
    assert meta.step == 1
    fa_src = native_rt.NativeFrameSource(vfr_clip, meta, gray=True, fast=True)
    assert fa_src.is_fast
    fa = collect_np(fa_src)
    ex = collect_np(native_rt.NativeFrameSource(vfr_clip, meta, gray=True))
    assert len(fa) == len(ex) == meta.total_frames


def test_vfr_range_decode_bitwise(vfr_clip):
    """Sharded decode's range-slice == full-read-slice invariant holds on
    VFR: slot indexing is derived from timestamps, identical whether the
    slot is reached sequentially or via keyframe seek + pre-roll."""
    meta = iodec.probe(vfr_clip)
    full = collect_np(native_rt.NativeFrameSource(vfr_clip, meta, gray=True,
                                                  fast=True))
    part = collect_np(native_rt.NativeFrameSource(vfr_clip, meta, gray=True,
                                                  fast=True, start_sample=31,
                                                  max_samples=20))
    np.testing.assert_array_equal(part, full[31:51])


def test_cover_art_stream_not_selected(tmp_path):
    """Embedded cover art (an attached-picture mjpeg stream, here larger
    than the real video) must never be selected as the content stream — in
    the probe, the fast engine, or the exact engine. Real music-video /
    library files carry these; picking one decodes a single still instead
    of the video."""
    if not native_rt.encoder_available("libx264"):
        pytest.skip("libx264 encoder not available")
    import cv2

    frames = ref.make_synthetic_frames(60, h=200, w=320, period=12, seed=2)
    base = str(tmp_path / "base.mp4")
    with native_rt.VideoEncoder(base, 320, 200, 30.0, codec="libx264",
                                gop=25, bframes=2) as enc:
        for f in frames:
            enc.write(np.ascontiguousarray(f[..., ::-1]))
    cover = str(tmp_path / "cover.jpg")
    img = (np.mgrid[0:1024, 0:1024][0] % 256).astype(np.uint8)
    cv2.imwrite(cover, cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))
    dst = str(tmp_path / "with_cover.mkv")
    assert native_rt.add_cover_art(base, dst, cover, 1024, 1024)

    meta = iodec.probe(dst)
    assert (meta.width, meta.height) == (320, 200)
    assert meta.total_frames == 60

    fa_src = native_rt.NativeFrameSource(dst, None, gray=True, fast=True)
    pm = fa_src.meta
    assert (pm.width, pm.height) == (320, 200)
    assert pm.total_frames == 60
    fa = collect_np(fa_src)
    ex = collect_np(native_rt.NativeFrameSource(dst, meta, gray=True))
    assert fa.shape == ex.shape == (60, 256, 256)
    d = ex.astype(np.int16) - fa.astype(np.int16)
    assert np.abs(d).mean() < 4.5  # real video content, not the still


# ---------------------------------------------------------------------------
# Interlaced content (1080i-era broadcast/library material): x264 MBAFF and
# MPEG-2 interlaced DCT. Neither engine deinterlaces (cv2/the reference
# don't either — parity), but the decode paths differ from progressive
# (field-coded macroblocks, PAFF/MBAFF reference handling with the fast
# engine's AVDISCARD_NONREF skipping), so both engines must stay aligned.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module", params=[("libx264", "mp4"),
                                        ("mpeg2video", "mpg")],
                ids=["h264_mbaff", "mpeg2_ilace"])
def interlaced_clip(tmp_path_factory, request):
    codec, ext = request.param
    if not native_rt.encoder_available(codec, ext=ext):
        pytest.skip(f"{codec} encoder not available")
    d = tmp_path_factory.mktemp("ilace")
    frames = ref.make_synthetic_frames(90, h=288, w=352, period=12, seed=11)
    p = str(d / f"ilace.{ext}")
    with native_rt.VideoEncoder(p, 352, 288, 30.0, codec=codec, gop=25,
                                bframes=2, interlaced=True) as enc:
        for f in frames:
            enc.write(np.ascontiguousarray(f[..., ::-1]))
    return p


def test_interlaced_fast_engine_close_to_exact(interlaced_clip):
    meta = iodec.probe(interlaced_clip)
    fa_src = native_rt.NativeFrameSource(interlaced_clip, meta, gray=True,
                                         fast=True)
    assert fa_src.is_fast
    fa = collect_np(fa_src)
    ex = collect_np(native_rt.NativeFrameSource(interlaced_clip, meta,
                                                gray=True))
    assert fa.shape == ex.shape
    d = ex.astype(np.int16) - fa.astype(np.int16)
    assert np.abs(d).mean() < 4.5
    assert np.abs(d).max() <= 48


def test_interlaced_range_decode_bitwise(interlaced_clip):
    meta = iodec.probe(interlaced_clip)
    full = collect_np(native_rt.NativeFrameSource(interlaced_clip, meta,
                                                  gray=True, fast=True))
    part = collect_np(native_rt.NativeFrameSource(interlaced_clip, meta,
                                                  gray=True, fast=True,
                                                  start_sample=31,
                                                  max_samples=20))
    np.testing.assert_array_equal(part, full[31:51])


# ---------------------------------------------------------------------------
# >=6 MP loop-filter gate: 4K-class fast decode flips skip_loop_filter from
# NONREF to ALL (frame_pump.cpp LavDecoder::open; measured +10-20% decode on
# this class where decode is the 1-core bottleneck, residual still inside the
# fast envelope — NOTES_ROUND4).
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def uhd_clip(tmp_path_factory):
    """3840x1680 (6.45 MP, just over the gate) oscillating-zoom h264 clip —
    zoom content maximizes motion-compensated prediction churn, the
    adversarial case for deblock-off drift."""
    import cv2

    if not native_rt.encoder_available("libx264"):
        pytest.skip("libx264 encoder unavailable")
    d = tmp_path_factory.mktemp("uhd")
    p = str(d / "uhd.mp4")
    w, h, n = 3840, 1680, 72
    rng = np.random.default_rng(11)
    tex = cv2.GaussianBlur(
        (rng.random((h + 400, w + 400)) * 255).astype(np.float32), (0, 0), 4)
    with native_rt.VideoEncoder(p, w, h, 30.0, codec="libx264", gop=250,
                                bframes=3) as enc:
        for i in range(n):
            s = 1.0 + 0.12 * np.sin(2 * np.pi * i / 45.0)
            cw, ch = int(w / s), int(h / s)
            x0, y0 = (tex.shape[1] - cw) // 2, (tex.shape[0] - ch) // 2
            img = cv2.resize(tex[y0:y0 + ch, x0:x0 + cw], (w, h),
                             interpolation=cv2.INTER_LINEAR)
            enc.write(cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                                   cv2.COLOR_GRAY2BGR))
    return p


@pytest.mark.slow
def test_uhd_loop_filter_gate_engages(uhd_clip, clip, monkeypatch):
    """At >=6 MP the default fast decode differs from a forced
    FF_PUMP_SLF=nonref decode (proof ALL engaged), stays inside the fast
    envelope vs exact, and the gate does NOT engage below the threshold
    (the 320x200 fixture decodes identically under default and nonref)."""
    meta = iodec.probe(uhd_clip)

    monkeypatch.delenv("FF_PUMP_SLF", raising=False)
    default = collect_np(native_rt.NativeFrameSource(uhd_clip, meta,
                                                     gray=True, fast=True))
    monkeypatch.setenv("FF_PUMP_SLF", "nonref")
    nonref = collect_np(native_rt.NativeFrameSource(uhd_clip, meta,
                                                    gray=True, fast=True))
    monkeypatch.delenv("FF_PUMP_SLF", raising=False)
    assert default.shape == nonref.shape
    assert not np.array_equal(default, nonref)  # ALL actually in effect

    ex = collect_np(native_rt.NativeFrameSource(uhd_clip, meta, gray=True))
    d = np.abs(default.astype(np.int16) - ex.astype(np.int16))
    per_frame = d.reshape(len(d), -1).mean(axis=1)
    assert d.mean() < 2.5
    assert d.max() <= 16
    # drift stays bounded along the (single-GOP) clip
    assert per_frame[-10:].mean() < per_frame[:10].mean() + 0.6

    # below the gate: default == nonref bitwise (NONREF still the default)
    small_meta = iodec.probe(clip)
    small_def = collect_np(native_rt.NativeFrameSource(clip, small_meta,
                                                       gray=True, fast=True))
    monkeypatch.setenv("FF_PUMP_SLF", "nonref")
    small_nonref = collect_np(native_rt.NativeFrameSource(clip, small_meta,
                                                          gray=True,
                                                          fast=True))
    monkeypatch.delenv("FF_PUMP_SLF", raising=False)
    np.testing.assert_array_equal(small_def, small_nonref)
