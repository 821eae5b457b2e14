"""Embedded preview player core (gui.player) — headless coverage.

The tk shell cannot run on a displayless TPU host, so everything with
logic in it is display-independent by design and tested here: timeline
math / zoom / pan / interpolation (PreviewModel, mirroring the reference
visualizer FunscriptFlow.pyw:398-665 and value interpolation :2563-2592),
the playback clock, aspect fitting, PPM frame encoding, and the cv2-backed
frame reader's sequential/seek behavior.
"""

import cv2
import numpy as np
import pytest

from funscript_flow_tpu.gui.player import (
    FrameReader,
    PlaybackClock,
    PreviewModel,
    fit_box,
    frame_to_ppm,
)

ACTIONS = [
    {"at": 0, "pos": 10},
    {"at": 1000, "pos": 90},
    {"at": 2000, "pos": 30},
]


# -- fit_box / frame_to_ppm ---------------------------------------------------

def test_fit_box_aspect_preserving():
    assert fit_box(1920, 1080, 640, 640) == (640, 360)
    assert fit_box(1080, 1920, 640, 640) == (360, 640)
    assert fit_box(100, 100, 50, 200) == (50, 50)
    # degenerate inputs never return a zero dimension
    assert fit_box(0, 0, 640, 360) == (1, 1)


def test_frame_to_ppm_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    data = frame_to_ppm(rgb)
    header, _, payload = data.partition(b"\n")
    assert header.split() == [b"P6", b"5", b"7", b"255"]
    assert payload == rgb.tobytes()
    with pytest.raises(ValueError):
        frame_to_ppm(rgb[..., 0])  # not HxWx3


# -- PreviewModel -------------------------------------------------------------

def test_script_value_interpolation():
    m = PreviewModel(ACTIONS, 2000)
    assert m.script_value(-50) == 10  # clamp before first
    assert m.script_value(0) == 10
    assert m.script_value(500) == pytest.approx(50)  # midway 10 -> 90
    assert m.script_value(1000) == 90
    assert m.script_value(1500) == pytest.approx(60)  # midway 90 -> 30
    assert m.script_value(5000) == 30  # clamp after last
    assert PreviewModel([], 1000).script_value(500) == 50  # empty -> center


def test_view_transform_roundtrip():
    m = PreviewModel(ACTIONS, 2000)
    m.zoom, m.pan_ms = 4.0, 300.0
    for x in (0, 123.5, 640):
        assert m.ms_to_x(m.x_to_ms(x, 640), 640) == pytest.approx(x)


def test_zoom_anchoring_keeps_cursor_time_fixed():
    m = PreviewModel(ACTIONS, 2000)
    m.zoom_at(480, 640, 2.0)  # zoom in around x=480
    anchor = m.x_to_ms(480, 640)
    m.zoom_at(480, 640, 2.0)
    assert m.x_to_ms(480, 640) == pytest.approx(anchor)
    assert m.zoom == 4.0


def test_zoom_and_pan_clamped():
    m = PreviewModel(ACTIONS, 2000)
    m.zoom_at(0, 640, 0.01)  # zoom out far below 1x
    assert m.zoom == PreviewModel.MIN_ZOOM and m.pan_ms == 0.0
    for _ in range(40):
        m.zoom_at(640, 640, 2.0)
    assert m.zoom == PreviewModel.MAX_ZOOM
    m.pan_by(-(10 ** 6), 640)  # drag way past the end
    assert m.pan_ms == pytest.approx(m.duration_ms - m.view_span())
    m.pan_by(10 ** 6, 640)  # and way before the start
    assert m.pan_ms == 0.0


def test_follow_scrolls_playhead_into_view():
    m = PreviewModel(ACTIONS, 2000)
    m.zoom = 10.0  # 200 ms span
    m.pan_ms = 0.0
    assert m.follow(100) is False  # already visible: no move
    assert m.follow(1500) is True  # crossed the right edge: scroll
    assert m.pan_ms <= 1500 <= m.pan_ms + m.view_span()


def test_follow_never_snaps_a_user_pan_back():
    """A playhead LEFT of the view (the user panned ahead) must be left
    alone — only playback crossing the RIGHT edge scrolls (ADVICE r4: the
    old unconditional follow made drag-pan unusable away from the
    playhead)."""
    m = PreviewModel(ACTIONS, 2000)
    m.zoom = 10.0
    m.pan_ms = 1000.0  # user panned to [1000, 1200]
    assert m.follow(300) is False  # playhead far left: view untouched
    assert m.pan_ms == 1000.0
    assert m.follow(1100) is False  # visible: untouched
    assert m.pan_ms == 1000.0


def test_polyline_includes_view_neighbors():
    m = PreviewModel(ACTIONS, 2000)
    m.zoom = 4.0  # 500 ms span
    m.pan_ms = 750.0  # view [750, 1250]: only at=1000 inside
    pts = m.polyline(500, 120)
    assert len(pts) == 3  # neighbors at 0 and 2000 included for line entry
    xs = [p[0] for p in pts]
    assert xs == sorted(xs)
    # the in-view action lands at the right pixel
    x_mid, y_mid = pts[1]
    assert x_mid == pytest.approx((1000 - 750) / 500 * 500)
    assert y_mid == pytest.approx(PreviewModel.pos_to_y(90, 120))


def test_grid_columns_span_the_view():
    m = PreviewModel(ACTIONS, 2000)
    m.zoom, m.pan_ms = 2.0, 500.0
    cols = m.grid_columns(400, divisions=4)
    assert [c[0] for c in cols] == [0, 100, 200, 300, 400]
    assert cols[0][1] == pytest.approx(500) and cols[-1][1] == pytest.approx(1500)


def test_unsorted_actions_are_sorted():
    m = PreviewModel([{"at": 500, "pos": 0}, {"at": 100, "pos": 100}], 1000)
    assert [a["at"] for a in m.actions] == [100, 500]
    assert m.script_value(300) == pytest.approx(50)


# -- PlaybackClock ------------------------------------------------------------

class FakeNow:
    def __init__(self):
        self.t = 100.0

    def __call__(self):
        return self.t


def test_clock_play_pause_seek():
    now = FakeNow()
    c = PlaybackClock(10_000, now=now)
    assert not c.playing and c.position_ms() == 0
    c.play()
    now.t += 1.5
    assert c.position_ms() == pytest.approx(1500)
    c.pause()
    now.t += 9
    assert c.position_ms() == pytest.approx(1500)  # frozen while paused
    c.seek(4000)
    c.play()
    now.t += 0.5
    assert c.position_ms() == pytest.approx(4500)


def test_clock_auto_pauses_at_end_and_replays():
    now = FakeNow()
    c = PlaybackClock(1000, now=now)
    c.play()
    now.t += 5
    assert c.position_ms() == 1000
    assert not c.playing  # auto-paused at EOF
    c.play()  # replay restarts from 0
    now.t += 0.2
    assert c.position_ms() == pytest.approx(200)


def test_clock_seek_clamps():
    c = PlaybackClock(1000, now=FakeNow())
    c.seek(-50)
    assert c.position_ms() == 0
    c.seek(99_999)
    assert c.position_ms() == 1000


def test_clock_unknown_duration_runs_unclamped():
    """duration <= 0 = unknown (live/odd containers reporting no frame
    count, ADVICE r4): the clock must keep advancing instead of
    auto-pausing at position 0."""
    now = FakeNow()
    c = PlaybackClock(0, now=now)
    c.play()
    now.t += 12.5
    assert c.playing  # no auto-pause without a known end
    assert c.position_ms() == pytest.approx(12_500)
    c.seek(60_000)  # seeks don't clamp either
    assert c.position_ms() == pytest.approx(60_000)
    c.pause()
    assert c.position_ms() == pytest.approx(60_000)


# -- FrameReader --------------------------------------------------------------

@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    """30-frame 64x48 mp4v clip whose frame index is encoded in the red
    channel (index * 8), so reads can be identity-checked."""
    p = tmp_path_factory.mktemp("player") / "clip.mp4"
    vw = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for i in range(30):
        f = np.zeros((48, 64, 3), np.uint8)
        f[..., 2] = i * 8  # BGR red channel
        vw.write(f)
    vw.release()
    return str(p)


def _red_level(rgb):
    return int(np.round(rgb[..., 0].mean() / 8))


def test_frame_reader_probe_and_reads(clip):
    r = FrameReader(clip)
    assert (r.width, r.height) == (64, 48)
    assert r.frame_count == 30 and r.fps == pytest.approx(30, rel=0.05)
    assert r.duration_ms == pytest.approx(1000, rel=0.05)
    f0 = r.frame_at(0)
    assert f0.shape == (48, 64, 3) and _red_level(f0) == 0
    # sequential playback path (no seek)
    assert _red_level(r.frame_at(34)) == 1
    assert _red_level(r.frame_at(200)) == 6
    # repeated query for the same frame returns the cache, not a new read
    assert r.frame_at(200) is r.frame_at(200)
    # a BACKWARD frame_at never repositions: newest decoded frame returned
    assert _red_level(r.frame_at(67)) == 6
    assert r.seeks == 0
    # going back is an explicit user seek
    r.seek_to(67)
    assert _red_level(r.frame_at(67)) == 2
    assert r.seeks == 1
    # forward within the decode budget: sequential, still no demux seek
    assert _red_level(r.frame_at(900)) == 27
    assert r.seeks == 1
    r.close()


def test_frame_reader_drops_instead_of_seeking(clip):
    """Linear playback that outruns decode shows the newest decoded frame
    and NEVER issues a demuxer seek (VERDICT r4 #4: the old policy's
    cap.set per lagging tick re-entered the GOP and guaranteed falling
    further behind)."""
    r = FrameReader(clip)
    r.BURN_BUDGET = 4  # simulate slow decode: 4 frames per tick max
    got = r.frame_at(800)  # clock far ahead (frame 24) on first tick
    assert got is not None and r.last_index == 3  # newest after one budget
    for expect in (7, 11, 15, 19, 23, 24, 24):
        r.frame_at(800)  # decode catches up tick by tick
        assert r.last_index == expect
    assert r.seeks == 0
    assert r.frames_decoded == 25
    r.close()


def test_frame_reader_user_seek_small_forward_stays_sequential(clip):
    r = FrameReader(clip)
    r.frame_at(0)
    r.seek_to(200)  # 6 frames ahead, inside the budget: no reposition
    assert r.seeks == 0
    assert _red_level(r.frame_at(200)) == 6
    r.seek_to(0)  # backward: must reposition
    assert r.seeks == 1
    assert _red_level(r.frame_at(0)) == 0
    r.close()


def test_frame_reader_eof_returns_last(clip):
    r = FrameReader(clip)
    last = r.frame_at(10_000)  # clamped to the final frame
    assert last is not None and _red_level(last) == 29
    r.close()


def test_scaled_frame_fits_box(clip):
    r = FrameReader(clip)
    rgb, w, h = r.scaled_frame_at(0, 32, 100)
    assert (w, h) == (32, 24) and rgb.shape == (24, 32, 3)
    r.close()


def test_frame_reader_missing_file(tmp_path):
    with pytest.raises(OSError):
        FrameReader(str(tmp_path / "nope.mp4"))


def test_sustained_linear_playback_issues_zero_seeks(clip):
    """Simulated 30 Hz tick loop over the whole clip: linear playback must
    complete with ZERO demuxer repositions whatever the decode/clock race
    (VERDICT r4 #4 done-criterion; the realtime frames-rendered/s number
    for the 20 s 1080p bench clip is measured in NOTES_ROUND5)."""
    r = FrameReader(clip)
    rendered = set()
    for tick in range(40):  # 33 ms ticks across the 1 s clip and past EOF
        got = r.frame_at(tick * 33.4)
        if got is not None:
            rendered.add(r.last_index)
    assert r.seeks == 0
    assert r.frames_decoded == 30  # each frame decoded exactly once
    assert max(rendered) == 29     # reached the final frame
    r.close()


def test_audio_sidecar_silent_without_player(monkeypatch, tmp_path):
    """No player binary on PATH -> available=False and every call is a
    no-op (clean silence on a sink-less TPU host)."""
    import shutil

    from funscript_flow_tpu.gui.player import AudioSidecar

    monkeypatch.setattr(shutil, "which", lambda name: None)
    a = AudioSidecar(str(tmp_path / "x.mp4"))
    assert not a.available
    a.start(1234.0)
    assert a.proc is None
    a.stop()  # idempotent


def test_audio_sidecar_spawns_and_terminates(tmp_path):
    """With a player binary present the sidecar spawns it positioned at the
    clock (-ss seconds) and terminates it on stop; a second start replaces
    the first process (seek-restart semantics)."""
    import time as _time

    from funscript_flow_tpu.gui.player import AudioSidecar

    stub = tmp_path / "fakeplay"
    log = tmp_path / "argv.log"
    stub.write_text(f"#!/bin/sh\necho \"$@\" >> {log}\nexec sleep 30\n")
    stub.chmod(0o755)

    def wait_lines(n):
        # the stub must get to log its argv before the next stop() SIGTERMs
        # it, or the assertion races the shell's startup
        for _ in range(100):
            if log.exists() and len(log.read_text().strip().splitlines()) >= n:
                return
            _time.sleep(0.05)
        raise AssertionError(f"stub never logged line {n}")

    a = AudioSidecar(str(tmp_path / "x.mp4"), player=str(stub))
    assert a.available
    a.start(2500.0)
    p1 = a.proc
    assert p1 is not None and p1.poll() is None
    wait_lines(1)
    a.start(7000.0)  # seek while playing: restart at the new position
    p2 = a.proc
    assert p2 is not p1
    wait_lines(2)
    a.stop()
    for _ in range(50):
        if p1.poll() is not None and p2.poll() is not None:
            break
        _time.sleep(0.05)
    assert p1.poll() is not None and p2.poll() is not None
    args = log.read_text().strip().splitlines()
    assert len(args) == 2
    assert "-ss 2.500" in args[0] and "-ss 7.000" in args[1]
    assert "-nodisp" in args[0] and "-vn" in args[0]


def test_open_preview_window_fallback_without_display(tmp_path):
    """An unopenable video returns None (the app then falls back to the
    browser page) before any tk object is created — so this holds even on
    a displayless TPU host."""
    from funscript_flow_tpu.gui.player import open_preview_window

    bogus = tmp_path / "not_a_video.mp4"
    bogus.write_bytes(b"plainly not a container")
    assert open_preview_window(None, str(bogus)) is None
