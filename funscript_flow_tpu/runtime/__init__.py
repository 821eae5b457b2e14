"""Native (C++) host runtime: GIL-free decode + preprocess.

``NativeFrameSource`` mirrors ``io.decode.PrefetchingFrameSource`` but runs
the whole decode -> resize -> crop -> RGB chain on C++ threads
(frame_pump.cpp). Falls back gracefully when the shared library isn't built;
``build()`` compiles it with the system toolchain (auto-attempted once on
first use). Bit-identical to the Python path (same OpenCV calls — tested).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "build", "NativeFrameSource", "VideoEncoder"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libframe_pump.so")
_FRAME_SHAPE = (256, 256, 3)
_lib = None
_build_attempted = False
_lock = threading.Lock()


def build(quiet: bool = True) -> bool:
    """Compile libframe_pump.so; returns success."""
    try:
        res = subprocess.run(
            ["make", "-C", _DIR],
            capture_output=quiet,
            timeout=300,
        )
        return res.returncode == 0 and os.path.exists(_SO)
    except Exception:
        return False


def _load():
    global _lib, _build_attempted
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) and not _build_attempted:
            _build_attempted = True
            build()
        if not os.path.exists(_SO):
            return None
        try:
            _lib = _bind(ctypes.CDLL(_SO))
        except AttributeError:
            # stale .so from an older source revision (symbol missing): make
            # is timestamp-based so a rebuild is cheap and picks up the
            # current ABI; report unavailable rather than raise if it fails
            _lib = None
            if not _build_attempted:
                _build_attempted = True
                if build():
                    try:
                        _lib = _bind(ctypes.CDLL(_SO))
                    except AttributeError:
                        _lib = None
        return _lib


def _bind(lib):
    """Declare the C ABI; raises AttributeError if the .so predates it."""
    lib.fp_open.restype = ctypes.c_void_p
    lib.fp_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fp_open_range.restype = ctypes.c_void_p
    lib.fp_open_range.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_longlong,
                                  ctypes.c_longlong, ctypes.c_int]
    lib.fp_open_v2.restype = ctypes.c_void_p
    lib.fp_open_v2.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_longlong,
                               ctypes.c_longlong, ctypes.c_int, ctypes.c_int]
    lib.fp_open_v3.restype = ctypes.c_void_p
    lib.fp_open_v3.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_longlong,
                               ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int]
    lib.fp_submit_slab.restype = ctypes.c_int
    lib.fp_submit_slab.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_int]
    lib.fp_wait_slab.restype = ctypes.c_longlong
    lib.fp_wait_slab.argtypes = [ctypes.c_void_p]
    lib.fp_is_fast.restype = ctypes.c_int
    lib.fp_is_fast.argtypes = [ctypes.c_void_p]
    lib.fp_step.restype = ctypes.c_int
    lib.fp_step.argtypes = [ctypes.c_void_p]
    lib.fp_meta.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
                            ctypes.POINTER(ctypes.c_longlong),
                            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.fp_next_batch.restype = ctypes.c_int
    lib.fp_next_batch.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.fp_cancel.argtypes = [ctypes.c_void_p]
    lib.fp_close.argtypes = [ctypes.c_void_p]
    lib.fe_open.restype = ctypes.c_void_p
    lib.fe_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                            ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
                            ctypes.c_int, ctypes.c_int]
    lib.fe_open_fmt.restype = ctypes.c_void_p
    lib.fe_open_fmt.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
                                ctypes.c_int, ctypes.c_int, ctypes.c_char_p]
    lib.fe_open_rot.restype = ctypes.c_void_p
    lib.fe_open_rot.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
                                ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
                                ctypes.c_int]
    lib.fe_open_ilace.restype = ctypes.c_void_p
    lib.fe_open_ilace.argtypes = lib.fe_open_rot.argtypes
    lib.fe_write.restype = ctypes.c_int
    lib.fe_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.fe_write_at.restype = ctypes.c_int
    lib.fe_write_at.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_longlong]
    lib.fe_close.restype = ctypes.c_longlong
    lib.fe_close.argtypes = [ctypes.c_void_p]
    lib.fe_add_cover.restype = ctypes.c_int
    lib.fe_add_cover.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                 ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    return lib


def add_cover_art(src: str, dst: str, jpeg: str, w: int, h: int) -> bool:
    """Remux ``src`` into ``dst`` with ``jpeg`` as an attached-picture
    stream (embedded cover art) — fixture machinery for the
    stream-selection regression tests."""
    lib = _load()
    if lib is None:
        return False
    return bool(lib.fe_add_cover(src.encode(), dst.encode(), jpeg.encode(),
                                 int(w), int(h)))


def available() -> bool:
    return _load() is not None


class NativeFrameSource:
    """Drop-in for io.decode.PrefetchingFrameSource backed by frame_pump."""

    #: frames per direct-write slab (two in flight = the decode-ahead bound)
    SLAB_FRAMES = 256

    def __init__(self, path: str, meta=None, vr_mode: bool = False,
                 depth: int = 512, cancel_flag=None,
                 start_sample: int = 0, max_samples: int = -1,
                 gray: bool = False, fast: bool = False,
                 direct: bool | None = None):
        """``meta=None`` self-probes: the pump computes the sampling step
        from the container's fps at open (same ceil(fps/30) formula as
        VideoMeta.step) and exposes the probed metadata as ``.meta`` — one
        container open instead of a cv2 probe followed by a pump open
        (~0.1 s off the per-clip critical path).

        ``fast`` selects the libav lowres+gray-only engine (gray output
        only); best-effort — the pump falls back to the exact OpenCV
        engine when the codec rejects it (check ``is_fast``).

        ``direct`` (default on; ``FF_TPU_NO_DIRECT=1`` or False disables)
        uses direct-write slabs: the decode thread preprocesses straight
        into numpy-owned buffers, eliminating the pooled intermediate frame
        and the per-frame memcpy of the classic bounded-queue path. Frames
        returned by ``get_batch`` are then views into those slabs.
        """
        lib = _load()
        if lib is None:
            raise RuntimeError("libframe_pump.so not available (build failed)")
        self._lib = lib
        self._shape = _FRAME_SHAPE[:2] if gray else _FRAME_SHAPE
        if direct is None:
            direct = not os.environ.get("FF_TPU_NO_DIRECT")
        self._direct = bool(direct)
        step = 0 if meta is None else int(meta.step)
        self._h = lib.fp_open_v3(path.encode(), int(vr_mode), step,
                                 int(depth), int(start_sample),
                                 int(max_samples), int(gray),
                                 int(fast and gray), int(self._direct))
        if not self._h:
            raise IOError(f"Cannot open video: {path}")
        self._cancel_flag = cancel_flag
        self._closed = False
        # direct mode: completed slabs pending consumption as (array, filled,
        # consumed); submitted-but-not-collected count; EOF latch
        self._ready: list = []
        self._in_flight = 0
        self._eof = False
        if self._direct:
            for _ in range(2):
                self._submit_slab()

    def _submit_slab(self):
        buf = np.empty((self.SLAB_FRAMES,) + self._shape, np.uint8)
        if self._lib.fp_submit_slab(
                self._h, buf.ctypes.data_as(ctypes.c_void_p),
                self.SLAB_FRAMES):
            # keep the array alive until collected: pair it with its slot
            self._pending_arrays = getattr(self, "_pending_arrays", [])
            self._pending_arrays.append(buf)
            self._in_flight += 1

    @property
    def meta(self):
        """VideoMeta probed by the pump's own decoder (no second open)."""
        from ..io.decode import VideoMeta

        fps = ctypes.c_double()
        tf = ctypes.c_longlong()
        w = ctypes.c_int()
        h = ctypes.c_int()
        self._lib.fp_meta(self._h, ctypes.byref(fps), ctypes.byref(tf),
                          ctypes.byref(w), ctypes.byref(h))
        meta = VideoMeta(total_frames=int(tf.value), fps=float(fps.value),
                         width=int(w.value), height=int(h.value))
        # the pump samples on its own step; a silent disagreement with the
        # VideoMeta formula would mis-time every emitted action
        pump_step = int(self._lib.fp_step(self._h))
        if pump_step != meta.step:
            raise RuntimeError(
                f"pump step {pump_step} != VideoMeta.step {meta.step} "
                f"(fps={meta.fps})")
        return meta

    @property
    def is_fast(self) -> bool:
        """True when the pump actually runs the libav fast engine."""
        return bool(self._lib.fp_is_fast(self._h))

    def get_batch(self, n: int) -> list:
        if self._cancel_flag is not None and self._cancel_flag():
            self._lib.fp_cancel(self._h)
            return []
        if not self._direct:
            buf = np.empty((n,) + self._shape, np.uint8)
            got = self._lib.fp_next_batch(
                self._h, buf.ctypes.data_as(ctypes.c_void_p), n)
            return list(buf[:got])

        out: list = []
        while len(out) < n:
            if self._ready:
                arr, filled, consumed = self._ready[0]
                take = min(filled - consumed, n - len(out))
                out.extend(arr[consumed:consumed + take])
                consumed += take
                if consumed >= filled:
                    self._ready.pop(0)
                else:
                    self._ready[0] = (arr, filled, consumed)
                continue
            if self._eof or self._in_flight == 0:
                break
            got = self._lib.fp_wait_slab(self._h)  # blocks (GIL released)
            if got == -2:  # cancelled
                return []
            arr = self._pending_arrays.pop(0)
            self._in_flight -= 1
            if got <= 0:
                self._eof = True
                if got < 0:
                    break
            filled = max(0, int(got))
            if filled < self.SLAB_FRAMES:
                self._eof = True  # partial slab = end of stream
            else:
                self._submit_slab()  # keep two slabs of decode-ahead
            if filled:
                self._ready.append((arr, filled, 0))
        return out

    def close(self):
        if not self._closed:
            self._closed = True
            self._lib.fp_close(self._h)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class VideoEncoder:
    """Native h264/mpeg4 clip writer (encoder.cpp) for bench + fixtures.

    The OpenCV build on TPU hosts has no h264 encoder, but real libraries
    are long-GOP h264 (the reference's decode hot spot,
    FunscriptFlow.pyw:177-189) — this writes representative content through
    the system libavcodec. ``codec='libx264'`` with a long GOP and B-frames
    by default; falls back are the caller's choice (``encoder_available``).
    """

    def __init__(self, path: str, w: int, h: int, fps: float,
                 codec: str = "libx264", gop: int = 250, bframes: int = 3,
                 pix_fmt: str = "", rotation: int = 0,
                 interlaced: bool = False):
        """``pix_fmt``: libav pixel format name; "" -> yuv420p. Use e.g.
        ``yuv420p10le`` for 10-bit fixtures (the encoder must support it —
        open fails otherwise rather than silently converting).

        ``rotation``: display-matrix metadata in degrees, the
        av_display_rotation_set convention — 90 means players (and cv2
        auto-orientation) rotate the stored frame 90° CLOCKWISE to display,
        as phone muxers write for portrait recordings."""
        lib = _load()
        if lib is None:
            raise RuntimeError("libframe_pump.so not available (build failed)")
        self._lib = lib
        from fractions import Fraction

        fr = Fraction(fps).limit_denominator(1001)
        opener = lib.fe_open_ilace if interlaced else lib.fe_open_rot
        self._h = opener(path.encode(), int(w), int(h),
                         fr.numerator, fr.denominator,
                         codec.encode(), int(gop), int(bframes),
                         pix_fmt.encode(), int(rotation))
        if not self._h:
            raise IOError(f"Cannot open encoder {codec} ({pix_fmt or 'yuv420p'}) for {path}")
        self._shape = (h, w, 3)

    def write(self, bgr: np.ndarray, pts: int | None = None) -> None:
        """One BGR24 uint8 frame of shape [h, w, 3] (C-contiguous).

        ``pts``: explicit timestamp in 1/fps ticks (strictly increasing) for
        VFR content; None = CFR at the frame index."""
        assert bgr.shape == self._shape and bgr.dtype == np.uint8
        bgr = np.ascontiguousarray(bgr)
        ok = (self._lib.fe_write(self._h, bgr.ctypes.data_as(ctypes.c_void_p))
              if pts is None else
              self._lib.fe_write_at(self._h,
                                    bgr.ctypes.data_as(ctypes.c_void_p),
                                    int(pts)))
        if not ok:
            raise IOError("encode failed")

    def close(self) -> int:
        if self._h:
            n = int(self._lib.fe_close(self._h))
            self._h = None
            return n
        return 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def encoder_available(codec: str = "libx264", ext: str = "mp4",
                      pix_fmt: str = "") -> bool:
    """True when the native encoder can open ``codec`` (probed cheaply).

    ``ext`` picks the probe container — codecs like wmv2/flv1 have no mp4
    codec tag, so probing them inside .mp4 would report False even when the
    encoder exists. ``pix_fmt`` probes e.g. 10-bit support ("yuv420p10le";
    distro x264/x265 builds vary)."""
    import tempfile

    lib = _load()
    if lib is None:
        return False
    with tempfile.TemporaryDirectory() as d:
        # bframes=0: availability must not hinge on B-frame support (wmv2
        # and flv1 reject max_b_frames > 0)
        h = lib.fe_open_fmt(os.path.join(d, f"p.{ext}").encode(), 64, 64,
                            30, 1, codec.encode(), 0, 0, pix_fmt.encode())
        if not h:
            return False
        lib.fe_close(h)
    return True
