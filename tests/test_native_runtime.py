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


def test_native_cancel(clip):
    meta = iodec.probe(clip)
    flag = {"c": False}
    src = native_rt.NativeFrameSource(clip, meta, cancel_flag=lambda: flag["c"])
    assert len(src.get_batch(4)) == 4
    flag["c"] = True
    assert src.get_batch(4) == []
    src.close()
