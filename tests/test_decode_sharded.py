"""Host-parallel sharded decode == sequential decode, bit for bit.

The ``threads`` knob (reference CLI :2644) maps to range-sharded sequential
decode (io.decode.ShardedFrameSource). Sharding must be invisible: same
frames, same order, for both the Python and native (frame_pump) decoders.
"""

import os

import cv2
import numpy as np
import pytest

from funscript_flow_tpu.io import decode as iodec


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("clips") / "shard_clip.mp4")
    w, h, fps, n = 160, 120, 30, 120
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    rng = np.random.default_rng(0)
    for i in range(n):
        img = (rng.random((h, w, 3)) * 40).astype(np.uint8)
        cv2.circle(img, (int(w / 2 + 30 * np.sin(i / 7)), h // 2), 18,
                   (255, 255, 255), -1)
        vw.write(img)
    vw.release()
    return path


def _drain(src, batch=17):
    out = []
    while True:
        got = src.get_batch(batch)
        if not got:
            break
        out.extend(got)
    src.close()
    return np.stack(out)


def _python_factory(path, meta):
    def factory(start, count, depth):
        return iodec.PrefetchingFrameSource(
            path, meta, depth=depth, start_sample=start, max_samples=count
        )
    return factory


@pytest.mark.parametrize("shards", [2, 3])
def test_sharded_python_decode_matches_sequential(clip, shards):
    meta = iodec.probe(clip)
    n = len(meta.sampled_indices)
    seq = _drain(iodec.PrefetchingFrameSource(clip, meta))
    shd = _drain(iodec.ShardedFrameSource(_python_factory(clip, meta), n, shards))
    assert seq.shape == shd.shape
    np.testing.assert_array_equal(seq, shd)


def test_sharded_range_seek_is_frame_accurate(clip):
    """A mid-stream shard must produce exactly the sequential frames."""
    meta = iodec.probe(clip)
    seq = _drain(iodec.PrefetchingFrameSource(clip, meta))
    part = _drain(iodec.PrefetchingFrameSource(clip, meta, start_sample=41,
                                               max_samples=20))
    np.testing.assert_array_equal(seq[41:61], part)


def test_sharded_native_decode_matches_sequential(clip):
    from funscript_flow_tpu import runtime as native_rt

    if not native_rt.available():
        pytest.skip("native runtime not built")
    meta = iodec.probe(clip)
    n = len(meta.sampled_indices)

    def factory(start, count, depth):
        return native_rt.NativeFrameSource(clip, meta, depth=depth,
                                           start_sample=start, max_samples=count)

    seq = _drain(native_rt.NativeFrameSource(clip, meta))
    shd = _drain(iodec.ShardedFrameSource(factory, n, 3))
    np.testing.assert_array_equal(seq, shd)


def test_shard_count_clamped_for_tiny_clips(clip):
    meta = iodec.probe(clip)
    n = len(meta.sampled_indices)  # 120
    # ~32 samples minimum per shard: 8 requested -> 120//32 = 3 granted
    src = iodec.ShardedFrameSource(_python_factory(clip, meta), n, 8)
    assert len(src._subs) == n // 32
    src.close()
    # a 2-shard request on the same clip really is 2 shards (not clamped to 1)
    src = iodec.ShardedFrameSource(_python_factory(clip, meta), n, 2)
    assert len(src._subs) == 2
    src.close()


def test_sharded_cancel_not_black_filled(clip):
    """A cancel makes every shard stop early; the gap-fill logic (which
    exists for genuinely short containers) must NOT mistake that for a
    short shard and fabricate black frames — under --checkpoint the
    fabricated pairs would be persisted, breaking bitwise resume."""
    meta = iodec.probe(clip)
    n = len(meta.sampled_indices)
    cancelled = {"v": False}

    def factory(start, count, depth):
        return iodec.PrefetchingFrameSource(
            clip, meta, depth=depth, start_sample=start, max_samples=count,
            cancel_flag=lambda: cancelled["v"],
        )

    src = iodec.ShardedFrameSource(factory, n, 2,
                                   cancel_flag=lambda: cancelled["v"])
    first = src.get_batch(10)
    assert len(first) == 10
    cancelled["v"] = True
    # drain: whatever still arrives must be real decoded frames, never the
    # all-black fill (the fixture has a bright circle in every frame)
    while True:
        got = src.get_batch(16)
        if not got:
            break
        assert all(f.max() > 0 for f in got)
    src.close()


def test_gray_decode_paths_bit_identical(clip):
    """gray=True decode (production) == cv2 gray of the RGB decode, for both
    the Python and native sources; and the device program yields identical
    results from gray vs RGB input."""
    meta = iodec.probe(clip)
    rgb = _drain(iodec.PrefetchingFrameSource(clip, meta))
    gray = _drain(iodec.PrefetchingFrameSource(clip, meta, gray=True))
    want = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in rgb])
    np.testing.assert_array_equal(gray, want)

    from funscript_flow_tpu import runtime as native_rt
    if native_rt.available():
        ngray = _drain(native_rt.NativeFrameSource(clip, meta, gray=True))
        np.testing.assert_array_equal(ngray, want)

    from funscript_flow_tpu.models.pipeline import PipelineConfig, flow_chunk_program
    import jax.numpy as jnp
    cfg = PipelineConfig(pair_batch=8)
    a = flow_chunk_program(jnp.asarray(rgb[:9]), jnp.int32(8), cfg)
    b = flow_chunk_program(jnp.asarray(gray[:9]), jnp.int32(8), cfg)
    for k in ("dots", "cuts", "mean_mag"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
