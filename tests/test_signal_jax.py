"""JAX device signal chain vs the host (NumPy float64) oracle.

Covers padded static shapes with traced valid length, all detrend branches,
cut resets, and the keyframe mask (SURVEY.md §4 golden-test strategy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from funscript_flow_tpu.ops import signal as sj
from funscript_flow_tpu.ops import signal_host as sh

pytestmark = pytest.mark.slow  # golden/e2e: minutes, not seconds


def pad(x, P, fill=0.0):
    out = np.full(P, fill, dtype=np.asarray(x).dtype)
    out[: len(x)] = x
    return out


def make_case(rng, n, cut_p=0.02, scale=3.0):
    dots = rng.normal(0, scale, n)
    cuts = rng.random(n) < cut_p
    return dots, cuts


@pytest.mark.parametrize("n,P", [(1, 8), (4, 8), (64, 64), (100, 128), (731, 1024)])
def test_integrate_matches_host(rng, n, P):
    dots, cuts = make_case(rng, n, cut_p=0.1)
    want = sh.integrate_flow(dots, cuts)
    got = np.asarray(
        sj.integrate_flow(
            jnp.asarray(pad(dots, P), jnp.float32), jnp.asarray(pad(cuts, P, False))
        )
    )[:n]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "n,P,win",
    [
        (3, 16, 20),    # < 5 branch (x1e6 quirk)
        (4, 8, 20),
        (12, 16, 20),   # single-window branch (5 <= n <= win)
        (20, 32, 20),   # boundary n == win
        (21, 32, 20),   # grid branch just past the boundary
        (100, 128, 30),
        (100, 100, 30),  # no padding
        (731, 1024, 60),
        (731, 1024, 61),  # odd window -> hop*2 != win overlap depth 3
    ],
)
def test_detrend_matches_host(rng, n, P, win):
    dots, cuts = make_case(rng, n)
    cum = sh.integrate_flow(dots, cuts)
    want = sh.detrend(cum, win)
    got = np.asarray(
        sj.detrend_single_segment(jnp.asarray(pad(cum, P), jnp.float32), jnp.int32(n), win)
    )[:n]
    # float32 vs float64; the 1e6-amplified <5 branch needs relative tolerance
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4 * max(1.0, np.abs(want).max()))


@pytest.mark.parametrize("n,P", [(10, 16), (97, 128)])
def test_binomial_smooth_matches_host(rng, n, P):
    x = rng.normal(0, 1, n)
    want = sh.binomial_smooth(x)
    got = np.asarray(sj.binomial_smooth(jnp.asarray(pad(x, P), jnp.float32), jnp.int32(n)))[:n]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n,P,win", [(1, 8, 5), (10, 16, 4), (200, 256, 31), (200, 256, 30)])
def test_rolling_normalize_matches_host(rng, n, P, win):
    x = rng.normal(0, 1, n)
    want = sh.rolling_normalize(x, win)
    got = np.asarray(
        sj.rolling_normalize(jnp.asarray(pad(x, P), jnp.float32), jnp.int32(n), win)
    )[:n]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_keyframe_mask_matches_host_indices(rng):
    n, P = 200, 256
    x = rng.normal(0, 20, n).cumsum()
    norm = sh.rolling_normalize(sh.binomial_smooth(x), 31)
    want = sh.keyframe_indices(norm)
    mask = np.asarray(sj.keyframe_mask(jnp.asarray(pad(norm, P), jnp.float32), jnp.int32(n)))
    got = list(np.nonzero(mask[:n])[0])
    assert got == sorted(set(want))


def test_full_device_chain_close_to_host(rng):
    n, P = 731, 1024
    dots, cuts = make_case(rng, n, cut_p=0.03)
    dwin, nwin = 60, 91
    _, want_norm = sh.signal_chain(dots, cuts, np.arange(n), 30.0, dwin, nwin)
    norm, mask = sj.signal_chain_device(
        jnp.asarray(pad(dots, P), jnp.float32),
        jnp.asarray(pad(cuts, P, False)),
        jnp.int32(n),
        dwin,
        nwin,
    )
    norm = np.asarray(norm)[:n]
    # normalized 0-100 curve within half a position unit of float64 host
    np.testing.assert_allclose(norm, want_norm, atol=0.5)
    assert np.asarray(mask)[:n].any()


def test_padded_length_invariance(rng):
    """Same valid data, different padded lengths -> identical valid outputs."""
    n = 150
    dots, cuts = make_case(rng, n)
    outs = []
    for P in (150, 256, 512):
        norm, _ = sj.signal_chain_device(
            jnp.asarray(pad(dots, P), jnp.float32),
            jnp.asarray(pad(cuts, P, False)),
            jnp.int32(n),
            30,
            45,
        )
        outs.append(np.asarray(norm)[:n])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5, atol=1e-4)


def test_jit_cache_reuse_across_n():
    """Different valid lengths at one padded length reuse the compiled program."""
    P = 256
    f = sj.signal_chain_device
    d = jnp.zeros(P, jnp.float32).at[:100].set(jnp.sin(jnp.arange(100) / 5.0))
    c = jnp.zeros(P, bool)
    f(d, c, jnp.int32(100), 30, 45)
    misses_before = f._cache_size()
    f(d, c, jnp.int32(90), 30, 45)
    assert f._cache_size() == misses_before
