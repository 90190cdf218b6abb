"""Fused Pallas channelizer kernel vs the unfused reference ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdrtpu.kernels.fir import DecimatingFir
from sdrtpu.kernels.pallas_channelizer import TILE_IN, FusedChannelizerStage
from sdrtpu.shard.channelizer import MultiVfoMixer

RNG = np.random.default_rng(5)


def make_taps(t=36):
    h = RNG.standard_normal(t).astype(np.float32)
    return h / np.abs(h).sum()


@pytest.mark.parametrize("decim", [8, 4])
def test_fused_matches_unfused(decim):
    fs = 10e6
    n = TILE_IN  # one tile
    offsets = np.array([-3e6, -1e6, 0.5e6, 2.75e6])
    taps = make_taps(36 if decim == 8 else 20)
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(
        np.complex64
    )

    fused = FusedChannelizerStage(offsets, fs, taps, decim, n, interpret=True)
    st = fused.init_state()
    st, y = fused(st, jnp.asarray(x))
    y = np.asarray(y)

    mixer = MultiVfoMixer([-f for f in offsets], fs, n)
    dec = DecimatingFir(taps, decim)
    mst, mixed = mixer(mixer.init_state(), jnp.asarray(x))
    dst = np.zeros((len(offsets), dec.ntaps - 1), np.complex64)
    dst, ref = dec(dst, mixed)
    ref = np.asarray(ref)

    assert y.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(y, ref, atol=2e-3 * scale)


def test_streaming_chunks_match():
    fs = 10e6
    n = TILE_IN
    offsets = np.array([1.5e6, -2.5e6])
    taps = make_taps(36)
    x = (RNG.standard_normal(2 * n) + 1j * RNG.standard_normal(2 * n)).astype(
        np.complex64
    )
    fused = FusedChannelizerStage(offsets, fs, taps, 8, n, interpret=True)
    st = fused.init_state()
    st, y1 = fused(st, jnp.asarray(x[:n]))
    st, y2 = fused(st, jnp.asarray(x[n:]))
    got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)

    mixer = MultiVfoMixer([-f for f in offsets], fs, 2 * n)
    dec = DecimatingFir(taps, 8)
    mst, mixed = mixer(mixer.init_state(), jnp.asarray(x))
    dst = np.zeros((2, dec.ntaps - 1), np.complex64)
    dst, ref = dec(dst, mixed)
    ref = np.asarray(ref)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-3 * scale)


def test_non_tile_aligned_block():
    fs = 10e6
    n = TILE_IN + 40000  # not a tile multiple; divisible by 8
    offsets = np.array([0.9e6, -1.1e6])
    taps = make_taps(36)
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)
    fused = FusedChannelizerStage(offsets, fs, taps, 8, n, interpret=True)
    st, y = fused(fused.init_state(), jnp.asarray(x))
    y = np.asarray(y)
    mixer = MultiVfoMixer([-f for f in offsets], fs, n)
    dec = DecimatingFir(taps, 8)
    _, mixed = mixer(mixer.init_state(), jnp.asarray(x))
    _, ref = dec(np.zeros((2, dec.ntaps - 1), np.complex64), mixed)
    ref = np.asarray(ref)
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=2e-3 * np.abs(ref).max())
