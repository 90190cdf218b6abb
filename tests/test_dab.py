"""DAB OFDM core: modulate -> demodulate loopback."""

import numpy as np

from sdrtpu.decoders.dab import (
    CARRIERS,
    FIC_SYMS,
    FRAME,
    NUM_SYMS,
    DabDemodulator,
    DabModulator,
    crc16_ccitt,
    energy_dispersal,
    freq_interleave_table,
)

RNG = np.random.default_rng(41)


def test_interleaver_properties():
    ks = freq_interleave_table()
    assert len(ks) == CARRIERS
    assert len(np.unique(ks)) == CARRIERS  # a permutation
    assert ks.min() >= -768 and ks.max() <= 768 and 0 not in ks


def test_ofdm_loopback_clean():
    mod = DabModulator()
    dem = DabDemodulator()
    dibits = RNG.integers(0, 4, (NUM_SYMS - 1, CARRIERS))
    frame = mod.modulate_frame(dibits)
    assert len(frame) == FRAME
    got = np.asarray(dem.demod_frame(frame))
    assert got.shape == (NUM_SYMS - 1, CARRIERS)
    assert np.array_equal(got, dibits)


def test_null_detection():
    mod = DabModulator()
    dem = DabDemodulator()
    dibits = RNG.integers(0, 4, (NUM_SYMS - 1, CARRIERS))
    frame = mod.modulate_frame(dibits)
    noise = (0.01 * (RNG.standard_normal(5000) + 1j * RNG.standard_normal(5000))).astype(np.complex64)
    stream = np.concatenate([frame[-5000:], frame])  # junk prefix then frame
    start = dem.find_null(stream)
    assert abs(start - 5000) < 50


def test_fic_roundtrip_with_noise():
    mod = DabModulator()
    dem = DabDemodulator()
    payload = RNG.integers(0, 2, 400).astype(np.uint8)
    sym = mod.fic_to_symbols(payload)
    all_dibits = np.concatenate([
        sym, RNG.integers(0, 4, (NUM_SYMS - 1 - FIC_SYMS, CARRIERS))
    ])
    frame = mod.modulate_frame(all_dibits)
    frame = frame + (0.02 * (RNG.standard_normal(len(frame)) + 1j * RNG.standard_normal(len(frame)))).astype(np.complex64)
    got_dibits = np.asarray(dem.demod_frame(frame))
    decoded, _ = dem.decode_fic(got_dibits, len(payload))
    np.testing.assert_array_equal(decoded, payload)


def test_energy_dispersal_involution():
    bits = RNG.integers(0, 2, 300).astype(np.uint8)
    scr = bits ^ energy_dispersal(300)
    np.testing.assert_array_equal(scr ^ energy_dispersal(300), bits)


def test_crc16_ccitt():
    # appending the CRC makes the total check value a known constant
    data = RNG.integers(0, 2, 240).astype(np.uint8)
    crc = crc16_ccitt(data)
    full = np.concatenate([data, [(crc >> (15 - i)) & 1 for i in range(16)]])
    assert crc16_ccitt(full) == 0
