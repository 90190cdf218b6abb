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


class TestEtsiPrs:
    def test_phase_grid_and_period(self):
        from sdrtpu.decoders.dab import prs_phase_for_carrier, prs_phases

        ks = np.concatenate([np.arange(-768, 0), np.arange(1, 769)])
        ph = prs_phases(ks)
        m = np.round(ph / (np.pi / 2)).astype(int)
        assert np.allclose(ph, m * np.pi / 2)  # exact pi/2 grid
        # h rows repeat with period 16 within each 32-carrier block
        for b in range(48):
            blk = m[b * 32 : (b + 1) * 32]
            np.testing.assert_array_equal(blk[:16], blk[16:])

    def test_first_block_values(self):
        # k' = -768, i = 0, n = 1: phi/(pi/2) = (h0 + 1) mod-4 grid
        from sdrtpu.decoders.dab import prs_phase_for_carrier

        expect = [1, 3, 1, 1, 1, 1, 2, 2, 3, 1, 1, 1, 3, 3, 2, 2]
        got = [
            round(prs_phase_for_carrier(-768 + j) / (np.pi / 2)) % 4
            for j in range(16)
        ]
        assert got == expect

    def test_prs_autocorrelation_sharp(self):
        """The ETSI PRS has an impulse-like time autocorrelation (it is
        the sync/channel-estimation reference)."""
        from sdrtpu.decoders.dab import FFT, _carrier_bins, _KS, prs_phases

        spec = np.zeros(FFT, np.complex128)
        spec[_carrier_bins(_KS)] = np.exp(1j * prs_phases())
        t = np.fft.ifft(spec)
        ac = np.fft.ifft(np.abs(np.fft.fft(t)) ** 2)
        peak = np.abs(ac[0])
        side = np.abs(ac[1:]).max()
        assert side < 0.35 * peak
