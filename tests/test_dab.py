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


class TestFicCoding:
    def test_puncture_vectors_table29(self):
        from sdrtpu.decoders.dab import VT, puncture_vector

        # counts: v_PI keeps 8 + PI of 32
        for pi in range(1, 25):
            v = puncture_vector(pi)
            assert v.sum() == 8 + pi
        # known vectors from EN 300 401 Table 29
        np.testing.assert_array_equal(
            puncture_vector(16), np.tile([1, 1, 1, 0], 8)
        )
        np.testing.assert_array_equal(puncture_vector(24), np.ones(32))
        v1 = np.zeros(32, np.uint8)
        v1[0::4] = 1
        v1[1] = 1
        np.testing.assert_array_equal(puncture_vector(1), v1)
        # PI=15: c0,c1 everywhere, c2 in all groups but the last
        v15 = np.tile([1, 1, 1, 0], 8)
        v15[7 * 4 + 2] = 0
        np.testing.assert_array_equal(puncture_vector(15), v15)
        assert VT.sum() == 12 and VT.size == 24

    def test_fic_rate(self):
        from sdrtpu.decoders.dab import FIC_CODEWORD, fic_puncture_mask

        m = fic_puncture_mask()
        assert m.size == 3096 and m.sum() == FIC_CODEWORD  # rate ~ 1/3

    def _make_fibs(self):
        from sdrtpu.decoders.dab import (
            build_fib, make_fig_0_0, make_fig_1_0, make_fig_1_1,
        )

        fibs = [
            build_fib([make_fig_0_0(0xD1E5, cif_count=42),
                       make_fig_1_0(0xD1E5, "SDRTPU ENSEMBLE")]),
            build_fib([make_fig_1_1(0xC0DE, "TPU RADIO 1")]),
        ]
        while len(fibs) < 12:
            fibs.append(build_fib([]))
        return np.stack(fibs)

    def test_fib_crc(self):
        from sdrtpu.decoders.dab import fib_crc_ok

        fibs = self._make_fibs()
        assert all(fib_crc_ok(f) for f in fibs)
        bad = fibs[0].copy()
        bad[17] ^= 1
        assert not fib_crc_ok(bad)

    def test_fic_offair_roundtrip_with_noise(self):
        """Full off-air-format FIC: FIGs -> FIBs -> EN 300 401 coding ->
        OFDM frame -> samples + noise -> demod -> FIC decode -> CRC-gated
        FIG parse."""
        from sdrtpu.decoders.dab import parse_figs

        mod = DabModulator()
        dem = DabDemodulator()
        fibs = self._make_fibs()
        sym = mod.fic_to_symbols(fibs)
        all_dibits = np.concatenate([
            sym, RNG.integers(0, 4, (NUM_SYMS - 1 - FIC_SYMS, CARRIERS))
        ])
        frame = mod.modulate_frame(all_dibits)
        frame = frame + (
            0.02 * (RNG.standard_normal(len(frame))
                    + 1j * RNG.standard_normal(len(frame)))
        ).astype(np.complex64)
        got_dibits = np.asarray(dem.demod_frame(frame))
        got_fibs, ok = dem.decode_fic(got_dibits)
        assert ok.all(), ok
        np.testing.assert_array_equal(got_fibs, fibs)
        figs = parse_figs(got_fibs[0])
        assert {"type": (0, 0), "eid": 0xD1E5, "change": 0,
                "cif_count": 42} in figs
        labels = [f for f in figs if f["type"] == (1, 0)]
        assert labels and labels[0]["label"].strip() == "SDRTPU ENSEMBLE"
        figs1 = parse_figs(got_fibs[1])
        svc = [f for f in figs1 if f["type"] == (1, 1)]
        assert svc and svc[0]["sid"] == 0xC0DE
        assert svc[0]["label"].strip() == "TPU RADIO 1"

    def test_fic_survives_puncture_erasures_and_bit_errors(self):
        """Viterbi must absorb channel bit errors on the punctured code."""
        mod = DabModulator()
        dem = DabDemodulator()
        fibs = self._make_fibs()
        coded = np.concatenate(
            [mod.fic_encode_group(fibs[3 * g: 3 * g + 3].reshape(-1))
             for g in range(4)]
        )
        soft = 1.0 - 2.0 * coded.astype(np.float32)
        flip = RNG.choice(len(soft), size=len(soft) // 50, replace=False)
        soft[flip] *= -1.0  # 2% hard bit errors
        got = np.concatenate(
            [dem.fic_decode_group(soft[g * 2304: (g + 1) * 2304])
             for g in range(4)]
        ).reshape(12, 256)
        np.testing.assert_array_equal(got, fibs)


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
