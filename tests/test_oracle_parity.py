"""Reference-oracle parity: sdrtpu kernels vs literal NumPy ports.

BASELINE.md acceptance: "demod SNR parity vs SDR++ outputs on recorded
captures".  `refdsp_oracle.py` is the per-sample port of the reference
chains; the committed WAV captures in `tests/fixtures/` are replayed
through both implementations:

- exact-scan kernels (Fir, Quadrature, Pll, Agc, FastAgc, Costas,
  MuellerMuller, full BroadcastFM pll-mode, RDS chain, Meteor chain):
  waveform-level agreement (tight tolerances; float32 recurrences track
  the C++ semantics to rounding),
- block-parallel redesigns (pilot_mode normalized/regression): bounded
  output deviation from the oracle (SNR of the difference).

Captures replay in reference-style blocks (fs/200 = 5 ms,
``file_source/src/main.cpp:157``) scaled up 10x to keep the test fast;
state carry across block boundaries is exercised either way.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import refdsp_oracle as ref
from sdrtpu.io.wav import read_iq_wav
from sdrtpu.io.symbols import quantize_soft
from sdrtpu.kernels import taps as tapsmod
from sdrtpu.kernels.analog import Am, Cw, Fm, Ssb
from sdrtpu.kernels.clock import MuellerMuller
from sdrtpu.kernels.demod import Quadrature
from sdrtpu.kernels.fir import Fir
from sdrtpu.kernels.loops import Agc, Pll
from sdrtpu.kernels.psk import MeteorDemod
from sdrtpu.kernels.resample import RationalResampler
from sdrtpu.kernels.wfm import BroadcastFm
from sdrtpu.decoders.rds import RdsDecoder, RdsDemod

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def fixture(name):
    info, iq = read_iq_wav(os.path.join(FIX, name))
    return float(info.samplerate), iq


def run_blocks(op, x, block, multiple_outputs=False):
    """Stream x through a StreamOp in fixed blocks, concatenating output."""
    st = op.init_state()
    outs = []
    n = (len(x) // block) * block
    for i in range(0, n, block):
        st, y = op(st, jnp.asarray(x[i: i + block]))
        outs.append(y)
    if multiple_outputs:
        return [np.concatenate([np.asarray(o[k]) for o in outs], axis=-1)
                for k in range(len(outs[0]))]
    return np.concatenate([np.asarray(o) for o in outs], axis=-1)


def snr_db(sig, err):
    return 10.0 * np.log10(np.sum(np.abs(sig) ** 2)
                           / max(np.sum(np.abs(err) ** 2), 1e-30))


class TestKernelOracles:
    def test_fir_real_taps_float(self):
        fs, iq = fixture("nfm_50k.wav")
        m = np.angle(iq[1:] * np.conj(iq[:-1])).astype(np.float32)
        taps = tapsmod.low_pass(6250.0, 625.0, fs)
        o = ref.RefFir(taps, np.float32)
        k = Fir(taps, dtype=jnp.float32)
        got = run_blocks(k, m, 2500)
        want = np.concatenate(
            [o.process(m[i: i + 2500]) for i in range(0, len(m) - 2499, 2500)]
        )
        np.testing.assert_allclose(got, want[: len(got)], atol=2e-5)

    def test_fir_complex_taps_complex_data(self):
        fs, iq = fixture("wfm_stereo_rds_250k.wav")
        iq = iq[:50000]
        taps = tapsmod.band_pass(18750.0, 19250.0, 3000.0, fs,
                                 odd_tap_count=True)
        o = ref.RefFir(taps, np.complex64)
        k = Fir(taps, dtype=jnp.complex64)
        got = run_blocks(k, iq, 12500)
        want = np.concatenate(
            [o.process(iq[i: i + 12500]) for i in range(0, 50000, 12500)]
        )
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_quadrature(self):
        fs, iq = fixture("nfm_50k.wav")
        o = ref.RefQuadrature(6250.0, fs)
        k = Quadrature(6250.0, fs)
        got = run_blocks(k, iq, 2500)
        want = np.concatenate(
            [o.process(iq[i: i + 2500]) for i in range(0, len(iq) - 2499, 2500)]
        )
        np.testing.assert_allclose(got, want[: len(got)], atol=5e-4)

    def test_pll_on_pilot(self):
        fs, iq = fixture("wfm_stereo_rds_250k.wav")
        iq = iq[:100000]
        quad = ref.RefQuadrature(75000.0, fs)
        m = quad.process(iq).astype(np.complex64)
        pilot = ref.RefFir(
            tapsmod.band_pass(18750.0, 19250.0, 3000.0, fs,
                              odd_tap_count=True),
            np.complex64,
        ).process(m)

        w19 = tapsmod.hz_to_rads(19000.0, fs)
        o = ref.RefPll(25000.0 / fs, 0.0, w19,
                       tapsmod.hz_to_rads(18750.0, fs),
                       tapsmod.hz_to_rads(19250.0, fs))
        k = Pll(25000.0 / fs, 0.0, w19,
                tapsmod.hz_to_rads(18750.0, fs),
                tapsmod.hz_to_rads(19250.0, fs))
        got = run_blocks(k, pilot, 25000)
        want = o.process(pilot)
        # locked loop: VCO phasors agree to float rounding noise
        err = np.abs(got - want)
        assert np.median(err) < 1e-3
        assert snr_db(want, got - want) > 40.0

    def test_agc_exact(self):
        fs, iq = fixture("am_15k.wav")
        env = np.abs(iq).astype(np.float32)
        o = ref.RefAgc(1.0, 50.0 / fs, 5.0 / fs, 10e6, 10.0, np.inf)
        k = Agc(1.0, 50.0 / fs, 5.0 / fs, 10e6, 10.0, np.inf)
        got = run_blocks(k, env, 1500)
        want = np.concatenate(
            [o.process(env[i: i + 1500]) for i in range(0, len(env) - 1499, 1500)]
        )
        np.testing.assert_allclose(got, want[: len(got)], atol=1e-4)

    def test_mm_float_mode(self):
        # baud-rate BPSK-ish soft stream from the RDS chain front
        rng = np.random.default_rng(3)
        n_sym = 400
        sps = 5000.0 / 1187.5
        bits = rng.integers(0, 2, n_sym) * 2.0 - 1.0
        n = int(n_sym * sps)
        t = np.arange(n)
        soft = (bits[np.minimum((t / sps).astype(int), n_sym - 1)]
                * (0.8 + 0.05 * np.sin(t / 50.0))).astype(np.float32)
        o = ref.RefMM(sps, 1e-6, 0.01, 0.01, complex_mode=False)
        k = MuellerMuller(sps, 1e-6, 0.01, 0.01, complex_mode=False)
        st = k.init_state()
        got = []
        for i in range(0, n - int(sps), 420):
            st, (sym, valid) = k(st, jnp.asarray(soft[i: i + 420]))
            got.append(np.asarray(sym)[np.asarray(valid)])
        got = np.concatenate(got)
        want = np.concatenate(
            [o.process(soft[i: i + 420]) for i in range(0, n - int(sps), 420)]
        )
        m = min(len(got), len(want))
        assert abs(len(got) - len(want)) <= 2
        match = np.isclose(got[:m], want[:m], atol=1e-3).mean()
        assert match > 0.999, match


class TestBroadcastFmParity:
    @pytest.fixture(scope="class")
    def capture(self):
        fs, iq = fixture("wfm_stereo_rds_250k.wav")
        return fs, iq

    @pytest.fixture(scope="class")
    def oracle_lr(self, capture):
        fs, iq = capture
        o = ref.RefBroadcastFm(75000.0, fs, low_pass=True, rds_out=True)
        l_parts, r_parts, rds_parts = [], [], []
        for i in range(0, len(iq), 25000):
            l, r, rds = o.process(iq[i: i + 25000])
            l_parts.append(l)
            r_parts.append(r)
            rds_parts.append(rds)
        return (np.concatenate(l_parts), np.concatenate(r_parts),
                np.concatenate(rds_parts))

    def _run(self, fs, iq, pilot_mode):
        op = BroadcastFm(75000.0, fs, stereo=True, low_pass=True,
                         rds_out=True, pilot_mode=pilot_mode)
        st = op.init_state()
        audio, rds = [], []
        for i in range(0, len(iq), 25000):
            st, (a, r) = op(st, jnp.asarray(iq[i: i + 25000]))
            audio.append(np.asarray(a))
            rds.append(np.asarray(r))
        a = np.concatenate(audio, axis=-1)
        return a[0], a[1], np.concatenate(rds)

    def test_pll_mode_matches_oracle(self, capture, oracle_lr):
        fs, iq = capture
        l, r, _ = self._run(fs, iq, "pll")
        lo, ro, _ = oracle_lr
        skip = 20000  # filter fill + PLL lock transient
        assert snr_db(lo[skip:], l[skip:] - lo[skip:]) > 45.0
        assert snr_db(ro[skip:], r[skip:] - ro[skip:]) > 45.0

    @pytest.mark.parametrize("mode", ["normalized", "regression", "envelope"])
    def test_block_parallel_modes_bounded(self, capture, oracle_lr, mode):
        """TPU-native pilot modes stay within an SNR bound of the oracle."""
        fs, iq = capture
        l, r, _ = self._run(fs, iq, mode)
        lo, ro, _ = oracle_lr
        skip = 20000
        assert snr_db(lo[skip:], l[skip:] - lo[skip:]) > 30.0
        assert snr_db(ro[skip:], r[skip:] - ro[skip:]) > 30.0

    def test_audio_tones_recovered(self, capture, oracle_lr):
        """Sanity: the planted 440/1200 Hz program is what comes out."""
        fs, iq = capture
        lo, ro, _ = oracle_lr
        for ch, f_want in ((lo, 440.0), (ro, 1200.0)):
            seg = ch[30000:]
            spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
            freqs = np.fft.rfftfreq(len(seg), 1.0 / fs)
            peak = freqs[np.argmax(spec)]
            assert abs(peak - f_want) < 5.0, (peak, f_want)

    def test_rds_chain_and_decode(self, capture, oracle_lr):
        """RDS: sdrtpu 5 ksps chain vs oracle chain, and group decode."""
        fs, iq = capture
        _, _, rds_full = oracle_lr  # oracle tap at 250 ksps (pre-resample)
        _, _, rds_tpu = self._run(fs, iq, "pll")  # sdrtpu tap at 5 ksps

        # resample the oracle tap with the same resampler implementation
        rs = RationalResampler(fs, 5000.0)
        st = rs.init_state()
        outs = []
        for i in range(0, len(rds_full), 25000):
            st, y = rs(st, jnp.asarray(rds_full[i: i + 25000]))
            outs.append(np.asarray(y))
        rds_oracle = np.concatenate(outs)
        assert snr_db(rds_oracle, rds_tpu[: len(rds_oracle)] - rds_oracle) > 40.0

        # Stage-level parity through the 5 ksps chain.  (Comparing two
        # *independently closed* chains bit-for-bit is chaotic: the two
        # M&M timing loops, fed inputs differing by float-rounding 5e-6,
        # eventually make one different half-symbol lock choice on the
        # biphase waveform.  The reference itself would do the same under
        # any perturbation, so parity is pinned stage by stage instead.)
        from sdrtpu.kernels import taps as t2
        from sdrtpu.kernels.fir import Fir as KFir
        from sdrtpu.kernels.loops import Costas as KCostas
        from sdrtpu.kernels.psk import FastAgc as KFastAgc
        from sdrtpu.kernels.clock import MuellerMuller as KMM

        agc_o = ref.RefFastAgc(1.0, 1e6, 0.1)
        c1_o = ref.RefCostas(2, 0.005)
        fir_o = ref.RefFir(t2.band_pass(1e-9, 2375.0, 100.0, 5000.0),
                           np.complex64)
        bw = t2.hz_to_rads(1187.5, 5000.0)
        c2_o = ref.RefCostas(2, 0.01, 0.0, bw, bw * 0.9, bw * 1.1)
        agc_k = KFastAgc(1.0, 1e6, 0.1)
        c1_k = KCostas(2, 0.005)
        fir_k = KFir(t2.band_pass(1e-9, 2375.0, 100.0, 5000.0),
                     dtype=jnp.complex64)
        c2_k = KCostas(2, 0.01, init_freq=bw, min_freq=bw * 0.9,
                       max_freq=bw * 1.1)
        sa, s1, sf, s2 = (agc_k.init_state(), c1_k.init_state(),
                          fir_k.init_state(), c2_k.init_state())
        soft = []
        for i in range(0, len(rds_oracle) - 499, 500):
            blk = rds_oracle[i: i + 500]
            y_o = c2_o.process(fir_o.process(c1_o.process(
                agc_o.process(blk))))
            sa, y = agc_k(sa, jnp.asarray(blk))
            s1, y = c1_k(s1, y)
            sf, y = fir_k(sf, y)
            s2, y = c2_k(s2, y)
            np.testing.assert_allclose(np.asarray(y), y_o, atol=1e-4)
            soft.append(y_o.real.astype(np.float32))

        # M&M + slicer + differential decode on the COMMON soft stream
        sps = 5000.0 / 1187.5
        mm_o = ref.RefMM(sps, 1e-6, 0.01, 0.01, complex_mode=False)
        mm_k = KMM(sps, 1e-6, 0.01, 0.01, complex_mode=False)
        st = mm_k.init_state()
        sym_o, sym_k = [], []
        for blk in soft:
            sym_o.append(mm_o.process(blk))
            st, (s, v) = mm_k(st, jnp.asarray(blk))
            sym_k.append(np.asarray(s)[np.asarray(v)])
        sym_o = np.concatenate(sym_o)
        sym_k = np.concatenate(sym_k)
        assert len(sym_o) == len(sym_k)
        assert np.isclose(sym_o, sym_k, atol=1e-3).mean() > 0.999

        # end-to-end: sdrtpu's own full chain decodes the planted PI/PS
        k = RdsDemod()
        st = k.init_state()
        bits_k = []
        for i in range(0, len(rds_oracle) - 499, 500):
            st, (b, valid) = k(st, jnp.asarray(rds_oracle[i: i + 500]))
            bits_k.append(np.asarray(b)[np.asarray(valid)])
        bits_k = np.concatenate(bits_k)
        dec = RdsDecoder()
        dec.process(bits_k)
        assert dec.pi_code == 0xF00D
        assert dec.program_service_name == "SDRTPU  "
        # ... and so does the oracle's (both ends of the parity claim)
        o = ref.RefRdsDemod()
        bits_o = np.concatenate(
            [o.process(rds_oracle[i: i + 500])[0]
             for i in range(0, len(rds_oracle) - 499, 500)]
        )
        dec_o = RdsDecoder()
        dec_o.process(bits_o)
        assert dec_o.pi_code == 0xF00D
        assert dec_o.program_service_name == "SDRTPU  "


class TestAnalogChainOracles:
    def test_nfm(self):
        fs, iq = fixture("nfm_50k.wav")
        o = ref.RefFm(fs, 12500.0)
        k = Fm(fs, 12500.0)
        got = run_blocks(k, iq, 2500)
        want = np.concatenate(
            [o.process(iq[i: i + 2500]) for i in range(0, len(iq) - 2499, 2500)]
        )
        want = want[: len(got)]
        assert snr_db(want[2000:], got[2000:] - want[2000:]) > 50.0

    def test_am(self):
        fs, iq = fixture("am_15k.wav")
        o = ref.RefAm(fs, 10000.0)
        k = Am(fs, 10000.0, dc_block_rate=50.0 / fs)
        got = run_blocks(k, iq, 1500)
        want = np.concatenate(
            [o.process(iq[i: i + 1500]) for i in range(0, len(iq) - 1499, 1500)]
        )
        want = want[: len(got)]
        assert snr_db(want[1000:], got[1000:] - want[1000:]) > 50.0

    def test_ssb_usb(self):
        fs, iq = fixture("ssb_usb_24k.wav")
        o = ref.RefSsb(fs, 2800.0, "usb")
        k = Ssb(fs, 2800.0, "usb")
        got = run_blocks(k, iq, 2400)
        want = np.concatenate(
            [o.process(iq[i: i + 2400]) for i in range(0, len(iq) - 2399, 2400)]
        )
        want = want[: len(got)]
        assert snr_db(want[1000:], got[1000:] - want[1000:]) > 50.0

    def test_cw(self):
        fs, iq = fixture("cw_3k.wav")
        o = ref.RefCw(fs, 800.0)
        k = Cw(fs, 800.0)
        got = run_blocks(k, iq, 300)
        want = np.concatenate(
            [o.process(iq[i: i + 300]) for i in range(0, len(iq) - 299, 300)]
        )
        want = want[: len(got)]
        assert snr_db(want[500:], got[500:] - want[500:]) > 50.0


class TestMeteorParity:
    def test_symbols_and_soft_bytes(self):
        fs, iq = fixture("meteor_qpsk_150k.wav")
        kw = dict(symbolrate=72000.0, samplerate=fs, rrc_tap_count=33,
                  rrc_beta=0.6)
        o = ref.RefMeteor(agc_rate=0.1, costas_bw=0.005, omega_gain=1e-6,
                          mu_gain=0.01, **kw)
        k = MeteorDemod(agc_rate=0.1, costas_bandwidth=0.005,
                        omega_gain=1e-6, mu_gain=0.01, **kw)
        st = k.init_state()
        got = []
        block = 15000
        for i in range(0, len(iq) - block + 1, block):
            st, (sym, valid) = k(st, jnp.asarray(iq[i: i + block]))
            got.append(np.asarray(sym)[np.asarray(valid)])
        got = np.concatenate(got)
        want = np.concatenate(
            [o.process(iq[i: i + block])
             for i in range(0, len(iq) - block + 1, block)]
        )
        m = min(len(got), len(want))
        assert abs(len(got) - len(want)) <= 2, (len(got), len(want))
        close = np.isclose(got[:m], want[:m], atol=2e-2).mean()
        assert close > 0.995, close
        # .s soft-symbol byte parity (meteor main.cpp:193-203 quantization)
        sb_got = quantize_soft(got[:m])
        sb_want = quantize_soft(want[:m])
        byte_match = (sb_got == sb_want).mean()
        assert byte_match > 0.99, byte_match


class TestMoreKernelOracles:
    """Standalone per-sample oracles for the remaining recurrences."""

    def test_deemphasis(self):
        fs, iq = fixture("nfm_50k.wav")
        m = np.angle(iq[1:] * np.conj(iq[:-1])).astype(np.float32)
        from sdrtpu.kernels.iir import Deemphasis

        o = ref.RefDeemphasis(50e-6, fs)
        k = Deemphasis(50e-6, fs)
        got = run_blocks(k, m, 2500)
        want = np.concatenate(
            [o.process(m[i: i + 2500]) for i in range(0, len(m) - 2499, 2500)]
        )
        np.testing.assert_allclose(got, want[: len(got)], atol=2e-5)

    def test_dc_blocker(self):
        fs, iq = fixture("am_15k.wav")
        env = np.abs(iq).astype(np.float32)
        from sdrtpu.kernels.iir import DcBlocker

        o = ref.RefDcBlocker(50.0 / fs)
        k = DcBlocker(50.0 / fs, dtype=np.float32)
        got = run_blocks(k, env, 1500)
        want = np.concatenate(
            [o.process(env[i: i + 1500]) for i in range(0, len(env) - 1499, 1500)]
        )
        np.testing.assert_allclose(got, want[: len(got)], atol=2e-5)

    def test_costas_orders(self):
        from sdrtpu.kernels.loops import Costas

        rng = np.random.default_rng(9)
        n = 6000
        t = np.arange(n)
        for order in (2, 4, 8):
            m = 2 if order == 2 else order
            syms = np.exp(1j * (2 * np.pi * rng.integers(0, m, n) / m))
            cfo = np.exp(1j * (0.01 * t + 0.5))
            x = (syms * cfo + 0.01 * (rng.standard_normal(n)
                 + 1j * rng.standard_normal(n))).astype(np.complex64)
            o = ref.RefCostas(order, 0.01)
            k = Costas(order, 0.01)
            got = run_blocks(k, x, 1000)
            want = np.concatenate(
                [o.process(x[i: i + 1000]) for i in range(0, n, 1000)]
            )
            err = np.abs(got[500:] - want[500: len(got)])
            assert np.median(err) < 1e-3, (order, np.median(err))

    def test_meteor_costas_broken_modulation(self):
        from sdrtpu.kernels.psk import MeteorCostas

        fs, iq = fixture("meteor_qpsk_150k.wav")
        x = iq[:40000]
        o = ref.RefMeteorCostas(0.01, broken_modulation=True)
        k = MeteorCostas(0.01, broken_modulation=True)
        got = run_blocks(k, x, 8000)
        want = np.concatenate(
            [o.process(x[i: i + 8000]) for i in range(0, 40000, 8000)]
        )
        err = np.abs(got[4000:] - want[4000:])
        assert np.median(err) < 2e-3, np.median(err)

    def test_fast_agc_standalone(self):
        from sdrtpu.kernels.psk import FastAgc

        fs, iq = fixture("meteor_qpsk_150k.wav")
        x = iq[:30000]
        o = ref.RefFastAgc(1.0, 10e6, 0.001)
        k = FastAgc(1.0, 10e6, 0.001)
        got = run_blocks(k, x, 6000)
        want = np.concatenate(
            [o.process(x[i: i + 6000]) for i in range(0, 30000, 6000)]
        )
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_power_squelch(self):
        from sdrtpu.kernels.squelch import PowerSquelch

        fs, iq = fixture("cw_3k.wav")
        o = ref.RefPowerSquelch(-20.0)
        k = PowerSquelch(-20.0)
        # 150-sample blocks = one 50 ms key cell each, so the keyed
        # carrier toggles the gate across blocks
        got = run_blocks(k, iq, 150)
        want = np.concatenate(
            [o.process(iq[i: i + 150]) for i in range(0, len(iq) - 149, 150)]
        )
        want = want[: len(got)]
        np.testing.assert_allclose(got, want, atol=1e-6)
        blocks = got.reshape(-1, 150)
        gated = np.all(blocks == 0, axis=1)
        assert gated.any() and not gated.all()

    def test_noise_blanker(self):
        from sdrtpu.kernels.squelch import NoiseBlanker

        fs, iq = fixture("nfm_50k.wav")
        x = iq[:20000].copy()
        rng = np.random.default_rng(4)
        spikes = rng.choice(len(x), 40, replace=False)
        x[spikes] *= 30.0  # impulse noise
        o = ref.RefNoiseBlanker(500.0 / 24000.0, 10.0)
        k = NoiseBlanker(500.0 / 24000.0, 10.0)
        got = run_blocks(k, x, 4000)
        want = np.concatenate(
            [o.process(x[i: i + 4000]) for i in range(0, 20000, 4000)]
        )
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_noise_blanker_zero_stretch(self):
        """The reference SKIPS the average update on zero samples — an
        all-zero stretch (closed squelch upstream) must not decay the
        average and crush the first real samples afterwards."""
        from sdrtpu.kernels.squelch import NoiseBlanker

        rng = np.random.default_rng(5)
        sig = (0.5 * (rng.standard_normal(4000)
                      + 1j * rng.standard_normal(4000))).astype(np.complex64)
        x = np.concatenate([sig[:1000], np.zeros(2000, np.complex64),
                            sig[1000:]])
        o = ref.RefNoiseBlanker(500.0 / 24000.0, 10.0)
        k = NoiseBlanker(500.0 / 24000.0, 10.0)
        got = run_blocks(k, x, 1500)
        want = np.concatenate(
            [o.process(x[i: i + 1500]) for i in range(0, len(x), 1500)]
        )
        np.testing.assert_allclose(got, want, atol=1e-4)
        # and the post-gap samples are NOT attenuated
        post = got[3000:3100]
        np.testing.assert_allclose(np.abs(post), np.abs(x[3000:3100]),
                                   rtol=1e-3)
