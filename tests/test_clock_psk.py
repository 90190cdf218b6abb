"""Clock recovery (M&M) and PSK/Meteor demod chain tests."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.kernels.clock import FeedforwardSymbolSync, MuellerMuller, interp_bank
from sdrtpu.kernels.psk import MeteorDemod, Psk
from sdrtpu.kernels import taps as tapsmod
from sdrtpu.io.symbols import dequantize_soft, quantize_soft

RNG = np.random.default_rng(33)


def golden_mm_float(x, omega, omega_gain, mu_gain, rel, P=128, T=8):
    """Sequential port of mm.h:100-156 (float path) for parity checks."""
    bank = interp_bank(P, T).astype(np.float64)
    buf = np.concatenate([np.zeros(T - 1), x.astype(np.float64)])
    n = len(x)
    phase, freq, offset, last = 0.0, omega, 0, 0.0
    fmin, fmax = omega * (1 - rel), omega * (1 + rel)
    outs = []
    while offset < n:
        ph = int(np.clip(np.floor(phase * P), 0, P - 1))
        out = np.dot(buf[offset : offset + T], bank[ph])
        outs.append(out)
        err = np.sign(last) * out - last * np.sign(out) if last or out else 0.0
        # reference step(): sign with step(0) = -1
        step = lambda v: 1.0 if v > 0 else -1.0
        err = step(last) * out - last * step(out)
        err = np.clip(err, -1, 1)
        freq = np.clip(freq + omega_gain * err, fmin, fmax)
        phase += freq + mu_gain * err
        d = np.floor(phase)
        offset += int(d)
        phase -= d
        last = out
    return np.array(outs)


class TestMuellerMuller:
    def test_float_parity_vs_golden(self):
        # BPSK-ish alternating signal at 4 samples/symbol
        sym = RNG.choice([-1.0, 1.0], 64)
        x = np.repeat(sym, 4).astype(np.float32)
        om, og, mg, rel = 4.0, 0.01, 0.1, 0.1
        ref = golden_mm_float(x, om, og, mg, rel)
        mm = MuellerMuller(om, og, mg, rel, complex_mode=False)
        st, (syms, valid) = mm(mm.init_state(), jnp.asarray(x))
        got = np.asarray(syms)[np.asarray(valid)]
        n = min(len(got), len(ref))
        np.testing.assert_allclose(got[:n], ref[:n], atol=1e-3)

    def test_streaming_chunked_equals_full(self):
        x = np.repeat(RNG.choice([-1.0, 1.0], 512), 4).astype(np.float32)
        mm = MuellerMuller(4.0, 0.01, 0.1, 0.1, complex_mode=False)
        st, (s_full, v_full) = mm(mm.init_state(), jnp.asarray(x))
        full = np.asarray(s_full)[np.asarray(v_full)]
        st = mm.init_state()
        parts = []
        for i in range(0, len(x), 256):
            st, (s, v) = mm(st, jnp.asarray(x[i : i + 256]))
            parts.append(np.asarray(s)[np.asarray(v)])
        chunked = np.concatenate(parts)
        n = min(len(full), len(chunked))
        np.testing.assert_allclose(full[:n], chunked[:n], atol=1e-3)

    def test_recovers_timing_offset(self):
        # symbols at 4.02 samples/sym with fractional offset; loop should lock
        sps = 4.02
        nsym = 2000
        sym = RNG.choice([-1.0, 1.0], nsym)
        t = np.arange(int(nsym * sps))
        # linear interpolation of a zero-order-hold signal
        idx = (t / sps).astype(int)
        x = sym[np.clip(idx, 0, nsym - 1)].astype(np.float32)
        mm = MuellerMuller(4.0, 0.001, 0.05, 0.05, complex_mode=False)
        st, (syms, valid) = mm(mm.init_state(), jnp.asarray(x))
        got = np.asarray(syms)[np.asarray(valid)]
        # after settling, symbol estimates should be near +-1
        tail = got[len(got) // 2 :]
        assert np.mean(np.abs(np.abs(tail) - 1.0) < 0.3) > 0.9


def make_qpsk(nsym, sps, rrc_beta, rng, phase_off=0.0, freq_off=0.0):
    """RRC-shaped QPSK baseband at integer sps."""
    syms = np.exp(1j * (rng.integers(0, 4, nsym) * np.pi / 2 + np.pi / 4))
    up = np.zeros(nsym * sps, np.complex128)
    up[::sps] = syms
    h = tapsmod.root_raised_cosine_rate(sps * 11 + 1, rrc_beta, 1.0, sps).astype(
        np.float64
    )
    x = np.convolve(up, h, "same") * sps
    n = np.arange(len(x))
    x = x * np.exp(1j * (phase_off + 2 * np.pi * freq_off * n))
    return syms, x.astype(np.complex64)


class TestPsk:
    def test_qpsk_loopback(self):
        syms, x = make_qpsk(3000, 4, 0.35, RNG, phase_off=0.3, freq_off=1e-4)
        d = Psk(4, symbolrate=1.0, samplerate=4.0, rrc_tap_count=45,
                rrc_beta=0.35, agc_rate=0.01, costas_bandwidth=0.01,
                omega_gain=1e-4, mu_gain=0.05)
        st, (out, valid) = d(d.init_state(), jnp.asarray(x))
        got = np.asarray(out)[np.asarray(valid)]
        tail = got[len(got) // 2 :]
        # locked QPSK: symbols cluster near the 4 constellation points
        ang = np.mod(np.angle(tail), np.pi / 2) - np.pi / 4
        assert np.std(ang) < 0.25, f"angle spread {np.std(ang)}"
        assert abs(np.mean(np.abs(tail)) - 1.0) < 0.25


class TestMeteor:
    def test_meteor_chain_locks(self):
        # 72 ksym QPSK at 150 ksps (fractional sps = 25/12)
        fs, rs = 150000.0, 72000.0
        nsym = 20000
        sps = fs / rs
        rng = np.random.default_rng(1)
        syms = np.exp(1j * (rng.integers(0, 4, nsym) * np.pi / 2 + np.pi / 4))
        # fractional upsampling via polyphase resample of impulses
        import scipy.signal as sig

        up = np.zeros(nsym * 25, np.complex128)
        up[::25] = syms
        h = tapsmod.root_raised_cosine_rate(251, 0.6, 1.0, 25.0).astype(np.float64)
        shaped = np.convolve(up, h, "same") * 25
        x = sig.resample_poly(shaped, 1, 12)[: int(nsym * sps)].astype(np.complex64)

        d = MeteorDemod()
        st, (out, valid) = d(d.init_state(), jnp.asarray(x))
        got = np.asarray(out)[np.asarray(valid)]
        tail = got[len(got) // 2 :]
        ang = np.mod(np.angle(tail), np.pi / 2) - np.pi / 4
        assert np.std(ang) < 0.3, f"angle spread {np.std(ang)}"

    def test_soft_symbol_roundtrip(self):
        s = (RNG.uniform(-1.2, 1.2, 100) + 1j * RNG.uniform(-1.2, 1.2, 100)).astype(
            np.complex64
        )
        q = quantize_soft(s)
        assert q.dtype == np.int8 and len(q) == 200
        back = dequantize_soft(q)
        np.testing.assert_allclose(back, s, atol=1.0 / 84.0)


class TestFeedforward:
    def test_integer_sps_sync(self):
        syms, x = make_qpsk(4000, 4, 0.35, RNG)
        ff = FeedforwardSymbolSync(4)
        st, out = ff(ff.init_state(), jnp.asarray(x))
        out = np.asarray(out)[100:-100]
        ang = np.mod(np.angle(out), np.pi / 2) - np.pi / 4
        assert np.std(ang) < 0.3
