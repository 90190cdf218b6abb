"""Round-4: compute the PARITY.md quantitative table (VERDICT r3 #6).

Reuses the test-suite fixtures/oracles to print the ACTUAL measured
numbers (not just pass/fail): per-mode SINAD, stereo separation,
oracle-parity SNR per pilot mode, Meteor .s byte equality, RDS decode.
CPU run (like the tests).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def sinad_db(audio, f_tone, fs, skip=4000):
    x = np.asarray(audio)[skip:]
    n = len(x)
    w = np.hanning(n)
    spec = np.abs(np.fft.rfft(x * w)) ** 2
    fr = np.fft.rfftfreq(n, 1 / fs)
    tone = (fr > f_tone - 100) & (fr < f_tone + 100)
    sig = spec[tone].sum()
    noise = spec[~tone].sum() - spec[:3].sum()
    return 10 * np.log10(sig / max(noise, 1e-30))


def snr_db(ref, err):
    return 10 * np.log10(
        (np.asarray(ref) ** 2).sum() / max((np.asarray(err) ** 2).sum(), 1e-30)
    )


def main():
    from sdrtpu.kernels.wfm import BroadcastFm
    import refdsp_oracle as ref
    from test_oracle_parity import fixture

    # --- WFM oracle parity per pilot mode ------------------------------
    fs, iq = fixture("wfm_stereo_rds_250k.wav")
    o = ref.RefBroadcastFm(75000.0, fs, low_pass=True, rds_out=True)
    l_parts, r_parts = [], []
    for i in range(0, len(iq), 25000):
        l, r, _ = o.process(iq[i: i + 25000])
        l_parts.append(l)
        r_parts.append(r)
    lo = np.concatenate(l_parts)
    ro = np.concatenate(r_parts)
    skip = 20000
    for mode in ("pll", "normalized", "regression", "envelope"):
        op = BroadcastFm(75000.0, fs, stereo=True, low_pass=True,
                         rds_out=True, pilot_mode=mode)
        st = op.init_state()
        audio = []
        for i in range(0, len(iq), 25000):
            st, (a, _) = op(st, jnp.asarray(iq[i: i + 25000]))
            audio.append(np.asarray(a))
        a = np.concatenate(audio, axis=-1)
        sl = snr_db(lo[skip:], a[0][skip:] - lo[skip:])
        sr = snr_db(ro[skip:], a[1][skip:] - ro[skip:])
        log(f"wfm_oracle_snr mode={mode:11s} L={sl:5.1f} dB R={sr:5.1f} dB")

    # --- stereo separation + SINAD per mode (synthetic MPX) ------------
    fs2 = 250000.0
    n = 1 << 18
    t = np.arange(n) / fs2
    L = 0.8 * np.sin(2 * np.pi * 1000.0 * t)
    R = 0.8 * np.sin(2 * np.pi * 2500.0 * t)
    mpx = (0.45 * (L + R) + 0.1 * np.sin(2 * np.pi * 19000.0 * t)
           + 0.45 * (L - R) * np.sin(2 * np.pi * 38000.0 * t))
    iq2 = np.exp(1j * np.cumsum(2 * np.pi * 75000.0 * mpx / fs2)).astype(np.complex64)

    def tone_power(x, f):
        spec = np.abs(np.fft.rfft(x * np.hanning(len(x)))) ** 2
        fr = np.fft.rfftfreq(len(x), 1 / fs2)
        return spec[(fr > f - 100) & (fr < f + 100)].sum()

    for mode in ("normalized", "regression", "envelope"):
        d = BroadcastFm(samplerate=fs2, stereo=True, pilot_mode=mode)
        _, (out, _) = d(d.init_state(), jnp.asarray(iq2))
        out = np.asarray(out)[:, 20000:]
        sep = 10 * np.log10(tone_power(out[0], 1000) / tone_power(out[0], 2500))
        s = sinad_db(out[0], 1000.0, fs2, skip=0)
        log(f"wfm_stereo mode={mode:11s} separation={sep:5.1f} dB "
            f"sinad={s:5.1f} dB")

    # --- analog mode SINADs (same synthesis as test_snr_parity) --------
    from sdrtpu.kernels.analog import Am, Fm, Ssb
    fs3, bw3 = 50000.0, 12500.0
    n3 = 1 << 17
    t3 = np.arange(n3) / fs3
    msg = 0.8 * np.sin(2 * np.pi * 1000.0 * t3)
    iq_fm = np.exp(1j * np.cumsum(2 * np.pi * (bw3 / 2) * msg / fs3)).astype(np.complex64)
    d = Fm(fs3, bw3)
    _, y = d(d.init_state(), jnp.asarray(iq_fm))
    log(f"nfm_sinad={sinad_db(np.asarray(y), 1000.0, fs3):.1f} dB")

    fsa, bwa = 15000.0, 10000.0
    ta = np.arange(n3) / fsa
    iq_am = ((1.0 + 0.6 * np.sin(2 * np.pi * 1000.0 * ta)) * 0.4).astype(np.complex64)
    d = Am(fsa, bwa)
    _, y = d(d.init_state(), jnp.asarray(iq_am))
    log(f"am_sinad={sinad_db(np.asarray(y), 1000.0, fsa, skip=30000):.1f} dB")

    fss, bws = 24000.0, 3000.0
    ts = np.arange(n3) / fss
    iq_usb = np.exp(2j * np.pi * (700.0 - bws / 2) * ts).astype(np.complex64)
    d = Ssb(fss, bws, mode="usb")
    _, y = d(d.init_state(), jnp.asarray(iq_usb))
    log(f"usb_sinad={sinad_db(np.asarray(y), 700.0, fss, skip=30000):.1f} dB")

    # --- Meteor symbol + .s soft-byte equality vs oracle ---------------
    from sdrtpu.kernels.psk import MeteorDemod
    from sdrtpu.io.symbols import quantize_soft
    fs_m, iq_m = fixture("meteor_qpsk_150k.wav")
    kw = dict(symbolrate=72000.0, samplerate=fs_m, rrc_tap_count=33,
              rrc_beta=0.6)
    om = ref.RefMeteor(agc_rate=0.1, costas_bw=0.005, omega_gain=1e-6,
                       mu_gain=0.01, **kw)
    k = MeteorDemod(agc_rate=0.1, costas_bandwidth=0.005,
                    omega_gain=1e-6, mu_gain=0.01, **kw)
    st = k.init_state()
    got = []
    block = 15000
    for i in range(0, len(iq_m) - block + 1, block):
        st, (sym, valid) = k(st, jnp.asarray(iq_m[i: i + block]))
        got.append(np.asarray(sym)[np.asarray(valid)])
    got = np.concatenate(got)
    want = np.concatenate(
        [om.process(iq_m[i: i + block])
         for i in range(0, len(iq_m) - block + 1, block)])
    m = min(len(got), len(want))
    close = np.isclose(got[:m], want[:m], atol=2e-2).mean()
    byte_match = (quantize_soft(got[:m]) == quantize_soft(want[:m])).mean()
    log(f"meteor_symbols close={close:.2%} s_byte_equality={byte_match:.2%} "
        f"({m} symbols)")


if __name__ == "__main__":
    main()
