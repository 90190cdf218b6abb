"""On-device (TPU) demod quality gate — the PARITY_TPU artifact.

VERDICT r4 #1: every committed quality floor used to be CPU-measured
while the product runs on TPU with reduced-precision MXU contractions
(bf16x3 pilot/deemph/audio, DEFAULT-precision fold).  This script runs
the quality-bearing DSP on the REAL TPU, computes the PARITY.md metrics
on the on-device outputs, ASSERTS floors (a precision regression makes
the run exit non-zero), and emits one JSON line (last line = artifact;
write it to PARITY_TPU_r{N}.json).

Phases (all on-device outputs):

A. IF-domain floors per pilot mode (the level PARITY.md's 63 dB claims
   live at): synthetic broadcast-compliant MPX at 250 kHz through
   `BroadcastFm` — separation >= 40 dB, SINAD >= 45 dB.  ("pll" mode is
   the per-sample parity-test scan, not a TPU product path — phases A/C
   cover the product modes envelope/normalized/regression.)
B. Committed capture through the demod on TPU vs the NumPy reference
   oracle (tests/refdsp_oracle.py): SNR of the difference >= 30 dB
   (same floor the CPU suite gates at), plus the RDS branch decoded to
   groups: PI == 0xF00D, PS == "SDRTPU  " (the planted payload,
   tests/fixtures/gen_fixtures.py).
C. Full flagship 8-VFO pipeline at 10 Msps: stereo station on one
   channel — separation/SINAD >= 45 dB end to end (the round-5
   inverse-sinc MPX equalizer lifted the pipeline ceiling from ~34 dB;
   CPU measures ~56/52).

Reference bar: BASELINE.md "demod SNR parity" on the target hardware
(``core/src/dsp/demod/broadcast_fm.h:144-215``).
"""

import json
import os
import sys
import time

import numpy as np
import jax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
if os.environ.get("SDRTPU_PARITY_CPU"):
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

import jax.numpy as jnp  # noqa: E402

from sdrtpu.graph.compile import complexify, realify  # noqa: E402

# Floors sit ~10 dB under the round-5 TPU measurements (IF 68/64.5,
# oracle 51.1, pipeline 65.7/60.9) so a genuine precision regression
# trips the gate while session noise cannot.  VERDICT r4 #1 originally
# asked >=40/45; tightened once the droop fixes landed.
FLOORS = {
    "if_separation_db": 55.0,
    "if_sinad_db": 55.0,
    "oracle_snr_db": 40.0,
    "pipeline_separation_db": 55.0,
    "pipeline_sinad_db": 50.0,
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _f(x):
    return float(x)


def tone_power(x, f, fs, bw=60.0):
    n = len(x)
    spec = np.abs(np.fft.rfft(x * np.hanning(n))) ** 2
    fr = np.fft.rfftfreq(n, 1 / fs)
    return spec[(fr > f - bw) & (fr < f + bw)].sum()


def sinad_db(x, f, fs):
    n = len(x)
    spec = np.abs(np.fft.rfft(x * np.hanning(n))) ** 2
    fr = np.fft.rfftfreq(n, 1 / fs)
    sig = (fr > f - 60) & (fr < f + 60)
    rest = ~sig & (fr > 100) & (fr < 15000)
    return 10 * np.log10(spec[sig].sum() / spec[rest].sum())


def snr_db(ref, err):
    return 10 * np.log10(
        (np.asarray(ref) ** 2).sum() / max((np.asarray(err) ** 2).sum(), 1e-30)
    )


def run_blocks_tpu(op, x, block, extract=lambda y: y):
    """Stream complex x through a StreamOp with realified jit boundaries.

    ``extract`` maps the op's per-block output to the (real) array to
    collect (applied inside jit so unused branches are dead-code).
    """
    @jax.jit
    def step(rst, re, im):
        st, y = op(complexify(rst), jax.lax.complex(re, im))
        return realify(st), extract(y)

    rst = realify(op.init_state())
    outs = []
    n = (len(x) // block) * block
    for i in range(0, n, block):
        blk = x[i:i + block]
        re = np.ascontiguousarray(blk.real.astype(np.float32))
        im = np.ascontiguousarray(blk.imag.astype(np.float32))
        rst, y = step(rst, re, im)
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


def synth_mpx_station(fs, n, dev=75000.0, phi0=0.0, offset=0.0, t0=0):
    """Broadcast-compliant stereo MPX station (peak mpx ~0.82)."""
    t = (np.arange(n) + t0) / fs
    Lw = 0.8 * np.sin(2 * np.pi * 1000.0 * t)
    Rw = 0.8 * np.sin(2 * np.pi * 2500.0 * t)
    mpx = (0.225 * (Lw + Rw) + 0.1 * np.sin(2 * np.pi * 19000.0 * t)
           + 0.225 * (Lw - Rw) * np.sin(2 * np.pi * 38000.0 * t))
    phase = phi0 + np.cumsum(2 * np.pi * dev * mpx / fs)
    bb = np.exp(1j * (phase + 2 * np.pi * offset * t))
    return bb.astype(np.complex64), phase[-1]


def phase_a(result):
    from sdrtpu.kernels.wfm import BroadcastFm

    fsif = 250e3
    n = 1 << 19
    iq, _ = synth_mpx_station(fsif, n)
    a = {}
    for mode in ("envelope", "normalized", "regression"):
        d = BroadcastFm(75000.0, fsif, stereo=True, low_pass=True,
                        pilot_mode=mode)
        # BroadcastFm output is (stereo, rds); collect the stereo pair
        out = run_blocks_tpu(d, iq, n // 4, extract=lambda y: y[0])
        l, r = out[0][40000:], out[1][40000:]
        sep_l = 10 * np.log10(tone_power(l, 1000, fsif) / tone_power(l, 2500, fsif))
        sep_r = 10 * np.log10(tone_power(r, 2500, fsif) / tone_power(r, 1000, fsif))
        a[mode] = {
            "separation_db": _f(round(min(sep_l, sep_r), 1)),
            "sinad_db": _f(round(min(sinad_db(l, 1000.0, fsif),
                                  sinad_db(r, 2500.0, fsif)), 1)),
        }
        log(f"A {mode}: sep {sep_l:.1f}/{sep_r:.1f} "
            f"SINAD {sinad_db(l, 1000.0, fsif):.1f}/{sinad_db(r, 2500.0, fsif):.1f}")
    result["if_demod"] = a
    worst_sep = min(v["separation_db"] for v in a.values())
    worst_sinad = min(v["sinad_db"] for v in a.values())
    assert worst_sep >= FLOORS["if_separation_db"], (worst_sep, a)
    assert worst_sinad >= FLOORS["if_sinad_db"], (worst_sinad, a)
    return worst_sep, worst_sinad


def phase_b(result):
    import refdsp_oracle as ref
    from sdrtpu.decoders.rds import RdsDecoder, RdsDemod
    from sdrtpu.io.wav import read_iq_wav
    from sdrtpu.kernels.wfm import BroadcastFm

    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tests", "fixtures", "wfm_stereo_rds_250k.wav")
    info, iq = read_iq_wav(fix)
    fs = float(info.samplerate)
    # host oracle (float NumPy port of the reference per-sample chains)
    o = ref.RefBroadcastFm(75000.0, fs, low_pass=True, rds_out=True)
    lo, ro = [], []
    for i in range(0, len(iq), 25000):
        l, r, _ = o.process(iq[i:i + 25000])
        lo.append(l)
        ro.append(r)
    lo = np.concatenate(lo)
    ro = np.concatenate(ro)

    b = {}
    skip = 20000
    for mode in ("envelope", "normalized"):
        d = BroadcastFm(75000.0, fs, stereo=True, low_pass=True,
                        rds_out=True, pilot_mode=mode)

        @jax.jit
        def step(rst, re, im):
            st, (stereo, rds) = d(complexify(rst), jax.lax.complex(re, im))
            return realify(st), stereo, jnp.stack([rds.real, rds.imag])

        rst = realify(d.init_state())
        audio, rdss = [], []
        for i in range(0, len(iq) // 25000 * 25000, 25000):
            blk = iq[i:i + 25000]
            rst, a, rr = step(
                rst, np.ascontiguousarray(blk.real.astype(np.float32)),
                np.ascontiguousarray(blk.imag.astype(np.float32)))
            audio.append(np.asarray(a))
            rdss.append(np.asarray(rr))
        a = np.concatenate(audio, axis=-1)
        n_cmp = min(a.shape[-1], len(lo))
        sl = snr_db(lo[skip:n_cmp], a[0][skip:n_cmp] - lo[skip:n_cmp])
        sr = snr_db(ro[skip:n_cmp], a[1][skip:n_cmp] - ro[skip:n_cmp])
        b[mode] = {"oracle_snr_db": _f(round(min(sl, sr), 1))}
        log(f"B {mode}: oracle SNR {sl:.1f}/{sr:.1f} dB")
        if mode == "envelope":
            rds_td = np.concatenate(rdss, axis=-1)
            rds_c = (rds_td[0] + 1j * rds_td[1]).astype(np.complex64)

    # RDS bits from the TPU-computed 57 kHz tap (5 ksps baseband)
    demod = RdsDemod()

    @jax.jit
    def rds_step(rst, re, im):
        st, (bits, valid) = demod(complexify(rst), jax.lax.complex(re, im))
        return realify(st), bits, valid

    rst = realify(demod.init_state())
    bits_all = []
    blk = 5000
    for i in range(0, (len(rds_c) // blk) * blk, blk):
        rst, bits, valid = rds_step(
            rst, np.ascontiguousarray(rds_c[i:i + blk].real),
            np.ascontiguousarray(rds_c[i:i + blk].imag))
        bits_all.append(np.asarray(bits)[np.asarray(valid)])
    bits = np.concatenate(bits_all)
    dec = RdsDecoder()
    dec.process(bits)
    ps = dec.program_service_name
    b["rds"] = {"pi": f"0x{dec.pi_code:04X}" if dec.pi_code else None,
                "ps": ps}
    log(f"B rds: PI={b['rds']['pi']} PS={ps!r} ({len(bits)} bits)")
    result["oracle"] = b
    worst = min(v["oracle_snr_db"] for k, v in b.items() if k != "rds")
    assert worst >= FLOORS["oracle_snr_db"], (worst, b)
    assert dec.pi_code == 0xF00D, b["rds"]
    assert ps.strip() == "SDRTPU", b["rds"]
    return worst, b["rds"]


def phase_c(result):
    from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline

    fs = 10e6
    m = WbfmMultiVfoPipeline.block_multiple(fs)
    block_len = (500_000 // m) * m
    offsets = np.linspace(-0.4 * fs, 0.4 * fs, 8)
    # skip_rotator=True matches the bench flagship configuration (the
    # discriminator-compensated path is what ships)
    pipe = WbfmMultiVfoPipeline(offsets, fs, block_len, spectrum=False,
                                skip_rotator=True)
    ch = 3
    n_blocks = 10

    @jax.jit
    def step(rst, re, im):
        st, a = pipe(complexify(rst), jax.lax.complex(re, im))
        return realify(st), a

    rst = realify(pipe.init_state())
    phi = 0.0
    outs = []
    for b in range(n_blocks):
        bb, phi = synth_mpx_station(fs, block_len, phi0=phi,
                                    offset=offsets[ch], t0=b * block_len)
        rst, a = step(rst, np.ascontiguousarray(bb.real),
                      np.ascontiguousarray(bb.imag))
        outs.append(np.asarray(a))
    a = np.concatenate(outs, axis=-1)
    afs = 48000.0
    l = a[0, ch][8000:]
    r = a[1, ch][8000:]
    sep_l = 10 * np.log10(tone_power(l, 1000, afs) / tone_power(l, 2500, afs))
    sep_r = 10 * np.log10(tone_power(r, 2500, afs) / tone_power(r, 1000, afs))
    si_l = sinad_db(l, 1000.0, afs)
    si_r = sinad_db(r, 2500.0, afs)
    iso = 10 * np.log10(np.mean(l ** 2)
                        / max(np.mean(a[0, 0][8000:] ** 2), 1e-30))
    log(f"C pipeline: sep {sep_l:.1f}/{sep_r:.1f} SINAD {si_l:.1f}/{si_r:.1f} "
        f"iso {iso:.1f}")
    result["pipeline"] = {
        "separation_db": _f(round(min(sep_l, sep_r), 1)),
        "sinad_db": _f(round(min(si_l, si_r), 1)),
        "station_vs_noisefloor_channel_db": _f(round(iso, 1)),
    }
    assert min(sep_l, sep_r) >= FLOORS["pipeline_separation_db"], result["pipeline"]
    assert min(si_l, si_r) >= FLOORS["pipeline_sinad_db"], result["pipeline"]
    return min(sep_l, sep_r), min(si_l, si_r)


def main():
    t0 = time.time()
    result = {
        "metric": "tpu_demod_quality_gate",
        "platform": jax.devices()[0].platform,
        "floors": FLOORS,
    }
    ok = True
    try:
        phase_a(result)
        phase_b(result)
        phase_c(result)
    except AssertionError as e:
        ok = False
        result["failure"] = repr(e)
    result["value"] = 1 if ok else 0
    result["unit"] = "pass"
    result["elapsed_s"] = round(time.time() - t0, 1)
    print(json.dumps(result), flush=True)
    out = os.environ.get("SDRTPU_PARITY_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
