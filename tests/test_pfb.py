"""PFB channelizer: tone extraction, streaming, K-window, retune."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.shard.pfb import PfbChannelizer, plan_pfb

FS = 10_000_000.0
IF = 250_000.0


def _block_len(k=1):
    m = PfbChannelizer.block_multiple_for(FS, IF)
    return m * 64 * k


def _tones(offsets, fines, n, amps=None):
    t = np.arange(n) / FS
    x = np.zeros(n, np.complex128)
    amps = amps or [1.0] * len(offsets)
    for f0, df, a in zip(offsets, fines, amps):
        x += a * np.exp(2j * np.pi * (f0 + df) * t)
    return x.astype(np.complex64)


def test_plan_is_sane():
    M, D, tpp = plan_pfb(FS, IF)
    assert M % D == 0 and tpp >= 4
    fb = FS / D
    assert fb > IF  # oversampled bins resample DOWN to the IF rate


def test_tones_extracted_per_channel():
    offsets = np.array([-3e6, -1e6, 0.5e6, 2e6])
    fines = [10e3, -15e3, 20e3, 5e3]
    ch = PfbChannelizer(offsets, FS, IF, _block_len())
    n = _block_len()
    x = _tones(offsets, fines, n)
    st, y = ch(ch.init_state(), jnp.asarray(x))
    y = np.asarray(y)
    assert y.shape == (4, ch.out_len(n))
    skip = y.shape[1] // 2  # filter fill
    freqs = np.fft.fftfreq(y.shape[1] - skip, 1.0 / IF)
    for c, df in enumerate(fines):
        spec = np.abs(np.fft.fft(y[c, skip:] * np.hanning(y.shape[1] - skip)))
        peak = freqs[np.argmax(spec)]
        assert abs(peak - df) < 2e3, (c, peak, df)
        # unit passband gain within ~1.5 dB (complex tone: |y| = A)
        amp = float(np.mean(np.abs(y[c, skip:])))
        assert 0.84 < amp < 1.19, (c, amp)


def test_rejection_of_far_tone():
    offsets = np.array([-3e6, 2e6])
    ch = PfbChannelizer(offsets, FS, IF, _block_len())
    n = _block_len()
    # tone ONLY in channel 1's band
    x = _tones([2e6], [10e3], n)
    st, y = ch(ch.init_state(), jnp.asarray(x))
    y = np.asarray(y)
    skip = y.shape[1] // 2
    p0 = np.sqrt(np.mean(np.abs(y[0, skip:]) ** 2))
    p1 = np.sqrt(np.mean(np.abs(y[1, skip:]) ** 2))
    assert p1 > 0.5
    rej_db = 20 * np.log10(max(p0, 1e-12) / p1)
    assert rej_db < -50, rej_db


def test_streaming_chunked_equals_whole():
    offsets = np.array([-2e6, 1e6, 3e6])
    blk = _block_len()
    n = 3 * blk
    x = _tones(offsets, [12e3, -8e3, 3e3], n)
    ch1 = PfbChannelizer(offsets, FS, IF, blk)
    st = ch1.init_state()
    outs = []
    for b in x.reshape(3, blk):
        st, y = ch1(st, jnp.asarray(b))
        outs.append(np.asarray(y))
    seq = np.concatenate(outs, axis=-1)

    ch2 = PfbChannelizer(offsets, FS, IF, blk)
    st2, whole = ch2(ch2.init_state(), jnp.asarray(x))  # K=3 window
    np.testing.assert_allclose(np.asarray(whole), seq, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(st2["tail"]), np.asarray(st["tail"]), atol=1e-6
    )


def test_retune_moves_channel():
    offsets = np.array([-2e6, 1e6])
    blk = _block_len()
    ch = PfbChannelizer(offsets, FS, IF, blk)
    st = ch.init_state()
    x_new = _tones([3e6], [7e3], blk)
    st, _ = ch(st, jnp.asarray(_tones(offsets, [5e3, 5e3], blk)))
    st = ch.retune_state(st, np.array([3e6, 1e6]))
    # feed the new-band tone for two blocks (filter transient), then check
    for _ in range(2):
        st, y = ch(st, jnp.asarray(x_new))
    y = np.asarray(y)
    skip = y.shape[1] // 2
    freqs = np.fft.fftfreq(y.shape[1] - skip, 1.0 / IF)
    spec = np.abs(np.fft.fft(y[0, skip:]))
    assert abs(freqs[np.argmax(spec)] - 7e3) < 2e3


def test_pipeline_with_pfb_front():
    """Full WBFM pipeline on the PFB front end recovers stereo audio
    (same harness as the fft-front pipeline tests)."""
    from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline

    fs = 2_000_000.0
    offs = np.linspace(-0.35, 0.35, 4) * fs
    mpfb = PfbChannelizer.block_multiple_for(fs, IF)
    from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline as W
    mp = W.block_multiple(fs)
    block = int(np.lcm(mpfb, mp)) * 4
    K = 4
    t = np.arange(K * block) / fs
    x = np.zeros(t.shape, np.complex128)
    tones = []
    for i, f0 in enumerate(offs):
        L = np.sin(2 * np.pi * (400 + 150 * i) * t)
        R = np.sin(2 * np.pi * (900 + 150 * i) * t)
        mpx = (0.45 * (L + R) + 0.1 * np.sin(2 * np.pi * 19000 * t)
               + 0.45 * (L - R) * np.sin(2 * np.pi * 38000 * t))
        ph = np.cumsum(2 * np.pi * 75000.0 * mpx / fs)
        x += 0.4 * np.exp(1j * (2 * np.pi * f0 * t + ph))
        tones.append(400 + 150 * i)
    x = x.astype(np.complex64)

    pipe = W(offs, fs, block, channelizer_method="pfb")
    assert pipe.channelizer.method == "pfb"
    st, a = pipe.scan_call(pipe.init_state(),
                           jnp.asarray(x.reshape(K, block)))
    a = np.asarray(a)  # (K, 2, C, n_af)
    audio = np.concatenate(list(a), axis=-1)[:, :, a.shape[-1]:]
    for c, f_l in enumerate(tones):
        left = audio[0, c] - audio[0, c].mean()
        spec = np.abs(np.fft.rfft(left * np.hanning(len(left))))
        fr = np.fft.rfftfreq(len(left), 1 / 48000.0)
        peak = fr[np.argmax(spec)]
        assert abs(peak - f_l) < 50, (c, peak, f_l)
