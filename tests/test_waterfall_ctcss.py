"""Waterfall view math and CTCSS tone squelch tests."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.apps.waterfall import (
    WaterfallView,
    build_palette,
    do_zoom,
    vfo_signal_info,
    _default_colormap,
)
from sdrtpu.kernels.ctcss import CTCSS_TONES, CtcssSquelch, TONE_ANY


class TestDoZoom:
    def test_identity_width(self):
        line = np.arange(64, dtype=np.float32)
        out = do_zoom(line, 0, 64, 64)
        np.testing.assert_array_equal(out, line)

    def test_max_decimation(self):
        line = np.zeros(1024, np.float32)
        line[100] = 50.0
        out = do_zoom(line, 0, 1024, 128)
        assert out.max() == 50.0  # peak survives decimation
        assert np.argmax(out) == 100 // 8


class TestSnr:
    def test_tone_snr(self):
        n = 4096
        line = np.full(n, -100.0, np.float32)
        # tone at +100 kHz in a 1 MHz span
        idx = int(100e3 / 500e3 * (n // 2)) + n // 2
        line[idx] = -30.0
        strength, snr = vfo_signal_info(line, 100e3, 12500.0, 1e6)
        assert abs(strength + 30.0) < 0.1
        assert abs(snr - 70.0) < 0.5


class TestWaterfallView:
    def test_push_and_palette(self):
        wf = WaterfallView(1024, height=16, view_width=256)
        lines = np.random.default_rng(0).uniform(-80, -10, (4, 1024)).astype(
            np.float32
        )
        wf.push(lines)
        assert wf.fb.shape == (16, 256, 4)
        assert wf.fb[0, :, 3].min() == 255  # opaque
        np.testing.assert_array_equal(wf.latest_raw(), lines[-1])

    def test_palette_resolution(self):
        lut = build_palette(_default_colormap())
        assert lut.shape == (1000, 4)
        assert lut[0, 2] > lut[0, 0]  # dark blue start


class TestCtcss:
    def _make_audio(self, fs, tone_hz, n):
        t = np.arange(n) / fs
        voice = 0.3 * np.sin(2 * np.pi * 1000.0 * t)
        tone = 0.15 * np.sin(2 * np.pi * tone_hz * t)
        mono = (voice + tone).astype(np.float32)
        return np.stack([mono, mono])

    def test_detects_tone_and_opens(self):
        fs = 48000.0
        sq = CtcssSquelch(fs, required_tone=TONE_ANY)
        n = 48000 * 2
        audio = self._make_audio(fs, float(CTCSS_TONES[12]), n)  # 100 Hz
        st = sq.init_state()
        st, (out, tone) = sq(st, jnp.asarray(audio))
        # after 2 s the tone should be identified and audio unmuted
        assert int(tone) == 12, f"detected tone {int(tone)}"
        assert not bool(st["mute"])

    def test_mutes_without_tone(self):
        fs = 48000.0
        sq = CtcssSquelch(fs, required_tone=12)
        n = 48000 * 2
        rng = np.random.default_rng(0)
        noise = (0.3 * rng.standard_normal((2, n))).astype(np.float32)
        st = sq.init_state()
        st, (out, tone) = sq(st, jnp.asarray(noise))
        assert bool(st["mute"])
        assert np.allclose(np.asarray(out), 0.0)


class TestResources:
    def test_bundled_colormaps_load(self):
        import glob
        from sdrtpu.apps.waterfall import load_colormap, build_palette

        files = glob.glob("res/colormaps/*.json")
        assert len(files) >= 5
        for f in files:
            lut = build_palette(load_colormap(f))
            assert lut.shape == (1000, 4)

    def test_bundled_bandplan_loads(self):
        from sdrtpu.apps.bandplan import BandPlan

        bp = BandPlan.load("res/bandplans/general.json")
        assert bp.lookup(98.5e6)


class TestWaterfallPng:
    def test_save_png(self, tmp_path):
        import numpy as np
        from sdrtpu.apps.waterfall import save_waterfall_png

        rng = np.random.default_rng(0)
        lines = rng.uniform(-80, -10, (40, 256)).astype(np.float32)
        out = tmp_path / "wf.png"
        save_waterfall_png(str(out), lines, width=128)
        from PIL import Image

        img = Image.open(out)
        assert img.size == (128, 40) and img.mode == "RGBA"


class TestThemeManager:
    def test_bundled_themes_load(self):
        from sdrtpu.apps.theme import ThemeManager

        tm = ThemeManager()
        n = tm.load_themes_from_dir("res/themes")
        assert n >= 2
        assert set(tm.get_theme_names()) >= {"Dark", "Light"}
        thm = tm.apply("Dark")
        assert thm.author == "sdrtpu"
        r, g, b, a = thm.colors["Text"]
        assert a == 1.0 and 0.0 <= r <= 1.0

    def test_color_decode_and_errors(self, tmp_path):
        import json
        import pytest
        from sdrtpu.apps.theme import ThemeManager, decode_color

        assert decode_color("#FF000080") == (1.0, 0.0, 0.0, 128 / 255.0)
        with pytest.raises(ValueError):
            decode_color("#FFF")  # wrong length
        tm = ThemeManager()
        bad = tmp_path / "bad.json"
        bad.write_text(json.dumps({"author": "x"}))  # missing name
        with pytest.raises(ValueError):
            tm.load_theme(str(bad))
        dup = tmp_path / "dup.json"
        dup.write_text(json.dumps({"name": "Same", "Text": "#00000000"}))
        tm.load_theme(str(dup))
        dup2 = tmp_path / "dup2.json"
        dup2.write_text(json.dumps({"name": "Same"}))
        with pytest.raises(ValueError):
            tm.load_theme(str(dup2))

    def test_dir_scan_rerunnable_and_skips_bad_files(self, tmp_path):
        import json
        import pytest
        from sdrtpu.apps.theme import ThemeManager, decode_color

        good = tmp_path / "ok.json"
        good.write_text(json.dumps({"name": "Ok", "Text": "#11223344"}))
        (tmp_path / "broken.json").write_text("{not json")
        (tmp_path / "noname.json").write_text(json.dumps({"author": "x"}))
        (tmp_path / "readme.txt").write_text("skip me")
        tm = ThemeManager()
        assert tm.load_themes_from_dir(str(tmp_path)) == 1
        # refresh (re-run) must not raise duplicate errors
        assert tm.load_themes_from_dir(str(tmp_path)) == 1
        assert tm.get_theme_names() == ["Ok"]
        with pytest.raises(ValueError):
            decode_color("#FF000080\n")  # trailing newline rejected


class TestCtcssInRadioChain:
    def test_nfm_chain_gates_on_tone(self):
        """RadioChain(ctcss_tone=...) passes audio with the right
        sub-audible tone and mutes without it (afChain order parity)."""
        import jax.numpy as jnp
        from sdrtpu.apps.radio import RadioChain
        from sdrtpu.kernels.ctcss import CTCSS_TONES

        tone_idx = 12  # 100 Hz
        fs_if = 50000.0

        def run(with_tone):
            chain = RadioChain("nfm", ctcss_tone=tone_idx)
            n = chain.block_multiple()
            while n < 2 * fs_if:
                n *= 2
            t = np.arange(n) / fs_if
            msg = 0.6 * np.sin(2 * np.pi * 900.0 * t)
            if with_tone:
                msg = msg + 0.15 * np.sin(
                    2 * np.pi * float(CTCSS_TONES[tone_idx]) * t
                )
            iq = np.exp(1j * np.cumsum(2 * np.pi * 2500.0 * msg / fs_if))
            st = chain.init_state()
            st, a = chain(st, jnp.asarray(iq.astype(np.complex64)))
            # trailing audio reflects the settled squelch decision
            return np.asarray(a)[:, -4000:]

        assert np.abs(run(True)).max() > 0.05, "tone-bearing audio muted"
        assert np.abs(run(False)).max() < 1e-6, "tone-less audio not muted"
