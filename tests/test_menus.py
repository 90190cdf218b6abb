"""Module menu surface: registry + scanner/recorder/fm/radio panels
round-tripped over the SmGui wire protocol."""

import numpy as np

from sdrtpu.apps.frequency_manager import Bookmark, FrequencyManager
from sdrtpu.apps.menus import (
    FrequencyManagerMenu,
    MenuRegistry,
    RadioMenu,
    RecorderMenu,
    ScannerMenu,
)
from sdrtpu.apps.scanner import Scanner
from sdrtpu.io import smgui


def render_widgets(menu: smgui.RemoteMenu, diff_id="", diff_value=None):
    return smgui.parse_widgets(menu.render(diff_id, diff_value))


class TestRegistry:
    def test_sections_and_order(self):
        reg = MenuRegistry()
        reg.register("Alpha", lambda g: g.text("a"))
        reg.register("Beta", lambda g: g.text("b"))
        widgets = render_widgets(reg.remote())
        texts = [w.operands[0].s for w in widgets
                 if w.step == smgui.STEP_TEXT]
        assert texts == ["-- Alpha --", "a", "-- Beta --", "b"]
        reg.unregister("Alpha")
        assert reg.names == ["Beta"]


class TestScannerMenu:
    def make(self):
        sc = Scanner(88e6, 108e6, 100e3, vfo_bandwidth=200e3, level_db=-50.0)
        toggles = []
        m = ScannerMenu(sc, on_toggle=toggles.append)
        return sc, m, toggles

    def test_render_and_actions(self):
        sc, m, toggles = self.make()
        menu = smgui.RemoteMenu(m.draw)
        widgets = render_widgets(menu)
        labels = [w.label for w in widgets if w.label]
        assert "##sdrtpu_scan_start" in labels
        assert any(l.startswith("Start##sdrtpu_scan_run") for l in labels)
        # edit the stop frequency over the wire
        menu.render("##sdrtpu_scan_stop", smgui.Elem.integer(96_000_000))
        assert sc.stop_freq == 96e6
        # start scanning
        menu.render("Start##sdrtpu_scan_run", smgui.Elem.integer(0))
        assert toggles == [True]
        widgets = render_widgets(menu)
        assert any(w.label and w.label.startswith("Stop##sdrtpu_scan_run")
                   for w in widgets)


class TestRecorderMenu:
    def test_record_stop_cycle(self):
        events = []
        st = {"mode_id": 0, "type_id": 0, "template": "$t", "recording": False,
              "recorder": None}
        m = RecorderMenu(st, on_record=lambda: events.append("rec"),
                         on_stop=lambda: events.append("stop"))
        menu = smgui.RemoteMenu(m.draw)
        menu.render("Record##sdrtpu_rec_btn", smgui.Elem.integer(0))
        assert st["recording"] and events == ["rec"]
        menu.render("Stop##sdrtpu_rec_btn", smgui.Elem.integer(0))
        assert not st["recording"] and events == ["rec", "stop"]

    def test_disabled_while_recording(self):
        st = {"recording": True, "recorder": None}
        menu = smgui.RemoteMenu(RecorderMenu(st).draw)
        widgets = render_widgets(menu)
        steps = [w.step for w in widgets]
        assert smgui.STEP_BEGIN_DISABLED in steps
        assert smgui.STEP_END_DISABLED in steps


class TestFrequencyManagerMenu:
    def test_apply_tunes(self):
        fm = FrequencyManager()
        fm.add("General", "NOAA", Bookmark(162_400_000.0, 12500.0, "nfm"))
        fm.add("General", "BBC", Bookmark(93_500_000.0, 200e3, "wfm"))
        tunes = []
        m = FrequencyManagerMenu(
            fm, tune=lambda f, mode, bw: tunes.append((f, mode, bw))
        )
        menu = smgui.RemoteMenu(m.draw)
        widgets = render_widgets(menu)
        combo = next(w for w in widgets if w.step == smgui.STEP_COMBO)
        assert smgui.split_combo_items(combo.operands[2].s) == ["NOAA", "BBC"]
        menu.render("##sdrtpu_fm_sel", smgui.Elem.integer(1))
        menu.render("Apply##sdrtpu_fm_apply", smgui.Elem.integer(0))
        assert tunes == [(93_500_000.0, "wfm", 200e3)]


class TestRadioMenu:
    def test_mode_switch_and_squelch(self):
        changes = []
        st = {"mode": "wfm", "squelch_on": False, "squelch_db": -50.0,
              "volume": 1.0, "muted": False}
        menu = smgui.RemoteMenu(RadioMenu(st, changes.append).draw)
        menu.render("NFM##sdrtpu_radio_mode_nfm", smgui.Elem.integer(0))
        assert st["mode"] == "nfm"
        menu.render("Squelch##sdrtpu_radio_sq_on", smgui.Elem.boolean(True))
        assert st["squelch_on"]
        widgets = render_widgets(menu)
        labels = [w.label for w in widgets if w.label]
        assert "##sdrtpu_radio_sq_lv" in labels  # slider appears when on
        menu.render("##sdrtpu_radio_sq_lv", smgui.Elem.floating(-37.5))
        assert abs(st["squelch_db"] + 37.5) < 1e-6
        assert len(changes) >= 3
