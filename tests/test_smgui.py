"""SmGui remote-UI draw-list tests: wire roundtrip, diff application,
and a full GET_UI / UI_ACTION session against SdrppServer."""

import struct

import numpy as np

from sdrtpu.io import smgui
from sdrtpu.io.server_protocol import SdrppClient, SdrppServer


class TestWireFormat:
    def test_item_roundtrip(self):
        items = [
            smgui.Elem(smgui.ELEM_DRAW_STEP, step=smgui.STEP_COMBO, force_sync=True),
            smgui.Elem.boolean(True),
            smgui.Elem.integer(-42),
            smgui.Elem.floating(3.5),
            smgui.Elem.string("hello\x00world"),
        ]
        data = smgui.store_list(items)
        back = smgui.load_list(data)
        assert len(back) == len(items)
        assert back[0].step == smgui.STEP_COMBO and back[0].force_sync
        assert back[1].b is True
        assert back[2].i == -42
        assert abs(back[3].f - 3.5) < 1e-7
        assert back[4].s == "hello\x00world"

    def test_layout_matches_reference(self):
        # storeItem layout (smgui.cpp:304-342): type byte then payload.
        assert smgui.store_item(smgui.Elem.integer(1)) == b"\x02" + struct.pack(
            "<i", 1
        )
        assert smgui.store_item(smgui.Elem.string("ab")) == b"\x04\x02\x00ab"
        step = smgui.Elem(smgui.ELEM_DRAW_STEP, step=0x80, force_sync=False)
        assert smgui.store_item(step) == b"\x00\x80\x00"

    def test_combo_items_nul_separated(self):
        assert smgui.combo_items(["File", "Network"]) == "File\x00Network"
        assert smgui.split_combo_items("a\x00b") == ["a", "b"]


class TestRecorderAndDiff:
    def _menu(self, state):
        def draw(gui):
            gui.fill_width()
            gui.force_sync()
            _, state["src"] = gui.combo("##src", state["src"], ["File", "Net"])
            gui.left_label("Path")
            changed, state["path"] = gui.input_text("##path", state["path"])
            if changed:
                state["path_changed"] = True
            if gui.button("Refresh##btn"):
                state["refreshed"] = True
            _, state["loop"] = gui.checkbox("Loop##cb", state["loop"])

        return draw

    def test_record_and_parse(self):
        state = {"src": 0, "path": "/tmp/x.wav", "loop": True}
        menu = smgui.RemoteMenu(self._menu(state))
        widgets = smgui.parse_widgets(menu.render())
        steps = [w.step for w in widgets]
        assert smgui.STEP_COMBO in steps
        assert smgui.STEP_INPUT_TEXT in steps
        assert smgui.STEP_BUTTON in steps
        assert smgui.STEP_CHECKBOX in steps
        combo = next(w for w in widgets if w.step == smgui.STEP_COMBO)
        # ForceSync marks the recorded step element
        assert combo.label == "##src"
        assert smgui.split_combo_items(combo.operands[2].s) == ["File", "Net"]
        text = next(w for w in widgets if w.step == smgui.STEP_INPUT_TEXT)
        assert text.operands[1].s == "/tmp/x.wav"

    def test_diff_updates_state_and_rerender(self):
        state = {"src": 0, "path": "", "loop": False}
        menu = smgui.RemoteMenu(self._menu(state))
        menu.render()  # initial frame
        out = menu.render("##src", smgui.Elem.integer(1))
        assert state["src"] == 1
        combo = next(
            w for w in smgui.parse_widgets(out) if w.step == smgui.STEP_COMBO
        )
        assert combo.operands[1].i == 1  # re-rendered frame reflects new state

        menu.render("##path", smgui.Elem.string("/cap.wav"))
        assert state["path"] == "/cap.wav" and state.get("path_changed")
        menu.render("Refresh##btn", smgui.Elem.integer(0))
        assert state.get("refreshed")
        menu.render("Loop##cb", smgui.Elem.boolean(True))
        assert state["loop"] is True


def test_server_remote_ui_session():
    state = {"mode": 0, "gain": 20.0}

    def draw(gui):
        _, state["mode"] = gui.combo("##mode", state["mode"], ["wfm", "nfm", "am"])
        _, state["gain"] = gui.slider_float("##gain", state["gain"], 0.0, 50.0)

    server = SdrppServer(
        "127.0.0.1", 0, samplerate=48000.0, menu=smgui.RemoteMenu(draw)
    )
    try:
        cli = SdrppClient("127.0.0.1", server.port)
        widgets = cli.get_ui()
        labels = [w.label for w in widgets]
        assert "##mode" in labels and "##gain" in labels

        widgets = cli.ui_action("##mode", smgui.Elem.integer(2))
        assert state["mode"] == 2
        combo = next(w for w in widgets if w.step == smgui.STEP_COMBO)
        assert combo.operands[1].i == 2

        cli.ui_action("##gain", smgui.Elem.floating(35.0), sendback=False)
        # fire-and-forget action still applies server-side
        for _ in range(50):
            if state["gain"] == np.float32(35.0):
                break
            import time

            time.sleep(0.02)
        assert state["gain"] == np.float32(35.0)
        cli.close()
    finally:
        server.close()


def test_server_app_menu():
    from sdrtpu.apps.server import ServerMenu

    st = {"source_id": 0, "path": "/a.wav", "samplerate": 2.4e6, "running": False}
    menu = smgui.RemoteMenu(ServerMenu(st).draw)
    widgets = smgui.parse_widgets(menu.render())
    combo = next(w for w in widgets if w.step == smgui.STEP_COMBO)
    assert smgui.split_combo_items(combo.operands[2].s) == ["File", "Network"]
    # switch to network source via an action: menu now shows port/sample type
    out = menu.render("##sdrtpu_server_src_sel", smgui.Elem.integer(1))
    assert st["source_id"] == 1
    labels = [w.label for w in smgui.parse_widgets(out)]
    assert "##sdrtpu_net_port" in labels and "##sdrtpu_net_fmt" in labels
    # while running the menu is wrapped in BeginDisabled/EndDisabled
    st["running"] = True
    steps = [w.step for w in smgui.parse_widgets(menu.render())]
    assert smgui.STEP_BEGIN_DISABLED in steps and smgui.STEP_END_DISABLED in steps
