"""Tuner policy tests."""

from sdrtpu.apps.tuner import TunerState, tune


def make_state():
    calls = {"hw": [], "vfo": []}
    st = TunerState(
        center_freq=100e6,
        bandwidth=2.4e6,
        vfo_offsets={"v": 0.0},
        vfo_bandwidths={"v": 200e3},
        tune_hw=lambda f: calls["hw"].append(f),
        set_vfo_offset=lambda n, o: calls["vfo"].append((n, o)),
    )
    return st, calls


def test_center_tuning():
    st, calls = make_state()
    tune(st, "center", "v", 98.5e6)
    assert st.center_freq == 98.5e6
    assert st.vfo_offsets["v"] == 0.0
    assert calls["hw"] == [98.5e6]


def test_normal_within_passband():
    st, calls = make_state()
    tune(st, "normal", "v", 100.5e6)  # +500 kHz, fits in 2.4 MHz span
    assert st.center_freq == 100e6       # hardware untouched
    assert st.vfo_offsets["v"] == 500e3
    assert calls["hw"] == []


def test_normal_retunes_when_outside():
    st, calls = make_state()
    tune(st, "normal", "v", 105e6)  # way outside: must retune hardware
    assert calls["hw"], "hardware should retune"
    # VFO parked inside the band with margin
    off = st.vfo_offsets["v"]
    assert -1.2e6 < off < 1.2e6
    # absolute frequency preserved
    assert abs((st.center_freq + off) - 105e6) < 1.0


def test_iq_only():
    st, calls = make_state()
    tune(st, "iq_only", None, 99e6)
    assert st.center_freq == 99e6
    assert st.vfo_offsets["v"] == 0.0
