"""VOR bearing decoder tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdrtpu.decoders.vor import VorReceiver, synthesize_vor


@pytest.mark.parametrize("bearing", [0.0, 45.0, 137.5, 270.0, 359.0])
def test_bearing_recovered(bearing):
    fs = 25000.0
    iq = synthesize_vor(bearing, fs, seconds=1.0)
    rx = VorReceiver(fs)
    st, (deg, amp) = rx(rx.init_state(), jnp.asarray(iq))
    got = float(deg)
    err = min(abs(got - bearing), 360 - abs(got - bearing))
    assert err < 2.0, f"bearing {got} vs {bearing}"
    assert float(amp) > 0.1


def test_noise_robustness():
    fs = 25000.0
    rng = np.random.default_rng(0)
    iq = synthesize_vor(200.0, fs, seconds=1.0)
    iq = iq + 0.2 * (
        rng.standard_normal(len(iq)) + 1j * rng.standard_normal(len(iq))
    ).astype(np.complex64)
    rx = VorReceiver(fs)
    st, (deg, amp) = rx(rx.init_state(), jnp.asarray(iq))
    err = min(abs(float(deg) - 200.0), 360 - abs(float(deg) - 200.0))
    assert err < 5.0
