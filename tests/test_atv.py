"""ATV decoder: synthetic image through demod + line sync."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.decoders.atv import (
    LINE_SIZE,
    SYNC_LEN,
    AtvLineSync,
    AtvVideoDemod,
    synthesize_atv,
)

RNG = np.random.default_rng(14)


def test_image_recovered():
    img = np.clip(RNG.uniform(0.1, 1.0, (64, 256)), 0, 1)
    img[20:40, 50:100] = 1.0  # bright block feature
    iq = synthesize_atv(img)
    demod = AtvVideoDemod()
    _, video = demod((), jnp.asarray(iq))
    ls = AtvLineSync()
    st, lines = ls(ls.init_state(), video)
    lines = np.asarray(lines)
    assert lines.shape == (64, LINE_SIZE)
    # sync pulse should sit at the start of each recovered line
    sync_region = lines[5:, :SYNC_LEN].mean()
    active_region = lines[5:, SYNC_LEN + 40 :].mean()
    assert sync_region < -0.3
    assert active_region > 0.0
    # the bright feature survives at roughly the right place
    active = lines[:, SYNC_LEN + 30 :]
    bright_rows = active.mean(axis=1)
    assert bright_rows[25] > bright_rows[5] + 0.05


def test_phase_offset_handled():
    img = np.full((32, 128), 0.5)
    iq = synthesize_atv(img)
    iq = np.roll(iq, 311)  # arbitrary phase offset
    demod = AtvVideoDemod()
    _, video = demod((), jnp.asarray(iq))
    ls = AtvLineSync()
    st, lines = ls(ls.init_state(), video)
    lines = np.asarray(lines)[2:]
    assert lines[:, :SYNC_LEN].mean() < -0.3
