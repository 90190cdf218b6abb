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


def _line(kind, value=0.5):
    from sdrtpu.decoders.atv import SYNC_LEVEL, ACTIVE_START

    row = np.zeros(LINE_SIZE, np.float32)
    if kind == "video":
        row[:SYNC_LEN] = SYNC_LEVEL
        row[ACTIVE_START:] = value
    elif kind == "short":  # equalizing pulse: half-width sync
        row[:35] = SYNC_LEVEL
    elif kind == "long":  # broad pulse: sync for most of the line
        row[: LINE_SIZE - 25] = SYNC_LEVEL
    return row


def test_classify_sync_codes():
    from sdrtpu.decoders.atv import classify_sync

    lines = np.stack([_line("video"), _line("short"), _line("long")])
    np.testing.assert_array_equal(classify_sync(lines), [0, 1, 2])


def test_interlaced_field_assembly():
    """Two synthesized fields assemble into one interlaced frame with the
    correct parity (reference field logic, atv main.cpp:236-280)."""
    from sdrtpu.decoders.atv import AtvFrameAssembler

    # 2-bit sync-code signatures, oldest line first (main.cpp:242-244)
    even_seq = [0, 1, 1, 2, 2, 2, 1, 1]
    odd_seq = [1, 1, 1, 2, 2, 1, 1, 1]
    kind = {0: "video", 1: "short", 2: "long"}

    # Full 625-line PAL cadence: the even field's 313 lines end exactly at
    # ypos 624 and the odd field's 312 at ypos 623, so the detected syncs
    # AGREE with the line-count flywheel and vlock rises (main.cpp:247-255)
    lines = []
    lines += [_line("video", 0.1)] * 4                 # preamble
    lines += [_line(kind[c]) for c in even_seq]        # -> even field
    lines += [_line("video", 0.25)] * 305              # even rows content
    lines += [_line(kind[c]) for c in odd_seq]         # -> odd field
    lines += [_line("video", 0.75)] * 304              # odd rows content
    lines += [_line(kind[c]) for c in even_seq]        # frame completes
    asm = AtvFrameAssembler()
    # feed in two chunks to exercise streaming
    frames = asm.process(np.stack(lines[:100]))
    frames += asm.process(np.stack(lines[100:]))
    assert len(frames) >= 1
    frame = frames[-1]
    # even rows carry the even field's 0.25, odd rows the odd field's 0.75
    assert abs(frame[0:500:2].mean() - 0.25) < 0.02, frame[0:500:2].mean()
    assert abs(frame[1:500:2].mean() - 0.75) < 0.02, frame[1:500:2].mean()
    # both in-cadence field syncs agreed with the flywheel
    assert asm.vlock == 2


def test_subsample_line_phase():
    """A fractional-sample timing offset is estimated and corrected:
    the parabolic refinement (linesync.h polyphase-NCO equivalent)."""
    from sdrtpu.decoders.atv import line_phase

    img = np.full((48, 128), 0.5, np.float32)
    iq = synthesize_atv(img)
    env = np.abs(iq).astype(np.float64)
    # apply a 0.37-sample fractional delay by linear interpolation
    shift = 0.37
    n = np.arange(len(env) - 1)
    delayed = env[:-1] * (1 - shift) + env[1:] * shift
    demod = AtvVideoDemod()
    _, v0 = demod((), jnp.asarray(env[: 40 * LINE_SIZE].astype(np.float32)))
    _, v1 = demod((), jnp.asarray(delayed[: 40 * LINE_SIZE].astype(np.float32)))
    p0 = float(line_phase(v0))
    p1 = float(line_phase(v1))
    # the delayed signal's sync sits `shift` samples EARLIER in sampled
    # coordinates: phase decreases by the fractional delay (mod line)
    d = (p0 - p1) % LINE_SIZE
    d = d if d < LINE_SIZE / 2 else d - LINE_SIZE
    assert abs(d - shift) < 0.1, (p0, p1, d)
