"""NOAA HRPT deframer tests."""

import numpy as np

from sdrtpu.decoders.hrpt import (
    HrptDeframer,
    avhrr_lines,
    build_frame,
    pack_words,
    unpack_words,
)

RNG = np.random.default_rng(31)


def test_word_packing_roundtrip():
    words = RNG.integers(0, 1024, 100).astype(np.uint16)
    np.testing.assert_array_equal(pack_words(unpack_words(words)), words)


def test_deframe_with_offset_and_errors():
    img = RNG.integers(0, 1024, (5, 2048)).astype(np.uint16)
    frame = build_frame(avhrr=img)
    bits = unpack_words(frame)
    stream = np.concatenate([
        RNG.integers(0, 2, 777).astype(np.uint8),
        bits,
        RNG.integers(0, 2, 100).astype(np.uint8),
    ])
    stream[780] ^= 1  # error inside the sync word
    d = HrptDeframer()
    frames = d.process(stream)
    assert len(frames) == 1
    lines = avhrr_lines(frames[0])
    # one corrupted bit may hit a video word; all but <=1 pixel must match
    mism = np.count_nonzero(lines != img)
    assert mism <= 1


def test_streaming_chunks():
    frames_in = [build_frame() for _ in range(3)]
    bits = np.concatenate([unpack_words(f) for f in frames_in])
    d = HrptDeframer()
    out = []
    for i in range(0, len(bits), 10007):
        out.extend(d.process(bits[i : i + 10007]))
    assert len(out) == 3
