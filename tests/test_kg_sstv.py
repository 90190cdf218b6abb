"""KG-STV decoder loopback tests."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.decoders.kg_sstv import (
    BAUDRATE,
    DEVIATION,
    RRC_ALPHA,
    KgSstvDecoder,
    KgSstvDeframer,
    encode_frame,
)
from sdrtpu.kernels.mod import QuadratureMod, RrcInterpolator

RNG = np.random.default_rng(7)


class TestDeframer:
    def test_roundtrip(self):
        payloads = [bytes(RNG.integers(0, 256, 6, dtype=np.uint8)) for _ in range(3)]
        stream = [RNG.normal(0, 0.3, 40).astype(np.float32)]
        for p in payloads:
            stream.append(encode_frame(p) + RNG.normal(0, 0.1, 171).astype(np.float32))
            stream.append(RNG.normal(0, 0.3, 25).astype(np.float32))
        d = KgSstvDeframer()
        out = []
        # feed in uneven chunks to exercise the carry buffer
        full = np.concatenate(stream)
        for chunk in np.array_split(full, 5):
            out.extend(d.process(chunk))
        assert out == payloads

    def test_sync_bit_errors_tolerated(self):
        p = bytes(RNG.integers(0, 256, 6, dtype=np.uint8))
        frame = encode_frame(p)
        frame[[3, 20, 45, 60]] *= -1.0  # 4 sync-symbol errors (max allowed)
        d = KgSstvDeframer()
        out = d.process(np.concatenate([np.full(10, -0.9, np.float32), frame]))
        assert out == [p]

    def test_coded_symbol_errors_corrected(self):
        p = bytes(RNG.integers(0, 256, 6, dtype=np.uint8))
        frame = encode_frame(p)
        flip = RNG.choice(108, 5, replace=False) + 63
        frame[flip] *= -1.0
        d = KgSstvDeframer()
        out = d.process(np.concatenate([np.zeros(5, np.float32), frame]))
        assert out == [p], "Viterbi failed to correct channel errors"


class TestFullChain:
    def test_iq_to_frames(self):
        fs = 4800.0
        sps = int(fs / BAUDRATE)
        payloads = [bytes(RNG.integers(0, 256, 6, dtype=np.uint8)) for _ in range(2)]
        # random preamble: a pure alternating pattern leaves M&M in a
        # degenerate zero-crossing equilibrium (verified on TPU + CPU)
        preamble = (RNG.integers(0, 2, 120) * 2.0 - 1.0).astype(np.float32)
        syms = np.concatenate(
            [preamble]
            + [encode_frame(p) for p in payloads]
            + [preamble[:60]]
        )
        interp = RrcInterpolator(sps, 31, RRC_ALPHA, dtype=jnp.float32)
        _, shaped = interp(interp.init_state(), jnp.asarray(syms))
        mod = QuadratureMod(DEVIATION, fs)
        _, iq = mod(mod.init_state(), shaped)
        dec = KgSstvDecoder(fs)
        out = []
        for chunk in np.array_split(np.asarray(iq), 4):
            out.extend(dec.process(chunk))
        assert out == payloads
