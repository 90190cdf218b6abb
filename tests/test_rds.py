"""RDS bit-level decoder and demod chain tests."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.decoders.rds import (
    BLOCK_A,
    OFFSETS,
    RdsDecoder,
    RdsDemod,
    SYNDROMES,
    calc_syndrome,
    correct_errors,
    encode_group,
)


class TestBlockLayer:
    def test_offset_words_give_expected_syndromes(self):
        # A valid codeword XORed with its offset word produces the block's
        # characteristic syndrome.
        g = encode_group(0x1234, 0, 0, 0, 0x4142, 0x4344)
        # first 26 bits are block A
        block = 0
        for b in g[:26]:
            block = (block << 1) | int(b)
        assert calc_syndrome(block) in SYNDROMES
        assert SYNDROMES[calc_syndrome(block)] == BLOCK_A

    def test_correct_errors_clean(self):
        g = encode_group(0xBEEF, 0, 0, 0, 0, 0)
        block = 0
        for b in g[:26]:
            block = (block << 1) | int(b)
        out, ok = correct_errors(block, BLOCK_A)
        assert ok
        assert (out >> 10) & 0xFFFF == 0xBEEF

    def test_burst_error_corrected(self):
        g = encode_group(0xCAFE, 0, 0, 0, 0, 0)
        block = 0
        for b in g[:26]:
            block = (block << 1) | int(b)
        corrupted = block ^ (0b11 << 14)  # 2-bit burst in the data
        out, ok = correct_errors(corrupted, BLOCK_A)
        assert ok
        assert (out >> 10) & 0xFFFF == 0xCAFE


class TestGroupDecoding:
    def _feed(self, dec, groups):
        for g in groups:
            dec.process(g)

    def test_ps_name(self):
        dec = RdsDecoder()
        name = b"SDRTPU  "
        groups = []
        for seg in range(4):
            d = (name[seg * 2] << 8) | name[seg * 2 + 1]
            groups.append(encode_group(0xF00D, 0, 0, seg, 0, d))
        # feed twice so sync establishes during the first pass
        self._feed(dec, groups * 2)
        assert dec.pi_code == 0xF00D
        assert dec.program_service_name == "SDRTPU  "

    def test_radiotext(self):
        dec = RdsDecoder()
        text = b"HELLO FROM TPU RADIO!" + b" " * 43
        groups = []
        for seg in range(16):
            c = (text[seg * 4] << 8) | text[seg * 4 + 1]
            d = (text[seg * 4 + 2] << 8) | text[seg * 4 + 3]
            groups.append(encode_group(0xF00D, 2, 0, seg, c, d))
        self._feed(dec, groups * 2)
        assert dec.radiotext.startswith("HELLO FROM TPU RADIO!")

    def test_program_type_name(self):
        # group 10A: two 4-char segments (reference rds.cpp:360-398)
        dec = RdsDecoder()
        name = b"POP MUSC"
        groups = []
        for seg in range(2):
            c = (name[seg * 4] << 8) | name[seg * 4 + 1]
            d = (name[seg * 4 + 2] << 8) | name[seg * 4 + 3]
            groups.append(encode_group(0xF00D, 10, 0, seg, c, d))
        self._feed(dec, groups * 2)
        assert dec.program_type_name == "POP MUSC"


class TestRdsDemodChain:
    def test_bpsk_bits_recovered(self):
        # Model the real RDS baseband: differentially-encoded bits, biphase
        # (Manchester) symbols at 1187.5 baud, as a real waveform with a
        # small carrier phase offset at 5 ksps.
        rng = np.random.default_rng(3)
        bits = rng.integers(0, 2, 600).astype(np.uint8)
        diff = np.zeros(len(bits) + 1, np.uint8)
        for i, b in enumerate(bits):
            diff[i + 1] = diff[i] ^ b  # transmit differential encoding
        sym = 1.0 - 2.0 * diff[1:].astype(np.float64)
        baud, fs = 1187.5, 5000.0
        n = int(len(sym) * fs / baud)
        t = np.arange(n) * baud / fs  # time in symbol units
        k = np.minimum(t.astype(int), len(sym) - 1)
        frac = t - k
        biphase = np.where(frac < 0.5, 1.0, -1.0)
        bb = sym[k] * biphase
        x = (bb * np.exp(1j * 0.4)).astype(np.complex64)

        d = RdsDemod()
        st, (out_bits, valid) = d(d.init_state(), jnp.asarray(x))
        got = np.asarray(out_bits)[np.asarray(valid)].astype(np.uint8)
        # The differential decode removes the BPSK polarity ambiguity; after
        # settling the decoded bit stream must match a shifted version of
        # the source bits.
        tail_len = 150
        got_tail = got[-tail_len:]
        src = bits.astype(np.uint8)
        best = 0
        for shift in range(len(src) - tail_len):
            m = np.mean(got_tail == src[shift : shift + tail_len])
            best = max(best, m)
        assert best > 0.95, f"best alignment match {best}"
