"""POCSAG decoder tests: bit-layer roundtrip, BCH correction, RF loopback."""

import numpy as np
import jax.numpy as jnp

from sdrtpu.decoders.pocsag import (
    MESSAGE_ALPHA,
    PocsagDecoder,
    build_transmission,
    correct_codeword,
    encode_codeword,
)

RNG = np.random.default_rng(4)


class TestBitLayer:
    def test_clean_roundtrip(self):
        bits = build_transmission(0x12345, "HELLO PAGER", frame=2)
        dec = PocsagDecoder()
        dec.process(bits)
        assert dec.messages, "no message decoded"
        addr, mtype, text = dec.messages[0]
        assert addr == (0x12345 & ~0b111) | 2
        assert mtype == MESSAGE_ALPHA
        assert text.startswith("HELLO PAGER")

    def test_multi_batch_message_continues(self):
        """An alphanumeric page longer than one batch must decode as ONE
        message with the 7-bit character phase intact across the batch
        boundary (messages end at the next address/idle codeword or
        carrier drop, not at batch end)."""
        # frame 6 leaves 3 message codewords in batch 1 -> a 60-char page
        # needs ~21 codewords and spans 3 batches
        text = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG 0123456789 END"
        bits = build_transmission(0x54321, text, frame=6)
        dec = PocsagDecoder()
        dec.process(bits)
        assert len(dec.messages) == 1, dec.messages
        assert dec.messages[0][2].startswith(text), dec.messages[0][2]

    def test_bch_corrects_two_errors(self):
        cw = encode_codeword(0x1ABCDE & 0x1FFFFF)
        for _ in range(20):
            pos = RNG.choice(31, 2, replace=False) + 1
            bad = cw
            for p in pos:
                bad ^= 1 << int(p)
            fixed = correct_codeword(bad)
            assert fixed == cw or (fixed is not None and fixed >> 1 == cw >> 1)

    def test_random_bit_errors_in_stream(self):
        bits = build_transmission(0x200, "TEST42", frame=0).copy()
        # flip a couple of bits inside codewords
        flip = RNG.choice(len(bits) - 640, 4, replace=False) + 608
        bits[flip] ^= 1
        dec = PocsagDecoder()
        dec.process(bits)
        assert dec.messages and dec.messages[0][2].startswith("TEST42")


class TestRfLoopback:
    def test_fsk_chain(self):
        # 1200 baud FSK at 24 ksps: bits -> GFSK mod -> FM demod + MM -> bits
        from sdrtpu.kernels.mod import GfskMod
        from sdrtpu.kernels.psk import Gfsk

        fs, baud, dev = 24000.0, 1200.0, 4500.0
        sps = int(fs / baud)
        bits = build_transmission(0x1F4, "RF OK", frame=1)
        # pad the tail so chain delay doesn't truncate the final codeword
        bits = np.concatenate([bits, np.zeros(32, np.uint8)])
        # POCSAG convention: 0 -> +dev, 1 -> -dev
        sym = (1.0 - 2.0 * bits.astype(np.float32))
        mod = GfskMod(sps, dev, fs, rrc_tap_count=2 * sps + 1, rrc_beta=0.9)
        st, iq = mod(mod.init_state(), jnp.asarray(sym))
        dem = Gfsk(baud, fs, dev, rrc_tap_count=2 * sps + 1, rrc_beta=0.9,
                   omega_gain=1e-4, mu_gain=0.05)
        st2, (syms, valid) = dem(dem.init_state(), iq)
        got_bits = (np.asarray(syms)[np.asarray(valid)] < 0).astype(np.uint8)
        dec = PocsagDecoder()
        dec.process(got_bits)
        assert dec.messages, "no message decoded over RF loopback"
        assert dec.messages[0][2].startswith("RF OK")


class TestNumericAndIdle:
    def test_numeric_page_roundtrip(self):
        """BCD digits travel LSB-first per nibble: digit '1' is on-air
        nibble 0b1000 (the raw-nibble decode would print '8')."""
        from sdrtpu.decoders.pocsag import MESSAGE_NUMERIC

        bits = build_transmission(0x1F40, "12345*U-", frame=1,
                                  msg_type=MESSAGE_NUMERIC)
        dec = PocsagDecoder()
        dec.process(bits)
        assert dec.messages, "no numeric message decoded"
        addr, mtype, text = dec.messages[0]
        assert mtype == MESSAGE_NUMERIC
        assert text.startswith("12345*U-"), text

    def test_idle_codeword_is_standard(self):
        """IDLE_DATA must encode to the published idle word 0x7A89C197
        (a wrong constant makes real idle words parse as addresses)."""
        from sdrtpu.decoders.pocsag import IDLE_DATA

        assert encode_codeword(IDLE_DATA) == 0x7A89C197
