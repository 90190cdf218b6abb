"""Convolutional encoding + soft-decision Viterbi decoding.

Capability parity with the vendored libcorrect convolutional codec
(``core/libcorrect/src/convolutional/*.c``): arbitrary constraint length
and polynomials (e.g. CCSDS rate-1/2 K=7, polys 0o171/0o133 used by Meteor
LRPT / falcon9 / ryfi decoders).

TPU mapping: the add-compare-select recursion is a `lax.scan` over time
with all 2^(K-1) states updated in parallel per step (vectorized butterfly);
traceback is a reverse scan over the stored decision bits.  Soft branch
metrics are correlations with the expected +/-1 symbols.

Convention: input soft symbols are floats where positive means bit 0
(matching s8 soft-symbol captures after sign mapping chosen by the caller);
use `encode_to_soft` for loopback tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp

CCSDS_POLY_A = 0o171  # 0x79
CCSDS_POLY_B = 0o133  # 0x5B


def _poly_parity_table(constraint_len: int, polys: tuple[int, ...]) -> np.ndarray:
    """out[state, bit, r] = encoded bit for shift-register value."""
    K = constraint_len
    S = 1 << (K - 1)
    out = np.zeros((S, 2, len(polys)), np.uint8)
    for s in range(S):
        for b in (0, 1):
            reg = (b << (K - 1)) | s  # newest bit at MSB
            for r, p in enumerate(polys):
                out[s, b, r] = bin(reg & p).count("1") & 1
    return out


class ConvEncoder:
    """Feed-forward convolutional encoder (host NumPy)."""

    def __init__(self, constraint_len: int = 7, polys=(CCSDS_POLY_A, CCSDS_POLY_B)):
        self.K = constraint_len
        self.polys = tuple(polys)
        self.rate = len(self.polys)
        self._table = _poly_parity_table(self.K, self.polys)

    def encode(self, bits: np.ndarray) -> np.ndarray:
        """bits (N,) 0/1 -> coded (N*rate,) 0/1, zero-flushed start state."""
        state = 0
        out = np.empty(len(bits) * self.rate, np.uint8)
        S_mask = (1 << (self.K - 1)) - 1
        for i, b in enumerate(np.asarray(bits, np.uint8)):
            out[i * self.rate : (i + 1) * self.rate] = self._table[state, b]
            state = ((state >> 1) | (b << (self.K - 2))) & S_mask
        return out

    def encode_to_soft(self, bits: np.ndarray, amplitude: float = 1.0) -> np.ndarray:
        """Coded bits mapped to soft floats: bit 0 -> +amp, bit 1 -> -amp."""
        coded = self.encode(bits).astype(np.float32)
        return (1.0 - 2.0 * coded) * amplitude


class ViterbiDecoder(StreamOp):
    """Block soft-decision Viterbi decoder.

    ``decode(soft)`` takes (N*rate,) soft symbols (positive ⇔ bit 0) and
    returns (N,) decoded bits.  The whole block is decoded at once
    (terminated or truncated traceback from the best final state).
    """

    def __init__(self, constraint_len: int = 7, polys=(CCSDS_POLY_A, CCSDS_POLY_B)):
        self.K = constraint_len
        self.polys = tuple(polys)
        self.rate = len(self.polys)
        self.S = 1 << (self.K - 1)
        table = _poly_parity_table(self.K, self.polys).astype(np.float32)
        # expected soft symbols (+1 for bit0, -1 for bit1): (S, 2, R)
        self.expected = 1.0 - 2.0 * table
        # state transition: next_state(state, bit)
        s = np.arange(self.S)
        self.next_state = np.stack(
            [((s >> 1) | (b << (self.K - 2))).astype(np.int32) for b in (0, 1)],
            axis=1,
        )  # (S, 2)
        # predecessor table: for next state ns, the two (prev_state, bit)
        prev = np.zeros((self.S, 2), np.int32)
        prev_bit = np.zeros((self.S, 2), np.int32)
        cnt = np.zeros(self.S, np.int32)
        for st in range(self.S):
            for b in (0, 1):
                ns = self.next_state[st, b]
                prev[ns, cnt[ns]] = st
                prev_bit[ns, cnt[ns]] = b
                cnt[ns] += 1
        assert np.all(cnt == 2)
        self.prev = prev
        self.prev_bit = prev_bit

    def decode(self, soft) -> jax.Array:
        soft = jnp.asarray(soft, jnp.float32)
        n = soft.shape[-1] // self.rate
        sym = soft[: n * self.rate].reshape(n, self.rate)

        expected = jnp.asarray(self.expected)  # (S,2,R)
        prev = jnp.asarray(self.prev)  # (S,2)
        prev_bit = jnp.asarray(self.prev_bit)

        # branch metric for arriving at ns via (ps, b): correlation of the
        # received symbols with the expected output of (ps, b)
        exp_prev = expected[prev, prev_bit]  # (S, 2, R)

        def acs(metrics, r):
            # cand[ns, j] = metrics[prev[ns,j]] + <r, exp_prev[ns,j]>
            bm = jnp.einsum("sjr,r->sj", exp_prev, r)
            cand = metrics[prev] + bm
            best = jnp.argmax(cand, axis=1)
            new_metrics = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
            # normalize to avoid overflow
            new_metrics = new_metrics - jnp.max(new_metrics)
            return new_metrics, best.astype(jnp.uint8)

        init = jnp.full((self.S,), -1e9, jnp.float32).at[0].set(0.0)
        metrics, choices = jax.lax.scan(acs, init, sym)  # choices (n, S)

        end_state = jnp.argmax(metrics).astype(jnp.int32)

        def traceback(state, choice_row):
            j = choice_row[state]
            ps = prev[state, j]
            bit = prev_bit[state, j].astype(jnp.uint8)
            return ps, bit

        _, bits_rev = jax.lax.scan(traceback, end_state, choices, reverse=True)
        return bits_rev

    # StreamOp interface: stateless block decode
    def init_state(self):
        return ()

    def __call__(self, state, soft):
        return state, self.decode(soft)
