"""Stream-op protocol: the functional replacement for the reference runtime.

The reference executes DSP as one thread per block connected by rendezvous
streams (``core/src/dsp/{block,stream,processor}.h``).  Here a stream op is a
*pure function with explicit state*:

    state0 = op.init_state()
    state1, y = op(state0, x)          # x: (..., n_in) -> y: (..., n_out)

- ``state`` is a JAX pytree (filter tails, oscillator phases, loop carries).
  It is the exact functional analog of the hidden member state the reference
  carries between ``process()`` calls (e.g. ``fir.h:80`` history memmove).
- Block lengths are static: ``op.out_len(n)`` maps input block length to
  output block length so a whole chain compiles to one fixed-shape XLA
  program.  Ops that decimate require divisible block lengths.
- Ops are plain Python objects closed over by jitted functions; their numeric
  attributes (taps, rates) become XLA constants.  Reconfiguring an op means
  building a new op and re-jitting — the analog of the reference's
  ``tempStop -> mutate -> tempStart`` idiom, but cacheable.

``Chain`` composes ops sequentially, mirroring ``dsp::chain``
(``core/src/dsp/chain.h:62-142``) minus the thread management.  Disabled ops
are simply omitted at construction (a new jit cache entry), replacing the
reference's runtime stream-rewiring.
"""

from __future__ import annotations

from typing import Any, Sequence

PyTree = Any


class StreamOp:
    """Base class (duck-typed; subclassing optional)."""

    def init_state(self) -> PyTree:
        return ()

    def out_len(self, n: int) -> int:
        return n

    def __call__(self, state: PyTree, x):  # pragma: no cover - interface
        raise NotImplementedError

    def scan_call(self, state: PyTree, xs):
        """Process K stacked blocks ``xs: (K, ..., n)`` in one compiled call.

        Default: ``lax.scan`` of `__call__` — semantically the framework's
        steady-state execution mode (one fused program scanned over time
        blocks).  Ops whose per-block work is tiny (IF/audio-rate stages)
        override this with a batched formulation that processes the
        concatenated window in one pass: for a streaming op,
        ``process(concat(blocks))`` equals sequential per-block processing
        by construction, and the batched form amortizes per-op dispatch
        overhead K-fold on TPU.
        """
        import jax

        return jax.lax.scan(lambda st, xb: self(st, xb), state, xs)


class Chain(StreamOp):
    """Sequential composition of stream ops.

    Functional analog of ``dsp::chain<T>`` (``core/src/dsp/chain.h``): state
    is the tuple of member states, applied in order inside one jitted program
    rather than across N worker threads.
    """

    def __init__(self, ops: Sequence[StreamOp]):
        self.ops = list(ops)

    def init_state(self) -> PyTree:
        return tuple(op.init_state() for op in self.ops)

    def out_len(self, n: int) -> int:
        for op in self.ops:
            n = op.out_len(n)
        return n

    def __call__(self, state, x):
        new_states = []
        for op, st in zip(self.ops, state):
            st, x = op(st, x)
            new_states.append(st)
        return tuple(new_states), x
