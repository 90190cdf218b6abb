"""sdrtpu — TPU-native software-defined-radio signal processing in JAX.

A from-scratch reimplementation of the capabilities of SDR++
(AlexandreRouma/SDRPlusPlus) designed for TPU hardware:

- IQ is processed in large time blocks through jitted kernel graphs rather
  than the reference's thread-per-block streaming (`core/src/dsp/block.h`).
- All per-sample hot loops (FIR, polyphase resampling, mixing, FM
  discrimination) are block-parallel XLA/Pallas programs; only genuinely
  sequential feedback loops (PLL/AGC/clock recovery) use `lax.scan`, and
  block-parallel feed-forward redesigns are provided for those as well.
- Streaming state (filter tails, oscillator phases, loop carries) is an
  explicit pytree threaded through `process(state, block) -> (state, out)`,
  the functional analog of the reference's hidden per-block member state.
- Multi-channel (multi-VFO) work is batched with `vmap` and sharded over a
  `jax.sharding.Mesh`; overlap-save filter boundaries travel over ICI
  collectives instead of `memmove`d history buffers (`fir.h:80`).

Subpackages
-----------
- ``kernels``  — pure DSP kernels (design-time tap/window math + jitted ops)
- ``graph``    — stream-op protocol and chain composition
- ``shard``    — mesh construction, overlap-save halo exchange, channelizer
- ``io``       — WAV/raw IQ file and network ingest/egress
- ``fec``      — Viterbi / Reed-Solomon / symbol-level decoders
- ``apps``     — receiver orchestration, configs, CLI
"""

__version__ = "0.1.0"
