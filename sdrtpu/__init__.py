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


def enable_compile_cache(path: str | None = None) -> str:
    """Enable JAX's persistent compilation cache for sdrtpu programs.

    Reconfiguration in this framework is "rebuild the jitted program";
    on TPU backends a flagship-scale trace can take minutes to compile
    cold but loads from the persistent cache in seconds — so the cache
    IS the live-reconfigure story for program-shape changes (offset-only
    retunes don't even retrace; see `WbfmMultiVfoPipeline.retune_state`).

    Called automatically on first `Receiver` construction and by the CLI
    (opt out with SDRTPU_NO_CACHE=1); default location
    ``~/.cache/sdrtpu/jax``.
    """
    import os

    import jax

    if os.environ.get("SDRTPU_NO_CACHE"):
        return ""
    explicit = path or os.environ.get("SDRTPU_CACHE_DIR")
    current = getattr(jax.config, "jax_compilation_cache_dir", None)
    if current and not explicit:
        # the application already configured a cache — respect it rather
        # than silently repointing process-global JAX config
        return current
    path = explicit or os.path.join(
        os.path.expanduser("~"), ".cache", "sdrtpu", "jax"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return path
