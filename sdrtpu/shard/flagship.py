"""The flagship WBFM multi-VFO pipeline, sharded over a (channel, time) mesh.

Sharding stance (SURVEY §7 "hard parts", VERDICT r1 #2): the wideband FFT
channelizer front — where nearly all input samples live — is sharded over
BOTH mesh axes via `time_sharded_channelizer` (halo `ppermute` along
``time``, per-channel filter tables along ``channel``); everything
downstream of the IF boundary (WFM demod, audio resampler, deemphasis)
carries sequential per-channel state (FIR tails, pilot filters, IIR
carries), so it runs channel-sharded only: the IF-rate rows are resharded
to ``P("channel", None)`` (an all-gather of each channel's time shards
over ICI — at 250 kHz IF this is 40x less data than the wideband input)
and the batched demod ops propagate channel sharding through GSPMD.

Matches `apps.wbfm_pipeline.WbfmMultiVfoPipeline` output to float
tolerance (the local-chain FFT plan rounds differently than the global
plan); asserted in tests/test_shard.py and the driver's
`dryrun_multichip`.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..apps.wbfm_pipeline import WbfmMultiVfoPipeline
from .channelizer import FftDecimatorChain
from .overlap import time_sharded_channelizer


class ShardedWbfmPipeline:
    """`WbfmMultiVfoPipeline` executing over a ("channel", "time") mesh.

    ``block_len`` is the GLOBAL wideband block (must divide by the mesh's
    time-axis size as well as the pipeline's block multiple).
    """

    def __init__(self, offsets_hz, in_samplerate: float, block_len: int,
                 mesh: Mesh, **pipeline_kw):
        self.mesh = mesh
        self.n_time = int(mesh.shape.get("time", 1))
        assert block_len % self.n_time == 0, (block_len, self.n_time)
        # unsharded pipeline provides the demod/audio path + global plan
        self.pipe = WbfmMultiVfoPipeline(
            offsets_hz, in_samplerate, block_len,
            channelizer_method="fft", **pipeline_kw,
        )
        # local-span FFT front for the time-sharded channelizer
        rr = self.pipe.channelizer.resampler
        if (rr.predecim is None or not rr.predecim.stages
                or rr.resamp is not None):
            # rr.resamp != None means the in->IF ratio is fractional: the
            # plan carries a polyphase stage after the predecim that this
            # sharded front does NOT replicate — failing here beats
            # silently demodulating at the wrong IF rate
            raise ValueError(
                "time sharding needs an INTEGER in->IF decimation for its "
                "FFT front; choose an input rate that is an integer "
                "multiple of the IF rate (e.g. 10 Msps -> 250 kHz)"
            )
        stages = [(np.asarray(s.taps), s.decimation)
                  for s in rr.predecim.stages]
        local = block_len // self.n_time
        R = int(np.prod([M for _, M in stages]))
        assert local % R == 0, (
            f"local time-shard span {local} must be a multiple of the "
            f"decimation ratio {R}; pick block_len as a multiple of "
            f"n_time * block_multiple"
        )
        self.front = FftDecimatorChain(
            np.asarray(offsets_hz, np.float64), in_samplerate, stages, local,
            skip_rotator=self.pipe.skip_rotator,
        )
        self._if_spec = NamedSharding(mesh, P("channel", None))

    def init_state(self):
        st = self.pipe.init_state()
        st["chan"] = self.front.init_state()
        return st

    def out_len(self, n: int) -> int:
        return self.pipe.out_len(n)

    def __call__(self, state, x):
        st = dict(state)
        st["chan"], y = time_sharded_channelizer(
            self.mesh, self.front, x, state["chan"]
        )
        # IF boundary: gather each channel's time shards; demod state is
        # sequential along time, parallel along channel
        y = jax.lax.with_sharding_constraint(y, self._if_spec)
        st["demod"], (stereo, _) = self.pipe.demod(state["demod"], y)
        st["audio"], a = self.pipe.audio_resamp(state["audio"], stereo)
        st["deemph"], a = self.pipe.deemph(state["deemph"], a)
        return st, a
