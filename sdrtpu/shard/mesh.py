"""Device mesh construction and sharding helpers.

The framework's parallel axes (SURVEY §5.7/§2.2):

- ``channel`` — VFOs / scanner channels (the reference's Splitter fan-out,
  one thread per VFO).  Embarrassingly parallel; no collectives.
- ``time``   — successive spans of the IQ stream (the reference's pipeline
  of 1 MSample work blocks).  Convolutions need halo exchange between
  neighbor shards (`overlap.py`); scan carries stay per-channel.

Intra-job exchange rides ICI via XLA collectives; there is no NCCL/MPI
analog — the reference's "distributed" layer was application TCP
(``server.cpp``), which survives here only as the ingest/egress edge.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_channel: int | None = None,
    n_time: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("channel", "time") mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_channel is None:
        n_channel = len(devices) // n_time
    devs = np.asarray(devices[: n_channel * n_time]).reshape(n_channel, n_time)
    return Mesh(devs, ("channel", "time"))


def channel_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis channel sharding for (C, ...) arrays/state leaves."""
    return NamedSharding(mesh, P("channel"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_channel_state(mesh: Mesh, state, n_channels: int):
    """Place every state leaf whose leading dim == n_channels on the
    channel axis; replicate the rest."""
    cs = channel_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        arr = np.asarray(x)
        if arr.ndim >= 1 and arr.shape[0] == n_channels:
            return jax.device_put(arr, cs)
        return jax.device_put(arr, rep)

    return jax.tree_util.tree_map(place, state)
