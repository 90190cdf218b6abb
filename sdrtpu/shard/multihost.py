"""Multi-host execution helpers.

Real pods: call `init_distributed()` on every host before building meshes —
it wires the JAX distributed runtime (control plane over DCN), after which
`jax.devices()` spans all hosts and the ("channel","time") meshes from
`mesh.py` stripe across ICI/DCN automatically.  Single-host development
uses `virtual_cpu_devices()` to fake an N-device topology.

Scaling measurement: `scaling_efficiency` runs a step function on 1 device
and on the full mesh and reports t1/(N*tN) — the BASELINE.md >=80%
criterion.
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime (no-op if single process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def virtual_cpu_devices(n: int = 8) -> None:
    """Force an n-device virtual CPU topology (call before importing jax)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()


def measure(fn, *args, reps: int = 3) -> float:
    """Best wall-clock of fn(*args) with a forced device sync."""
    out = fn(*args)  # warm
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best


def scaling_efficiency(step_1dev, step_ndev, args1, argsn, n_devices: int,
                       reps: int = 3) -> dict:
    """WEAK-scaling comparison: equal per-device work.

    Contract: ``step_1dev(*args1)`` processes W units of work on one
    device; ``step_ndev(*argsn)`` processes ``n_devices * W`` units
    sharded over n devices — so each device again does W.  Perfect
    scaling then gives tN == t1, and ``t1 / tN`` is the weak-scaling
    efficiency (the fraction not lost to collectives/halo/imbalance).
    On a virtual CPU mesh, where all "devices" timeshare one host, ideal
    tN is ``n * t1`` instead — use ``n_devices * t1 / tN`` there (see
    bench_scaling.py) and treat it as a mechanism check, not a hardware
    claim.
    """
    t1 = measure(step_1dev, *args1, reps=reps)
    tn = measure(step_ndev, *argsn, reps=reps)
    return {
        "t_single": t1,
        "t_sharded": tn,
        "n_devices": n_devices,
        "weak_scaling_efficiency": t1 / tn if tn > 0 else float("inf"),
    }
