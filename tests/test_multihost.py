"""True multi-PROCESS execution: 2 'hosts' over the JAX distributed runtime.

BASELINE config 5 demands scaling across N>=2 hosts.  This environment
has one machine, but the DCN-path *mechanism* — jax.distributed
coordination, a global mesh spanning processes, halo `ppermute`
crossing the process boundary via gloo collectives — is fully
exercisable with two local processes of 4 virtual CPU devices each.
The sharded halo-exchange FIR must match the single-device run
bit-exactly with its boundary traffic crossing processes.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                           process_id=pid)
import numpy as np, jax.numpy as jnp
from jax.experimental import multihost_utils
from sdrtpu.shard.mesh import make_mesh
from sdrtpu.shard.overlap import time_sharded_fir
from sdrtpu.kernels import taps as tapsmod
from sdrtpu.kernels.fir import Fir

devs = jax.devices()
assert len(devs) == 4 * nproc, devs
assert len(jax.local_devices()) == 4
mesh = make_mesh(n_channel=1, n_time=len(devs))
h = tapsmod.low_pass(0.2, 0.05, 1.0)
x = np.random.default_rng(0).standard_normal(8192).astype(np.float32)
tail = jnp.zeros(len(h) - 1, jnp.float32)
outs = []
for i in range(0, 8192, 4096):  # two streamed blocks: tail carry crosses too
    tail, y = time_sharded_fir(mesh, h, jnp.asarray(x[i:i + 4096]), tail)
    outs.append(np.asarray(multihost_utils.process_allgather(y, tiled=True)))
got = np.concatenate(outs)
op = Fir(h, dtype=jnp.float32)
_, ref = op(op.init_state(), jnp.asarray(x))
err = float(np.abs(got - np.asarray(ref)).max())
assert err == 0.0, err
print(f"proc {pid} OK err={err}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("SDRTPU_NO_SUBPROC") == "1",
                    reason="subprocess tests disabled")
def test_two_process_halo_exchange(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # The worker script lives in /tmp, so the repo root must be importable
    # explicitly (cwd is NOT on sys.path for script-by-path execution).
    # Append rather than overwrite: the TPU plugin registers via PYTHONPATH.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (env.get("PYTHONPATH"), repo) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert "proc 0 OK" in outs[0]
    assert "proc 1 OK" in outs[1]
