"""Weak-scaling benchmark: 64-channel wideband scan over a device mesh.

BASELINE.md config 5: "64 channels sharded across N>=2 hosts, overlap-save
boundary collectives" with a >=80% scaling-efficiency target.  This
environment exposes ONE real TPU chip, so hardware multi-chip numbers are
not measurable here; this script

- on a multi-device platform (real pod or `--virtual N` CPU mesh) runs the
  64-channel channelizer+demod weak-scaling comparison: 64/N channels on
  one device vs 64 channels sharded over the ("channel",) mesh axis, and
  reports t1/tN (equal per-device work, SURVEY BASELINE >=80% criterion);
- always validates numerics: the sharded output must match the unsharded
  reference on the same input.

On the virtual CPU mesh all "devices" share one host's cores, so the
efficiency number is a *mechanism* check (sharding, halo exchange, per
channel state layout), not a hardware claim — run on a real pod slice for
the hardware number (`sdrtpu.shard.multihost.init_distributed`).

Prints one JSON line: {"metric": "weak_scaling_efficiency_64ch", ...}.
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force an N-device virtual CPU mesh")
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--block", type=int, default=200_000)
    ap.add_argument("--flagship", action="store_true",
                    help="scale the full WbfmMultiVfoPipeline (stereo WFM "
                         "demod + audio path) instead of the "
                         "channelizer+discriminator scan chain")
    args = ap.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()

    import numpy as np
    import jax
    import jax.numpy as jnp

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    from sdrtpu.graph.compile import complexify, realify
    from sdrtpu.shard.channelizer import Channelizer
    from sdrtpu.shard.mesh import make_mesh, shard_channel_state
    from sdrtpu.kernels.demod import Quadrature

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    devs = jax.devices()
    n_dev = len(devs)
    log(f"devices: {n_dev} x {devs[0].platform}")

    fs_in = 10_000_000.0
    if_rate = 250_000.0
    C = args.channels
    block_len = args.block
    centers = np.linspace(-4.5e6, 4.5e6, C)
    rng = np.random.default_rng(0)
    if args.flagship:
        # real FM stations: the flagship's WFM demod contains angle()
        # which amplifies rounding unboundedly on near-zero (noise-only)
        # IF samples — equality checks need structured input
        t = np.arange(block_len) / fs_in
        x = np.zeros(block_len, np.complex128)
        for i, fc in enumerate(centers):
            mpx = (0.45 * np.sin(2 * np.pi * (300.0 + 37.0 * i) * t)
                   + 0.1 * np.sin(2 * np.pi * 19000.0 * t))
            ph = np.cumsum(2 * np.pi * 75000.0 * mpx / fs_in)
            x += (0.9 / C) * np.exp(1j * (2 * np.pi * fc * t + ph))
        x = x.astype(np.complex64)
    else:
        x = (rng.standard_normal(block_len)
             + 1j * rng.standard_normal(block_len)).astype(np.complex64)

    def build(offsets):
        if args.flagship:
            from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline

            pipe = WbfmMultiVfoPipeline(offsets, fs_in, block_len,
                                        channelizer_method="fft")

            def step(rstate, re, im):
                st, a = pipe(complexify(rstate), jax.lax.complex(re, im))
                return realify(st), a

            # one eager step stabilizes broadcastable state shapes
            st0, _ = step(realify(pipe.init_state()),
                          jnp.zeros(block_len, jnp.float32),
                          jnp.zeros(block_len, jnp.float32))
            return step, st0

        ch = Channelizer(offsets, fs_in, if_rate, block_len, method="auto")
        quad = Quadrature(75000.0, if_rate)

        def step(rstate, re, im):
            st = complexify(rstate)
            s1, y = ch(st["ch"], jax.lax.complex(re, im))
            s2, a = quad(st["q"], y)
            return realify({"ch": s1, "q": s2}), a

        state0 = realify({"ch": ch.init_state(), "q": quad.init_state()})
        return step, state0

    def time_step(fn, st, re, im, reps=5):
        st2, a = fn(st, re, im)
        float(jnp.sum(jnp.abs(a)))  # force completion
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            st2, a = fn(st, re, im)
            float(jnp.sum(jnp.abs(a)))
            best = min(best, time.perf_counter() - t0)
        return best

    re = jnp.asarray(x.real)
    im = jnp.asarray(x.imag)

    # Correctness: sharded == unsharded on the full channel set.  The
    # flagship comparison runs a few blocks first: the filter-fill
    # startup transient (near-zero IF through angle()) is skipped, as in
    # tests/test_shard.py::TestShardedFlagship.
    warm_blocks = 3 if args.flagship else 1
    step_all, st_all = build(centers)
    fn_all = jax.jit(step_all)
    st_r = st_all
    for _ in range(warm_blocks):
        st_r, ref = fn_all(st_r, re, im)

    result = {"metric": "weak_scaling_efficiency_64ch",
              "unit": "t1/tN (equal per-device work)",
              "n_devices": n_dev, "channels": C}
    if n_dev >= 2:
        # channel axis must divide the channel count (NamedSharding needs
        # equal shards and the weak-scaling formula assumes equal work);
        # e.g. --virtual 6 with 64 channels shards over 4 devices
        n_shard = min(n_dev, C)
        while C % n_shard:
            n_shard -= 1
        if n_shard != min(n_dev, C):
            log(f"note: using {n_shard} of {n_dev} devices "
                f"({C} channels must split evenly)")
        mesh = make_mesh(n_channel=n_shard, n_time=1)
        st_sh = shard_channel_state(mesh, st_all, C)
        fn_sh = jax.jit(step_all)
        st_s = st_sh
        for _ in range(warm_blocks):
            st_s, got = fn_sh(st_s, re, im)
        err = float(jnp.max(jnp.abs(got - ref)))
        log(f"sharded-vs-unsharded max err: {err:.2e}")
        assert err < 1e-3, "sharded output mismatch"

        # Weak scaling: 1 device doing C/n channels vs n devices doing C.
        step_1, st_1 = build(centers[: C // n_shard])
        t1 = time_step(jax.jit(step_1), st_1, re, im)
        tn = time_step(fn_sh, st_sh, re, im)
        eff = t1 / tn
        virtual = devs[0].platform == "cpu"
        # On the virtual CPU mesh all "devices" timeshare one host's cores,
        # so ideal tN is N*t1 (serialized), not t1.  The mechanism metric is
        # then N*t1/tN: the fraction NOT lost to collectives/halo exchange/
        # imbalance — what true hardware parallelism could recover.
        eff_mech = n_shard * t1 / tn
        log(f"t1({C//n_shard}ch)={t1*1e3:.2f} ms  tN({C}ch/{n_shard}dev)="
            f"{tn*1e3:.2f} ms  weak={eff:.2%}  mechanism={eff_mech:.2%}")
        result.update({
            "value": round(eff_mech if virtual else eff, 4),
            "weak_scaling_t1_over_tN": round(eff, 4),
            "mechanism_efficiency_Nt1_over_tN": round(eff_mech, 4),
            "t_single_ms": round(t1 * 1e3, 3),
            "t_sharded_ms": round(tn * 1e3, 3),
            "max_err": err,
            "hardware": devs[0].platform,
            "note": ("virtual CPU mesh timeshares one host's cores: 'value' "
                     "is the mechanism efficiency N*t1/tN (collective/halo "
                     "overhead excluded fraction); run on a real pod for the "
                     "hardware weak-scaling number" if virtual else
                     "hardware weak-scaling measurement t1/tN"),
        })
    else:
        t_all = time_step(fn_all, st_all, re, im)
        sps = block_len / t_all
        log(f"single device: {C}ch full scan {t_all*1e3:.2f} ms "
            f"({sps/1e6:.1f} Msps input)")
        result.update({
            "value": None,
            "single_device_msps": round(sps / 1e6, 1),
            "note": "one device visible; run with --virtual 8 or on a pod",
        })

    print(json.dumps(result))


if __name__ == "__main__":
    main()
