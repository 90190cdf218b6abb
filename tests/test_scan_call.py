"""Batched steady-state execution: `StreamOp.scan_call` contracts.

The flagship overrides `scan_call` so the IF-rate back end runs ONCE per
dispatch window instead of per scanned block (per-op overhead dominated
the in-scan back end on TPU).  Streaming ops are associative over
concatenation, so the batched form must match sequential per-block
processing up to float reassociation — pinned here on CPU.
"""

import numpy as np
import jax.numpy as jnp

from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline
from sdrtpu.kernels.iir import Deemphasis


def _wideband(fs, n, offs, seed=3):
    t = np.arange(n) / fs
    x = np.zeros(n, np.complex128)
    for i, f0 in enumerate(offs):
        L = np.sin(2 * np.pi * (400 + 150 * i) * t)
        R = np.sin(2 * np.pi * (900 + 150 * i) * t)
        mpx = (0.45 * (L + R) + 0.1 * np.sin(2 * np.pi * 19000 * t)
               + 0.45 * (L - R) * np.sin(2 * np.pi * 38000 * t))
        ph = np.cumsum(2 * np.pi * 75000.0 * mpx / fs)
        x += 0.4 * np.exp(1j * (2 * np.pi * f0 * t + ph))
    return x.astype(np.complex64)


def test_default_scan_call_is_scan_of_call():
    op = Deemphasis(50e-6, 48000.0)
    xs = np.random.default_rng(0).standard_normal((5, 256)).astype(np.float32)
    # one warmup block stabilizes the broadcastable scalar state shape
    # (same contract as the framework's scan paths)
    warm, _ = op(op.init_state(), jnp.asarray(xs[0]))
    st1 = warm
    outs = []
    for xb in xs[1:]:
        st1, y = op(st1, jnp.asarray(xb))
        outs.append(np.asarray(y))
    st2, ys = op.scan_call(warm, jnp.asarray(xs[1:]))
    np.testing.assert_allclose(np.asarray(ys), np.stack(outs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(st2), np.asarray(st1), atol=1e-6)


def test_flagship_scan_call_matches_sequential():
    fs = 2_000_000.0
    block = 20_000
    K = 6
    offs = np.linspace(-0.35, 0.35, 4) * fs
    x = _wideband(fs, K * block, offs)

    def build():
        return WbfmMultiVfoPipeline(
            offs, fs, block, channelizer_method="fft",
            spectrum=True, fft_size=4096, fft_rate=100.0,
        )

    pipe = build()
    st = pipe.init_state()
    seq_a, seq_s = [], []
    for blk in x.reshape(K, block):
        st, (a, s) = pipe(st, jnp.asarray(blk))
        seq_a.append(np.asarray(a))
        seq_s.append(np.asarray(s))

    pipe2 = build()
    st2, (a2, s2) = pipe2.scan_call(
        pipe2.init_state(), jnp.asarray(x.reshape(K, block))
    )
    a2, s2 = np.asarray(a2), np.asarray(s2)
    assert a2.shape == (K, 2, len(offs), pipe.out_len(block))
    # skip the filter-fill transient block (angle() of ~0 samples)
    np.testing.assert_allclose(a2[2:], np.stack(seq_a)[2:], atol=2e-4)
    np.testing.assert_allclose(s2, np.stack(seq_s), atol=1e-3)
    # carried states agree (same streaming semantics)
    for (pa, va), (pb, vb) in zip(
        _flat(np.asarray, st), _flat(np.asarray, st2)
    ):
        assert pa == pb
        np.testing.assert_allclose(va, vb, atol=2e-4, err_msg=str(pa))


def test_scan_repeat_matches_scan_call_on_repeated_blocks():
    fs = 2_000_000.0
    block = 20_000
    K = 4
    offs = np.linspace(-0.3, 0.3, 3) * fs
    x = _wideband(fs, block, offs)
    pipe = WbfmMultiVfoPipeline(offs, fs, block, channelizer_method="fft")
    st0 = pipe.init_state()
    st1, a1 = pipe.scan_call(
        st0, jnp.broadcast_to(jnp.asarray(x), (K, block))
    )
    pipe2 = WbfmMultiVfoPipeline(offs, fs, block, channelizer_method="fft")
    st2, a2 = pipe2.scan_repeat(pipe2.init_state(), jnp.asarray(x), K)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=1e-5)


def _flat(f, tree):
    import jax

    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    return [(jax.tree_util.keystr(p), f(v)) for p, v in leaves]


def test_flagship_scan_call_sparse_fold():
    """Batched sub-window path with the sparse alias fold (-100 dB: every
    energetic row kept, numerically the dense fold)."""
    fs = 2_000_000.0
    block = 20_000
    K = 4
    offs = np.linspace(-0.3, 0.3, 3) * fs
    x = _wideband(fs, K * block, offs)
    dense = WbfmMultiVfoPipeline(offs, fs, block, channelizer_method="fft")
    sparse = WbfmMultiVfoPipeline(offs, fs, block, channelizer_method="fft",
                                  sparse_fold_db=-100.0)
    assert sparse.channelizer.fused._sparse
    _, a1 = dense.scan_call(dense.init_state(),
                            jnp.asarray(x.reshape(K, block)))
    _, a2 = sparse.scan_call(sparse.init_state(),
                             jnp.asarray(x.reshape(K, block)))
    # skip the filter-fill transient blocks (angle() of ~0 samples)
    np.testing.assert_allclose(np.asarray(a2)[2:], np.asarray(a1)[2:],
                               atol=2e-4)


def test_scan_call_spec_reduce():
    """spec_reduce collapses the spectrum inside the scan (bench probe
    mode); audio is unchanged."""
    fs = 2_000_000.0
    block = 20_000
    K = 6
    offs = np.linspace(-0.35, 0.35, 4) * fs
    x = _wideband(fs, K * block, offs)

    def build():
        return WbfmMultiVfoPipeline(
            offs, fs, block, channelizer_method="fft",
            spectrum=True, fft_size=4096, fft_rate=100.0,
        )

    full = build()
    _, (a1, s1) = full.scan_call(full.init_state(),
                                 jnp.asarray(x.reshape(K, block)))
    red = build()
    red.spec_reduce = jnp.max
    import os
    os.environ["SDRTPU_SUBK"] = "2"
    try:
        _, (a2, s2) = red.scan_call(red.init_state(),
                                    jnp.asarray(x.reshape(K, block)))
    finally:
        del os.environ["SDRTPU_SUBK"]
    assert np.asarray(s2).shape == (K // 2,)
    np.testing.assert_allclose(float(np.max(np.asarray(s2))),
                               float(np.max(np.asarray(s1))), atol=1e-3)


def test_scan_call_nonfft_subwindows():
    """The xla-fused fallback path also runs sub-windowed and matches
    sequential per-block processing."""
    import os

    fs = 2_000_000.0
    block = 20_000
    K = 4
    offs = np.linspace(-0.3, 0.3, 3) * fs
    x = _wideband(fs, K * block, offs)
    pipe = WbfmMultiVfoPipeline(offs, fs, block,
                                channelizer_method="xla-fused")
    assert pipe.channelizer.method == "xla-fused"
    st = pipe.init_state()
    seq = []
    for blk in x.reshape(K, block):
        st, a = pipe(st, jnp.asarray(blk))
        seq.append(np.asarray(a))

    pipe2 = WbfmMultiVfoPipeline(offs, fs, block,
                                 channelizer_method="xla-fused")
    os.environ["SDRTPU_SUBK"] = "2"
    try:
        _, a2 = pipe2.scan_call(pipe2.init_state(),
                                jnp.asarray(x.reshape(K, block)))
    finally:
        del os.environ["SDRTPU_SUBK"]
    np.testing.assert_allclose(np.asarray(a2)[2:], np.stack(seq)[2:],
                               atol=2e-4)


def test_skip_rotator_matches_rotated_pipeline():
    """Rotator-elimination (round 5): the discriminator's constant-phase
    compensation reproduces the rotated pipeline's audio, including
    after a live retune (the residual angle is a state leaf)."""
    import numpy as np
    import jax.numpy as jnp

    from sdrtpu.apps.wbfm_pipeline import WbfmMultiVfoPipeline

    fs = 2_000_000.0
    m = WbfmMultiVfoPipeline.block_multiple(fs)
    block = 4 * m
    offsets = np.array([-433_000.0, 0.0, 610_000.0])
    pipes = {
        k: WbfmMultiVfoPipeline(offsets, fs, block, channelizer_method="fft",
                                skip_rotator=k)
        for k in (False, True)
    }
    # stereo stations on all channels
    n_blocks = 6
    t = np.arange(n_blocks * block) / fs
    x = np.zeros(t.shape, np.complex128)
    for i, f0 in enumerate(offsets):
        mpx = (0.45 * np.sin(2 * np.pi * (500.0 + 100 * i) * t)
               + 0.1 * np.sin(2 * np.pi * 19000.0 * t))
        ph = np.cumsum(2 * np.pi * 75000.0 * mpx / fs)
        x += 0.3 * np.exp(1j * (2 * np.pi * f0 * t + ph))
    x = x.astype(np.complex64)

    outs = {}
    for k, pipe in pipes.items():
        st = pipe.init_state()
        audio = []
        for b in range(n_blocks):
            if b == 3:  # mid-stream retune must refresh the rot leaf
                st = pipe.retune_state(
                    st, offsets + np.array([10_000.0, 0.0, -20_000.0]))
            st, a = pipe(st, jnp.asarray(x[b * block:(b + 1) * block]))
            audio.append(np.asarray(a))
        outs[k] = np.concatenate(audio, axis=-1)
    ref, got = outs[False], outs[True]
    # compare the steady windows: the last block before the retune and
    # the last block overall (fill/retune transients legitimately differ
    # between the two formulations — different phase histories through
    # the pilot filter refill; steady state is exact to float rounding)
    n_af = ref.shape[-1] // n_blocks
    for blk in (2, n_blocks - 1):
        err = np.abs(got - ref)[:, :, blk * n_af:(blk + 1) * n_af].max()
        assert err < 1e-4, f"skip_rotator mismatch in block {blk}: {err}"
