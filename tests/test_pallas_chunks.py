"""One-pass Pallas chunk builder vs the XLA chunk-matrix reference.

Covers `kernels.pallas_chunks.chunk_poly` (interpret mode on CPU) at
both flagship plan shapes — the 64-VFO-like large-R plan (G=1) and the
8-VFO-like small-R plan where `choose_group` emits several chunks per
grid step — against the definition ct[p, s, q] = ext[p*valid + q*R + s].
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sdrtpu.kernels.pallas_chunks import (
    choose_group,
    chunk_poly,
    chunk_poly_supported,
)

RNG = np.random.default_rng(11)


def ref_chunks(ext, valid, R, nif, P):
    need = (P - 1) * valid + R * nif
    ext = np.pad(ext, (0, max(0, need - len(ext))))
    ct = np.zeros((P, R, nif), ext.dtype)
    for p in range(P):
        for s in range(R):
            ct[p, s] = ext[p * valid + s : p * valid + s + R * nif : R]
    return ct


@pytest.mark.parametrize(
    "valid,R,nif,n_chunks",
    [
        (1600, 8, 256, 10),   # large tile at G=1
        (4000, 40, 128, 10),  # the 8-VFO plan geometry (vr=100)
        (25600, 200, 128, 5), # the 64-VFO plan geometry (vr=128)
    ],
)
def test_chunk_poly_matches_reference(valid, R, nif, n_chunks):
    assert chunk_poly_supported(valid, R, nif)
    G = choose_group(n_chunks, valid, R, nif)
    assert n_chunks % G == 0
    L = (n_chunks - 1) * valid + R * nif
    ext = (RNG.standard_normal(L) + 1j * RNG.standard_normal(L)).astype(
        np.complex64
    )
    o_re, o_im = chunk_poly(
        jnp.asarray(ext.real), jnp.asarray(ext.imag), valid=valid,
        ratio=R, nif=nif, n_chunks=n_chunks, group=G, interpret=True,
    )
    got = np.asarray(o_re) + 1j * np.asarray(o_im)
    np.testing.assert_array_equal(got, ref_chunks(ext, valid, R, nif, n_chunks))


def test_grouped_equals_ungrouped():
    valid, R, nif, P = 4000, 40, 128, 10
    L = (P - 1) * valid + R * nif
    ext = RNG.standard_normal(L).astype(np.float32)
    zero = jnp.zeros_like(jnp.asarray(ext))
    a = chunk_poly(jnp.asarray(ext), zero, valid=valid, ratio=R, nif=nif,
                   n_chunks=P, group=1, interpret=True)[0]
    b = chunk_poly(jnp.asarray(ext), zero, valid=valid, ratio=R, nif=nif,
                   n_chunks=P, group=5, interpret=True)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_choose_group_divides_and_targets():
    # 8-VFO plan: per-block chunk count 125 -> G=5 reaches the target
    assert choose_group(125, 4000, 40, 128) == 5
    # 64-VFO plan: G=1 tile already at target
    assert choose_group(125, 25600, 200, 128) == 1
