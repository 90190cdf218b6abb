"""Streaming FIR filtering as block-parallel XLA programs.

Replaces the reference's per-sample VOLK dot-product loops
(``core/src/dsp/filter/fir.h:62-83`` and ``decimating_fir.h:47-67``) with
fused shift-and-add unrolls (`correlate_valid`) or FFT overlap-save
(`fft_correlate_valid`, auto-selected for >=128 taps).  NEVER use
`lax.conv_general_dilated` here: single-channel 1-D convs take minutes
to compile on the TPU backend and run ~100x slower (see CLAUDE.md).
The reference's semantics:

    out[i] = sum_t buffer[i + t] * taps[t]

where ``buffer`` holds ``taps-1`` history samples followed by the input
block — i.e. a *valid cross-correlation* of [tail ++ x] with the taps as
stored (the reference's designers account for tap orientation; e.g. complex
bandpass taps are generated pre-flipped, ``band_pass.h:21``).  We reproduce
exactly that: correlation, not flipped convolution.

State is the trailing ``taps-1`` input samples — the functional version of
the ``memmove`` at ``fir.h:80``.  Under time-axis sharding the same state is
exchanged between neighbor shards via `ppermute` (see
``sdrtpu/shard/overlap.py``).

Complex data with real taps filters I and Q as two unrolled real paths;
complex taps combine real/imag cross terms.  Long-filter FFT paths ride
the batched TPU FFT; the polyphase layouts keep every slice unit-stride.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.block import StreamOp


def correlate_valid(x: jax.Array, taps, stride: int = 1) -> jax.Array:
    """Valid correlation along the last axis, any real/complex combination.

    ``out[..., i] = sum_t x[..., i*stride + t] * taps[t]`` — the exact
    per-output sum of the reference's VOLK dot products (``fir.h:67-77``).

    Implemented as an unrolled shift-and-add: ``y = sum_t h[t]*x[t : t+Lo]``
    with tap values folded in as scalar constants.  On this TPU backend XLA
    fuses the T shifted AXPYs into one memory-bound vector loop — measured
    ~100x faster than `lax.conv_general_dilated`, whose single-channel conv
    also pathologically slows Mosaic compilation (minutes per filter).
    Complex scalars/arrays work directly (XLA decomposes the arithmetic);
    a real-signal x complex-taps product is promoted explicitly.
    """
    taps = np.asarray(taps)  # host-side; each tap folds to an immediate
    if np.iscomplexobj(taps) and not jnp.iscomplexobj(x):
        x = x.astype(jnp.complex64)
    L = x.shape[-1]
    T = int(taps.shape[0])
    tap_vals = [
        complex(t) if np.iscomplexobj(taps) else float(t) for t in taps
    ]
    if stride == 1:
        acc = None
        span = L - T + 1
        for t in range(T):
            seg = jax.lax.dynamic_slice_in_dim(x, t, span, axis=-1)
            term = tap_vals[t] * seg
            acc = term if acc is None else acc + term
        return acc

    # Strided case: lane-strided slices (seg[::M]) are pathological on TPU.
    # Decompose into the polyphase layout instead: reshape to rows of M and
    # transpose once, after which every tap is a *unit-stride* slice:
    #   y[k] = sum_t x[k*M + t]*h[t];  t = q*M + r  =>  x[kM+t] = xt[r, k+q]
    M = stride
    A = (L - T) // M + 1  # output count
    q_max = (T - 1) // M
    rows = max(-(-L // M), A + q_max)
    xp = jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, rows * M - L)]
    )
    xt = xp.reshape(x.shape[:-1] + (rows, M))
    xt = jnp.swapaxes(xt, -1, -2)  # (..., M, rows)
    acc = None
    for t in range(T):
        q, r = divmod(t, M)
        seg = jax.lax.dynamic_slice_in_dim(xt[..., r, :], q, A, axis=-1)
        term = tap_vals[t] * seg
        acc = term if acc is None else acc + term
    return acc


def correlate_valid_bank(x, taps_bank, stride: int = 1, live=None) -> jax.Array:
    """Valid correlation against a BANK of per-channel tap vectors.

    Host taps ``(C, T)``; two input layouts:

    - ``x`` 1-D ``(n,)`` — one shared signal, per-tap term is the outer
      product ``taps[:, t, None] * seg[None, :]`` -> out ``(C, i)``:
      ``out[c, i] = sum_t x[i*stride + t] * taps_bank[c, t]``.
    - ``x`` 2-D ``(C, n)`` — per-channel signals filtered by their own
      taps: ``out[c, i] = sum_t x[c, i*stride + t] * taps_bank[c, t]``.

    XLA fuses the T broadcasted AXPYs into one loop that reads ``x``
    once, so the C channels cost almost nothing extra in HBM traffic.
    Used by the fused multi-VFO channelizer front end (per-channel
    *modulated* taps: the mixer folded into the filter).  All-zero tap
    columns (half-band filters) are skipped on the host.

    ``taps_bank`` may also be a TRACED array (taps living in the state
    pytree so retunes swap them without retracing); the zero-column skip
    then needs the static ``live`` column list from the caller (the zero
    pattern of modulated taps is offset-invariant), defaulting to all
    columns.
    """
    static_taps = not isinstance(taps_bank, jax.core.Tracer)
    taps = np.asarray(taps_bank) if static_taps else taps_bank
    assert x.ndim in (1, 2) and taps.ndim == 2
    if np.iscomplexobj(taps) and not jnp.iscomplexobj(x):
        x = x.astype(jnp.complex64)
    L = x.shape[-1]
    C, T = taps.shape
    M = int(stride)
    shared = x.ndim == 1
    if not shared:
        assert x.shape[0] == C
    if live is None:
        live = (
            [t for t in range(T) if np.any(taps[:, t] != 0)]
            if static_taps else list(range(T))
        )
    out_dtype = x.dtype if not np.iscomplexobj(taps) else jnp.complex64

    def term(t, seg):
        col = jnp.asarray(taps[:, t])[:, None]
        return col * (seg[None, :] if shared else seg)

    if M == 1:
        span = L - T + 1
        acc = jnp.zeros((C, span), out_dtype)
        for t in live:
            seg = jax.lax.dynamic_slice_in_dim(x, t, span, axis=-1)
            acc = acc + term(t, seg)
        return acc

    # polyphase layout (see correlate_valid): unit-stride slices only
    A = (L - T) // M + 1
    q_max = (T - 1) // M
    rows = max(-(-L // M), A + q_max)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, rows * M - L)]
    xp = jnp.pad(x, pad)
    xt = jnp.swapaxes(xp.reshape(x.shape[:-1] + (rows, M)), -1, -2)
    acc = jnp.zeros((C, A), out_dtype)
    for t in live:
        q, r = divmod(t, M)
        seg = jax.lax.dynamic_slice_in_dim(xt[..., r, :], q, A, axis=-1)
        acc = acc + term(t, seg)
    return acc


def shifted_window_matmul(planes, mats, A: int, precision: str = "highest"):
    """Core of the shifted-matmul FIR/polyphase kernels.

    ``planes``: real arrays shaped (..., rows, M) — the planes (re/im)
    of ONE logical input laid out as rows of M.  ``mats``: host float
    matrices shaped (R*M, W).  Computes, for every (plane, mat) pair,

        out[..., a, w] = sum_q planes[..., a+q, :] @ mat[q*M:(q+1)*M, w]

    i.e. the banded/windowed contraction ``ext[a*M + j] * mat[j, w]``
    without materializing the (A, R*M) frame concat.  Each window slice
    is taken ONCE per q and contracted against every mat's q-th row
    block.  Returns ``out[i][j]`` for plane i x mat j.

    ``precision`` names the MXU pass count — see `matmul_correlate_valid`
    (TPU einsum DEFAULT is one bf16 pass, ~-50 dB).
    """
    M = int(planes[0].shape[-1])
    mats = [np.asarray(m, np.float32) for m in mats]
    R = mats[0].shape[0] // M
    assert all(m.shape[0] == R * M for m in mats)
    prec = jax.lax.Precision(precision)
    accs = [[None] * len(mats) for _ in planes]
    for q in range(R):
        blocks = [jax.lax.dynamic_slice_in_dim(p, q, A, axis=-2)
                  for p in planes]
        for j, m in enumerate(mats):
            mq = jnp.asarray(m[q * M : (q + 1) * M])
            for i, blk in enumerate(blocks):
                term = jnp.einsum("...am,mw->...aw", blk, mq, precision=prec)
                accs[i][j] = term if accs[i][j] is None else accs[i][j] + term
    return accs


def matmul_correlate_valid(x: jax.Array, taps, block: int = 128,
                           precision: str = "highest") -> jax.Array:
    """`correlate_valid` (stride 1) as banded-Toeplitz MXU matmuls.

    ``y[a*M + i] = sum_j ext[a*M + j] * taps[j - i]`` for ``i < M`` and
    ``j < R*M`` (R = 1 + ceil((T-1)/M)): reshape the input into (rows, M)
    and contract R shifted unit-stride row views against the R row-blocks
    of the host-built banded-Toeplitz tap matrix ``H[j, i] = taps[j-i]``
    — the same no-concat shifted-matmul scheme as the polyphase
    resampler.  Cost: R*M MACs per output on the MXU (vs T on the VPU
    for the unroll, vs ~5*log2(nfft)*(nfft/valid) for FFT overlap-save);
    input read R times, no frame materialization.  Crossovers measured
    on v5e in exp/demod64.py (round 4c).

    Real taps filter complex/real x per plane; complex taps contract
    real/imag tap planes separately (4 real matmuls on a complex input).

    ``precision``: MXU pass count for the f32 contraction.  TPU einsum
    DEFAULT runs f32 as ONE bf16 pass — measured relative error ~2-4e-3
    (~-50 dB), enough to break demod SINAD floors; "high" (bf16x3) gives
    ~1.4e-5 (~-95 dB) and "highest" (bf16x6) full f32 accuracy ~2e-7,
    better than the FFT path (exp/mmprec.py, v5e round 4c).  Costs at
    the WFM pilot shape: 0.0145/0.0226/0.0352 ms vs 0.0735 FFT — even
    "highest" wins 2x.  Default "highest"; pass "high" where a ~-95 dB
    noise floor is provably below the consumer's quality floor.
    """
    taps = np.asarray(taps)
    T = int(taps.shape[0])
    M = int(block)
    L = int(x.shape[-1])
    span = L - T + 1
    assert span >= 1
    R = 1 + -(-(T - 1) // M) if T > 1 else 1
    A = -(-span // M)
    rows = A + R - 1
    # H[j, i] = taps[j - i], 0 <= j - i < T  (j < R*M, i < M)
    j_idx = np.arange(R * M)[:, None]
    i_idx = np.arange(M)[None, :]
    d = j_idx - i_idx
    Hfull = np.where((d >= 0) & (d < T), taps[np.clip(d, 0, T - 1)], 0)

    pad = [(0, 0)] * (x.ndim - 1) + [(0, rows * M - L)]
    xp = jnp.pad(x, pad)
    xr = xp.reshape(x.shape[:-1] + (rows, M))

    complex_in = jnp.iscomplexobj(x)
    if not np.iscomplexobj(taps):
        if complex_in:
            out = shifted_window_matmul((xr.real, xr.imag), (Hfull,), A,
                                        precision)
            y = jax.lax.complex(out[0][0], out[1][0])
        else:
            out = shifted_window_matmul((xr,), (Hfull,), A, precision)
            y = out[0][0]
    else:
        mats = (Hfull.real, Hfull.imag)
        if complex_in:
            # (xr.re + i xr.im) * (Hr + i Hi): every plane x mat product
            # comes from ONE slice pass per window position
            out = shifted_window_matmul((xr.real, xr.imag), mats, A,
                                        precision)
            y = jax.lax.complex(out[0][0] - out[1][1], out[1][0] + out[0][1])
        else:
            out = shifted_window_matmul((xr,), mats, A, precision)
            y = jax.lax.complex(out[0][0], out[0][1])
    y = y.reshape(x.shape[:-1] + (A * M,))[..., :span]
    return y


def _next_fft_len(n: int) -> int:
    """Smallest 2^a (a>=4) >= n — XLA's fastest TPU FFT sizes."""
    m = 16
    while m < n:
        m *= 2
    return m


def _plan_corr_nfft(L: int, T: int) -> int:
    """FFT size for overlap-save correlation: minimize modeled FFT work.

    A single whole-signal FFT is pathological for long inputs (a 3.2M
    row pads to a 4M-point transform whose intermediates alone are
    ~270 MB/channel); chunked overlap-save with a bounded nfft costs
    ~ceil(span/(nfft-T+1)) * nfft * log2(nfft) and is minimized by a
    moderate power of two.  Model evaluated on host per (L, T) pair.
    """
    span = L - T + 1
    # short signals: one FFT — the chunk model below counts only n*log(n)
    # work, but at these sizes per-op overheads dominate and the single
    # transform wins (and keeps the pre-round-3 plan for per-block paths)
    if L + T - 1 <= 32768:
        return _next_fft_len(L + T - 1)
    best = None
    nfft = _next_fft_len(2 * T)
    while True:
        valid = nfft - T + 1
        cost = -(-span // valid) * nfft * np.log2(nfft)
        if best is None or cost < best[0]:
            best = (cost, nfft)
        if nfft >= L + T - 1 or nfft >= (1 << 20):
            break
        nfft *= 2
    return best[1]


def fft_correlate_valid(x: jax.Array, taps) -> jax.Array:
    """`correlate_valid` (stride 1) via FFT overlap-save.

    Same semantics as the shift-and-add path —
    ``out[..., i] = sum_t x[..., i + t] * taps[t]`` — but computed as
    batched circular convolutions: for long filters (e.g. the WFM pilot
    bandpass, ~316 complex taps) the shift-and-add unroll costs O(n*T)
    VPU work and dominates the whole demod chain; the FFT form is
    O(n log nfft) and ~10x faster on TPU at T >= ~128.  Long inputs are
    split into overlap-save chunks of a cost-modeled bounded FFT size
    (`_plan_corr_nfft`) — one whole-signal FFT both wastes flops
    (log factor) and materializes huge intermediates.

    Correlation = convolution with reversed taps, so out = IFFT(FFT(x_pad)
    * FFT(reverse(taps)))[T-1 : T-1+span].  The tap spectrum is
    precomputed on the host in float64 and folded in as an XLA constant.
    """
    taps = np.asarray(taps)
    L = int(x.shape[-1])
    T = int(taps.shape[0])
    span = L - T + 1
    nfft = _plan_corr_nfft(L, T)
    if nfft < L + T - 1:
        # chunked overlap-save: chunk p covers x[p*valid : p*valid+nfft];
        # build the (P, nfft) chunk matrix from Q row-shifted reshape
        # views (NOT P slices — same trick as the FFT channelizer)
        valid = nfft - T + 1
        P = -(-span // valid)
        Q = -(-nfft // valid)
        rows_n = P + Q - 1
        lead = x.shape[:-1]
        pad = [(0, 0)] * (x.ndim - 1) + [(0, rows_n * valid - L)]
        rows = jnp.pad(x, pad).reshape(lead + (rows_n, valid))
        chunks = jnp.concatenate(
            [
                jax.lax.dynamic_slice_in_dim(rows, q, P, axis=-2)
                for q in range(Q)
            ],
            axis=-1,
        )[..., :nfft]  # (..., P, nfft)
        y = _fft_corr_padded(chunks, taps, nfft)  # (..., P, valid)
        return y.reshape(lead + (P * valid,))[..., :span]
    return _fft_corr_padded(x, taps, nfft)


def _fft_corr_padded(x: jax.Array, taps: np.ndarray, nfft: int) -> jax.Array:
    """Core circular-correlation: pad last axis to ``nfft``, return the
    ``L - T + 1`` valid outputs (L = input length before padding)."""
    L = int(x.shape[-1])
    T = int(taps.shape[0])
    span = L - T + 1
    hf = np.fft.fft(taps[::-1].astype(np.complex128), nfft)
    complex_in = jnp.iscomplexobj(x)
    complex_out = complex_in or np.iscomplexobj(taps)

    pad = [(0, 0)] * (x.ndim - 1) + [(0, nfft - L)]
    if complex_in:
        xf = jnp.fft.fft(jnp.pad(x, pad))
    else:
        # Real input: this backend's rfft/irfft are ~3.6x SLOWER than the
        # same-size complex fft (measured on v5e), so never use them.
        if not np.iscomplexobj(taps):
            xp = jnp.pad(x.astype(jnp.float32), pad)
            lead = xp.shape[:-1]
            even = int(np.prod(lead)) % 2 == 0 if lead else False
            if even:
                # Pack row pairs as re+j*im: one half-batch complex FFT
                # filters two real rows (taps spectrum is shared/real-tap
                # linear, so Re/Im stay independent end to end).
                flat = xp.reshape(-1, nfft)
                half = flat.shape[0] // 2
                z = jax.lax.complex(flat[:half], flat[half:])
                hf_r = np.fft.fft(taps[::-1].astype(np.float64), nfft)
                yz = jnp.fft.ifft(jnp.fft.fft(z) * jnp.asarray(hf_r.astype(np.complex64)))
                y = jnp.concatenate([yz.real, yz.imag]).reshape(lead + (nfft,))
                return y[..., T - 1 : T - 1 + span]
            xf = jnp.fft.fft(jnp.pad(x.astype(jnp.complex64), pad))
            hr = np.fft.fft(taps[::-1].astype(np.float64), nfft)
            y = jnp.fft.ifft(xf * jnp.asarray(hr.astype(np.complex64))).real
            return y[..., T - 1 : T - 1 + span]
        xf = jnp.fft.fft(jnp.pad(x.astype(jnp.complex64), pad))
    y = jnp.fft.ifft(xf * jnp.asarray(hf.astype(np.complex64)))
    y = y[..., T - 1 : T - 1 + span]
    if not complex_out:
        y = y.real
    return y


class Fir(StreamOp):
    """Streaming FIR: state = last ``taps-1`` input samples.

    Matches ``dsp::filter::FIR`` (``core/src/dsp/filter/fir.h``): the first
    output of a fresh stream corresponds to a zero-filled history.

    ``method``: "direct" (shift-and-add), "fft" (overlap-save circular
    convolution), "mm" (banded-Toeplitz MXU matmuls,
    `matmul_correlate_valid`), or "auto" (fft for >=128 taps — the
    crossover measured on TPU v5e; direct below).
    """

    _FFT_MIN_TAPS = 128

    def __init__(self, taps: np.ndarray, dtype=jnp.complex64, method: str = "auto",
                 mm_precision: str = "highest"):
        taps = np.asarray(taps)
        self.taps = taps  # host numpy: captured as an XLA constant at trace
        self.ntaps = int(taps.shape[0])
        self.dtype = dtype
        assert method in ("auto", "direct", "fft", "mm")
        if method == "auto":
            method = "fft" if self.ntaps >= self._FFT_MIN_TAPS else "direct"
        self.method = method
        self.mm_precision = mm_precision

    def init_state(self):
        # Host numpy: complex arrays must not cross the host<->device
        # boundary eagerly (the TPU backend only supports complex math
        # *inside* compiled programs) — see graph/compile.py.
        return np.zeros((self.ntaps - 1,), np.dtype(self.dtype))

    def out_len(self, n: int) -> int:
        return n

    def __call__(self, state, x):
        x = x.astype(self.dtype)
        state = jnp.broadcast_to(
            jnp.asarray(state), x.shape[:-1] + (self.ntaps - 1,)
        )
        ext = jnp.concatenate([state, x], axis=-1)
        if self.method == "fft":
            y = fft_correlate_valid(ext, self.taps)
            y = y.astype(self.dtype) if not jnp.iscomplexobj(y) else y
        elif self.method == "mm":
            y = matmul_correlate_valid(ext, self.taps,
                                       precision=self.mm_precision)
            y = y.astype(self.dtype) if not jnp.iscomplexobj(y) else y
        else:
            y = correlate_valid(ext, self.taps)
        new_state = ext[..., x.shape[-1] :] if self.ntaps > 1 else state
        return new_state, y


class DecimatingFir(StreamOp):
    """FIR evaluated every ``decimation`` input samples.

    Matches ``dsp::filter::DecimatingFIR`` (``decimating_fir.h:47-67``) with
    the phase carry (``offset``) pinned to zero by requiring block lengths
    divisible by the decimation — block framing guarantees this, keeping
    output shapes static for XLA.
    """

    def __init__(self, taps: np.ndarray, decimation: int, dtype=jnp.complex64):
        taps = np.asarray(taps)
        self.taps = taps
        self.ntaps = int(taps.shape[0])
        self.decimation = int(decimation)
        self.dtype = dtype

    def init_state(self):
        return np.zeros((self.ntaps - 1,), np.dtype(self.dtype))

    def out_len(self, n: int) -> int:
        assert n % self.decimation == 0, (
            f"block length {n} not divisible by decimation {self.decimation}"
        )
        return n // self.decimation

    def __call__(self, state, x):
        n = x.shape[-1]
        assert n % self.decimation == 0
        x = x.astype(self.dtype)
        state = jnp.broadcast_to(
            jnp.asarray(state), x.shape[:-1] + (self.ntaps - 1,)
        )
        ext = jnp.concatenate([state, x], axis=-1)
        y = correlate_valid(ext, self.taps, stride=self.decimation)
        new_state = ext[..., n:] if self.ntaps > 1 else state
        return new_state, y


class MultistageDecimator(StreamOp):
    """Power-of-two decimation as a cascade of half-band decimate-by-2 FIRs.

    Our redesign of ``dsp::multirate::PowerDecimator``
    (``power_decimator.h:51-67``): same capability (1..2^k ratios, staged
    half-band filters) but with taps designed on the fly (`taps.half_band`)
    instead of the reference's precomputed plan tables, and each stage a
    polyphase-layout shift-and-add unroll (unit-stride slices only).
    """

    def __init__(self, ratio: int, dtype=jnp.complex64, taps_fn=None):
        assert ratio >= 1 and (ratio & (ratio - 1)) == 0, "ratio must be 2^k"
        from . import taps as tapsmod

        self.ratio = int(ratio)
        self.dtype = dtype
        taps_fn = taps_fn or (lambda: tapsmod.half_band())
        stages = []
        r = ratio
        while r > 1:
            stages.append(DecimatingFir(taps_fn(), 2, dtype))
            r //= 2
        self.stages = stages

    def init_state(self):
        return tuple(s.init_state() for s in self.stages)

    def out_len(self, n: int) -> int:
        assert n % self.ratio == 0
        return n // self.ratio

    def __call__(self, state, x):
        new_states = []
        for s, st in zip(self.stages, state):
            st, x = s(st, x)
            new_states.append(st)
        return tuple(new_states), x
