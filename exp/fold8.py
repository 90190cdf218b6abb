"""Round-5: 8-VFO fold einsum orderings (fold at 52% of ceiling).

Times fold+ifft+slice+reshape (the consumer included, so output-layout
choices pay their real costs) for several contraction orderings at the
8-VFO shapes (P=1000, R=40, nif=128, C=8).

Usage: python exp/fold8.py.  Scratch instrumentation; not shipped.
"""
import os, sys
import numpy as np
import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sdrtpu.roofline import slope_time

def log(*a): print(*a, flush=True)

def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="8vfo", choices=["8vfo", "64vfo"])
    a = ap.parse_args()
    P, R, nif, C = (1000, 40, 128, 8) if a.shape == "8vfo" else (125, 200, 128, 64)
    rng = np.random.default_rng(0)
    Xr = jax.device_put(rng.standard_normal((P, R, nif)).astype(np.float32))
    Xi = jax.device_put(rng.standard_normal((P, R, nif)).astype(np.float32))
    G = (rng.standard_normal((C, R, nif)) + 1j*rng.standard_normal((C, R, nif))).astype(np.complex64)

    def tm(name, step):
        t = slope_time(step, jnp.float32(0))
        log(f"  {name:32s} {t*1e3:8.4f} ms/win")
        return t

    def consume(S_cpk):
        y = jnp.fft.ifft(S_cpk)          # (C, P, nif)
        return y[:, :, 7:107].reshape(C, P*100)

    def v_base(st, salt):
        X = jax.lax.complex(Xr + salt, Xi)
        return st, consume(jnp.einsum("psk,csk->cpk", X, G))
    tm("base psk,csk->cpk", v_base)

    def v_dot(st, salt):
        # batched-k dot_general: (k, P, R) @ (k, R, C) -> (k, P, C)
        X = jax.lax.complex(Xr + salt, Xi)
        Xk = jnp.transpose(X, (2, 0, 1))         # (nif, P, R)
        Gk = jnp.transpose(G, (2, 1, 0))         # (nif, R, C)
        S = jax.lax.dot_general(Xk, Gk, (((2,), (1,)), ((0,), (0,))))
        return st, consume(jnp.transpose(S, (2, 1, 0)))
    tm("batched-k dot_general", v_dot)

    def v_flat(st, salt):
        # contract (P, R*nif-block-diag) as C separate (P,R)@(R,nif) muls
        X = jax.lax.complex(Xr + salt, Xi)
        # per-channel: sum_s X[p,s,k]*G[c,s,k]  == elementwise in k
        S = jnp.sum(X[None] * G[:, None], axis=3)  # explicit VPU form? shapes: (C,P,R,nif) reduce R
        return st, consume(S)
    def v_vpu(st, salt):
        X = jax.lax.complex(Xr + salt, Xi)
        S = jnp.sum(X[None, :, :, :] * G[:, None, :, :], axis=2)  # (C,P,nif)
        return st, consume(S)
    tm("vpu broadcast-reduce", v_vpu)

    def v_prec(st, salt):
        X = jax.lax.complex(Xr + salt, Xi)
        S = jnp.einsum("psk,csk->cpk", X, G,
                       precision=jax.lax.Precision.HIGHEST)
        return st, consume(S)
    tm("base HIGHEST precision", v_prec)

    def v_ckp(st, salt):
        X = jax.lax.complex(Xr + salt, Xi)
        S = jnp.einsum("psk,csk->ckp", X, G)
        y = jnp.fft.ifft(jnp.transpose(S, (0, 2, 1)))
        return st, y[:, :, 7:107].reshape(C, P*100)
    tm("ckp + transpose", v_ckp)

if __name__ == "__main__":
    main()
