"""Exploratory on-chip probe: channelizer FFT-stage precision and
twiddle-fusion formulations at the headline shape (device-generated
inputs; stage numbers only — defaults move on full-pipeline A/Bs).

Variants (fold fixed at 'slices'):
  highest / high / default — matmul precision of the two FFT stages
  fused_tw_high            — DIF factoring (n1=20, n2=128) with the
                             twiddle folded into a j2-batched stage-A
                             matmul (zero twiddle pass) at HIGH
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

M, K = 2560, 8
CHUNK = 2560 * (16384 - 256)
MIN_S = 1.5


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from supersdr_tpu.ops import channelizer as ch
    from supersdr_tpu.ops import cx

    plan, proto = ch.design(M, K)
    W = ch.taps_matrix(plan, proto)

    @jax.jit
    def gen(key):
        kr, ki = jax.random.split(key)
        return cx.CX(0.05 * jax.random.normal(kr, (CHUNK,), jnp.float32),
                     0.05 * jax.random.normal(ki, (CHUNK,), jnp.float32))

    xd = gen(jax.random.PRNGKey(0))
    assert np.isfinite(float(jnp.sum(jnp.abs(xd.re))))
    carry0 = ch.init_carry(plan)
    nf = CHUNK // M
    g2j = jnp.asarray(np.asarray(W).reshape(-1)[::-1].reshape(K, M))

    def with_prec(prec):
        @jax.jit
        def f(c, xx):
            c2, y = ch.channelize_mxu2_c(plan, W, cx.to_complex(c),
                                         cx.to_complex(xx), precision=prec)
            return cx.split(c2), cx.split(y)
        return f

    # DIF variant: r = j1·n2 + j2 with n1=20, n2=128; twiddle folded into
    # a j2-batched stage-A matmul; output m = k2·n1 + k1 lands directly.
    n1, n2 = 20, 128

    def fused_tw(prec):
        d1r, d1i = cx._dft_tables(n1, -1)          # [j1, k1]
        ang = -2.0 * np.pi * np.outer(np.arange(n2), np.arange(n1)) / M
        twr = np.cos(ang)                          # [j2, k1]
        twi = np.sin(ang)
        # A[j2, k1, j1] = D1[j1, k1] · tw[j2, k1]
        Ar = jnp.asarray((d1r.T[None] * twr[:, :, None]
                          - d1i.T[None] * twi[:, :, None]), jnp.float32)
        Ai = jnp.asarray((d1r.T[None] * twi[:, :, None]
                          + d1i.T[None] * twr[:, :, None]), jnp.float32)
        c2r, c2i = map(jnp.asarray, cx._dft_tables(n2, -1))   # [j2, k2]

        @jax.jit
        def f(c, xx):
            seg_r = jnp.concatenate([c.re, xx.re], -1).reshape(nf + K - 1, M)
            seg_i = jnp.concatenate([c.im, xx.im], -1).reshape(nf + K - 1, M)
            fr = ch._fold_slices(g2j, seg_r, nf, K).reshape(nf, n1, n2)
            fi = ch._fold_slices(g2j, seg_i, nf, K).reshape(nf, n1, n2)
            # stage A: Y[j2, k1, nf] = Σ_{j1} A[j2, k1, j1]·f3[nf, j1, j2]
            dnA = (((2,), (1,)), ((0,), (2,)))   # contract j1; batch j2
            dotA = partial(jax.lax.dot_general, dimension_numbers=dnA,
                           precision=prec, preferred_element_type=jnp.float32)
            yr = dotA(Ar, fr) - dotA(Ai, fi)
            yi = dotA(Ar, fi) + dotA(Ai, fr)
            # stage B: X[k2, k1, nf] = Σ_{j2} C2[j2, k2]·Y[j2, k1, nf]
            dnB = (((1,), (0,)), ((), ()))
            dotB = partial(jax.lax.dot_general, dimension_numbers=dnB,
                           precision=prec, preferred_element_type=jnp.float32)
            xr2 = dotB(c2r.T, yr) - dotB(c2i.T, yi)
            xi2 = dotB(c2r.T, yi) + dotB(c2i.T, yr)
            new_c = cx.CX(
                jnp.concatenate([c.re, xx.re], -1)[-plan.history:],
                jnp.concatenate([c.im, xx.im], -1)[-plan.history:])
            return new_c, cx.CX(xr2.reshape(M, nf), xi2.reshape(M, nf))
        return f

    HI, H, D = (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH,
                jax.lax.Precision.DEFAULT)
    variants = {
        "highest": with_prec(HI),
        "high": with_prec(H),
        "default": with_prec(D),
        "fused_tw_high": fused_tw(H),
        "fused_tw_default": fused_tw(D),
    }
    names = sys.argv[1:] or list(variants)
    ref = None
    for name in names:
        f = variants[name]
        try:
            t0 = time.time()
            c2, y = f(carry0, xd)
            s = float(jnp.sqrt(jnp.sum(y.re * y.re) + jnp.sum(y.im * y.im)))
            compile_s = time.time() - t0
            assert np.isfinite(s), s
            if ref is None:
                ref = s
            iters = 8
            while True:
                t0 = time.perf_counter()
                for _ in range(iters):
                    c2, y = f(c2, xd)
                sf = float(jnp.sum(jnp.abs(y.re[:4])))
                dt = time.perf_counter() - t0
                if dt >= MIN_S or iters >= 128:
                    break
                iters *= 2
            print(json.dumps({"variant": name,
                              "stage_ms": round(dt / iters * 1e3, 2),
                              "norm_rel": f"{abs(s - ref) / ref:.2e}",
                              "compile_s": round(compile_s, 1),
                              "iters": iters}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
