"""Exploratory on-chip probe of PFB fold formulations (headline shape).

Inputs are generated ON DEVICE (jax.random) — the axon tunnel moves
host buffers at ~1 MB/s, so shipping a 330 MB chunk eagerly costs ~6
minutes and must never be part of an experiment loop. Numbers here are
stage-level and guide full-pipeline A/Bs only.
"""

import json
import os
import sys
import time

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
    g2 = np.asarray(W).reshape(-1)[::-1].reshape(K, M)
    g2j = jnp.asarray(g2)

    @jax.jit
    def gen(key):
        kr, ki = jax.random.split(key)
        return cx.CX(0.05 * jax.random.normal(kr, (CHUNK,), jnp.float32),
                     0.05 * jax.random.normal(ki, (CHUNK,), jnp.float32))

    xd = gen(jax.random.PRNGKey(0))
    # NEVER block_until_ready on this runtime (can hang/return early —
    # docs/PERFORMANCE.md); force completion with a scalar fetch instead
    assert np.isfinite(float(jnp.sum(jnp.abs(xd.re))))
    carry0 = ch.init_carry(plan)
    nf = CHUNK // M

    def full(fold_impl):
        @jax.jit
        def f(c, xx):
            c2, y = ch.channelize_mxu2_c(plan, W, cx.to_complex(c),
                                         cx.to_complex(xx),
                                         fold_impl=fold_impl)
            return cx.split(c2), cx.split(y)
        return f

    def fold_only(kind):
        """Just the fold (no FFT): isolates fold cost."""
        @jax.jit
        def f(c, xx):
            seg_r = jnp.concatenate([c.re, xx.re], -1).reshape(nf + K - 1, M)
            seg_i = jnp.concatenate([c.im, xx.im], -1).reshape(nf + K - 1, M)
            if kind == "slices":
                fr = ch._fold_slices(g2j, seg_r, nf, K)
                fi = ch._fold_slices(g2j, seg_i, nf, K)
            elif kind == "conv":
                fr = ch._fold_conv(g2j, seg_r, nf, K)
                fi = ch._fold_conv(g2j, seg_i, nf, K)
            elif kind == "f16":
                r16 = seg_r.astype(jnp.float16)
                i16 = seg_i.astype(jnp.float16)
                g16 = g2j.astype(jnp.float32)
                fr = (g16[0] * r16[0:nf].astype(jnp.float32))
                fi = (g16[0] * i16[0:nf].astype(jnp.float32))
                for k in range(1, K):
                    fr = fr + g16[k] * r16[k:k + nf].astype(jnp.float32)
                    fi = fi + g16[k] * i16[k:k + nf].astype(jnp.float32)
            elif kind == "none":
                fr, fi = seg_r[:nf], seg_i[:nf]
            return c, cx.CX(fr, fi)
        return f

    variants = {
        "full_slices": full("slices"),
        "full_conv": full("conv"),
        "fold_none": fold_only("none"),
        "fold_slices": fold_only("slices"),
        "fold_conv": fold_only("conv"),
        "fold_f16": fold_only("f16"),
    }
    names = sys.argv[1:] or list(variants)
    for name in names:
        f = variants[name]
        try:
            t0 = time.time()
            c2, y = f(carry0, xd)
            s = float(jnp.sum(jnp.abs(y.re[:4])) + jnp.sum(jnp.abs(y.im[:4])))
            compile_s = time.time() - t0
            assert np.isfinite(s), s
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
                              "compile_s": round(compile_s, 1),
                              "iters": iters}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
