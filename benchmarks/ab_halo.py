"""A/B: ppermute vs Pallas remote-DMA halo in the sharded chain, on
hardware (VERDICT r3 #7).

One real chip exposes a 1-device time axis, so the ICI hop itself is a
self-copy on both sides; what this measures is (a) that the RDMA kernel
COMPILES AND EXECUTES in the full sharded-chain program on this runtime
(the r3 blocker — it was interpret-only), and (b) the per-step kernel
overhead delta at d=1. The ICI-latency argument for multi-chip stays
with the α-β model (docs/PERFORMANCE.md scaling section).

Run: python benchmarks/ab_halo.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from supersdr_tpu.parallel import mesh as mesh_mod
from supersdr_tpu.parallel import sharded_chain
from supersdr_tpu.runtime import chain


def run(halo_impl: str):
    devs = jax.devices()[:1]
    m = mesh_mod.make_mesh(n_chan=1, n_time=1, devices=devs)
    cfg = chain.ChainConfig(mode="AM", iq_rate=12000, audio_rate=48000,
                            chunk=1 << 17, os_block=1 << 17, n_taps=257,
                            passband_impl="matmul",
                            passband_precision="default")
    proc = sharded_chain.build(cfg, m, halo_impl=halo_impl)
    params = sharded_chain.make_params(cfg, n_chan=8)
    state = sharded_chain.init_state(cfg, 8)
    rng = np.random.default_rng(0)
    from supersdr_tpu.ops import cx
    iq = cx.CX(
        jnp.asarray(0.1 * rng.normal(size=(8, cfg.chunk)), jnp.float32),
        jnp.asarray(0.1 * rng.normal(size=(8, cfg.chunk)), jnp.float32))
    st, out = proc(params, state, iq)
    stat = float(jnp.mean(jnp.abs(out.audio)))
    assert np.isfinite(stat) and stat > 0
    iters = 16
    while True:
        t0 = time.perf_counter()
        s = st
        for _ in range(iters):
            s, out = proc(params, s, iq)
        x = float(jnp.mean(jnp.abs(out.audio)))
        dt = time.perf_counter() - t0
        if dt > 2.0 or iters >= 256:
            break
        iters *= 2
    ms = dt / iters * 1e3
    print(f"halo={halo_impl:9s} step {ms:6.2f} ms  |a|={x:.6f}")
    return x


def main():
    a = run("ppermute")
    b = run("rdma")
    print(f"outputs match: {abs(a - b) < 1e-6}")


if __name__ == "__main__":
    main()
