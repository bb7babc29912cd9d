"""Per-round probes (VERDICT r3 #7 + process_many unroll rationale):

  1. Pallas kernel inside a lax.scan body — r3 recorded UNIMPLEMENTED at
     execution; if it now runs, wideband.process_many can drop the unroll.
  2. The remote-DMA halo kernel (ops/pallas/halo.py) compiled on hardware
     — r3 left it interpret-only.

Run on the TPU backend: python benchmarks/probe_pallas_scan_rdma.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

sys.path.insert(0, "/root/repo")


def _trivial_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + 1.0


def probe(name, fn):
    try:
        out = fn()
        stat = float(np.asarray(out).ravel()[:8].sum())
        print(f"PASS {name}: stat={stat:.4f}")
        return True
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:500]}")
        return False


def main():
    print("devices:", jax.devices())

    def p_scan():
        x = jnp.ones((4, 8, 256), jnp.float32)

        def body(c, xs):
            y = pl.pallas_call(
                _trivial_kernel,
                out_shape=jax.ShapeDtypeStruct(xs.shape, xs.dtype),
            )(xs)
            return c + 1, y

        f = jax.jit(lambda x_: jax.lax.scan(body, 0, x_))
        _, ys = f(x)
        return ys

    probe("trivial-pallas-inside-scan", p_scan)

    def p_scan_tail():
        from supersdr_tpu.ops.pallas import chain_tail
        from supersdr_tpu.ops import resample, firdesign
        chunk, C = 1024, 128
        _, Pm = resample.plan_interp(4, firdesign.lowpass_taps(6000, 48000))
        PER = Pm.shape[0]
        yr = jnp.ones((3, chunk, C), jnp.float32) * 0.1
        pv = jnp.asarray([0.999, 0.0002, -100.0, 6.0, -10.0, 50.0, 1.0,
                          0.99], jnp.float32)

        def body(st, xs):
            a, s2 = chain_tail.chain_tail_am(xs, jnp.zeros_like(xs), st, pv,
                                             np.asarray(Pm), tile_t=512, L=4)
            return s2, a

        st0 = jnp.zeros((1, 4 + PER - 1, C), jnp.float32)
        f = jax.jit(lambda y_: jax.lax.scan(body, st0, y_))
        _, ys = f(yr)
        return ys

    probe("fused-tail-inside-scan", p_scan_tail)

    def p_rdma():
        from supersdr_tpu.ops.pallas import halo
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("dev",))
        x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)

        def body(xs):
            return halo.left_halo_rdma(xs, 16, "dev")

        f = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P("dev"),),
                                  out_specs=P("dev"), check_vma=False))
        return f(x)

    probe("rdma-halo-on-hw", p_rdma)


if __name__ == "__main__":
    main()
