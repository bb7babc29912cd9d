"""Per-round probe: do Pallas kernels run under shard_map on this runtime?

Round 3 found Pallas inside a lax.scan body executes as UNIMPLEMENTED and
recorded the same for shard_map (parallel/sharded_wideband.py maps the
fused kernels back to XLA on the mesh). VERDICT r3 #1a says re-probe each
round — the Mosaic probe itself flipped from failing to passing in r3.

Probes, in order of increasing specificity (each fetch-forced):
  1. trivial 2-D Pallas kernel under a 1-device shard_map
  2. the shipped fused chain tail under a 1-device shard_map
  3. the shipped fused channelizer under a 1-device shard_map
  4. the fused tail under shard_map WITH a ppermute collective in the
     same body (the restructured-mesh shape: collectives around kernels)

Run on the TPU backend:  python benchmarks/probe_pallas_shardmap.py
"""

import functools
import sys
import traceback

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
    devs = jax.devices()
    print("devices:", devs)
    mesh = Mesh(np.asarray(devs[:1]), ("dev",))

    # 1. trivial kernel under shard_map
    def p1():
        x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)

        def body(xs):
            return pl.pallas_call(
                _trivial_kernel,
                out_shape=jax.ShapeDtypeStruct(xs.shape, xs.dtype),
            )(xs)

        f = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P("dev"),),
                                  out_specs=P("dev"), check_vma=False))
        return f(x)

    ok1 = probe("trivial-pallas-under-shardmap", p1)

    # 2. fused chain tail under shard_map
    def p2():
        from supersdr_tpu.ops.pallas import chain_tail
        from supersdr_tpu.ops import resample, firdesign
        chunk, C = 1024, 128
        _, Pm = resample.plan_interp(4, firdesign.lowpass_taps(6000, 48000))
        PER = Pm.shape[0]
        yr = jnp.ones((chunk, C), jnp.float32) * 0.1
        yi = jnp.zeros((chunk, C), jnp.float32)
        st = jnp.zeros((1, 4 + PER - 1, C), jnp.float32)
        pv = jnp.asarray([0.999, 0.0002, -100.0, 6.0, -10.0, 50.0, 1.0,
                          0.99], jnp.float32)

        def body(yr_, yi_, st_, pv_):
            a, s = chain_tail.chain_tail_am(yr_, yi_, st_, pv_,
                                            np.asarray(Pm), tile_t=512,
                                            L=4)
            return a

        f = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(None, "dev"), P(None, "dev"), P(), P()),
            out_specs=P(None, "dev"), check_vma=False))
        return f(yr, yi, st, pv)

    ok2 = probe("fused-tail-under-shardmap", p2)

    # 3. fused channelizer under shard_map
    def p3():
        from supersdr_tpu.ops.pallas import channelize_fused
        from supersdr_tpu.ops import channelizer
        M, K = 2560, 8
        plan, proto = channelizer.design(M, K)
        W = channelizer.taps_matrix(plan, proto)
        n = M * 256
        x = (0.05 * np.random.default_rng(0).normal(size=n)).astype(
            np.complex64)
        carry = np.zeros(plan.history, np.complex64)

        def body(xr, xi, cr, ci, W_):
            _, chans = channelize_fused.channelize_fused_c(
                plan, W_, jax.lax.complex(cr, ci), jax.lax.complex(xr, xi),
                bf16_mxu=True)
            return jnp.real(chans)

        f = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P("dev"),) * 2 + (P(), P(), P()),
            out_specs=P(), check_vma=False))
        return f(x.real, x.imag, carry.real, carry.imag, W)

    ok3 = probe("fused-channelizer-under-shardmap", p3)

    # 4. tail + ppermute in the same shard_map body
    def p4():
        from supersdr_tpu.ops.pallas import chain_tail
        from supersdr_tpu.ops import resample, firdesign
        chunk, C = 1024, 128
        _, Pm = resample.plan_interp(4, firdesign.lowpass_taps(6000, 48000))
        PER = Pm.shape[0]
        yr = jnp.ones((chunk, C), jnp.float32) * 0.1
        yi = jnp.zeros((chunk, C), jnp.float32)
        st = jnp.zeros((1, 4 + PER - 1, C), jnp.float32)
        pv = jnp.asarray([0.999, 0.0002, -100.0, 6.0, -10.0, 50.0, 1.0,
                          0.99], jnp.float32)

        def body(yr_, yi_, st_, pv_):
            # a collective before and after the kernel call, as the
            # restructured mesh pipeline would issue them
            yr2 = jax.lax.ppermute(yr_, "dev", [(0, 0)])
            a, s = chain_tail.chain_tail_am(yr2, yi_, st_, pv_,
                                            np.asarray(Pm), tile_t=512,
                                            L=4)
            return jax.lax.ppermute(a, "dev", [(0, 0)])

        f = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(None, "dev"), P(None, "dev"), P(), P()),
            out_specs=P(None, "dev"), check_vma=False))
        return f(yr, yi, st, pv)

    ok4 = probe("tail+ppermute-under-shardmap", p4)
    print("SUMMARY:", dict(trivial=ok1, tail=ok2, chan=ok3, tail_coll=ok4))


if __name__ == "__main__":
    main()
