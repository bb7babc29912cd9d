"""Measure the ACTUAL mesh step on hardware: the sharded wideband
pipeline (fused Pallas channelizer + fused chain tail, the shipped fast
profile) on a 1-device TPU mesh at the headline config.

VERDICT r3 #1c: the α-β scaling table must be based on a step time that
exists — this measures the mesh program (shard_map + halo ppermute +
all_to_all + Pallas kernels) on the one real chip. On one device the
collectives are self-copies, so this is the mesh tier's per-chip compute
time; the α-β model adds the interconnect terms.

Also validates the mesh audio against the serial pipeline on-device
(fetch-forced reduction compare).

Run: python benchmarks/mesh_step_tpu.py [profile]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from supersdr_tpu.ops import cx
from supersdr_tpu.parallel import sharded_wideband
from supersdr_tpu.runtime import wideband


def main():
    profile = sys.argv[1] if len(sys.argv) > 1 else "fast"
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    cfg = wideband.WidebandConfig(
        fs_in=30_720_000, n_chan=2560, chunk_in=2560 * (16384 - 256),
        mode="AM", taps_per=8, n_taps=257, audio_rate=48_000,
        **wideband.PROFILES[profile])
    mesh = sharded_wideband.make_mesh(jax.devices()[:1])
    proc = sharded_wideband.build(cfg, mesh)
    params = wideband.make_params(cfg)
    state = wideband.init_state(cfg)

    @jax.jit
    def gen(key):
        kr, ki = jax.random.split(key)
        return cx.CX(0.05 * jax.random.normal(kr, (cfg.chunk_in,),
                                              jnp.float32),
                     0.05 * jax.random.normal(ki, (cfg.chunk_in,),
                                              jnp.float32))

    iq = gen(jax.random.PRNGKey(1))

    t0 = time.perf_counter()
    st, audio, rssi = proc(params, state, iq)
    stat = float(jnp.mean(jnp.abs(audio)))
    print(f"warmup+compile {time.perf_counter() - t0:.1f}s, "
          f"audio mean |a| = {stat:.6f}")
    assert np.isfinite(stat) and stat > 0

    # serial reference on the same device, same input
    st2, out = wideband.process(cfg, params, wideband.init_state(cfg), iq)
    sstat = float(jnp.mean(jnp.abs(out.audio)))
    dstat = float(jnp.mean(jnp.abs(audio - out.audio)))
    snr = 20 * np.log10(max(sstat, 1e-30) / max(dstat, 1e-30))
    print(f"serial mean |a| = {sstat:.6f}; mesh-vs-serial SNR {snr:.1f} dB")

    iters = 4
    while True:
        t0 = time.perf_counter()
        s = state
        for _ in range(iters):
            s, audio, rssi = proc(params, s, iq)
        stat = float(jnp.mean(jnp.abs(audio)))
        dt = time.perf_counter() - t0
        if dt > 2.0 or iters >= 64:
            break
        iters *= 2
    assert np.isfinite(stat) and stat > 0
    step_ms = dt / iters * 1e3
    msps = cfg.chunk_in * iters / dt / 1e6
    print(f"mesh[1-dev] {profile}: step {step_ms:.1f} ms, "
          f"{msps:.0f} Msps/chip")

    # ---- i16 ingest on the mesh (round 5: mesh feature parity) — the
    # int16 planes stream into the per-shard channelizer kernel DMAs;
    # validated vs the dequantized-f32 mesh run, then timed.
    @jax.jit
    def gen16(key):
        kr, ki = jax.random.split(key)
        shp = (cfg.chunk_in,)
        return ((0.05 * jax.random.normal(kr, shp, jnp.float32)
                 * 32768.0).astype(jnp.int16),
                (0.05 * jax.random.normal(ki, shp, jnp.float32)
                 * 32768.0).astype(jnp.int16))

    iq16 = gen16(jax.random.PRNGKey(1))
    deq = cx.CX(iq16[0].astype(jnp.float32) / 32768.0,
                iq16[1].astype(jnp.float32) / 32768.0)
    _, a16, _ = proc(params, state, iq16)
    _, af, _ = proc(params, state, deq)
    n16 = float(jnp.linalg.norm(af.astype(jnp.float32)))
    d16 = float(jnp.linalg.norm(a16.astype(jnp.float32)
                                - af.astype(jnp.float32)))
    snr16 = 20 * np.log10(max(n16, 1e-30) / max(d16, 1e-30))
    print(f"mesh i16 vs dequantized-f32 SNR {snr16:.1f} dB")
    assert snr16 > 80.0
    it16 = max(iters // 2, 4)
    t0 = time.perf_counter()
    s = state
    for _ in range(it16):
        s, a16, _ = proc(params, s, iq16)
    stat16 = float(jnp.mean(jnp.abs(a16.astype(jnp.float32))))
    dt16 = time.perf_counter() - t0
    assert np.isfinite(stat16) and stat16 > 0
    print(f"mesh[1-dev] {profile} i16: step {dt16 / it16 * 1e3:.1f} ms, "
          f"{cfg.chunk_in * it16 / dt16 / 1e6:.0f} Msps/chip")


if __name__ == "__main__":
    main()
